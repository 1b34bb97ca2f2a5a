"""Predicate-DSL golden tests: every construct in the reference grammar
(filtered_sampling_guide.md; samplers.py:234-297), compiled to a Catalyst
Column AND to SQL, cross-checked against DuckDB on the GDELT fixture
(SURVEY.md §5.4)."""

from __future__ import annotations

import duckdb
import pytest

from gdelt_2_0_event_database_pipeline_spark.functions.predicates import (
    compile_filter,
    compile_filter_sql,
    filter_columns,
    validate_filter_dict,
)

CASES = [
    # equality on str / int / float
    {"Actor1CountryCode": "BRA"},
    {"IsRootEvent": 1},
    {"GoldsteinScale": 2.5},
    # JSON array = IN-list, never a range — 2-element array included
    {"QuadClass": [1, 2]},
    {"Actor1CountryCode": ["USA", "CHN", "RUS"]},
    # op dicts: equals / in_list / gt / lt (strict) / between / range (inclusive)
    {"NumMentions": {"op": "gt", "value": 50}},
    {"NumMentions": {"op": "lt", "value": 10}},
    {"GoldsteinScale": {"op": "between", "min": -2, "max": 2}},
    {"AvgTone": {"op": "range", "min": 0, "max": 50}},
    {"EventCode": {"op": "equals", "value": "042"}},
    {"QuadClass": {"op": "in_list", "values": [3, 4]}},
    # mixed keys in one block join with the block's connective (top = AND)
    {"Actor1CountryCode": "USA", "IsRootEvent": 1},
    # OR block
    {"OR": {"Actor1CountryCode": "BRA", "EventCode": "190"}},
    # nested: AND of (eq) and (OR of two)
    {
        "IsRootEvent": 1,
        "OR": {
            "Actor1CountryCode": ["BRA", "RUS"],
            "NumMentions": {"op": "gt", "value": 80},
        },
    },
    # deep nesting: OR containing an AND sub-block
    {
        "OR": {
            "EventCode": "010",
            "AND": {
                "QuadClass": [1],
                "GoldsteinScale": {"op": "between", "min": 0, "max": 10},
            },
        }
    },
]


@pytest.fixture(scope="module")
def duck(gdelt_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW g AS SELECT * FROM read_parquet('{gdelt_path}')")
    return con


@pytest.mark.parametrize("fdict", CASES, ids=[str(i) for i in range(len(CASES))])
def test_dsl_matches_duckdb(gdelt_df, duck, fdict):
    spark_ids = {
        r.GlobalEventID
        for r in gdelt_df.filter(compile_filter(fdict)).select("GlobalEventID").collect()
    }
    sql = f"SELECT GlobalEventID FROM g WHERE {compile_filter_sql(fdict)}"
    duck_ids = {r[0] for r in duck.execute(sql).fetchall()}
    assert spark_ids == duck_ids
    assert len(spark_ids) > 0, "degenerate test case matched nothing"


def test_null_never_matches(gdelt_df):
    # equality/IN on NULL never matches (three-valued logic, SURVEY §2.11)
    n_null = gdelt_df.filter("Actor1CountryCode IS NULL").count()
    assert n_null > 0
    matched = gdelt_df.filter(
        compile_filter({"Actor1CountryCode": ["USA", "BRA", "CHN", "RUS", "FRA", "IND"]})
    ).count()
    not_null = gdelt_df.filter("Actor1CountryCode IS NOT NULL").count()
    assert matched == not_null


def test_empty_filter_is_none():
    assert compile_filter({}) is None
    assert compile_filter_sql({}) == "TRUE"


def test_validation_rejects_bad_grammar():
    with pytest.raises(ValueError, match="AND must contain a dict"):
        validate_filter_dict({"AND": [1, 2]})
    with pytest.raises(ValueError, match="Invalid filter column"):
        validate_filter_dict({"NotAColumn": 1}, valid_columns={"A", "B"})
    with pytest.raises(ValueError, match="Invalid condition"):
        compile_filter({"A": {"op": "unknown_op", "value": 1}})


def test_filter_columns_collects_nested():
    fdict = {
        "A": 1,
        "OR": {"B": [1, 2], "AND": {"C": {"op": "gt", "value": 0}}},
    }
    assert filter_columns(fdict) == {"A", "B", "C"}


def test_tuple_is_inclusive_range(gdelt_df):
    # internal API only — unreachable from JSON (SURVEY §2.11)
    got = gdelt_df.filter(compile_filter({"NumMentions": (10, 20)})).agg(
        {"NumMentions": "min"}
    ).first()[0]
    lo = gdelt_df.filter(compile_filter({"NumMentions": (10, 20)})).agg(
        {"NumMentions": "max"}
    ).first()[0]
    assert got >= 10 and lo <= 20
