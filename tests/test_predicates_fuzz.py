"""Hypothesis fuzzing of the predicate DSL: random nested filter dicts must
produce identical row sets in Spark and DuckDB (the compile-to-Column and
compile-to-SQL paths are independent implementations of the same grammar).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gdelt_2_0_event_database_pipeline_spark.functions.predicates import (
    compile_filter,
    compile_filter_sql,
)

COLUMNS = {
    "IsRootEvent": st.integers(0, 1),
    "QuadClass": st.sampled_from([1, 2, 3, 4]),
    "NumMentions": st.integers(0, 100),
    "GoldsteinScale": st.floats(-10, 10, allow_nan=False).map(lambda x: round(x, 1)),
    "Actor1CountryCode": st.sampled_from(["USA", "BRA", "CHN", "RUS", "FRA", "IND"]),
    "EventCode": st.sampled_from(["010", "020", "042", "043", "190"]),
}


def _condition(col: str):
    vs = COLUMNS[col]
    return st.one_of(
        vs,  # scalar equality
        st.lists(vs, min_size=1, max_size=4),  # IN list
        st.builds(lambda v: {"op": "equals", "value": v}, vs),
        st.builds(lambda v: {"op": "gt", "value": v}, vs),
        st.builds(lambda v: {"op": "lt", "value": v}, vs),
        st.builds(
            lambda a, b: {"op": "between", "min": min(a, b), "max": max(a, b)},
            vs,
            vs,
        ),
        st.builds(lambda v: {"op": "in_list", "values": [v]}, vs),
    )


def _block(depth: int):
    keys = st.sampled_from(sorted(COLUMNS))
    leaf = keys.flatmap(lambda c: st.tuples(st.just(c), _condition(c)))
    leaves = st.lists(leaf, min_size=1, max_size=3).map(dict)
    if depth == 0:
        return leaves

    def with_nested(d, connective, sub):
        out = dict(d)
        out[connective] = sub
        return out

    return st.one_of(
        leaves,
        st.builds(
            with_nested,
            leaves,
            st.sampled_from(["AND", "OR"]),
            _block(depth - 1),
        ),
    )


@pytest.fixture(scope="module")
def duck(gdelt_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW g AS SELECT * FROM read_parquet('{gdelt_path}')")
    return con


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(fdict=_block(2))
def test_random_filters_match_duckdb(gdelt_df, duck, fdict):
    col = compile_filter(fdict)
    spark_ids = {
        r.GlobalEventID
        for r in gdelt_df.filter(col).select("GlobalEventID").collect()
    }
    sql = f"SELECT GlobalEventID FROM g WHERE {compile_filter_sql(fdict)}"
    duck_ids = {r[0] for r in duck.execute(sql).fetchall()}
    assert spark_ids == duck_ids
