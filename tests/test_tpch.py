"""TPC-H-derived suite (plans/tpch_plans.py): full DuckDB differential for
every query at sf0.001 (the driver repeats this at sf0.01), plus shape
pins for the decorrelation-sensitive plans."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
TPCH = [
    "q02_min_cost_supplier",
    "q04_order_priority",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_profit_by_nation",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", TPCH)
def test_matches_duckdb(spark, oracle, name):
    got = _norm(QUERIES[name].fn(spark, SF).toPandas())
    want = _norm(oracle.execute(QUERIES[name].sql).df())
    assert len(got) == len(want) and len(got) > 0, (len(got), len(want))
    pd.testing.assert_frame_equal(got, want)


def test_q04_semi_join_not_inner(spark):
    """EXISTS must decorrelate to a semi join — an inner join would
    double-count orders with several late lineitems."""
    plan = (
        QUERIES["q04_order_priority"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan, plan


def test_q22_anti_join_not_inner(spark):
    """NOT EXISTS must decorrelate to an anti join."""
    plan = (
        QUERIES["q22_dormant_customers"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan, plan


def test_q10_take_ordered_no_global_sort(spark):
    """The top-20 must execute as TakeOrderedAndProject, never a global
    sort of the grouped aggregate."""
    plan = (
        QUERIES["q10_returned_items"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
