"""Bucketed exact-rank machinery (operators/ranks.py) — the round-6 verdict's
scale rewrite of q_spearman / q_mannwhitney. The contract is *bit-identical
results* to the single-window exact forms, with no window partitioned by a
low-cardinality key and no single-partition prefix over distinct pooled
values."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.ranks import (
    exclusive_prefix_sum,
    rank_map,
    spearman_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_exclusive_prefix_sum_matches_window(spark):
    df = spark.range(0, 977).select(
        (F.col("id") % 7).alias("g"),
        # distinct order key within group: id itself, scrambled
        F.xxhash64("id").alias("v"),
        (F.col("id") % 13 + 1).alias("w"),
    )
    got = exclusive_prefix_sum(df, "v", "w", ["g"], n_buckets=16)
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("__lt__", F.coalesce(F.sum("w").over(w), F.lit(0)))
    diff = (
        got.select("g", "v", "__lt__")
        .exceptAll(want.select("g", "v", "__lt__"))
        .count()
    )
    assert diff == 0
    assert got.count() == 977


def test_exclusive_prefix_sum_groupless(spark):
    df = spark.range(1, 301).select(
        F.col("id").cast("double").alias("v"), F.lit(2).alias("w")
    )
    got = exclusive_prefix_sum(df, "v", "w", n_buckets=8)
    row = got.filter(F.col("v") == 100.0).first()
    assert row["__lt__"] == 99 * 2


def test_rank_map_is_tie_averaged_doubled(spark):
    # values: 5 x 10 (ranks 1-5, avg 3), 3 x 20 (ranks 6-8, avg 7),
    # 2 x 30 (ranks 9-10, avg 9.5) → doubled avg ranks 6, 14, 19
    rows = [(10,)] * 5 + [(20,)] * 3 + [(30,)] * 2
    df = spark.createDataFrame(rows, "v int")
    m = {
        r["v"]: (r["__cnt__"], r["__rank2__"])
        for r in rank_map(df, "v", n_buckets=4).collect()
    }
    assert m == {10: (5, 6), 20: (3, 14), 30: (2, 19)}


def test_spearman_bucketed_equals_exact_window_form(spark):
    """Differential test vs the exact twin (verdict item 2 'done' bar)."""
    from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

    exact = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in QUERIES["q_spearman"].fn(spark, SF_DIR).collect()
    }
    bucketed = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in QUERIES["q_spearman_bucketed"].fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(bucketed) and len(exact) > 0
    for g, (n_e, rho_e) in exact.items():
        n_b, rho_b = bucketed[g]
        assert n_b == n_e
        # exact integer ranks + identical pinned closing tree → bit-identical
        assert rho_b == rho_e


def test_spearman_bucketed_plan_has_no_low_card_window(spark):
    """The executed plan must not window-partition by l_returnflag alone —
    every window key includes the bucket column."""
    from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

    df = QUERIES["q_spearman_bucketed"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window " in line:
            assert "__bkt__" in line, line


def test_mannwhitney_no_single_partition_rank_prefix(spark):
    """q_mannwhitney's plan: the only Exchange SinglePartition left is the
    final 1-row accumulator aggregate (verdict item 3)."""
    from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

    df = QUERIES["q_mannwhitney"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window " in line:
            assert "__bkt__" in line, line
    # pin the stated invariant literally (round-7 advisory): at most ONE
    # Exchange SinglePartition in the whole plan — the final 1-row
    # accumulator aggregate. A regression reintroducing a global sort or
    # pooled-rank window anywhere else must fail here.
    assert plan.count("Exchange SinglePartition") <= 1, plan
    out = df.collect()
    assert len(out) == 1 and out[0]["n_a"] > 0 and out[0]["n_b"] > 0


def test_spearman_bucketed_sanity_direction(spark):
    # y = x + small noise-free monotone map → rho exactly 1 per group
    df = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 1).cast("double").alias("y"),
    )
    for r in spearman_bucketed(df, "x", "y", "g", n_buckets=8).collect():
        assert r["spearman_rho"] == pytest.approx(1.0, abs=1e-12)


def test_spearman_bucketed_null_rows_complete_case(spark):
    """Round-7 advisory: NULL x/y rows are excluded up front (explicit
    complete-case contract), not silently lost in the rank-map join — the
    result equals running on the pre-filtered frame."""
    base = spark.range(0, 200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 3).cast("double").alias("y"),
    )
    with_nulls = base.unionByName(
        spark.range(0, 20).select(
            F.lit("0").alias("g"),
            F.lit(None).cast("double").alias("x"),
            F.col("id").cast("double").alias("y"),
        )
    )
    got = {
        r["g"]: (r["n"], r["spearman_rho"])
        for r in spearman_bucketed(with_nulls, "x", "y", "g").collect()
    }
    want = {
        r["g"]: (r["n"], r["spearman_rho"])
        for r in spearman_bucketed(base, "x", "y", "g").collect()
    }
    assert got == want


def test_spearman_bucketed_empty_input_schema_matches(spark):
    """Round-7 advisory: the empty-input branch must keep the caller's
    group column name so both branches share one schema."""
    df = spark.range(0, 10).select(
        F.col("id").cast("string").alias("grp"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
    )
    out = spearman_bucketed(df, "x", "y", "grp")
    assert out.columns == ["grp", "n", "spearman_rho"]
    assert out.count() == 0


def test_exclusive_prefix_sum_drops_null_order_rows(spark):
    """NULL order keys are filtered explicitly (documented contract), so
    the output row count is the non-null count — no silent join loss."""
    df = spark.range(0, 50).select(
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id"))
        .cast("double")
        .alias("v"),
        F.lit(1).alias("w"),
    )
    out = exclusive_prefix_sum(df, "v", "w", n_buckets=4)
    assert out.count() == 40
