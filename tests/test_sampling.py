"""Sampler property tests — the reference's actual invariants (SURVEY.md §5.3):
exact n, per-stratum counts, filter containment, without-replacement, seed
determinism, rough uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.sampling import (
    sample_daily,
    sample_filtered,
    sample_per_group,
    sample_uniform,
)

KEY = ["GlobalEventID"]


def test_exact_n(gdelt_df):
    assert sample_uniform(gdelt_df, 1000, seed=1, key_cols=KEY).count() == 1000


def test_n_larger_than_table_strict_raises(gdelt_df):
    small = gdelt_df.limit(10)
    with pytest.raises(ValueError, match="> total rows"):
        sample_uniform(small, 100, seed=1, key_cols=KEY, strict=True)


def test_without_replacement(gdelt_df):
    s = sample_uniform(gdelt_df, 2000, seed=3, key_cols=KEY)
    assert s.select("GlobalEventID").distinct().count() == 2000


def test_seed_determinism(gdelt_df):
    a = {r.GlobalEventID for r in sample_uniform(gdelt_df, 500, seed=9, key_cols=KEY).collect()}
    b = {r.GlobalEventID for r in sample_uniform(gdelt_df, 500, seed=9, key_cols=KEY).collect()}
    c = {r.GlobalEventID for r in sample_uniform(gdelt_df, 500, seed=10, key_cols=KEY).collect()}
    assert a == b
    assert a != c


def test_determinism_independent_of_partitioning(gdelt_df):
    a = {r.GlobalEventID for r in sample_uniform(gdelt_df, 500, seed=9, key_cols=KEY).collect()}
    rep = gdelt_df.repartition(13)
    b = {r.GlobalEventID for r in sample_uniform(rep, 500, seed=9, key_cols=KEY).collect()}
    assert a == b


def test_md5_rank_same_contract_and_plan_shape(gdelt_df):
    """The engine-portable md5 rank (oracle path) honors the same contract
    as xxhash64: exact n, partitioning-independent, seed-sensitive — and
    still plans as TakeOrderedAndProject (top-n heap, no global sort)."""
    md5_sample = sample_uniform(gdelt_df, 500, seed=9, key_cols=KEY, rank_hash="md5")
    a = {r.GlobalEventID for r in md5_sample.collect()}
    b = {
        r.GlobalEventID
        for r in sample_uniform(
            gdelt_df.repartition(13), 500, seed=9, key_cols=KEY, rank_hash="md5"
        ).collect()
    }
    c = {
        r.GlobalEventID
        for r in sample_uniform(
            gdelt_df, 500, seed=10, key_cols=KEY, rank_hash="md5"
        ).collect()
    }
    assert len(a) == 500 and a == b and a != c
    plan = md5_sample._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratified_counts(gdelt_df):
    n_per = 300
    out = sample_per_group(gdelt_df, "QuadClass", n_per, seed=5, key_cols=KEY)
    got = {r["QuadClass"]: r["cnt"] for r in out.groupBy("QuadClass").agg(F.count("*").alias("cnt")).collect()}
    sizes = {
        r["QuadClass"]: r["cnt"]
        for r in gdelt_df.groupBy("QuadClass").agg(F.count("*").alias("cnt")).collect()
    }
    for k, size in sizes.items():
        assert got[k] == min(n_per, size), f"stratum {k}"


def test_stratified_na_stratum(gdelt_df):
    # NULL stratum participates (reference buckets it as "__NA__")
    out = sample_per_group(gdelt_df, "QuadClass", 50, seed=5, key_cols=KEY)
    n_null = out.filter(F.col("QuadClass").isNull()).count()
    assert n_null == 50  # fixture has ~400 NULL-QuadClass rows


def test_stratified_undersized_stratum_returns_all(gdelt_df):
    tiny = gdelt_df.filter(F.col("QuadClass") == 4).limit(7)
    out = sample_per_group(tiny, "QuadClass", 100, seed=5, key_cols=KEY)
    assert out.count() == 7


def test_na_sentinel_on_string_column(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3), ("b", 4)], ["s", "v"]
    )
    out = sample_per_group(df, "s", 10, seed=1, key_cols=["v"])
    vals = {r.s for r in out.collect()}
    assert vals == {"a", "b", "__NA__"}


def test_daily_counts(gdelt_df):
    out = sample_daily(gdelt_df, 3, seed=2, day_col="Day", key_cols=KEY)
    per_day = out.groupBy("Day").count().collect()
    assert all(r["count"] <= 3 for r in per_day)
    n_days = gdelt_df.select("Day").distinct().count()
    full_days = sum(1 for r in per_day if r["count"] == 3)
    assert len(per_day) == n_days
    assert full_days > n_days * 0.9  # almost every day has ≥3 rows


def test_filtered_sample_containment_and_projection(gdelt_df):
    fdict = {"Actor1CountryCode": "USA", "NumMentions": {"op": "gt", "value": 20}}
    out = sample_filtered(
        gdelt_df, fdict, n=200, seed=4,
        columns=["GlobalEventID", "Day"], key_cols=KEY,
    )
    rows = out.collect()
    assert len(rows) == 200
    assert out.columns == ["GlobalEventID", "Day"]  # filter cols dropped
    ids = [r.GlobalEventID for r in rows]
    back = gdelt_df.filter(F.col("GlobalEventID").isin(ids))
    assert back.filter(
        (F.col("Actor1CountryCode") != "USA") | (F.col("NumMentions") <= 20)
    ).count() == 0


def test_weighted_sampling_properties(gdelt_df):
    from gdelt_2_0_event_database_pipeline_spark.operators.sampling import sample_weighted

    s = sample_weighted(gdelt_df, 2000, "NumMentions", seed=6, key_cols=KEY)
    rows = s.collect()
    assert len(rows) == 2000
    assert len({r.GlobalEventID for r in rows}) == 2000  # without replacement
    # determinism
    s2 = sample_weighted(gdelt_df, 2000, "NumMentions", seed=6, key_cols=KEY)
    assert {r.GlobalEventID for r in rows} == {r.GlobalEventID for r in s2.collect()}
    # heavier rows overrepresented: sample mean weight ≫ population mean
    pop_mean = gdelt_df.agg(F.avg("NumMentions")).first()[0]
    samp_mean = s.agg(F.avg("NumMentions")).first()[0]
    assert samp_mean > pop_mean * 1.2, (samp_mean, pop_mean)


def test_weighted_sampling_rejects_nonpositive(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.sampling import sample_weighted

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0), (4, None)], "id long, w double"
    )
    out = sample_weighted(df, 10, "w", seed=1, key_cols=["id"]).collect()
    assert [r.id for r in out] == [3]  # only positive-weight rows carry mass


def test_uniformity_chisquare(gdelt_df):
    # sample 4000 of 20000; Year distribution of the sample should track the
    # population (chi-square, 2 dof, p>0.001 ⇒ stat < 13.8)
    s = sample_uniform(gdelt_df, 4000, seed=11, key_cols=KEY)
    pop = dict(gdelt_df.groupBy("Year").count().collect())
    got = dict(s.groupBy("Year").count().collect())
    total_pop = sum(pop.values())
    stat = 0.0
    for yr, n_pop in pop.items():
        exp = 4000 * n_pop / total_pop
        obs = got.get(yr, 0)
        stat += (obs - exp) ** 2 / exp
    assert stat < 13.8, f"chi-square {stat}"


def test_systematic_matches_global_window_and_avoids_single_task_sort(spark):
    from pyspark.sql import Window

    from gdelt_2_0_event_database_pipeline_spark.operators.sampling import (
        sample_systematic,
    )

    # sparse, non-contiguous, shuffled keys — the o_orderkey shape
    df = spark.createDataFrame(
        [(k * 7 + 3, float(k)) for k in range(5000)], "k long, v double"
    ).repartition(8)

    got = sample_systematic(df, stride=17, order_col="k")
    w = Window.orderBy("k")
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 17 == 0)
        .drop("rn")
    )
    assert sorted(r.k for r in got.collect()) == sorted(r.k for r in want.collect())

    # the point of the operator: no single-task global sort in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_systematic_empty_input(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.sampling import (
        sample_systematic,
    )

    df = spark.createDataFrame([], "k long, v double")
    assert sample_systematic(df, stride=5, order_col="k").count() == 0
