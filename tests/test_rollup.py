"""Incremental rollup state tests (the end-to-end merged-equals-direct
differential is driver-oracled by q_rollup_merge / q_rollup_refresh;
these pin the operator's maintenance semantics on hand data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
    build_rollup,
    merge_rollup,
    refresh_rollup,
)


def _base(spark):
    # (grp, day, v) with a NULL value and two days
    return spark.createDataFrame(
        [
            ("a", "d1", 1.0),
            ("a", "d1", 3.0),
            ("a", "d2", 5.0),
            ("a", "d2", None),
            ("b", "d1", 10.0),
        ],
        "grp string, day string, v double",
    )


def test_merge_matches_direct_aggregate(spark):
    df = _base(spark)
    state = build_rollup(df, ["grp", "day"], ["v"])
    merged = {r.grp: r for r in merge_rollup(state, ["grp"], ["v"]).collect()}
    direct = {
        r.grp: r
        for r in df.groupBy("grp")
        .agg(
            F.count("v").alias("v_n"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    for g in ("a", "b"):
        for c in ("v_n", "v_sum", "v_min", "v_max"):
            assert merged[g][c] == direct[g][c], (g, c)
    # NULLs excluded from every stat: group a has 4 rows but v_n == 3
    assert merged["a"].v_n == 3
    # derived: avg = sum/n, population var = sumsq/n - mean^2
    assert merged["a"].v_avg == pytest.approx(3.0)
    assert merged["a"].v_var == pytest.approx((1 + 9 + 25) / 3 - 9.0)


def test_grand_total_merge(spark):
    state = build_rollup(_base(spark), ["grp", "day"], ["v"])
    r = merge_rollup(state, [], ["v"], derived=False).first()
    assert r.v_n == 4 and r.v_sum == 19.0 and r.v_min == 1.0 and r.v_max == 10.0


def test_refresh_replaces_changed_day_and_is_idempotent(spark):
    df = _base(spark)
    state = build_rollup(df, ["grp", "day"], ["v"])
    # d1 is re-processed with a corrected source (one extra row for grp a)
    fixed_d1 = spark.createDataFrame(
        [("a", "d1", 1.0), ("a", "d1", 3.0), ("a", "d1", 100.0),
         ("b", "d1", 10.0)],
        "grp string, day string, v double",
    )
    fresh = build_rollup(fixed_d1, ["grp", "day"], ["v"])
    once = refresh_rollup(state, fresh, ["day"])
    twice = refresh_rollup(once, fresh, ["day"])
    for refreshed in (once, twice):
        m = {r.grp: r for r in merge_rollup(refreshed, ["grp"], ["v"]).collect()}
        # a: d1 now (1,3,100) + d2 (5) -> n=4 sum=109 max=100
        assert m["a"].v_n == 4 and m["a"].v_sum == 109.0 and m["a"].v_max == 100.0
        assert m["b"].v_n == 1 and m["b"].v_sum == 10.0
    # untouched partitions survive: d2 state rows unchanged
    d2 = once.filter(F.col("day") == "d2").collect()
    assert {(r.grp, r.v_sum) for r in d2} == {("a", 5.0)}


def test_empty_inputs_rejected(spark):
    df = _base(spark)
    with pytest.raises(ValueError):
        build_rollup(df, [], ["v"])
    with pytest.raises(ValueError):
        build_rollup(df, ["grp"], [])
    with pytest.raises(ValueError):
        refresh_rollup(df, df, [])


def test_hist_quantile_within_bucket_width_of_exact(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
        build_hist_rollup,
        hist_quantile,
    )

    vals = [float(i) for i in range(1, 1001)]  # 1..1000 uniform
    df = spark.createDataFrame(
        [("g", "d1" if i % 2 else "d2", v) for i, v in enumerate(vals)],
        "grp string, day string, v double",
    )
    lo, hi, nb = 0.0, 1000.0, 50
    state = build_hist_rollup(df, ["grp", "day"], "v", lo, hi, nb)
    # state is bounded: at most groups*days*buckets rows
    assert state.count() <= 2 * nb
    got = {
        r.q: r.quantile_est
        for r in hist_quantile(state, ["grp"], [0.25, 0.5, 0.95], lo, hi, nb).collect()
    }
    width = (hi - lo) / nb
    for q in (0.25, 0.5, 0.95):
        assert abs(got[q] - q * 1000.0) <= width, (q, got[q])


def test_hist_rollup_clamps_out_of_range_and_refreshes(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
        build_hist_rollup,
        hist_quantile,
        refresh_rollup,
    )

    df = spark.createDataFrame(
        [("g", "d1", -5.0), ("g", "d1", 0.5), ("g", "d2", 99.0)],
        "grp string, day string, v double",
    )
    state = build_hist_rollup(df, ["grp", "day"], "v", 0.0, 10.0, 10)
    rows = {(r.day, r.bucket): r.n for r in state.collect()}
    # -5 clamps into bucket 0 alongside 0.5; 99 clamps into the last bucket
    assert rows == {("d1", 0): 2, ("d2", 9): 1}
    # histogram state slots into replace-by-partition maintenance
    fixed = build_hist_rollup(
        spark.createDataFrame([("g", "d2", 3.0)], "grp string, day string, v double"),
        ["grp", "day"], "v", 0.0, 10.0, 10,
    )
    refreshed = refresh_rollup(state, fixed, ["day"])
    rows2 = {(r.day, r.bucket): r.n for r in refreshed.collect()}
    assert rows2 == {("d1", 0): 2, ("d2", 3): 1}
    # q=1.0 lands in the last occupied bucket
    r = hist_quantile(refreshed, ["grp"], [1.0], 0.0, 10.0, 10).first()
    assert 3.0 <= r.quantile_est <= 4.0


def test_hist_bad_inputs(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
        build_hist_rollup,
        hist_quantile,
    )

    df = _base(spark)
    with pytest.raises(ValueError):
        build_hist_rollup(df, ["grp"], "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        build_hist_rollup(df, ["grp"], "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        hist_quantile(df, ["grp"], [], 0.0, 10.0, 10)
    with pytest.raises(ValueError):
        hist_quantile(df, ["grp"], [1.5], 0.0, 10.0, 10)


def test_cms_never_underestimates_and_bounds_error(spark):
    """CMS one-sided guarantee on planted keys: est >= true count, and with
    depth=4/width=256 over a few hundred rows the overestimate stays well
    under the 2N/width bound; unseen keys estimate 0 or tiny collisions."""
    from gdelt_2_0_event_database_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    rows = [("d1" if i % 2 else "d2", f"k{i % 17}") for i in range(340)]
    df = spark.createDataFrame(rows, "day string, k string")
    true = {}
    for _, k in rows:
        true[k] = true.get(k, 0) + 1
    state = cms_sketch_table(df, ["day"], "k", depth=4, width=256)
    assert state.count() <= 2 * 4 * 256
    probes = spark.createDataFrame(
        [(k,) for k in list(true) + ["never-seen"]], "k string"
    )
    got = {
        r.k: r.freq_est
        for r in cms_estimate(state, [], probes, "k", depth=4, width=256).collect()
    }
    n_total = len(rows)
    for k, t in true.items():
        assert got[k] >= t, (k, got[k], t)
        assert got[k] <= t + 2 * n_total / 256, (k, got[k], t)
    assert got["never-seen"] <= 2 * n_total / 256


def test_cms_merge_equals_direct_and_refreshes(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
        refresh_rollup,
    )
    from gdelt_2_0_event_database_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    rows = [("d1", "a"), ("d1", "a"), ("d2", "a"), ("d2", "b")]
    df = spark.createDataFrame(rows, "day string, k string")
    state = cms_sketch_table(df, ["day"], "k", depth=4, width=64)
    direct = cms_sketch_table(df.select(F.lit("x").alias("g"), "k"), ["g"], "k",
                              depth=4, width=64)
    probes = spark.createDataFrame([("a",), ("b",)], "k string")
    merged_est = {
        r.k: r.freq_est
        for r in cms_estimate(state, [], probes, "k", depth=4, width=64).collect()
    }
    direct_est = {
        r.k: r.freq_est
        for r in cms_estimate(direct, ["g"], probes, "k", depth=4, width=64).collect()
    }
    assert merged_est == direct_est == {"a": 3, "b": 1}
    # CMS state is day-partitioned tall rows -> refresh_rollup applies as-is
    fixed = cms_sketch_table(
        spark.createDataFrame([("d2", "b"), ("d2", "b")], "day string, k string"),
        ["day"], "k", depth=4, width=64,
    )
    refreshed = refresh_rollup(state, fixed, ["day"])
    est2 = {
        r.k: r.freq_est
        for r in cms_estimate(refreshed, [], probes, "k", depth=4, width=64).collect()
    }
    assert est2 == {"a": 2, "b": 2}


def test_bigint_variance_survives_int64_overflow(spark):
    """Derived var over BIGINT state routes its cross products through
    decimal(38,0): 500 integer-cent values around 1e7 push n*sumsq and
    sum^2 past int64 (~2.5e19 > 9.2e18), where the old expressions
    wrapped silently in non-ANSI mode (r9 advice item 3). True
    population variance of 250x(1e7-1) + 250x(1e7+1) is exactly 1.0."""
    from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
        build_rollup,
        merge_rollup,
    )

    base = 10_000_000
    rows = [("g", "d1", base - 1)] * 250 + [("g", "d2", base + 1)] * 250
    df = spark.createDataFrame(rows, "grp string, day string, cents long")
    state = build_rollup(df, ["grp", "day"], ["cents"])
    assert dict(state.dtypes)["cents_sum"] == "bigint"
    out = merge_rollup(state, ["grp"], ["cents"]).first()
    assert out.cents_avg == float(base)
    assert out.cents_var == 1.0


def test_cms_estimate_guards_probe_domain_product(spark):
    """With merge_keys the grains × probes product is counted and a
    product above max_domain_rows raises instead of silently going
    quadratic (r10 verdict watch item)."""
    import pytest as _pytest

    from gdelt_2_0_event_database_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch_table,
    )

    rows = [(f"g{i % 5}", f"k{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "g string, k string")
    state = cms_sketch_table(df, ["g"], "k", depth=2, width=16)
    probes = spark.createDataFrame([("k0",), ("k1",)], "k string")
    # 5 grains x 2 probes = 10 > cap of 9 -> raise
    with _pytest.raises(ValueError, match="max_domain_rows"):
        cms_estimate(state, ["g"], probes, "k", depth=2, width=16,
                     max_domain_rows=9)
    # at or under the cap: runs and answers
    out = cms_estimate(state, ["g"], probes, "k", depth=2, width=16,
                       max_domain_rows=10)
    assert out.count() == 10
