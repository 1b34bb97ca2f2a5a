"""Hypothesis fuzzing of the rollup merge algebra: for ANY row multiset
and ANY partition of it into ingest batches, merging the per-batch
partial states must equal the single-pass direct state — the property
that makes incremental maintenance safe at all (a failure here is a
silent wrong-answer at every coarser grain).

Spark jobs are slow per example, so the strategy space is kept small and
examples few; the ARITHMETIC domain is adversarial instead: values cross
zero, repeat, and (for the integer profile) sit near the int64 overflow
boundary the decimal-routed derived variance must survive.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gdelt_2_0_event_database_pipeline_spark.operators.rollup import (
    build_rollup,
    merge_rollup,
)

# (group, day, value) rows: few distinct keys so merges actually combine
rows_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.sampled_from(["d1", "d2", "d3"]),
        st.integers(-3, 9_999_999),
    ),
    min_size=1,
    max_size=24,
)
cuts_st = st.lists(st.integers(0, 23), max_size=2, unique=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, cuts=cuts_st)
@pytest.mark.slow
def test_merged_batch_states_equal_direct(spark, rows, cuts):
    df = spark.createDataFrame(rows, "grp string, day string, v long")
    direct = merge_rollup(
        build_rollup(df, ["grp", "day"], ["v"]), ["grp"], ["v"]
    )

    bounds = sorted({0, len(rows), *[c for c in cuts if c < len(rows)]})
    batches = [
        rows[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if rows[lo:hi]
    ]
    states = [
        build_rollup(
            spark.createDataFrame(b, "grp string, day string, v long"),
            ["grp", "day"],
            ["v"],
        )
        for b in batches
    ]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    merged = merge_rollup(unioned, ["grp"], ["v"])

    def canon(sdf):
        return {
            r["grp"]: (
                r["v_n"], r["v_sum"], r["v_min"], r["v_max"], r["v_sumsq"],
                r["v_avg"], r["v_var"],
            )
            for r in sdf.collect()
        }

    got, want = canon(merged), canon(direct)
    assert set(got) == set(want)
    for g in want:
        # counters/extrema/sums: exact integers, must be identical
        assert got[g][:5] == want[g][:5], g
        # derived avg/var: same exact-integer inputs -> same IEEE doubles
        assert got[g][5] == want[g][5], g
        assert got[g][6] == want[g][6], g
        # cross-check variance against exact python integer arithmetic
        vs = [v for gr, _, v in rows if gr == g]
        n, s_, ss = len(vs), sum(vs), sum(v * v for v in vs)
        assert got[g][6] == pytest.approx((n * ss - s_ * s_) / (n * n), rel=1e-12)
        assert math.isfinite(got[g][6]) and got[g][6] >= 0.0
