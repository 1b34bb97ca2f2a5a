"""k-anonymity operator tests: suppression threshold boundaries and
NULL-as-a-value class semantics."""

from __future__ import annotations

import pytest

from gdelt_2_0_event_database_pipeline_spark.operators.privacy import (
    k_anonymity_report,
    suppress_small_groups,
)


def _df(spark):
    rows = (
        [(i, "US", "A") for i in range(5)]        # class of 5
        + [(10, "US", "B"), (11, "US", "B")]      # class of 2 → suppressed at k=3
        + [(20, None, "A"), (21, None, "A"), (22, None, "A")]  # NULL class of 3
    )
    return spark.createDataFrame(rows, "id long, country string, seg string")


def test_suppress_small_groups_boundary_and_null_class(spark):
    df = _df(spark)
    kept = {r.id for r in suppress_small_groups(df, ["country", "seg"], k=3).collect()}
    assert kept == {0, 1, 2, 3, 4, 20, 21, 22}   # class of exactly k stays; NULLs group together


def test_k_anonymity_report_flags(spark):
    got = {
        (r.country, r.seg): (r.class_size, r.violates_k)
        for r in k_anonymity_report(_df(spark), ["country", "seg"], k=3).collect()
    }
    assert got[("US", "A")] == (5, False)
    assert got[("US", "B")] == (2, True)
    assert got[(None, "A")] == (3, False)


def test_k_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        suppress_small_groups(df, ["country"], k=0)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["country"], k=0)


def test_dp_noisy_counts_calibration_and_determinism(spark):
    """Laplace-mechanism release: noise is centered and calibrated (mean
    |noise| over many groups tracks the scale b = 1/eps_each; Laplace
    mean absolute deviation IS b), deterministic per (seed, key), and
    clipping bounds the sum contribution."""
    from gdelt_2_0_event_database_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    rows = [(f"g{i}", float(i % 7) * 20.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double")

    out = dp_noisy_counts(df, ["g"], epsilon=1.0, value_col="v", clip=50.0)
    got = {r.g: (r.noisy_count, r.noisy_sum) for r in out.collect()}
    assert len(got) == 2000

    # exact (unnoised) per-group stats: count=1, sum=min(v, 50)
    errs_n = []
    for (g, v) in rows:
        nc, ns = got[g]
        errs_n.append(abs(nc - 1.0))
        # clip: contribution is min(v, 50), so noisy_sum - clipped = noise
        assert abs(ns - min(v, 50.0)) < 1200.0  # sanity tail bound (b=100)
    # eps splits across 2 stats -> count scale b = 1/(eps/2) = 2.0;
    # E|Laplace(b)| = b. 2000 draws: mean within 20%.
    mean_abs = sum(errs_n) / len(errs_n)
    assert 1.6 < mean_abs < 2.4, mean_abs

    # determinism: identical call -> identical release
    again = {
        r.g: (r.noisy_count, r.noisy_sum)
        for r in dp_noisy_counts(
            df, ["g"], epsilon=1.0, value_col="v", clip=50.0
        ).collect()
    }
    assert again == got
    # different seed -> different noise
    other = {
        r.g: (r.noisy_count, r.noisy_sum)
        for r in dp_noisy_counts(
            df, ["g"], epsilon=1.0, value_col="v", clip=50.0, seed=7
        ).collect()
    }
    assert other != got

    # count-only release uses the FULL budget (scale 1 < 2): tighter
    tight = dp_noisy_counts(df, ["g"], epsilon=1.0)
    errs_t = [abs(r.noisy_count - 1.0) for r in tight.collect()]
    assert sum(errs_t) / len(errs_t) < mean_abs

    # md5 family (the oracle-replayable twin) produces calibrated noise too
    md5_out = dp_noisy_counts(df, ["g"], epsilon=1.0, hash_family="md5")
    errs_m = [abs(r.noisy_count - 1.0) for r in md5_out.collect()]
    assert 0.8 < sum(errs_m) / len(errs_m) < 1.2

    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], clip=-1.0, value_col="v")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], hash_family="sha1")


def test_dp_domain_densify_and_error_bound(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.privacy import (
        dp_error_bound,
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("secret",)], "g string"
    )
    # public domain: a, b, c (never observed), NOT 'secret'
    domain = spark.createDataFrame([("a",), ("b",), ("c",)], "g string")
    out = {r.g: r.noisy_count for r in dp_noisy_counts(
        df, ["g"], epsilon=1.0, domain=domain
    ).collect()}
    assert set(out) == {"a", "b", "c"}  # secret dropped, c zero-filled
    # c's release is pure noise around 0 (bounded by the b*ln tail at
    # very high confidence: b=1, ln(1/1e-6) ~ 13.8)
    assert abs(out["c"]) < dp_error_bound(1.0, 1, confidence=1 - 1e-6)

    with pytest.raises(ValueError):  # wrong domain columns
        dp_noisy_counts(df, ["g"], domain=spark.createDataFrame([(1,)], "x int"))

    # error-bound accounting: coverage over many groups
    many = spark.createDataFrame([(f"g{i}",) for i in range(2000)], "g string")
    rel = dp_noisy_counts(many, ["g"], epsilon=1.0)
    errs = [abs(r.noisy_count - 1.0) for r in rel.collect()]
    bound95 = dp_error_bound(1.0, 1, confidence=0.95)
    cover = sum(1 for e in errs if e <= bound95) / len(errs)
    assert 0.93 <= cover <= 0.97, (cover, bound95)
    # monotone in epsilon and n_stats
    assert dp_error_bound(2.0, 1) < dp_error_bound(1.0, 1) < dp_error_bound(1.0, 2)
    with pytest.raises(ValueError):
        dp_error_bound(1.0, confidence=1.0)
