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
