"""RRF fusion unit tests (the end-to-end hybrid query q_hybrid_rrf is
oracle-checked by the driver; these pin the operator's conventions)."""

from __future__ import annotations

import pytest

from gdelt_2_0_event_database_pipeline_spark.operators.fusion import rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_matches_closed_form(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (1, 2), (4, 3)])
    got = {r.doc_id: (r.rrf_score, r.rank) for r in rrf_fuse([a, b], k=10).collect()}
    # closed form: 1/(60+rank) summed per system
    exp = {
        1: 1 / 61 + 1 / 62,
        3: 1 / 63 + 1 / 61,
        2: 1 / 62,
        4: 1 / 63,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d][0] == pytest.approx(s, rel=1e-12)
    # item in both lists outranks any single-system item here
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order[:2] == [1, 3]  # 1: ranks (1,2) beats 3: ranks (3,1)


def test_missing_items_contribute_nothing_and_ties_break_low_id(spark):
    a = _ranked(spark, [(7, 1)])
    b = _ranked(spark, [(5, 1)])
    rows = sorted(rrf_fuse([a, b], k=10).collect(), key=lambda r: r.rank)
    # identical scores -> tie breaks toward the lower id
    assert [r.doc_id for r in rows] == [5, 7]
    assert rows[0].rrf_score == rows[1].rrf_score


def test_k_truncates_and_c_damps(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    assert rrf_fuse([a], k=3).count() == 3
    hi = rrf_fuse([a], c=1, k=1).first()
    lo = rrf_fuse([a], c=1000, k=1).first()
    assert hi.rrf_score > lo.rrf_score  # smaller c -> stronger head weight


def test_empty_input_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
