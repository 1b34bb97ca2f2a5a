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


def _ranked_q(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_batch_equals_per_query_single_fusion(spark):
    """query_col fusion in one job must equal running the single-query
    fusion once per query — the correctness contract of the batch path."""
    a = _ranked_q(spark, [(0, 1, 1), (0, 2, 2), (1, 5, 1), (1, 1, 2)])
    b = _ranked_q(spark, [(0, 2, 1), (0, 3, 2), (1, 1, 1)])
    batch = {
        (r.query_id, r.doc_id): (r.rrf_score, r.rank)
        for r in rrf_fuse([a, b], k=10, query_col="query_id").collect()
    }
    single = {}
    for q in (0, 1):
        fa = a.filter(a.query_id == q).select("doc_id", "rank")
        fb = b.filter(b.query_id == q).select("doc_id", "rank")
        for r in rrf_fuse([fa, fb], k=10).collect():
            single[(q, r.doc_id)] = (r.rrf_score, r.rank)
    assert batch == single


def test_rrf_batch_ranks_are_per_query(spark):
    a = _ranked_q(spark, [(0, 1, 1), (1, 9, 1)])
    rows = rrf_fuse([a], k=10, query_col="query_id").collect()
    assert sorted((r.query_id, r.rank) for r in rows) == [(0, 1), (1, 1)]


def test_bm25_batch_equals_per_query_single(spark):
    """bm25_topk_batch's one-scan union-term path must reproduce
    bm25_topk run separately per query, scores bit-for-bit (same
    contribution expressions, same literal term-addition order)."""
    from gdelt_2_0_event_database_pipeline_spark.operators.text import (
        bm25_topk,
        bm25_topk_batch,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle window spark"),
            (2, "join hash join"),
            (3, "window join spark"),
            (4, "nothing relevant here"),
            (5, "hash hash hash window"),
        ],
        "doc_id long, text string",
    )
    queries = {0: ["spark", "window"], 1: ["join", "hash"]}
    batch = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk_batch(docs, queries, k=3).collect()
    }
    single = {}
    for qid, terms in queries.items():
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        ranked = bm25_topk(docs, terms, k=3).withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
        for r in ranked.collect():
            single[(qid, r.doc_id)] = (r.score, r.rank)
    assert batch == single


def test_bm25_batch_rejects_empty(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.text import (
        bm25_topk_batch,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, {})
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, {0: []})


def test_retrieval_metrics_closed_form(spark):
    """Hand-built qrels: query 1 has relevant items at ranks 1 and 3 of 5
    (3 relevant total); query 2 has none relevant."""
    import math

    from gdelt_2_0_event_database_pipeline_spark.operators.fusion import (
        retrieval_metrics,
    )

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5),
         (2, 10, 1), (2, 11, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 77)],
        "query_id long, neighbor_id long",
    )
    got = {r.query_id: r for r in retrieval_metrics(ranked, rel, k=5).collect()}
    r1 = got[1]
    assert r1.hits == 2 and r1.mrr == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))  # 3 relevant, k=5
    assert r1.ndcg_at_k == round(dcg / idcg, 6)
    assert r1.precision_at_k == 0.4 and r1.recall_at_k == round(2 / 3, 6)
    r2 = got[2]
    assert r2.hits == 0 and r2.mrr == 0.0 and r2.precision_at_k == 0.0
    assert r2.ndcg_at_k == round(0.0, 6) and r2.recall_at_k == round(0.0, 6)


def test_retrieval_metrics_unanswered_query_reports_zeros(spark):
    """A query with qrels but ZERO ranked rows (upstream search returned
    nothing) must still appear, with all-zero metrics — the trec_eval
    convention; omitting it would bias averaged recall/MRR upward."""
    from gdelt_2_0_event_database_pipeline_spark.operators.fusion import (
        retrieval_metrics,
    )

    ranked = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, neighbor_id long, rank int"
    )
    rel = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    got = {r.query_id: r for r in retrieval_metrics(ranked, rel, k=5).collect()}
    assert set(got) == {1, 2}
    r2 = got[2]
    assert r2.hits == 0 and r2.mrr == 0.0
    assert r2.ndcg_at_k == 0.0 and r2.precision_at_k == 0.0
    assert r2.recall_at_k == 0.0


def test_retrieval_metrics_no_relevance_is_null(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.fusion import (
        retrieval_metrics,
    )

    ranked = spark.createDataFrame(
        [(9, 1, 1)], "query_id long, neighbor_id long, rank int"
    )
    rel = spark.createDataFrame([], "query_id long, neighbor_id long")
    r = retrieval_metrics(ranked, rel, k=5).first()
    assert r.hits == 0 and r.mrr == 0.0
    assert r.ndcg_at_k is None and r.recall_at_k is None
