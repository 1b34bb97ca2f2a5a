"""Similarity-search tests: brute-force vs numpy ground truth; LSH recall on
planted high-similarity neighbors; embedding near-dup detection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    semantic_dedup,
)

DIM = 32
N = 120


def _make_vectors(seed: int = 13):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(N, DIM)).astype(np.float32)
    # plant near-dups: vectors 100..109 are tiny perturbations of 0..9
    for i in range(10):
        base[100 + i] = base[i] + rng.normal(scale=0.05, size=DIM).astype(np.float32)
    return base


@pytest.fixture(scope="module")
def emb(spark):
    vecs = _make_vectors()
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)], schema
    )


def test_bruteforce_matches_numpy(emb):
    vecs = _make_vectors().astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=4)
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}
    for q in range(3):
        order = np.argsort(-sims[q])[:4]
        for rank, expected in enumerate(order, start=1):
            assert got[(q, rank)] == expected


def test_lsh_recall_on_planted_neighbors(emb):
    # queries 0..9 have a planted near-identical neighbor at 100..109 —
    # exactly the high-similarity regime sign-LSH serves
    queries = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk_lsh(emb, queries, k=1, num_planes=6, probe_hamming=2)
    top1 = {r.query_id: r.neighbor_id for r in out.filter(F.col("rank") == 1).collect()}
    hits = sum(1 for q in range(10) if top1.get(q) == 100 + q)
    assert hits >= 8, f"recall {hits}/10"


def test_embedding_near_dup_pairs(emb):
    pairs = embedding_near_dup_pairs(emb, threshold=0.95)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert len(got & planted) >= 8
    # precision: everything above 0.95 must actually BE above 0.95 (exact rescoring)
    for r in pairs.collect():
        assert r.cos_sim >= 0.95


def test_embedding_near_dup_banded_recall_at_higher_r(emb):
    # planes_per_band is the bucket-count knob (2^r buckets/band); extra bands
    # buy the recall back — the 100 TB configuration shape
    pairs = embedding_near_dup_pairs(
        emb, threshold=0.95, bands=6, planes_per_band=12
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert len(got & planted) >= 8


def test_embedding_near_dup_candidates_shrink_with_planes(emb):
    # threshold=-1 disables the rescore filter, exposing the raw candidate
    # set: more planes per band ⇒ finer buckets ⇒ strictly fewer candidates
    coarse = embedding_near_dup_pairs(
        emb, threshold=-1.0, bands=2, planes_per_band=4
    ).count()
    fine = embedding_near_dup_pairs(
        emb, threshold=-1.0, bands=2, planes_per_band=12
    ).count()
    assert fine < coarse


def test_lsh_probe_hamming_above_two(emb):
    # combinatorial masks: probing wider never loses candidates
    queries = emb.filter(F.col("vec_id") < 10)
    narrow = cosine_topk_lsh(emb, queries, k=1, num_planes=6, probe_hamming=1)
    wide = cosine_topk_lsh(emb, queries, k=1, num_planes=6, probe_hamming=3)
    n_hits = {r.query_id: r.neighbor_id for r in narrow.filter(F.col("rank") == 1).collect()}
    w_hits = {r.query_id: r.neighbor_id for r in wide.filter(F.col("rank") == 1).collect()}
    n_recall = sum(1 for q in range(10) if n_hits.get(q) == 100 + q)
    w_recall = sum(1 for q in range(10) if w_hits.get(q) == 100 + q)
    assert w_recall >= n_recall
    with pytest.raises(ValueError):
        cosine_topk_lsh(emb, queries, num_planes=6, probe_hamming=7)


def test_topk_rank_is_dense_and_bounded(emb):
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    per_q = out.groupBy("query_id").agg(F.count("*").alias("c"), F.max("rank").alias("m")).collect()
    for r in per_q:
        assert r.c == 3 and r.m == 3


# ---------------------------------------------------------------- SemDeDup
def test_semantic_dedup_drops_planted_duplicates(emb):
    # 100..109 are tiny perturbations of 0..9 (cos ≈ 0.999); at a
    # production-grade threshold each planted pair loses its larger id —
    # UNLESS the pair straddles a cluster boundary (documented property:
    # dedup is cluster-local). Near-identical vectors share an argmax
    # centroid except in knife-edge ties, so require ≥8/10 drops.
    out = semantic_dedup(emb, k=4, threshold=0.98)
    survivors = {r.vec_id for r in out.collect()}
    cluster_of = {r.vec_id: r.cluster_id for r in out.collect()}
    dropped = [i for i in range(100, 110) if 100 + (i - 100) not in survivors]
    assert len([i for i in range(100, 110) if i not in survivors]) >= 8
    # originals (smaller ids) always survive their planted twin
    assert all(i in survivors for i in range(10))


def test_semantic_dedup_survivors_pairwise_below_threshold(emb):
    # min-id dominance ⇒ no two same-cluster survivors are ≥ threshold
    thresh = 0.5
    out = semantic_dedup(emb, k=4, threshold=thresh).collect()
    vecs = _make_vectors().astype(np.float64)
    by_cluster: dict[int, list[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    for ids in by_cluster.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cos = float(
                    vecs[a] @ vecs[b]
                    / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
                )
                assert cos < thresh, (a, b, cos)


def test_semantic_dedup_deterministic_and_custom_centroids(emb):
    a = sorted((r.vec_id, r.cluster_id) for r in semantic_dedup(emb, k=4, threshold=0.9).collect())
    b = sorted((r.vec_id, r.cluster_id) for r in semantic_dedup(emb, k=4, threshold=0.9).collect())
    assert a == b
    # custom centroid frame: one centroid ⇒ everything lands in one cluster
    cent = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("__sd_cid__"),
        F.col("embedding").cast("array<double>").alias("__sd_cv__"),
    )
    one = semantic_dedup(emb, threshold=0.98, centroids=cent).collect()
    assert {r.cluster_id for r in one} == {0}
    # cos_to_centroid of vec 0 against itself is exactly 1
    self_row = [r for r in one if r.vec_id == 0]
    assert self_row and abs(self_row[0].cos_to_centroid - 1.0) < 1e-12


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),   # anchor, label 0
        (1, [1.0, 0.01], 0),  # nearly identical but SAME label -> excluded
        (2, [0.9, 0.1], 1),   # most similar other-label
        (3, [0.0, 1.0], 1),   # orthogonal other-label
        (4, [-1.0, 0.0], 2),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = hard_negatives(df, df.filter("vec_id = 0"), k=2).collect()
    got = [(r.negative_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(2, 1), (3, 2)]
    assert all(r.negative_label != r.anchor_label for r in out)
