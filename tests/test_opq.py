"""OPQ tests (operators/opq.py): deterministic fit, orthogonal rotation,
map-only rotate plan, numpy parity, the Ge-et-al. error guarantee (OPQ
training error <= plain PQ's on correlated data), and end-to-end search
shape + raw-space rerank exactness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.opq import (
    _encode_matrix,
    fit_opq,
    opq_topk,
    rotate_vectors,
)
from gdelt_2_0_event_database_pipeline_spark.operators.pq import (
    fit_pq_codebooks,
    pq_encode,
)
from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (
    cosine_topk,
)

D, N, M, NCODES = 16, 500, 4, 8


def _aniso(seed=3):
    """Correlated anisotropic sample — the regime OPQ exists for: a few
    dominant directions NOT axis-aligned, so contiguous subvector splits
    cut across correlated coordinates."""
    rng = np.random.RandomState(seed)
    basis, _ = np.linalg.qr(rng.standard_normal((D, D)))
    scales = np.array([8.0, 6.0, 4.0, 3.0] + [0.4] * (D - 4))
    return (rng.standard_normal((N, D)) * scales) @ basis.T


@pytest.fixture(scope="module")
def xmat():
    return _aniso()


@pytest.fixture(scope="module")
def vec_df(spark, xmat):
    return spark.createDataFrame(
        [(i, [float(v) for v in xmat[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).repartition(5)


@pytest.fixture(scope="module")
def fitted(vec_df):
    return fit_opq(vec_df, m=M, ncodes=NCODES, iters=3, opq_iters=6)


def test_fit_deterministic_and_orthogonal(vec_df, fitted):
    r1, b1 = fitted
    r2, b2 = fit_opq(vec_df, m=M, ncodes=NCODES, iters=3, opq_iters=6)
    assert r1 == r2 and b1 == b2
    r = np.asarray(r1)
    assert r.shape == (D, D)
    assert np.allclose(r @ r.T, np.eye(D), atol=1e-9)


def test_opq_error_beats_plain_pq_on_correlated(vec_df, xmat, fitted):
    """The point of the rotation: at identical bytes (same m, ncodes),
    quantizing R·x must not be worse than quantizing x — and on this
    correlated fixture it is strictly, substantially better."""
    r, books = fitted
    plain = fit_pq_codebooks(vec_df, m=M, ncodes=NCODES, iters=3)

    def err(x, cb):
        cb = np.asarray(cb, np.float64)
        codes = _encode_matrix(x, cb)
        m, _, sub = cb.shape
        xhat = np.concatenate([cb[s, codes[:, s]] for s in range(m)], axis=1)
        return float(((x - xhat) ** 2).sum())

    e_plain = err(xmat, plain)
    e_opq = err(xmat @ np.asarray(r).T, books)
    assert e_opq < 0.8 * e_plain, (e_opq, e_plain)


def test_rotate_vectors_matches_numpy_and_is_map_only(spark, vec_df, xmat, fitted):
    r, _ = fitted
    out = rotate_vectors(vec_df, r)
    got = {row.vec_id: np.array(row.rotated) for row in out.collect()}
    want = xmat @ np.asarray(r).T
    for i in range(N):
        assert np.allclose(got[i], want[i], rtol=1e-12)
    # plan shape on a plain scan-shaped input (the module fixture carries
    # its own repartition Exchange, which would false-positive the check)
    plain = spark.createDataFrame(
        [(0, [0.0] * D)], "vec_id long, embedding array<double>"
    )
    plan = rotate_vectors(plain, r)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    # guards: existing out_col refused; wrong-width rows get NULL
    with pytest.raises(ValueError, match="already exists"):
        rotate_vectors(out, r, out_col="rotated")
    short = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    assert rotate_vectors(short, r).first().rotated is None


def test_opq_search_shape_and_raw_space_rerank(spark, vec_df, xmat, fitted):
    r, books = fitted
    enc = pq_encode(
        rotate_vectors(vec_df, r).select(
            "vec_id", F.col("rotated").alias("embedding")
        ),
        books,
    )
    queries = vec_df.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="rerank requires"):
        opq_topk(enc, queries, r, books, k=5, rerank=60)
    rows = opq_topk(
        enc, queries, r, books, k=5, rerank=60, corpus=vec_df
    ).collect()
    assert {row.query_id for row in rows} == {0, 1, 2}
    per_q = {}
    for row in rows:
        per_q.setdefault(row.query_id, []).append(row)
    exact = {
        (row.query_id, row.neighbor_id): row.cos_sim
        for row in cosine_topk(vec_df, queries, k=5).collect()
    }
    hits = 0
    for q, rs in per_q.items():
        assert sorted(x.rank for x in rs) == [1, 2, 3, 4, 5]
        assert all(x.neighbor_id != q for x in rs)
        for x in rs:
            key = (x.query_id, x.neighbor_id)
            if key in exact:
                # rerank cosine is RAW-space exact (rotation-invariant)
                assert x.cos_sim == pytest.approx(exact[key], rel=1e-9)
                hits += 1
    assert hits > 0


def test_opq_recall_not_worse_than_pq_on_correlated(spark, vec_df, xmat, fitted):
    """Recall-vs-bytes: same 4 codes/vector, ADC-only (no rerank — the
    regime where codebook quality IS the result). On the correlated
    fixture the rotation must not lose recall; the measured curve in
    ANN_RECALL.json shows where it strictly gains."""
    r, books = fitted
    plain_books = fit_pq_codebooks(vec_df, m=M, ncodes=NCODES, iters=3)
    queries = vec_df.filter(F.col("vec_id") < 10)
    truth = {}
    for row in cosine_topk(vec_df, queries, k=5).collect():
        truth.setdefault(row.query_id, set()).add(row.neighbor_id)

    def recall(result) -> float:
        got = {}
        for row in result.collect():
            got.setdefault(row.query_id, set()).add(row.neighbor_id)
        return sum(len(v & got.get(q, set())) for q, v in truth.items()) / sum(
            len(v) for v in truth.values()
        )

    from gdelt_2_0_event_database_pipeline_spark.operators.pq import pq_topk

    enc_plain = pq_encode(vec_df, plain_books)
    enc_opq = pq_encode(
        rotate_vectors(vec_df, r).select(
            "vec_id", F.col("rotated").alias("embedding")
        ),
        books,
    )
    r_plain = recall(pq_topk(enc_plain, queries, plain_books, k=5))
    r_opq = recall(opq_topk(enc_opq, queries, r, books, k=5))
    assert r_opq >= r_plain - 0.05, (r_plain, r_opq)
