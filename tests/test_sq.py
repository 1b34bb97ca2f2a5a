"""SQ8 scalar-quantization tests: encode == numpy reference, decode
bounds, constant-dimension edge, near-exact recall (the oracle itself is
checked by the driver — q_sq_encode/q_sq_topk carry full DuckDB SQL)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.sq import (
    fit_sq_bounds,
    sq_encode,
    sq_topk,
)
from gdelt_2_0_event_database_pipeline_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def bounds(emb):
    return fit_sq_bounds(emb)


def test_encode_matches_numpy(emb, bounds):
    mins, maxs = bounds
    mn, mx = np.asarray(mins), np.asarray(maxs)
    xs = {
        r.vec_id: np.asarray([float(v) for v in r.embedding]) for r in emb.collect()
    }
    got = {r.vec_id: list(r.codes) for r in sq_encode(emb, mins, maxs).collect()}
    assert set(got) == set(xs)
    for vid, x in xs.items():
        ref = np.clip(np.floor((x - mn) / (mx - mn) * 255.0), 0, 255).astype(int)
        assert got[vid] == list(ref), vid
    # codes span the 8-bit range at the extremes
    allcodes = np.asarray(list(got.values()))
    assert allcodes.min() == 0 and allcodes.max() == 255


def test_quantization_error_bound(emb, bounds):
    """Decode error per element is at most one quantization step
    (mx-mn)/255 — the defining property of uniform SQ."""
    mins, maxs = bounds
    step = (np.asarray(maxs) - np.asarray(mins)) / 255.0
    from gdelt_2_0_event_database_pipeline_spark.operators.sq import sq_decode_expr

    dec = sq_encode(emb, mins, maxs).select(
        "vec_id", sq_decode_expr(F.col("codes"), mins, maxs).alias("dv")
    )
    dv = {r.vec_id: np.asarray(r.dv) for r in dec.collect()}
    xs = {
        r.vec_id: np.asarray([float(v) for v in r.embedding]) for r in emb.collect()
    }
    worst = max(np.abs(xs[v] - dv[v]).max() for v in xs)
    assert worst <= step.max() + 1e-12


def test_constant_dim_encodes_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 3.0])], "vec_id long, embedding array<double>"
    )
    mins, maxs = fit_sq_bounds(df)
    assert mins[0] == maxs[0] == 1.0
    codes = {r.vec_id: list(r.codes) for r in sq_encode(df, mins, maxs).collect()}
    assert codes[1][0] == 0 and codes[2][0] == 0  # constant dim -> code 0
    assert codes[1][1] == 0 and codes[2][1] == 255


def test_sq_topk_near_exact_recall(spark):
    """SQ8 keeps ~8 bits/dim, so top-5 should match exact search almost
    perfectly on the sf0.1 fixture (measured 1.00; pin 0.9) — the
    accuracy end of the compression ladder vs PQ's 32x."""
    emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = emb01.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(15).cache()
    mins, maxs = fit_sq_bounds(emb01)
    enc = sq_encode(emb01, mins, maxs)
    exact = {}
    for r in cosine_topk(emb01, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in sq_topk(enc, queries, mins, maxs, k=5).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    num = sum(len(v & approx.get(q, set())) for q, v in exact.items())
    den = sum(len(v) for v in exact.values())
    assert num / den >= 0.9, f"SQ8 recall@5 {num / den}"


def test_bad_inputs(emb):
    with pytest.raises(ValueError):
        sq_encode(emb, [0.0], [1.0, 2.0])
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError):
        fit_sq_bounds(empty)


def test_dim_mismatch_fails_loudly(spark, emb, bounds):
    """Vectors longer/shorter than the fitted bounds must raise, not
    silently yield NULL codes that rank last (review r9 finding)."""
    mins, maxs = bounds
    short = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(Exception) as ei:
        sq_encode(short, mins, maxs).collect()
    assert "sq_encode" in str(ei.value)
