"""IVF ANN tests: deterministic fit, clustered-data recall beating the
candidate budget, output-shape parity with brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (
    fit_ivf_centroids,
    ivf_topk,
    nearest_cells,
)
from gdelt_2_0_event_database_pipeline_spark.operators.similarity import cosine_topk

DIM = 16
CLUSTERS = 4
PER = 60


def _clustered(seed: int = 5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=5.0, size=(CLUSTERS, DIM))
    rows = []
    for i in range(CLUSTERS * PER):
        c = i % CLUSTERS
        rows.append((i, (centers[c] + rng.normal(scale=0.5, size=DIM)).astype(np.float32)))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in _clustered()], schema
    ).cache()


def test_fit_is_deterministic(emb):
    c1 = fit_ivf_centroids(emb, k=CLUSTERS, iters=3, seed=9)
    c2 = fit_ivf_centroids(emb, k=CLUSTERS, iters=3, seed=9)
    assert c1 == c2
    assert len(c1) == CLUSTERS and len(c1[0]) == DIM


def test_fit_recovers_clusters(spark, emb):
    cents = fit_ivf_centroids(emb, k=CLUSTERS, iters=5, seed=9)
    # every planted cluster should map to a distinct fitted centroid
    assigned = emb.select(
        (F.col("vec_id") % CLUSTERS).alias("truth"),
        nearest_cells(F.col("embedding").cast("array<double>"), cents, 1)[0].alias("cell"),
    )
    # purity: dominant truth label per cell covers ≥95% of the cell
    per = assigned.groupBy("cell", "truth").count().collect()
    from collections import defaultdict

    cells = defaultdict(list)
    for r in per:
        cells[r.cell].append(r["count"])
    purity = sum(max(v) for v in cells.values()) / sum(sum(v) for v in cells.values())
    assert purity > 0.95, f"purity {purity}"


def test_ivf_topk_recall_on_clustered(emb):
    cents = fit_ivf_centroids(emb, k=CLUSTERS, iters=5, seed=9)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nearest neighbors live in the query's own cluster → nprobe=1 suffices
    assert recall >= 0.9, f"recall {recall}"


def test_ivf_rank_shape(emb):
    cents = fit_ivf_centroids(emb, k=CLUSTERS, iters=3, seed=9)
    out = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), cents, k=4, nprobe=2)
    per = out.groupBy("query_id").agg(F.count("*").alias("c"), F.max("rank").alias("m")).collect()
    for r in per:
        assert r.c == 4 and r.m == 4


def test_assignment_paths_agree(spark, emb):
    # the map-only literal path (small inputs) and the exploded one-shuffle
    # path (huge inputs) must produce identical assignments
    from gdelt_2_0_event_database_pipeline_spark.operators.ivf import assign_cells

    cents = fit_ivf_centroids(emb, k=CLUSTERS, iters=3, seed=9)
    literal = {
        (r.vec_id, r.cell)
        for r in emb.select(
            "vec_id",
            nearest_cells(F.col("embedding").cast("array<double>"), cents, 1)[0].alias("cell"),
        ).collect()
    }
    exploded = {
        (r.vec_id, r.cell) for r in assign_cells(emb, cents, nprobe=1).collect()
    }
    assert literal == exploded

    # nprobe=2: same top-2 cells per id, order-insensitive set compare
    lit2 = {
        (r.vec_id, c)
        for r in emb.select(
            "vec_id",
            nearest_cells(F.col("embedding").cast("array<double>"), cents, 2).alias("cs"),
        ).collect()
        for c in r.cs
    }
    exp2 = {
        (r.vec_id, r.cell) for r in assign_cells(emb, cents, nprobe=2).collect()
    }
    assert lit2 == exp2


def test_nprobe_for_recall_curve():
    from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (
        RECALL_CURVE,
        nprobe_for_recall,
    )

    # inverting the curve at a measured point returns that point's nprobe
    assert nprobe_for_recall(16, 0.248) == 1
    assert nprobe_for_recall(16, 0.792) == 8
    # the 0.75 default rounds UP to the next measured point (8/16 = 0.792;
    # no interpolation — recall between measured points is not a floor)
    assert nprobe_for_recall(16) == 8
    assert nprobe_for_recall(8) == 4
    # unreachable target clamps to exact search; tiny codebooks stay >= 1
    assert nprobe_for_recall(16, 1.5) == 16
    assert nprobe_for_recall(2, 0.01) == 1
    # curve must stay monotone or the interpolation is meaningless
    fracs = [f for f, _ in RECALL_CURVE]
    recs = [r for _, r in RECALL_CURVE]
    assert fracs == sorted(fracs) and recs == sorted(recs)


def test_default_nprobe_recall_sf01(spark):
    """Re-measure the default-nprobe recall on the sf0.1 fixture (the
    ANN_RECALL.json setting: near-uniform embeddings, IVF's worst case).
    Pins the r8-verdict fix: the curve-derived default must deliver
    recall@5 >= 0.75 where the old fixed nprobe=3/16 measured 0.47."""
    emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = (
        emb01.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(15).cache()
    )
    cents = fit_ivf_centroids(emb01, k=16, iters=2)
    exact = {}
    for r in cosine_topk(emb01, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ivf_topk(emb01, queries, cents, k=5).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    num = sum(len(v & approx.get(q, set())) for q, v in exact.items())
    den = sum(len(v) for v in exact.values())
    recall = num / den
    assert recall >= 0.75, f"default-nprobe recall@5 {recall}"


def test_assign_cells_mapside_bit_parity(spark):
    """assign_cells_mapside (the zero-shuffle append-path twin) must
    produce the SAME (id, cell) set as the posexplode assign_cells —
    identical |c|^2 - 2*v*c score, identical fold order, identical tie
    rule — on the full test corpus at two nprobe values."""
    from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (
        assign_cells,
        assign_cells_mapside,
        fit_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = fit_ivf_centroids(emb, k=8, iters=2)
    for nprobe in (1, 3):
        a = {(r[0], r[1]) for r in assign_cells(emb, cents, nprobe=nprobe).collect()}
        b = {
            (r[0], r[1])
            for r in assign_cells_mapside(emb, cents, nprobe=nprobe).collect()
        }
        assert a == b and len(a) > 0


def test_partial_query_probes_raise_not_vanish(spark, emb):
    """r13 ADVICE: a stale/partial query_probes artifact must fail loudly —
    silently dropping the unlisted queries from the results would read as
    'no neighbors'. Both the IVF and IVF-PQ serving paths carry the guard."""
    cents = fit_ivf_centroids(emb, k=CLUSTERS, iters=4)
    queries = emb.filter("vec_id < 3")
    # probes frame missing vec_id=2
    partial = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (1, 1)], "query_id long, cell int"
    )
    with pytest.raises(ValueError, match="query_probes has no rows"):
        ivf_topk(emb, queries, cents, k=5, nprobe=2, query_probes=partial).collect()

    from gdelt_2_0_event_database_pipeline_spark.operators.pq import (
        fit_pq_codebooks,
        ivf_pq_topk,
    )

    books = fit_pq_codebooks(emb, m=4, ncodes=8, iters=2)
    with pytest.raises(ValueError, match="query_probes has no rows"):
        ivf_pq_topk(
            emb, queries, cents, books, k=5, nprobe=2, query_probes=partial
        ).collect()
