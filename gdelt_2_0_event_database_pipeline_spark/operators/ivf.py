"""IVF (inverted-file) approximate nearest-neighbor search (SURVEY.md §2.10
X3 scale path, complementing sign-LSH in ``similarity.py``).

Classic two-level ANN: a small k-means codebook (the coarse quantizer)
partitions the corpus into cells; a query probes only its ``nprobe`` nearest
cells and exact-rescores inside them — corpus scanned once to assign cells,
then every search touches ~nprobe/k of the data.

Spark-first shape:
- **fit**: Lloyd iterations as DataFrame aggregations. Centroids are tiny
  (k×dim floats) so they round-trip through the driver each iteration and
  enter the next plan as literals — no MLlib model object, fully
  deterministic (hash-seeded init, fixed iteration count).
- **search**: cell assignment is a pure expression against literal
  centroids (map-only); the probe join is an equi-join on cell id.

Sign-LSH vs IVF: LSH is stateless/streaming-friendly; IVF adapts to the
data distribution (clustered corpora get far better recall at the same
candidate budget) at the cost of a fit pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _as_double, cosine


def _sq_dist_to(vec: Column, center: Sequence[float]) -> Column:
    carr = F.array(*[F.lit(float(w)) for w in center])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, w: (x - w) * (x - w)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def nearest_cells(vec: Column, centroids: list[list[float]], nprobe: int = 1) -> Column:
    """array<int> of the ``nprobe`` nearest centroid ids (ascending distance;
    ties break toward the lower id via the packed sort key)."""
    dists = F.array(
        *[
            F.struct(
                _sq_dist_to(vec, c).alias("d"), F.lit(i).alias("cid")
            )
            for i, c in enumerate(centroids)
        ]
    )
    ordered = F.array_sort(dists)  # struct sort: by d, then cid
    return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["cid"])


def fit_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic k-means-lite: init = k rows ranked by xxhash64(id, seed)
    (reproducible on any partitioning), then ``iters`` Lloyd steps. Each step
    is one groupBy over the corpus with dim avg-aggregates; centroids travel
    driver↔plan as literals. Empty cells keep their previous centroid."""
    v = _as_double(vec_col)
    dim_row = df.select(F.size(v).alias("d")).first()
    if dim_row is None:
        raise ValueError("cannot fit IVF on an empty corpus")
    dim = dim_row.d

    init_rows = (
        df.select(v.alias("__v__"), F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h__"))
        .orderBy("__h__")
        .limit(k)
        .collect()
    )
    centroids = [list(r["__v__"]) for r in init_rows]

    for _ in range(iters):
        assigned = df.select(
            v.alias("__v__"),
            nearest_cells(v, centroids, 1)[0].alias("__cell__"),
        )
        new = (
            assigned.groupBy("__cell__")
            .agg(
                *[
                    F.avg(F.element_at("__v__", j + 1)).alias(f"c{j}")
                    for j in range(dim)
                ]
            )
            .collect()
        )
        for r in new:
            centroids[r["__cell__"]] = [r[f"c{j}"] for j in range(dim)]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k through the IVF index: corpus rows live in
    their nearest cell; each query probes its ``nprobe`` nearest cells and
    exact-rescores the members. Output schema matches
    ``similarity.cosine_topk``."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv__")
    ).withColumn("__cell__", nearest_cells(F.col("__cv__"), centroids, 1)[0])

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv__")
    ).withColumn(
        "__cell__",
        F.explode(nearest_cells(F.col("__qv__"), centroids, nprobe)),
    )

    scored = (
        c.alias("c")
        .join(
            F.broadcast(q.alias("q")),
            (F.col("c.__cell__") == F.col("q.__cell__"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cos_sim", cosine(F.col("__qv__"), F.col("__cv__")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
