"""Rank fusion for hybrid retrieval (SURVEY.md §2.10 X3/X4 extension).

Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009): given
ranked lists from several retrieval systems over a shared item id, the
fused score of an item is Σ_systems 1/(c + rank_s) — rank-only, so
incomparable system scores (BM25 log-ish vs cosine in [-1,1]) never
need calibration. The standard way to combine lexical and vector
retrieval in one pipeline.

Spark-first shape: each input is a (id, rank) frame (any extra columns
ignored); contributions union row-wise — n_systems × k rows total, tiny
by construction — then one groupBy(id) sum + a ranked window. All
arithmetic is rationals of small integers (1/(c+rank)), and IEEE
addition is commutative, so with any number of systems the fused score
is engine-exact up to summation ORDER; the ``q_hybrid_rrf`` oracle uses
two systems, where commutativity alone guarantees bit-equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """(id, rrf_score, rank): reciprocal-rank fusion of the given ranked
    frames. Items missing from a system simply contribute nothing (the
    standard RRF convention); ties in the fused score break toward the
    lower id. ``c`` damps the head of each list (60 is the published
    default)."""
    if not rankings:
        raise ValueError("need at least one ranking to fuse")
    contribs = None
    for r in rankings:
        part = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col).cast("double"))).alias(
                "__contrib__"
            ),
        )
        contribs = part if contribs is None else contribs.unionByName(part)
    fused = contribs.groupBy(id_col).agg(
        F.sum("__contrib__").alias("rrf_score")
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rrf_score", "rank")
    )
