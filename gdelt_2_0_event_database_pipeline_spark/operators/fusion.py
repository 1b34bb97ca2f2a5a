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
    query_col: str | None = None,
) -> DataFrame:
    """(id, rrf_score, rank): reciprocal-rank fusion of the given ranked
    frames. Items missing from a system simply contribute nothing (the
    standard RRF convention); ties in the fused score break toward the
    lower id. ``c`` damps the head of each list (60 is the published
    default).

    With ``query_col``, each input carries per-query ranked lists
    (query_col, id_col, rank_col) and fusion runs independently per
    query IN ONE JOB — the batch-pipeline shape: the grouped sum keys on
    (query, id) and the ranked window partitions by query, so at
    n_queries × n_systems × k input rows there is never a global sort
    and the per-partition window state is ≤ n_systems × k rows. Output
    gains the leading query_col."""
    if not rankings:
        raise ValueError("need at least one ranking to fuse")
    keys = ([query_col] if query_col else []) + [id_col]
    contribs = None
    for r in rankings:
        part = r.select(
            *[F.col(c_) for c_ in keys],
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col).cast("double"))).alias(
                "__contrib__"
            ),
        )
        contribs = part if contribs is None else contribs.unionByName(part)
    fused = contribs.groupBy(*keys).agg(
        F.sum("__contrib__").alias("rrf_score")
    )
    base = Window.partitionBy(query_col) if query_col else Window
    w = base.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rrf_score", "rank")
    )


def _cum_idcg(k: int) -> list[float]:
    """cum_idcg[j] = ideal DCG with j relevant items in the top positions
    (Σ_{i=1..j} 1/log2(i+1)), j = 0..k. Computed ONCE driver-side and
    embedded as literals in both the Spark plan and the DuckDB oracle —
    the LSH-plane-literal pattern — so libm log2 differences between
    engines can never surface."""
    import math

    out = [0.0]
    for i in range(1, k + 1):
        out.append(out[-1] + 1.0 / math.log2(i + 1))
    return out


def retrieval_metrics(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    decimals: int = 6,
) -> DataFrame:
    """Per-query IR metrics over a top-k ranking: hits, MRR, NDCG@k,
    precision@k, recall@k. ``relevance`` is (query_col, item_col) pairs of
    RELEVANT items (anything absent is irrelevant; the standard qrels
    shape). Queries with zero relevant items report NULL recall/ndcg.
    Queries that have qrels but ZERO ranked rows (upstream search
    returned nothing — malformed vector dropped, empty LSH buckets)
    still get a row with zero hits/mrr/ndcg/precision/recall, matching
    trec_eval: silently omitting them would bias averaged metrics
    upward toward only-the-queries-the-system-answered.

    Shapes: one broadcast-able semi-structured join (rankings are nq×k by
    construction) plus a grouped aggregate on the relevance table for
    per-query totals — nothing scales with the corpus, only with the
    ranked output. DCG positions use 1/log2(rank+1) with the cumulative
    ideal table embedded as literals (``_cum_idcg``); float aggregates
    are rounded to ``decimals`` on both engines per the cross-engine
    compare convention (sub-ULP libm/summation-order drift)."""
    rel = relevance.select(
        F.col(query_col), F.col(item_col), F.lit(1).alias("__rel__")
    ).dropDuplicates([query_col, item_col])
    totals = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("__total_rel__")
    )
    log2_inv = _cum_idcg(k)
    # per-position DCG contribution as a literal lookup: 1/log2(rank+1)
    pos_gain = F.array(
        *[F.lit(log2_inv[i + 1] - log2_inv[i]) for i in range(k)]
    )
    cum = F.array(*[F.lit(v) for v in log2_inv])

    j = (
        ranked.filter(F.col(rank_col) <= k)
        .join(rel, [query_col, item_col], "left")
        .withColumn("__rel__", F.coalesce(F.col("__rel__"), F.lit(0)))
    )
    per_q = j.groupBy(query_col).agg(
        F.sum("__rel__").alias("hits"),
        F.max(
            F.when(F.col("__rel__") == 1, 1.0 / F.col(rank_col))
        ).alias("__mrr__"),
        F.sum(
            F.when(
                F.col("__rel__") == 1,
                F.element_at(pos_gain, F.col(rank_col)),
            )
        ).alias("__dcg__"),
    )
    # FULL outer: keep ranked-only queries (no qrels -> NULL recall/ndcg)
    # AND qrels-only queries (system answered nothing -> all-zero row).
    out = (
        per_q.join(totals, query_col, "full")
        .withColumn("__total_rel__", F.coalesce(F.col("__total_rel__"), F.lit(0)))
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
    )
    ideal = F.element_at(
        cum, (F.least(F.col("__total_rel__"), F.lit(k)) + 1).cast("int")
    )
    return out.select(
        F.col(query_col),
        F.col("hits").cast("long").alias("hits"),
        F.round(F.coalesce(F.col("__mrr__"), F.lit(0.0)), decimals).alias("mrr"),
        F.when(
            F.col("__total_rel__") > 0,
            F.round(F.coalesce(F.col("__dcg__"), F.lit(0.0)) / ideal, decimals),
        ).alias("ndcg_at_k"),
        F.round(F.col("hits") / F.lit(float(k)), decimals).alias(
            "precision_at_k"
        ),
        F.when(
            F.col("__total_rel__") > 0,
            F.round(F.col("hits") / F.col("__total_rel__"), decimals),
        ).alias("recall_at_k"),
    )
