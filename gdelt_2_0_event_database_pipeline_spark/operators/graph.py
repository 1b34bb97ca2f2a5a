"""Graph centrality over edge lists (SURVEY.md §2.10 extension surface).

Complements the connected-components machinery in :mod:`.dedup`
(``dedup_clusters``) with PageRank — the standard importance measure for
curation graphs: domain authority for web-crawl filtering, actor centrality
over event co-occurrence networks, source weighting for mixture design.

Spark-first shape: the graph only ever exists as an edge-list DataFrame.
Each power-iteration round is one join (edges × ranks on ``src``) plus one
grouped sum on ``dst`` — both shuffles on integer keys, never on payloads.
Dangling-node mass and the teleport term are 1-row driver aggregates
(bounded driver work, the IVF/CC discipline), and ``localCheckpoint``
truncates lineage each round so 10+ iterations don't stack a 10-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    damping: float = 0.85,
    max_iter: int = 10,
    dedup_edges: bool = True,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Semantics: standard Brin-Page with uniform teleport and dangling-mass
    redistribution — ``r' = (1-d)/n + d * (Σ_in r/outdeg + dangling/n)``.
    Every node appearing as source or destination participates; parallel
    edges collapse to one unless ``dedup_edges=False`` (then multiplicity
    weights the transition). Returns (node, rank) with ``Σ rank = 1`` up to
    float roundoff.

    Not SQL-oracle-expressible bit-identically (per-node in-neighbor sums
    are engine-order-dependent floats); invariants are pinned in
    ``tests/test_graph.py`` against a pure-Python power iteration.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    # Collapse the raw edge list ONCE into a row-stochastic weighted
    # adjacency: parallel edges become a multiplicity weight (or 1 under
    # dedup_edges), normalized by out-weight. Iterations then join against
    # |distinct pairs| rows, not |raw edges| — on multiplicity-heavy graphs
    # (co-occurrence, trade) that is orders of magnitude smaller.
    mult = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("__m__"))
    w = F.lit(1.0) if dedup_edges else F.col("__m__").cast("double")
    adj = mult.select("src", "dst", w.alias("w"))
    outw = adj.groupBy("src").agg(F.sum("w").alias("outw"))
    adj = (
        adj.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
        .localCheckpoint()
    )

    nodes = (
        adj.select(F.col("src").alias("node"))
        .union(adj.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    # (node, outdeg) for every node; dangling nodes get outdeg NULL
    base = nodes.join(
        outw.select(F.col("src").alias("__s__"), F.col("outw").alias("outdeg")),
        nodes.node == F.col("__s__"),
        "left",
    ).select("node", "outdeg").localCheckpoint()

    ranks = base.select("node", F.lit(1.0 / n).alias("rank"), "outdeg")
    teleport = (1.0 - damping) / n
    # Dangling handling costs a 1-row aggregate per round; most curation
    # graphs (co-occurrence, trade, link graphs with back-edges) have none,
    # so probe once and take the cheaper loop body when possible.
    has_dangling = base.filter(F.col("outdeg").isNull()).limit(1).count() > 0
    for it in range(max_iter):
        contrib = (
            adj.join(ranks, adj.src == ranks.node, "inner")
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        new_rank = F.lit(teleport) + F.lit(damping) * F.coalesce(
            "inflow", F.lit(0.0)
        )
        joined = base.join(contrib, base.node == contrib.dst, "left")
        if has_dangling:
            # the dangling mass is a 1-row aggregate broadcast to every node
            # inside the SAME job — no driver round-trip per iteration
            dang = ranks.filter(F.col("outdeg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang__")
            )
            joined = joined.crossJoin(F.broadcast(dang))
            new_rank = new_rank + F.lit(damping) * (F.col("__dang__") / n)
        ranks = joined.select("node", new_rank.alias("rank"), "outdeg")
        # checkpoint every k rounds: lineage stays bounded at k plan layers
        # while halving (k=2) the materialization jobs — on huge graphs set
        # checkpoint_interval=1 to trade jobs for minimal recompute surface
        if (it + 1) % max(checkpoint_interval, 1) == 0 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")
