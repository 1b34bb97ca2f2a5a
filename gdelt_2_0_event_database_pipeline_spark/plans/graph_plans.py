"""Graph analytics queries: triangle counting and bounded-k reachability.

Graphs are derived from the TPC-H-ish relational tables (the GDELT analog:
actor co-occurrence networks over events — same co-occurrence shape, no
actor columns in the synthetic data):

- **co-supply graph** — suppliers are linked when they appear in the same
  order at least ``MIN_W`` times (a weighted co-occurrence projection of
  the order-supplier bipartite graph, thresholded so the graph is neither
  empty nor complete).
- **customer-supplier bipartite graph** — customers and suppliers share
  one id space via ``2k`` / ``2k+1`` parity encoding; reachability from a
  seed-customer slice alternates sides (the collaborative-filtering
  "customers like you" expansion).

Oracles: the triangle query's oracle repeats the wedge+closing-edge join
in SQL; the k-hop oracle is a bounded RECURSIVE CTE with min-hop
aggregation — DuckDB explores paths, Spark's BFS expands each node once at
its minimum hop, and the results must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .relational import _t

#: co-occurrence weight threshold for the co-supply graph
_MIN_W = 25


def _cosupply_edges(spark, sf_dir):
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _MIN_W)
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )


_COSUPPLY_SQL = f"""
    d AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT a.l_suppkey AS a, b.l_suppkey AS b
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= {_MIN_W}
    )
"""


@register(
    "q_triangle_count",
    sql=f"""
    WITH {_COSUPPLY_SQL},
    tri AS (
      SELECT ab.a AS ta, ab.b AS tb, bc.b AS tc
      FROM e ab JOIN e bc ON ab.b = bc.a
      WHERE EXISTS (
        SELECT 1 FROM e cl WHERE cl.a = ab.a AND cl.b = bc.b
      )
    ),
    pn AS (
      SELECT node, count(*) AS cnt FROM (
        SELECT ta AS node FROM tri
        UNION ALL SELECT tb FROM tri
        UNION ALL SELECT tc FROM tri
      ) GROUP BY node
    ),
    nodes AS (
      SELECT a AS node FROM e UNION SELECT b FROM e
    )
    SELECT n.node, COALESCE(pn.cnt, 0) AS n_triangles
    FROM nodes n LEFT JOIN pn ON n.node = pn.node
    """,
    doc=(
        "Per-node triangle counts on the thresholded co-supply graph: "
        "ordered distinct edges, wedge join on the shared middle node, "
        "closing-edge semi join — each triangle found exactly once, two "
        "integer equi-joins total (the O(sum deg^2) wedge step every "
        "distributed triangle algorithm pays, halved by the orientation)."
    ),
)
def q_triangle_count(spark, sf_dir):
    from ..operators.graph import triangle_count

    out = triangle_count(_cosupply_edges(spark, sf_dir))
    return out.select("node", F.col("n_triangles").cast("long").alias("n_triangles"))


@register(
    "q_khop_reach",
    sql="""
    WITH RECURSIVE
    e AS (
      SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
    reach(node, hop) AS (
      SELECT c_custkey * 2, 0 FROM customer WHERE c_custkey % 97 = 0
      UNION
      SELECT und.v, reach.hop + 1
      FROM reach JOIN und ON und.u = reach.node
      WHERE reach.hop < 3
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hop
    FROM reach GROUP BY node
    """,
    doc=(
        "3-hop reachability from the c_custkey%97 seed slice over the "
        "customer-supplier bipartite graph (2k/2k+1 parity id space): "
        "Spark runs frontier BFS — each node expanded once at its minimum "
        "hop, anti-join against visited, localCheckpoint per round — while "
        "the oracle's bounded RECURSIVE CTE explores paths and min-aggregates; "
        "exact agreement is the differential."
    ),
)
def q_khop_reach(spark, sf_dir):
    from ..operators.graph import k_hop

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    out = k_hop(edges, seeds, k=3)
    return out.select("node", F.col("hop").cast("long").alias("hop"))


_LPA_ITERS = 4

# one CTE per synchronous round: votes = neighbor labels weighted by edge
# count, winner = (weight desc, label asc) — integer weights + a total
# order make every round engine-exact (no rounding anywhere)
_LPA_ROUNDS = ",\n    ".join(
    f"""l{k} AS (
      SELECT node, label FROM (
        SELECT v.node, v.label,
               row_number() OVER (
                 PARTITION BY v.node ORDER BY v.wt DESC, v.label ASC
               ) AS rn
        FROM (SELECT s.me AS node, p.label, count(*) AS wt
              FROM sym s JOIN l{k - 1} p ON p.node = s.nbr
              GROUP BY s.me, p.label) v
      ) WHERE rn = 1
    )"""
    for k in range(1, _LPA_ITERS + 1)
)


@register(
    "q_label_propagation",
    sql=f"""
    WITH {_COSUPPLY_SQL},
    sym AS (
      SELECT a AS me, b AS nbr FROM e
      UNION ALL
      SELECT b AS me, a AS nbr FROM e
    ),
    l0 AS (SELECT DISTINCT me AS node, me AS label FROM sym),
    {_LPA_ROUNDS}
    SELECT node, label FROM l{_LPA_ITERS}
    """,
    doc=(
        "Label-propagation community detection over the thresholded "
        "co-supply graph (operators/graph.py label_propagation — Raghavan "
        "2007, the GraphFrames fixed-maxIter shape): 4 synchronous rounds, "
        "each ONE edge-label equi-join + grouped integer vote sum + a "
        "per-node window over its candidate labels; deterministic "
        "(weight desc, label asc) tie-break makes every round engine-"
        "exact, so the oracle unrolls all 4 rounds as chained CTEs and "
        "hash-matches with NO rounding (the q_pagerank discipline, minus "
        "the float tolerance). Labels are ids, never payloads; lineage "
        "localCheckpointed every 2 rounds."
    ),
)
def q_label_propagation(spark, sf_dir):
    from ..operators.graph import label_propagation

    return label_propagation(_cosupply_edges(spark, sf_dir), max_iter=_LPA_ITERS)
