"""PageRank tests: differential against a pure-Python power iteration with
identical semantics, plus structural invariants."""

from __future__ import annotations

import pytest

from gdelt_2_0_event_database_pipeline_spark.operators.graph import pagerank


def _py_pagerank(edges, d=0.85, iters=10):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for s, t in edges:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    return r


def test_pagerank_matches_reference_power_iteration(spark):
    # mixed graph: a hub, a cycle, a dangling sink
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (3, 5)]  # 5 dangles
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, max_iter=10).collect()}
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_center_dominates_and_parallel_edges_dedup(spark):
    edges = [(i, 0) for i in range(1, 6)] + [(1, 0), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    # hub outranks every spoke (node 1 is higher still: it receives ALL of
    # the hub's mass while spokes live off teleport alone)
    assert all(got[0] > got[i] for i in range(2, 6))
    # duplicate (1,0) edge must not double node 1's influence
    want = _py_pagerank(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_empty_and_bad_damping(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.graph import (  # noqa: E402
    k_hop,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_k4_every_node_in_three(spark):
    # K4: 4 triangles total, every node participates in C(3,2)=3
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r.node: r.n_triangles for r in triangle_count(_edges(spark, pairs)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_direction_duplicates_selfloops_collapse(spark):
    # triangle 0-1-2 written with reversed/duplicate edges + a self-loop +
    # a dangling pendant node 3 (zero triangles, still reported)
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (2, 3)]
    got = {r.node: r.n_triangles for r in triangle_count(_edges(spark, pairs)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}


def test_triangle_free_graph_all_zero(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]  # path: no triangles
    got = triangle_count(_edges(spark, pairs)).collect()
    assert {r.node for r in got} == {0, 1, 2, 3}
    assert all(r.n_triangles == 0 for r in got)


def test_triangle_two_shared_edge(spark):
    # bowtie-ish: triangles (0,1,2) and (1,2,3) share edge 1-2
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    got = {r.node: r.n_triangles for r in triangle_count(_edges(spark, pairs)).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


# ---------------------------------------------------------------------------
# Bounded-k BFS reachability
# ---------------------------------------------------------------------------


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_khop_chain_min_hops(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 beyond k


def test_khop_undirected_vs_directed(spark):
    e = _edges(spark, [(1, 0), (1, 2)])  # arrows point away from 0 only via 1
    und = {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=2).collect()}
    assert und == {0: 0, 1: 1, 2: 2}
    dird = {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=2, directed=True).collect()}
    assert dird == {0: 0}  # 0 has no out-edges


def test_khop_min_hop_wins_on_multiple_paths(spark):
    # diamond: 0->1->3 and 0->3 direct; 3 must label hop 1, not 2
    e = _edges(spark, [(0, 1), (1, 3), (0, 3)])
    got = {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=3).collect()}
    assert got[3] == 1


def test_khop_k0_and_early_termination(spark):
    e = _edges(spark, [(0, 1)])
    assert {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=0).collect()} == {0: 0}
    # component exhausted before k: loop must stop, labels stay minimal
    got = {r.node: r.hop for r in k_hop(e, _seeds(spark, [0]), k=10).collect()}
    assert got == {0: 0, 1: 1}


# --- label propagation ------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.graph import (  # noqa: E402
    label_propagation,
)


def _py_lpa(edges, iters, weights=None):
    """Reference synchronous LPA with the operator's exact rules:
    symmetrized votes, weight desc then smallest-label tie-break."""
    sym = {}
    for i, (a, b) in enumerate(edges):
        w = weights[i] if weights else 1
        sym.setdefault(a, []).append((b, w))
        sym.setdefault(b, []).append((a, w))
    labels = {n: n for n in sym}
    for _ in range(iters):
        new = {}
        for n, nbrs in sym.items():
            votes = {}
            for m, w in nbrs:
                votes[labels[m]] = votes.get(labels[m], 0) + w
            new[n] = min(votes, key=lambda lb: (-votes[lb], lb))
        labels = new
    return labels


def _lpa_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_lpa_two_cliques_with_bridge(spark):
    # two 4-cliques joined by one bridge edge: two communities
    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = cl1 + cl2 + [(3, 10)]
    got = {r["node"]: r["label"] for r in
           label_propagation(_lpa_df(spark, edges), max_iter=4).collect()}
    want = _py_lpa(edges, 4)
    assert got == want
    assert len({got[n] for n in range(4)}) == 1          # clique 1 agrees
    assert len({got[n] for n in range(10, 14)}) == 1     # clique 2 agrees
    assert got[0] != got[12]                             # two communities


def test_lpa_matches_reference_on_random_graph(spark):
    import random

    rng = random.Random(9)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    for iters in (1, 3, 5):
        got = {r["node"]: r["label"] for r in
               label_propagation(_lpa_df(spark, edges), max_iter=iters).collect()}
        assert got == _py_lpa(edges, iters)


def test_lpa_deterministic_under_repartition(spark):
    edges = [(a, b) for a in range(8) for b in range(8) if a < b and (a + b) % 3]
    df = _lpa_df(spark, edges)
    a = {r["node"]: r["label"] for r in
         label_propagation(df.repartition(1), max_iter=4).collect()}
    b = {r["node"]: r["label"] for r in
         label_propagation(df.repartition(11), max_iter=4).collect()}
    assert a == b


def test_lpa_weighted_votes_and_guard(spark):
    # node 2's single heavy edge outvotes its two light ones
    rows = [(1, 2, 5.0), (2, 3, 1.0), (2, 4, 1.0), (3, 4, 1.0)]
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, max_iter=1, weight_col="w").collect()}
    assert got[2] == 1  # weight 5 beats the 1+1 votes' labels
    want = _py_lpa([(a, b) for a, b, _ in rows], 1, weights=[w for _, _, w in rows])
    assert got == want
    with pytest.raises(ValueError, match="max_iter"):
        label_propagation(df, max_iter=0)
