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
