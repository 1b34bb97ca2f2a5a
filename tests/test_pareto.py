"""2D skyline: known frontiers, tie semantics, bucket-prune differential
against a brute-force python dominance check."""

from __future__ import annotations

import random

from gdelt_2_0_event_database_pipeline_spark.operators.pareto import skyline2d


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_skyline_known_frontier(spark):
    rows = [
        (1, 1.0, 5.0),   # frontier (smallest x)
        (2, 2.0, 7.0),   # frontier (higher y)
        (3, 3.0, 6.0),   # dominated by 2 (larger x, smaller y)
        (4, 4.0, 9.0),   # frontier
        (5, 5.0, 9.0),   # dominated by 4 (same y, larger x)
    ]
    got = {r.id for r in skyline2d(_df(spark, rows), "x", "y").collect()}
    assert got == {1, 2, 4}


def test_skyline_ties_on_both_coordinates_all_survive(spark):
    rows = [(1, 1.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 0.5)]
    got = {r.id for r in skyline2d(_df(spark, rows), "x", "y").collect()}
    assert got == {1, 2}


def test_skyline_same_x_higher_y_dominates(spark):
    rows = [(1, 1.0, 2.0), (2, 1.0, 3.0)]
    got = {r.id for r in skyline2d(_df(spark, rows), "x", "y").collect()}
    assert got == {2}


def test_skyline_all_equal_x_degenerate(spark):
    rows = [(1, 5.0, 1.0), (2, 5.0, 2.0), (3, 5.0, 3.0)]
    got = {r.id for r in skyline2d(_df(spark, rows), "x", "y").collect()}
    assert got == {3}


def test_skyline_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        (i, float(rng.randrange(0, 40)), float(rng.randrange(0, 40)))
        for i in range(300)
    ]
    got = {r.id for r in skyline2d(_df(spark, rows), "x", "y", n_buckets=8).collect()}
    want = set()
    for i, xi, yi in rows:
        dominated = any(
            xj <= xi and yj >= yi and (xj < xi or yj > yi)
            for j, xj, yj in rows
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want and len(want) > 0


def test_skyline_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, None, 9.0), (3, 9.0, None)], "id long, x double, y double"
    )
    got = {r.id for r in skyline2d(df, "x", "y").collect()}
    assert got == {1}


# ---------------------------------------------------------------------------
# property-based: skyline == brute force on arbitrary small point sets
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _points(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    return [
        (i, float(draw(st.integers(0, 8))), float(draw(st.integers(0, 8))))
        for i in range(n)
    ]


@settings(max_examples=15, deadline=None)
@given(_points())
def test_skyline_property_matches_bruteforce(spark, pts):
    got = {
        r.id
        for r in skyline2d(_df(spark, pts), "x", "y", n_buckets=4).collect()
    }
    want = set()
    for i, xi, yi in pts:
        dominated = any(
            xj <= xi and yj >= yi and (xj < xi or yj > yi)
            for j, xj, yj in pts
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want
