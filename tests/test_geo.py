"""Geo grid operators: hotspot counting and the bucketed radius join,
including the stencil-vs-bruteforce differential that proves the 3x3
neighbor probe finds exactly the all-pairs result."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.geo import (
    geo_hotspots,
    geo_radius_join,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat long, lon long")


def test_hotspots_counts_sum_to_total(spark):
    rows = [(i, (i % 7) * 1_000_000 + 500, (i % 3) * 1_000_000 + 900) for i in range(50)]
    out = geo_hotspots(_pts(spark, rows), "lat", "lon", cell_size=1_000_000)
    assert out.agg(F.sum("n_points")).collect()[0][0] == 50
    assert out.count() == len({((i % 7), (i % 3)) for i in range(50)})


def test_hotspots_top_n_total_order(spark):
    rows = [(i, 100, 100) for i in range(5)] + [(10 + i, 2_000_000, 100) for i in range(3)]
    top = geo_hotspots(_pts(spark, rows), "lat", "lon", cell_size=1_000_000, top_n=1).collect()
    assert len(top) == 1 and top[0].n_points == 5 and top[0].cell_lat == 0


def test_radius_join_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(0, 5_000_000), rng.randrange(0, 5_000_000))
        for i in range(120)
    ]
    r = 400_000
    got = {
        (x.id_a, x.id_b, x.dist2)
        for x in geo_radius_join(_pts(spark, rows), "id", "lat", "lon", r).collect()
    }
    want = set()
    for i, (ia, la, na) in enumerate(rows):
        for ib, lb, nb in rows[i + 1 :]:
            d2 = (la - lb) ** 2 + (na - nb) ** 2
            if d2 <= r * r:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                want.add((a, b, d2))
    assert got == want and len(want) > 0


def test_radius_join_boundary_inclusive_and_once(spark):
    # exactly at the radius -> included; pair reported exactly once even
    # though both orientations probe each other's cells
    rows = [(1, 0, 0), (2, 300_000, 400_000)]  # dist = 500_000 exactly
    out = geo_radius_join(_pts(spark, rows), "id", "lat", "lon", 500_000).collect()
    assert [(r.id_a, r.id_b, r.dist2) for r in out] == [(1, 2, 500_000**2)]


def test_radius_join_cross_cell_pairs_found(spark):
    # points in adjacent cells but within radius — the stencil must catch them
    rows = [(1, 999_999, 0), (2, 1_000_001, 0)]
    out = geo_radius_join(_pts(spark, rows), "id", "lat", "lon", 1_000_000)
    assert out.count() == 1
