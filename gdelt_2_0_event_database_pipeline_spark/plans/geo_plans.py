"""Geospatial grid queries (hotspot density + radius pair join).

The synthetic ``events`` table has no lat/lon, so both queries derive a
deterministic planar point cloud from ``(user_id, event_id)`` with pure
BIGINT arithmetic — users form ~0.8-degree clusters, which gives the
hotspot count a real skew profile and the radius join real pair density.
The SAME derivation runs in the DuckDB oracle, so cell assignment, stencil
candidate generation, and the exact integer distance predicate are all
under cross-engine test (the oracle does the brute O(n^2) pair join the
Spark plan is designed to avoid).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .relational import _events

#: deterministic synthetic microdegree coordinates (non-negative planar
#: domain; see operators/geo.py for why integer microdegrees)
_LAT = (
    "CAST(user_id AS BIGINT) * 1000000 "
    "+ (CAST(event_id AS BIGINT) * 2654435761) % 800000"
)
_LON = (
    "((CAST(user_id AS BIGINT) * 7919) % 360) * 1000000 "
    "+ (CAST(event_id AS BIGINT) * 40503) % 800000"
)


def _points(spark, sf_dir, every: int = 1):
    e = _events(spark, sf_dir).select("event_id", "user_id")
    if every > 1:
        e = e.filter(F.col("event_id") % every == 0)
    return e.select(
        F.col("event_id").alias("id"),
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
    )


@register(
    "q_geo_hotspots",
    sql=f"""
    WITH p AS (
      SELECT {_LAT} AS lat, {_LON} AS lon FROM events
    ), c AS (
      SELECT lat // 1000000 AS cell_lat, lon // 1000000 AS cell_lon,
             count(*) AS n_points
      FROM p GROUP BY 1, 2
    )
    SELECT cell_lat, cell_lon, n_points
    FROM c ORDER BY n_points DESC, cell_lat, cell_lon LIMIT 25
    """,
    doc=(
        "Event-density hotspots: 1-degree grid cells by integer division "
        "(engine-exact on the non-negative microdegree domain), grouped "
        "count, top-25 densest cells under a total order. One shuffle + "
        "TakeOrderedAndProject — no global sort."
    ),
)
def q_geo_hotspots(spark, sf_dir):
    from ..operators.geo import geo_hotspots

    return geo_hotspots(
        _points(spark, sf_dir), "lat", "lon", cell_size=1_000_000, top_n=25
    )


@register(
    "q_geo_radius_join",
    sql=f"""
    WITH p AS (
      SELECT event_id AS id, {_LAT} AS lat, {_LON} AS lon
      FROM events WHERE event_id % 20 = 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
    FROM p a JOIN p b ON a.id < b.id
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= 90000000000
    """,
    doc=(
        "Proximity pair join (0.3-degree radius) over a 1-in-20 point "
        "sample: Spark buckets points into radius-sized cells and probes "
        "the 3x3 stencil with ONE equi-join on cell ids (9x fan-out, no "
        "CartesianProduct), then verifies with the exact BIGINT squared "
        "distance; the oracle runs the brute all-pairs join the bucketed "
        "plan avoids — a true cross-engine algorithm differential."
    ),
)
def q_geo_radius_join(spark, sf_dir):
    from ..operators.geo import geo_radius_join

    return geo_radius_join(
        _points(spark, sf_dir, every=20), "id", "lat", "lon", radius=300_000
    )
