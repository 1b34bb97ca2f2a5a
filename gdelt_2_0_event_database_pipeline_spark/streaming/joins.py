"""Watermarked stream-stream joins (SURVEY.md §2.9 extension surface).

The reference has no streams at all; this is the Spark-native shape for the
classic attribution workload — join two unbounded streams (impressions ×
conversions, requests × responses, downloads × checksums) where a match must
arrive within a bounded event-time interval of its partner.

Why the time bound is load-bearing at scale: an unbounded stream-stream join
would buffer both sides forever. The watermark + interval condition lets
Spark evict buffered rows the moment no future match is possible, so state
size is O(rate × window), independent of stream length — the property that
makes the join runnable on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    within_minutes: int = 30,
    late_minutes: int = 10,
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` events to ``left`` events with the same ``on`` keys and
    ``right_ts`` in ``[left_ts, left_ts + within_minutes]``.

    Both sides are watermarked with ``late_minutes`` allowed lateness — the
    combination of watermark and interval condition is what lets Spark bound
    the join state (and, for ``how='leftOuter'``, what tells it when an
    unmatched left row is *final* and can emit with NULL right columns).

    The right side's timestamp is exposed as ``right_<right_ts>`` in the
    output (and the interval condition), so the two event times stay
    distinguishable; all other column names must be disjoint apart from the
    join keys, as in any equi-join.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    r_ts = f"right_{right_ts}"
    lw = left.withWatermark(left_ts, f"{late_minutes} minutes")
    rw = (
        right.withColumnRenamed(right_ts, r_ts)
        .withWatermark(r_ts, f"{late_minutes} minutes")
    )
    cond = F.lit(True)
    for k in on:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(r_ts) >= F.col(left_ts))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    joined = lw.join(rw, cond, how)
    # drop the right side's duplicate key columns
    return joined.drop(*[rw[k] for k in on])
