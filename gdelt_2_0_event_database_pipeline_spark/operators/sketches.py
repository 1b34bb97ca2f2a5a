"""Approximate sketches at scale (SURVEY.md §2.10 X5).

Thin, named wrappers over Spark's built-in sketch aggregates — the point is
the inventory surface (what a 100 TB pipeline reaches for instead of exact
global aggregates) plus documented error contracts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count, relative standard deviation ``rsd``.
    One pass, O(1) memory per group — the 100 TB replacement for
    count(DISTINCT x), whose exact form forces a full shuffle on x."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], relative_error: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantile sketch (single pass, mergeable)."""
    return df.approxQuantile(col, probabilities, relative_error)


def percentile_approx(col: str, percentage: float, accuracy: int = 10000) -> Column:
    """t-digest-style approximate percentile aggregate (group-able)."""
    return F.percentile_approx(col, percentage, accuracy)


def frequent_items(df: DataFrame, cols: list[str], support: float = 0.01) -> DataFrame:
    """Karp et al. heavy hitters — one pass, no shuffle of raw values."""
    return df.freqItems(cols, support)


def hll_sketch_table(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group mergeable HLL sketch (Apache DataSketches binary) — the
    pre-aggregation a lake persists per partition/day so distinct counts
    over ANY coarser grouping come from unioning kilobyte sketches instead
    of re-scanning raw data. ~2^lg_k bytes per group; relative error
    ≈ 1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_rollup_estimate(
    sketches: DataFrame, merge_keys: list[str]
) -> DataFrame:
    """Union persisted per-group sketches up to ``merge_keys`` and estimate
    the distinct count — the incremental-maintenance read path: touching
    only the sketch table, never the raw events. Unlike additive counters,
    HLL unions are exact over overlap (re-processing a day twice does not
    double-count), which is what makes the sketch table idempotently
    maintainable."""
    grouped = (
        sketches.groupBy(*merge_keys)
        if merge_keys
        else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("distinct_est")
    )
