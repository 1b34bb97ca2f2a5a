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
