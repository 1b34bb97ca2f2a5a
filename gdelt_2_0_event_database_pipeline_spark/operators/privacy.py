"""Privacy-hygiene operators for training-data release (extension surface;
the reference has no privacy stage — its nearest neighbour is NULL-column
filtering, ``filtering/filter.py:106-148``, and our PII scrubber
``text.redact_pii``).

k-anonymity is the standard pre-release gate: any combination of
quasi-identifier values shared by fewer than k rows is re-identifying and
must be suppressed (or generalized upstream). Both operators are one
grouped count over the quasi-identifier key — a single shuffle on the
column subset, never on payloads — followed by a broadcast-or-shuffle join
back; Catalyst picks broadcast when the violating-groups side is small,
which at 100 TB it is (violators are by definition the rare groups).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Per-equivalence-class audit: (quasi-identifier values, class size,
    whether the class violates k). NULL counts as a value (SQL GROUP BY
    semantics on both engines)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < k).alias("violates_k"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Drop every row whose quasi-identifier equivalence class has fewer
    than k members — the suppression route to a k-anonymous release. One
    window count over the quasi-key (single shuffle); rows with NULL quasi
    values form their own class, matching GROUP BY semantics."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in quasi_cols]))
    return df.withColumn("__cs__", w).filter(F.col("__cs__") >= k).drop("__cs__")
