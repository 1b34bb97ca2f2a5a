"""Snapshot diff (change-data-capture) between two lake states.

Extension surface beyond the reference (whose incremental story is
skip-existing downloads, ``scraping/scraper.py:239-242``, and ``.done``
markers, ``conversion/converter.py:118-125`` — file-level only, nothing
row-level). An incremental ingest pipeline needs the row-level twin: given
yesterday's snapshot and today's, which keys were added, removed, changed?

Shuffle economics at 100 TB: both sides reduce to ``(key_cols, digest)``
before the full-outer join — an 8-byte ``xxhash64`` digest of the compared
columns travels, never the payloads (a wide document row can be kilobytes;
the diff join moves 16 bytes of it). Same hash-collision stance as
``dedup.dedup_exact_hash``: collision odds (2^-64 per changed row) are far
below data-corruption odds.

NULL discipline: Spark's multi-arg ``xxhash64`` *skips* NULL inputs (a NULL
argument leaves the running seed untouched), so ``(NULL, 'x')`` and
``('x', NULL)`` would collide and a value "moving" between columns would be
missed. Each column is therefore pre-hashed with a NULL sentinel
(``when(isNull, SENTINEL).otherwise(xxhash64(col))``) so every argument of
the combining hash is non-null and position-discriminating.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: arbitrary non-colliding stand-in for "this column is NULL" (any real
#: xxhash64 output matching it is a 2^-64 event, the accepted stance)
_NULL_SENTINEL = -6148914691236517206  # 0xAAAAAAAAAAAAAAAA as signed


def _row_digest(cols: Sequence[str]) -> Column:
    parts = [
        F.when(F.col(c).isNull(), F.lit(_NULL_SENTINEL)).otherwise(
            F.xxhash64(F.col(c))
        )
        for c in cols
    ]
    return F.xxhash64(*parts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns one row per key whose state differs:
    ``(*key_cols, change_type)`` with ``change_type`` in
    ``{'added','removed','changed'}`` (present only in ``new`` / only in
    ``old`` / in both with differing ``compare_cols``). Unchanged keys emit
    nothing. ``compare_cols`` defaults to all common non-key columns.

    Assumes ``key_cols`` are unique per snapshot (a keyed lake); duplicate
    keys make "changed" ill-defined and are the caller's bug.
    """
    if compare_cols is None:
        common = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in common if c not in set(key_cols)]
    if not compare_cols:
        raise ValueError("no compare columns (all common columns are keys)")

    o = old.select(*key_cols, _row_digest(compare_cols).alias("__old_d__"))
    n = new.select(*key_cols, _row_digest(compare_cols).alias("__new_d__"))
    joined = o.join(n, on=list(key_cols), how="full_outer")
    change = (
        F.when(F.col("__old_d__").isNull(), F.lit("added"))
        .when(F.col("__new_d__").isNull(), F.lit("removed"))
        .when(F.col("__old_d__") != F.col("__new_d__"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
