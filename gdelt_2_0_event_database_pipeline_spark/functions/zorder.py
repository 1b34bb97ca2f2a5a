"""Z-order (Morton) interleaving for multi-column data skipping.

`sources.lake.write_clustered` prunes files on ONE leading column; queries
filtering the second cluster column still scan everything. Z-ordering
interleaves the bits of several columns into one key, so sorting by the key
gives every participating column locality — parquet min/max file stats stay
tight on ALL of them, and predicates on any single dimension prune files
(the Delta/Iceberg `OPTIMIZE ZORDER BY` technique, here as a plain Column
expression + repartitionByRange write).

Pure integer bit algebra (shift/and/or), codegen-eligible and reproducible
on any engine — the oracle replays the literal same expression in SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT.

    Bit ``b`` of column ``i`` lands at position ``b * n_cols + i`` — round-
    robin interleaving, so a sort on the key alternates locality between
    dimensions. Inputs must be non-negative integers small enough to fit in
    ``bits`` bits (pre-scale skewed/continuous columns with a bucket or rank
    first; values above the range alias into it via the masking, which
    degrades locality but stays correct). NULL is treated as 0 (sorts
    first, like NULLS FIRST). ``bits * n_cols`` must stay below 63.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns (use write_clustered for 1)")
    if bits < 1 or bits * n > 62:
        raise ValueError(f"bits * n_cols must be in [n, 62], got {bits * n}")
    parts = []
    for i, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        cc = F.coalesce(cc.cast("long"), F.lit(0))
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The ANSI-SQL twin of :func:`zorder_key` — generated from the same
    loop so the two expressions cannot drift. Used by the DuckDB oracle."""
    n = len(cols)
    # full parens per term: Postgres-family engines give <<, & and | EQUAL
    # precedence with left associativity, so an unparenthesized chain
    # a << 5 | b << 7 parses as ((a << 5) | b) << 7
    terms = [
        f"(((coalesce(CAST({c} AS BIGINT), 0) >> {b}) & 1) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the Morton
    key so each output file covers a tight hyper-rectangle of the cluster
    columns — predicates on ANY of them prune files via parquet min/max
    stats. One sampling range-exchange at write time, like
    ``write_clustered``; the synthetic key is dropped before writing."""
    z = zorder_key(list(cluster_cols), bits=bits)
    (
        df.withColumn("__zorder__", z)
        .repartitionByRange(num_files, "__zorder__")
        .sortWithinPartitions("__zorder__")
        .drop("__zorder__")
        .write.mode(mode)
        .parquet(path)
    )
