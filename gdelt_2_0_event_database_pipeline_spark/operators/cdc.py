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


def scd2_build(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    *,
    order_cols: Sequence[str] = (),
    collapse: bool = True,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from a change log.

    Input: one row per observed state ``(key, ts, attrs)``. Output: one row
    per *version* — ``(*key_cols, *attr_cols, valid_from, valid_to,
    version, is_current)`` where ``valid_from`` is the change timestamp,
    ``valid_to`` is the next version's ``valid_from`` (NULL on the current
    version, making intervals half-open ``[from, to)``), and ``version``
    numbers versions 1..n per key in time order.

    ``collapse=True`` (default) drops no-op changes: a log row whose
    ``attr_cols`` digest equals the previous row's for the same key starts
    no new version (standard SCD2 semantics — versions exist only where the
    tracked attributes actually changed). ``order_cols`` breaks timestamp
    ties deterministically (same-``ts`` rows produce zero-width versions
    that, under the half-open interval, match no point-in-time lookup
    except the final one at that instant).

    Scale shape: ONE shuffle on ``key_cols`` serves the collapse ``lag``,
    the ``valid_to`` ``lead``, and the version ``row_number`` — all three
    window functions share the same (partition, order) spec so Catalyst
    collapses them into a single Window node over a single Exchange.
    Dimension payloads ride that one shuffle once; no self-join.

    Extension surface beyond the reference (file-level ``.done``
    incrementality, ``conversion/converter.py:118-125``): the reference has
    no versioned-dimension story at all.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)

    base = list(key_cols) + [ts_col] + list(attr_cols)
    extra_order = [c for c in order_cols if c not in set(base)]
    out = changes.select(*base, *extra_order)
    if collapse:
        digest = _row_digest(attr_cols)
        out = (
            out.withColumn("__d__", digest)
            .withColumn("__pd__", F.lag("__d__").over(w))
            .filter(F.col("__pd__").isNull() | (F.col("__pd__") != F.col("__d__")))
            .drop("__d__", "__pd__")
        )
    out = (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    if ts_col != "valid_from":
        out = out.drop(ts_col)
    if extra_order:
        out = out.drop(*extra_order)
    return out


def scd2_pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time enrichment: each fact row picks the dimension version
    whose half-open validity interval ``[valid_from, valid_to)`` contains
    the fact timestamp (``valid_to IS NULL`` = open-ended current version).

    Left join — facts with no valid version at their timestamp (before the
    key's first version, or an unknown key) survive with NULL dimension
    columns. Intervals partition time per key (``scd2_build`` guarantees
    it), so each fact matches at most one version.

    Scale shape: an EQUI-join on ``key_cols`` with the interval predicate
    as join residual — Catalyst plans a shuffled (or AQE-broadcast) hash
    join on the key, and the per-key version list is short by construction
    (versions-per-entity, not events-per-entity), so the residual filter
    fans out boundedly. No range-join explosion, no window over facts.
    """
    # explicit aliases: facts and dim often share lineage (dimension built
    # from the same source table), which otherwise makes f[k] == d[k]
    # resolve to a trivially-true self-comparison
    f = facts.alias("__pit_f__")
    d = dim.alias("__pit_d__")
    fc = lambda c: F.col(f"__pit_f__.{c}")  # noqa: E731
    dc = lambda c: F.col(f"__pit_d__.{c}")  # noqa: E731
    cond = None
    for k in key_cols:
        c = fc(k) == dc(k)
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (fc(fact_ts) >= dc(valid_from))
        & (dc(valid_to).isNull() | (fc(fact_ts) < dc(valid_to)))
    )
    joined = f.join(d, cond, "left")
    # drop the duplicate key columns from the dimension side
    keep = [fc(c) for c in facts.columns] + [
        dc(c) for c in dim.columns if c not in set(key_cols)
    ]
    return joined.select(*keep)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set to a keyed snapshot — the batch MERGE/upsert:
    ``changes`` rows carry ``op_col`` in ``{'upsert', 'delete'}`` plus the
    full payload for upserts. Result: base rows minus deleted keys, with
    upserted keys replaced/inserted. The inverse of :func:`snapshot_diff`
    (``apply(old, diff(old, new) + payloads) == new`` — pinned as a
    round-trip property test).

    Assumes unique keys per side (keyed snapshots; duplicate change rows
    for one key are the caller's bug, same stance as ``snapshot_diff``).

    Plan: ONE full-outer join on the key columns (8-byte-ish keys;
    payloads ride once) with a map-side case merge — no window, no
    multi-pass. At lake scale this is the compaction-friendly shape:
    partition both sides by key range and the join is co-located.
    """
    ops = {"upsert", "delete"}
    c = changes.withColumn(
        op_col, F.lower(F.col(op_col))
    )
    payload_cols = [x for x in base.columns if x not in set(key_cols)]
    cb = base.alias("__b__")
    cc = c.alias("__c__")
    cond = None
    for k in key_cols:
        e = F.col(f"__b__.{k}") == F.col(f"__c__.{k}")
        cond = e if cond is None else cond & e
    j = cb.join(cc, cond, "full_outer")
    op = F.col(f"__c__.{op_col}")
    # deleted keys drop; upserts take the change payload; untouched keys
    # keep the base payload. Unknown ops fail IN-PLAN (assert_true rides
    # the job itself — no eager validation pass per call).
    op = F.when(
        op.isNull() | op.isin(*ops), op
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"unknown {op_col} value in changes: "), op
            )
        )
    )
    keep = op.isNull() | (op == "upsert")
    merged = j.filter(keep).select(
        *[
            F.coalesce(F.col(f"__c__.{k}"), F.col(f"__b__.{k}")).alias(k)
            for k in key_cols
        ],
        *[
            F.when(op == "upsert", F.col(f"__c__.{p}"))
            .otherwise(F.col(f"__b__.{p}"))
            .alias(p)
            for p in payload_cols
        ],
    )
    return merged
