"""Reproducible distributed sampling.

Re-expresses the reference's four sampling modes (``sampling/samplers.py``:
indexed ``:83-99``, daily ``:125-160``, filtered reservoir ``:352-402``,
stratified reservoir ``:405-466``; seeded RNG facade ``sampling/rng.py:8-39``)
on the DataFrame API. The reference's contract is *exact-n uniform sampling
without replacement, reproducible under a seed* — not a specific RNG stream —
so the implementations preserve the contract, not the byte stream.

Determinism design
------------------
``F.rand(seed)`` is seeded **per partition**, so its output depends on input
partitioning — fragile across cluster sizes. Instead, when the caller names
key columns, rows are ranked by ``xxhash64(key..., seed)``: a pure function of
row content, hence identical on 1 executor or 1000, any partitioning, any file
split. Sampling = global top-n in hash order, which Spark executes as
``TakeOrderedAndProject`` — a per-partition O(n) heap + driver merge of
n·num_partitions candidates, no full sort, no full shuffle. This is the
scalable analogue of the reference's single-pass reservoir (Algorithm R,
``samplers.py:352-402``): one scan, O(n) state per partition.

Semantics preserved exactly (SURVEY.md §2.11):
- without replacement; raises if ``n`` exceeds the row count when
  ``strict=True`` (reference ``samplers.py:86-87``);
- stratified: exactly ``n_per_group`` per stratum, fewer iff the stratum is
  smaller; NULL stratum participates as ``"__NA__"``;
- filtered sampling: every output row satisfies the predicate; filter columns
  are scanned but dropped from the output projection.

Intentional deviation (documented in SURVEY.md §7): daily sampling is
per-day **global**, not per-day-per-file — the reference could emit more than
``per_day`` rows for a day split across files (``samplers.py:125-160``); the
global semantics are the ones its README describes.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.predicates import compile_filter

_RANK = "__sg_rank__"
_RN = "__sg_rn__"


def _order_key(
    df: DataFrame,
    seed: int,
    key_cols: Sequence[str] | None,
    rank_hash: str = "xxhash64",
) -> Column:
    """Deterministic pseudo-random ordering key.

    With ``key_cols``: content-hash ranking — partitioning-independent and
    run-to-run stable (the reference guarantees seed-reproducibility,
    ``README.md:343-349``). Without: ``F.rand(seed)``, reproducible only for
    a stable input partitioning (documented fallback).

    ``rank_hash`` picks the hash: ``"xxhash64"`` (default — cheapest, 8-byte
    rank values) or ``"md5"`` — the *engine-portable* twin: every SQL engine
    computes the same MD5 of the same ``key\\x1fkey\\x1fseed`` string, so an
    md5-ranked sample is verifiable row-for-row against an external oracle
    (DuckDB: ``ORDER BY md5(concat_ws(chr(31), k1, k2, 'seed'))``). Both
    share the identical plan shape (TakeOrderedAndProject / window rank);
    only the rank expression differs, so an oracle check of the md5 path
    exercises the same sampling machinery the xxhash64 path runs.
    """
    if key_cols:
        if rank_hash == "md5":
            return F.md5(_key_string(key_cols, seed))
        if rank_hash != "xxhash64":
            raise ValueError(f"rank_hash must be 'xxhash64' or 'md5', got {rank_hash!r}")
        return F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return F.rand(seed)


def _key_string(key_cols: Sequence[str], seed: int) -> Column:
    """``key\\x1fkey\\x1fseed`` — the canonical cross-engine hash input.
    concat_ws skips NULLs identically in Spark and DuckDB; explicit string
    casts keep integer/date rendering engine-agnostic."""
    parts = [F.col(c).cast("string") for c in key_cols]
    return F.concat_ws("\x1f", *parts, F.lit(str(seed)))


def sample_uniform(
    df: DataFrame,
    n: int,
    seed: int = 42,
    key_cols: Sequence[str] | None = None,
    strict: bool = False,
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """Exact-n uniform sample without replacement (reference "indexed" mode,
    ``samplers.py:83-99`` + the global ``FileIndex`` it needs,
    ``indexer.py:14-101`` — the index/binary-search machinery has no Spark
    equivalent because global top-n in hash order replaces positional fetch).

    ``strict=True`` reproduces the reference's ``n > total_rows`` ValueError
    (``samplers.py:86-87``) at the cost of one metadata-served count.
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    if strict:
        total = df.count()
        if n > total:
            raise ValueError(f"Requested sample size {n} > total rows {total}")
    return df.orderBy(_order_key(df, seed, key_cols, rank_hash)).limit(n)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    seed: int = 42,
    key_cols: Sequence[str] | None = None,
    na_bucket: str = "__NA__",
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """Exact ``n_per_group`` rows per distinct value of ``group_col``
    (reference stratified reservoir, ``samplers.py:405-466``).

    NULL group values participate as one ``na_bucket`` stratum and surface as
    that sentinel in the output column when the column is a string (reference
    ``samplers.py:421-423`` rewrites the column via ``fillna("__NA__")``).
    Undersized strata return all their rows (fill phase never completes,
    ``samplers.py:457-459``).

    Plan shape: one hash-partition shuffle on ``group_col`` + per-partition
    sort — rank-within-group via ``row_number``. At 100 TB this is the right
    primitive; skewed strata are split by AQE skew handling, and the shuffle
    is on the grouping key we'd need anyway.
    """
    if n_per_group <= 0:
        raise ValueError(f"n_per_group must be > 0, got {n_per_group}")
    bucket = F.coalesce(F.col(group_col).cast("string"), F.lit(na_bucket))
    w = Window.partitionBy(bucket).orderBy(_order_key(df, seed, key_cols, rank_hash))
    out = df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) <= n_per_group)
    if dict(df.dtypes).get(group_col) == "string":
        out = out.withColumn(group_col, F.coalesce(F.col(group_col), F.lit(na_bucket)))
    return out.drop(_RN)


def sample_daily(
    df: DataFrame,
    per_day: int,
    seed: int = 42,
    day_col: str = "Day",
    key_cols: Sequence[str] | None = None,
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """Fixed-n per day (reference "daily" mode, ``samplers.py:125-160``),
    with per-day-global semantics (intentional deviation — see module doc)."""
    if day_col not in df.columns:
        raise ValueError(f"Column {day_col!r} not present")
    return sample_per_group(
        df, day_col, per_day, seed=seed, key_cols=key_cols, rank_hash=rank_hash
    )


def sample_weighted(
    df: DataFrame,
    n: int,
    weight_col: str,
    seed: int = 42,
    key_cols: Sequence[str] | None = None,
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """Exact-n weighted sample without replacement (Efraimidis-Spirakis
    A-Res): each row draws u ∈ (0,1) and ranks by u^(1/w) descending; the
    top n realize inclusion probabilities proportional to weight.

    Extension beyond the reference (its sampling is uniform-only). u is
    hash-derived from ``key_cols`` — the same partitioning-independent
    determinism contract as :func:`sample_uniform`. Rows with weight ≤ 0 or
    NULL are excluded (zero mass). Distributed as a single
    TakeOrderedAndProject, like the uniform path.

    With ``rank_hash="md5"`` the draw is u = (int(md5[:13 hex]) + 1) /
    (2^52 + 1): exact in a double on every engine, so the selected row set
    is oracle-verifiable (DuckDB: ``CAST('0x' || substr(md5(...),1,13) AS
    BIGINT)``). IEEE division and the shared-libm ``pow`` make rank values
    agree across engines to ≤1 ulp — far below the rank spacing at any
    realistic n.
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    if not key_cols:
        raise ValueError("sample_weighted requires key_cols for deterministic draws")
    if rank_hash == "md5":
        # first 13 hex chars = 52 bits — exactly representable in a double
        v = F.conv(F.substring(F.md5(_key_string(key_cols, seed)), 1, 13), 16, 10)
        u = (v.cast("double") + F.lit(1.0)) / F.lit(float(2**52 + 1))
    else:
        # u in (0,1): (hash mod M + 1) / (M + 1) — strictly inside the interval
        m = 2_147_483_647
        u = (
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(m))
            + F.lit(1)
        ).cast("double") / F.lit(float(m + 1))
    w = F.col(weight_col).cast("double")
    rank_key = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .orderBy(rank_key.desc())
        .limit(n)
    )


def sample_filtered(
    df: DataFrame,
    filter_dict: Mapping[str, Any],
    n: int,
    seed: int = 42,
    columns: Sequence[str] | None = None,
    key_cols: Sequence[str] | None = None,
    rank_hash: str = "xxhash64",
) -> DataFrame:
    """Predicate-DSL filter + exact-n uniform sample (reference "filtered"
    reservoir mode, ``samplers.py:177-402``).

    The predicate compiles to one Catalyst ``Column`` → parquet pushdown +
    partition pruning; ``columns`` reproduces the reference's output
    projection rule (scan projection ∪ filter columns, output = requested
    columns only, ``samplers.py:330-332`` / ``:401-402``) — under Spark,
    Catalyst derives the scan set itself.
    """
    pred = compile_filter(filter_dict)
    filtered = df.filter(pred) if pred is not None else df
    sampled = sample_uniform(
        filtered, n, seed=seed, key_cols=key_cols, rank_hash=rank_hash
    )
    if columns:
        sampled = sampled.select(*columns)
    return sampled


def sample_systematic(
    df: DataFrame,
    stride: int,
    order_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """1-in-``stride`` systematic sample over the ``order_col`` total order
    (rows at global ranks 1, 1+stride, 2·stride+1, …), without a global sort.

    A naive ``row_number() OVER (ORDER BY order_col)`` plans as
    ``Exchange SinglePartition`` + one-task sort — the whole input through a
    single reducer. Scale-safe equivalent in three steps:

    1. range-bucket on ``order_col`` (monotone ``floor((v−min)/width)``, so
       bucket order == key order);
    2. one tiny aggregation for per-bucket counts → driver-side cumulative
       offsets (≤ ``n_buckets`` rows collected — bounded, not data-sized);
    3. per-bucket ``row_number`` window (parallel sorts) + broadcast-joined
       bucket offset ⇒ exact global rank, then the stride filter.

    Requires ``order_col`` numeric with unique values (ranks would otherwise
    be tie-broken arbitrarily and the row set engine-dependent). Skewed key
    ranges only skew bucket sizes, never correctness; raise ``n_buckets``
    if one range bucket would exceed executor memory.

    Per call this costs one bounded driver action — the 1-row bounds
    aggregate over a column-pruned scan (same class as the repo's other
    metadata collects). Everything else is ONE lazy plan: per-bucket counts
    and their cumulative offsets are broadcast subtrees of the returned
    DataFrame, with the running sum expressed as a triangular self-join over
    the ≤``n_buckets``-row counts aggregate (bounded by construction; a
    window would need an ``Exchange SinglePartition``, which this operator's
    contract — and its plan test — forbids anywhere in the returned plan).
    Round 3's variant eagerly collected the counts to the driver and
    re-uploaded them via ``createDataFrame`` (3 driver round-trips per call,
    4.6 s at sf0.1); this shape keeps the offsets computation inside the
    main job.
    """
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if bounds is None or bounds.lo is None:
        return df.filter(F.lit(False))
    lo, hi = float(bounds.lo), float(bounds.hi)
    width = (hi - lo) / n_buckets or 1.0
    bucket = F.least(
        F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    with_bkt = df.withColumn("__bkt__", bucket)

    counts = with_bkt.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("__cnt__"))
    prior = counts.select(
        F.col("__bkt__").alias("__pb__"), F.col("__cnt__").alias("__pc__")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("__pb__") < F.col("__bkt__"), "left")
        .groupBy("__bkt__")
        .agg(F.coalesce(F.sum("__pc__"), F.lit(0)).alias("__off__"))
    )

    w = Window.partitionBy("__bkt__").orderBy(order_col)
    return (
        with_bkt.join(F.broadcast(offsets), "__bkt__")
        .withColumn(_RN, F.row_number().over(w) + F.col("__off__"))
        .filter((F.col(_RN) - 1) % stride == 0)
        .drop("__bkt__", "__off__", _RN)
    )
