"""Temporal operators Spark's DataFrame API lacks as primitives: as-of join,
range (interval) join, gap-based sessionization.

These are the event-pipeline staples (the reference has no time-series ops —
SURVEY.md §1.1 — so this is extension surface like §2.10). Each is a
composition of built-in operators chosen for its shuffle shape at scale:

- ``asof_join``      — union + partitioned window scan: ONE shuffle on the
                       join key, no range-condition blowup. The classic
                       union-trick beats a range join whenever the right side
                       fits the same key partitioning.
- ``range_join``     — equi-key join + interval predicate; binned variant
                       (``bin_minutes``) turns the unbounded time predicate
                       into extra equi-join keys so Spark never falls back to
                       broadcast-nested-loop.
- ``sessionize``     — two windows over one shuffle: gap flags → running sum
                       = session ids.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Epoch microseconds. ``unix_micros`` rejects TIMESTAMP_NTZ inputs
    (parquet TIMESTAMP without timezone reads as NTZ); cast first — the
    session timezone is UTC throughout this repo, so the cast is
    value-preserving."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_minutes: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row at-or-before its
    timestamp (``backward``; ``forward`` = earliest at-or-after), per key.

    Plan: tag both sides, union by name, one window partitioned by key and
    ordered by (ts, side-tag) with ``last(value, ignorenulls=True)`` carrying
    the right side's values forward onto left rows. One hash shuffle on the
    key — same cost as a plain equi-join of the two inputs, independent of
    how many right rows precede each left row (a naive range join is
    quadratic in that count).

    ``tolerance_minutes`` bounds staleness (the kdb/pandas ``tolerance``):
    a match further than the bound from the left timestamp is nulled out —
    same plan, the matched right timestamp rides the window as one extra
    carried column and a map-side comparison gates the values.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_minutes is not None and tolerance_minutes <= 0:
        raise ValueError(f"tolerance_minutes must be positive, got {tolerance_minutes}")

    keys = list(key_cols)
    # left_ts must not ride along in lcols: it is re-emitted from __ts__ in the
    # final select, and a second copy makes any name-based downstream reference
    # fail with AMBIGUOUS_REFERENCE.
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts__"),
        # left rows sort AFTER right rows at equal ts (backward: at-or-before wins)
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in right_value_cols],
    )
    carry_cols = list(right_value_cols)
    if tolerance_minutes is not None:
        carry_cols.append("__mts__")
        l_tagged = l_tagged.withColumn(
            "__r___mts____", F.lit(None).cast("long")
        )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}__") for c in right_value_cols],
    )
    if tolerance_minutes is not None:
        r_tagged = r_tagged.withColumn("__r___mts____", _us(F.col("__ts__")))
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in carry_cols
        ]
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts__").asc(), F.col("__side__").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = [
            F.first(f"__r_{c}__", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in carry_cols
        ]

    out = unioned.select(*keys, "__ts__", "__side__", *lcols, *carried).filter(
        F.col("__side__") == 1
    )
    final_vals = [F.col(f"asof_{c}") for c in right_value_cols]
    if tolerance_minutes is not None:
        tol_us = int(tolerance_minutes * 60 * 1_000_000)
        gap = _us(F.col("__ts__")) - F.col("asof___mts__")
        if direction == "forward":
            gap = -gap
        ok = F.col("asof___mts__").isNotNull() & (gap <= tol_us)
        final_vals = [
            F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in right_value_cols
        ]
    return out.select(
        *keys, F.col("__ts__").alias(left_ts), *lcols, *final_vals,
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    gap_col: str = "nearest_gap_us",
) -> DataFrame:
    """For every left row, attach the right row nearest in time — either
    direction — per key; ties (equal gap before and after) prefer the
    at-or-before row. Output: left columns + ``nearest_{c}`` per value column
    + ``gap_col`` (microseconds, NULL when the key has no right rows).

    Still ONE shuffle: both direction scans are frames over the same window
    partitioning and ordering (key, ts, side), so Catalyst reuses a single
    exchange+sort — backward = ``last(ignorenulls)`` over the preceding
    frame, forward = ``first(ignorenulls)`` over the following frame. A
    right row at exactly the left row's timestamp is captured by the
    backward frame (side-tag ordering), which the tie rule prefers anyway.
    """
    keys = list(key_cols)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    # carry the right timestamp (as epoch micros) like an extra value column:
    # the gap comparison needs it on both direction scans
    vals = list(right_value_cols) + ["__us__"]
    r_src = right.withColumn("__us__", _us(F.col(right_ts)))
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(r_src.schema[c].dataType).alias(f"__r_{c}__") for c in vals],
    )
    r_tagged = r_src.select(
        *keys,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}__") for c in vals],
    )
    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col("__ts__").asc(), F.col("__side__").asc()]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = {c: F.last(f"__r_{c}__", ignorenulls=True).over(wb) for c in vals}
    fwd = {c: F.first(f"__r_{c}__", ignorenulls=True).over(wf) for c in vals}

    l_us = _us(F.col("__ts__"))
    back_gap = l_us - back["__us__"]
    fwd_gap = fwd["__us__"] - l_us
    use_back = back["__us__"].isNotNull() & (
        fwd["__us__"].isNull() | (back_gap <= fwd_gap)
    )
    picked = [
        F.when(use_back, back[c]).otherwise(fwd[c]).alias(f"nearest_{c}")
        for c in right_value_cols
    ]
    gap = F.when(use_back, back_gap).otherwise(fwd_gap).alias(gap_col)

    out = unioned.select(*keys, "__ts__", "__side__", *lcols, *picked, gap).filter(
        F.col("__side__") == 1
    )
    return out.select(
        *keys, F.col("__ts__").alias(left_ts), *lcols,
        *[F.col(f"nearest_{c}") for c in right_value_cols], F.col(gap_col),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: Column | None = None,
    upper: Column | None = None,
    bin_minutes: int | None = None,
) -> DataFrame:
    """Pairs (l, r) sharing ``key_cols`` with ``r.ts - l.ts`` inside
    [lower, upper] (intervals, e.g. ``F.expr("INTERVAL 0 SECONDS")``).

    With ``bin_minutes``, both sides gain a time-bucket column and the left
    side explodes to the buckets its window can reach — the join becomes
    pure equi-join on (key, bucket) with the interval check as a cheap
    post-filter. That keeps the planner on hash joins at any scale.
    """
    lo = lower if lower is not None else F.expr("INTERVAL 0 SECONDS")
    hi = upper if upper is not None else F.expr("INTERVAL 5 MINUTES")
    keys = list(key_cols)
    cond = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + lo)
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + hi)
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    if bin_minutes is None:
        return left.alias("l").join(right.alias("r"), cond)

    step = bin_minutes * 60
    lbin = (F.unix_timestamp(F.col(left_ts)) / step).cast("long")
    rbin = (F.unix_timestamp(F.col(right_ts)) / step).cast("long")
    # left probes its own bin plus the next (window ≤ bin width guarantees
    # every candidate lands in one of the two)
    l_binned = left.withColumn("__bin__", F.explode(F.array(lbin, lbin + 1)))
    r_binned = right.withColumn("__bin__", rbin)
    cond_binned = cond & (F.col("l.__bin__") == F.col("r.__bin__"))
    return (
        l_binned.alias("l")
        .join(r_binned.alias("r"), cond_binned)
        .drop("__bin__")
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_minutes: int = 30,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_minutes``. Session id =
    running count of session starts per key (1-based) — two windows over one
    shuffle on the key.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    # microsecond arithmetic — unix_timestamp truncates to seconds and
    # misclassifies sub-second gaps at the boundary
    gap = _us(F.col(ts_col)) - _us(F.lag(ts_col).over(w))
    is_start = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_start).over(running))


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    interval_minutes: int,
) -> DataFrame:
    """Resample each key's irregular observations onto a regular
    ``interval_minutes`` grid with forward fill — the gap-fill primitive
    time-series stores ship natively and Spark lacks (turning sparse sensor
    /price/metric events into the dense aligned series joins and models
    need).

    Grid: per key, from its first observation's interval floor to its last,
    inclusive — generated with ``sequence()`` (no driver loop, no cross
    join against a global spine, keys with short histories cost only their
    own span). Observations landing in the same bucket keep the LAST value
    (latest state wins); empty buckets forward-fill from the previous
    bucket via ``last(ignorenulls)`` over one partitioned window. Leading
    buckets before a key's first observation do not exist by construction,
    so no NULL-leading edge.

    Shuffle shape: one exchange on ``key_cols`` shared by the in-bucket
    dedup window and the fill window (same partitioning); the spine explode
    is map-side. Output: (*key_cols, bucket_ts, *value_cols).
    """
    if interval_minutes <= 0:
        raise ValueError(f"interval_minutes must be positive, got {interval_minutes}")
    step = interval_minutes * 60 * 1_000_000
    bucket = (F.floor(_us(F.col(ts_col)) / step) * step).alias("__bus__")
    obs = df.select(*key_cols, bucket, _us(F.col(ts_col)).alias("__us__"), *value_cols)
    # last observation per (key, bucket): latest state wins inside a bucket
    w_in = Window.partitionBy(*key_cols, "__bus__").orderBy(F.desc("__us__"))
    per_bucket = (
        obs.withColumn("__rn__", F.row_number().over(w_in))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__us__")
    )
    # per-key grid from min to max bucket
    span = per_bucket.groupBy(*key_cols).agg(
        F.min("__bus__").alias("__lo__"), F.max("__bus__").alias("__hi__")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step))
        ).alias("__bus__"),
    )
    joined = grid.join(per_bucket, [*key_cols, "__bus__"], "left")
    w_fill = (
        Window.partitionBy(*key_cols)
        .orderBy("__bus__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *key_cols,
        F.timestamp_micros(F.col("__bus__")).alias("bucket_ts"),
        *[
            F.last(F.col(c), ignorenulls=True).over(w_fill).alias(c)
            for c in value_cols
        ],
    )
    return filled


def resample_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_minutes: int,
) -> DataFrame:
    """Regular-grid resampling with LINEAR INTERPOLATION between the
    surrounding observed buckets — the numeric twin of
    :func:`resample_ffill` (state columns forward-fill; continuous metrics
    interpolate).

    Same spine discipline as ``resample_ffill`` (per-key ``sequence()``
    grid, latest-state-wins in-bucket dedup, ONE key exchange). Fill value
    for an empty bucket at grid time ``t`` between known buckets
    ``(t0, v0)`` and ``(t1, v1)``:
    ``v0 + (v1 - v0) * (t - t0) / (t1 - t0)`` — the time deltas are exact
    integer micros and the expression tree is fixed, so the IEEE result is
    bit-identical across engines (no rounding needed in the oracle). The
    grid spans first..last observation per key, so every empty bucket has
    both neighbors; the forward/backward neighbor windows share the fill
    window's (key, bucket) sort — still one exchange total.
    """
    if interval_minutes <= 0:
        raise ValueError(f"interval_minutes must be positive, got {interval_minutes}")
    step = interval_minutes * 60 * 1_000_000
    bucket = (F.floor(_us(F.col(ts_col)) / step) * step).alias("__bus__")
    obs = df.select(*key_cols, bucket, _us(F.col(ts_col)).alias("__us__"), value_col)
    w_in = Window.partitionBy(*key_cols, "__bus__").orderBy(F.desc("__us__"))
    per_bucket = (
        obs.withColumn("__rn__", F.row_number().over(w_in))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__us__")
    )
    span = per_bucket.groupBy(*key_cols).agg(
        F.min("__bus__").alias("__lo__"), F.max("__bus__").alias("__hi__")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step))
        ).alias("__bus__"),
    )
    joined = grid.join(per_bucket, [*key_cols, "__bus__"], "left")
    v = F.col(value_col)
    known_ts = F.when(v.isNotNull(), F.col("__bus__"))
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy("__bus__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy("__bus__")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(known_ts, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(known_ts, ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("__bus__") - prev_t).cast("double")
        / (next_t - prev_t).cast("double")
    )
    return joined.select(
        *key_cols,
        F.timestamp_micros(F.col("__bus__")).alias("bucket_ts"),
        F.when(v.isNotNull(), v).otherwise(interp).alias(value_col),
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered conversion funnel: per user, the earliest time each step was
    reached IN ORDER (step k counts only strictly after step k-1's reached
    time). Returns (user, step_1_ts, …, step_k_ts) with NULL from the first
    unreached step — the product-analytics primitive behind conversion
    dashboards.

    Plan: ONE conditional aggregation per user computes, for every step,
    the sorted list of that step's event times (a per-user, per-step
    ``array_sort(collect_list)``), then the ordered walk is a pure
    expression over those arrays (``F.filter`` + ``array_min``) — one
    shuffle on the user key regardless of step count, no k-way self-join.
    Per-user state is bounded by that user's event count (fine for
    user-keyed events; for billions-of-events-per-user keys, pre-aggregate
    to per-(user, step) daily minima first).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"__ts_{i}__")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    prev = None
    outs = []
    for i, s in enumerate(steps):
        arr = F.col(f"__ts_{i}__")
        if prev is None:
            reached = F.array_min(arr)
        else:
            after = F.filter(arr, lambda t: t > prev)
            reached = F.when(prev.isNotNull(), F.array_min(after))
        outs.append(reached.alias(f"step_{i + 1}_ts"))
        prev = reached
    return per_user.select("user", *outs)


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key (the gap-and-island
    pattern): rows whose ``[start, end]`` ranges chain together collapse to
    one row per island — coverage windows from event spans, busy periods
    from sessions, blackout unions from maintenance logs.

    Two window passes over ONE shuffle on the key: an island starts where
    ``start`` exceeds the running max of all PRIOR ends (strictly —
    touching endpoints merge); the running count of island-starts numbers
    the islands; then a grouped aggregate per (key, island). Returns
    (*key_cols, interval_start, interval_end, n_merged) — per-key island
    data never leaves its partition until the final aggregate.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(start_col).asc(), F.col(end_col).asc())
    prior_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1
    ).otherwise(0)
    islanded = df.withColumn(
        "__isl__",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islanded.groupBy(*keys, "__isl__")
        .agg(
            F.min(start_col).alias("interval_start"),
            F.max(end_col).alias("interval_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__isl__")
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """First-order Markov transition counts and probabilities over per-key
    ordered state sequences (reference surface: ordered event streams per
    entity; README.md "daily event files" — here lifted to sequence mining:
    session flows, actor behaviour chains, QuadClass escalation matrices).

    One shuffle on ``key_col`` orders each entity's history (``order_cols``
    must include a total-order tiebreaker); ``lag(state)`` forms the
    (prev, next) bigrams map-side; a grouped count plus a per-``prev`` window
    sum yields row-normalized probabilities. Probability = integer count /
    integer row-total — one IEEE division, so the doubles are engine-portable.

    Returns (prev_state, next_state, n_transitions, p_transition).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.withColumn("__prev__", F.lag(F.col(state_col)).over(w))
        .filter(F.col("__prev__").isNotNull())
        .select(
            F.col("__prev__").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("prev_state"))
    return counts.withColumn(
        "p_transition", F.col("n_transitions") / row_total
    )


def detect_bursts(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    *,
    baseline_days: int = 7,
    z_threshold: float = 3.0,
    min_baseline_days: int = 3,
) -> DataFrame:
    """Volume-burst detection per group: flag days whose event count spikes
    above a trailing-``baseline_days`` mean by ``z_threshold`` robust standard
    deviations (event-monitoring surface over the reference's daily files —
    "which country/EventRootCode surged today?").

    Plan: one grouped daily count (map-side partial), then ONE window pass
    per group ordered by integer day index with a RANGE frame
    [-baseline_days, -1] — the baseline never includes the current day, and
    calendar gaps are handled by RANGE (a missing day simply isn't in the
    frame). Mean/variance are derived from integer SUM / SUM-of-squares in
    fixed expression order (not the engine's streaming stddev), so every
    double is bit-identical cross-engine; the std is floored at 1.0 event to
    keep z finite on constant baselines.

    Returns (*group_cols, day, n_events, base_days, base_mean, z, is_burst).
    """
    keys = list(group_cols)
    daily = (
        df.groupBy(
            *[F.col(c) for c in keys],
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("__di__", F.datediff(F.col("day"), F.lit("1970-01-01")))
    )
    frame = (
        Window.partitionBy(*keys)
        .orderBy("__di__")
        .rangeBetween(-baseline_days, -1)
    )
    base_days = F.count(F.lit(1)).over(frame)
    base_sum = F.sum("n_events").over(frame)
    base_sumsq = F.sum(F.col("n_events") * F.col("n_events")).over(frame)
    stats = daily.select(
        *keys,
        "day",
        "n_events",
        base_days.alias("base_days"),
        base_sum.alias("base_sum"),
        base_sumsq.alias("base_sumsq"),
    )
    mean = F.col("base_sum") / F.col("base_days")
    var = F.col("base_sumsq").cast("double") / F.col("base_days") - mean * mean
    std = F.greatest(F.sqrt(F.greatest(var, F.lit(0.0))), F.lit(1.0))
    z = (F.col("n_events") - mean) / std
    return stats.select(
        *keys,
        "day",
        "n_events",
        "base_days",
        mean.alias("base_mean"),
        F.when(F.col("base_days") >= min_baseline_days, z).alias("z"),
        (
            (F.col("base_days") >= min_baseline_days) & (z >= F.lit(z_threshold))
        ).alias("is_burst"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: Sequence[str],
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``e_1 = v_1;  e_i = α·v_i + (1-α)·e_{i-1}`` — the classic smoothing /
    simple-forecast recurrence over each entity's ordered series.

    A recurrence is not a window aggregate, so Spark's frame functions can't
    express it directly; instead the running history is collected in frame
    order (``collect_list`` over ROWS UNBOUNDED PRECEDING) and folded with a
    higher-order ``aggregate`` — still whole-stage-codegen JVM expression
    work, no Python. The fold's float ops are in deterministic order, so an
    external engine folding the same ordered list (DuckDB ``list_reduce``)
    reproduces every double bit-identically. O(series²) values ride the
    window state, so this is for bounded per-entity series (daily rollups,
    sensor channels), not unbounded logs — exactly where EWMA is used.

    ``order_cols`` must totally order each key's rows. Adds column ``ewma``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = F.collect_list(F.col(value_col)).over(w)
    folded = F.aggregate(
        F.slice(hist, 2, F.greatest(F.size(hist) - 1, F.lit(0))),
        F.element_at(hist, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return df.withColumn("ewma", folded)


def ohlc_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    *,
    interval_minutes: int = 60,
) -> DataFrame:
    """Open/high/low/close bucket downsampling — the canonical lossy
    compaction for numeric event streams (metrics rollup, price bars,
    sensor decimation).

    ``first``/``last`` aggregates are partition-order-dependent in Spark, so
    open/close are instead derived from explicit row_numbers over the
    (ts, tiebreak) total order inside each bucket — deterministic on any
    engine and any partitioning. One shuffle on (key, bucket) via the
    window; high/low/count ride the same pass as conditional aggregates.

    Returns (key, bucket_ts, open, high, low, close, n_obs).
    """
    if interval_minutes < 1:
        raise ValueError("interval_minutes must be >= 1")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / (interval_minutes * 60)).cast("long")
        * (interval_minutes * 60)
    )
    base = df.select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket_ts"),
        F.col(ts_col).alias("__ts__"),
        F.col(order_tiebreak).alias("__tb__"),
        F.col(value_col).alias("__v__"),
    )
    w_asc = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("__ts__").asc(), F.col("__tb__").asc()
    )
    w_desc = Window.partitionBy("key", "bucket_ts").orderBy(
        F.col("__ts__").desc(), F.col("__tb__").desc()
    )
    ranked = base.select(
        "key", "bucket_ts", "__v__",
        F.row_number().over(w_asc).alias("__ra__"),
        F.row_number().over(w_desc).alias("__rd__"),
    )
    return ranked.groupBy("key", "bucket_ts").agg(
        F.max(F.when(F.col("__ra__") == 1, F.col("__v__"))).alias("open"),
        F.max("__v__").alias("high"),
        F.min("__v__").alias("low"),
        F.max(F.when(F.col("__rd__") == 1, F.col("__v__"))).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucket into cohorts by their FIRST
    activity period; each later active period increments that cohort's
    retention at offset = period - cohort_period.

    Two shuffles total: one (user, period) distinct-activity pass (which
    also yields each user's min period), one (cohort, offset) count. The
    rate is active-users / cohort-size — two integer counts and one IEEE
    division, engine-portable. Offset 0 is the cohort size itself
    (rate = 1.0 by construction).

    Returns (cohort_period, period_offset, n_active, cohort_size, retention).
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    period = (
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
        / period_days
    ).cast("long")
    activity = (
        df.select(F.col(user_col).alias("user"), period.alias("period"))
        .distinct()
    )
    w = Window.partitionBy("user")
    with_cohort = activity.withColumn("cohort", F.min("period").over(w))
    counts = (
        with_cohort.groupBy(
            F.col("cohort").alias("cohort_period"),
            (F.col("period") - F.col("cohort")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = counts.filter(F.col("period_offset") == 0).select(
        F.col("cohort_period").alias("__cp__"),
        F.col("n_active").alias("cohort_size"),
    )
    return (
        counts.join(sizes, counts.cohort_period == sizes.__cp__)
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct entities per day (the WAU/MAU family):
    for each observed day, how many distinct entities were active in the
    last ``window_days`` days ending that day.

    A sliding COUNT DISTINCT cannot merge across window frames, so the
    scalable shape is contribution explode: dedup to (entity, day) pairs
    first (the big shrink — raw events never fan out), then each pair
    contributes to the ``window_days`` report days it covers, and one
    grouped count-distinct per report day finishes. Shuffle volume is
    |entity-days| × window_days short rows, independent of raw event
    count. Report days with no activity of their own are dropped (semi
    join against observed days), so gaps don't fabricate rows.

    Returns (day, n_active).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    days = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).alias("d"),
        )
        .distinct()
    )
    contrib = days.select(
        "entity",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + (window_days - 1))
        ).alias("rd"),
    )
    observed = days.select("d").distinct()
    counted = (
        contrib.join(observed, contrib.rd == observed.d, "semi")
        .groupBy("rd")
        .agg(F.countDistinct("entity").alias("n_active"))
    )
    return counted.select(
        F.date_add(F.lit("1970-01-01"), F.col("rd").cast("int")).alias("day"),
        "n_active",
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key: each observation's value is weighted
    by how long it remained current (until the next observation), i.e.
    ``TWAP = sum(v_i * (t_{i+1} - t_i)) / (t_n - t_1)`` — the standard
    fix for irregularly-sampled series where a plain ``avg`` over-weights
    bursts of closely-spaced updates.

    The final observation carries no duration and drops out (standard TWAP
    convention over a closed observation window). Keys with a single
    observation (zero total duration) return NULL. Durations are exact
    integer micros; the weighted sum is a float aggregate, so cross-engine
    comparisons must round (sum order differs) — callers' responsibility,
    as with every double sum in this repo.

    One exchange: the lead window and the grouped sum share ``key_cols``
    partitioning. Requires unique ``(key, ts)`` rows for a deterministic
    lead (pre-aggregate duplicates like the resample queries do).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col("__us__").asc())
    us = _us(F.col(ts_col))
    stepped = df.select(
        *key_cols, us.alias("__us__"), F.col(value_col).alias("__v__")
    ).withColumn("__next__", F.lead("__us__").over(w))
    dur = (F.col("__next__") - F.col("__us__")).cast("double")
    agg = stepped.groupBy(*key_cols).agg(
        F.sum(F.col("__v__") * dur).alias("__wsum__"),
        F.sum(dur).alias("__wtot__"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.select(
        *key_cols,
        F.when(
            F.col("__wtot__") > 0, F.col("__wsum__") / F.col("__wtot__")
        ).alias("twap"),
        "n_obs",
    )


def longest_streak(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Longest run of CONSECUTIVE active days per key — the engagement
    streak metric. Classic gaps-and-islands: dedup to (key, day), then
    ``epoch_day - row_number`` is constant within a consecutive run (the
    island key), so two grouped aggregations finish the job. Exact
    integer arithmetic throughout.

    Returns ``(*key_cols, longest_streak, n_active_days)``. One exchange:
    the day-dedup, the island window, and both rollups all partition by
    the same key columns.
    """
    day = F.col(ts_col).cast("date")
    days = df.select(*key_cols, day.alias("__d__")).distinct()
    w = Window.partitionBy(*key_cols).orderBy("__d__")
    islands = days.withColumn(
        "__grp__",
        F.datediff(F.col("__d__"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    runs = islands.groupBy(*key_cols, "__grp__").agg(
        F.count(F.lit(1)).alias("__len__")
    )
    return runs.groupBy(*key_cols).agg(
        F.max("__len__").alias("longest_streak"),
        F.sum("__len__").alias("n_active_days"),
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    *,
    period: int = 7,
    trend_window: int = 7,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Additive seasonal decomposition of the DAILY EVENT COUNT series:
    ``count = trend + seasonal + residual`` — the monitoring decomposition
    that separates weekly rhythm from real growth/incidents.

    - daily series: events per day (exact integers — counting, not
      averaging a double column, keeps the series engine-exact);
    - ``trend``: centered moving average over ``trend_window`` days (a
      rows-frame window; integer sums / window size = one pinned double);
    - ``seasonal``: mean detrended value per phase ``epoch_day % period``,
      joined back via broadcast (a ``period``-row table);
    - ``residual``: the rest.

    Seasonal/residual are float aggregates (round for cross-engine
    compares); trend is exact. After the first grouped count everything
    operates on |days| rows — the windows are day-cardinality-bounded, so
    the global sort of the keyless variant is the same documented bounded
    single-partition stance as the top-k plans. Output:
    ``(*key_cols, day, n_events, trend, seasonal, residual)``.

    The trend frame is ROWS-based over OBSERVED days: a day with zero
    events emits no row, so across gaps the centered window spans the
    nearest observed days rather than the calendar. Gap-free decomposition
    = resample with ``resample_ffill``/``resample_interpolate`` (or
    densify with zero-fill) first, then decompose.
    """
    half = trend_window // 2
    keys = list(key_cols)
    day = F.col(ts_col).cast("date")
    daily = df.select(*keys, day.alias("day")).groupBy(*keys, "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_trend = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    with_trend = daily.withColumn(
        "trend",
        F.sum("n_events").over(w_trend).cast("double")
        / F.count(F.lit(1)).over(w_trend).cast("double"),
    ).withColumn(
        "__phase__",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        % F.lit(period),
    )
    detrended = F.col("n_events").cast("double") - F.col("trend")
    seasonal = with_trend.groupBy(*keys, "__phase__").agg(
        F.avg(detrended).alias("seasonal")
    )
    out = with_trend.join(F.broadcast(seasonal), [*keys, "__phase__"])
    return out.select(
        *keys,
        "day",
        "n_events",
        "trend",
        "seasonal",
        (detrended - F.col("seasonal")).alias("residual"),
    )


def interval_intersect(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    *,
    a_cols: Sequence[str] = (),
    b_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairwise intersection of two per-key interval sets — the temporal-
    algebra complement of :func:`merge_intervals` (which unions): "when was
    the user in a session AND the system degraded", "billing period ∩
    subscription period".

    Output: one row per overlapping (a, b) pair — ``(*key_cols,
    *a_cols, *b_cols, intersect_start, intersect_end)`` with the clipped
    bounds (half-open semantics: intervals that merely touch —
    ``a.end == b.start`` — do NOT intersect). ``a_cols``/``b_cols`` carry
    payload/id columns through (must not collide). Callers
    wanting disjoint coverage run ``merge_intervals`` on each side first
    (then per-key outputs are disjoint too).

    Plan: ONE equi-join on ``key_cols`` with the overlap predicate as join
    residual — per-key interval counts are bounded in every real use
    (sessions/day, incidents/system), the same stance as the SCD2 PIT
    join. No stencil needed because the key carries the locality.
    """
    keys = list(key_cols)
    clash = set(a_cols) & set(b_cols)
    if clash:
        raise ValueError(f"a_cols/b_cols overlap: {sorted(clash)}")
    aa = a.select(
        *keys,
        *a_cols,
        F.col(start_col).alias("__as__"),
        F.col(end_col).alias("__ae__"),
    ).alias("__ia__")
    bb = b.select(
        *keys,
        *b_cols,
        F.col(start_col).alias("__bs__"),
        F.col(end_col).alias("__be__"),
    ).alias("__ib__")
    cond = None
    for k in keys:
        c = F.col(f"__ia__.{k}") == F.col(f"__ib__.{k}")
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col("__as__") < F.col("__be__"))
        & (F.col("__bs__") < F.col("__ae__"))
    )
    j = aa.join(bb, cond)
    return j.select(
        *[F.col(f"__ia__.{k}") for k in keys],
        *[F.col(f"__ia__.{c}") for c in a_cols],
        *[F.col(f"__ib__.{c}") for c in b_cols],
        F.greatest("__as__", "__bs__").alias("intersect_start"),
        F.least("__ae__", "__be__").alias("intersect_end"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan–Meier survival estimate per group (Kaplan & Meier 1958) —
    time-to-event analytics with right-censoring over the lake's event
    histories (ship-to-return lags, user churn, ticket resolution).
    ``event_col`` is 1 when the event was observed at ``duration_col``,
    0 when the subject was censored there (observation ended event-free).

    Per group and distinct duration t (ascending): ``n_at_risk`` =
    subjects with duration ≥ t, ``n_events`` = observed events at t, and
    ``survival`` = Π_{u ≤ t} (1 − d_u / n_u) — the product taken over the
    ordered duration sequence. A running product is a recurrence, not a
    frame aggregate, so it uses the ``ewma`` pattern: ordered
    ``collect_list`` + higher-order fold (JVM codegen, deterministic
    order → every double bit-identical with an engine folding the same
    list, e.g. DuckDB ``list_reduce``). Censoring-only durations carry
    factor exactly 1.0 — an IEEE-exact identity, so emitting them does
    not perturb the product.

    Scale shape: one groupBy on (group, duration) collapses the corpus to
    the curve's support — |durations| rows per group — before any window;
    the windows and the O(support²) fold state run on that bounded frame,
    never on raw rows. Distinct-duration supports are bounded by the
    calendar in practice (days between business events); for unbounded
    continuous durations, bucket first."""
    gcols = list(group_cols)
    counts = (
        df.groupBy(*gcols, duration_col)
        .agg(
            F.count(F.lit(1)).alias("__at__"),
            F.sum(F.col(event_col).cast("long")).alias("n_events"),
        )
        .withColumn("n_censored", F.col("__at__") - F.col("n_events"))
    )
    word = Window.partitionBy(*gcols).orderBy(duration_col)
    prior = F.coalesce(
        F.sum("__at__").over(word.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    total = F.sum("__at__").over(Window.partitionBy(*gcols))
    staged = counts.withColumn("n_at_risk", total - prior).withColumn(
        "__factor__",
        F.lit(1.0)
        - F.col("n_events").cast("double") / F.col("n_at_risk").cast("double"),
    )
    # ONE sorted array per group instead of a running collect_list window:
    # the per-row window materializes O(support²) list elements through
    # the window operator (the 8 s term at sf0.1); a single grouped array
    # with per-position prefix folds does the same multiplies in the same
    # left-to-right order (1.0·f₁ is IEEE-exact, so seeding with 1.0
    # equals seeding with the first factor) on O(support) state.
    packed = staged.groupBy(*gcols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(duration_col).alias("duration"),
                    F.col("n_at_risk"),
                    F.col("n_events"),
                    F.col("n_censored"),
                    F.col("__factor__"),
                )
            )
        ).alias("__rows__")
    )
    factors = F.transform(F.col("__rows__"), lambda r: r["__factor__"])
    # one LINEAR fold emits every prefix product (prefix[i+2] = Π f₁..fᵢ₊₁,
    # seeded [1.0]) — n multiplies per group, not n nested slice-folds.
    # MATERIALIZED via withColumn before the transform below references
    # it: an inlined expression would re-evaluate the whole fold once per
    # position (O(n²) folds — measured as a >5 min stall at sf0.1).
    prefix = F.aggregate(
        factors,
        F.array(F.lit(1.0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) * x)),
    )
    packed = packed.withColumn("__prefix__", prefix)
    enriched = F.transform(
        F.col("__rows__"),
        lambda r, i: F.struct(
            r["duration"].alias("duration"),
            r["n_at_risk"].alias("n_at_risk"),
            r["n_events"].alias("n_events"),
            r["n_censored"].alias("n_censored"),
            F.element_at(F.col("__prefix__"), i + 2).alias("survival"),
        ),
    )
    return packed.select(*gcols, F.explode(enriched).alias("__r__")).select(
        *gcols,
        F.col("__r__.duration").alias("duration"),
        F.col("__r__.n_at_risk").alias("n_at_risk"),
        F.col("__r__.n_events").alias("n_events"),
        F.col("__r__.n_censored").alias("n_censored"),
        F.col("__r__.survival").alias("survival"),
    )
