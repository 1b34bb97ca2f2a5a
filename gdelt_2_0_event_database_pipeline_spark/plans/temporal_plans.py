"""Temporal query plans: as-of join, range join, sessionization over the
events table — oracled against DuckDB (which has native ASOF JOIN, making it
an independent implementation to differ against).

All oracle SQL casts ``ts`` to microsecond TIMESTAMP to match Spark's
timestamp precision (the parquet carries nanos; comparisons must happen at
the same resolution on both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, asof_nearest, range_join, sessionize
from .registry import register
from .relational import _events, _t


@register(
    "q_asof_join",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
         l AS (SELECT * FROM e WHERE event_type <> 'signup'),
         r AS (SELECT * FROM e WHERE event_type = 'signup')
    SELECT l.event_id, l.user_id,
           r.value AS signup_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join (most recent signup at-or-before each event, per user) — union+window plan, one shuffle.",
)
def q_asof_join(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type", "value")
    left = e.filter(F.col("event_type") != "signup")
    right = e.filter(F.col("event_type") == "signup")
    out = asof_join(
        left,
        right.select("user_id", "ts", "value"),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
    )
    return out.select("event_id", "user_id", F.col("asof_value").alias("signup_value"))


@register(
    "q_asof_forward",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
         l AS (SELECT * FROM e WHERE event_type <> 'purchase'),
         r AS (SELECT * FROM e WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id,
           r.value AS next_purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    doc=(
        "Forward as-of join (earliest purchase at-or-after each event, per "
        "user) — the same union+window plan scanned in the other direction; "
        "DuckDB's ASOF with <= is the independent oracle."
    ),
)
def q_asof_forward(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type", "value")
    left = e.filter(F.col("event_type") != "purchase")
    right = e.filter(F.col("event_type") == "purchase")
    out = asof_join(
        left,
        right.select("user_id", "ts", "value"),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", F.col("asof_value").alias("next_purchase_value")
    )


@register(
    "q_asof_nearest",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
         l AS (SELECT * FROM e WHERE event_type <> 'signup'),
         r AS (SELECT * FROM e WHERE event_type = 'signup')
    SELECT l.event_id, l.user_id,
           x.value  AS nearest_signup_value,
           x.gap_us AS nearest_gap_us
    FROM l LEFT JOIN LATERAL (
      SELECT r.value, abs(epoch_us(r.ts) - epoch_us(l.ts)) AS gap_us
      FROM r WHERE r.user_id = l.user_id
      ORDER BY gap_us, r.ts LIMIT 1
    ) x ON true
    """,
    doc=(
        "Nearest-in-time as-of join, either direction, ties prefer "
        "at-or-before — one union+window shuffle with both direction frames "
        "over a single sort; DuckDB's lateral min-abs-gap subquery is the "
        "independent oracle."
    ),
)
def q_asof_nearest(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type", "value")
    left = e.filter(F.col("event_type") != "signup")
    right = e.filter(F.col("event_type") == "signup")
    out = asof_nearest(
        left,
        right.select("user_id", "ts", "value"),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
    )
    return out.select(
        "event_id", "user_id",
        F.col("nearest_value").alias("nearest_signup_value"),
        "nearest_gap_us",
    )


@register(
    "q_range_join",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events)
    SELECT l.event_id AS view_id, r.event_id AS purchase_id, l.user_id
    FROM e l JOIN e r
      ON l.user_id = r.user_id
     AND l.event_type = 'view' AND r.event_type = 'purchase'
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 30 MINUTES
    """,
    doc="Range (interval) join: purchases within 30min after a view, per user — binned equi-join plan.",
)
def q_range_join(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    views = e.filter(F.col("event_type") == "view")
    purchases = e.filter(F.col("event_type") == "purchase")
    out = range_join(
        views,
        purchases,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        upper=F.expr("INTERVAL 30 MINUTES"),
        bin_minutes=30,
    )
    return out.select(
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
    )


@register(
    "q_event_paths",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events)
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           count(*) AS n_events
    FROM e WHERE user_id < 50 GROUP BY user_id
    """,
    doc="Ordered event-path aggregation per user (collect_list sorted by struct → joined string — deterministic, unlike raw collect_list).",
)
def q_event_paths(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    return e.groupBy("user_id").agg(
        F.array_join(ordered, ">").alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_sessionize",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events),
         flagged AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                            > 30 * 60 * 1000000
                       THEN 1 ELSE 0 END AS is_start
           FROM e
         )
    SELECT event_id, user_id,
           -- CAST: DuckDB window SUM yields HUGEINT -> float64 via Arrow,
           -- which hash-fails against Spark's BIGINT (oracle_dtype_audit)
           CAST(sum(is_start) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM flagged
    """,
    doc="Gap-based sessionization (30min): two windows over one shuffle on the key.",
)
def q_sessionize(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    return sessionize(e, ["user_id"], "ts", gap_minutes=30).select(
        "event_id", "user_id", "session_id"
    )


_RS_STEP = 360 * 60 * 1_000_000  # 6-hour grid in µs


@register(
    "q_resample_ffill",
    sql=f"""
    WITH uniq AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE user_id < 20 GROUP BY user_id, ts
    ), obs AS (
      SELECT user_id, (epoch_us(ts) // {_RS_STEP}) * {_RS_STEP} AS bus,
             epoch_us(ts) AS us, value
      FROM uniq
    ), pb AS (
      SELECT user_id, bus, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bus ORDER BY us DESC
        ) AS rn FROM obs
      ) WHERE rn = 1
    ), span AS (
      SELECT user_id, min(bus) AS lo, max(bus) AS hi FROM pb GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(range(lo, hi + {_RS_STEP}, {_RS_STEP})) AS bus
      FROM span
    ), j AS (
      SELECT g.user_id, g.bus, p.value
      FROM grid g LEFT JOIN pb p ON g.user_id = p.user_id AND g.bus = p.bus
    )
    SELECT user_id, make_timestamp(bus) AS bucket_ts,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bus
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value
    FROM j
    """,
    doc=(
        "Regular-grid resampling with forward fill (6-hour buckets per "
        "user): per-key spine via sequence() — no global spine cross join, "
        "no driver loop — latest-state-wins in-bucket dedup, and one "
        "partitioned last(ignorenulls) fill window sharing the key "
        "exchange. The time-series gap-fill primitive Spark lacks; oracle "
        "replays grid generation and fill in DuckDB. Input pre-aggregated "
        "to unique (user, ts) so in-bucket ordering is total on both "
        "engines."
    ),
)
def q_resample_ffill(spark, sf_dir):
    from ..operators.temporal import resample_ffill

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 20)
    uniq = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    return resample_ffill(
        uniq, ["user_id"], "ts", ["value"], interval_minutes=360
    )


@register(
    "q_asof_tolerance",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
         l AS (SELECT * FROM e WHERE event_type <> 'signup'),
         r AS (SELECT * FROM e WHERE event_type = 'signup')
    SELECT l.event_id, l.user_id,
           (SELECT r.value FROM r
             WHERE r.user_id = l.user_id AND r.ts <= l.ts
               AND r.ts >= l.ts - INTERVAL 2 DAY
             ORDER BY r.ts DESC LIMIT 1) AS signup_value
    FROM l
    """,
    doc=(
        "As-of join with bounded staleness (kdb/pandas `tolerance`): the "
        "most recent signup at-or-before each event counts only within 48 "
        "hours — staler matches null out. Same union+window plan as "
        "q_asof_join with the matched timestamp riding as one extra "
        "carried column; the oracle is an explicitly bounded lateral "
        "subquery."
    ),
)
def q_asof_tolerance(spark, sf_dir):
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type", "value")
    left = e.filter(F.col("event_type") != "signup")
    right = e.filter(F.col("event_type") == "signup")
    out = asof_join(
        left,
        right.select("user_id", "ts", "value"),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
        tolerance_minutes=48 * 60,
    )
    return out.select("event_id", "user_id", F.col("asof_value").alias("signup_value"))


@register(
    "q_funnel",
    sql="""
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view'
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT u.user_id AS user, s1.t1 AS step_1_ts, s2.t2 AS step_2_ts,
           s3.t3 AS step_3_ts
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
    doc=(
        "Ordered conversion funnel (view -> click -> purchase): per user, "
        "the earliest time each step was reached strictly after the "
        "previous step. ONE conditional aggregation per user (sorted "
        "per-step time arrays) + a pure-expression ordered walk — one "
        "shuffle regardless of step count, vs the oracle's k-way "
        "staged-join formulation. NULL from the first unreached step."
    ),
)
def q_funnel(spark, sf_dir):
    from ..operators.temporal import funnel_steps

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_steps(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@register(
    "q_merge_intervals",
    sql="""
    WITH iv AS (
      SELECT user_id, ts::TIMESTAMP AS s,
             ts::TIMESTAMP + INTERVAL 45 MINUTE AS e
      FROM events WHERE user_id < 30
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) THEN 1 ELSE 0 END AS ni
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             sum(ni) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS isl
      FROM flagged
    )
    SELECT user_id, min(s) AS interval_start, max(e) AS interval_end,
           count(*) AS n_merged
    FROM islands GROUP BY user_id, isl
    """,
    doc=(
        "Gap-and-island interval merging: per-user 45-minute activity "
        "spans around each event collapse into maximal busy periods — two "
        "windows over one key shuffle, touching endpoints merge. Oracle "
        "replays the identical running-max-island formulation."
    ),
)
def q_merge_intervals(spark, sf_dir):
    from ..operators.temporal import merge_intervals

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 30)
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("e"),
    )
    return merge_intervals(iv, ["user_id"], "s", "e")


@register(
    "q_transitions",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
    seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM e
    ),
    c AS (
      SELECT prev AS prev_state, event_type AS next_state,
             count(*) AS n_transitions
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    )
    SELECT prev_state, next_state, n_transitions,
           n_transitions / CAST(sum(n_transitions) OVER (PARTITION BY prev_state) AS BIGINT)
             AS p_transition
    FROM c
    """,
    doc=(
        "First-order Markov transition matrix over per-user ordered event "
        "sequences: lag() bigrams -> grouped counts -> row-normalized "
        "probabilities (one integer division, engine-portable). The oracle "
        "replays lag/count/window-sum; sum() is cast back to BIGINT because "
        "DuckDB widens to HUGEINT."
    ),
)
def q_transitions(spark, sf_dir):
    from ..operators.temporal import transition_counts

    e = _events(spark, sf_dir)
    return transition_counts(
        e, key_col="user_id", state_col="event_type", order_cols=["ts", "event_id"]
    )


@register(
    "q_burst_detection",
    sql="""
    WITH e AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
    daily AS (
      SELECT event_type, ts::DATE AS day,
             count(*) AS n_events,
             (ts::DATE - DATE '1970-01-01') AS di
      FROM e GROUP BY event_type, ts::DATE
    ),
    w AS (
      SELECT event_type, day, n_events,
             count(*)                 OVER fr AS base_days,
             sum(n_events)            OVER fr AS base_sum,
             sum(n_events * n_events) OVER fr AS base_sumsq
      FROM daily
      WINDOW fr AS (PARTITION BY event_type ORDER BY di
                    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n_events, base_days,
           base_sum / base_days AS base_mean,
           CASE WHEN base_days >= 3 THEN
             (n_events - base_sum / base_days)
             / greatest(sqrt(greatest(
                 base_sumsq::DOUBLE / base_days
                 - (base_sum / base_days) * (base_sum / base_days), 0.0)), 1.0)
           END AS z,
           (base_days >= 3 AND
            (n_events - base_sum / base_days)
            / greatest(sqrt(greatest(
                base_sumsq::DOUBLE / base_days
                - (base_sum / base_days) * (base_sum / base_days), 0.0)), 1.0)
            >= 3.0) AS is_burst
    FROM w
    """,
    doc=(
        "Per-event-type volume-burst detection: trailing-7-day RANGE-frame "
        "baseline (calendar-gap aware, current day excluded), z-score from "
        "integer SUM/SUM-of-squares in fixed expression order (bit-identical "
        "doubles cross-engine), std floored at 1 event so constant baselines "
        "stay finite."
    ),
)
def q_burst_detection(spark, sf_dir):
    from ..operators.temporal import detect_bursts

    e = _events(spark, sf_dir)
    return detect_bursts(
        e, ts_col="ts", group_cols=["event_type"],
        baseline_days=7, z_threshold=3.0, min_baseline_days=3,
    )


@register(
    "q_ewma",
    sql="""
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events),
    h AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hist
      FROM e
    )
    SELECT event_id, user_id, value,
           list_reduce(hist, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
    FROM h
    """,
    doc=(
        "Per-user EWMA (alpha = 0.5) over the ordered event series: a "
        "recurrence, not a frame aggregate — expressed as an ordered "
        "collect_list + higher-order fold (JVM codegen, no Python). Both "
        "engines fold the identical ordered list left-to-right, so every "
        "double is bit-identical (DuckDB list_reduce seeds the accumulator "
        "with the first element, matching the Spark init)."
    ),
)
def q_ewma(spark, sf_dir):
    from ..operators.temporal import ewma

    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = ewma(e, "user_id", "value", ["ts", "event_id"], alpha=0.5)
    return out.select("event_id", "user_id", "value", "ewma")


@register(
    "q_ohlc",
    sql="""
    WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, event_type, value FROM events),
    b AS (
      SELECT event_type AS key,
             make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000)
               AS bucket_ts,
             ts, event_id, value
      FROM e
    ),
    ranked AS (
      SELECT key, bucket_ts, value,
             row_number() OVER (PARTITION BY key, bucket_ts
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY key, bucket_ts
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM b
    )
    SELECT key, bucket_ts,
           max(CASE WHEN ra = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rd = 1 THEN value END) AS close,
           count(*) AS n_obs
    FROM ranked GROUP BY key, bucket_ts
    """,
    doc=(
        "OHLC bucket downsampling (hourly bars per event type). Spark's "
        "first/last aggregates are partition-order dependent, so open/close "
        "come from explicit row_numbers over the (ts, event_id) total order "
        "— deterministic on any engine/partitioning; high/low/count ride "
        "the same grouped pass."
    ),
)
def q_ohlc(spark, sf_dir):
    from ..operators.temporal import ohlc_downsample

    e = _events(spark, sf_dir)
    return ohlc_downsample(
        e, "event_type", "ts", "value", "event_id", interval_minutes=60
    )


@register(
    "q_cohort_retention",
    sql="""
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
    a AS (
      SELECT DISTINCT user_id,
             CAST(ts::DATE - DATE '1970-01-01' AS BIGINT) // 7 AS period
      FROM e
    ),
    c AS (
      SELECT user_id, period,
             min(period) OVER (PARTITION BY user_id) AS cohort
      FROM a
    ),
    cnt AS (
      SELECT cohort AS cohort_period, period - cohort AS period_offset,
             count(*) AS n_active
      FROM c GROUP BY cohort, period - cohort
    ),
    sz AS (
      SELECT cohort_period, n_active AS cohort_size
      FROM cnt WHERE period_offset = 0
    )
    SELECT c1.cohort_period, c1.period_offset, c1.n_active, s.cohort_size,
           c1.n_active / s.cohort_size AS retention
    FROM cnt c1 JOIN sz s USING (cohort_period)
    """,
    doc=(
        "Weekly cohort retention matrix: users cohort by first-activity "
        "week; retention(offset) = active users / cohort size — two integer "
        "counts and one IEEE division. Two shuffles total: the (user, week) "
        "distinct pass and the (cohort, offset) count."
    ),
)
def q_cohort_retention(spark, sf_dir):
    from ..operators.temporal import cohort_retention

    e = _events(spark, sf_dir)
    return cohort_retention(e, "user_id", "ts", period_days=7)


@register(
    "q_rolling_distinct",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id AS entity,
             CAST(ts::TIMESTAMP::DATE - DATE '1970-01-01' AS BIGINT) AS d
      FROM events
    ), contrib AS (
      SELECT entity, d + off AS rd
      FROM days, unnest(range(0, 7)) AS o(off)
    ), observed AS (
      SELECT DISTINCT d FROM days
    )
    SELECT DATE '1970-01-01' + rd::INTEGER AS day,
           count(DISTINCT entity) AS n_active
    FROM contrib SEMI JOIN observed ON contrib.rd = observed.d
    GROUP BY rd
    """,
    doc=(
        "Trailing-7-day distinct active users per observed day (WAU): "
        "dedup to (user, day) pairs, contribution-explode each pair to the "
        "7 report days it covers, one grouped count-distinct — shuffle "
        "volume |user-days| x 7, independent of raw event count; days with "
        "no native activity emit nothing."
    ),
)
def q_rolling_distinct(spark, sf_dir):
    from ..operators.temporal import rolling_distinct

    e = _events(spark, sf_dir)
    return rolling_distinct(e, "ts", "user_id", window_days=7)


@register(
    "q_scd2_build",
    sql="""
    WITH e AS (
      SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type AS status
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, status,
             lag(status) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM e
    ), kept AS (
      SELECT user_id, ts, event_id, status FROM s
      WHERE prev IS NULL OR prev IS DISTINCT FROM status
    )
    SELECT user_id, status,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           row_number() OVER w AS version,
           (lead(ts) OVER w) IS NULL AS is_current
    FROM kept
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "SCD2 dimension build from a change log: collapse no-op changes "
        "(lag digest), then valid_from/valid_to/version/is_current — all "
        "three window functions share one (key, ts) spec so the whole "
        "build is ONE shuffle on the dimension key. Spark compares 8-byte "
        "null-sentinel digests; the oracle compares values directly "
        "(IS DISTINCT FROM), so digest equivalence is itself under test."
    ),
)
def q_scd2_build(spark, sf_dir):
    from ..operators.cdc import scd2_build

    e = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("status")
    )
    return scd2_build(
        e, ["user_id"], "ts", ["status"], order_cols=["event_id"]
    )


@register(
    "q_scd2_pit",
    sql="""
    WITH e AS (
      SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM e WHERE event_type <> 'purchase'
    ), kept AS (
      SELECT user_id, ts, event_id, status FROM s
      WHERE prev IS NULL OR prev IS DISTINCT FROM status
    ), dim AS (
      SELECT user_id, status,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM kept
    )
    SELECT f.event_id, f.user_id, f.ts, d.status, d.valid_from
    FROM (SELECT * FROM e WHERE event_type = 'purchase') f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
    doc=(
        "Point-in-time enrichment of facts against an SCD2 dimension: "
        "purchases pick the user-status version whose half-open interval "
        "[valid_from, valid_to) contains the purchase timestamp. Plan is "
        "an EQUI-join on the key with the interval predicate as join "
        "residual — versions-per-key is bounded, so no range-join "
        "explosion and no window over the fact table."
    ),
)
def q_scd2_pit(spark, sf_dir):
    from ..operators.cdc import scd2_build, scd2_pit_join

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    dim = scd2_build(
        e.filter(F.col("event_type") != "purchase").select(
            "user_id", "ts", "event_id", F.col("event_type").alias("status")
        ),
        ["user_id"],
        "ts",
        ["status"],
        order_cols=["event_id"],
    ).select("user_id", "status", "valid_from", "valid_to")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = scd2_pit_join(facts, dim, ["user_id"], "ts")
    return out.select("event_id", "user_id", "ts", "status", "valid_from")


@register(
    "q_interpolate",
    sql=f"""
    WITH uniq AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE user_id < 20 GROUP BY user_id, ts
    ), obs AS (
      SELECT user_id, (epoch_us(ts) // {_RS_STEP}) * {_RS_STEP} AS bus,
             epoch_us(ts) AS us, value
      FROM uniq
    ), pb AS (
      SELECT user_id, bus, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bus ORDER BY us DESC
        ) AS rn FROM obs
      ) WHERE rn = 1
    ), span AS (
      SELECT user_id, min(bus) AS lo, max(bus) AS hi FROM pb GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(range(lo, hi + {_RS_STEP}, {_RS_STEP})) AS bus
      FROM span
    ), j AS (
      SELECT g.user_id, g.bus, p.value
      FROM grid g LEFT JOIN pb p ON g.user_id = p.user_id AND g.bus = p.bus
    ), w AS (
      SELECT user_id, bus, value,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bus
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS pv,
             last_value(CASE WHEN value IS NOT NULL THEN bus END IGNORE NULLS)
               OVER (
               PARTITION BY user_id ORDER BY bus
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS pt,
             first_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bus
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS nv,
             first_value(CASE WHEN value IS NOT NULL THEN bus END IGNORE NULLS)
               OVER (
               PARTITION BY user_id ORDER BY bus
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS nt
      FROM j
    )
    SELECT user_id, make_timestamp(bus) AS bucket_ts,
           CASE WHEN value IS NOT NULL THEN value
                ELSE pv + (nv - pv) * (CAST(bus - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE))
           END AS value
    FROM w
    """,
    doc=(
        "Regular-grid resampling with LINEAR INTERPOLATION (6-hour "
        "buckets per user) — the numeric twin of q_resample_ffill: empty "
        "buckets fill with pv + (nv-pv)*(dt/span) between the surrounding "
        "observed buckets. Time deltas are exact integer micros and the "
        "expression tree is pinned on both engines, so the doubles are "
        "bit-identical with NO rounding. Forward/backward neighbor "
        "windows share the fill sort — still one key exchange."
    ),
)
def q_interpolate(spark, sf_dir):
    from ..operators.temporal import resample_interpolate

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 20)
    uniq = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    return resample_interpolate(
        uniq, ["user_id"], "ts", "value", interval_minutes=360
    )


@register(
    "q_streaks",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, ts::TIMESTAMP::DATE AS d FROM events
    ), g AS (
      SELECT user_id, d,
             CAST(d - DATE '1970-01-01' AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ), runs AS (
      SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp
    )
    SELECT user_id, max(len) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id
    """,
    doc=(
        "Longest consecutive-active-day streak per user (gaps-and-"
        "islands): epoch_day minus row_number is constant within a run, "
        "two grouped rollups finish it — exact integers, ONE key exchange "
        "shared by the dedup, the island window, and both rollups."
    ),
)
def q_streaks(spark, sf_dir):
    from ..operators.temporal import longest_streak

    return longest_streak(_events(spark, sf_dir), ["user_id"], "ts")


@register(
    "q_seasonal_decompose",
    sql="""
    WITH daily AS (
      SELECT ts::TIMESTAMP::DATE AS day, count(*) AS n_events
      FROM events GROUP BY 1
    ), t AS (
      SELECT day, n_events,
             CAST(sum(n_events) OVER w AS DOUBLE)
               / CAST(count(*) OVER w AS DOUBLE) AS trend,
             CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS phase
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), s AS (
      SELECT phase, avg(CAST(n_events AS DOUBLE) - trend) AS seasonal
      FROM t GROUP BY phase
    )
    SELECT t.day, t.n_events, t.trend,
           round(s.seasonal, 6) AS seasonal,
           round(CAST(t.n_events AS DOUBLE) - t.trend - s.seasonal, 6)
             AS residual
    FROM t JOIN s USING (phase)
    """,
    doc=(
        "Additive seasonal decomposition of daily event volume: centered "
        "7-day moving-average trend (integer sums / window size — exact), "
        "per-weekday-phase mean seasonal (float aggregate, rounded 6dp), "
        "residual. After the first grouped count everything is day-"
        "cardinality-bounded; the 7-row seasonal table broadcasts."
    ),
)
def q_seasonal_decompose(spark, sf_dir):
    from ..operators.temporal import seasonal_decompose

    out = seasonal_decompose(_events(spark, sf_dir), "ts", period=7, trend_window=7)
    return out.select(
        "day",
        "n_events",
        "trend",
        F.round("seasonal", 6).alias("seasonal"),
        F.round("residual", 6).alias("residual"),
    )


@register(
    "q_interval_intersect",
    sql="""
    WITH a AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS s,
             ts::TIMESTAMP + INTERVAL 30 MINUTE AS e
      FROM events WHERE event_type = 'view'
    ), b AS (
      SELECT user_id, event_id, ts::TIMESTAMP - INTERVAL 60 MINUTE AS s,
             ts::TIMESTAMP AS e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id,
           greatest(a.s, b.s) AS intersect_start,
           least(a.e, b.e) AS intersect_end
    FROM a JOIN b ON a.user_id = b.user_id
     AND a.s < b.e AND b.s < a.e
    """,
    doc=(
        "Interval intersection (temporal-algebra complement of "
        "merge_intervals' union): 30-minute view-attention windows "
        "clipped against 60-minute pre-purchase windows per user — one "
        "equi-join on the key with the overlap predicate as residual "
        "(per-key interval counts bounded; no stencil needed, the key "
        "carries locality). Half-open: touching endpoints don't match."
    ),
)
def q_interval_intersect(spark, sf_dir):
    from ..operators.temporal import interval_intersect

    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 60 MINUTES")).alias("s"),
        F.col("ts").alias("e"),
    )
    return interval_intersect(
        a, b, ["user_id"], "s", "e",
        a_cols=["view_id"], b_cols=["purchase_id"],
    )


@register(
    "q_attribution_linear",
    sql="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts::TIMESTAMP AS pts
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts::TIMESTAMP AS cts
      FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.purchase_id, c.click_id,
             count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.cts >= p.pts - INTERVAL 120 MINUTE
       AND c.cts < p.pts
    )
    SELECT purchase_id, click_id,
           1.0 / CAST(n_touch AS DOUBLE) AS credit
    FROM pairs
    """,
    doc=(
        "Linear multi-touch attribution: every click in the 2-hour window "
        "before a purchase shares the conversion credit equally "
        "(1/n_touch — exact per row, no float sums). Equi-join on the "
        "user key with the time window as residual (bounded per user), "
        "one count window on the purchase id. The multi-touch complement "
        "of as-of's last-touch."
    ),
)
def q_attribution_linear(spark, sf_dir):
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    pairs = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 120 MINUTES"))
        & (F.col("cts") < F.col("pts")),
    )
    w = Window.partitionBy("purchase_id")
    return pairs.select(
        "purchase_id",
        "click_id",
        (F.lit(1.0) / F.count(F.lit(1)).over(w).cast("double")).alias(
            "credit"
        ),
    )


@register(
    "q_autocorr",
    sql="""
    WITH daily AS (
      SELECT ts::TIMESTAMP::DATE AS day, count(*) AS x
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT x,
             lag(x, 1) OVER (ORDER BY day) AS x1,
             lag(x, 7) OVER (ORDER BY day) AS x7
      FROM daily
    ),
    s1 AS (
      SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x1) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x1 * x1) AS BIGINT) AS syy,
             CAST(sum(x * x1) AS BIGINT) AS sxy
      FROM lagged WHERE x1 IS NOT NULL
    ),
    s7 AS (
      SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x7) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x7 * x7) AS BIGINT) AS syy,
             CAST(sum(x * x7) AS BIGINT) AS sxy
      FROM lagged WHERE x7 IS NOT NULL
    )
    SELECT 1 AS lag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr
    FROM s1
    UNION ALL
    SELECT 7, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
    FROM s7
    """,
    doc=(
        "Lag-1 and lag-7 autocorrelation of daily event volume (trend "
        "persistence + weekly seasonality strength): integer daily "
        "counts through lag windows, exact BIGINT Pearson accumulators, "
        "one pinned double tree per lag — engine-exact, no rounding. "
        "Windows run over the |days|-row aggregate."
    ),
)
def q_autocorr(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )

    def corr_for(col, lag_val):
        f = lagged.filter(F.col(col).isNotNull())
        s = f.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum(col).cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col(col) * F.col(col)).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col(col)).cast("bigint").alias("sxy"),
        )
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        den = F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        )
        return s.select(
            F.lit(lag_val).alias("lag"), "n", (num / den).alias("autocorr")
        )

    return corr_for("x1", 1).unionByName(corr_for("x7", 7))


@register(
    "q_runs_test",
    sql="""
    WITH daily AS (
      SELECT ts::TIMESTAMP::DATE AS day, count(*) AS x
      FROM events GROUP BY 1
    ), med AS (
      SELECT quantile_cont(x, 0.5) AS m FROM daily
    ), signs AS (
      SELECT day, CASE WHEN x > m THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE x <> m
    ), flagged AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                    OR lag(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), agg AS (
      SELECT CAST(sum(new_run) AS BIGINT) AS runs,
             CAST(sum(s) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(s) AS BIGINT) AS n_neg
      FROM flagged
    )
    SELECT runs, n_pos, n_neg,
           (CAST(runs AS DOUBLE)
            - (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
               / (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE)) + 1.0))
           / sqrt(
               (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                   - CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE)))
               / ((CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
                  * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
                  * (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE) - 1.0))
             ) AS z
    FROM agg
    """,
    doc=(
        "Wald-Wolfowitz runs test on daily event volume (randomness vs "
        "trending/clustering): above/below-median signs (exact-median "
        "days excluded), run boundaries via lag, exact integer run and "
        "sign counts, normal-approximation z in one pinned double tree — "
        "engine-exact. Everything after the daily count is "
        "|days|-bounded."
    ),
)
def q_runs_test(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    med = daily.agg(F.percentile("x", F.lit(0.5)).alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("day", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.orderBy("day")
    flagged = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    agg = flagged.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum("s").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n_neg"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    n = np_ + nn
    mu = F.lit(2.0) * np_ * nn / n + F.lit(1.0)
    var = (
        F.lit(2.0) * np_ * nn * (F.lit(2.0) * np_ * nn - np_ - nn)
    ) / (n * n * (n - F.lit(1.0)))
    z = (F.col("runs").cast("double") - mu) / F.sqrt(var)
    return agg.select("runs", "n_pos", "n_neg", z.alias("z"))


@register(
    "q_life_table",
    sql="""
    WITH u AS (
      SELECT user_id,
             CAST(max(ts::TIMESTAMP::DATE) - min(ts::TIMESTAMP::DATE)
                  AS BIGINT) AS duration,
             CASE WHEN max(ts::TIMESTAMP::DATE)
                       >= (SELECT max(ts::TIMESTAMP::DATE) FROM events)
                          - INTERVAL 3 DAY
                  THEN 0 ELSE 1 END AS churned
      FROM events GROUP BY user_id
    ), d AS (
      SELECT duration,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(churned) AS BIGINT) AS n_events
      FROM u GROUP BY duration
    )
    SELECT duration,
           CAST(sum(n_total) OVER (
             ORDER BY duration DESC ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS n_at_risk,
           n_events
    FROM d
    """,
    doc=(
        "Kaplan-Meier life table for time-to-churn (duration = active "
        "span per user; users still active in the last 3 days are "
        "censored): per distinct duration, the at-risk count via one "
        "reverse cumulative window and the churn-event count — ALL exact "
        "integers (the KM survival product derives downstream from "
        "n_events/n_at_risk). Windows run over |distinct durations| rows."
    ),
)
def q_life_table(spark, sf_dir):
    e = _events(spark, sf_dir)
    maxday = e.agg(F.max(F.col("ts").cast("date")).alias("mx"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("first_d"),
            F.max(F.col("ts").cast("date")).alias("last_d"),
        )
        .crossJoin(F.broadcast(maxday))
        .select(
            F.datediff("last_d", "first_d").cast("bigint").alias("duration"),
            F.when(
                F.col("last_d") >= F.date_sub(F.col("mx"), 3), 0
            ).otherwise(1).alias("churned"),
        )
    )
    d = u.groupBy("duration").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("churned").cast("bigint").alias("n_events"),
    )
    w = (
        Window.orderBy(F.col("duration").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "duration",
        F.sum("n_total").over(w).cast("bigint").alias("n_at_risk"),
        "n_events",
    )


@register(
    "q_gap_stats",
    sql="""
    WITH uniq AS (
      SELECT DISTINCT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us
      FROM events
    ), gaps AS (
      SELECT event_type,
             us - lag(us) OVER (
               PARTITION BY user_id, event_type ORDER BY us
             ) AS gap_us
      FROM uniq
    )
    SELECT event_type, count(*) AS n_gaps,
           quantile_cont(gap_us, 0.5) AS median_gap_us,
           quantile_cont(gap_us, 0.9) AS p90_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc=(
        "Inter-event gap distribution per event type (the cadence/"
        "heartbeat profile behind session-gap and burst thresholds): "
        "integer microsecond gaps from one lag window, exact interpolated "
        "median/p90 per type — deterministic on identical integer inputs "
        "(the q_quantiles-proven property). One key exchange for the lag, "
        "one grouped percentile."
    ),
)
def q_gap_stats(spark, sf_dir):
    e = _events(spark, sf_dir)
    uniq = e.select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).distinct()
    w = Window.partitionBy("user_id", "event_type").orderBy("us")
    gaps = uniq.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    # one percentile buffer for both probs (same exact multiset + per-prob
    # interpolation → identical values, half the ObjectHashAggregate work)
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.percentile("gap_us", F.array(F.lit(0.5), F.lit(0.9))).alias("__qs__"),
    )
    return agg.select(
        "event_type", "n_gaps",
        F.element_at("__qs__", 1).alias("median_gap_us"),
        F.element_at("__qs__", 2).alias("p90_gap_us"),
    )


@register(
    "q_peak_hour",
    sql="""
    WITH h AS (
      SELECT event_type, extract(hour FROM ts::TIMESTAMP) AS hour,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, hour, cnt,
             row_number() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, hour
             ) AS rn
      FROM h
    )
    SELECT event_type, hour AS peak_hour, cnt AS peak_count
    FROM r WHERE rn = 1
    """,
    doc=(
        "Peak activity hour per event type: hourly counts + ranked window "
        "with a deterministic hour tiebreak — the diurnal-profile "
        "question answered with two tiny shuffles."
    ),
)
def q_peak_hour(spark, sf_dir):
    e = _events(spark, sf_dir)
    h = e.groupBy(
        "event_type", F.hour(F.col("ts").cast("timestamp")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("hour")
    )
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("peak_hour"),
            F.col("cnt").alias("peak_count"),
        )
    )


@register(
    "q_stickiness",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(ts::TIMESTAMP::DATE - DATE '1970-01-01' AS BIGINT) AS d
      FROM events
    ), dau AS (
      SELECT d, count(*) AS dau FROM days GROUP BY d
    ), contrib AS (
      SELECT user_id, d + off AS rd
      FROM days, unnest(range(0, 7)) AS o(off)
    ), wau AS (
      SELECT rd AS d, count(DISTINCT user_id) AS wau FROM contrib GROUP BY rd
    )
    SELECT DATE '1970-01-01' + dau.d::INTEGER AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    doc=(
        "DAU/WAU stickiness per observed day: daily actives over "
        "trailing-7-day actives (the product-engagement ratio). WAU via "
        "the same contribution-explode as q_rolling_distinct (shuffle "
        "volume |user-days| x 7, independent of event count); exact "
        "integer counts, one division."
    ),
)
def q_stickiness(spark, sf_dir):
    from ..operators.temporal import rolling_distinct

    e = _events(spark, sf_dir)
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = rolling_distinct(e, "ts", "user_id", window_days=7).select(
        F.col("day").alias("wday"), F.col("n_active").alias("wau")
    )
    j = dau.join(wau, dau.day == wau.wday)
    return j.select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "q_retention_d7",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, ts::TIMESTAMP::DATE AS d FROM events
    ), firsts AS (
      SELECT user_id, min(d) AS cohort_day FROM days GROUP BY user_id
    ), cohorts AS (
      SELECT cohort_day, count(*) AS cohort_size
      FROM firsts GROUP BY cohort_day
    ), returned AS (
      SELECT f.cohort_day, count(*) AS n_returned
      FROM firsts f
      WHERE EXISTS (
        SELECT 1 FROM days a
        WHERE a.user_id = f.user_id
          AND a.d = f.cohort_day + INTERVAL 7 DAY
      )
      GROUP BY f.cohort_day
    )
    SELECT c.cohort_day, c.cohort_size,
           COALESCE(r.n_returned, 0) AS n_returned,
           CAST(COALESCE(r.n_returned, 0) AS DOUBLE)
             / CAST(c.cohort_size AS DOUBLE) AS d7_retention
    FROM cohorts c LEFT JOIN returned r ON c.cohort_day = r.cohort_day
    """,
    doc=(
        "Day-7 retention per signup-day cohort (the bounce metric the "
        "weekly cohort matrix summarizes away): first-active day per "
        "user, exact-day-7 return via a semi join on (user, day+7), "
        "exact counts and one division. Two key shuffles total."
    ),
)
def q_retention_d7(spark, sf_dir):
    e = _events(spark, sf_dir)
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    cohorts = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    probe = firsts.select(
        "user_id", F.date_add("cohort_day", 7).alias("d7"), "cohort_day"
    )
    returned = (
        probe.join(
            days,
            (probe.user_id == days.user_id) & (probe.d7 == days.d),
            "left_semi",
        )
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n_returned"))
    )
    j = cohorts.join(returned, "cohort_day", "left")
    return j.select(
        "cohort_day",
        "cohort_size",
        F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
        (
            F.coalesce("n_returned", F.lit(0)).cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("d7_retention"),
    )


@register(
    "q_seq_trigrams",
    sql="""
    WITH uniq AS (
      SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS us, event_id
      FROM events
    ), s AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM uniq
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT a, b, c, count(*) AS cnt
    FROM s WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY a, b, c
    ORDER BY cnt DESC, a, b, c LIMIT 20
    """,
    doc=(
        "Behavioral trigrams: top-20 three-step event sequences per user "
        "stream (the order-3 extension of q_transitions' Markov bigrams) "
        "— two lead offsets over ONE window sort, grouped count, "
        "total-ordered selection. Exact integers."
    ),
)
def q_seq_trigrams(spark, sf_dir):
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id")
    )
    s = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        s.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"), F.asc("c"))
        .limit(20)
    )


@register(
    "q_conversion_latency",
    sql="""
    WITH e AS (
      SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id FROM events
    ), l AS (SELECT * FROM e WHERE event_type = 'purchase'),
       r AS (SELECT * FROM e WHERE event_type = 'click')
    SELECT CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) // 600000000
             AS latency_10min_bucket,
           count(*) AS n
    FROM l ASOF JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    GROUP BY 1
    """,
    doc=(
        "Click-to-purchase conversion latency histogram (10-minute "
        "buckets): last-touch attribution via the as-of backward join "
        "(one union+window shuffle), exact integer microsecond gaps "
        "floor-bucketed — the funnel-timing readout."
    ),
)
def q_conversion_latency(spark, sf_dir):
    from ..operators.temporal import asof_join

    e = _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "click").withColumn(
        "click_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    out = asof_join(
        left,
        right.select("user_id", "ts", "click_us"),
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_us"],
    )
    return (
        out.filter(F.col("asof_click_us").isNotNull())
        .select(
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.col("asof_click_us")
            ).alias("gap_us")
        )
        .select(F.expr("gap_us div 600000000").alias("latency_10min_bucket"))
        .groupBy("latency_10min_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_kaplan_meier",
    sql="""
    WITH base AS (
      SELECT o.o_orderpriority AS grp,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS duration,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS event
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), counts AS (
      SELECT grp, duration,
             CAST(count(*) AS BIGINT)   AS at_t,
             CAST(sum(event) AS BIGINT) AS n_events
      FROM base GROUP BY grp, duration
    ), risk AS (
      SELECT grp, duration, at_t, n_events,
             at_t - n_events AS n_censored,
             CAST(sum(at_t) OVER (PARTITION BY grp)
               - coalesce(sum(at_t) OVER (
                   PARTITION BY grp ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
      FROM counts
    ), hist AS (
      SELECT grp, duration, n_at_risk, n_events, n_censored,
             list(1.0 - CAST(n_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
               OVER (PARTITION BY grp ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
      FROM risk
    )
    SELECT grp, duration, n_at_risk, n_events, n_censored,
           list_reduce(h, (acc, x) -> acc * x) AS survival
    FROM hist
    """,
    doc=(
        "Kaplan-Meier survival curve per order priority: duration = days "
        "from order to line shipment, event = the line was eventually "
        "returned (returnflag R), censored otherwise. The running product "
        "PI(1 - d/n) is the ewma recurrence pattern — ordered collect_list "
        "+ higher-order fold, both engines folding the identical list so "
        "every survival double is bit-identical (DuckDB list_reduce seeds "
        "with the first element, matching the Spark init). n_at_risk / "
        "event counts are exact BIGINTs; the corpus collapses to the "
        "curve support (<= ~125 durations x 5 groups) before any window."
    ),
)
def q_kaplan_meier(spark, sf_dir):
    from ..operators.temporal import kaplan_meier

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff("l_shipdate", "o_orderdate").alias("duration"),
        (F.col("l_returnflag") == "R").cast("int").alias("event"),
    )
    return kaplan_meier(base, "duration", "event", ["grp"])
