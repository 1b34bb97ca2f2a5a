"""Temporal operator tests: as-of directions and ties, range-join bin
boundaries, sessionization gap boundaries."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
)


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", _ts(0), 100.0), ("A", _ts(10), 110.0), ("B", _ts(5), 50.0)],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts(0), 1),    # tie with quote at :00 → backward includes it
            ("A", _ts(9), 2),    # last quote :00
            ("A", _ts(11), 3),   # last quote :10
            ("B", _ts(4), 4),    # before any B quote
            ("C", _ts(1), 5),    # key with no quotes at all
        ],
        "sym string, ts timestamp, qty int",
    )


def test_asof_backward(quotes, trades):
    out = asof_join(trades, quotes, ["sym"], "ts", "ts", ["px"])
    got = {r.qty: r.asof_px for r in out.collect()}
    assert got == {1: 100.0, 2: 100.0, 3: 110.0, 4: None, 5: None}


def test_asof_forward(quotes, trades):
    out = asof_join(trades, quotes, ["sym"], "ts", "ts", ["px"], direction="forward")
    got = {r.qty: r.asof_px for r in out.collect()}
    assert got == {1: 100.0, 2: 110.0, 3: None, 4: 50.0, 5: None}


def test_asof_preserves_left_rowcount(quotes, trades):
    assert asof_join(trades, quotes, ["sym"], "ts", "ts", ["px"]).count() == trades.count()


def test_asof_single_ts_column_name_addressable(quotes, trades):
    # regression: left_ts must appear exactly once so name-based references
    # work (a duplicate column raises AMBIGUOUS_REFERENCE)
    out = asof_join(trades, quotes, ["sym"], "ts", "ts", ["px"])
    assert out.columns.count("ts") == 1
    assert out.select("ts").count() == trades.count()


def test_asof_bad_direction(quotes, trades):
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(trades, quotes, ["sym"], "ts", "ts", ["px"], direction="sideways")


def test_range_join_binned_equals_unbinned(spark):
    # events every 7 minutes; window 15min → bin boundary crossings exercised
    left = spark.createDataFrame(
        [("u", _ts(m)) for m in range(0, 50, 7)], "k string, ts timestamp"
    ).withColumn("lid", F.monotonically_increasing_id())
    right = spark.createDataFrame(
        [("u", _ts(m, 30)) for m in range(0, 50, 5)], "k string, ts timestamp"
    ).withColumn("rid", F.monotonically_increasing_id())

    plain = range_join(left, right, ["k"], "ts", "ts",
                       upper=F.expr("INTERVAL 15 MINUTES"))
    binned = range_join(left, right, ["k"], "ts", "ts",
                        upper=F.expr("INTERVAL 15 MINUTES"), bin_minutes=15)
    p = {(r["lid"], r["rid"]) for r in plain.collect()}
    b = {(r["lid"], r["rid"]) for r in binned.collect()}
    assert p == b and len(p) > 10


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u", _ts(0)), ("u", _ts(10)),            # same session (10 ≤ 30)
        ("u", _ts(41)),                           # 31min gap → new session
        ("u", _ts(41, 1)),                        # 1s later → same
        ("v", _ts(0)),                            # other key independent
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sessionize(df, ["k"], "ts", gap_minutes=30)
    got = {(r.k, r.ts.minute, r.ts.second): r.session_id for r in out.collect()}
    assert got[("u", 0, 0)] == 1 and got[("u", 10, 0)] == 1
    assert got[("u", 41, 0)] == 2 and got[("u", 41, 1)] == 2
    assert got[("v", 0, 0)] == 1


def test_sessionize_exact_gap_is_same_session(spark):
    # gap == threshold stays in-session (strict > starts a new one)
    df = spark.createDataFrame(
        [("u", _ts(0)), ("u", _ts(30))], "k string, ts timestamp"
    )
    out = sessionize(df, ["k"], "ts", gap_minutes=30)
    assert {r.session_id for r in out.collect()} == {1}


def test_asof_nearest_picks_closest_either_direction(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import asof_nearest

    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 1, 12, 0, 0)),   # back@11:59 (60s) vs fwd@12:03 (180s) -> back
            (2, 10, T(2024, 1, 1, 12, 2, 30)),  # back 210s vs fwd 30s -> fwd
            (3, 10, T(2024, 1, 1, 12, 1, 0)),   # tie 120s/120s -> back preferred
            (4, 20, T(2024, 1, 1, 9, 0, 0)),    # only forward exists
            (5, 30, T(2024, 1, 1, 9, 0, 0)),    # no right rows -> NULLs
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, T(2024, 1, 1, 11, 59, 0), 100.0),
            (10, T(2024, 1, 1, 12, 3, 0), 200.0),
            (20, T(2024, 1, 1, 10, 0, 0), 300.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.nearest_value, r.nearest_gap_us)
        for r in asof_nearest(
            left, right, ["user_id"], "ts", "ts", ["value"]
        ).collect()
    }
    assert out[1] == (100.0, 60_000_000)
    assert out[2] == (200.0, 30_000_000)
    assert out[3] == (100.0, 120_000_000)  # tie -> at-or-before
    assert out[4] == (300.0, 3_600_000_000)
    assert out[5] == (None, None)


def test_asof_nearest_single_shuffle(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.skew import explain_shuffles
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import asof_nearest

    T = dt.datetime
    left = spark.createDataFrame(
        [(1, 10, T(2024, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, T(2024, 1, 1), 1.0)], "user_id long, ts timestamp, value double"
    )
    out = asof_nearest(left, right, ["user_id"], "ts", "ts", ["value"])
    assert explain_shuffles(out) == 1


def test_resample_ffill_fills_gaps(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        resample_ffill,
    )

    base = dt.datetime(2024, 5, 1, 0, 0)
    rows = [
        # key "a": obs at t0 and t0+3h → 1h grid must fill hours 1, 2
        ("a", base, 10.0),
        ("a", base + dt.timedelta(hours=3), 40.0),
        # two obs in ONE bucket: the later one wins
        ("a", base + dt.timedelta(minutes=10), 11.0),
        # key "b": single observation → single bucket, no fill rows
        ("b", base + dt.timedelta(hours=1), 99.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_ffill(df, ["k"], "ts", ["v"], interval_minutes=60)
    got = {(r.k, r.bucket_ts): r.v for r in out.collect()}
    assert got == {
        ("a", base): 11.0,                              # latest-in-bucket wins
        ("a", base + dt.timedelta(hours=1)): 11.0,      # forward-filled
        ("a", base + dt.timedelta(hours=2)): 11.0,      # forward-filled
        ("a", base + dt.timedelta(hours=3)): 40.0,
        ("b", base + dt.timedelta(hours=1)): 99.0,
    }


def test_resample_ffill_rejects_bad_interval(spark):
    import pytest

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        resample_ffill,
    )

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        resample_ffill(df, ["k"], "ts", ["v"], interval_minutes=0)


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 5, 1, 12, 0)
    left = spark.createDataFrame(
        [
            (1, "k", base),                                # 2h after match → kept
            (2, "k", base + dt.timedelta(hours=10)),       # 12h after → stale
            (3, "k", base - dt.timedelta(hours=5)),        # before any → null
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", base - dt.timedelta(hours=2), 7.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_minutes=4 * 60
    )
    got = {r.id: r.asof_v for r in out.collect()}
    assert got == {1: 7.0, 2: None, 3: None}
    # forward direction: tolerance bounds the wait-ahead
    fwd = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        direction="forward", tolerance_minutes=4 * 60,
    )
    got_f = {r.id: r.asof_v for r in fwd.collect()}
    assert got_f == {1: None, 2: None, 3: 7.0}  # only id 3 is within 4h before the match
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "ts", "ts", ["v"], tolerance_minutes=-1)


def test_funnel_ordered_semantics(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import funnel_steps

    t = lambda m: dt.datetime(2024, 6, 1, 0, m)
    rows = [
        # u1 completes in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # u2: click BEFORE first view — doesn't count; later click does
        (2, t(3), "click"), (2, t(4), "view"), (2, t(8), "click"),
        # u3: purchase without click → stops at step 1
        (3, t(0), "view"), (3, t(2), "purchase"),
        # u4: no view at all → all NULL
        (4, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel_steps(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()
    }
    assert got[1] == (t(0), t(5), t(9))
    assert got[2] == (t(4), t(8), None)   # pre-view click ignored
    assert got[3] == (t(0), None, None)   # purchase can't skip click
    assert got[4] == (None, None, None)

    import pytest

    with pytest.raises(ValueError):
        funnel_steps(df, "user_id", "ts", "event_type", [])


def test_merge_intervals_semantics(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        merge_intervals,
    )

    t = lambda m: dt.datetime(2024, 7, 1, 0, m)
    rows = [
        # k1: [0,10] + [5,15] overlap; [15,20] touches → ONE island [0,20];
        #     [30,35] separate
        ("k1", t(0), t(10)), ("k1", t(5), t(15)), ("k1", t(15), t(20)),
        ("k1", t(30), t(35)),
        # k2: nested interval [0,40] ⊃ [10,20]; [25,30] is INSIDE the outer
        # island even though it starts after the previous row's own end
        ("k2", t(0), t(40)), ("k2", t(10), t(20)), ("k2", t(25), t(30)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = {
        (r.k, r.interval_start): (r.interval_end, r.n_merged)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == {
        ("k1", t(0)): (t(20), 3),
        ("k1", t(30)): (t(35), 1),
        ("k2", t(0)): (t(40), 3),   # running-max handles nesting correctly
    }


def test_transition_counts_semantics(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        transition_counts,
    )

    t = lambda m: dt.datetime(2024, 8, 1, 0, m)
    rows = [
        # u1: a -> b -> a ; u2: a -> b ; u3: single event, no transition
        (1, 1, t(0), "a"), (2, 1, t(1), "b"), (3, 1, t(2), "a"),
        (4, 2, t(0), "a"), (5, 2, t(1), "b"),
        (6, 3, t(0), "c"),
        # u4: same-ts tie broken by event_id: 7 then 8 -> b -> a
        (8, 4, t(5), "a"), (7, 4, t(5), "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {
        (r.prev_state, r.next_state): (r.n_transitions, r.p_transition)
        for r in transition_counts(df, "user_id", "event_type", ["ts", "event_id"]).collect()
    }
    assert got[("a", "b")] == (2, 1.0)          # both a's go to b
    assert got[("b", "a")] == (2, 1.0)          # includes the tie-broken u4 pair
    assert ("c", "c") not in got                # singletons produce nothing
    assert sum(n for n, _ in got.values()) == 4


def test_detect_bursts_flags_planted_spike(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        detect_bursts,
    )

    rows = []
    eid = 0
    # 10 quiet days with 5 events each, then a 50-event spike on day 11.
    for d in range(1, 11):
        for _ in range(5):
            rows.append((eid, dt.datetime(2024, 3, d, 12, 0), "x")); eid += 1
    for _ in range(50):
        rows.append((eid, dt.datetime(2024, 3, 11, 12, 0), "x")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = detect_bursts(df, "ts", ["event_type"], baseline_days=7, z_threshold=3.0).collect()
    by_day = {r.day.day: r for r in out}
    spike = by_day[11]
    assert spike.is_burst and spike.n_events == 50 and spike.base_mean == 5.0
    # constant baseline -> std floored at 1.0 -> z = 45 exactly
    assert spike.z == 45.0
    # quiet days are not bursts; first days lack baseline -> z NULL, never burst
    assert all(not r.is_burst for d, r in by_day.items() if d != 11)
    assert by_day[1].z is None and not by_day[1].is_burst
    # baseline excludes the current day and is RANGE- (calendar-) bounded
    assert by_day[8].base_days == 7


def test_detect_bursts_range_frame_handles_calendar_gaps(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        detect_bursts,
    )

    # events on day 1 and day 20: the gap means day 20 has NO baseline days
    rows = [(1, dt.datetime(2024, 5, 1), "x"), (2, dt.datetime(2024, 5, 20), "x")]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r.day.day: r for r in detect_bursts(df, "ts", ["event_type"]).collect()}
    assert out[20].base_days == 0 and out[20].base_mean is None
    assert not out[20].is_burst


def test_ewma_recurrence_and_single_element(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import ewma

    t = lambda m: dt.datetime(2024, 9, 1, 0, m)
    rows = [(1, 1, t(0), 10.0), (2, 1, t(1), 20.0), (3, 1, t(2), 40.0),
            (4, 2, t(0), 7.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r.event_id: r.ewma
           for r in ewma(df, "user_id", "value", ["ts", "event_id"], alpha=0.5).collect()}
    assert got[1] == 10.0                       # e1 = v1
    assert got[2] == 0.5 * 20.0 + 0.5 * 10.0    # 15.0
    assert got[3] == 0.5 * 40.0 + 0.5 * 15.0    # 27.5
    assert got[4] == 7.0                        # independent key

    import pytest

    with pytest.raises(ValueError):
        ewma(df, "user_id", "value", ["ts"], alpha=0.0)


def test_ohlc_deterministic_open_close_with_ties(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        ohlc_downsample,
    )

    t = dt.datetime(2024, 10, 1, 10, 0)
    rows = [
        # two observations share the SAME ts: event_id breaks the tie
        (1, "x", t, 5.0), (2, "x", t, 7.0),
        (3, "x", t.replace(minute=30), 1.0),
        (4, "x", t.replace(minute=59), 6.0),
        (5, "x", t.replace(hour=11), 9.0),       # next bucket
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp, v double")
    out = {r.bucket_ts.hour: r for r in
           ohlc_downsample(df, "k", "ts", "v", "event_id").collect()}
    b10 = out[10]
    assert (b10.open, b10.high, b10.low, b10.close, b10.n_obs) == (5.0, 7.0, 1.0, 6.0, 4)
    b11 = out[11]
    assert (b11.open, b11.close, b11.n_obs) == (9.0, 9.0, 1)


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        cohort_retention,
    )

    d = lambda off: dt.datetime(2024, 1, 4, 12) + dt.timedelta(days=off)  # Thursday
    rows = [
        # cohort A (week of Jan 4): users 1,2; user 1 returns weeks +1,+2,
        # user 2 returns week +2 only; duplicate same-week activity ignored
        (1, d(0)), (1, d(1)), (1, d(7)), (1, d(14)),
        (2, d(0)), (2, d(14)),
        # cohort B: user 3 one week later, never returns
        (3, d(7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_period, r.period_offset): (r.n_active, r.cohort_size, r.retention)
           for r in cohort_retention(df, "user_id", "ts", period_days=7).collect()}
    ca = min(k[0] for k in out)
    assert out[(ca, 0)] == (2, 2, 1.0)
    assert out[(ca, 1)] == (1, 2, 0.5)
    assert out[(ca, 2)] == (2, 2, 1.0)
    assert out[(ca + 1, 0)] == (1, 1, 1.0)
    assert (ca + 1, 1) not in out


def test_rolling_distinct_window_semantics(spark):
    import datetime as dt

    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        rolling_distinct,
    )

    d = lambda day, u: (u, dt.datetime(2024, 6, day, 9))
    rows = [d(1, 1), d(1, 1), d(1, 2),      # day1: users {1,2} (dup event)
            d(3, 2),                          # day3: {2}
            d(10, 3)]                         # far gap
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.day.day: r.n_active for r in rolling_distinct(df, "ts", "user_id", window_days=3).collect()}
    # observed days only: 1, 3, 10
    assert set(out) == {1, 3, 10}
    assert out[1] == 2              # {1,2}
    assert out[3] == 2              # day1 within 3-day trailing window {1,2}
    assert out[10] == 1             # gap: only user 3

    import pytest

    with pytest.raises(ValueError):
        rolling_distinct(df, "ts", "user_id", window_days=0)


# ---------------------------------------------------------------------------
# Linear-interpolation resample + time-weighted average
# ---------------------------------------------------------------------------

from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (  # noqa: E402
    resample_interpolate,
    time_weighted_avg,
)


def _series(spark, rows):
    # rows: (key, minute, value)
    return spark.createDataFrame(rows, "k long, m long, v double").select(
        "k", F.timestamp_micros(F.col("m") * 60_000_000).alias("ts"), "v"
    )


def test_interpolate_fills_linearly(spark):
    # observations at minute 0 (v=0) and minute 30 (v=3) on a 10-min grid:
    # buckets 10 and 20 interpolate to 1.0 and 2.0
    s = _series(spark, [(1, 0, 0.0), (1, 30, 3.0)])
    out = resample_interpolate(s, ["k"], "ts", "v", interval_minutes=10)
    got = {r.bucket_ts.minute: r.v for r in out.collect()}
    assert got == {0: 0.0, 10: 1.0, 20: 2.0, 30: 3.0}


def test_interpolate_observed_buckets_untouched(spark):
    s = _series(spark, [(1, 0, 5.0), (1, 10, 7.5), (1, 20, -1.0)])
    out = resample_interpolate(s, ["k"], "ts", "v", interval_minutes=10)
    got = {r.bucket_ts.minute: r.v for r in out.collect()}
    assert got == {0: 5.0, 10: 7.5, 20: -1.0}


def test_interpolate_last_in_bucket_wins_then_interpolates(spark):
    # two obs inside bucket 0 (minutes 1 and 9): the later one (9, v=10)
    # is the bucket value; bucket 10 empty -> midpoint to minute-20 obs
    s = _series(spark, [(1, 1, 2.0), (1, 9, 10.0), (1, 20, 20.0)])
    out = resample_interpolate(s, ["k"], "ts", "v", interval_minutes=10)
    got = {r.bucket_ts.minute: r.v for r in out.collect()}
    assert got[0] == 10.0 and got[10] == 15.0 and got[20] == 20.0


def test_twap_weights_by_duration(spark):
    # v=1 held 10 min, then v=5 held 30 min (last obs closes the window)
    s = _series(spark, [(1, 0, 1.0), (1, 10, 5.0), (1, 40, 99.0)])
    out = time_weighted_avg(s, ["k"], "ts", "v").collect()[0]
    assert out.twap == (1.0 * 10 + 5.0 * 30) / 40
    assert out.n_obs == 3


def test_twap_single_observation_null(spark):
    s = _series(spark, [(1, 0, 7.0)])
    out = time_weighted_avg(s, ["k"], "ts", "v").collect()[0]
    assert out.twap is None and out.n_obs == 1


def test_longest_streak_gaps_and_islands(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import longest_streak

    def d(day):
        return F.timestamp_micros(F.lit(day * 86_400_000_000))

    rows = []
    # user 1: days 1,2,3, gap, 5,6 -> longest 3, active 5
    for day in [1, 2, 3, 5, 6]:
        rows.append((1, day))
    # user 2: single day -> 1
    rows.append((2, 10))
    # user 3: duplicate events same day must not inflate the streak
    rows += [(3, 20), (3, 20), (3, 21)]
    df = spark.createDataFrame(rows, "k long, day long").select(
        "k", F.timestamp_micros(F.col("day") * 86_400_000_000).alias("ts")
    )
    got = {
        r.k: (r.longest_streak, r.n_active_days)
        for r in longest_streak(df, ["k"], "ts").collect()
    }
    assert got == {1: (3, 5), 2: (1, 1), 3: (2, 2)}


def test_seasonal_decompose_reconstructs_and_finds_weekly_pattern(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    # 8 weeks of synthetic events: base 3/day + 5 extra on phase-0 days
    rows = []
    for day in range(56):
        n = 3 + (5 if day % 7 == 0 else 0)
        for i in range(n):
            rows.append((day * 86_400_000_000 + i,))
    df = spark.createDataFrame(rows, "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = seasonal_decompose(df, "ts", period=7, trend_window=7).collect()
    assert len(out) == 56
    # additive identity holds exactly
    for r in out:
        assert abs(r.n_events - (r.trend + r.seasonal + r.residual)) < 1e-9
    # the planted phase dominates the seasonal component
    by_phase = {}
    for r in out:
        phase = (r.day - __import__("datetime").date(1970, 1, 1)).days % 7
        by_phase.setdefault(phase, r.seasonal)
    assert by_phase[0] == max(by_phase.values())
    assert by_phase[0] > 3  # ~ +5*6/7 on interior days


def test_interval_intersect_clipping_and_touching(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        interval_intersect,
    )

    a = spark.createDataFrame(
        [(1, 100, 0, 10), (1, 101, 20, 30), (2, 102, 0, 5)],
        "k long, aid long, s long, e long",
    )
    b = spark.createDataFrame(
        [(1, 200, 5, 25), (1, 201, 30, 40), (2, 202, 7, 9)],
        "k long, bid long, s long, e long",
    )
    got = {
        (r.aid, r.bid): (r.intersect_start, r.intersect_end)
        for r in interval_intersect(
            a, b, ["k"], "s", "e", a_cols=["aid"], b_cols=["bid"]
        ).collect()
    }
    # 100∩200 = [5,10]; 101∩200 = [20,25]; 101∩201 touches at 30 -> excluded;
    # key 2 intervals disjoint -> nothing
    assert got == {(100, 200): (5, 10), (101, 200): (20, 25)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_intersect(a, b, ["k"], "s", "e", a_cols=["x"], b_cols=["x"])


from hypothesis import given, settings, strategies as st


@st.composite
def _intervals(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    out = []
    for i in range(n):
        s = draw(st.integers(0, 20))
        e = s + draw(st.integers(1, 10))
        out.append((draw(st.integers(1, 2)), i, s, e))
    return out


@settings(max_examples=15, deadline=None)
@given(_intervals(), _intervals())
@pytest.mark.slow
def test_interval_intersect_property(spark, xs, ys):
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        interval_intersect,
    )

    a = spark.createDataFrame(xs or [(1, 99, 0, 1)], "k long, aid long, s long, e long")
    b = spark.createDataFrame(ys or [(1, 99, 5, 6)], "k long, bid long, s long, e long")
    xs = xs or [(1, 99, 0, 1)]
    ys = ys or [(1, 99, 5, 6)]
    got = {
        (r.k, r.aid, r.bid, r.intersect_start, r.intersect_end)
        for r in interval_intersect(
            a, b, ["k"], "s", "e", a_cols=["aid"], b_cols=["bid"]
        ).collect()
    }
    want = set()
    for ka, ai, sa, ea in xs:
        for kb, bi, sb, eb in ys:
            if ka == kb and sa < eb and sb < ea:
                want.add((ka, ai, bi, max(sa, sb), min(ea, eb)))
    assert got == want


def test_kaplan_meier_matches_hand_computation(spark):
    """Textbook KM on hand data with censoring: subjects with durations
    (2 event, 2 event, 3 censored, 5 event, 7 censored) — curve steps
    only at event durations; censored rows reduce n_at_risk but keep
    survival flat (factor exactly 1.0)."""
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        kaplan_meier,
    )

    rows = [("g", 2, 1), ("g", 2, 1), ("g", 3, 0), ("g", 5, 1), ("g", 7, 0)]
    df = spark.createDataFrame(rows, "grp string, t int, ev int")
    got = {
        r.duration: r
        for r in kaplan_meier(df, "t", "ev", ["grp"]).collect()
    }
    assert set(got) == {2, 3, 5, 7}
    # t=2: n=5, d=2 -> S = 1 - 2/5 = 0.6
    assert got[2].n_at_risk == 5 and got[2].n_events == 2
    assert got[2].survival == pytest.approx(0.6)
    # t=3: censored only -> survival unchanged (exact 1.0 factor)
    assert got[3].n_at_risk == 3 and got[3].n_censored == 1
    assert got[3].survival == got[2].survival
    # t=5: n=2, d=1 -> S = 0.6 * 0.5 = 0.3
    assert got[5].n_at_risk == 2 and got[5].survival == pytest.approx(0.3)
    # t=7: censored at the end -> flat
    assert got[7].n_at_risk == 1 and got[7].survival == pytest.approx(0.3)


def test_kaplan_meier_groups_independent_and_monotone(spark):
    from gdelt_2_0_event_database_pipeline_spark.operators.temporal import (
        kaplan_meier,
    )

    rows = [("a", t, 1) for t in (1, 2, 3)] + [("b", 9, 1)]
    df = spark.createDataFrame(rows, "grp string, t int, ev int")
    out = kaplan_meier(df, "t", "ev", ["grp"]).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    assert {r.duration for r in by_grp["b"]} == {9}
    a = sorted(by_grp["a"], key=lambda r: r.duration)
    surv = [r.survival for r in a]
    assert surv == sorted(surv, reverse=True)  # non-increasing
    assert surv[-1] == pytest.approx(0.0)
