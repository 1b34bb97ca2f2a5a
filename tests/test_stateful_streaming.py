"""applyInPandasWithState sessionization: closed sessions emit across
micro-batches; open sessions persist in the state store."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import read_event_stream
from gdelt_2_0_event_database_pipeline_spark.streaming.stateful import (
    streaming_sessionize,
    streaming_sessionize_event_time,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _drop(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(sessions, out_dir, checkpoint):
    # parquet sink: the memory sink can't recover from a checkpoint, and
    # cross-batch state continuation requires checkpoint recovery
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _read_out(spark, out_dir):
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:
        return []


@pytest.mark.slow
def test_sessions_close_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1, 10, 0)

    # batch 1: two users, one session each (still open → nothing emitted)
    _drop(spark, src, [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=5), 2.0),
        (2, base, 10.0),
    ])
    out = str(tmp_path / "out")
    stream = read_event_stream(spark, src, SCHEMA)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    _drain(sessions, out, ckpt)
    assert len(_read_out(spark, out)) == 0

    # batch 2: events far past the gap → prior sessions close and emit
    _drop(spark, src, [
        (1, base + dt.timedelta(hours=2), 3.0),
        (2, base + dt.timedelta(hours=2), 30.0),
    ])
    _drain(sessions, out, ckpt)
    rows = {r.user_id: r for r in _read_out(spark, out)}
    assert rows[1].n_events == 2 and rows[1].total_value == 3.0
    assert rows[1].session_start == base
    assert rows[1].session_end == base + dt.timedelta(minutes=5)
    assert rows[2].n_events == 1 and rows[2].total_value == 10.0


@pytest.mark.slow
def test_multiple_sessions_in_one_batch(spark, tmp_path):
    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    base = dt.datetime(2024, 1, 1, 8, 0)
    # one batch containing two complete sessions + one open tail for user 5
    _drop(spark, src, [
        (5, base, 1.0),
        (5, base + dt.timedelta(minutes=10), 1.0),
        (5, base + dt.timedelta(hours=1), 2.0),     # closes session 1
        (5, base + dt.timedelta(hours=3), 4.0),     # closes session 2
    ])
    out = str(tmp_path / "out2")
    stream = read_event_stream(spark, src, SCHEMA)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    _drain(sessions, out, ckpt)
    got = sorted((r.n_events, r.total_value) for r in _read_out(spark, out))
    # two closed sessions emitted; the trailing single-event session stays open
    assert got == [(1, 2.0), (2, 2.0)]


@pytest.mark.slow
def test_event_time_sessions_under_watermark(spark, tmp_path):
    """Event-time timeouts (VERDICT r4 #6): sessions close when the
    WATERMARK passes last_event+gap; late events inside the allowed
    lateness extend their session; events beyond it are dropped and can
    never reopen or distort a closed session."""
    src = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "out3")
    base = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)

    # batch 1: open sessions for both users (watermark -> 09:55)
    _drop(spark, src, [
        (1, base, 1.0),
        (1, base + 5 * m, 2.0),
        (2, base, 10.0),
    ])
    stream = read_event_stream(spark, src, SCHEMA)
    sessions = streaming_sessionize_event_time(stream, gap_minutes=30, late_minutes=10)
    _drain(sessions, out, ckpt)
    assert len(_read_out(spark, out)) == 0

    # batch 2: user-2 event 3h later closes user-2's first session in-batch
    # (gap logic) AND advances the watermark to 12:50 at batch end. The
    # user-1 event at 10:07 is LATE vs max event time but still ahead of
    # the CURRENT watermark (09:55), so it must extend user-1's session.
    # (availableNow runs a follow-up micro-batch after the watermark
    # advances, so the user-1 timeout — watermark 12:50 > last+gap 10:37 —
    # fires within this same drain and emits WITH the late event folded in)
    _drop(spark, src, [
        (2, base + 180 * m, 30.0),
        (1, base + 7 * m, 4.0),  # late but within allowed lateness
    ])
    _drain(sessions, out, ckpt)
    rows = _read_out(spark, out)
    assert sorted((r.user_id, r.n_events) for r in rows) == [(1, 3), (2, 1)]
    u1 = [r for r in rows if r.user_id == 1][0]
    assert u1.total_value == 7.0
    assert u1.session_start == base and u1.session_end == base + 7 * m

    # batch 3: the 10:08 event is beyond the watermark (12:50) -> dropped
    # before the operator; user-1 must NOT grow a new session from it.
    _drop(spark, src, [
        (2, base + 181 * m, 31.0),
        (1, base + 8 * m, 8.0),  # too late: behind the watermark
    ])
    _drain(sessions, out, ckpt)
    u1_rows = [r for r in _read_out(spark, out) if r.user_id == 1]
    assert len(u1_rows) == 1 and u1_rows[0].n_events == 3

    # batch 4: a far-future user-2 event closes its 13:00-13:01 session by
    # gap logic. If the too-late 10:08 event had sneaked into the state in
    # batch 3, its single-event session would time out and emit HERE
    # (watermark 12:51 > 10:38) — assert it does not.
    _drop(spark, src, [(2, base + 420 * m, 99.0)])
    _drain(sessions, out, ckpt)
    rows = _read_out(spark, out)
    assert len([r for r in rows if r.user_id == 1]) == 1  # still just one
    u2 = sorted((r.n_events, r.total_value) for r in rows if r.user_id == 2)
    assert u2 == [(1, 10.0), (2, 61.0)]
