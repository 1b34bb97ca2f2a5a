"""applyInPandasWithState sessionization: closed sessions emit across
micro-batches; open sessions persist in the state store."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import read_event_stream
from gdelt_2_0_event_database_pipeline_spark.streaming.stateful import (
    streaming_sessionize,
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
