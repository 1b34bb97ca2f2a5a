"""Stream-stream interval join: in-window matches, out-of-window exclusion,
left-outer NULL emission once the watermark finalizes unmatched rows."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import read_event_stream
from gdelt_2_0_event_database_pipeline_spark.streaming.joins import stream_interval_join

IMP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("imp_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
CONV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("conv_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ]
)

BASE = dt.datetime(2024, 3, 1, 12, 0)


def _drop(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _drain(df, out_dir, checkpoint):
    q = (
        df.writeStream.format("parquet")
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


def test_interval_join_matches_within_window(spark, tmp_path):
    imp_src, conv_src = str(tmp_path / "imp"), str(tmp_path / "conv")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _drop(spark, imp_src, IMP_SCHEMA, [
        (1, 100, BASE),
        (2, 200, BASE),
        (3, 300, BASE),
    ])
    _drop(spark, conv_src, CONV_SCHEMA, [
        (1, 9100, BASE + dt.timedelta(minutes=10), 5.0),   # in window → match
        (2, 9200, BASE + dt.timedelta(minutes=45), 7.0),   # past 30 min → no match
        (3, 9300, BASE - dt.timedelta(minutes=5), 9.0),    # before imp → no match
    ])

    imps = read_event_stream(spark, imp_src, IMP_SCHEMA)
    convs = read_event_stream(spark, conv_src, CONV_SCHEMA)
    joined = stream_interval_join(
        imps, convs, on=["user_id"], within_minutes=30, late_minutes=5
    )
    _drain(joined, out, ckpt)

    rows = _read_out(spark, out)
    assert {(r.imp_id, r.conv_id) for r in rows} == {(100, 9100)}
    r = rows[0]
    assert r.amount == 5.0 and r.right_ts == BASE + dt.timedelta(minutes=10)


@pytest.mark.slow
def test_interval_join_left_outer_emits_after_watermark(spark, tmp_path):
    imp_src, conv_src = str(tmp_path / "imp"), str(tmp_path / "conv")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _drop(spark, imp_src, IMP_SCHEMA, [(1, 100, BASE), (2, 200, BASE)])
    _drop(spark, conv_src, CONV_SCHEMA, [
        (1, 9100, BASE + dt.timedelta(minutes=10), 5.0),
    ])
    imps = read_event_stream(spark, imp_src, IMP_SCHEMA)
    convs = read_event_stream(spark, conv_src, CONV_SCHEMA)
    joined = stream_interval_join(
        imps, convs, on=["user_id"], within_minutes=30, late_minutes=5, how="leftOuter"
    )
    _drain(joined, out, ckpt)
    # user 2's non-match may not be final yet (watermark hasn't passed
    # BASE+30+late) — only the inner match is guaranteed so far
    got = {(r.imp_id, r.conv_id) for r in _read_out(spark, out)}
    assert (100, 9100) in got

    # push both watermarks far past the interval end → unmatched imp 200
    # becomes final and emits with NULL right columns
    far = BASE + dt.timedelta(hours=3)
    _drop(spark, imp_src, IMP_SCHEMA, [(9, 900, far)])
    _drop(spark, conv_src, CONV_SCHEMA, [(9, 9900, far + dt.timedelta(hours=1), 0.0)])
    _drain(joined, out, ckpt)
    _drop(spark, imp_src, IMP_SCHEMA, [(8, 800, far + dt.timedelta(hours=2))])
    _drop(spark, conv_src, CONV_SCHEMA, [
        (8, 9800, far + dt.timedelta(hours=3), 0.0),
    ])
    _drain(joined, out, ckpt)

    rows = {r.imp_id: r for r in _read_out(spark, out)}
    assert rows[200].conv_id is None and rows[200].amount is None


def test_interval_join_rejects_bad_how(spark):
    import pytest

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        stream_interval_join(df, df, on=["value"], how="full")
