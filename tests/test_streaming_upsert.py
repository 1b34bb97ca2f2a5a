"""Partition-scoped streaming merge-upsert: replaces same-key rows, appends
new keys, rewrites only touched partitions, converges under replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import read_event_stream
from gdelt_2_0_event_database_pipeline_spark.streaming.upsert import (
    merge_upsert_batch,
    upsert_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("day", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)


def _drop(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _lake(spark, path):
    return {(r.k, r.day): r.v for r in spark.read.parquet(path).collect()}


def test_merge_upsert_batch_semantics(spark, tmp_path):
    lake = str(tmp_path / "lake")
    b1 = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")], SCHEMA
    )
    merge_upsert_batch(spark, b1, lake, ["k"], "day")
    assert _lake(spark, lake) == {(1, "d1"): "a", (2, "d1"): "b", (3, "d2"): "c"}

    # update key 2, add key 4 — only partition d1 is touched
    before_d2 = set(
        spark.read.parquet(lake).filter("day = 'd2'")
        .select(F.input_file_name()).distinct().toPandas()["input_file_name()"]
    )
    b2 = spark.createDataFrame([(2, "d1", "B2"), (4, "d1", "d")], SCHEMA)
    merge_upsert_batch(spark, b2, lake, ["k"], "day")
    assert _lake(spark, lake) == {
        (1, "d1"): "a", (2, "d1"): "B2", (3, "d2"): "c", (4, "d1"): "d"
    }
    after_d2 = set(
        spark.read.parquet(lake).filter("day = 'd2'")
        .select(F.input_file_name()).distinct().toPandas()["input_file_name()"]
    )
    # dynamic overwrite left the untouched partition's files in place
    assert before_d2 == after_d2

    # idempotence: re-merging the same batch is a no-op on content
    merge_upsert_batch(spark, b2, lake, ["k"], "day")
    assert _lake(spark, lake) == {
        (1, "d1"): "a", (2, "d1"): "B2", (3, "d2"): "c", (4, "d1"): "d"
    }


@pytest.mark.slow
def test_upsert_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    _drop(spark, src, [(1, "d1", "a"), (2, "d2", "b")])
    stream = read_event_stream(spark, src, SCHEMA)
    q = upsert_stream(stream, lake, ckpt, ["k"], "day")
    q.awaitTermination(120)
    assert _lake(spark, lake) == {(1, "d1"): "a", (2, "d2"): "b"}

    _drop(spark, src, [(1, "d1", "a2"), (3, "d3", "c")])
    q = upsert_stream(stream, lake, ckpt, ["k"], "day")
    q.awaitTermination(120)
    assert _lake(spark, lake) == {(1, "d1"): "a2", (2, "d2"): "b", (3, "d3"): "c"}
