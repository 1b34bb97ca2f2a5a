"""Streaming rollup maintenance: per-batch partial merge touches only the
batch's day partitions, the batch-id ledger makes replays no-ops, and the
maintained state always answers exactly like a direct aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.operators.rollup import merge_rollup
from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
    read_event_stream,
)
from gdelt_2_0_event_database_pipeline_spark.streaming.rollup import (
    maintain_rollup_stream,
    merge_rollup_batch,
    read_rollup_state,
)

SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _totals(spark, state_path):
    state = read_rollup_state(spark, state_path)
    return {
        r.grp: (r.v_n, r.v_sum, r.v_min, r.v_max)
        for r in merge_rollup(state, ["grp"], ["v"], derived=False).collect()
    }


def test_batch_merge_accumulates_and_ledger_blocks_replay(spark, tmp_path):
    sp = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [("a", "d1", 1.0), ("a", "d1", 3.0), ("b", "d2", 10.0)], SCHEMA
    )
    assert merge_rollup_batch(spark, b1, 0, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp) == {"a": (2, 4.0, 1.0, 3.0), "b": (1, 10.0, 10.0, 10.0)}

    # second batch adds to an existing day AND a new day
    b2 = spark.createDataFrame(
        [("a", "d1", 5.0), ("a", "d3", 7.0)], SCHEMA
    )
    assert merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp) == {"a": (4, 16.0, 1.0, 7.0), "b": (1, 10.0, 10.0, 10.0)}

    # replay of batch 1 (at-least-once delivery) is a ledger no-op
    assert not merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp) == {"a": (4, 16.0, 1.0, 7.0), "b": (1, 10.0, 10.0, 10.0)}

    # untouched day partition files survive a later batch byte-identical
    before = set(
        spark.read.parquet(f"{sp}/state").filter("day = 'd2'")
        .select(F.input_file_name()).distinct().toPandas()["input_file_name()"]
    )
    b3 = spark.createDataFrame([("a", "d1", 100.0)], SCHEMA)
    assert merge_rollup_batch(spark, b3, 2, sp, ["grp"], "day", ["v"])
    after = set(
        spark.read.parquet(f"{sp}/state").filter("day = 'd2'")
        .select(F.input_file_name()).distinct().toPandas()["input_file_name()"]
    )
    assert before == after


def test_stream_end_to_end_matches_direct_aggregate(spark, tmp_path):
    src = str(tmp_path / "src")
    sp = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [("a", "d1", 1.0), ("a", "d2", 2.0), ("b", "d1", 5.0)]
    rows2 = [("a", "d1", 4.0), ("c", "d3", 9.0)]

    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = read_event_stream(spark, src, SCHEMA)
    q = maintain_rollup_stream(stream, sp, ckpt, ["grp"], "day", ["v"])
    q.awaitTermination(120)

    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = maintain_rollup_stream(stream, sp, ckpt, ["grp"], "day", ["v"])
    q.awaitTermination(120)

    direct = {
        r.grp: (r.n, r.s)
        for r in spark.createDataFrame(rows1 + rows2, SCHEMA)
        .groupBy("grp")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    got = {g: (n, s) for g, (n, s, _, _) in _totals(spark, sp).items()}
    assert got == direct
