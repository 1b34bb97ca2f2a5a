"""Streaming rollup maintenance: per-batch partial merge touches only the
batch's day partitions, the batch-id ledger makes replays no-ops, and the
maintained state always answers exactly like a direct aggregate."""

from __future__ import annotations

import pytest
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


def test_merge_under_static_overwrite_mode_preserves_state(spark, tmp_path):
    """The dynamic partition-overwrite mode is pinned AT THE WRITE SITE:
    a caller session left at Spark's default static mode must NOT lose
    untouched day partitions on each micro-batch (r9 advice item 1)."""
    sp = str(tmp_path / "state")
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        b1 = spark.createDataFrame([("a", "d1", 1.0), ("b", "d2", 10.0)], SCHEMA)
        assert merge_rollup_batch(spark, b1, 0, sp, ["grp"], "day", ["v"])
        # second batch touches ONLY d1; under static mode an un-pinned
        # overwrite would delete the d2 partition here
        b2 = spark.createDataFrame([("a", "d1", 3.0)], SCHEMA)
        assert merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
        assert _totals(spark, sp) == {
            "a": (2, 4.0, 1.0, 3.0),
            "b": (1, 10.0, 10.0, 10.0),
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_ledger_append_is_atomic_and_cleans_tmp(spark, tmp_path):
    """The ledger is written via temp + rename: after a merge the ledger
    directory holds only whole parquet files and the temp dir is gone (a
    truncated in-place append could poison every later ledger read)."""
    import os

    sp = str(tmp_path / "state")
    b1 = spark.createDataFrame([("a", "d1", 1.0)], SCHEMA)
    assert merge_rollup_batch(spark, b1, 7, sp, ["grp"], "day", ["v"])
    assert not os.path.exists(f"{sp}/_applied_batches_tmp")
    files = [
        f for f in os.listdir(f"{sp}/_applied_batches") if not f.startswith(".")
    ]  # dot-prefixed .crc sidecars (local checksum FS) are reader-invisible
    assert files and all(f.endswith(".parquet") for f in files)
    ledger = spark.read.parquet(f"{sp}/_applied_batches")
    assert [r.batch_id for r in ledger.collect()] == [7]


def test_crash_before_commit_replays_cleanly(spark, tmp_path, monkeypatch):
    """Injected crash BETWEEN the state staging and the ledger commit:
    state must be untouched (stage-only), and the replay must apply the
    batch exactly once against the unchanged state."""
    from gdelt_2_0_event_database_pipeline_spark.streaming import rollup as R

    sp = str(tmp_path / "state")
    b1 = spark.createDataFrame([("a", "d1", 1.0), ("b", "d2", 10.0)], SCHEMA)
    assert merge_rollup_batch(spark, b1, 0, sp, ["grp"], "day", ["v"])

    b2 = spark.createDataFrame([("a", "d1", 3.0)], SCHEMA)

    def _boom(*a, **k):
        raise RuntimeError("injected crash at the commit point")

    monkeypatch.setattr(R, "_append_ledger_atomic", _boom)
    try:
        merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
        raise AssertionError("injected crash did not propagate")
    except RuntimeError:
        pass
    # stage-only: state unchanged, staging left behind for recovery
    assert _totals(spark, sp) == {"a": (1, 1.0, 1.0, 1.0), "b": (1, 10.0, 10.0, 10.0)}
    monkeypatch.undo()

    # replay: recovery drops the uncommitted staging, batch merges once
    assert merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp) == {"a": (2, 4.0, 1.0, 3.0), "b": (1, 10.0, 10.0, 10.0)}
    import os

    assert not os.path.exists(f"{sp}/_pending")


def test_crash_after_commit_never_double_counts(spark, tmp_path, monkeypatch):
    """Injected crash BETWEEN the ledger commit and the publish — the
    exact window the old ledger-last ordering left open to double
    counting. The replay must see the batch as applied, finish the
    publish from the frozen staging, and the totals must equal a single
    application."""
    from gdelt_2_0_event_database_pipeline_spark.streaming import rollup as R

    sp = str(tmp_path / "state")
    b1 = spark.createDataFrame([("a", "d1", 1.0), ("b", "d2", 10.0)], SCHEMA)
    assert merge_rollup_batch(spark, b1, 0, sp, ["grp"], "day", ["v"])

    b2 = spark.createDataFrame([("a", "d1", 3.0), ("c", "d3", 7.0)], SCHEMA)
    real_publish = R._publish_pending

    def _boom(*a, **k):
        raise RuntimeError("injected crash after the commit point")

    monkeypatch.setattr(R, "_publish_pending", _boom)
    try:
        merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
        raise AssertionError("injected crash did not propagate")
    except RuntimeError:
        pass
    # committed but unpublished: state lags by exactly this batch
    assert _totals(spark, sp) == {"a": (1, 1.0, 1.0, 1.0), "b": (1, 10.0, 10.0, 10.0)}
    monkeypatch.setattr(R, "_publish_pending", real_publish)

    # replay: ledger says applied -> recovery publishes, merge skipped
    assert not merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp) == {
        "a": (2, 4.0, 1.0, 3.0),
        "b": (1, 10.0, 10.0, 10.0),
        "c": (1, 7.0, 7.0, 7.0),
    }
    import os

    assert not os.path.exists(f"{sp}/_pending")

    # and a SECOND replay (at-least-once can deliver thrice) is a pure no-op
    assert not merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    assert _totals(spark, sp)["a"] == (2, 4.0, 1.0, 3.0)


def test_recover_rollup_state_publishes_without_a_batch(spark, tmp_path, monkeypatch):
    """After a post-commit crash, recover_rollup_state brings reads
    current without waiting for the next micro-batch."""
    from gdelt_2_0_event_database_pipeline_spark.streaming import rollup as R
    from gdelt_2_0_event_database_pipeline_spark.streaming.rollup import (
        recover_rollup_state,
    )

    sp = str(tmp_path / "state")
    b1 = spark.createDataFrame([("a", "d1", 1.0)], SCHEMA)
    assert merge_rollup_batch(spark, b1, 0, sp, ["grp"], "day", ["v"])
    b2 = spark.createDataFrame([("a", "d1", 3.0)], SCHEMA)
    monkeypatch.setattr(R, "_publish_pending", lambda *a, **k: (_ for _ in ()).throw(RuntimeError("x")))
    try:
        merge_rollup_batch(spark, b2, 1, sp, ["grp"], "day", ["v"])
    except RuntimeError:
        pass
    monkeypatch.undo()
    recover_rollup_state(spark, sp)
    assert _totals(spark, sp) == {"a": (2, 4.0, 1.0, 3.0)}


def test_missing_paths_read_as_none_not_errors(spark, tmp_path):
    from gdelt_2_0_event_database_pipeline_spark.streaming.rollup import (
        _try_read_parquet,
    )

    assert _try_read_parquet(spark, str(tmp_path / "nope")) is None


@pytest.mark.slow
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
