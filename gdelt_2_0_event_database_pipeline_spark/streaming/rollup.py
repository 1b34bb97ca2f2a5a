"""Streaming maintenance of incremental aggregate rollup tables.

The streaming twin of ``operators/rollup.py``: a continuous ingest keeps
the per-(group, day) partial-state table current so every report keeps
reading kilobytes of state instead of raw history. Per micro-batch:
partial-aggregate the batch (map-side, tiny), combine with the existing
state rows of the TOUCHED days only, and rewrite just those day
partitions (dynamic partition overwrite — the ``upsert.py`` cost model:
O(touched partitions) per batch, not O(state)).

Exactly-once: additive state is the one shape where foreachBatch's
at-least-once delivery actually corrupts results (a replayed batch
double-counts — the module-doc failure ``refresh_rollup`` exists to
avoid). The standard fix from the Structured Streaming programming guide
is to make the sink transactional with the ``batchId``: a tiny
``_applied_batches`` parquet ledger under the state path records every
batch already merged, and a replay whose id is present becomes a no-op.
The ledger append is not atomic with the partition rewrite, so a crash
BETWEEN them still replays the merge — the remaining window is one
batch wide and closes by re-running the day's ``refresh_rollup`` from
the raw lake (the batch repair path this module's state shares).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import build_rollup, merge_rollup


def _ledger_path(state_path: str) -> str:
    return f"{state_path}/_applied_batches"


def _try_read_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """None ONLY when the path does not exist yet (AnalysisException —
    PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA). Any other failure
    (transient IO, permissions, corrupt footer) PROPAGATES so the batch
    fails loudly: treating it as 'first batch' would let a replayed
    batch double-merge (ledger read) or replace a day's existing state
    with only the fresh batch's partials (state read)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _already_applied(spark: SparkSession, state_path: str, batch_id: int) -> bool:
    ledger = _try_read_parquet(spark, _ledger_path(state_path))
    if ledger is None:  # first batch: no ledger yet
        return False
    return ledger.filter(F.col("batch_id") == batch_id).limit(1).count() > 0


def _append_ledger_atomic(
    spark: SparkSession, state_path: str, batch_id: int
) -> None:
    """Record ``batch_id`` as applied via write-to-temp + filesystem
    rename: a crash mid-write can never leave a truncated parquet file
    inside the ledger directory (which would poison every later ledger
    read and wedge the stream). Rename is atomic on HDFS and local; on
    object stores it degrades to copy+delete, still leaving only
    whole files visible."""
    tmp = f"{state_path}/_applied_batches_tmp/{int(batch_id)}"
    spark.createDataFrame([(int(batch_id),)], "batch_id long").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = hpath.getFileSystem(hconf)
    ledger_dir = jvm.org.apache.hadoop.fs.Path(_ledger_path(state_path))
    fs.mkdirs(ledger_dir)
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.endswith(".parquet"):
            fs.rename(
                status.getPath(),
                jvm.org.apache.hadoop.fs.Path(
                    f"{_ledger_path(state_path)}/batch-{int(batch_id)}.parquet"
                ),
            )
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_path}/_applied_batches_tmp"), True)


def merge_rollup_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    group_cols: Sequence[str],
    day_col: str,
    value_cols: Sequence[str],
) -> bool:
    """Merge one micro-batch into the state table at ``state_path``;
    returns False when ``batch_id`` was already applied (replay no-op).
    State lives under ``state_path/state`` partitioned by ``day_col``."""
    if _already_applied(spark, state_path, batch_id):
        return False
    batch = batch.localCheckpoint(eager=True)  # sever from the stream source
    fresh = build_rollup(batch, [*group_cols, day_col], value_cols)
    days = [r[0] for r in fresh.select(day_col).distinct().collect()]
    if days:
        data_path = f"{state_path}/state"
        state = _try_read_parquet(spark, data_path)  # None only pre-first-write
        if state is None:
            combined = fresh
        else:
            existing = state.filter(F.col(day_col).isin(days))
            combined = merge_rollup(
                existing.unionByName(fresh),
                [*group_cols, day_col],
                value_cols,
                derived=False,
            )
        # partitionOverwriteMode pinned AT THE WRITE SITE: this write
        # holds only the TOUCHED days' rows, so under Spark's default
        # static mode (any caller session without the session.py conf)
        # mode('overwrite') would delete every untouched day partition —
        # silently losing the whole rollup state on each micro-batch.
        (
            combined.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(day_col)
            .parquet(data_path)
        )
    _append_ledger_atomic(spark, state_path, batch_id)
    return True


def maintain_rollup_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    group_cols: Sequence[str],
    day_col: str,
    value_cols: Sequence[str],
):
    """``writeStream.foreachBatch`` wrapper around
    :func:`merge_rollup_batch` — returns the started query handle. Read
    the maintained state with :func:`read_rollup_state` and roll it up
    with ``operators.rollup.merge_rollup``.

    Crash repair: the ledger append is atomic (temp + rename) but not
    transactional WITH the partition rewrite — a crash between the state
    write and the ledger append replays the batch and double-counts its
    touched days. The window is one batch wide; close it by recomputing
    the affected days from the raw lake::

        fresh = build_rollup(raw.filter(day_col isin touched_days),
                             [*group_cols, day_col], value_cols)
        refresh_rollup(read_rollup_state(spark, state_path), fresh,
                       [day_col])  # replace-by-partition, idempotent
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        merge_rollup_batch(
            batch.sparkSession,
            batch,
            batch_id,
            state_path,
            group_cols,
            day_col,
            value_cols,
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The current state table (build_rollup shape at (group, day) grain)."""
    return spark.read.parquet(f"{state_path}/state")
