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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import build_rollup, merge_rollup


def _ledger_path(state_path: str) -> str:
    return f"{state_path}/_applied_batches"


def _already_applied(spark: SparkSession, state_path: str, batch_id: int) -> bool:
    try:
        ledger = spark.read.parquet(_ledger_path(state_path))
    except Exception:  # first batch: no ledger yet
        return False
    return ledger.filter(F.col("batch_id") == batch_id).limit(1).count() > 0


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
        try:
            existing = spark.read.parquet(data_path).filter(
                F.col(day_col).isin(days)
            )
            combined = merge_rollup(
                existing.unionByName(fresh),
                [*group_cols, day_col],
                value_cols,
                derived=False,
            )
        except Exception:  # first batch: state doesn't exist yet
            combined = fresh
        (
            combined.write.mode("overwrite")
            .partitionBy(day_col)
            .parquet(data_path)
        )
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "append"
    ).parquet(_ledger_path(state_path))
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
    with ``operators.rollup.merge_rollup``."""

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
