"""Streaming data-quality gate: the batch expectations engine
(`operators.expectations`) applied per micro-batch via ``foreachBatch`` —
every arriving file/batch appends its own (batch_id, rule, violations)
report rows, so a lake ingest pipeline gets a continuous quality ledger
instead of a one-shot audit.

``foreachBatch`` is the right primitive here (not a stateful operator):
each batch's report is independent, the batch frame is a plain DataFrame so
the single-pass rule compilation is reused verbatim, and the parquet ledger
append is idempotent per batch id under checkpoint replay.

The threshold rules (r15: ``min_rows``, ``max_null_frac``) evaluate
PER MICRO-BATCH here — ``min_rows`` doubles as an empty/short-batch
detector, and a null-rate tolerance is judged against each batch's own
row count, not the cumulative stream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import check_expectations


def streaming_expectations(
    stream: DataFrame,
    rules: Sequence[dict],
    ledger_path: str,
    checkpoint_path: str,
    *,
    trigger_available_now: bool = True,
):
    """Start the quality-ledger query: per micro-batch, evaluate ``rules``
    in one aggregation pass and append the tall report (plus ``batch_id``)
    to ``ledger_path``. Returns the started ``StreamingQuery``."""
    if not rules:
        raise ValueError("rules must be non-empty")

    def _audit(batch_df: DataFrame, batch_id: int) -> None:
        (
            check_expectations(batch_df, rules)
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("append")
            .parquet(ledger_path)
        )

    writer = (
        stream.writeStream.foreachBatch(_audit)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
