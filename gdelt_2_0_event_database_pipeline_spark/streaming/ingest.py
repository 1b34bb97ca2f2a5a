"""Structured Streaming surface (SURVEY.md §2.9 — extension, not reference
parity: the reference is batch-over-completed-files only; its "incremental"
behavior is skip-existing downloads and .done markers, which map to
idempotent batch re-runs).

What a streaming GDELT/event pipeline needs, expressed with the primitives
Spark gives us: file-source ingest (new parquet/csv files appear → rows
stream in, exactly the reference's 15-minute-drop cadence), event-time
tumbling windows with watermarked late-data handling, and a custom stateful
operator via ``applyInPandasWithState``-style session tracking (kept here as
a windowed dedup — deterministic and testable without a long-lived runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream: every new file dropped into ``path`` becomes a
    micro-batch (the streaming twin of the reference's scrape→convert drop
    folder). ``maxFilesPerTrigger`` bounds per-batch work."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling counts with a watermark: late rows within
    ``watermark`` still update their window; older ones are dropped and the
    window state is reclaimed — the piece batch jobs can't express."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "cnt",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; per-key state
    is dropped once the watermark passes it (bounded state — the property
    that makes dedup feasible on an unbounded stream).

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates(subset)``
    only evicts state when the event-time column is PART OF the subset, so
    deduping on business keys alone would accumulate state forever — the
    classic slow-death of a streaming dedup job. Duplicates arriving within
    the watermark interval of the first occurrence are guaranteed dropped;
    older ones are already outside the correctness contract of any
    watermarked pipeline."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins the static
    dimension snapshot (broadcast — dimension tables are small by
    definition). Stateless: no watermark, no state store; the static side
    is re-planned per batch, so slowly-changing dims are picked up on the
    next trigger. The standard streaming-enrichment pattern."""
    return events.join(F.broadcast(dim), on=on, how=how)


def dedup_stream_against(
    events: DataFrame,
    reference: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Streaming cross-corpus dedup: drop stream rows whose key(s) already
    exist in a STATIC reference snapshot (the incremental-crawl pattern —
    the streaming twin of ``operators.dedup.dedup_against``). A
    stream-static broadcast LEFT ANTI join: stateless (no watermark, no
    state store — the reference is the state, re-planned per batch so a
    refreshed snapshot is picked up on the next trigger), so the only
    scaling term is the reference build itself — reduce it to DISTINCT
    hashes before passing it here, exactly as the batch operator does.
    Compose with ``streaming_dedup`` downstream for within-stream
    duplicates (the reference can't know about rows it hasn't seen)."""
    keys = [on] if isinstance(on, str) else list(on)
    ref = reference.select(*keys).dropDuplicates(keys)
    return events.join(F.broadcast(ref), on=keys, how="left_anti")


def convert_stream(
    spark: SparkSession,
    csv_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """Streaming twin of the batch ``convert`` stage: every new GDELT CSV
    dropped into ``csv_dir`` (the reference's 15-minute scrape cadence)
    becomes a micro-batch — declared 58-column schema, the same numeric
    coercion as the batch path, parquet file sink. The checkpoint gives
    exactly-once file processing across restarts: re-running after a crash
    (or a later ``availableNow`` pass) picks up only unseen files — the
    streaming-native form of the batch path's manifest idempotency (S10).

    Returns the started ``StreamingQuery`` (``availableNow`` trigger:
    drains everything present, then stops — callers ``awaitTermination``).
    """
    from ..schema import gdelt_csv_schema
    from ..sources.gdelt_csv import coerce_gdelt_columns

    raw = (
        spark.readStream.schema(gdelt_csv_schema())
        .option("sep", "\t")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(csv_dir)
    )
    # coerce_gdelt_columns tags rows with `_source_file` for the batch path's
    # per-file convert report; the batch writer drops it before every write,
    # so the streaming twin must too — otherwise mixing the two outputs in
    # one lake directory yields a 59- vs 58-column schema conflict.
    typed = coerce_gdelt_columns(raw).drop("_source_file")
    return (
        typed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: float = 60.0
) -> None:
    """Test/demo harness: drain the stream into an in-memory sink until idle
    (availableNow processes everything present, then stops)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not _has_aggregate(stream_df) else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def _has_aggregate(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def convert_stream_with_dlq(
    spark: SparkSession,
    csv_dir: str,
    out_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """:func:`convert_stream` with a dead-letter queue: rows whose raw line
    failed schema parsing (ragged/malformed TSV — Spark PERMISSIVE mode
    captures the original line in ``_corrupt_record``) are QUARANTINED to
    ``dlq_dir`` (original line + source file + batch id) instead of
    silently turning into all-NULL lake rows. The production ingest
    contract: the lake only receives rows that parsed, nothing is dropped
    on the floor, and the DLQ is replayable once the parser is fixed.

    Implementation is one ``foreachBatch``: the micro-batch is split by
    ``_corrupt_record IS NULL`` and written to the two sinks inside the
    same exactly-once epoch (both writes replay together on recovery —
    idempotent because parquet-append of a deterministic split is). The
    split predicate evaluates once per row, map-side; no extra scan of the
    source.
    """
    from ..schema import gdelt_csv_schema
    from ..sources.gdelt_csv import coerce_gdelt_columns

    schema = gdelt_csv_schema().add("_corrupt_record", "string")
    raw = (
        spark.readStream.schema(schema)
        .option("sep", "\t")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(csv_dir)
    )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df = batch_df.withColumn("_src", F.input_file_name()).cache()
        try:
            bad = batch_df.filter(F.col("_corrupt_record").isNotNull())
            bad.select(
                F.col("_corrupt_record").alias("raw_line"),
                F.col("_src").alias("source_file"),
                F.lit(batch_id).alias("batch_id"),
            ).write.mode("append").parquet(dlq_dir)
            good = batch_df.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record", "_src"
            )
            coerce_gdelt_columns(good).drop("_source_file").write.mode(
                "append"
            ).parquet(out_dir)
        finally:
            batch_df.unpersist()

    return (
        raw.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
