"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to the cluster's parallelism when — and
    only when — the plan's current partitioning is narrower (optimization
    guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    Why: a compacted parquet table is often ONE row group, so its scan is
    ONE task no matter what ``maxPartitionBytes`` says (row groups don't
    split), and every map-side-heavy operator downstream (per-shingle
    hashing, percentile buffers, embedding folds) runs on one core until
    the first exchange. Measured on the sf0.1 fixture: the 64-hash md5
    MinHash signature drops 1.86 s → 0.82 s, exact grouped percentiles
    3.3 s → 2.3 s, from this alone.

    Scale-adaptive by construction: ``target`` defaults to
    ``sc.defaultParallelism`` (total executor cores on a real cluster),
    and the partition probe makes it a NO-OP whenever the scan already
    has at least that many partitions — a 100 TB input keeps its layout;
    only narrow inputs (small batches, unsplittable files) pay the one
    extra exchange, which is exactly when it buys a full-width stage.
    Row-to-partition assignment stays deterministic under task retry
    (``spark.sql.execution.sortBeforeRepartition`` default-on).

    Apply at SCAN level (scan + filter + project inputs) only: the
    partition probe compiles the physical plan, which is sub-ms there
    but can cost seconds on a join subtree. Streaming frames pass
    through untouched (no partition probe exists for them).
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if n <= 1 or df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def single_partition_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A local-rows DataFrame materialized as ONE partition.

    ``spark.createDataFrame(rows, schema)`` spreads even one row over
    ``defaultParallelism`` mostly-empty Python partitions; a later
    ``coalesce(1)`` (the natural move before writing a tiny metadata
    file) then iterates ALL of them inside a single task — each empty
    partition still pays a Python-runner round trip, ~4.5 s for a 1-row
    write at local[32] (measured; the ledger-commit hot path). Seeding
    from ``parallelize(rows, numSlices=1)`` gives the same frame as one
    partition: one task, one Python pass, ~0.2 s.

    For tiny metadata frames only — a single partition is the point.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
