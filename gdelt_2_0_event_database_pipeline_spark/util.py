"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
