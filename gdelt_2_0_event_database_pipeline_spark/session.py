"""SparkSession factory with scale-aware defaults.

Defaults target correctness at local[N] while remaining the right knobs for a
multi-executor cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized to the parallelism actually available,
UTC session timezone (driver oracle compares timestamp values), and Arrow
enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gdelt_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else ``local[*]``)
    so tests and bench share one code path. On a real cluster the caller passes
    ``master=None`` with spark-submit owning the master URL; every other conf
    here is still the one you'd want at 100 TB (AQE, pushdown, Arrow).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Per-process warehouse: two concurrent sessions sharing a cwd
        # otherwise collide on saveAsTable targets (e.g. the bucketed-join
        # table) — a shared ./spark-warehouse is a race, not a feature.
        # Persisted index artifacts are unaffected: they use explicit
        # absolute paths, not the warehouse. Override via extra_conf.
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(
                tempfile.gettempdir(),
                f"spark-warehouse-{os.getpid()}-{uuid.uuid4().hex[:8]}",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
