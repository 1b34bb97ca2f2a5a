"""Pin bench.py's ExecMetrics AppStatusStore seam (r12): the py4j
stageList signature is Spark-version-specific, so a pyspark upgrade must
break HERE, not silently zero the bench's adjudication metrics."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import ExecMetrics  # noqa: E402


def test_exec_metrics_sees_shuffles_and_tasks(spark):
    em = ExecMetrics(spark)
    base = em.snap()
    assert set(base) == {"shuffle_read_mb", "shuffle_write_mb", "spill_mb", "tasks"}

    df = spark.range(0, 200_000, 1, 8)
    df.groupBy((df.id % 1000).alias("k")).count().write.format("noop").mode(
        "overwrite"
    ).save()
    shuffled = em.snap()
    assert shuffled["tasks"] > 0
    assert shuffled["shuffle_write_mb"] > 0 and shuffled["shuffle_read_mb"] > 0

    df.select("id").write.format("noop").mode("overwrite").save()
    maponly = em.snap()
    assert maponly["tasks"] > 0
    # the stage-id diff isolates THIS query: a map-only plan shuffles nothing
    assert maponly["shuffle_write_mb"] == 0 and maponly["shuffle_read_mb"] == 0


def test_exec_metrics_deltas_do_not_double_count(spark):
    em = ExecMetrics(spark)
    em.snap()
    df = spark.range(0, 100_000, 1, 8)
    df.groupBy((df.id % 97).alias("k")).count().write.format("noop").mode(
        "overwrite"
    ).save()
    first = em.snap()
    second = em.snap()  # no work in between -> all-zero delta
    assert first["tasks"] > 0
    assert second == {"shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
                      "spill_mb": 0.0, "tasks": 0}
