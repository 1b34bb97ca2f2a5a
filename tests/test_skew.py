"""Skew utility tests: salted aggregation equals plain aggregation; salted
join equals plain join; bucketed join elides the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.skew import (
    explain_shuffles,
    salted_group_agg,
    salted_join_skewed_left,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key — the shape AQE-less aggregation chokes on
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return df.cache()


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r.key): (r.s, r.c, r.mn, r.mx, r.av)
        for r in skewed.groupBy("key").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("av"),
        ).collect()
    }
    salted = {
        (r.key): (r.s, r.c, r.mn, r.mx, r.av)
        for r in salted_group_agg(
            skewed, ["key"],
            {"s": ("v", "sum"), "c": ("v", "count"),
             "mn": ("v", "min"), "mx": ("v", "max"), "av": ("v", "avg")},
            num_salts=8,
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k] == pytest.approx(salted[k])


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", 1.0)] + [(f"k{i}", float(i)) for i in range(100)], ["key", "w"]
    )
    plain = skewed.join(dim, "key").agg(F.sum(F.col("v") * F.col("w"))).first()[0]
    salted = (
        salted_join_skewed_left(skewed, dim, on="key", num_salts=8)
        .agg(F.sum(F.col("v") * F.col("w")))
        .first()[0]
    )
    assert plain == pytest.approx(salted)


def test_bucketed_join_elides_shuffle(spark, skewed):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf that can't move per-test. Broadcast is disabled so the
    # planner actually faces the shuffle-vs-bucket decision these tiny
    # tables would otherwise sidestep.
    import shutil

    for t in ("t_left", "t_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)  # orphan dirs from prior sessions
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        write_bucketed(left, "t_left", ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed(right, "t_right", ["k"], num_buckets=8, sort_cols=["k"])
        joined = spark.table("t_left").join(spark.table("t_right"), "k")
        # co-bucketed sort-merge join: no shuffle Exchange on either side
        assert explain_shuffles(joined) == 0
        # the un-bucketed twin must shuffle both sides
        assert explain_shuffles(left.join(right, "k")) >= 2
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
