"""Structured Streaming tests: file-source ingest, watermarked windowed
aggregation, streaming dedup — driven by dropping parquet files into a
watched directory and draining with availableNow."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
    read_event_stream,
    run_stream_to_memory,
    streaming_dedup,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _drop_file(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = str(tmp_path / "in")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    _drop_file(spark, d, [
        (1, base, "view", 1.0),
        (2, base + dt.timedelta(minutes=20), "view", 2.0),
        (3, base + dt.timedelta(minutes=70), "click", 3.0),
        (1, base, "view", 1.0),                      # duplicate event_id
    ])
    return d


def test_windowed_counts(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(agg, "win_counts")
    got = {
        (r.window_start.hour, r.event_type): (r.cnt, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[(10, "view")] == (3, 4.0)   # dup still present pre-dedup
    assert got[(11, "click")] == (1, 3.0)


def test_streaming_dedup(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    dd = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    run_stream_to_memory(dd, "dedup_out")
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]


def test_incremental_second_batch(spark, stream_dir):
    # second drop → second micro-batch; memory sink accumulates both
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    dd = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    run_stream_to_memory(dd, "inc_out")
    _drop_file(spark, stream_dir, [
        (9, dt.datetime(2024, 1, 1, 10, 30), "signup", 5.0),
    ])
    run_stream_to_memory(dd, "inc_out2")
    n2 = spark.sql("SELECT count(*) FROM inc_out2").first()[0]
    assert n2 == 4


def test_stream_static_enrichment(spark, stream_dir):
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import enrich_stream

    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "engage")], ["event_type", "category"]
    )
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    enriched = enrich_stream(stream, dim, on="event_type")
    run_stream_to_memory(enriched, "enriched_out")
    rows = spark.sql("SELECT event_id, category FROM enriched_out").collect()
    cats = {r.event_id: r.category for r in rows}
    assert cats[2] == "browse" and cats[3] == "engage"
    assert len(rows) == 4  # left join preserves every stream row


def test_convert_stream_exactly_once(spark, tmp_path):
    """Streaming convert: declared-schema CSV micro-batches -> typed parquet;
    the checkpoint makes a second availableNow pass process ONLY new files
    (streaming-native manifest idempotency)."""
    from gdelt_2_0_event_database_pipeline_spark.schema import GDELT_COLUMNS
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import convert_stream

    from tests.conftest import make_gdelt_pdf

    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    pdf = make_gdelt_pdf(100).reindex(columns=list(GDELT_COLUMNS))
    pdf.iloc[0:60].to_csv(
        csv_dir / "20150101.export.CSV", sep="\t", header=False, index=False
    )

    q = convert_stream(spark, str(csv_dir), out, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 60
    assert dict(df.dtypes)["GlobalEventID"] == "bigint"
    assert dict(df.dtypes)["GoldsteinScale"] == "double"
    # schema parity with the batch flat lake: exactly the 58 GDELT columns,
    # no `_source_file` leakage from the coercion stage
    assert list(df.columns) == list(GDELT_COLUMNS)

    # drop a second file; restart from the same checkpoint -> only the new
    # file is ingested (no duplicates from the first)
    pdf.iloc[60:100].to_csv(
        csv_dir / "20150102.export.CSV", sep="\t", header=False, index=False
    )
    q2 = convert_stream(spark, str(csv_dir), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100


def test_convert_stream_dlq_quarantines_malformed(spark, tmp_path):
    """DLQ convert: parseable rows land typed in the lake; structurally
    malformed lines (column overflow) land in the quarantine sink with
    their raw text — nothing dropped, nothing NULL-polluted."""
    from gdelt_2_0_event_database_pipeline_spark.schema import GDELT_COLUMNS
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
        convert_stream_with_dlq,
    )

    from tests.conftest import make_gdelt_pdf

    csv_dir = tmp_path / "csv"
    csv_dir.mkdir()
    out, dlq, ckpt = (
        str(tmp_path / "out"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    pdf = make_gdelt_pdf(20).reindex(columns=list(GDELT_COLUMNS))
    f = csv_dir / "20150101.export.CSV"
    pdf.to_csv(f, sep="\t", header=False, index=False)
    # append two structurally-broken lines (way too many columns)
    with open(f, "a") as fh:
        fh.write("\t".join(str(i) for i in range(80)) + "\n")
        fh.write("\t".join(["x"] * 75) + "\n")

    q = convert_stream_with_dlq(spark, str(csv_dir), out, dlq, ckpt)
    q.awaitTermination(120)

    good = spark.read.parquet(out)
    assert good.count() == 20
    assert list(good.columns) == list(GDELT_COLUMNS)
    assert dict(good.dtypes)["GlobalEventID"] == "bigint"

    bad = spark.read.parquet(dlq)
    assert bad.count() == 2
    raws = {r.raw_line for r in bad.collect()}
    assert any(line.startswith("0\t1\t2") for line in raws)
    assert all("export.CSV" in r.source_file for r in bad.collect())


def test_stream_static_scd2_pit_enrichment(spark, tmp_path):
    """Streaming facts PIT-joined to a STATIC SCD2 dimension: the interval
    predicate rides the stream-static join (re-planned per micro-batch, so
    dimension refreshes are picked up on the next trigger) — the streaming
    twin of q_scd2_pit."""
    import datetime as dt

    from pyspark.sql import types as T

    from gdelt_2_0_event_database_pipeline_spark.operators.cdc import (
        scd2_build,
        scd2_pit_join,
    )
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
    )

    base = dt.datetime(2024, 3, 1, 12, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    # static dimension: user 1 is 'bronze' from t0, 'gold' from t30
    changes = spark.createDataFrame(
        [(1, ts(0), "bronze"), (1, ts(30), "gold")],
        "user_id long, ts timestamp, tier string",
    )
    dim = scd2_build(changes, ["user_id"], "ts", ["tier"]).select(
        "user_id", "tier", "valid_from", "valid_to"
    )

    facts_schema = T.StructType(
        [
            T.StructField("fact_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("fts", T.TimestampType()),
        ]
    )
    fdir = str(tmp_path / "facts")
    spark.createDataFrame(
        [(100, 1, ts(10)), (101, 1, ts(45)), (102, 2, ts(5))], facts_schema
    ).write.parquet(fdir)

    stream = read_event_stream(spark, fdir, facts_schema)
    enriched = scd2_pit_join(stream, dim, ["user_id"], "fts")
    run_stream_to_memory(enriched, "scd2_pit_stream")
    got = {
        r.fact_id: r.tier
        for r in spark.sql("SELECT * FROM scd2_pit_stream").collect()
    }
    assert got == {100: "bronze", 101: "gold", 102: None}


def test_dedup_stream_against_reference(spark, stream_dir):
    """Stream-static anti-join dedup: rows whose event_id is already in
    the reference snapshot never enter the stream output; composed with
    streaming_dedup it yields the full incremental-crawl pattern
    (reference-known AND within-stream duplicates both dropped)."""
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
        dedup_stream_against,
    )

    ref = spark.createDataFrame([(2,), (3,), (3,)], "event_id long")
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    fresh = dedup_stream_against(stream, ref, on="event_id")
    dd = streaming_dedup(fresh, ["event_id"], watermark="1 hour")
    run_stream_to_memory(dd, "against_out")
    rows = spark.sql("SELECT event_id FROM against_out").collect()
    # 2 and 3 are reference-known; the duplicated 1 collapses to one row
    assert sorted(r.event_id for r in rows) == [1]
