"""Streaming throughput micro-bench (round-7 verdict item 7) — the figure
later rounds regress against.

Two paths, both drained with ``availableNow`` (bounded run, same code path
as continuous triggers):

- **convert_stream**: GDELT-format 58-column TSV files → declared-schema
  read + numeric coercion → parquet sink with checkpointed exactly-once
  file tracking. Measures the ingest stage's row throughput.
- **stateful sessionization**: sf0.1 ``events`` (100k rows) split into
  file-drop micro-batches → ``streaming_sessionize_event_time``
  (applyInPandasWithState, watermarked) → memory sink. Measures rows/s
  THROUGH the stateful operator (state updates + emissions), the custom-
  stateful hot path.

Run:  python tools/bench_streaming.py            # writes BENCH_streaming.json
      python tools/bench_streaming.py --rows 20000 --files 5   # quick local

Single-JVM local[32] numbers; absolute values carry the usual ±20%
container variance — regress on large deltas, not single digits.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402


def bench_convert(spark, workdir: str, n_rows: int, n_files: int) -> dict:
    from gdelt_2_0_event_database_pipeline_spark.schema import GDELT_COLUMNS
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
        convert_stream,
    )
    from tests.conftest import make_gdelt_pdf

    csv_dir = os.path.join(workdir, "csv")
    os.makedirs(csv_dir)
    out, ckpt = os.path.join(workdir, "out"), os.path.join(workdir, "ckpt")
    per_file = n_rows // n_files
    pdf = make_gdelt_pdf(per_file).reindex(columns=list(GDELT_COLUMNS))
    for i in range(n_files):
        # vary the date column per file so files are distinct inputs
        p = pdf.copy()
        p["Day"] = 20150101 + i
        p.to_csv(
            os.path.join(csv_dir, f"201501{i:02d}.export.CSV"),
            sep="\t", header=False, index=False,
        )
    total = per_file * n_files
    t0 = time.time()
    q = convert_stream(spark, csv_dir, out, ckpt, max_files_per_trigger=4)
    q.awaitTermination(600)
    dt = time.time() - t0
    got = spark.read.parquet(out).count()
    assert got == total, (got, total)
    return {"rows": total, "files": n_files, "sec": round(dt, 2),
            "rows_per_sec": round(total / dt)}


def bench_sessionize(spark, workdir: str, sf_dir: str, n_files: int) -> dict:
    from gdelt_2_0_event_database_pipeline_spark.streaming.stateful import (
        streaming_sessionize_event_time,
    )

    src = os.path.join(workdir, "events_in")
    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    total = events.count()
    # n_files file-drops = n_files-ish micro-batches through the state store
    events.repartition(n_files).write.parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = streaming_sessionize_event_time(stream, gap_minutes=30)
    t0 = time.time()
    q = (
        sess.writeStream.format("memory").queryName("bench_sessions")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    dt = time.time() - t0
    emitted = spark.sql("select count(*) from bench_sessions").first()[0]
    return {"rows_in": total, "batches": n_files, "sessions_emitted": emitted,
            "sec": round(dt, 2), "rows_per_sec": round(total / dt)}


def bench_maintain_moments(spark, workdir: str, sf_dir: str, n_files: int) -> dict:
    """Vectors/s through the streaming PCA moment maintainer (r11's
    `maintain_moments_stream`): file-drop micro-batches of embeddings →
    one Arrow moments pass + ledger-committed state merge per batch.
    State is d(d+3)/2 rows at any corpus size, so the number here is the
    steady per-batch cost the SCALE_PROBE flat curve predicts."""
    from gdelt_2_0_event_database_pipeline_spark.streaming.moments import (
        maintain_moments_stream,
        read_moments_state,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    total = emb.count()
    src = os.path.join(workdir, "mom_in")
    emb.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = os.path.join(workdir, "mom_state")
    t0 = time.time()
    q = maintain_moments_stream(
        stream, state, os.path.join(workdir, "mom_ckpt")
    )
    q.awaitTermination(600)
    dt = time.time() - t0
    n_state = read_moments_state(spark, state).count()
    assert n_state == 64 * 67 // 2, n_state  # d(d+3)/2 at d=64
    return {"rows_in": total, "batches": n_files, "state_rows": n_state,
            "sec": round(dt, 2), "rows_per_sec": round(total / dt)}


def bench_maintain_ann(spark, workdir: str, sf_dir: str, n_files: int) -> dict:
    """Vectors/s through the streaming ANN index maintainer
    (`maintain_pq_index_stream`): bootstrap an IVF-PQ index on half the
    corpus, then stream the other half in file-drop micro-batches — each
    batch is a map-side encode + cell assign + partition-scoped upsert."""
    from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (
        assign_cells,
        fit_ivf_centroids,
    )
    from gdelt_2_0_event_database_pipeline_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        write_pq_index,
    )
    from gdelt_2_0_event_database_pipeline_spark.streaming.ann import (
        maintain_pq_index_stream,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = emb.filter(F.col("vec_id") % 2 == 0)
    delta = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "ingest_day", F.lit("d1")
    )
    total = delta.count()
    books = fit_pq_codebooks(base, m=16, ncodes=16, iters=2)
    cents = fit_ivf_centroids(base, k=16, iters=2)
    idx = os.path.join(workdir, "ann_idx")
    codes = (
        pq_encode(base, books)
        .join(assign_cells(base, cents).select("vec_id", "cell"), "vec_id")
        .withColumn("ingest_day", F.lit("d0"))
    )
    write_pq_index(codes, books, idx, partition_col="ingest_day", centroids=cents)
    src = os.path.join(workdir, "ann_in")
    delta.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = maintain_pq_index_stream(
        stream, idx, os.path.join(workdir, "ann_ckpt")
    )
    q.awaitTermination(600)
    dt = time.time() - t0

    # drift-check cadence cost (r12 verdict item 2): same stream replayed
    # through a fresh checkpoint with a drift report every 5th batch —
    # the row's delta vs the plain run IS the monitoring overhead.
    stream2 = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t1 = time.time()
    q2 = maintain_pq_index_stream(
        stream2, idx, os.path.join(workdir, "ann_ckpt_drift"),
        drift_check_every_n_batches=5,
        drift_sink=os.path.join(workdir, "ann_drift_sink"),
    )
    q2.awaitTermination(600)
    dt2 = time.time() - t1
    return {"rows_in": total, "batches": n_files,
            "sec": round(dt, 2), "rows_per_sec": round(total / dt),
            "sec_with_drift_check_every_5": round(dt2, 2),
            "drift_checks": n_files // 5}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rows", type=int, default=100_000,
                    help="synthetic GDELT rows for convert_stream")
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_streaming.json"))
    args = ap.parse_args()

    spark = get_spark("bench-streaming")
    workdir = tempfile.mkdtemp(prefix="bench_streaming_")
    try:
        convert = bench_convert(spark, workdir, args.rows, args.files)
        sessionize = bench_sessionize(spark, workdir, args.sf_dir, 10)
        moments = bench_maintain_moments(spark, workdir, args.sf_dir, 10)
        ann = bench_maintain_ann(spark, workdir, args.sf_dir, 10)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    result = {"metric": "streaming_throughput", "unit": "rows/sec",
              "convert_stream": convert, "stateful_sessionize": sessionize,
              "maintain_moments_stream": moments,
              "maintain_pq_index_stream": ann}
    line = json.dumps(result)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
