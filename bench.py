"""Benchmark harness: runs the registry's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is fully materialized through the noop sink (count() would let
Catalyst prune the projection and under-measure wide queries).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402


class ExecMetrics:
    """Per-query executed-plan metrics (shuffle read/write bytes, spill
    bytes, completed tasks) polled from the JVM AppStatusStore — the same
    store the Spark UI / REST API serves, so no py4j callback server is
    needed. ``snap()`` after each query sums the metrics of stages newer
    than the previous high-water stage id (diff-by-stage-id rather than
    cumulative totals, so UI store eviction of OLD stages can't skew a
    later query's delta).

    Purpose (r11 verdict item 1): wall time alone can't distinguish a plan
    regression from container noise — r10 (q_join_outer_agg 6.8x) and r11
    (q_join_semi 3.73x) both burned manual fresh-session probes. Bytes and
    task counts are deterministic for a fixed plan+data, so the >2x check
    consults them first (tools/bench_compare.py)."""

    def __init__(self, spark):
        self._sc = spark.sparkContext
        self._store = self._sc._jsc.sc().statusStore()
        self._last_stage = -1
        jvm = self._sc._jvm
        gw = self._sc._gateway
        # Spark 4 signature: stageList(JList[StageStatus] statuses,
        # boolean details, boolean withSummaries, double[] quantiles,
        # JList[TaskStatus]) — empty statuses = all stages
        self._args = (
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )

    def _wait_bus(self) -> None:
        # stage-completion events reach the store asynchronously; drain the
        # listener bus so the snapshot sees the query's final stages
        try:
            self._sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:
            try:
                self._sc._jsc.sc().listenerBus().waitUntilEmpty()
            except Exception:
                time.sleep(0.2)

    def snap(self) -> dict[str, int]:
        self._wait_bus()
        tot = {"shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
               "spill_mb": 0.0, "tasks": 0}
        hi = self._last_stage
        try:
            seq = self._store.stageList(*self._args)
            for i in range(seq.size()):
                s = seq.apply(i)
                sid = s.stageId()
                if sid <= self._last_stage:
                    continue
                hi = max(hi, sid)
                tot["shuffle_read_mb"] += s.shuffleReadBytes()
                tot["shuffle_write_mb"] += s.shuffleWriteBytes()
                tot["spill_mb"] += s.memoryBytesSpilled() + s.diskBytesSpilled()
                tot["tasks"] += s.numCompleteTasks()
        except Exception as e:  # pragma: no cover — metrics are best-effort
            print(f"exec-metrics snapshot failed: {e}", file=sys.stderr)
            # Still advance past the stages enumerated before the failure so
            # the NEXT query's delta doesn't absorb this snapshot's stages
            # (misattributed metrics would feed bench_compare adjudication).
            self._last_stage = hi
            return {}
        self._last_stage = hi
        for k in ("shuffle_read_mb", "shuffle_write_mb", "spill_mb"):
            tot[k] = round(tot[k] / 1e6, 3)
        return tot


def _synth_gdelt_drop(
    work: str, n: int, names: list[str] | None = None
) -> tuple[str, str]:
    """Synthetic GDELT drop at reference-workload volume: ``n`` rows split
    across 4 daily + 2 monthly + 2 yearly CSVs (override with ``names`` —
    the scale probe uses a 2-file split to pin the file-parallelism
    dimension), zipped like the real exports, plus a directory-listing
    HTML with ~3k out-of-range decoy links (the masterfile listing the
    scrape stage actually chews). Returns (zips_dir, listing_html).
    Generation is UNTIMED — the bench measures the pipeline, not numpy."""
    import zipfile

    import numpy as np
    import pandas as pd

    from gdelt_2_0_event_database_pipeline_spark.schema import GDELT_COLUMNS

    rng = np.random.default_rng(11)
    years = rng.choice([2015, 2016, 2017], n, p=[0.25, 0.35, 0.4])
    months = rng.integers(1, 13, n)
    days = rng.integers(1, 29, n)
    countries = rng.choice(
        ["USA", "BRA", "CHN", "RUS", "FRA", "IND"], n
    ).astype(object)
    countries[rng.random(n) < 0.05] = None
    actor1 = np.char.add("ACT", (np.arange(n) % 50).astype(str)).astype(object)
    actor1[rng.random(n) < 0.1] = None
    quad = rng.choice([1.0, 2.0, 3.0, 4.0], n)
    quad[rng.random(n) < 0.02] = np.nan
    pdf = pd.DataFrame(
        {
            "GlobalEventID": np.arange(1, n + 1, dtype=np.int64),
            "Day": (years * 10000 + months * 100 + days).astype(np.int64),
            "MonthYear": (years * 100 + months).astype(np.int64),
            "Year": years.astype(np.int64),
            "FractionDate": years + (months - 1) / 12.0,
            "Actor1Code": actor1,
            "Actor1CountryCode": countries,
            "IsRootEvent": rng.integers(0, 2, n).astype(np.int64),
            "EventCode": rng.choice(["010", "020", "042", "043", "190"], n),
            "QuadClass": quad,
            "GoldsteinScale": rng.uniform(-10, 10, n).round(1),
            "NumMentions": rng.integers(1, 100, n).astype(np.int64),
            "NumArticles": rng.integers(1, 50, n).astype(np.int64),
            "AvgTone": rng.uniform(-100, 100, n).round(2),
            "ActionGeo_CountryCode": countries.copy(),
            "ActionGeo_Lat": rng.uniform(-60, 60, n).round(4),
        }
    ).reindex(columns=list(GDELT_COLUMNS))

    zips = os.path.join(work, "zips")
    os.makedirs(zips)
    if names is None:
        names = [
            "20150101.export.CSV", "20150102.export.CSV",
            "20160301.export.CSV", "20170501.export.CSV",
            "201502.csv", "201603.csv",
            "2015.csv", "2016.csv",
        ]
    nf = len(names)
    per = n // nf
    for i, name in enumerate(names):
        lo, hi = i * per, (i + 1) * per if i < nf - 1 else n
        csv_path = os.path.join(work, name)
        pdf.iloc[lo:hi].to_csv(csv_path, sep="\t", header=False, index=False)
        with zipfile.ZipFile(
            os.path.join(zips, name + ".zip"), "w", zipfile.ZIP_DEFLATED
        ) as zf:
            zf.write(csv_path, arcname=name)
        os.remove(csv_path)

    links = [f'<a href="{name}.zip">{name}.zip</a>' for name in names]
    # decoys OUTSIDE the prune window — scale the listing to masterfile size
    links += [
        f'<a href="{2018 + (i % 7)}{1 + i % 12:02d}{1 + i % 28:02d}.export.CSV.zip">x</a>'
        for i in range(3000)
    ]
    html = "<html><body>" + "\n".join(links) + "</body></html>"
    return zips, html


def run_etl_stages(spark) -> dict[str, float]:
    """The reference's own four-stage workload (scrape-manifest → download
    + unzip → convert flat/Hive → null-filter → exact-n sample) as ONE
    timed run per stage, so stage-level regressions get the same >2x
    per-round discipline as the query registry (r10 verdict item 4).
    Volume: 200k rows / 8 zipped CSVs — a realistic daily-drop batch (the
    real daily export is ~100-200k rows)."""
    import datetime as dt
    import shutil
    import tempfile

    from gdelt_2_0_event_database_pipeline_spark.operators.sampling import (
        sample_uniform,
    )
    from gdelt_2_0_event_database_pipeline_spark.sources import (
        gdelt_csv,
        lake,
        manifest,
    )

    work = tempfile.mkdtemp(prefix="bench_etl_")
    out: dict[str, float] = {}
    try:
        zips_dir, html = _synth_gdelt_drop(work, 200_000)

        t0 = time.time()
        links = manifest.extract_zip_links(html, "http://data.example.com/events")
        pruned = manifest.prune_manifest(
            manifest.manifest_df(spark, links),
            dt.date(2015, 1, 1),
            dt.date(2017, 12, 31),
        )
        urls = [r.url for r in pruned.collect()]
        out["etl_scrape_manifest"] = round(time.time() - t0, 3)

        t0 = time.time()

        def _fetch(url: str, timeout: float) -> bytes:
            with open(os.path.join(zips_dir, url.rsplit("/", 1)[-1]), "rb") as f:
                return f.read()

        dl = os.path.join(work, "dl")
        manifest.download_files(urls, dl, fetcher=_fetch)
        csv_dir = os.path.join(work, "csv")
        gdelt_csv.extract_zips(dl, csv_dir)
        out["etl_download_extract"] = round(time.time() - t0, 3)

        flat, hist = os.path.join(work, "flat"), os.path.join(work, "hist")
        t0 = time.time()
        gdelt_csv.convert(spark, csv_dir, flat, historical_dir=hist)
        out["etl_convert"] = round(time.time() - t0, 3)

        filtered = os.path.join(work, "filtered")
        t0 = time.time()
        lake.run_filter_stage(
            spark, flat, filtered,
            ["Actor1Code", "ActionGeo_CountryCode", "QuadClass"],
            historical_dir=hist,
        )
        out["etl_filter"] = round(time.time() - t0, 3)

        t0 = time.time()
        sample_uniform(spark.read.parquet(filtered), 1000).write.format(
            "noop"
        ).mode("overwrite").save()
        out["etl_sample"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # local testdata is one ~10MB parquet per table — the default 128MB
    # split puts the whole scan on one core. 8MB splits engage the local
    # executor threads; at cluster scale inputs are many files and the
    # default holds (this is a bench-harness knob, not an engine default).
    spark = get_spark(
        "bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/file-index/shuffle paths so per-query numbers
    # measure the queries, not first-touch initialization (the registry's
    # first query would otherwise absorb it all)
    from pyspark.sql import functions as SF

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.join(docs.select(SF.col("doc_id").alias("d2")), SF.col("doc_id") == SF.col("d2"))
        .groupBy("lang").count().write.format("noop").mode("overwrite").save()
    )
    # the tokenize/slice HOF chain codegens a large method on first touch;
    # without this, the alphabetically-first query using it
    # (q_chunk_documents) absorbs the compile and reads 3-4× its true cost
    # (r4 verdict adjudication). Warm it on a 200-row slice.
    from gdelt_2_0_event_database_pipeline_spark.operators.training import (
        chunk_documents,
    )

    chunk_documents(docs.limit(200)).write.format("noop").mode("overwrite").save()
    # same story for the cosine-fold + argmax-struct chain (q_semantic_dedup
    # would otherwise absorb ~6 s of first-touch codegen): warm on 50 rows
    from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    semantic_dedup(emb.limit(50), k=2, threshold=0.25).write.format("noop").mode(
        "overwrite"
    ).save()

    # warm the Arrow python-worker pool + ArrowEvalPython codegen: the
    # alphabetical walk otherwise charges the FIRST Arrow query
    # (q_audio_near_dup) ~8 s of session-wide spin-up
    from pyspark.sql import functions as F
    from gdelt_2_0_event_database_pipeline_spark.operators.text import (
        compression_ratio,
    )

    docs.limit(50).select(compression_ratio("text")).write.format("noop").mode(
        "overwrite"
    ).save()

    # warm the LSH signature + multi-probe explode chain and the dHash
    # banded-Hamming chain: with 223 registered queries the JIT/codegen
    # cache no longer retains everything across the walk, and the r9 bench
    # charged q_cosine_topk_lsh 7.3 s / q_media_near_dup 3.0 s of
    # first-touch compile their fresh-session steady state (2.1 s / 1.0 s)
    # doesn't have (standalone probe, BASELINE.md discipline)
    from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (
        cosine_topk_lsh,
    )

    cosine_topk_lsh(
        emb.limit(50), emb.limit(3), k=2
    ).write.format("noop").mode("overwrite").save()
    from gdelt_2_0_event_database_pipeline_spark.operators.multimodal import (
        encode_png,
        media_near_dup_pairs,
    )

    px = bytes(range(48)) * 16
    tiny = spark.createDataFrame(
        [(i, bytearray(encode_png(16, 16, px[: 16 * 16 * 3]))) for i in range(4)],
        "media_id long, payload binary",
    )
    media_near_dup_pairs(tiny, max_hamming=6).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    exec_metrics: dict[str, dict] = {}
    em = ExecMetrics(spark)
    em.snap()  # baseline past the warm-up stages

    # ---- build phase (r13 verdict item 1): the ANN/at-rest index family
    # constructs its artifacts (fit + encode + persist) lazily on first
    # invocation. Charging that to the serving row made the >2x gate track
    # artifact construction growth instead of serving cost (q_opq_maintained
    # 27.6s cold vs 5.2s steady was 8.6% of the r13 bench by itself). Run
    # each builder ONCE here, recorded as a first-class `build_<query>` row
    # (fit + encode + write + one serve pass — compare against SCALE_PROBE
    # refit_ivf_pq), so the alphabetical walk below measures every q_* row
    # at its steady serving cost.
    builds: dict[str, float] = {}
    build_metrics: dict[str, dict] = {}
    for name in ("q_ivf_topk", "q_pq_topk", "q_pq_append", "q_minhash_index",
                 "q_dedup_minhash_index", "q_ivf_pq_drift", "q_ivf_pq_residual",
                 "q_ivf_pq_topk", "q_opq_topk", "q_opq_maintained",
                 "q_bpe_train", "q_media_near_dup", "q_audio_near_dup",
                 "q_video_near_dup"):
        if name not in QUERIES:
            continue
        t0 = time.time()
        try:
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            builds[f"build_{name}"] = round(time.time() - t0, 3)
            build_metrics[f"build_{name}"] = em.snap()
        except Exception as e:  # pragma: no cover
            errors[f"build_{name}"] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench error in build_{name}: {e}", file=sys.stderr)
            em.snap()

    # registry order is the DRIVER's correctness-priority order; bench walks
    # names alphabetically so per-query timings stay comparable across rounds
    # even when the driver priority shuffles
    # errored queries go to a separate map (NOT a -1.0 sentinel in `queries`:
    # a consumer summing/averaging the timings map must not pick up negatives)
    em.snap()
    for name in sorted(QUERIES):
        t0 = time.time()
        try:
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            exec_metrics[name] = em.snap()
        except Exception as e:  # pragma: no cover
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench error in {name}: {e}", file=sys.stderr)
            em.snap()  # advance the stage high-water past the failure

    # second-run (steady-state) timings for queries with session-scoped
    # caches that the build phase does NOT cover (bucketed tables, codegen
    # warm-up): the repeated-invocation cost is the number that matters for
    # a long-lived session / real deployment. The ANN index family needs no
    # row here — its artifacts were built in the build phase, so its
    # `queries` rows above are already steady.
    steady: dict[str, float] = {}
    steady_metrics: dict[str, dict] = {}
    em.snap()
    for name in ("q_bucketed_join", "q_semantic_dedup",
                 "q_dedup_minhash", "q_khop_reach"):
        if name in QUERIES:
            t0 = time.time()
            try:
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                steady[name] = round(time.time() - t0, 3)
                steady_metrics[name] = em.snap()
            except Exception:  # pragma: no cover
                steady[name] = -1.0
                em.snap()

    # the reference's own four-stage ETL workload, timed per stage
    # (etl_* rows live beside the query rows in BASELINE.md, same 2x rule)
    try:
        etl = run_etl_stages(spark)
    except Exception as e:  # pragma: no cover
        etl = {}
        print(f"bench error in etl stages: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "errors": errors,
            "n_timed": len(timings),
            "exec_metrics": exec_metrics,
            "steady_exec_metrics": steady_metrics,
            "steady": steady,
            "builds": builds,
            "build_exec_metrics": build_metrics,
            "build_total": round(sum(t for t in builds.values() if t >= 0), 3),
            "etl_stages": etl,
            "sf": sf,
        }
    )
    # The driver captures a bounded tail of stdout; with 84+ per-query
    # timings the JSON line can fall outside that window if anything prints
    # after it. Emit the JSON FIRST, and also persist it to bench_out.json so
    # the artifact is machine-readable regardless of capture limits.
    print(payload, flush=True)
    with open(os.path.join(REPO, "bench_out.json"), "w") as f:
        f.write(payload + "\n")
    spark.stop()
    # ... and again as the very last stdout line: if a driver parses the tail
    # of stdout and anything logged after the first print, the final line is
    # still the JSON (r3's driver-side parse recorded null despite a valid
    # first-line payload)
    print(payload, flush=True)


if __name__ == "__main__":
    main()
