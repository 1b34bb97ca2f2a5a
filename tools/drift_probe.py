"""Planted-drift probe for the maintained IVF-PQ index — the evidence
behind ``pq.index_drift_report``'s default thresholds and refit policy.

Builds an IVF-PQ index on the sf0.1 embeddings, then appends two planted
batches and measures what the drift report sees AND what actually happens
to search recall:

- **in-distribution batch**: rows resampled from the same fixture
  (ids offset) — the healthy-append regime. Expectation: occupancy TVD
  stays small, err_ratio ~ 1, recall unchanged, no refit recommended.
- **shifted batch**: the same rows displaced by a constant offset — a
  hard distribution break. Expectation: TVD and err_ratio blow up,
  refit_recommended flips, and recall@5 OF THE SHIFTED QUERIES through
  the frozen quantizer drops vs a refit quantizer — the decay the report
  exists to catch before users see it.

Recall is measured against exact ``cosine_topk`` over the full corpus
(base + shifted), comparing (a) the maintained frozen-centroid index via
``ivf_pq_search_index`` and (b) a rebuilt index whose coarse quantizer
was refit on a mixed sample — the action the report recommends.

Usage: python tools/drift_probe.py [sf_dir]
Prints one JSON line; writes DRIFT_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gdelt_2_0_event_database_pipeline_spark.operators import pq as Q  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (  # noqa: E402
    assign_cells,
    fit_ivf_centroids,
)
from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
)
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402

N_CELLS = 16
N_QUERIES = 15
K = 5
# Structured drift: displace the first SHIFT_DIMS dims by SHIFT (fixture
# values are ~U(0,1)). A constant shift of ALL dims would make every
# drifted vector near-parallel (all pairwise cosines -> 1), turning exact
# top-5 into tie-noise that no index can match; shifting a quarter of the
# dims moves the distribution hard while neighbor structure in the other
# dims stays measurable.
SHIFT = 2.0
SHIFT_DIMS = 16


def _recall(spark, corpus, queries, got_df) -> float:
    exact = {}
    for r in cosine_topk(corpus, queries, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in got_df.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    num = sum(len(v & approx.get(q, set())) for q, v in exact.items())
    den = sum(len(v) for v in exact.values())
    return round(num / den, 4) if den else 0.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = tempfile.mkdtemp(prefix="drift_probe_")
    spark = get_spark("drift-probe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    books = Q.fit_pq_codebooks(emb, m=16, ncodes=16, iters=3)
    cents = fit_ivf_centroids(emb, k=N_CELLS, iters=4)

    def build(path, centroids, corpus):
        codes = (
            Q.pq_encode(corpus, books)
            .join(assign_cells(corpus, centroids).select("vec_id", "cell"), "vec_id")
            .withColumn("ingest_day", F.lit("d0"))
        )
        Q.write_pq_index(
            codes, books, path, partition_col="ingest_day",
            centroids=centroids, mode="overwrite",
        )

    idx = f"{work}/idx"
    build(idx, cents, emb)

    # planted batches: same rows, ids offset; shifted adds a constant
    indist = emb.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000)).limit(3000)
    shifted = (
        emb.limit(3000)
        .withColumn("vec_id", F.col("vec_id") + F.lit(20_000_000))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i < SHIFT_DIMS, x + F.lit(SHIFT)).otherwise(x),
            ),
        )
    )

    results: dict = {
        "sf_dir": sf_dir, "n_cells": N_CELLS,
        "shift": SHIFT, "shift_dims": SHIFT_DIMS,
    }

    # --- regime A: in-distribution append
    Q.append_pq_index(spark, idx, indist.withColumn("ingest_day", F.lit("d1")))
    ra = Q.index_drift_report(spark, idx, indist).first()
    results["in_distribution"] = {
        "occupancy_tvd": round(ra.occupancy_tvd, 4),
        "err_ratio": round(ra.err_ratio, 4),
        "refit_recommended": ra.refit_recommended,
    }

    # --- regime B: shifted append (fresh index so regimes don't mix)
    idx_b = f"{work}/idx_b"
    build(idx_b, cents, emb)
    Q.append_pq_index(spark, idx_b, shifted.withColumn("ingest_day", F.lit("d1")))
    rb = Q.index_drift_report(spark, idx_b, shifted).first()
    results["shifted"] = {
        "occupancy_tvd": round(rb.occupancy_tvd, 4),
        "err_ratio": round(rb.err_ratio, 4),
        "refit_recommended": rb.refit_recommended,
    }

    # --- regime C (r14): ROTATED (OPQ) index, raw samples. Pre-fix,
    # index_drift_report scored RAW sample vectors against ROTATED-space
    # centroids — err_ratio was structurally inflated and refits fired
    # with zero drift (r13 ADVICE, medium). Post-fix the report rotates
    # the sample into the index frame first: a healthy append must read
    # ~1 / no-refit, and a genuinely shifted one must still trip it.
    from gdelt_2_0_event_database_pipeline_spark.operators.opq import (
        fit_opq,
        rotate_vectors,
    )

    rotation, opq_books = fit_opq(emb, m=16, ncodes=16, iters=2, opq_iters=4)
    rot = (
        rotate_vectors(emb, rotation, out_col="__r__")
        .drop("embedding")
        .withColumnRenamed("__r__", "embedding")
    )
    opq_cents = fit_ivf_centroids(rot, k=N_CELLS, iters=4)
    idx_c = f"{work}/idx_c"
    codes_c = (
        Q.pq_encode(rot, opq_books)
        .join(assign_cells(rot, opq_cents).select("vec_id", "cell"), "vec_id")
        .withColumn("ingest_day", F.lit("d0"))
    )
    Q.write_pq_index(
        codes_c, opq_books, idx_c, partition_col="ingest_day",
        centroids=opq_cents, rotation=rotation, mode="overwrite",
    )
    rc_ok = Q.index_drift_report(spark, idx_c, indist).first()
    rc_bad = Q.index_drift_report(spark, idx_c, shifted).first()
    results["rotated_in_distribution"] = {
        "err_ratio": round(rc_ok.err_ratio, 4),
        "refit_recommended": rc_ok.refit_recommended,
    }
    results["rotated_shifted"] = {
        "err_ratio": round(rc_bad.err_ratio, 4),
        "refit_recommended": rc_bad.refit_recommended,
    }

    # --- what the drift DOES to recall, and what the refit buys back:
    # shifted queries through the frozen maintained index vs through a
    # FULL refit rebuild (coarse quantizer AND codebooks refit on the
    # current mix — the action the report recommends).
    corpus_b = emb.unionByName(shifted).cache()
    queries = shifted.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(N_QUERIES).cache()
    frozen_hits = Q.ivf_pq_search_index(
        spark, idx_b, queries, corpus=corpus_b, k=K, rerank=100
    )
    recall_frozen = _recall(spark, corpus_b, queries, frozen_hits)

    refit_cents = fit_ivf_centroids(corpus_b, k=N_CELLS, iters=4)
    refit_books = Q.fit_pq_codebooks(corpus_b, m=16, ncodes=16, iters=3)
    idx_refit = f"{work}/idx_refit"
    refit_codes = (
        Q.pq_encode(corpus_b, refit_books)
        .join(assign_cells(corpus_b, refit_cents).select("vec_id", "cell"), "vec_id")
        .withColumn("ingest_day", F.lit("d0"))
    )
    Q.write_pq_index(
        refit_codes, refit_books, idx_refit, partition_col="ingest_day",
        centroids=refit_cents, mode="overwrite",
    )
    refit_hits = Q.ivf_pq_search_index(
        spark, idx_refit, queries, corpus=corpus_b, k=K, rerank=100
    )
    recall_refit = _recall(spark, corpus_b, queries, refit_hits)

    # control: baseline queries from the ORIGINAL distribution still get
    # their pre-drift recall through the frozen maintained index
    base_queries = emb.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(N_QUERIES).cache()
    base_hits = Q.ivf_pq_search_index(
        spark, idx_b, base_queries, corpus=corpus_b, k=K, rerank=100
    )
    recall_base = _recall(spark, corpus_b, base_queries, base_hits)
    results["recall_at_5"] = {
        "shifted_queries_frozen_maintained": recall_frozen,
        "shifted_queries_after_refit_rebuild": recall_refit,
        "base_queries_frozen_maintained": recall_base,
    }

    payload = json.dumps(results)
    print(payload)
    with open(os.path.join(REPO, "DRIFT_PROBE.json"), "w") as f:
        f.write(payload + "\n")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
