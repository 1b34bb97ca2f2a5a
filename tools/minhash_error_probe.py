"""MinHash signature-index parameter probe — the evidence behind the
(num_hashes=64, bands=16) defaults of ``dedup.write_minhash_index``
(r10 verdict item 7: the |est−J| < 0.125 bound was test-pinned at one k;
this sweeps the curve so the parameter choice is measured, not asserted —
the ``nprobe_for_recall`` discipline applied to the LSH index).

Two independent parameter axes, measured on the sf0.01 documents fixture
(new batch doc_id<150 vs reference 150–299, the q_minhash_index setting):

- **k (num_hashes) → estimator error**: the match-time Jaccard estimate
  is the agreeing-position fraction of k INDEPENDENT minhashes; its
  standard deviation is √(J(1−J)/k) ≤ 0.5/√k. The probe measures mean
  and max |est − exact-shingle-Jaccard| over all candidate pairs at each
  k. This axis also sets the index's at-rest size (~8·k bytes/doc).
- **bands (at k=64) → candidate recall**: a pair is a candidate iff some
  band's r = k/bands minhashes all agree (P = 1−(1−J^r)^bands). The
  probe computes EXACT pair Jaccards by brute force over the bounded
  150×150 fixture grid (a verify baseline, never the engine path) and
  measures the banded join's recall of true pairs at J ≥ 0.5 and ≥ 0.7
  per bands setting, next to the theoretical collision curve.

Usage: python tools/minhash_error_probe.py [sf_dir]
Prints one JSON line; writes MINHASH_ERROR.json at the repo root.
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

from gdelt_2_0_event_database_pipeline_spark.operators import dedup as D  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.operators.text import (  # noqa: E402
    char_ngrams,
)
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402

K_SWEEP = [16, 32, 64, 128]
BANDS_SWEEP = [8, 16, 32]
SHINGLE_N = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="minhash_probe_")
    spark = get_spark("minhash-error-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = d.filter(F.col("doc_id") < 150).cache()
    ref = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)).cache()

    # exact shingle Jaccard over the bounded 150x150 grid (ground truth)
    sh = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.array_distinct(char_ngrams(F.lower(F.col("text")), SHINGLE_N)).alias("sh"),
    )
    exact = (
        sh(new).withColumnRenamed("doc_id", "id").withColumnRenamed("sh", "sa")
        .crossJoin(
            sh(ref).withColumnRenamed("doc_id", "ref_id").withColumnRenamed("sh", "sb")
        )
        .withColumn("exact", D.jaccard(F.col("sa"), F.col("sb")))
        .select("id", "ref_id", "exact")
        .cache()
    )
    exact_map = {(r.id, r.ref_id): r.exact for r in exact.collect()}

    results: dict = {"sf_dir": sf_dir, "shingle_n": SHINGLE_N}

    # --- axis 1: estimator error vs k (bands fixed at k/4, threshold 0 so
    # every bucket-collision pair contributes an (est, exact) point)
    k_rows = []
    for k in K_SWEEP:
        path = f"{work}/idx_k{k}"
        D.write_minhash_index(
            ref, path, num_hashes=k, bands=max(k // 4, 1), mode="overwrite"
        )
        pairs = D.minhash_match_index(spark, path, new, threshold=0.0).collect()
        errs = [abs(r.est_jaccard - exact_map[(r.id, r.ref_id)]) for r in pairs]
        k_rows.append(
            {
                "k": k,
                "n_pairs": len(errs),
                "mean_abs_err": round(sum(errs) / len(errs), 4) if errs else None,
                "max_abs_err": round(max(errs), 4) if errs else None,
                "sigma_max_theory": round(0.5 / k**0.5, 4),
                "bytes_per_doc_sigs": 8 * k,
            }
        )
        print(f"k={k}: {k_rows[-1]}", flush=True)
    results["estimator_error_vs_k"] = k_rows

    # --- axis 2: candidate recall vs bands at k=64
    band_rows = []
    for j_min in (0.5, 0.7):
        truth = {p for p, j in exact_map.items() if j >= j_min}
        for bands in BANDS_SWEEP:
            r = 64 // bands
            path = f"{work}/idx_b{bands}"
            if not os.path.isdir(path):
                D.write_minhash_index(
                    ref, path, num_hashes=64, bands=bands, mode="overwrite"
                )
            cands = {
                (row.id, row.ref_id)
                for row in D.minhash_match_index(
                    spark, path, new, threshold=0.0
                ).collect()
            }
            rec = len(cands & truth) / len(truth) if truth else None
            theory = 1 - (1 - j_min**r) ** bands
            # recall per exact-J bucket: the aggregate alone hides where
            # the banding curve deviates from the independent-family theory
            per_bucket = []
            for lo, hi in ((0.4, 0.5), (0.5, 0.6), (0.6, 0.7), (0.7, 1.01)):
                t = {p for p, j in exact_map.items() if lo <= j < hi}
                if t:
                    jm = (lo + min(hi, 1.0)) / 2
                    per_bucket.append(
                        {
                            "j_range": [lo, round(min(hi, 1.0), 2)],
                            "n_true": len(t),
                            "recall": round(len(cands & t) / len(t), 4),
                            "theory_at_mid": round(1 - (1 - jm**r) ** bands, 4),
                        }
                    )
            band_rows.append(
                {
                    "j_min": j_min,
                    "bands": bands,
                    "rows_per_band": r,
                    "n_true_pairs": len(truth),
                    "recall": round(rec, 4) if rec is not None else None,
                    "collision_p_at_j_min_theory": round(theory, 4),
                    "n_candidates": len(cands),
                    "recall_by_j_bucket": per_bucket,
                }
            )
            print(f"j>={j_min} bands={bands}: {band_rows[-1]}", flush=True)
    results["candidate_recall_vs_bands_at_k64"] = band_rows

    payload = json.dumps(results)
    print(payload)
    with open(os.path.join(REPO, "MINHASH_ERROR.json"), "w") as f:
        f.write(payload + "\n")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
