"""ANN recall curves — the measured accuracy/cost trade for the two
approximate-nearest-neighbor paths (round-7 verdict item 6).

Ground truth is exact brute-force ``cosine_topk`` over the full corpus for
a fixed query set. Then:

- **IVF** (``operators/ivf.py``): recall@k as ``nprobe`` sweeps 1..n_cells —
  the knob that bounds how many inverted-list cells each query rescores.
- **LSH** (``operators/similarity.py::cosine_topk_lsh``): recall@k as the
  bucket structure sweeps ``num_planes`` (bucket granularity: 2^planes
  buckets) × ``probe_hamming`` (multi-probe radius). More planes = smaller
  buckets = less rescoring but lower recall at fixed radius; raising the
  probe radius buys recall back — the same bands-vs-rows trade as MinHash
  banding.
- **PQ** (``operators/pq.py``): recall@k of the ADC-over-codes scan as the
  exact-rerank shortlist sweeps 0 (ADC order taken as-is) → 200, at two
  code layouts with the same 8 bytes/vector at rest (m=8×4bit on subdim 8
  vs the m=16×4bit default on subdim 4). The fixture's near-uniform
  embeddings are PQ's worst case — quantization noise dominates weak
  similarities — so these floors are what the defaults must clear.

Recall@k = |approx top-k ∩ exact top-k| / |exact top-k|, averaged over
queries (per-query exact lists may be < k only on thin corpora).

Regenerate the SCALE.md table:

    python tools/ann_recall.py              # sf0.1 defaults, ~2 min
    python tools/ann_recall.py /root/testdata/sf0.01 --queries 10

Prints one markdown table per family plus a trailing JSON line for
machine diffing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gdelt_2_0_event_database_pipeline_spark.operators.ivf import (  # noqa: E402
    fit_ivf_centroids,
    ivf_topk,
)
from gdelt_2_0_event_database_pipeline_spark.operators.pq import (  # noqa: E402
    fit_pq_codebooks,
    fit_residual_codebooks,
    ivf_pq_encode_residual,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
)
from gdelt_2_0_event_database_pipeline_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_lsh,
)
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402


def _topk_sets(df) -> dict:
    """(query_id -> frozenset of neighbor_ids) from a topk result frame."""
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    num = den = 0
    for qid, truth in exact.items():
        den += len(truth)
        num += len(truth & approx.get(qid, set()))
    return num / den if den else float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=25)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--cells", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("ann-recall")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    # deterministic query set: hash-ranked sample (partitioning-independent)
    queries = (
        emb.orderBy(F.xxhash64("vec_id", F.lit(7)))
        .limit(args.queries)
        .localCheckpoint()
    )

    t0 = time.time()
    exact = _topk_sets(cosine_topk(emb, queries, k=args.k))
    t_exact = time.time() - t0

    results = {"sf_dir": args.sf_dir, "n_queries": args.queries, "k": args.k,
               "exact_sec": round(t_exact, 2), "ivf": [], "lsh": []}

    cents = fit_ivf_centroids(emb, k=args.cells)
    print(f"\n## IVF recall@{args.k} vs nprobe ({args.cells} cells, "
          f"{args.queries} queries, exact pass {t_exact:.1f}s)\n")
    print("| nprobe | recall@k | sec |")
    print("|---|---|---|")
    for nprobe in (1, 2, 3, 4, 6, 8, 12, args.cells):
        t0 = time.time()
        rec = _recall(_topk_sets(
            ivf_topk(emb, queries, cents, k=args.k, nprobe=nprobe)), exact)
        dt = time.time() - t0
        print(f"| {nprobe} | {rec:.3f} | {dt:.1f} |")
        results["ivf"].append({"nprobe": nprobe, "recall": round(rec, 4),
                               "sec": round(dt, 2)})

    print(f"\n## LSH recall@{args.k} vs (num_planes, probe_hamming)\n")
    print("| planes | probe_hamming | buckets | recall@k | sec |")
    print("|---|---|---|---|---|")
    for planes in (4, 6, 8):
        for ham in (0, 1, 2):
            t0 = time.time()
            rec = _recall(_topk_sets(cosine_topk_lsh(
                emb, queries, k=args.k,
                num_planes=planes, probe_hamming=ham)), exact)
            dt = time.time() - t0
            print(f"| {planes} | {ham} | {2 ** planes} | {rec:.3f} | {dt:.1f} |")
            results["lsh"].append({"planes": planes, "probe_hamming": ham,
                                   "recall": round(rec, 4), "sec": round(dt, 2)})

    results["pq"] = []
    print(f"\n## PQ recall@{args.k} vs (m, rerank) — 8 bytes/vector both layouts\n")
    print("| m | ncodes | rerank | recall@k | sec |")
    print("|---|---|---|---|---|")
    fitted = {}  # m -> (codebooks, encoded corpus); m=16 reused by IVF-PQ below
    for m in (8, 16):
        books = fit_pq_codebooks(emb, m=m, ncodes=16, iters=3)
        enc = pq_encode(emb, books).localCheckpoint()
        fitted[m] = (books, enc)
        for rr in (0, 25, 50, 100, 200):
            t0 = time.time()
            approx = pq_topk(
                enc, queries, books, k=args.k,
                rerank=rr or None, corpus=None if rr == 0 else emb)
            rec = _recall(_topk_sets(approx), exact)
            dt = time.time() - t0
            print(f"| {m} | 16 | {rr} | {rec:.3f} | {dt:.1f} |")
            results["pq"].append({"m": m, "ncodes": 16, "rerank": rr,
                                  "recall": round(rec, 4), "sec": round(dt, 2)})

    results["ivfpq"] = []
    print(f"\n## IVF-PQ recall@{args.k} vs nprobe "
          f"({args.cells} cells, m=16, rerank=100)\n")
    print("| nprobe | recall@k | sec |")
    print("|---|---|---|")
    books16, enc16 = fitted[16]  # deterministic fit — reuse the PQ sweep's
    for nprobe in (2, 4, 8, 12, args.cells):
        t0 = time.time()
        rec = _recall(_topk_sets(ivf_pq_topk(
            emb, queries, cents, books16, k=args.k, nprobe=nprobe,
            rerank=100, corpus_codes=enc16)), exact)
        dt = time.time() - t0
        print(f"| {nprobe} | {rec:.3f} | {dt:.1f} |")
        results["ivfpq"].append({"nprobe": nprobe, "m": 16, "rerank": 100,
                                 "recall": round(rec, 4), "sec": round(dt, 2)})

    # residual IVFPQ vs raw at identical bytes: on the near-uniform
    # fixture residuals≈raw (centroids all sit near the distribution
    # center), so measure BOTH the fixture and a clustered synthetic —
    # the regime real embedding corpora live in and where the residual
    # construction earns its keep (Jégou 2011 §III).
    results["ivfpq_residual"] = []
    res_books = fit_residual_codebooks(emb, cents, m=16, ncodes=16, iters=3)
    res_enc = ivf_pq_encode_residual(emb, res_books, cents).localCheckpoint()
    print(f"\n## residual IVF-PQ vs raw at 8 B/vec (nprobe={args.cells})\n")
    print("| corpus | encoding | rerank | recall@k | sec |")
    print("|---|---|---|---|---|")

    def _sweep(corpus_name, corpus_df, q_df, exact_sets, cents_, raw_b,
               raw_e, res_b, res_e):
        for enc_name, rr_list in (("raw", (0, 100)), ("residual", (0, 100))):
            for rr in rr_list:
                t0 = time.time()
                kwargs = dict(
                    k=args.k, nprobe=len(cents_),
                    rerank=rr or None,
                )
                if enc_name == "raw":
                    approx = ivf_pq_topk(
                        corpus_df, q_df, cents_, raw_b,
                        corpus_codes=raw_e, **kwargs)
                else:
                    approx = ivf_pq_topk(
                        corpus_df, q_df, cents_, res_b,
                        corpus_codes=res_e, residual=True, **kwargs)
                rec = _recall(_topk_sets(approx), exact_sets)
                dt = time.time() - t0
                print(f"| {corpus_name} | {enc_name} | {rr} | {rec:.3f} | {dt:.1f} |")
                results["ivfpq_residual"].append(
                    {"corpus": corpus_name, "encoding": enc_name, "rerank": rr,
                     "recall": round(rec, 4), "sec": round(dt, 2)})

    _sweep("fixture", emb, queries, exact, cents, books16, enc16,
           res_books, res_enc)

    import numpy as np

    rng = np.random.RandomState(5)
    dim, n_clu, per = 64, args.cells, 400
    centers = rng.randn(n_clu, dim) * 6.0
    xs = np.concatenate([centers[c] + rng.randn(per, dim) for c in range(n_clu)])
    clu = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(xs)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    clu_q = clu.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(args.queries)
    clu_exact = _topk_sets(cosine_topk(clu, clu_q, k=args.k))
    clu_cents = fit_ivf_centroids(clu, k=n_clu)
    clu_raw_b = fit_pq_codebooks(clu, m=16, ncodes=16, iters=3)
    clu_raw_e = pq_encode(clu, clu_raw_b).localCheckpoint()
    clu_res_b = fit_residual_codebooks(clu, clu_cents, m=16, ncodes=16, iters=3)
    clu_res_e = ivf_pq_encode_residual(clu, clu_res_b, clu_cents).localCheckpoint()
    _sweep("clustered", clu, clu_q, clu_exact, clu_cents, clu_raw_b,
           clu_raw_e, clu_res_b, clu_res_e)

    # --- dimensionality-reduced PQ at IDENTICAL at-rest bytes (8 B/vec):
    # FAISS's PCAR pre-transform rationale — decorrelate + concentrate
    # variance so the m sub-quantizers each see signal, vs slicing raw
    # correlated dims. RP is the no-fit-pass alternative. Search (ADC and
    # rerank) runs in the REDUCED space; recall is judged against the
    # ORIGINAL-space exact top-k, so transform loss is charged honestly.
    from gdelt_2_0_event_database_pipeline_spark.operators.pca import (
        fit_pca,
        project_pca,
        random_projection,
    )

    results["pq_reduced"] = []
    rd = 32  # reduced width; m=16 → subdim 2
    print(f"\n## reduced-space PQ recall@{args.k} at 8 B/vec "
          f"(64d raw vs PCA-{rd} vs RP-{rd}, m=16)\n")
    print("| corpus | transform | rerank | recall@k | sec |")
    print("|---|---|---|---|---|")

    def _reduced_sweep(corpus_name, corpus_df, q_df, exact_sets, with_raw=False):
        pca_model = fit_pca(corpus_df, k=rd)
        variants = {
            "pca32": lambda df: project_pca(df, pca_model, out_col="embedding2")
            .select("vec_id", F.col("embedding2").alias("embedding")),
            "rp32": lambda df: random_projection(df, k=rd, d=64, out_col="embedding2")
            .select("vec_id", F.col("embedding2").alias("embedding")),
        }
        if with_raw:  # corpora with no raw-64 row elsewhere in this file
            variants = {"raw64": lambda df: df.select("vec_id", "embedding"),
                        **variants}
        for tname, tf in variants.items():
            red = tf(corpus_df).localCheckpoint()
            red_q = tf(q_df)
            books = fit_pq_codebooks(red, m=16, ncodes=16, iters=3)
            enc = pq_encode(red, books).localCheckpoint()
            for rr in (0, 100):
                t0 = time.time()
                approx = pq_topk(
                    enc, red_q, books, k=args.k,
                    rerank=rr or None, corpus=None if rr == 0 else red)
                rec = _recall(_topk_sets(approx), exact_sets)
                dt = time.time() - t0
                print(f"| {corpus_name} | {tname} | {rr} | {rec:.3f} | {dt:.1f} |")
                results["pq_reduced"].append(
                    {"corpus": corpus_name, "transform": tname, "rerank": rr,
                     "recall": round(rec, 4), "sec": round(dt, 2)})

    _reduced_sweep("fixture", emb, queries, exact)
    _reduced_sweep("clustered", clu, clu_q, clu_exact)

    # low-rank corpus — the regime the PCAR pre-transform exists for
    # (concentrated spectrum: ~16 signal directions + small isotropic
    # noise). PCA-32 keeps ~all the variance, so the m sub-quantizers
    # spend their 8 bytes on signal; raw-64 PQ wastes sub-quantizers on
    # noise dims. The near-isotropic corpora above show the flip side.
    rng2 = np.random.RandomState(11)
    sig = rng2.randn(4000, 16) @ (rng2.randn(16, dim) * 3.0)
    low = sig + rng2.randn(4000, dim) * 0.05
    lowdf = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(low)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    low_q = lowdf.orderBy(F.xxhash64("vec_id", F.lit(7))).limit(args.queries)
    low_exact = _topk_sets(cosine_topk(lowdf, low_q, k=args.k))
    _reduced_sweep("lowrank", lowdf, low_q, low_exact, with_raw=True)

    # --- OPQ rotation vs plain PQ at IDENTICAL bytes (r12 stretch; Ge et
    # al. CVPR 2013 / FAISS OPQMatrix): a learned orthogonal rotation lets
    # the m sub-quantizers cut along decorrelated, variance-balanced axes.
    # Expect ~no change on the near-isotropic corpora (no bad axis to fix)
    # and a real ADC-order gain where the spectrum is concentrated or the
    # clusters are rotated off-axis.
    from gdelt_2_0_event_database_pipeline_spark.operators.opq import (
        fit_opq,
        opq_topk,
        rotate_vectors,
    )

    results["opq"] = []
    print(f"\n## OPQ vs plain PQ recall@{args.k} at 8 B/vec (m=16)\n")
    print("| corpus | encoding | rerank | recall@k | sec |")
    print("|---|---|---|---|---|")

    def _opq_sweep(corpus_name, corpus_df, q_df, exact_sets):
        raw_b = fit_pq_codebooks(corpus_df, m=16, ncodes=16, iters=3)
        raw_e = pq_encode(corpus_df, raw_b).localCheckpoint()
        rot, ob = fit_opq(corpus_df, m=16, ncodes=16, iters=3, opq_iters=6)
        oe = pq_encode(
            rotate_vectors(corpus_df, rot).select(
                "vec_id", F.col("rotated").alias("embedding")
            ),
            ob,
        ).localCheckpoint()
        for enc_name, rr in (("raw", 0), ("raw", 100), ("opq", 0), ("opq", 100)):
            t0 = time.time()
            if enc_name == "raw":
                approx = pq_topk(raw_e, q_df, raw_b, k=args.k,
                                 rerank=rr or None,
                                 corpus=None if rr == 0 else corpus_df)
            else:
                approx = opq_topk(oe, q_df, rot, ob, k=args.k,
                                  rerank=rr or None,
                                  corpus=None if rr == 0 else corpus_df)
            rec = _recall(_topk_sets(approx), exact_sets)
            dt = time.time() - t0
            print(f"| {corpus_name} | {enc_name} | {rr} | {rec:.3f} | {dt:.1f} |")
            results["opq"].append(
                {"corpus": corpus_name, "encoding": enc_name, "rerank": rr,
                 "recall": round(rec, 4), "sec": round(dt, 2)})

    _opq_sweep("fixture", emb, queries, exact)
    _opq_sweep("clustered", clu, clu_q, clu_exact)
    _opq_sweep("lowrank", lowdf, low_q, low_exact)

    # --- OPQ ∘ residual IVFPQ (the full FAISS "OPQ,IVFx,PQy" composition):
    # rotate first, then coarse-quantize + residual-encode IN THE ROTATED
    # SPACE. Cosine is rotation-invariant, so recall is still judged
    # against original-space exact top-k; the rerank runs rotated-vs-
    # rotated (same answer). Answers whether the two transforms stack.
    results["opq_residual"] = []
    print(f"\n## OPQ∘residual IVFPQ vs plain residual at 8 B/vec "
          f"(nprobe=all, m=16)\n")
    print("| corpus | encoding | rerank | recall@k | sec |")
    print("|---|---|---|---|---|")

    def _opq_residual_sweep(corpus_name, corpus_df, q_df, exact_sets):
        rot, _ob = fit_opq(corpus_df, m=16, ncodes=16, iters=3, opq_iters=6)
        rcorp = rotate_vectors(corpus_df, rot).select(
            "vec_id", F.col("rotated").alias("embedding")
        ).localCheckpoint()
        rq = rotate_vectors(q_df, rot).select(
            "vec_id", F.col("rotated").alias("embedding")
        ).localCheckpoint()
        r_cents = fit_ivf_centroids(rcorp, k=args.cells)
        r_res_b = fit_residual_codebooks(rcorp, r_cents, m=16, ncodes=16, iters=3)
        r_res_e = ivf_pq_encode_residual(rcorp, r_res_b, r_cents).localCheckpoint()
        # plain-residual baseline in the ORIGINAL space
        cents0 = fit_ivf_centroids(corpus_df, k=args.cells)
        res_b0 = fit_residual_codebooks(corpus_df, cents0, m=16, ncodes=16, iters=3)
        res_e0 = ivf_pq_encode_residual(corpus_df, res_b0, cents0).localCheckpoint()
        for enc_name, rr in (("residual", 0), ("residual", 100),
                             ("opq+residual", 0), ("opq+residual", 100)):
            t0 = time.time()
            if enc_name == "residual":
                approx = ivf_pq_topk(
                    corpus_df, q_df, cents0, res_b0, k=args.k,
                    nprobe=args.cells, rerank=rr or None,
                    corpus_codes=res_e0, residual=True)
            else:
                approx = ivf_pq_topk(
                    rcorp, rq, r_cents, r_res_b, k=args.k,
                    nprobe=args.cells, rerank=rr or None,
                    corpus_codes=r_res_e, residual=True)
            rec = _recall(_topk_sets(approx), exact_sets)
            dt = time.time() - t0
            print(f"| {corpus_name} | {enc_name} | {rr} | {rec:.3f} | {dt:.1f} |")
            results["opq_residual"].append(
                {"corpus": corpus_name, "encoding": enc_name, "rerank": rr,
                 "recall": round(rec, 4), "sec": round(dt, 2)})

    _opq_residual_sweep("clustered", clu, clu_q, clu_exact)
    _opq_residual_sweep("lowrank", lowdf, low_q, low_exact)

    print()
    payload = json.dumps(results)
    print(payload)
    with open(os.path.join(REPO, "ANN_RECALL.json"), "w") as f:
        f.write(payload + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
