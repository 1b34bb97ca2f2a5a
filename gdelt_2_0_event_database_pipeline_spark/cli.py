"""CLI mirroring the reference's four explicitly-invoked stages
(``main.py:163-276``): ``scrape`` / ``convert`` / ``filter`` / ``sample``
with the same flag surface (no automatic chaining — each stage consumes the
previous stage's on-disk output, ``README.md:178-179``).

Spark-first differences: every stage is one (or a few) distributed jobs; the
sample modes are the deterministic hash-ranked operators from
``operators.sampling``.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys

from .config import load_config
from .operators.sampling import (
    sample_daily,
    sample_filtered,
    sample_per_group,
    sample_uniform,
)
from .session import get_spark
from .sources import gdelt_csv, lake, manifest


def _parse_date(s: str) -> dt.date:
    try:
        return dt.date.fromisoformat(s)
    except ValueError as e:
        raise SystemExit(f"Invalid date {s!r}: use YYYY-MM-DD") from e


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gdelt-spark", description=__doc__)
    p.add_argument("--config", default=None, help="YAML settings path")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("scrape", help="list + date-prune + download raw ZIPs")
    sp.add_argument("--url", required=True, help="directory-listing URL")
    sp.add_argument("--out", required=True)
    sp.add_argument("--start-date", type=_parse_date, default=None)
    sp.add_argument("--end-date", type=_parse_date, default=None)

    cv = sub.add_parser("convert", help="CSV → Parquet with declared schema")
    cv.add_argument("--in", dest="in_dir", required=True, help="extracted CSV dir")
    cv.add_argument("--flat", required=True, help="flat parquet output dir")
    cv.add_argument("--historical", default=None, help="Hive-partitioned output dir")
    cv.add_argument(
        "--manifest", default=None,
        help="processed-file manifest for incremental re-runs (skip already-converted inputs)",
    )

    fl = sub.add_parser("filter", help="drop rows with NULLs in configured columns")
    fl.add_argument("--in", dest="in_dir", required=True)
    fl.add_argument("--historical", default=None)
    fl.add_argument("--out", required=True)
    fl.add_argument("--columns", nargs="*", default=None, help="override config columns")
    fl.add_argument(
        "--per-file", action="store_true",
        help="also report per-input-file rows before/after (reference logs these per file)",
    )

    rd = sub.add_parser("redact", help="scrub PII (emails/phones/IPv4) from a text column")
    rd.add_argument("--in", dest="in_dir", required=True)
    rd.add_argument("--out", required=True)
    rd.add_argument("--column", required=True, help="text column to redact in place")

    pr = sub.add_parser("profile", help="per-column quality stats of a parquet lake")
    pr.add_argument("--in", dest="in_dir", required=True)
    pr.add_argument("--historical", default=None)
    pr.add_argument("--columns", nargs="*", default=None)

    dd = sub.add_parser("dedup", help="exact or near deduplication")
    dd.add_argument("--in", dest="in_dir", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--mode", choices=["exact", "minhash"], required=True)
    dd.add_argument("--key", nargs="+", required=True, help="dedup key columns (exact) or [id, text] (minhash)")
    dd.add_argument("--order-by", nargs="*", default=None, help="exact mode: keep-first ordering")
    dd.add_argument("--threshold", type=float, default=0.8, help="minhash: jaccard threshold")

    df_ = sub.add_parser("diff", help="row-level CDC between two lake snapshots")
    df_.add_argument("--old", required=True, help="previous snapshot parquet dir")
    df_.add_argument("--new", required=True, help="current snapshot parquet dir")
    df_.add_argument("--key", nargs="+", required=True, help="key columns")
    df_.add_argument("--out", default=None, help="optional parquet sink for the diff rows")

    cp = sub.add_parser("compact", help="merge small parquet files (flat dir or whole Hive tree)")
    cp.add_argument("--in", dest="in_dir", required=True, help="parquet dir; Hive trees compact leaf-by-leaf")
    cp.add_argument("--target-mb", type=float, default=128)

    tb = sub.add_parser("select", help="token-budget corpus selection (best docs by quality until budget)")
    tb.add_argument("--in", dest="in_dir", required=True)
    tb.add_argument("--out", required=True)
    tb.add_argument("--budget", type=int, required=True, help="total token budget")
    tb.add_argument("--id-col", default="doc_id")
    tb.add_argument("--text-col", default="text")

    ex = sub.add_parser("expect", help="data-quality expectation gate (exit 1 on violations)")
    ex.add_argument("--in", dest="in_dir", required=True)
    ex.add_argument("--rules", required=True, help="path to a JSON rule list, or an inline JSON array")

    rp = sub.add_parser("report", help="corpus card: docs/tokens/lang/source summary")
    rp.add_argument("--in", dest="in_dir", required=True)
    rp.add_argument("--text-col", default="text")
    rp.add_argument("--lang-col", default="lang")
    rp.add_argument("--source-col", default="source")
    rp.add_argument("--id-col", default="doc_id")

    sc = sub.add_parser("score", help="classifier-based quality scoring (fit on labels, score corpus)")
    sc.add_argument("--in", dest="in_dir", required=True)
    sc.add_argument("--out", required=True)
    sc.add_argument("--label-col", required=True, help="numeric column, >0 = positive")
    sc.add_argument("--id-col", default="doc_id")
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--dim", type=int, default=64)
    sc.add_argument("--sample-n", type=int, default=10000)

    xp = sub.add_parser("export", help="JSONL sharded export with manifest")
    xp.add_argument("--in", dest="in_dir", required=True)
    xp.add_argument("--out", required=True)
    xp.add_argument("--shards", type=int, required=True)
    xp.add_argument("--shard-key", default=None)
    xp.add_argument("--no-compress", action="store_true")

    sm = sub.add_parser("sample", help="reproducible sampling")
    sm.add_argument("--in", dest="in_dir", required=True)
    sm.add_argument("--historical", default=None)
    sm.add_argument("--out", required=True)
    sm.add_argument("--mode", choices=["indexed", "daily", "filtered"], required=True)
    sm.add_argument("-n", type=int, default=None, help="sample size")
    sm.add_argument("--per-day", type=int, default=None)
    sm.add_argument("--filter", default=None, help="JSON predicate dict")
    sm.add_argument("--columns", nargs="*", default=None)
    sm.add_argument("--stratify", default=None)
    sm.add_argument("--n-per-group", type=int, default=None)
    sm.add_argument("--seed", type=int, default=42)

    ad = sub.add_parser(
        "ann-drift",
        help="drift report for a maintained IVF-PQ index (refit decision)",
    )
    ad.add_argument("--index", required=True, help="write_pq_index root")
    ad.add_argument("--sample", required=True,
                    help="parquet of RECENT vectors (id + embedding columns)")
    ad.add_argument("--id-col", default="vec_id")
    ad.add_argument("--vec-col", default="embedding")
    ad.add_argument("--sample-cap", type=int, default=20000)

    ar = sub.add_parser(
        "ann-refit",
        help="atomic refit of a maintained IVF-PQ index (the action "
             "ann-drift's exit-3 recommends): versioned write + commit "
             "marker, searchers read old-or-new, never mixed",
    )
    ar.add_argument("--index", required=True, help="write_pq_index root")
    ar.add_argument("--corpus", required=True,
                    help="parquet of the FULL current raw-vector corpus")
    ar.add_argument("--id-col", default="vec_id")
    ar.add_argument("--vec-col", default="embedding")
    ar.add_argument("--partition-col", default=None,
                    help="codes partitioning to preserve (e.g. ingest_day)")
    ar.add_argument("--iters", type=int, default=5)
    ar.add_argument("--fit-sample-n", type=int, default=100_000)

    pc = sub.add_parser(
        "pca",
        help="fit PCA on a vector column and write the reduced corpus",
    )
    pc.add_argument("--in", dest="in_dir", required=True, help="parquet lake")
    pc.add_argument("--out", required=True, help="output parquet (input cols + --out-col)")
    pc.add_argument("--vec-col", default="embedding")
    pc.add_argument("--out-col", default="pc")
    pc.add_argument("-k", type=int, default=8, help="components to keep")
    pc.add_argument("--whiten", action="store_true", help="unit-variance scores")
    pc.add_argument("--model-out", default=None,
                    help="also persist the fitted model (one-row JSON dataset)")
    pc.add_argument("--model-in", default=None,
                    help="project with an existing model instead of fitting")
    pc.add_argument("--from-state", default=None,
                    help="fit from a maintained moment-state path "
                         "(streaming/moments.py) — no corpus scan")

    pl = sub.add_parser(
        "pipeline",
        help="run a YAML-declared stage chain (normalize→dedup→quality→"
             "split→pack→export) end-to-end",
    )
    pl.add_argument("--pipeline-config", default=None,
                    help="YAML with a pipeline: section (defaults to --config)")

    cm = sub.add_parser(
        "communities",
        help="label-propagation communities over a parquet edge list",
    )
    cm.add_argument("--in", dest="in_dir", required=True,
                    help="parquet with src/dst columns")
    cm.add_argument("--out", required=True, help="output parquet (node, label)")
    cm.add_argument("--src-col", default="src")
    cm.add_argument("--dst-col", default="dst")
    cm.add_argument("--weight-col", default=None)
    cm.add_argument("--iters", type=int, default=4)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config)

    if args.command == "scrape":
        import requests

        html = requests.get(args.url, timeout=30).text
        urls = manifest.extract_zip_links(html, base_url=args.url)
        urls = manifest.filter_urls_by_date(urls, args.start_date, args.end_date)
        result = manifest.download_files(urls, args.out)
        print(json.dumps(result))
        return 0 if not result["failed"] else 1

    from pyspark.sql import SparkSession

    # getOrCreate may hand us a session the embedding process owns (tests,
    # notebooks); only stop what we actually created
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("gdelt_cli")
    try:
        if args.command == "convert":
            counts = gdelt_csv.convert(
                spark,
                args.in_dir,
                args.flat,
                historical_dir=args.historical,
                partition_rules=cfg["partitioning"]["rules"]
                if cfg["partitioning"].get("enabled")
                else None,
                manifest_path=args.manifest,
            )
            print(json.dumps(counts))
        elif args.command == "filter":
            cols = args.columns if args.columns else cfg["filtering"]["columns"]
            report = lake.run_filter_stage(
                spark, args.in_dir, args.out, cols,
                historical_dir=args.historical, per_file=args.per_file,
            )
            payload = {
                "rows_before": report.rows_before,
                "rows_after": report.rows_after,
                "retention": round(report.retention, 4),
                "applied_columns": report.applied_columns,
                "missing_columns": report.missing_columns,
            }
            if report.per_file is not None:
                payload["per_file"] = [
                    {"file": f, "rows_before": b, "rows_after": a, "retention": round(r, 4)}
                    for f, b, a, r in report.per_file
                ]
            print(json.dumps(payload))
        elif args.command == "redact":
            from .operators.text import redact_pii

            df = lake.read_lake(spark, args.in_dir)
            if args.column not in df.columns:
                raise SystemExit(f"column {args.column!r} not in input schema")
            df.withColumn(args.column, redact_pii(args.column)).write.mode(
                "overwrite"
            ).parquet(args.out)
            print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
        elif args.command == "profile":
            from .operators.profile import profile_table

            df = lake.read_lake(spark, args.in_dir, args.historical)
            stats = profile_table(df, args.columns).collect()
            print(
                json.dumps(
                    [
                        {
                            "column": r.column,
                            "n_rows": r.n_rows,
                            "n_nulls": r.n_nulls,
                            "n_distinct": r.n_distinct,
                            "min": r.min_str,
                            "max": r.max_str,
                        }
                        for r in stats
                    ]
                )
            )
        elif args.command == "dedup":
            from .operators.dedup import dedup_exact, minhash_near_dup_pairs

            df = lake.read_lake(spark, args.in_dir)
            if args.mode == "exact":
                order = args.order_by or args.key
                out = dedup_exact(df, subset=args.key, order_by=order)
                out.write.mode("overwrite").parquet(args.out)
                print(
                    json.dumps(
                        {"rows_before": df.count(), "rows_after": spark.read.parquet(args.out).count()}
                    )
                )
            else:
                if len(args.key) != 2:
                    raise SystemExit("minhash mode needs --key <id_col> <text_col>")
                id_col, text_col = args.key
                pairs = minhash_near_dup_pairs(
                    df, id_col, text_col, threshold=args.threshold
                )
                pairs.write.mode("overwrite").parquet(args.out)
                print(json.dumps({"pairs": spark.read.parquet(args.out).count()}))
        elif args.command == "ann-drift":
            from .operators.pq import index_drift_report

            sample = spark.read.parquet(args.sample)
            row = index_drift_report(
                spark, args.index, sample,
                id_col=args.id_col, vec_col=args.vec_col,
                sample_cap=args.sample_cap,
            ).first()
            print(json.dumps({k: row[k] for k in row.asDict()}))
            return 0 if not row["refit_recommended"] else 3  # 3 = refit due
        elif args.command == "ann-refit":
            from .operators.pq import refit_pq_index

            corpus = spark.read.parquet(args.corpus)
            rep = refit_pq_index(
                spark, args.index, corpus,
                id_col=args.id_col, vec_col=args.vec_col,
                partition_col=args.partition_col, iters=args.iters,
                fit_sample_n=args.fit_sample_n,
            )
            print(json.dumps(rep))
        elif args.command == "pca":
            from .operators.pca import (
                fit_pca,
                project_pca,
                read_pca_model,
                write_pca_model,
            )

            df = lake.read_lake(spark, args.in_dir)
            if args.vec_col not in df.columns:
                raise SystemExit(f"column {args.vec_col!r} not in input schema")
            if args.model_in and args.from_state:
                raise SystemExit("--model-in and --from-state are exclusive")
            if args.model_in:
                model = read_pca_model(spark, args.model_in)
            elif args.from_state:
                from .streaming.moments import fit_pca_from_state

                model = fit_pca_from_state(spark, args.from_state, k=args.k)
            else:
                model = fit_pca(df, args.vec_col, k=args.k)
            if args.model_out:
                write_pca_model(spark, model, args.model_out, mode="overwrite")
            project_pca(
                df, model, vec_col=args.vec_col, out_col=args.out_col,
                whiten=args.whiten,
            ).write.mode("overwrite").parquet(args.out)
            print(
                json.dumps(
                    {
                        "rows": spark.read.parquet(args.out).count(),
                        "k": len(model.components),
                        "n_fit_rows": model.n_rows,
                        "explained_variance_ratio": [
                            round(v, 6) for v in model.explained_variance_ratio
                        ],
                    }
                )
            )
        elif args.command == "pipeline":
            import yaml

            from .pipeline import run_pipeline

            path = args.pipeline_config or args.config
            if not path:
                raise SystemExit("pipeline needs --pipeline-config or --config")
            with open(path) as fh:
                pcfg = yaml.safe_load(fh) or {}
            print(json.dumps(run_pipeline(spark, pcfg)))
        elif args.command == "communities":
            from pyspark.sql import functions as F

            from .operators.graph import label_propagation

            edges = lake.read_lake(spark, args.in_dir)
            for c in (args.src_col, args.dst_col):
                if c not in edges.columns:
                    raise SystemExit(f"column {c!r} not in input schema")
            labels = label_propagation(
                edges, args.src_col, args.dst_col,
                max_iter=args.iters, weight_col=args.weight_col,
            )
            labels.write.mode("overwrite").parquet(args.out)
            sizes = (
                spark.read.parquet(args.out)
                .groupBy("label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            top = sizes.orderBy(F.col("n").desc(), "label").limit(10).collect()
            print(
                json.dumps(
                    {
                        "nodes": int(sizes.agg(F.sum("n")).first()[0]),
                        "communities": sizes.count(),
                        "largest": [
                            {"label": r["label"], "n": r["n"]} for r in top
                        ],
                    }
                )
            )
        elif args.command == "diff":
            from .operators.cdc import snapshot_diff

            old = lake.read_lake(spark, args.old)
            new = lake.read_lake(spark, args.new)
            diff = snapshot_diff(old, new, key_cols=args.key)
            if args.out:
                diff.write.mode("overwrite").parquet(args.out)
                diff = spark.read.parquet(args.out)
            from pyspark.sql import functions as F

            counts = {
                r.change_type: r.n
                for r in diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
            }
            print(
                json.dumps(
                    {
                        "added": counts.get("added", 0),
                        "removed": counts.get("removed", 0),
                        "changed": counts.get("changed", 0),
                    }
                )
            )
        elif args.command == "expect":
            import os

            from .operators.expectations import check_expectations

            raw = args.rules
            if os.path.exists(raw):
                with open(raw) as fh:
                    rules = json.load(fh)
            else:
                rules = json.loads(raw)
            df = lake.read_lake(spark, args.in_dir)
            report = check_expectations(df, rules).collect()
            payload = [
                {
                    "rule_id": r.rule_id,
                    "rule_type": r.rule_type,
                    "column": r.column,
                    "n_rows": r.n_rows,
                    "n_violations": r.n_violations,
                    "passed": r.passed,
                }
                for r in sorted(report, key=lambda x: x.rule_id)
            ]
            print(json.dumps(payload))
            return 0 if all(p["passed"] for p in payload) else 1
        elif args.command == "report":
            from .operators.text import corpus_report

            df = lake.read_lake(spark, args.in_dir)
            rows = corpus_report(
                df, id_col=args.id_col, text_col=args.text_col,
                lang_col=args.lang_col, source_col=args.source_col,
            ).collect()
            print(json.dumps({r.metric: r.value for r in rows}))
        elif args.command == "score":
            from .operators.model import (
                fit_linear_quality_model,
                score_linear_model,
            )

            df = lake.read_lake(spark, args.in_dir)
            weights = fit_linear_quality_model(
                df, args.id_col, args.text_col, args.label_col,
                dim=args.dim, sample_n=args.sample_n,
            )
            out = score_linear_model(df, args.id_col, args.text_col, weights)
            out.write.mode("overwrite").parquet(args.out)
            from pyspark.sql import functions as F

            written = spark.read.parquet(args.out)
            st = written.agg(
                F.count(F.lit(1)).alias("n"),
                F.avg((F.col("score") > 0).cast("double")).alias("frac_pos"),
            ).first()
            print(json.dumps({"rows": st.n, "frac_positive": st.frac_pos}))
        elif args.command == "compact":
            from .operators.layout import compact_partitions

            results = compact_partitions(
                spark, args.in_dir, target_file_mb=args.target_mb
            )
            print(json.dumps([r._asdict() for r in results]))
        elif args.command == "export":
            df = lake.read_lake(spark, args.in_dir)
            manifest_df = lake.export_jsonl_shards(
                df,
                args.out,
                shards=args.shards,
                shard_key=args.shard_key,
                compress=not args.no_compress,
            )
            shards = {int(r.shard): int(r.n_rows) for r in manifest_df.collect()}
            print(json.dumps({"shards": shards, "total": sum(shards.values())}))
        elif args.command == "select":
            from .operators.text import quality_score
            from .operators.training import select_token_budget

            df = lake.read_lake(spark, args.in_dir)
            out = select_token_budget(
                df, args.budget, score=quality_score(args.text_col),
                id_col=args.id_col, text_col=args.text_col,
            )
            out.write.mode("overwrite").parquet(args.out)
            written = spark.read.parquet(args.out)
            from pyspark.sql import functions as F

            tot = written.agg(F.count(F.lit(1)), F.max("cum_tokens")).first()
            print(json.dumps({"rows": tot[0], "tokens": tot[1] or 0, "budget": args.budget}))
        elif args.command == "sample":
            df = lake.read_lake(spark, args.in_dir, args.historical)
            key = ["GlobalEventID"] if "GlobalEventID" in df.columns else None
            if args.stratify:
                # --stratify ignores -n (reference README.md:333)
                out = sample_per_group(
                    df, args.stratify, args.n_per_group or 100, seed=args.seed, key_cols=key
                )
            elif args.mode == "indexed":
                if args.n is None:
                    raise SystemExit("indexed mode requires -n")
                out = sample_uniform(df, args.n, seed=args.seed, key_cols=key, strict=True)
            elif args.mode == "daily":
                out = sample_daily(df, args.per_day or 5, seed=args.seed, key_cols=key)
            else:  # filtered
                fdict = json.loads(args.filter) if args.filter else {}
                # pre-flight grammar + column validation (reference
                # samplers.py:201-220) for a clean error instead of a
                # Catalyst analysis exception
                from .functions.predicates import validate_filter_dict

                validate_filter_dict(fdict, valid_columns=df.columns)
                out = sample_filtered(
                    df, fdict, n=args.n or 1000, seed=args.seed,
                    columns=args.columns, key_cols=key,
                )
            if args.columns and not args.mode == "filtered":
                out = out.select(*args.columns)
            out.coalesce(1).write.mode("overwrite").parquet(args.out)
            print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
    finally:
        if not preexisting:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
