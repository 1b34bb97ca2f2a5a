"""CSV → Parquet ingest with the declared GDELT schema (SURVEY.md §2.1
S5–S10, reference ``conversion/converter.py``).

Reference behavior re-expressed Spark-first: one distributed ``spark.read.csv``
with the declared 58-name all-string schema (headerless, tab-separated —
``converter.py:212-233``), numeric coercion as casts (malformed → NULL, same
semantics as ``pd.to_numeric(errors='coerce')``, ``converter.py:225-227``),
then two routed writes — daily files to a flat parquet directory, yearly/
monthly files to a Hive-partitioned tree per configured rules
(``converter.py:238-313``). The reference's per-file loop, manual
``groupby(partition_cols)`` → mkdir → per-partition file dance, and its
Int64-vs-float64 schema-consistency cast all collapse into
``write.partitionBy`` on a typed DataFrame.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import (
    DEFAULT_PARTITION_RULES,
    GDELT_COLUMNS,
    LONG_COLUMNS,
    NUMERIC_COLUMNS,
    gdelt_csv_schema,
)


def extract_zips(zip_dir: str, out_dir: str) -> list[Path]:
    """Driver-side ZIP extraction (reference utils/io.py:16-49). Returns
    extracted paths; skips members that already exist."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    extracted: list[Path] = []
    for zp in sorted(Path(zip_dir).glob("*.zip")):
        with zipfile.ZipFile(zp) as zf:
            for member in zf.namelist():
                dest = out / os.path.basename(member)
                if not dest.exists():
                    with zf.open(member) as src, open(dest, "wb") as dst:
                        dst.write(src.read())
                extracted.append(dest)
    return extracted


def read_gdelt_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    corrupt_col: str | None = None,
) -> DataFrame:
    """Declared-schema read + numeric coercion; never infers (SURVEY §1.2).

    Adds ``_source_file`` (from ``input_file_name()``) so downstream routing
    and idempotency can reason per source file without a second listing.

    With ``corrupt_col``, malformed lines (token count ≠ 58) surface in that
    column instead of vanishing — PERMISSIVE mode's silent null-fill loses
    the observability the reference gets from ``on_bad_lines="warn"``
    (``conversion/converter.py:230``); callers count/log the column and drop
    it before writing.
    """
    if isinstance(paths, str):
        paths = [paths]
    schema = gdelt_csv_schema()
    if corrupt_col:
        from pyspark.sql import types as T

        schema = T.StructType(
            schema.fields + [T.StructField(corrupt_col, T.StringType())]
        )
    df = spark.read.csv(
        list(paths),
        sep="\t",
        header=False,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col or "_corrupt_record",
        encoding="UTF-8",
    )
    return coerce_gdelt_columns(df, corrupt_col=corrupt_col)


def coerce_gdelt_columns(df: DataFrame, corrupt_col: str | None = None) -> DataFrame:
    """Numeric coercion + source-file tagging over an all-string GDELT frame.

    ``try_cast`` ≡ ``pd.to_numeric(errors="coerce")``: malformed → NULL,
    never an ANSI runtime error; long-valued columns go string→double→long
    so float-formatted ints ("2.0") coerce like the reference's
    to_numeric-then-Int64 two-step (converter.py:225-227, :246-250).
    Shared by the batch reader and the streaming convert stage — pure
    column algebra, so it composes with either.
    """

    def _coerce(c: str):
        if c in LONG_COLUMNS:
            return F.col(c).try_cast("double").try_cast("long").alias(c)
        if c in NUMERIC_COLUMNS:
            return F.col(c).try_cast("double").alias(c)
        return F.col(c)

    return df.select(
        *[_coerce(c) for c in GDELT_COLUMNS],
        *([F.col(corrupt_col)] if corrupt_col else []),
        F.input_file_name().alias("_source_file"),
    )


def convert(
    spark: SparkSession,
    csv_dir: str,
    flat_dir: str,
    historical_dir: str | None = None,
    partition_rules: dict[str, list[str]] | None = None,
    manifest_path: str | None = None,
) -> dict[str, int]:
    """Route by source-file granularity (filename regex parity with
    ``converter.py:43-45``): daily → flat parquet; yearly/monthly → Hive
    partitioned per rules (default ``{'yearly': ['Year'], 'monthly':
    ['Year','MonthYear']}``, ``settings.example.yaml:143-149``). Rows with
    NULL partition values are dropped on the historical path (reference
    ``converter.py:291-295``). Returns row counts per route, plus
    ``corrupt`` = number of malformed input lines (token count ≠ 58) — the
    Spark analogue of the reference's ``on_bad_lines="warn"`` logging
    (``converter.py:230``); malformed lines are excluded from every write.
    """
    rules = partition_rules or DEFAULT_PARTITION_RULES

    inputs: str | list[str] = csv_dir
    to_mark: list[str] = []
    if manifest_path:
        # incremental re-run (reference .done markers, converter.py:118-125):
        # only files absent from the processed manifest are read at all
        from glob import glob

        from .lake import mark_processed, unprocessed

        candidates = sorted(
            p for p in glob(os.path.join(csv_dir, "*")) if os.path.isfile(p)
        )
        todo = unprocessed(spark, candidates, manifest_path)
        if not todo:
            return {"daily": 0, "corrupt": 0, **{ft: 0 for ft in rules}}
        inputs, to_mark = todo, todo

    df = read_gdelt_csv(spark, inputs, corrupt_col="_corrupt_record")
    # routing is a native regexp on the file name — same patterns as
    # classify_filename(), but codegen-eligible instead of a per-row UDF
    base = F.element_at(F.split(F.col("_source_file"), "/"), -1)
    ftype = (
        F.when(base.rlike(r"^\d{8}\.[^.].*$"), F.lit("daily"))
        .when(base.rlike(r"^\d{6}\.(?i:zip|csv)$"), F.lit("monthly"))
        .when(base.rlike(r"^\d{4}\.(?i:zip|csv)$"), F.lit("yearly"))
    )
    cached = df.withColumn("_ftype", ftype).cache()

    # ALL report counts in ONE aggregation pass (per-route rows, corrupt
    # lines, and rows surviving each route's partition-column null drop) —
    # one count() per route would re-walk the cached input N+2 times, which
    # is exactly the multi-pass shape that breaks on a 100 TB ingest day.
    # The cache() also makes referencing the corrupt column legal (Spark
    # forbids queries over only the internal corrupt column on an uncached
    # CSV relation).
    good = F.col("_corrupt_record").isNull()
    kept_cols = [
        F.sum(
            (good & F.expr(" AND ".join(f"{c} IS NOT NULL" for c in cols)))
            .cast("long")
        ).alias(f"__kept_{ft}")
        for ft, cols in rules.items()
    ]
    stats = {
        r["_ftype"]: r
        for r in cached.groupBy("_ftype").agg(
            F.count(F.lit(1)).alias("__n"),
            F.count("_corrupt_record").alias("__bad"),  # count(col) = non-null
            *kept_cols,
        ).collect()
    }
    counts: dict[str, int] = {}
    counts["corrupt"] = sum(r["__bad"] for r in stats.values())
    d = stats.get("daily")
    counts["daily"] = (d["__n"] - d["__bad"]) if d is not None else 0

    df = cached.filter(good).drop("_corrupt_record")
    if counts["daily"]:
        (
            df.filter(F.col("_ftype") == "daily")
            .drop("_ftype", "_source_file")
            .write.mode("append")
            .parquet(flat_dir, compression="snappy")
        )

    if historical_dir:
        # one subtree per granularity — yearly (Year=…) and monthly
        # (Year=…/MonthYear=…) have different partition depths, which cannot
        # share a single Hive root (Spark rejects conflicting partition
        # schemas; the reference's flat-file-list read sidesteps rather than
        # solves this, samplers.py:300-316)
        for ft, cols in rules.items():
            r = stats.get(ft)
            # reported count = rows actually written (after the partition-
            # column null drop), straight from the single stats pass
            counts[ft] = int(r[f"__kept_{ft}"]) if r is not None else 0
            if counts[ft]:
                (
                    df.filter(F.col("_ftype") == ft)
                    .drop("_ftype", "_source_file")
                    .na.drop(subset=cols)
                    .write.mode("append")
                    .partitionBy(*cols)
                    .parquet(f"{historical_dir}/{ft}", compression="snappy")
                )
    cached.unpersist()
    if manifest_path and to_mark:
        from .lake import mark_processed

        mark_processed(spark, manifest_path, to_mark)
    return counts
