"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` twin
exists, the same query on DuckDB over the same parquet tables; compares
row count, column-name set, and order-insensitive values (exact match after
sorting columns by name and rows by all values). Reports per-query PASS/FAIL
plus max float deviation to surface cross-engine precision drift early.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.plans.registry import TABLES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"rowcount spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    s, o = normalize(sdf), normalize(odf)
    bad = []
    for c in s.columns:
        sc, oc = s[c], o[c]
        try:
            if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
                scf = pd.to_numeric(sc, errors="coerce")
                ocf = pd.to_numeric(oc, errors="coerce")
                diff = (scf - ocf).abs()
                if not ((scf.isna() == ocf.isna()).all() and (diff.fillna(0) == 0).all()):
                    bad.append(f"{c} maxdiff={diff.max()}")
            else:
                if not sc.astype(str).equals(oc.astype(str)):
                    n = (sc.astype(str) != oc.astype(str)).sum()
                    ex_s = sc[sc.astype(str) != oc.astype(str)].head(2).tolist()
                    ex_o = oc[sc.astype(str) != oc.astype(str)].head(2).tolist()
                    bad.append(f"{c} ({n} diffs, e.g. {ex_s} vs {ex_o})")
        except Exception as e:  # pragma: no cover
            bad.append(f"{c} compare-error: {e}")
    return (not bad), ("; ".join(bad) if bad else "ok")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s, rows-only)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, odf)
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        print(f"{status}  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) {'' if ok else msg}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
