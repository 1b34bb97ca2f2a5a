"""Cross-engine result-type auditor.

The driver's value hash is representation-sensitive across numeric *families*:
a DuckDB DOUBLE 4.0 vs a Spark LONG 4 hash-mismatches even when every value
is numerically equal (this is exactly how q_scalar_math failed round 1 —
DuckDB ceil() returns DOUBLE, Spark's returns LONG). Integer *width*
differences (INT vs BIGINT vs HUGEINT) normalize away and are fine.

This tool builds every oracle pair WITHOUT executing data: the Spark plan's
analyzed schema vs DuckDB's schema for `SELECT * FROM (sql) LIMIT 0`, and
flags any column whose numeric family (int / float / decimal) differs.

Usage: python tools/oracle_dtype_audit.py [sf_dir]   (exit 1 on any flag)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.plans.registry import TABLES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UBIGINT"}
FLOAT_FAMILY = {"FLOAT", "DOUBLE", "REAL"}


def family(type_name: str) -> str:
    t = type_name.upper()
    if t in INT_FAMILY or t.startswith(("INT", "LONG", "SHORT", "BYTE")):
        return "int"
    if t in FLOAT_FAMILY or t.startswith(("FLOAT", "DOUBLE")):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return "other"


def spark_family(dt) -> str:
    return family(dt.simpleString().upper())


def audit(sf_dir: str) -> int:
    spark = get_spark("dtype-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name, qd in QUERIES.items():
        if qd.sql is None:
            continue
        try:
            sschema = {f.name: spark_family(f.dataType) for f in qd.fn(spark, sf_dir).schema}
            rel = con.sql(f"SELECT * FROM ({qd.sql}) LIMIT 0")
            oschema = {c: family(str(t)) for c, t in zip(rel.columns, rel.types)}
            oschema_raw = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        issues = [
            f"{c}: spark={sschema[c]} oracle={oschema[c]}"
            for c in sschema
            if c in oschema
            and {sschema[c], oschema[c]} == {"int", "float"}  # the hash-killing class
        ]
        # HUGEINT is int-family at the LIMIT-0 schema level but materializes
        # as float64 through Arrow/pandas (no int128 dtype) — so it hash-fails
        # against a Spark BIGINT even though every value is equal. DuckDB
        # returns HUGEINT from sum() over BIGINT, including WINDOW sums
        # (exactly how q_pack_linear failed round 3). CAST the SQL to BIGINT.
        issues += [
            f"{c}: oracle HUGEINT materializes as float64 — CAST(... AS BIGINT) in the SQL"
            for c in sschema
            if sschema[c] == "int" and oschema_raw.get(c) == "HUGEINT"
        ]
        if issues:
            print(f"FLAG  {name}: {'; '.join(issues)}")
            bad += 1
    print(f"\n{bad} flagged of {sum(1 for q in QUERIES.values() if q.sql)} oracle queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
