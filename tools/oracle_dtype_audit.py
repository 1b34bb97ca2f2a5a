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

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UBIGINT"}
FLOAT_FAMILY = {"FLOAT", "DOUBLE", "REAL"}


def oracle_family(type_name: str) -> str:
    """Family of the PANDAS MATERIALIZATION of a DuckDB type — what the
    driver actually hashes. HUGEINT and DECIMAL both come out of
    duckdb's .df() as float64 (no int128/decimal dtype), so they are
    float-family here even though they are exact types in-engine. This
    is the r9 blind spot: classifying HUGEINT as int let two window/sum
    oracles (q_kaplan_meier, q_rollup_merge) pass the audit and then
    hash-fail in the driver against Spark int64."""
    t = type_name.upper()
    if t in {"HUGEINT"} or t.startswith("DECIMAL"):
        return "float"
    if t in INT_FAMILY or t.startswith(("INT", "LONG", "SHORT", "BYTE")):
        return "int"
    if t in FLOAT_FAMILY or t.startswith(("FLOAT", "DOUBLE")):
        return "float"
    return "other"


def spark_family(dt) -> str:
    """Family of the pandas materialization of a Spark type: decimals
    come through toPandas() as decimal.Decimal objects, which can never
    hash-match duckdb's float64 — flagged as their own family."""
    t = dt.simpleString().upper()
    if t.startswith("DECIMAL"):
        return "decimal-object"
    if t.startswith(("INT", "LONG", "SHORT", "BYTE", "TINYINT", "SMALLINT", "BIGINT")):
        return "int"
    if t.startswith(("FLOAT", "DOUBLE")):
        return "float"
    return "other"


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
            oschema = {c: oracle_family(str(t)) for c, t in zip(rel.columns, rel.types)}
            oschema_raw = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        # Any cross-family numeric pair hash-fails in the driver even when
        # every value is equal: int64 102 vs float64 102.0, or
        # decimal.Decimal('1.50') vs float64 1.5. DuckDB returns HUGEINT
        # from sum()/window-sum over BIGINT and DECIMAL from sum(DECIMAL);
        # both materialize float64 — CAST(... AS BIGINT/DOUBLE) in the SQL
        # (q_scalar_math r1, q_pack_linear r3, q_kaplan_meier/
        # q_rollup_merge r9 all died in this class).
        issues = [
            f"{c}: spark={sschema[c]} oracle={oschema[c]}"
            f" (duckdb {oschema_raw[c]})"
            for c in sschema
            if c in oschema
            and sschema[c] != oschema[c]
            and {"int", "float", "decimal-object"} & {sschema[c], oschema[c]}
        ]
        if issues:
            print(f"FLAG  {name}: {'; '.join(issues)}")
            bad += 1
    print(f"\n{bad} flagged of {sum(1 for q in QUERIES.values() if q.sql)} oracle queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
