"""Declarative data-quality expectations (Great-Expectations/dbt-test
style), Spark-first: a JSON-able rule list compiles to ONE aggregation pass
over the table — every row-level rule a conditional count, uniqueness a
``countDistinct`` in the same job — then the 1-row result unpivots to a
tall (rule, column, n_violations, passed) report joined to broadcast rule
metadata. No per-rule scans, no Python in the data path.

The natural extension of the reference's NULL-filter stage
(``filtering/filter.py:106-148``, which validates exactly one rule kind)
to the rule families a lake ingest gate actually needs.

Rule grammar (one dict per rule):
  {"type": "not_null", "column": c}
  {"type": "in_range", "column": c, "min": x, "max": y}   # inclusive; NULLs pass
  {"type": "in_set",   "column": c, "values": [...]}       # NULLs pass
  {"type": "regex",    "column": c, "pattern": p}          # NULLs pass
  {"type": "unique",   "columns": [c, ...]}                # NULL keys ignored
  {"type": "min_rows", "min": n}                           # corpus-level floor
  {"type": "max_null_frac", "column": c, "frac": f}        # null tolerance

NULL handling mirrors SQL three-valued logic deliberately: range/set/regex
rules do not double-report NULLs — pair them with ``not_null`` when NULL is
itself a violation. ``min_rows`` / ``max_null_frac`` are the threshold
forms a 100 TB gate actually runs: a corpus that lost its rows to a bad
upstream filter, or a column whose null rate crept past tolerance, fails
the gate even when no single row is individually "invalid".
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict) -> tuple[Column, str]:
    """(count-of-violations aggregate, column label) for one rule."""
    t = rule["type"]
    if t == "not_null":
        c = F.col(rule["column"])
        return F.count(F.when(c.isNull(), 1)), rule["column"]
    if t == "in_range":
        c = F.col(rule["column"])
        bad = c.isNotNull() & (
            (c < F.lit(rule["min"])) | (c > F.lit(rule["max"]))
        )
        return F.count(F.when(bad, 1)), rule["column"]
    if t == "in_set":
        c = F.col(rule["column"])
        bad = c.isNotNull() & ~c.isin(list(rule["values"]))
        return F.count(F.when(bad, 1)), rule["column"]
    if t == "regex":
        c = F.col(rule["column"])
        bad = c.isNotNull() & ~c.rlike(rule["pattern"])
        return F.count(F.when(bad, 1)), rule["column"]
    if t == "unique":
        cols = [F.col(c) for c in rule["columns"]]
        nonnull = cols[0].isNotNull()
        for c in cols[1:]:
            nonnull = nonnull & c.isNotNull()
        n_keyed = F.count(F.when(nonnull, 1))
        return n_keyed - F.countDistinct(*cols), ",".join(rule["columns"])
    if t == "min_rows":
        # corpus-level floor: an upstream stage that silently dropped the
        # corpus (bad filter, empty join) fails here, not at export.
        # violations = 1 when the row count is below the floor, else 0.
        floor = int(rule["min"])
        short = F.count(F.lit(1)) < F.lit(floor)
        return F.when(short, F.lit(1)).otherwise(F.lit(0)), f"min={floor}"
    if t == "max_null_frac":
        # threshold-based null tolerance — the realistic corpus gate
        # (zero-tolerance not_null is rarely true at 100 TB). Violations =
        # the null count when it exceeds frac * n_rows, else 0, so a
        # failing report says HOW MANY rows are null, not just that the
        # gate tripped.
        c = F.col(rule["column"])
        frac = float(rule["frac"])
        if not 0.0 <= frac <= 1.0:
            raise ValueError("max_null_frac needs 0 <= frac <= 1")
        nulls = F.count(F.when(c.isNull(), 1))
        over = nulls.cast("double") > F.lit(frac) * F.count(F.lit(1)).cast(
            "double"
        )
        return F.when(over, nulls).otherwise(F.lit(0)), rule["column"]
    raise ValueError(f"unknown expectation type: {t!r}")


def check_expectations(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """Evaluate all rules in one aggregation job.

    Returns (rule_id, rule_type, column, n_rows, n_violations, passed) —
    ``rule_id`` is the rule's position in ``rules``, so callers can map
    back to their config. ``passed`` = zero violations.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__nr__")]
    meta = []
    for i, rule in enumerate(rules):
        expr, label = _violation_expr(rule)
        aggs.append(expr.cast("long").alias(f"__v_{i}__"))
        meta.append((i, rule["type"], label))
    one = df.agg(*aggs)
    tall = one.unpivot(
        ["__nr__"], [f"__v_{i}__" for i in range(len(rules))],
        "__rule__", "n_violations",
    )
    spark = df.sparkSession
    meta_df = spark.createDataFrame(
        [(f"__v_{i}__", i, t, c) for i, t, c in meta],
        "__rule__ string, rule_id int, rule_type string, column string",
    )
    return (
        tall.join(F.broadcast(meta_df), "__rule__")
        .select(
            "rule_id",
            "rule_type",
            "column",
            F.col("__nr__").alias("n_rows"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def schema_diff(df: DataFrame, expected) -> list[dict]:
    """Schema contract check: compare a DataFrame's schema against the
    expected StructType and report every deviation —
    ``{"column", "status", "expected", "actual"}`` rows with status in
    ``missing`` (contracted column absent), ``extra`` (un-contracted
    column present), ``type_drift`` (same name, different type),
    ``nullability_drift`` (expected non-nullable, actual nullable).

    The schema-level companion of the row-level expectation rules above:
    run it BEFORE the data expectations — a renamed or re-typed column
    fails here in milliseconds (schema-only, no job) instead of surfacing
    as a thousand row-level violations.
    """
    actual = {f.name: f for f in df.schema.fields}
    exp = {f.name: f for f in expected.fields}
    out: list[dict] = []
    for name, f in exp.items():
        if name not in actual:
            out.append(
                {
                    "column": name,
                    "status": "missing",
                    "expected": f.dataType.simpleString(),
                    "actual": None,
                }
            )
            continue
        a = actual[name]
        if a.dataType != f.dataType:
            out.append(
                {
                    "column": name,
                    "status": "type_drift",
                    "expected": f.dataType.simpleString(),
                    "actual": a.dataType.simpleString(),
                }
            )
        elif (not f.nullable) and a.nullable:
            out.append(
                {
                    "column": name,
                    "status": "nullability_drift",
                    "expected": "not null",
                    "actual": "nullable",
                }
            )
    for name, a in actual.items():
        if name not in exp:
            out.append(
                {
                    "column": name,
                    "status": "extra",
                    "expected": None,
                    "actual": a.dataType.simpleString(),
                }
            )
    return out
