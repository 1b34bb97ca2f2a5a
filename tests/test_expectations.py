"""Expectations engine: each rule family's violation semantics, NULL
conventions, single-job compilation."""

from __future__ import annotations

import pytest

from gdelt_2_0_event_database_pipeline_spark.operators.expectations import (
    check_expectations,
)


def _df(spark):
    rows = [
        (1, 10.0, "A", "ok-1", 1),
        (2, -5.0, "B", "bad", 1),      # range viol; set viol ('B'); regex viol; dup key 1
        (3, None, None, None, 2),      # NULLs: pass range/set/regex; fail not_null
        (4, 70.0, "A", "ok-2", None),  # NULL key ignored by unique
    ]
    return spark.createDataFrame(rows, "id long, price double, status string, tag string, k long")


def test_rule_families_and_null_conventions(spark):
    rules = [
        {"type": "not_null", "column": "price"},
        {"type": "in_range", "column": "price", "min": 0.0, "max": 100.0},
        {"type": "in_set", "column": "status", "values": ["A"]},
        {"type": "regex", "column": "tag", "pattern": "^ok-"},
        {"type": "unique", "columns": ["k"]},
    ]
    out = {r.rule_id: r for r in check_expectations(_df(spark), rules).collect()}
    assert (out[0].n_violations, out[0].passed) == (1, False)   # one NULL price
    assert out[1].n_violations == 1                             # -5 only; NULL passes
    assert out[2].n_violations == 1                             # 'B'; NULL passes
    assert out[3].n_violations == 1                             # 'bad'; NULL passes
    assert out[4].n_violations == 1                             # k=1 twice; NULL key ignored
    assert all(r.n_rows == 4 for r in out.values())


def test_threshold_rules_min_rows_and_null_frac(spark):
    """r15: the threshold forms — corpus floor and null tolerance."""
    df = _df(spark)  # 4 rows, 1 NULL price (25%)
    rules = [
        {"type": "min_rows", "min": 4},                         # met
        {"type": "min_rows", "min": 5},                         # short
        {"type": "max_null_frac", "column": "price", "frac": 0.25},  # at tolerance
        {"type": "max_null_frac", "column": "price", "frac": 0.2},   # over
        {"type": "max_null_frac", "column": "price", "frac": 0.0},   # zero-tolerance
    ]
    out = {r.rule_id: r for r in check_expectations(df, rules).collect()}
    assert (out[0].n_violations, out[0].passed) == (0, True)
    assert (out[1].n_violations, out[1].passed) == (1, False)
    assert (out[2].n_violations, out[2].passed) == (0, True)   # 25% <= 25%
    assert (out[3].n_violations, out[3].passed) == (1, False)  # reports null COUNT
    assert (out[4].n_violations, out[4].passed) == (1, False)
    with pytest.raises(ValueError, match="0 <= frac <= 1"):
        check_expectations(df, [{"type": "max_null_frac", "column": "price", "frac": 1.5}])


def test_single_aggregation_job(spark):
    rules = [
        {"type": "not_null", "column": "price"},
        {"type": "unique", "columns": ["id"]},
    ]
    plan = check_expectations(_df(spark), rules)._jdf.queryExecution().executedPlan().toString()
    # one scan of the input feeds the whole report (no per-rule re-scans)
    assert plan.count("ExistingRDD") + plan.count("LocalTableScan") <= 3


def test_bad_rules_raise(spark):
    with pytest.raises(ValueError):
        check_expectations(_df(spark), [])
    with pytest.raises(ValueError):
        check_expectations(_df(spark), [{"type": "nope", "column": "id"}])


def test_cli_expect_gate(tmp_path, capsys, spark):
    import json as _json

    from gdelt_2_0_event_database_pipeline_spark.cli import main as cli_main

    path = str(tmp_path / "lake")
    _df(spark).write.mode("overwrite").parquet(path)

    ok_rules = '[{"type": "unique", "columns": ["id"]}]'
    assert cli_main(["expect", "--in", path, "--rules", ok_rules]) == 0
    capsys.readouterr()

    rules_file = tmp_path / "rules.json"
    rules_file.write_text(_json.dumps([{"type": "not_null", "column": "price"}]))
    assert cli_main(["expect", "--in", path, "--rules", str(rules_file)]) == 1
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep[0]["n_violations"] == 1 and not rep[0]["passed"]


def test_streaming_expectations_ledger(spark, tmp_path):
    from pyspark.sql import types as T

    from gdelt_2_0_event_database_pipeline_spark.streaming.expect import (
        streaming_expectations,
    )
    from gdelt_2_0_event_database_pipeline_spark.streaming.ingest import (
        read_event_stream,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ])
    src, ledger, ckpt = (str(tmp_path / d) for d in ("in", "ledger", "ckpt"))
    rules = [{"type": "not_null", "column": "price"},
             {"type": "in_range", "column": "price", "min": 0.0, "max": 100.0}]

    spark.createDataFrame([(1, 10.0), (2, None)], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = read_event_stream(spark, src, schema)
    q = streaming_expectations(stream, rules, ledger, ckpt)
    q.awaitTermination(120)

    spark.createDataFrame([(3, 500.0)], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    q = streaming_expectations(stream, rules, ledger, ckpt)
    q.awaitTermination(120)

    rows = spark.read.parquet(ledger).collect()
    batches = {r.batch_id for r in rows}
    assert len(batches) == 2
    by = {(r.batch_id, r.rule_id): r for r in rows}
    b1, b2 = sorted(batches)
    assert by[(b1, 0)].n_violations == 1 and not by[(b1, 0)].passed
    assert by[(b1, 1)].n_violations == 0 and by[(b1, 1)].passed
    assert by[(b2, 0)].n_violations == 0
    assert by[(b2, 1)].n_violations == 1


def test_schema_diff_all_statuses(spark):
    from pyspark.sql import types as T

    from gdelt_2_0_event_database_pipeline_spark.operators.expectations import (
        schema_diff,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.0)], "id long, name string, score double"
    )
    expected = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),   # nullability drift
            T.StructField("name", T.IntegerType()),              # type drift
            T.StructField("created", T.DateType()),              # missing
        ]
    )
    got = {(d["column"], d["status"]) for d in schema_diff(df, expected)}
    assert got == {
        ("id", "nullability_drift"),
        ("name", "type_drift"),
        ("created", "missing"),
        ("score", "extra"),
    }
    # identical schema -> clean
    assert schema_diff(df, df.schema) == []
