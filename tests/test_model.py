"""Linear quality-model tests: the fit recovers planted token->label
structure, quantized scoring is exact, and the plan stays Column-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdelt_2_0_event_database_pipeline_spark.operators.model import (
    fit_linear_quality_model,
    score_linear_model,
)


def _corpus(spark, n=200):
    # positives talk about quality topics, negatives about spam topics —
    # disjoint vocabularies, so a 64-dim hashed linear model must separate
    good = ["excellent research careful analysis thorough evidence clear"]
    bad = ["buy cheap pills casino winner click free bonus offer"]
    rows = []
    for i in range(n):
        label = 1 if i % 2 == 0 else -1
        base = good[0] if label > 0 else bad[0]
        rows.append((i, f"{base} filler{i % 7}", label))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_fit_separates_planted_classes(spark):
    df = _corpus(spark)
    w = fit_linear_quality_model(df, "doc_id", "text", "label", dim=64, sample_n=150)
    assert len(w) == 64 and all(isinstance(x, int) for x in w)
    scored = score_linear_model(df, "doc_id", "text", w)
    joined = scored.join(df.select("doc_id", "label"), "doc_id")
    acc = joined.select(
        F.avg(
            ((F.col("score") > 0) == (F.col("label") > 0)).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    assert acc >= 0.95, f"accuracy {acc}"


def test_score_is_deterministic_and_zero_for_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    w = [1000] * 64
    out = {r.doc_id: r.score for r in score_linear_model(df, "doc_id", "text", w).collect()}
    # every token adds ±1 to one bucket; weight 0.001 each → |score| <= 0.002
    assert out[2] == 0.0 and out[3] == 0.0
    assert abs(out[1]) <= 0.002 and out[1] != 0.0
    again = {r.doc_id: r.score for r in score_linear_model(df, "doc_id", "text", w).collect()}
    assert out == again


def test_fit_empty_sample_raises(spark):
    import pytest

    df = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        fit_linear_quality_model(df, "doc_id", "text", "label", dim=8)


def test_score_plan_is_column_only(spark):
    df = _corpus(spark, 20)
    plan = score_linear_model(df, "doc_id", "text", [1] * 64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
