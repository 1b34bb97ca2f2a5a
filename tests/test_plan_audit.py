"""Per-query executed-plan gate over the WHOLE registry (VERDICT r4 #3).

Before this test, dedicated plan assertions covered ~6 queries; a scale
regression in any of the other ~90 (an accidental ``orderBy`` without
``limit``, a join degrading to nested-loop, a row-at-a-time UDF sneaking in)
would ship silently. Here every registered query's EXECUTED plan is audited
against `plans.audit` — one plan build per query at sf0.001 (cheap: plans
only, nothing is collected), computed once per test session and asserted
per-query so a failure names the offender.
"""

from __future__ import annotations

import pytest

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES
from gdelt_2_0_event_database_pipeline_spark.plans.audit import (
    GENERATE_HOF_OK,
    NESTED_LOOP_OK,
    SINGLE_PARTITION_OK,
    audit_plan,
)

SF_DIR = "/root/testdata/sf0.001"

_cache: dict[str, dict[str, list[str]]] = {}


@pytest.fixture(scope="session")
def plan_flags(spark) -> dict[str, list[str]]:
    """name -> red-flag list for every registry query, built once."""
    if "flags" not in _cache:
        flags: dict[str, list[str]] = {}
        for name, qd in QUERIES.items():
            try:
                plan = (
                    qd.fn(spark, SF_DIR)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
            except Exception as e:  # noqa: BLE001
                flags[name] = [f"plan build failed: {type(e).__name__}: {e}"]
                continue
            flags[name] = audit_plan(name, plan)
        _cache["flags"] = flags
    return _cache["flags"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_plan_is_scale_clean(name, plan_flags):
    assert plan_flags[name] == [], (
        f"{name}: executed plan has scale red flags {plan_flags[name]} — "
        "fix the plan or (only for a documented row-capped kernel / "
        "single-row summary) allowlist it in plans/audit.py"
    )


def test_allowlists_reference_live_queries():
    """Allowlist hygiene: every exempted name must still be a registered
    query — otherwise a rename silently widens the gate."""
    dead = (
        NESTED_LOOP_OK | SINGLE_PARTITION_OK | set(GENERATE_HOF_OK)
    ) - set(QUERIES)
    assert dead == set(), f"allowlisted names not in registry: {sorted(dead)}"


def test_planted_global_sort_is_caught(spark):
    """The gate actually fires: an orderBy without limit must be flagged.
    (Sort on a derived key — sorting ``range`` by ``id`` is a no-op the
    optimizer eliminates, since Range already reports that ordering.)"""
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("x", F.col("id") % 7).orderBy("x")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "global Sort (orderBy without limit)" in audit_plan("planted", plan)


def test_planted_generate_over_nested_hof_is_caught(spark):
    """The r15 gate fires: exploding a NESTED interpreted-HOF chain is
    flagged; a single cheap HOF (the tokens() shape) is not."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c",)], "text string")
    nested = df.select(
        F.explode(
            F.transform(
                F.filter(F.split("text", " "), lambda t: t != F.lit("")),
                lambda w: F.upper(w),
            )
        )
    )
    plan = nested._jdf.queryExecution().executedPlan().toString()
    assert any("Generate over interpreted-HOF" in f
               for f in audit_plan("planted", plan))

    single = df.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
    )
    plan1 = single._jdf.queryExecution().executedPlan().toString()
    assert not any("Generate over interpreted-HOF" in f
                   for f in audit_plan("planted", plan1))
