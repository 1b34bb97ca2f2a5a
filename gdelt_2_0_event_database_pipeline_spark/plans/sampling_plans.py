"""Sampling query plans (SURVEY.md §2.4 A1–A4) — rows-only by design.

Seeded randomness can never match row-for-row across engines (SURVEY.md §7
risk register), so these carry no oracle SQL; the driver records row counts
and pytest (tests/test_sampling.py) asserts the reference's actual
invariants: exact n, per-stratum counts, filter containment,
without-replacement, seed determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import (
    sample_daily,
    sample_filtered,
    sample_per_group,
    sample_systematic,
    sample_uniform,
    sample_weighted,
)
from .registry import register
from .relational import _events, _t


@register(
    "q_sample_uniform",
    sql=None,
    doc="Exact-n uniform sample without replacement (A1/A3): hash-ranked top-n, n=1000.",
)
def q_sample_uniform(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return sample_uniform(
        li, 1000, seed=42, key_cols=["l_orderkey", "l_linenumber"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_sample_stratified",
    sql=None,
    doc="Stratified exact-n per stratum (A4): 20 customers per mktsegment.",
)
def q_sample_stratified(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return sample_per_group(
        c, "c_mktsegment", 20, seed=42, key_cols=["c_custkey"]
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_sample_daily",
    sql=None,
    doc="Per-day fixed-n sample (A2, per-day-global semantics): 5 events per day.",
)
def q_sample_daily(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return sample_daily(e, 5, seed=42, day_col="day", key_cols=["event_id"]).select(
        "event_id", "day", "event_type"
    )


@register(
    "q_sample_filtered",
    sql=None,
    doc="Predicate-DSL filter + exact-n sample (A3): reference 'filtered' mode end-to-end.",
)
def q_sample_filtered(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    fdict = {
        "l_returnflag": "N",
        "l_quantity": {"op": "between", "min": 5, "max": 45},
    }
    return sample_filtered(
        li,
        fdict,
        n=500,
        seed=42,
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
        key_cols=["l_orderkey", "l_linenumber"],
    )


@register(
    "q_sample_systematic",
    sql="""
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    ) WHERE (rn - 1) % 20 = 0
    """,
    doc=(
        "Systematic 1-in-20 sample over the o_orderkey order — the one "
        "sampling mode whose row set is engine-independent, giving the "
        "sampling family a full oracle row (seeded modes are rows-only by "
        "construction). Scale-safe: range-bucketed per-bucket windows + "
        "cumulative offsets, NOT a single-task global sort (the oracle's "
        "global window is the semantic spec, not the physical plan)."
    ),
)
def q_sample_systematic(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return sample_systematic(
        o.select("o_orderkey", "o_totalprice"), stride=20, order_col="o_orderkey"
    )


@register(
    "q_sample_weighted",
    sql=None,
    doc="Exact-n weighted sample (Efraimidis-Spirakis A-Res, extension): inclusion ∝ o_totalprice.",
)
def q_sample_weighted(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return sample_weighted(
        o, 500, weight_col="o_totalprice", seed=42, key_cols=["o_orderkey"]
    ).select("o_orderkey", "o_totalprice")
