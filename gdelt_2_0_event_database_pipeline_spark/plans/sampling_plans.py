"""Sampling query plans (SURVEY.md §2.4 A1–A4) — oracle-verified via the
engine-portable md5 rank.

Seeded sampling was rows-only through round 4 on the grounds that seeded
randomness can't match row-for-row across engines. That's true of
``xxhash64``/``rand`` streams, but the determinism contract (SURVEY.md
§2.11) never named a hash — so the registered queries rank by
``md5(key\\x1f…\\x1fseed)``, which DuckDB computes identically
(``md5(concat_ws(chr(31), …))``), making the EXACT selected row set
oracle-checkable: rows + schema + value hash, like any relational query.
The xxhash64 fast path stays the operator default (8-byte ranks beat
32-char strings at 100 TB); both paths share one plan shape
(TakeOrderedAndProject / per-stratum window rank), so the oracle exercises
the same machinery. pytest (tests/test_sampling.py) keeps the invariant
coverage for the xxhash64 path: exact n, per-stratum counts, filter
containment, without-replacement, partitioning independence.
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

# DuckDB twin of operators.sampling._key_string + md5 rank:
#   md5(concat_ws(chr(31), k1, k2, ..., '<seed>'))
# concat_ws skips NULLs and renders integers/dates identically in both
# engines; chr(31) == the Spark side's "\x1f" unit separator.


@register(
    "q_sample_uniform",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY md5(concat_ws(chr(31), l_orderkey, l_linenumber, '42'))
    LIMIT 1000
    """,
    doc=(
        "Exact-n uniform sample without replacement (A1): md5-ranked top-n, "
        "n=1000 — engine-portable rank makes the exact row set oracle-checked. "
        "Plans as TakeOrderedAndProject: per-partition O(n) heap, no global "
        "sort, no shuffle of the data."
    ),
)
def q_sample_uniform(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return sample_uniform(
        li, 1000, seed=42, key_cols=["l_orderkey", "l_linenumber"], rank_hash="md5"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_sample_stratified",
    sql="""
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey,
             coalesce(c_mktsegment, '__NA__') AS c_mktsegment,
             row_number() OVER (
               PARTITION BY coalesce(c_mktsegment, '__NA__')
               ORDER BY md5(concat_ws(chr(31), c_custkey, '42'))
             ) AS rn
      FROM customer
    ) WHERE rn <= 20
    """,
    doc=(
        "Stratified exact-n per stratum (A4): 20 customers per mktsegment, "
        "md5 rank → oracle-checked row set. One shuffle on the stratum key."
    ),
)
def q_sample_stratified(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return sample_per_group(
        c, "c_mktsegment", 20, seed=42, key_cols=["c_custkey"], rank_hash="md5"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_sample_daily",
    sql="""
    SELECT event_id, day, event_type FROM (
      SELECT event_id, CAST(ts AS DATE) AS day, event_type,
             row_number() OVER (
               PARTITION BY CAST(ts AS DATE)
               ORDER BY md5(concat_ws(chr(31), event_id, '42'))
             ) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
    doc=(
        "Per-day fixed-n sample (A2, per-day-global semantics): 5 events per "
        "day, md5 rank → oracle-checked row set."
    ),
)
def q_sample_daily(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return sample_daily(
        e, 5, seed=42, day_col="day", key_cols=["event_id"], rank_hash="md5"
    ).select("event_id", "day", "event_type")


@register(
    "q_sample_filtered",
    sql="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'N' AND l_quantity BETWEEN 5 AND 45
    ORDER BY md5(concat_ws(chr(31), l_orderkey, l_linenumber, '42'))
    LIMIT 500
    """,
    doc=(
        "Predicate-DSL filter + exact-n sample (A3): reference 'filtered' "
        "mode end-to-end, md5 rank → oracle-checked row set. The DSL filter "
        "compiles to one Catalyst Column and reaches the parquet scan."
    ),
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
        rank_hash="md5",
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
        "Systematic 1-in-20 sample over the o_orderkey order. "
        "Scale-safe: range-bucketed per-bucket windows + cumulative "
        "offsets, NOT a single-task global sort (the oracle's global window "
        "is the semantic spec, not the physical plan)."
    ),
)
def q_sample_systematic(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return sample_systematic(
        o.select("o_orderkey", "o_totalprice"), stride=20, order_col="o_orderkey"
    )


@register(
    "q_sample_weighted",
    sql="""
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             pow(
               (CAST('0x' || substr(
                  md5(concat_ws(chr(31), o_orderkey, '42')), 1, 13) AS BIGINT)
                + 1) / 4503599627370497.0,
               1.0 / o_totalprice
             ) AS rk
      FROM orders
      WHERE o_totalprice > 0
    ) ORDER BY rk DESC LIMIT 500
    """,
    doc=(
        "Exact-n weighted sample (Efraimidis-Spirakis A-Res, extension): "
        "inclusion ∝ o_totalprice; u from the first 52 md5 bits (exact in a "
        "double on both engines) → oracle-checked row set."
    ),
)
def q_sample_weighted(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return sample_weighted(
        o, 500, weight_col="o_totalprice", seed=42, key_cols=["o_orderkey"],
        rank_hash="md5",
    ).select("o_orderkey", "o_totalprice")
