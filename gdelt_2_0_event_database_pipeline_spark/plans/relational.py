"""Relational-core query plans (SURVEY.md §2.2–§2.7).

The reference's own relational surface is scans + predicate DSL + NULL-drop +
projection (its only "queries" are CLI stage invocations — SURVEY.md §3); the
join/agg/window/set-op surface here is capability parity with Spark built-ins,
declared over the driver's TPC-H-ish tables and oracled against DuckDB.

Every query follows the cross-engine comparison rules in ``registry.py``
(identical aliases, rounded double aggregates, total orderings for top-k).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.predicates import compile_filter, compile_filter_sql
from .registry import register


def _table_view(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    """Resolve a base TABLE through a session temp view registered on first
    use — the catalog pattern every real deployment runs (tables resolved by
    name through a metastore, not re-inferred per query).

    Why: a bare ``spark.read.parquet(path)`` re-lists the directory and
    re-reads parquet footers for schema inference on EVERY call — measured
    130–270 ms per call warm on this machine. With ~250 registry queries
    each resolving 1–3 tables per invocation, that is tens of seconds of
    pure per-query fixed cost (guide §6 file-listing/metadata costs; the
    r15 verdict's "schema probes in _t/_events" item). ``spark.table`` on a
    registered view is ~14 ms and returns a FRESH DataFrame each call (new
    attribute ids — self-joins of two ``_t`` results stay unambiguous).

    NOT result caching: the view stores only the analyzed read plan
    (schema + file listing of the immutable testdata tables); every action
    over it still scans the parquet inputs. Views are session-scoped, so a
    new session re-registers from scratch. Do NOT use this for mutable
    artifacts (index codes/bands/ledgers) — those must re-resolve per read.
    """
    view = (
        "__sg_t_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + "_"
        + name
    )
    try:
        return spark.table(view)
    except Exception:  # not registered in this session yet
        df = build()
        df.createOrReplaceTempView(view)
        return spark.table(view)


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _table_view(
        spark, sf_dir, name,
        lambda: spark.read.parquet(f"{sf_dir}/{name}.parquet"),
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet and normalize ``ts`` to TIMESTAMP regardless of the
    physical parquet type. Handled matrix:

    - TIMESTAMP(MICROS, adjusted)   → read as-is.
    - TIMESTAMP(MICROS, no tz)      → Spark reads TIMESTAMP_NTZ; cast to
      TIMESTAMP (session tz is UTC everywhere in this repo, so wall-clock
      values are preserved and the DuckDB ``ts::TIMESTAMP`` oracles align).
      Without this, ``unix_micros`` AnalysisExceptions downstream.
    - TIMESTAMP(NANOS)              → Spark rejects at read; retry with
      ``nanosAsLong`` and integer-divide to micros (``div 1000`` — a double
      roundtrip would lose precision at 1e18 nanos). The legacy conf is only
      set on this fallback path so plan-build stays side-effect-free for
      modern data.
    """
    def build() -> DataFrame:
        path = f"{sf_dir}/events.parquet"
        try:
            e = spark.read.parquet(path)
        except Exception:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            e = spark.read.parquet(path)
        ts_type = dict(e.dtypes).get("ts")
        if ts_type == "bigint":
            e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            e = e.withColumn("ts", F.col("ts").cast("timestamp"))
        return e

    # registered under its own view name ("events__norm"): the normalized
    # frame is what every consumer wants, and the name can never collide
    # with a plain _t(..., "events") read
    return _table_view(spark, sf_dir, "events__norm", build)


# --------------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shape scan+filter+groupBy agg; partial (map-side) agg + one shuffle on the group keys.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q06_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: the pure-pushdown query — every predicate lands in "
        "scan-level PushedFilters (range + between + lt on scalar columns), "
        "then one global aggregate with map-side partials. The canonical "
        "probe that filter pushdown and column pruning actually reach the "
        "parquet reader (only 4 of 11 lineitem columns in ReadSchema)."
    ),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q03_shipping_priority",
    sql="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shape 3-way join + agg + deterministic top-10.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _li(spark, sf_dir).filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    sql="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shape 6-way join; dims broadcast, fact joins shuffled on their keys.",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: _t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------
@register(
    "q_join_anti",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join (customers with no orders).",
)
def q_join_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_semi",
    sql="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
    doc="Left-semi join (customers with at least one finished order).",
)
def q_join_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_join_outer_agg",
    sql="""
    SELECT c_custkey,
           count(o_orderkey)                         AS order_count,
           round(coalesce(sum(o_totalprice), 0), 2)  AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="Left-outer join + group agg with zero-order customers preserved.",
)
def q_join_outer_agg(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.6 — built-in capability surface)
# --------------------------------------------------------------------------
@register(
    "q_set_union",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="Distinct union of two key sets.",
)
def q_set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_set_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="Set intersection.",
)
def q_set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_set_except",
    sql="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
    doc="Set difference (EXCEPT DISTINCT): customers that placed no order.",
)
def q_set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return c.subtract(o)


# --------------------------------------------------------------------------
# Windows / top-k / sorts (SURVEY §2.5)
# --------------------------------------------------------------------------
@register(
    "q_topk_per_group",
    sql="""
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS totalprice,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per market segment via ranked window (deterministic tiebreak).",
)
def q_topk_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    sql="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total,
           datediff('day',
             lag(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS days_since_prev
    FROM orders
    """,
    doc="Running per-customer total + lag() day gaps.",
)
def q_window_running(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_total"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
    )


@register(
    "q_sort_limit",
    sql="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="Global top-20 — TakeOrderedAndProject, no full sort materialization.",
)
def q_sort_limit(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Grouping extensions
# --------------------------------------------------------------------------
@register(
    "q_rollup",
    sql="""
    SELECT r_name, n_name, count(*) AS cnt,
           grouping(r_name) * 2 + grouping(n_name) AS gid
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP with grouping id (subtotals + grand total).",
)
def q_rollup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("gid"))
    )


@register(
    "q_having",
    sql="""
    SELECT o_custkey, count(*) AS order_count
    FROM orders GROUP BY o_custkey HAVING count(*) > 10
    """,
    doc="Group + HAVING post-aggregate filter.",
)
def q_having(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter(F.col("order_count") > 10)
    )


@register(
    "q_distinct",
    sql="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="Multi-column DISTINCT (hash aggregate, no value columns).",
)
def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q_conditional_agg",
    sql="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_value,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_value,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending_count
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot-style conditional aggregation (CASE inside agg).",
)
def q_conditional_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("open_value"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("finished_value"),
        F.count(F.when(F.col("o_orderstatus") == "P", F.lit(1))).alias("pending_count"),
    )


@register(
    "q_agg_stats",
    sql="""
    SELECT o_orderpriority,
           count(*)                                   AS cnt,
           round(min(o_totalprice), 2)                AS min_price,
           round(max(o_totalprice), 2)                AS max_price,
           round(avg(o_totalprice), 2)                AS avg_price,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Descriptive stats incl. exact interpolated median.",
)
def q_agg_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
    )


# --------------------------------------------------------------------------
# Predicate DSL (SURVEY §2.2, reference samplers.py:234-297 semantics)
# --------------------------------------------------------------------------
_DSL_CASES: dict[str, tuple[str, dict, list[str]]] = {
    # name -> (table, filter_dict, projection)
    "q_dsl_equality": (
        "lineitem",
        {"l_returnflag": "R"},
        ["l_orderkey", "l_linenumber", "l_returnflag"],
    ),
    "q_dsl_in_list": (
        "orders",
        {"o_orderpriority": ["1-URGENT", "2-HIGH"]},
        ["o_orderkey", "o_orderpriority"],
    ),
    "q_dsl_ops": (
        "lineitem",
        {
            "l_quantity": {"op": "between", "min": 10, "max": 20},
            "l_discount": {"op": "gt", "value": 0.05},
            "l_linestatus": {"op": "equals", "value": "F"},
        },
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    ),
    "q_dsl_nested": (
        "orders",
        {
            "o_orderstatus": "F",
            "OR": {
                "o_orderpriority": ["1-URGENT", "2-HIGH"],
                "AND": {
                    "o_totalprice": {"op": "gt", "value": 200000},
                    "o_orderstatus": {"op": "equals", "value": "F"},
                },
            },
        },
        ["o_orderkey", "o_orderstatus", "o_orderpriority"],
    ),
}


def _make_dsl_query(table: str, fdict: dict, proj: list[str]):
    def fn(spark, sf_dir):
        df = _t(spark, sf_dir, table)
        return df.filter(compile_filter(fdict)).select(*proj)

    return fn


for _name, (_table, _fdict, _proj) in _DSL_CASES.items():
    register(
        _name,
        sql=(
            f"SELECT {', '.join(_proj)} FROM {_table} "
            f"WHERE {compile_filter_sql(_fdict)}"
        ),
        doc=f"Predicate-DSL compile → Catalyst filter on {_table} (pushdown-eligible).",
    )(_make_dsl_query(_table, _fdict, _proj))


@register(
    "q_null_drop",
    sql="""
    SELECT count(*) AS kept FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
      AND l_returnflag IS NOT NULL
    """,
    doc="NULL-drop stage semantics (reference filter.py:176-208): conjunctive IS NOT NULL (pushdown-eligible, unlike na.drop's AtLeastNNonNulls).",
)
def q_null_drop(spark, sf_dir):
    df = _li(spark, sf_dir)
    pred = (
        F.col("l_orderkey").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    return df.filter(pred).agg(F.count(F.lit(1)).alias("kept"))


# --------------------------------------------------------------------------
# Scalar functions (SURVEY §2.7 F1–F7 equivalents)
# --------------------------------------------------------------------------
@register(
    "q_scalar_date",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate)                              AS yr,
           month(o_orderdate)                             AS mon,
           quarter(o_orderdate)                           AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           date_trunc('month', o_orderdate)               AS month_start,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    """,
    doc="Calendar math (reference scraper.py:139-168 → to_date/last_day/trunc).",
)
def q_scalar_date(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.quarter("o_orderdate").alias("qtr"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "q_scalar_string",
    sql="""
    SELECT c_custkey,
           upper(c_name)                      AS name_upper,
           length(c_name)                     AS name_len,
           substr(c_name, 1, 8)               AS name_prefix,
           c_name || '/' || c_mktsegment      AS name_seg,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           replace(c_mktsegment, 'A', '_')    AS seg_repl
    FROM customer
    """,
    doc="String surface: case/len/substr/concat/regexp_extract/replace.",
)
def q_scalar_string(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_repl"),
    )


@register(
    "q_scalar_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                  AS abs_d,
           CAST(ceil(l_quantity / 7) AS BIGINT)    AS ceil_q,
           CAST(floor(l_quantity / 7) AS BIGINT)   AS floor_q,
           round(sqrt(l_extendedprice), 6)         AS sqrt_price,
           round(ln(l_extendedprice + 1), 6)       AS ln_price,
           mod(CAST(l_quantity AS BIGINT), 5)      AS qty_mod
    FROM lineitem
    """,
    doc="Math surface; transcendentals rounded (libm vs JVM ulp drift).",
)
def q_scalar_math(spark, sf_dir):
    li = _li(spark, sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).alias("floor_q"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
    )


@register(
    "q_json_extract",
    sql="""
    SELECT event_type,
           count(*)                              AS cnt,
           avg(CAST(props ->> '$.k' AS BIGINT))  AS avg_k,
           max(CAST(props ->> '$.k' AS BIGINT))  AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Data-plane JSON (events.props) via get_json_object (reference F7 is driver-side json.loads).",
)
def q_json_extract(spark, sf_dir):
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg(k).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_events_hourly",
    sql="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Event-time tumbling 1h rollup (batch analogue of the streaming window).",
)
def q_events_hourly(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
