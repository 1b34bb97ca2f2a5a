"""TPC-H-derived decision-support suite over the driver's trimmed schema
(round-8 widening of the relational surface begun by q01/q03/q05/q06).

The driver's TPC-H-ish tables omit ``partsupp``, ``l_commitdate`` /
``l_receiptdate``, ``c_phone``, and the comment columns, so the six
queries that hinge on those (Q2, Q11, Q16, Q20 on partsupp; Q12, Q21 on
commit/receipt dates and shipmode) substitute derived stand-ins that keep
the ORIGINAL OPERATOR SHAPE — the thing that matters for plan coverage:
the per-(part, supplier) min-unit-price aggregate replaces partsupp, the
q04 late-ship rule (l_shipdate > o_orderdate + 60 days) replaces the
commit/receipt pair, and l_returnflag stands in for the missing shipmode
as the low-cardinality lineitem attribute. With those, all 22 TPC-H
query shapes are registered. Cross-engine discipline as everywhere:
identical aliases, double aggregates rounded on both engines (or kept in
exact integer-cent space), ties in every top-k broken by a total order.

Scale notes (shared): nation/region always broadcast; part/supplier/
customer broadcast under the driver-size threshold and stay AQE-eligible
beyond it; the only full-shuffle joins are fact-fact (orders⋈lineitem on
orderkey), exactly as in q05's ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .relational import _li, _t


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q04_order_priority",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (order-priority checking): EXISTS decorrelates to "
        "a LEFT SEMI join orders->lineitem on orderkey plus the late-ship "
        "residual (l_shipdate > o_orderdate + 60 days replaces the absent "
        "commitdate/receiptdate pair). One fact-fact semi join, then a "
        "tiny grouped count over |priorities| keys."
    ),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _li(spark, sf_dir)
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_volume_shipping",
    sql="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape (volume shipping between two trading nations, "
        "both directions): the nation pair predicate pushes into the "
        "broadcast nation joins, so the fact stream is pre-filtered to "
        "the two nations' rows before the orderkey shuffle."
    ),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "q08_market_share",
    sql="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape (national market share): share of PROMO-part "
        "revenue in the ASIA customer region supplied from NATION_3, by "
        "order year. Seven joins, five of them broadcast dims; the "
        "conditional-sum ratio replaces a self-join. Ratio rounded 6dp "
        "both engines."
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _rev()
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q09_profit_by_nation",
    sql="""
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape (product-type profit by supplier nation and "
        "year): the part-name LIKE filter prunes through the broadcast "
        "part join before the fact shuffle; without partsupp the profit "
        "term is discounted revenue (supplycost leg dropped, shape "
        "unchanged)."
    ),
)
def q09_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            _rev().cast("decimal(18,4)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
        )
    )


@register(
    "q10_returned_items",
    sql="""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape (returned-item reporting): top-20 customers by "
        "lost revenue in a quarter. The limit executes as "
        "TakeOrderedAndProject over the grouped aggregate (per-partition "
        "heaps, no global sort); revenue rounded BEFORE ranking with a "
        "custkey tiebreak so the top-20 cut is engine-identical."
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _li(spark, sf_dir).filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    agg = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20).select(
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


@register(
    "q13_customer_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape (customer order-count distribution): LEFT JOIN "
        "keeps zero-order customers (count(o_orderkey) ignores the NULL "
        "rows), then a second tiny aggregation over |distinct counts| "
        "keys. Two shuffles: custkey, then c_count."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_effect",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-04-01'
      AND l.l_shipdate < TIMESTAMP '1996-05-01'
    """,
    doc=(
        "TPC-H Q14 shape (promotion effect): promo revenue share for one "
        "month as a conditional-sum ratio — broadcast part join, one "
        "1-row global aggregate (map-side partials), ratio rounded 4dp."
    ),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-04-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-05-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    rev = _rev()
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_revenue")
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 shape (top supplier): quarterly revenue per supplier, "
        "then the scalar-subquery max filter (the view of the original). "
        "Revenue is rounded BEFORE the max comparison so the argmax set "
        "is engine-identical; the max is a 1-row broadcast."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx__"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx__"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_qty_revenue",
    sql="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.qty_threshold
    """,
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue): the correlated "
        "per-part avg-quantity subquery decorrelates to a grouped "
        "aggregate joined back on partkey (fine-grained key, no "
        "re-correlation). l_quantity is integer-valued so the 0.2*avg "
        "threshold is bit-identical cross-engine; final sum rounded 2dp."
    ),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    th = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(th, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc=(
        "TPC-H Q18 shape (large-volume customers): the IN subquery is a "
        "grouped HAVING filter semi-joined back on orderkey — the "
        "qualifying-set shuffle carries (orderkey, qty-sum) partials "
        "only. l_quantity sums are integer-valued doubles (exact), so no "
        "rounding is needed on total_qty."
    ),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _li(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q__"))
        .filter(F.col("__q__") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "__ok__"),
               F.col("o_orderkey") == F.col("__ok__"), "left_semi")
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "q19_discounted_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
        "three (brand, size, quantity) bands OR-ed into one residual on "
        "a single broadcast part join — the classic test that an engine "
        "evaluates multi-clause disjunctions as one pass, not a UNION of "
        "three scans."
    ),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return j.filter(band).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@register(
    "q22_dormant_customers",
    sql="""
    WITH rich AS (
      SELECT * FROM customer
      WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
      )
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM rich c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-07-01'
    )
    GROUP BY c_nationkey
    """,
    doc=(
        "TPC-H Q22 shape (global sales opportunity): above-average-"
        "balance customers with NO orders — scalar-subquery threshold "
        "(1-row broadcast) + LEFT ANTI join to orders (the NOT EXISTS "
        "decorrelation; the anti side carries custkeys only), grouped by "
        "nation (c_phone country codes absent from the trimmed schema)."
    ),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg__")
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg__"))
    return (
        rich.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q02_min_cost_supplier",
    sql="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
      SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
           c.supply_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eur s  ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size <= 15 AND p.p_type = 'SMALL'
      AND c.supply_cost = (
        SELECT min(c2.supply_cost)
        FROM cost c2 JOIN eur s2 ON s2.s_suppkey = c2.l_suppkey
        WHERE c2.l_partkey = p.p_partkey
      )
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc=(
        "TPC-H Q2 shape (minimum-cost supplier): partsupp is absent, so "
        "its stand-in is the per-(part, supplier) min OBSERVED unit "
        "price min(l_extendedprice / l_quantity) — a grouped aggregate "
        "whose values are engine-exact (one IEEE division per row, min "
        "takes no sums), so the correlated min-cost equality join is "
        "bit-identical cross-engine with NO rounding. The correlated "
        "subquery decorrelates to a per-part min over the EUROPE-"
        "filtered cost frame joined back on (partkey, cost); supplier/"
        "nation/region broadcast; top-100 under the (acctbal desc, "
        "nation, supplier, part) total order runs as "
        "TakeOrderedAndProject — no global sort."
    ),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eur_cost = cost.join(
        F.broadcast(eur), F.col("s_suppkey") == F.col("l_suppkey")
    )
    # per-part min as a window over the SAME l_partkey key instead of a
    # groupBy + self-join: the eur_cost subtree (lineitem aggregate +
    # broadcast join) was computed twice — once for the min frame, once
    # for the equality join — and the join added its own exchange (guide
    # §2.4: duplicated subtrees / two ops keyed the same way share one
    # exchange). Rows kept are identical: supply_cost == per-part min,
    # ties all retained, exact-double equality on both forms (plan diff:
    # 24 Exchanges → 7, one lineitem scan instead of two).
    min_w = Window.partitionBy("l_partkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    return (
        eur_cost.withColumn("__min_cost__", F.min("supply_cost").over(min_w))
        .filter(F.col("supply_cost") == F.col("__min_cost__"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@register(
    "q11_important_parts",
    sql="""
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_19'
      GROUP BY l.l_partkey
    )
    SELECT v.l_partkey AS p_partkey, v.cents / 100.0 AS part_value
    FROM val v, (SELECT CAST(sum(cents) AS BIGINT) AS total FROM val) t
    WHERE v.cents * 1000 > t.total
    """,
    doc=(
        "TPC-H Q11 shape (important stock identification): per-part "
        "shipped value from one nation's suppliers, kept where the part "
        "exceeds 0.001 of the nation total — partsupp's availqty*cost "
        "replaced by shipped l_extendedprice. The HAVING-fraction "
        "comparison runs ENTIRELY in exact integer-cent space "
        "(cents*1000 > total — l_extendedprice is 2dp by construction), "
        "so the boundary cut is engine-exact; the output value is one "
        "terminal division. Grouped sum on partkey + a 1-row grand "
        "total broadcast back — the scalar-subquery threshold plan."
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("cents"))
    )
    total = val.agg(F.sum("cents").alias("__total__"))
    return (
        val.join(F.broadcast(total), F.col("cents") * 1000 > F.col("__total__"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("cents") / F.lit(100.0)).alias("part_value"),
        )
    )


@register(
    "q12_late_shipments",
    sql="""
    SELECT l.l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    doc=(
        "TPC-H Q12 shape (shipping modes and order priority): the "
        "priority mix of LATE lineitems per low-cardinality lineitem "
        "class — l_returnflag stands in for the absent l_shipmode, the "
        "q04 late rule (shipdate > orderdate + 60 days) for the absent "
        "commit/receipt pair. One fact-fact join on orderkey, then "
        "conditional integer counts over |classes| keys — exact "
        "BIGINTs, engine-exact."
    ),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_cnt",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc=(
        "TPC-H Q16 shape (parts/supplier relationship): distinct "
        "supplier counts per (brand, type, size) slice, excluding a "
        "supplier blocklist — partsupp replaced by the DISTINCT "
        "(l_partkey, l_suppkey) pairs actually observed in lineitem; "
        "the comment-LIKE complaints blocklist by the s_name LIKE '%7' "
        "slice. NOT IN compiles to a broadcast LEFT ANTI join (suppkey "
        "is non-null, so NOT IN and ANTI agree); part filters prune "
        "through the broadcast join before the distinct-pair shuffle. "
        "Exact integer counts."
    ),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_dominant_suppliers",
    sql="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ), tot AS (
      SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh JOIN tot t ON t.l_partkey = sh.l_partkey
        WHERE 2 * sh.supp_qty > t.part_qty
      )
    """,
    doc=(
        "TPC-H Q20 shape (potential part promotion): suppliers in one "
        "region who DOMINATE the 1997 supply of some 'red' part (their "
        "shipped quantity exceeds half the part's total — the availqty "
        "> 0.5*shipped rule re-anchored on observed shipments, partsupp "
        "being absent). The IN chain compiles to semi joins: the "
        "part-name prefix prunes through a broadcast join, the per-"
        "(part, supplier) and per-part aggregates share the partkey "
        "shuffle, and the dominance cut is exact BIGINT arithmetic "
        "(l_quantity is integer-valued). Supplier/nation/region "
        "broadcast."
    ),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    shipped = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        shipped.join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.lit(2) * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    sql="""
    WITH w AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
    doc=(
        "TPC-H Q21 shape (suppliers who kept orders waiting): per "
        "supplier, finished multi-supplier orders where they were the "
        "ONLY late participant (late = the q04 shipdate rule). The "
        "oracle keeps the original EXISTS / NOT-EXISTS correlated form; "
        "Spark runs the aggregate decorrelation — per-(order, supplier) "
        "late flags, per-order supplier/late counts joined back, keep "
        "late=1 AND n_supp>=2 AND n_late=1 — a true cross-engine "
        "algorithm differential (the classic rewrite every optimizer "
        "paper cites). Both per-order aggregates reuse the orderkey "
        "shuffle; exact integer counts; top-25 under the (numwait "
        "desc, name) total order as TakeOrderedAndProject."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _li(spark, sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(F.max(late).alias("late"))
    per_o = per_os.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    waiting = (
        per_os.join(per_o, F.col("o_key") == F.col("l_orderkey"))
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )
