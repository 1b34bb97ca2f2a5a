"""Second relational batch: pivot, explode/lateral, decorrelated scalar
subqueries, range window frames, array functions, entity union, BPE-ish
token counting — rounding out the built-in capability surface (SURVEY.md
§2.3–§2.7 parity plus X4's token-counting variant)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .relational import _events, _li, _t


@register(
    "q_pivot",
    sql="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot on order status (values pinned → no extra distinct-scan job).",
)
def q_pivot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


@register(
    "q_explode_embeddings",
    sql="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding) AS val
    FROM embeddings WHERE vec_id < 3
    """,
    doc="posexplode of array column (lateral view) — vector → (id, pos, value) long format.",
)
def q_explode_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 3)
    return emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@register(
    "q_array_funcs",
    sql="""
    SELECT vec_id,
           len(embedding)                             AS dim,
           list_max(embedding)                        AS vmax,
           list_min(embedding)                        AS vmin,
           embedding[1]                               AS first_val,
           len(list_filter(embedding, x -> x > 0))    AS n_positive
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Array function surface: size/max/min/element_at/filter-count.",
)
def q_array_funcs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").alias("vmax"),
        F.array_min("embedding").alias("vmin"),
        F.element_at("embedding", 1).alias("first_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_scalar_subquery",
    sql="""
    SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
    FROM part p
    WHERE p_retailprice > (
      SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    doc="Correlated scalar subquery (parts above their brand's average) — decorrelated by hand into agg+join on the Spark side; the oracle keeps the correlated form.",
)
def q_scalar_subquery(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(F.avg("p_retailprice").alias("__avg__"))
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("__avg__"))
        .select("p_partkey", "p_brand", F.round("p_retailprice", 2).alias("price"))
    )


@register(
    "q_window_range_frame",
    sql="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
    doc="RANGE window frame (trailing 30-day spend per customer) — value-based frame incl. date peers.",
)
def q_window_range_frame(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@register(
    "q_union_by_name",
    sql="""
    SELECT kind, count(*) AS cnt, count(DISTINCT nationkey) AS nations FROM (
      SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
    ) GROUP BY kind
    """,
    doc="Heterogeneous entity union (unionByName) + per-kind rollup.",
)
def q_union_by_name(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionByName(s)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("nationkey").alias("nations"),
        )
    )


@register(
    "q_bpe_tokens",
    sql=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens,
           length(text) AS n_chars
    FROM documents WHERE doc_id < 500
    """,
    doc="BPE-ish token counting (X4): word/number/symbol regex classes, the standard pre-tokenizer split.",
)
def q_bpe_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


@register(
    "q_json_tuple",
    sql="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT)    AS k_val,
           json_valid(props)                  AS is_valid
    FROM events WHERE event_id < 200
    """,
    doc="Per-row JSON field extraction + validity predicate on the data plane.",
)
def q_json_tuple(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "q_unpivot",
    sql="""
    WITH w AS (
      SELECT lang,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             count(DISTINCT source) AS n_sources
      FROM documents GROUP BY lang
    )
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
    UNION ALL
    SELECT lang, 'total_chars' AS metric, total_chars AS value FROM w
    UNION ALL
    SELECT lang, 'n_sources' AS metric, n_sources AS value FROM w
    """,
    doc=(
        "Unpivot/melt — the inverse of q_pivot: per-lang wide stats "
        "(n_docs, total_chars, n_sources) melted to (lang, metric, value) "
        "long form via the native unpivot operator (Expand node: one pass, "
        "3x fan-out, no join/union re-scan — the oracle's UNION ALL of "
        "three scans is the shape Spark's Expand avoids)."
    ),
)
def q_unpivot(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )
    return wide.unpivot(
        ["lang"], ["n_docs", "total_chars", "n_sources"], "metric", "value"
    )
