"""Third relational batch: cube grouping sets, ranking windows, edit
distance, date-spine gap detection, column profiling."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.profile import profile_table
from .registry import register
from .relational import _events, _t


@register(
    "q_cube",
    sql="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
           grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS gid
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE grouping sets (all subtotal combinations + grand total).",
)
def q_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("gid")
    )


@register(
    "q_rank_functions",
    sql="""
    SELECT o_orderkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking window surface: rank / dense_rank / ntile / percent_rank.",
)
def q_rank_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "q_levenshtein",
    sql="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit_dist
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id
    WHERE a.doc_id < 25 AND b.doc_id < 25
    """,
    doc="Edit-distance pairs (string-similarity kernel for fuzzy dedup) on 30-char prefixes.",
)
def q_levenshtein(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 25)
        .select("doc_id", F.substring("text", 1, 30).alias("prefix"))
    )
    a, b = d.alias("a"), d.alias("b")
    return a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("edit_dist"),
    )


@register(
    "q_date_gaps",
    sql="""
    WITH spine AS (
      SELECT unnest(generate_series(DATE '1994-12-01', DATE '1995-12-31', INTERVAL 1 DAY))::DATE AS d
    ),
    have AS (SELECT DISTINCT o_orderdate::DATE AS d FROM orders)
    SELECT spine.d AS missing_day
    FROM spine LEFT JOIN have ON spine.d = have.d
    WHERE have.d IS NULL
    """,
    doc="Date-spine gap detection: generated calendar anti-joined against observed days (data-quality staple).",
)
def q_date_gaps(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1994-12-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("missing_day")
    )
    have = o.select(F.col("o_orderdate").cast("date").alias("d")).distinct()
    return spine.join(
        have, spine.missing_day == have.d, "left_anti"
    )


@register(
    "q_regression",
    sql="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(corr(l_extendedprice, l_quantity), 6)           AS correlation,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Regression aggregates per group (regr_slope/intercept/corr) — distributed OLS without a UDF.",
)
def q_regression(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("correlation"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_zscore",
    sql="""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER w)
                 / stddev_samp(c_acctbal) OVER w, 4) AS acctbal_z
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
    doc="Per-group z-score standardization (training-data normalization staple) — whole-partition window, one shuffle.",
)
def q_zscore(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_samp(
        "c_acctbal"
    ).over(w)
    return c.select("c_custkey", F.round(z, 4).alias("acctbal_z"))


@register(
    "q_profile",
    sql="""
    SELECT 'o_orderkey' AS column, count(*) AS n_rows,
           count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
           count(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           count(CASE WHEN o_totalprice IS NULL THEN 1 END),
           count(DISTINCT o_totalprice)
    FROM orders
    """,
    doc="Column profiling (null/distinct counts, one scan) — ingest data-quality sweep.",
)
def q_profile(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return profile_table(o, ["o_orderkey", "o_orderstatus", "o_totalprice"]).select(
        "column", "n_rows", "n_nulls", "n_distinct"
    )


@register(
    "q_grouping_sets",
    sql="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
           grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS gid
    FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc=(
        "Explicit GROUPING SETS — asymmetric subtotal shapes that ROLLUP/"
        "CUBE cannot express — through the native DataFrame groupingSets "
        "API (one expand + one aggregate, no self-union of subqueries)."
    ),
)
def q_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("gid"))


_SQL_SURFACE = """
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT region, nation, revenue,
           row_number() OVER (
             PARTITION BY region ORDER BY revenue DESC, nation
           ) AS rnk
    FROM rev
"""


@register(
    "q_sql_surface",
    sql=_SQL_SURFACE,
    doc=(
        "The SQL API surface: this query string is executed VERBATIM by "
        "both engines — spark.sql() over registered temp views on one "
        "side, DuckDB on the other — proving a user can drive the engine "
        "with plain ANSI SQL (CTE, 4-way join, grouped aggregate, ranked "
        "window) and get hash-identical results, not just through the "
        "DataFrame builders every other query uses."
    ),
)
def q_sql_surface(spark, sf_dir):
    from .registry import load_tables

    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(_SQL_SURFACE)


@register(
    "q_expectations",
    sql="""
    WITH agg AS (
      SELECT count(*) AS n_rows,
        count(CASE WHEN o_custkey IS NULL THEN 1 END) AS v0,
        count(CASE WHEN o_totalprice IS NOT NULL
                    AND (o_totalprice < 0.0 OR o_totalprice > 1000000.0)
                   THEN 1 END) AS v1,
        count(CASE WHEN o_orderstatus IS NOT NULL
                    AND o_orderstatus NOT IN ('O', 'F', 'P')
                   THEN 1 END) AS v2,
        count(CASE WHEN o_orderpriority IS NOT NULL
                    AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                   THEN 1 END) AS v3,
        count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
          - count(DISTINCT o_orderkey) AS v4,
        count(CASE WHEN o_totalprice IS NOT NULL
                    AND (o_totalprice < 0.0 OR o_totalprice > 2000.0)
                   THEN 1 END) AS v5
      FROM orders
    )
    SELECT rule_id, rule_type, "column", n_rows, n_violations,
           n_violations = 0 AS passed
    FROM (
      SELECT 0 AS rule_id, 'not_null' AS rule_type, 'o_custkey' AS "column",
             n_rows, v0 AS n_violations FROM agg
      UNION ALL SELECT 1, 'in_range', 'o_totalprice', n_rows, v1 FROM agg
      UNION ALL SELECT 2, 'in_set', 'o_orderstatus', n_rows, v2 FROM agg
      UNION ALL SELECT 3, 'regex', 'o_orderpriority', n_rows, v3 FROM agg
      UNION ALL SELECT 4, 'unique', 'o_orderkey', n_rows, v4 FROM agg
      UNION ALL SELECT 5, 'in_range', 'o_totalprice', n_rows, v5 FROM agg
    )
    """,
    doc=(
        "Declarative data-quality expectations (the ingest gate): six rules "
        "— not-null, range, set, regex, uniqueness, and one deliberately "
        "failing tight range — compiled into ONE aggregation pass "
        "(conditional counts + countDistinct in the same job), unpivoted "
        "to a tall report. NULLs pass range/set/regex rules by SQL "
        "three-valued-logic convention; pair with not_null when NULL is "
        "itself a violation."
    ),
)
def q_expectations(spark, sf_dir):
    from ..operators.expectations import check_expectations

    o = _t(spark, sf_dir, "orders")
    rules = [
        {"type": "not_null", "column": "o_custkey"},
        {"type": "in_range", "column": "o_totalprice", "min": 0.0, "max": 1000000.0},
        {"type": "in_set", "column": "o_orderstatus", "values": ["O", "F", "P"]},
        {"type": "regex", "column": "o_orderpriority", "pattern": "^[1-5]-"},
        {"type": "unique", "columns": ["o_orderkey"]},
        {"type": "in_range", "column": "o_totalprice", "min": 0.0, "max": 2000.0},
    ]
    return check_expectations(o, rules)


@register(
    "q_mad_outliers",
    sql="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
      FROM lineitem
    ), med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM li GROUP BY l_returnflag
    ), j AS (
      SELECT li.*, m.med FROM li JOIN med m USING (l_returnflag)
    ), mad AS (
      SELECT l_returnflag,
             quantile_cont(abs(l_extendedprice - med), 0.5) AS mad
      FROM j GROUP BY l_returnflag
    )
    SELECT j.l_orderkey, j.l_linenumber, j.l_returnflag, j.l_extendedprice,
           CASE WHEN mad > 0 THEN
             abs(l_extendedprice - med) / (1.4826 * mad) END AS mad_z,
           coalesce(CASE WHEN mad > 0 THEN
             abs(l_extendedprice - med) / (1.4826 * mad) > 3.5 END,
             false) AS is_outlier
    FROM j JOIN mad USING (l_returnflag)
    """,
    doc=(
        "Robust outlier flagging by modified z-score (Iglewicz-Hoaglin "
        "MAD): two exact interpolated-median aggregates broadcast back per "
        "group, map-side row pass — one wild value cannot mask others the "
        "way mean/stddev z-scores allow. Zero-MAD degenerate groups yield "
        "NULL scores, flag false."
    ),
)
def q_mad_outliers(spark, sf_dir):
    from ..operators.profile import mad_outliers

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return mad_outliers(li, "l_extendedprice", "l_returnflag")


@register(
    "q_distribution_drift",
    sql="""
    WITH a AS (
      SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0), 19)
                  AS BIGINT) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey % 2 = 0
    ), b AS (
      SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0), 19)
                  AS BIGINT) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey % 2 = 1
    ), ha AS (SELECT bucket, count(*) AS n_a FROM a GROUP BY bucket),
    hb AS (SELECT bucket, count(*) AS n_b FROM b GROUP BY bucket),
    j AS (
      SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      FROM ha FULL JOIN hb ON ha.bucket = hb.bucket
    ), tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
      FROM j
    )
    SELECT bucket, n_a, n_b,
           n_a / ta AS share_a,
           n_b / tb AS share_b,
           sum(abs(n_a * tb - n_b * ta)) OVER () / (2.0 * ta * tb)
             AS tv_distance
    FROM j CROSS JOIN tot
    """,
    doc=(
        "Distribution drift between two snapshots (even vs odd order keys "
        "over o_totalprice, 20 buckets): per-bucket share deltas plus the "
        "total-variation distance computed in INTEGER space "
        "(|c_a*n_b - c_b*n_a| summed exactly, ONE final division) — TV "
        "instead of PSI/KL precisely because it needs no logarithms and "
        "is therefore engine-exact."
    ),
)
def q_distribution_drift(spark, sf_dir):
    from ..operators.profile import distribution_drift

    o = _t(spark, sf_dir, "orders")
    a = o.filter((F.col("o_totalprice").isNotNull()) & (F.col("o_orderkey") % 2 == 0))
    b = o.filter((F.col("o_totalprice").isNotNull()) & (F.col("o_orderkey") % 2 == 1))
    return distribution_drift(
        a, b, "o_totalprice", lo=0.0, hi=500000.0, buckets=20
    )


@register(
    "q_gini",
    sql="""
    WITH x AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             count(*) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), r AS (
      SELECT nationkey, cnt,
             row_number() OVER (PARTITION BY nationkey ORDER BY cnt) AS i
      FROM x
    ), s AS (
      SELECT nationkey, count(*) AS n,
             CAST(sum(cnt) AS BIGINT) AS sx,
             CAST(sum(i * cnt) AS BIGINT) AS six
      FROM r GROUP BY nationkey
    )
    SELECT nationkey,
           CASE WHEN sx <> 0 THEN
             (2.0 * six - CAST((n + 1) * sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
           END AS gini,
           n
    FROM s
    """,
    doc=(
        "Per-nation Gini coefficient of orders-per-customer concentration "
        "(sorted-rank form): both accumulators are exact BIGINT sums — the "
        "rank-weighted sum is permutation-invariant under ties, so no "
        "tiebreaker — and the final double tree is pinned on both engines; "
        "NO rounding. One rank window + one grouped sum, one exchange."
    ),
)
def q_gini(spark, sf_dir):
    from ..operators.profile import gini

    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return gini(per_cust, ["nationkey"], "cnt")


@register(
    "q_twap",
    sql="""
    WITH uniq AS (
      SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS value
      FROM events GROUP BY user_id, ts
    ), s AS (
      SELECT user_id, epoch_us(ts) AS us, value,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts
             ) AS nxt
      FROM uniq
    )
    SELECT user_id,
           round(sum(value * CAST(nxt - us AS DOUBLE))
                 / sum(CAST(nxt - us AS DOUBLE)), 6) AS twap,
           count(*) AS n_obs
    FROM s GROUP BY user_id
    """,
    doc=(
        "Time-weighted average value per user (each observation weighted "
        "by how long it stayed current — the irregular-sampling fix for "
        "plain averages). Durations are exact integer micros; the "
        "weighted sum is a float aggregate, rounded 6dp on both engines. "
        "Lead window + grouped sum share one key exchange."
    ),
)
def q_twap(spark, sf_dir):
    from ..operators.temporal import time_weighted_avg

    ev = _events(spark, sf_dir)
    uniq = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    out = time_weighted_avg(uniq, ["user_id"], "ts", "value")
    return out.select("user_id", F.round("twap", 6).alias("twap"), "n_obs")


@register(
    "q_chi2",
    sql="""
    WITH cells AS (
      SELECT event_type AS r, dayofweek(ts::TIMESTAMP::DATE) AS c,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT r, sum(o) AS rtot FROM cells GROUP BY r),
       ct AS (SELECT c, sum(o) AS ctot FROM cells GROUP BY c),
       n  AS (SELECT sum(o) AS grand FROM cells),
    e AS (
      SELECT rt.r, COALESCE(cells.o, 0) AS o,
             CAST(rt.rtot * ct.ctot AS DOUBLE) / CAST(n.grand AS DOUBLE) AS exp
      FROM rt CROSS JOIN ct
      LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
      CROSS JOIN n
    )
    SELECT r AS row_value,
           round(sum((CAST(o AS DOUBLE) - exp) * (CAST(o AS DOUBLE) - exp)
                     / exp), 6) AS chi2_part,
           count(*) AS n_cells
    FROM e GROUP BY r
    """,
    doc=(
        "Chi-square independence screen (event_type x weekday): per-cell "
        "(O-E)^2/E with E from exact integer marginal products; per-row "
        "contributions summed (float aggregate, rounded 6dp both sides). "
        "After the first grouped count everything is |categories|^2 rows — "
        "marginals broadcast, so the plan stays one real shuffle at any "
        "input size."
    ),
)
def q_chi2(spark, sf_dir):
    from ..operators.profile import chi_square_independence

    ev = _events(spark, sf_dir).select(
        "event_type", F.dayofweek(F.col("ts").cast("date")).alias("weekday")
    )
    out = chi_square_independence(ev, "event_type", "weekday")
    return out.select(
        "row_value", F.round("chi2_part", 6).alias("chi2_part"), "n_cells"
    )


@register(
    "q_skyline",
    sql="""
    WITH p AS (
      SELECT o_orderkey,
             o_orderdate::DATE - DATE '1970-01-01' AS x_days,
             o_totalprice
      FROM orders
    )
    SELECT o_orderkey, x_days, o_totalprice FROM p q
    WHERE NOT EXISTS (
      SELECT 1 FROM p d
      WHERE d.x_days <= q.x_days AND d.o_totalprice >= q.o_totalprice
        AND (d.x_days < q.x_days OR d.o_totalprice > q.o_totalprice)
    )
    """,
    doc=(
        "2D skyline / Pareto frontier (earliest order date, highest "
        "total price): Spark runs the two-phase plan — equal-width bucket "
        "prune against broadcast prefix maxima (map-side, kills ~all "
        "rows), then one exact dense-rank window over the bounded "
        "survivor set — while the oracle runs the quadratic NOT EXISTS "
        "dominance self-join. Exact agreement, no arithmetic to round."
    ),
)
def q_skyline(spark, sf_dir):
    from ..operators.pareto import skyline2d

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("x_days"),
        "o_totalprice",
    )
    return skyline2d(o, "x_days", "o_totalprice")


@register(
    "q_ks_drift",
    sql="""
    WITH a AS (
      SELECT value AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ), b AS (
      SELECT value AS v FROM events
      WHERE event_type = 'click' AND value IS NOT NULL
    ), ca AS (SELECT v, count(*) AS ka FROM a GROUP BY v),
       cb AS (SELECT v, count(*) AS kb FROM b GROUP BY v),
    m AS (
      SELECT COALESCE(ca.v, cb.v) AS v,
             COALESCE(ka, 0) AS ka, COALESCE(kb, 0) AS kb
      FROM ca FULL JOIN cb ON ca.v = cb.v
    ), t AS (
      SELECT CAST(sum(ka) AS BIGINT) AS na,
             CAST(sum(kb) AS BIGINT) AS nb FROM m
    ), c AS (
      SELECT CAST(sum(ka) OVER w AS BIGINT) AS fa,
             CAST(sum(kb) OVER w AS BIGINT) AS fb
      FROM m WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(max(abs(fa * nb - fb * na)) AS DOUBLE)
             / CAST(na * nb AS DOUBLE) AS ks,
           na AS n_a, nb AS n_b
    FROM c CROSS JOIN t GROUP BY na, nb
    """,
    doc=(
        "Two-sample Kolmogorov-Smirnov drift (purchase vs click value "
        "distributions): integer cumulative CDFs, max over the exact "
        "integer cross-product numerator |fa*nb - fb*na|, ONE final IEEE "
        "division — engine-exact, no float inside the max. The exact "
        "companion of the bucketed TV drift (q_distribution_drift); at "
        "100 TB quantize first, this is the verification-sized tool."
    ),
)
def q_ks_drift(spark, sf_dir):
    from ..operators.profile import ks_statistic

    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "purchase")
    b = e.filter(F.col("event_type") == "click")
    return ks_statistic(a, b, "value")


@register(
    "q_top_p",
    sql="""
    WITH s AS (
      SELECT doc_id, source, n_chars,
             CAST(sum(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum,
             CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM s
    WHERE CAST(cum - n_chars AS DOUBLE) < 0.5 * CAST(total AS DOUBLE)
    """,
    doc=(
        "Nucleus (top-p) curation per source: keep the longest documents "
        "until they cover half the source's character mass — the budget "
        "rule that adapts to each group's distribution (unlike fixed "
        "top-k). Exact integer running/total sums, one pinned double "
        "threshold comparison, total-ordered under ties; running-sum and "
        "group-total windows share ONE exchange."
    ),
)
def q_top_p(spark, sf_dir):
    from ..operators.training import select_top_p

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return select_top_p(d, ["source"], "n_chars", "doc_id", p=0.5)


@register(
    "q_mode_per_group",
    sql="""
    WITH c AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS cnt
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ), r AS (
      SELECT c_mktsegment, c_nationkey, cnt,
             row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY cnt DESC, c_nationkey
             ) AS rn
      FROM c
    )
    SELECT c_mktsegment, c_nationkey AS mode_nationkey, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
    doc=(
        "Deterministic grouped mode (most frequent nation per market "
        "segment): count + ranked window with an explicit value tiebreak "
        "instead of the built-in mode() aggregate, whose tie choice is "
        "engine- and order-dependent. Two shuffles on tiny keys."
    ),
)
def q_mode_per_group(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("cnt"), F.asc("c_nationkey")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nationkey"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "q_ab_test",
    sql="""
    WITH arms AS (
      SELECT user_id % 3 AS arm, count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY user_id % 3
    )
    SELECT a.arm AS arm_a, b.arm AS arm_b, a.n AS na, b.n AS nb,
           CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE) AS rate_a,
           CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE) AS rate_b,
           (CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))
           / sqrt(
               (CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
               * (1.0 - CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
               * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))
             ) AS z,
           abs(
             (CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
              - CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))
             / sqrt(
                 (CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
                 * (1.0 - CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
                 * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))
               )
           ) > 1.959963984540054 AS significant
    FROM arms a JOIN arms b ON a.arm < b.arm
    """,
    doc=(
        "Two-proportion z-test between experiment arms (user_id%3 splits, "
        "purchase conversion): exact integer counts, pooled-variance z in "
        "ONE pinned double tree (divisions + exactly-rounded sqrt) — "
        "engine-exact, no rounding. Everything after the first grouped "
        "count is arm-cardinality-bounded and broadcast."
    ),
)
def q_ab_test(spark, sf_dir):
    from ..operators.profile import ab_test_proportions

    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 3).alias("arm"),
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return ab_test_proportions(e, "arm", F.col("converted"))


@register(
    "q_percentile_vs_ref",
    sql="""
    WITH ref AS (
      SELECT value FROM events
      WHERE event_type = 'click' AND value IS NOT NULL
    ), n AS (SELECT count(*) AS n_ref FROM ref)
    SELECT p.event_id, p.value,
           CAST((SELECT count(*) FROM ref r WHERE r.value <= p.value)
                AS DOUBLE) / CAST(n.n_ref AS DOUBLE) AS ref_pct
    FROM (SELECT event_id, value FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL) p
    CROSS JOIN n
    """,
    doc=(
        "Percentile-vs-reference calibration (purchase values scored "
        "against the click distribution): Spark tags and unions both "
        "sides, sorts ONCE on (value, is_ref desc) and reads each probe's "
        "inclusive reference rank off a running sum — replacing the "
        "quadratic correlated count the oracle runs. Exact integer ranks, "
        "one final IEEE division. At 100 TB: histogram the reference, map "
        "probes through broadcast bucket boundaries."
    ),
)
def q_percentile_vs_ref(spark, sf_dir):
    from ..operators.profile import percentile_vs_ref

    e = _events(spark, sf_dir)
    probe = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    ref = e.filter(F.col("event_type") == "click")
    return percentile_vs_ref(probe, ref, "value", ["event_id"])


@register(
    "q_share_of_parent",
    sql="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS share_of_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_of_total
    FROM rev
    """,
    doc=(
        "Share-of-parent ratios (nation revenue within region, and of the "
        "grand total) — the ratio_to_report BI idiom as two windows over "
        "the tiny |nations|-row aggregate. Revenue rounded 2dp first so "
        "the window sums run on identical inputs on both engines; shares "
        "rounded 6dp (float aggregate)."
    ),
)
def q_share_of_parent(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "revenue",
        F.round(
            F.col("revenue") / F.sum("revenue").over(w_region), 6
        ).alias("share_of_region"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_of_total"
        ),
    )


@register(
    "q_mom_growth",
    sql="""
    WITH m AS (
      SELECT strftime(o_orderdate::DATE, '%Y-%m') AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(
             (revenue - lag(revenue) OVER (ORDER BY month))
               / lag(revenue) OVER (ORDER BY month), 6
           ) AS mom_growth
    FROM m
    """,
    doc=(
        "Month-over-month growth: monthly revenue (rounded 2dp so both "
        "engines window over identical inputs), lag window, growth ratio "
        "rounded 6dp. The ordered window runs over the |months|-row "
        "aggregate — month-cardinality-bounded."
    ),
)
def q_mom_growth(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@register(
    "q_corpus_venn",
    sql="""
    SELECT (doc_id % 2 = 0) AS in_even,
           (doc_id % 3 = 0) AS in_third,
           (n_chars >= 200) AS in_long,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Multi-corpus Venn overlap: membership flags for three derived "
        "corpora grouped into the 8 intersection cells with doc and char "
        "mass per cell — the 'how much do my sources overlap' question "
        "answered in ONE grouped count over membership booleans (no "
        "pairwise joins)."
    ),
)
def q_corpus_venn(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        (F.col("doc_id") % 2 == 0).alias("in_even"),
        (F.col("doc_id") % 3 == 0).alias("in_third"),
        (F.col("n_chars") >= 200).alias("in_long"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "q_decile_lift",
    sql="""
    WITH b AS (
      SELECT quantile_cont(value,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM events WHERE value IS NOT NULL
    ), scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted,
             1 + (CASE WHEN value > bs[1] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[2] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[3] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[4] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[5] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[6] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[7] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[8] THEN 1 ELSE 0 END)
               + (CASE WHEN value > bs[9] THEN 1 ELSE 0 END) AS decile
      FROM events CROSS JOIN b WHERE value IS NOT NULL
    ), g AS (
      SELECT decile, count(*) AS n,
             CAST(sum(converted) AS BIGINT) AS k
      FROM scored GROUP BY decile
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(k) AS BIGINT) AS kt
      FROM g
    )
    SELECT decile, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)) AS lift
    FROM g CROSS JOIN t
    """,
    doc=(
        "Decile lift chart (model-evaluation staple) in the 100 TB shape: "
        "decile assignment by comparison against NINE broadcast exact-"
        "percentile boundaries (one tiny aggregate) instead of a global "
        "ntile sort — the row stream never shuffles for ranking. Tied "
        "scores share a decile (deterministic; ntile would split them "
        "arbitrarily). Exact integer counts, two pinned divisions."
    ),
)
def q_decile_lift(spark, sf_dir):
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    probs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    b = e.agg(F.percentile("value", probs).alias("bs"))
    scored = e.crossJoin(F.broadcast(b)).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "converted"
        ),
        sum(
            [F.lit(1)]
            + [
                F.when(
                    F.col("value") > F.element_at(F.col("bs"), i), 1
                ).otherwise(0)
                for i in range(1, 10)
            ],
            F.lit(0),
        ).alias("decile"),
    )
    g = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("bigint").alias("k"),
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("k").cast("bigint").alias("kt"),
    )
    rate = F.col("k").cast("double") / F.col("n").cast("double")
    base = F.col("kt").cast("double") / F.col("nt").cast("double")
    return g.crossJoin(F.broadcast(t)).select(
        "decile", "n", "k", rate.alias("rate"), (rate / base).alias("lift")
    )


@register(
    "q_weighted_median",
    sql="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), c AS (
      SELECT l_returnflag, v, wt,
             CAST(sum(wt) OVER (
               PARTITION BY l_returnflag ORDER BY v, wt
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum,
             CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
      FROM w
    )
    SELECT l_returnflag, min(v) AS weighted_median
    FROM c WHERE cum * 2 >= total
    GROUP BY l_returnflag
    """,
    doc=(
        "Quantity-weighted median price per return flag: the smallest "
        "value whose cumulative weight reaches half the total — exact "
        "BIGINT cumulative weights under a total order, one min() at the "
        "threshold; running and total windows share the group exchange. "
        "The weighted complement of the exact percentile family."
    ),
)
def q_weighted_median(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("v").asc(), F.col("wt").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_all).alias("total"),
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
    )


@register(
    "q_mannwhitney",
    sql="""
    WITH a AS (
      SELECT value AS v FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
    ), b AS (
      SELECT value AS v FROM events
      WHERE event_type = 'view' AND value IS NOT NULL
    ), ca AS (SELECT v, count(*) AS ka FROM a GROUP BY v),
       cb AS (SELECT v, count(*) AS kb FROM b GROUP BY v),
    m AS (
      SELECT COALESCE(ca.v, cb.v) AS v,
             COALESCE(ka, 0) AS ka, COALESCE(kb, 0) AS kb
      FROM ca FULL JOIN cb ON ca.v = cb.v
    ), r AS (
      SELECT ka, kb, ka + kb AS t,
             CAST(sum(ka + kb) OVER (
               ORDER BY v ROWS UNBOUNDED PRECEDING
             ) - (ka + kb) AS BIGINT) AS prev
      FROM m
    ), s AS (
      SELECT CAST(sum(ka) AS BIGINT) AS n_a,
             CAST(sum(kb) AS BIGINT) AS n_b,
             sum(CAST(ka AS HUGEINT) * (2 * prev + t + 1)) AS r2a,
             sum(CAST(t AS HUGEINT) * t * t - t) AS ties
      FROM r
    )
    SELECT CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           (CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           / sqrt(
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
               * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                  - CAST(ties AS DOUBLE)
                    / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                       * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))
             ) AS z,
           n_a, n_b
    FROM s
    """,
    doc=(
        "Mann-Whitney U rank-sum test (purchase vs view values): doubled "
        "rank arithmetic keeps the rank-sum an exact integer even under "
        "ties (2*avg_rank = 2*prev_cum + t + 1), tie-corrected variance "
        "from exact sum(t^3 - t); accumulators run in decimal(38,0) / "
        "HUGEINT (int64 wraps past ~2e9 pooled rows); one sqrt + two "
        "divisions at the end in a pinned tree — engine-exact, no "
        "rounding. The ordinal companion of q_ks_drift."
    ),
)
def q_mannwhitney(spark, sf_dir):
    from ..operators.profile import mann_whitney_u

    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "purchase")
    b = e.filter(F.col("event_type") == "view")
    return mann_whitney_u(a, b, "value")


@register(
    "q_spearman",
    sql="""
    WITH r AS (
      SELECT l_returnflag AS g,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
               AS rx,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
               AS ry
      FROM lineitem
    ), s AS (
      SELECT g, count(*) AS n,
             sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
             sum(CAST(rx AS HUGEINT) * rx) AS sxx,
             sum(CAST(ry AS HUGEINT) * ry) AS syy,
             sum(CAST(rx AS HUGEINT) * ry) AS sxy
      FROM r GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS spearman_rho
    FROM s
    """,
    doc=(
        "VERIFICATION-SIZED exact twin (SCALE.md): the rank windows here "
        "partition by the 3-value l_returnflag — a single-reducer sort "
        "per group that does NOT survive 100x; the production plan is "
        "q_spearman_bucketed, which this query exists to validate bit-"
        "for-bit (test_ranks.py pins equality). Spearman rank "
        "correlation per return flag (quantity vs price): "
        "tie-averaged ranks kept INTEGER via the doubling trick "
        "(2*avg_rank = 2*min_rank + tie_count - 1), so every accumulator "
        "is exact and rho is one pinned double tree — "
        "engine-exact, no rounding (Pearson-on-ranks is scale-invariant, "
        "so doubled ranks change nothing). The squared/cross accumulators "
        "run in decimal(38,0) (Spark) / HUGEINT (DuckDB): sum(rx*rx) ~ "
        "(16/3)n^3 exceeds int64 at ~1.2M rows per group, and non-ANSI "
        "BIGINT would wrap silently. Each accumulator converts to double "
        "ONCE before the pinned closing tree (identical conversion on "
        "both engines - determinism preserved to ~3e12 rows per group)."
    ),
)
def q_spearman(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rx = (
        F.lit(2) * F.rank().over(
            Window.partitionBy("l_returnflag").orderBy("l_quantity")
        )
        + F.count(F.lit(1)).over(
            Window.partitionBy("l_returnflag", "l_quantity")
        )
        - F.lit(1)
    ).cast("long")
    ry = (
        F.lit(2) * F.rank().over(
            Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        )
        + F.count(F.lit(1)).over(
            Window.partitionBy("l_returnflag", "l_extendedprice")
        )
        - F.lit(1)
    ).cast("long")
    r = li.select(
        F.col("l_returnflag").alias("g"), rx.alias("rx"), ry.alias("ry")
    )
    rxD = F.col("rx").cast("decimal(19,0)")
    ryD = F.col("ry").cast("decimal(19,0)")
    s = r.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rxD).alias("sx"),
        F.sum(ryD).alias("sy"),
        F.sum(rxD * rxD).alias("sxx"),
        F.sum(ryD * ryD).alias("syy"),
        F.sum(rxD * ryD).alias("sxy"),
    )
    # accumulators run in exact decimal(38,0): sum(rx*rx) ~ (16/3)n^3 blows
    # past int64 at ~1.2M rows per group (round-7 advisory), and non-ANSI
    # BIGINT would wrap silently; decimal is exact to ~1e38 (~3e12 rows per
    # group) and NULLs loudly on overflow. The FINAL cross products
    # (n*sxx, sx*sx ~ n^3..n^4) convert each accumulator to double ONCE —
    # both engines round the same exact integer to the same double, and the
    # remaining pinned tree stays bit-identical
    nD = F.col("n").cast("double")
    sxD, syD = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxD, syyD = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyD = F.col("sxy").cast("double")
    num = nD * sxyD - sxD * syD
    den = F.sqrt((nD * sxxD - sxD * sxD) * (nD * syyD - syD * syD))
    return s.select(
        F.col("g").alias("l_returnflag"),
        "n",
        (num / den).alias("spearman_rho"),
    )


@register(
    "q_spearman_bucketed",
    sql="""
    WITH r AS (
      SELECT l_returnflag AS g,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
               AS rx,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
               AS ry
      FROM lineitem
    ), s AS (
      SELECT g, count(*) AS n,
             sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
             sum(CAST(rx AS HUGEINT) * rx) AS sxx,
             sum(CAST(ry AS HUGEINT) * ry) AS syy,
             sum(CAST(rx AS HUGEINT) * ry) AS sxy
      FROM r GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS spearman_rho
    FROM s
    """,
    doc=(
        "Spearman rho, 100 TB plan (round-6 verdict item 2): identical "
        "semantics and oracle SQL as q_spearman, but the rank maps come "
        "from operators/ranks.py — per-(group, value) counts, range-"
        "bucketed exclusive prefix sums (triangular offsets over the "
        "bounded bucket aggregate), windows only over (group, bucket) — "
        "so NO window partitioned by the 3-value l_returnflag key and no "
        "single-task 200M-row sort at 100x. Exact integer ranks, so the "
        "same oracle validates the scale plan directly; the window form "
        "is kept as q_spearman, the differential twin "
        "(tests/test_ranks.py pins bucketed == exact)."
    ),
)
def q_spearman_bucketed(spark, sf_dir):
    from ..operators.ranks import spearman_bucketed

    li = _t(spark, sf_dir, "lineitem")
    return spearman_bucketed(
        li, "l_quantity", "l_extendedprice", "l_returnflag"
    )


_BENFORD = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}
_BENFORD_SQL_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
) + " END"


@register(
    "q_benford",
    sql=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT d, count(*) AS observed FROM digits GROUP BY d
    ), t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM c)
    SELECT d AS first_digit, observed,
           CAST(n AS DOUBLE) * ({_BENFORD_SQL_CASE}) AS expected,
           (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_SQL_CASE}))
             * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_SQL_CASE}))
             / (CAST(n AS DOUBLE) * ({_BENFORD_SQL_CASE})) AS chi2_part
    FROM c CROSS JOIN t
    """,
    doc=(
        "Benford's-law first-digit screen on order totals (the classic "
        "fabricated/synthetic-data detector): observed first-significant-"
        "digit counts vs n*log10(1+1/d). The nine Benford probabilities "
        "are DRIVER-SIDE LITERALS embedded identically in both engines, "
        "so expected counts and per-digit chi-square contributions are "
        "pinned double trees — engine-exact, no rounding, no log() at "
        "query time. First digit via integer-string truncation (exact)."
    ),
)
def q_benford(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("string"), 1, 1
        ).cast("long").alias("d")
    )
    c = d.groupBy("d").agg(F.count(F.lit(1)).alias("observed"))
    t = c.agg(F.sum("observed").cast("bigint").alias("n"))
    p = F.element_at(
        F.create_map(
            *[x for kv in _BENFORD.items() for x in (F.lit(kv[0]).cast("long"), F.lit(kv[1]))]
        ),
        F.col("d"),
    )
    exp = F.col("n").cast("double") * p
    diff = F.col("observed").cast("double") - exp
    return c.crossJoin(F.broadcast(t)).select(
        F.col("d").alias("first_digit"),
        "observed",
        exp.alias("expected"),
        (diff * diff / exp).alias("chi2_part"),
    )


_QT_PROBS = [i / 10 for i in range(11)]
_PCTB_PROBS = [i / 20 for i in range(1, 21)]


@register(
    "q_quantile_table",
    sql=f"""
    WITH a AS (
      SELECT lang,
             quantile_cont(n_chars, {_QT_PROBS!r}) AS qs
      FROM documents GROUP BY lang
    )
    SELECT lang, unnest({_QT_PROBS!r}) AS p, unnest(qs) AS q
    FROM a
    """,
    doc=(
        "Broadcast-ready CDF artifact: 11-point exact quantile table of "
        "document length per language — ONE tiny percentile-array "
        "aggregate + map-side posexplode. The small table the bucketed "
        "percentile/decile scale paths consume instead of sorting raw "
        "streams; interpolated quantiles proven engine-identical by the "
        "q_quantiles family."
    ),
)
def q_quantile_table(spark, sf_dir):
    from ..operators.profile import quantile_table

    d = _t(spark, sf_dir, "documents")
    return quantile_table(d, "n_chars", "lang", points=11)


@register(
    "q_pct_ref_bucketed",
    sql=f"""
    WITH b AS (
      SELECT quantile_cont(value, {_PCTB_PROBS!r}) AS bs
      FROM events WHERE event_type = 'click' AND value IS NOT NULL
    )
    SELECT event_id, value,
           CAST(len(list_filter(bs, x -> x <= value)) AS DOUBLE) / 20.0
             AS ref_pct_bucketed
    FROM events CROSS JOIN b
    WHERE event_type = 'purchase' AND value IS NOT NULL
    """,
    doc=(
        "Bucketed percentile-vs-reference (the 100 TB path "
        "q_percentile_vs_ref documents): 20 exact-percentile boundaries "
        "from ONE tiny aggregate broadcast to a map-side array-filter "
        "count — the probe stream never shuffles and never sorts; "
        "resolution 1/20. Exact-vs-bucketed agreement pinned in pytest."
    ),
)
def q_pct_ref_bucketed(spark, sf_dir):
    from ..operators.profile import percentile_vs_ref_bucketed

    e = _events(spark, sf_dir)
    probe = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    ref = e.filter(F.col("event_type") == "click")
    return percentile_vs_ref_bucketed(
        probe, ref, "value", ["event_id"], buckets=20
    )


@register(
    "q_cramers_v",
    sql="""
    WITH cells AS (
      SELECT event_type AS r, dayofweek(ts::TIMESTAMP::DATE) AS c,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT r, sum(o) AS rtot FROM cells GROUP BY r),
       ct AS (SELECT c, sum(o) AS ctot FROM cells GROUP BY c),
       n  AS (SELECT CAST(sum(o) AS BIGINT) AS grand FROM cells),
    e AS (
      SELECT COALESCE(cells.o, 0) AS o,
             CAST(rt.rtot * ct.ctot AS DOUBLE) / CAST(n.grand AS DOUBLE)
               AS exp
      FROM rt CROSS JOIN ct
      LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
      CROSS JOIN n
    ), chi AS (
      SELECT round(sum((CAST(o AS DOUBLE) - exp) * (CAST(o AS DOUBLE) - exp)
                       / exp), 6) AS chi2,
             (SELECT count(*) FROM rt) AS n_rows,
             (SELECT count(*) FROM ct) AS n_cols
      FROM e
    )
    SELECT chi2,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           n.grand AS n,
           round(sqrt(chi2 / (CAST(n.grand AS DOUBLE)
                 * least(n_rows - 1, n_cols - 1))), 6) AS cramers_v
    FROM chi CROSS JOIN n
    """,
    doc=(
        "Cramer's V effect size for event_type x weekday: full chi-square "
        "over the densified contingency grid (zero cells included), "
        "normalized by n*min(r-1, c-1) — the 0..1 association strength "
        "the raw chi2 statistic lacks. Chi2 is a float sum (rounded 6dp "
        "both sides BEFORE the derived V, so V's input is identical); "
        "everything after the first count is category-bounded."
    ),
)
def q_cramers_v(spark, sf_dir):
    from ..operators.profile import chi_square_independence

    ev = _events(spark, sf_dir).select(
        "event_type", F.dayofweek(F.col("ts").cast("date")).alias("weekday")
    )
    parts = chi_square_independence(ev, "event_type", "weekday")
    n_row = _events(spark, sf_dir).select(
        F.countDistinct("event_type").alias("n_rows"),
        F.countDistinct(F.dayofweek(F.col("ts").cast("date"))).alias("n_cols"),
        F.count(F.lit(1)).alias("n"),
    )
    chi = parts.agg(F.round(F.sum("chi2_part"), 6).alias("chi2"))
    j = chi.crossJoin(F.broadcast(n_row))
    dof = ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long")
    v = F.round(
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast(
                    "double"
                )
            )
        ),
        6,
    )
    return j.select(
        "chi2", dof.alias("dof"), F.col("n").cast("long").alias("n"), v.alias("cramers_v")
    )


@register(
    "q_lorenz",
    sql="""
    WITH x AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey, count(*) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), r AS (
      SELECT nationkey, cnt,
             row_number() OVER (
               PARTITION BY nationkey ORDER BY cnt, o_custkey
             ) AS i,
             CAST(sum(cnt) OVER (
               PARTITION BY nationkey ORDER BY cnt, o_custkey
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum,
             count(*) OVER (PARTITION BY nationkey) AS n,
             CAST(sum(cnt) OVER (PARTITION BY nationkey) AS BIGINT) AS total
      FROM x
    )
    SELECT nationkey,
           CAST(i AS DOUBLE) / CAST(n AS DOUBLE) AS pop_share,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS mass_share
    FROM r
    WHERE (i * 10) // n <> ((i - 1) * 10) // n
    """,
    doc=(
        "Lorenz curve points per nation (the visual companion of q_gini): "
        "customers ranked by order count under a total order, cumulative "
        "mass share at each population-decile boundary crossing — exact "
        "BIGINT running sums, two IEEE divisions per emitted point, "
        "~10 points per group. All windows share the nation exchange."
    ),
)
def q_lorenz(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_ord = Window.partitionBy("nationkey").orderBy(
        F.col("cnt").asc(), F.col("o_custkey").asc()
    )
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("nationkey")
    r = x.select(
        "nationkey",
        F.row_number().over(w_ord).alias("i"),
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cnt").over(w_all).cast("bigint").alias("total"),
    )
    boundary = F.expr("(i * 10) div n") != F.expr("((i - 1) * 10) div n")
    return r.filter(boundary).select(
        "nationkey",
        (F.col("i").cast("double") / F.col("n").cast("double")).alias(
            "pop_share"
        ),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "mass_share"
        ),
    )


@register(
    "q_hhi",
    sql="""
    WITH x AS (
      SELECT l_returnflag, l_suppkey, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), s AS (
      SELECT l_returnflag,
             CAST(sum(cnt * cnt) AS BIGINT) AS sq,
             CAST(sum(cnt) AS BIGINT) AS total,
             count(*) AS n_suppliers
      FROM x GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_suppliers,
           CAST(sq AS DOUBLE)
             / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi
    FROM s
    """,
    doc=(
        "Herfindahl-Hirschman concentration index per return flag (how "
        "concentrated is volume across suppliers): HHI = sum(share^2) "
        "computed as sum(cnt^2)/total^2 — exact BIGINT accumulators, ONE "
        "division, engine-exact. The square-law companion of q_gini "
        "(HHI weights large shares harder); two grouped counts, no "
        "window."
    ),
)
def q_hhi(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    x = li.groupBy("l_returnflag", "l_suppkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = x.groupBy("l_returnflag").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sq"),
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return s.select(
        "l_returnflag",
        "n_suppliers",
        (
            F.col("sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("hhi"),
    )


@register(
    "q_coverage_topk",
    sql="""
    WITH x AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
      FROM documents GROUP BY source
    ), r AS (
      SELECT source, mass,
             row_number() OVER (ORDER BY mass DESC, source) AS k,
             CAST(sum(mass) OVER (
               ORDER BY mass DESC, source ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum,
             CAST(sum(mass) OVER () AS BIGINT) AS total
      FROM x
    )
    SELECT k, source, mass,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
    FROM r
    """,
    doc=(
        "Coverage curve: how much of the corpus' character mass the top-k "
        "sources account for (the 'how many sources until 90%' planning "
        "question) — descending total-ordered running share over the "
        "|sources|-row aggregate; exact BIGINT sums, one division per "
        "point."
    ),
)
def q_coverage_topk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    x = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    )
    w_ord = Window.orderBy(F.col("mass").desc(), F.col("source").asc())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    return x.select(
        F.row_number().over(w_ord).alias("k"),
        "source",
        "mass",
        (
            F.sum("mass").over(w_cum).cast("double")
            / F.sum("mass").over(w_all).cast("double")
        ).alias("coverage"),
    )


@register(
    "q_fk_check",
    sql="""
    SELECT 'lineitem.l_suppkey -> supplier' AS fk,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders', count(*),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey -> customer', count(*),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc=(
        "Referential-integrity report: orphan counts for the three fact-"
        "dimension foreign keys via left-join null probes — the "
        "constraint check a schemaless lake never enforces at write time. "
        "Exact integer counts; dimension sides broadcast under AQE."
    ),
)
def q_fk_check(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")

    def probe(fact, dim, fk_col, dim_col, label):
        j = fact.join(dim, fact[fk_col] == dim[dim_col], "left")
        return j.agg(
            F.lit(label).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(dim[dim_col].isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    return (
        probe(li.select("l_suppkey"), s, "l_suppkey", "s_suppkey",
              "lineitem.l_suppkey -> supplier")
        .unionByName(
            probe(li.select("l_orderkey"), o.select("o_orderkey"),
                  "l_orderkey", "o_orderkey",
                  "lineitem.l_orderkey -> orders")
        )
        .unionByName(
            probe(o.select("o_custkey"), c, "o_custkey", "c_custkey",
                  "orders.o_custkey -> customer")
        )
    )


@register(
    "q_pk_check",
    sql="""
    SELECT 'orders.o_orderkey' AS pk, count(*) AS n_rows,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_rows
    FROM orders
    UNION ALL
    SELECT 'customer.c_custkey', count(*),
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)', count(*),
           CAST(count(*) - count(DISTINCT l_orderkey * 100 + l_linenumber)
                AS BIGINT)
    FROM lineitem
    """,
    doc=(
        "Primary-key uniqueness report (the write-time constraint a "
        "schemaless lake never enforces): duplicate-row counts for two "
        "scalar keys and one composite key (packed into one BIGINT — "
        "l_linenumber < 100 by TPC-H construction). Exact counts, "
        "single-pass distinct aggregates."
    ),
)
def q_pk_check(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def row(df, expr, label):
        return df.agg(
            F.lit(label).alias("pk"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.countDistinct(expr))
            .cast("bigint")
            .alias("n_dup_rows"),
        ).select("pk", "n_rows", "n_dup_rows")

    return (
        row(o, F.col("o_orderkey"), "orders.o_orderkey")
        .unionByName(row(c, F.col("c_custkey"), "customer.c_custkey"))
        .unionByName(
            row(
                li,
                F.col("l_orderkey") * 100 + F.col("l_linenumber"),
                "lineitem.(l_orderkey,l_linenumber)",
            )
        )
    )


@register(
    "q_basket_sizes",
    sql="""
    WITH b AS (
      SELECT l_orderkey, count(*) AS basket_size
      FROM lineitem GROUP BY l_orderkey
    ), d AS (
      SELECT basket_size, CAST(count(*) AS BIGINT) AS n_orders
      FROM b GROUP BY basket_size
    ), t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM d)
    SELECT basket_size, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM d CROSS JOIN t
    """,
    doc=(
        "Basket-size distribution (count-of-counts): lineitems per order, "
        "then orders per basket size with share — two grouped counts and "
        "one broadcast total; exact integers, one division."
    ),
)
def q_basket_sizes(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("basket_size"))
    d = b.groupBy("basket_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    t = d.agg(F.sum("n_orders").cast("bigint").alias("total"))
    return d.crossJoin(F.broadcast(t)).select(
        "basket_size",
        "n_orders",
        (F.col("n_orders").cast("double") / F.col("total").cast("double")).alias(
            "share"
        ),
    )


@register(
    "q_repeat_rate",
    sql="""
    WITH m AS (
      SELECT strftime(o_orderdate::DATE, '%Y-%m') AS month, o_custkey,
             count(*) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT month,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS repeat_rate
    FROM m GROUP BY month
    """,
    doc=(
        "Monthly repeat-customer rate (customers with 2+ orders in the "
        "month over active customers) — two grouped counts sharing the "
        "(month, customer) exchange; exact integers, one division."
    ),
)
def q_repeat_rate(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias(
            "month"
        ),
        "o_custkey",
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return m.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        (
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("repeat_rate"),
    )
