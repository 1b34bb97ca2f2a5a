"""Scale-technique query plans: the skew/multimodal operators as registry
entries so the driver exercises them (SURVEY.md §4 scale paths + §2.10 X6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import make_media_df, media_stats
from ..operators.skew import salted_group_agg
from .registry import register
from .relational import _li


@register(
    "q_salted_agg",
    sql="""
    SELECT l_suppkey,
           round(sum(l_quantity), 2)  AS total_qty,
           count(*)                   AS n,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="Two-phase salted aggregation (hot-key safe) — must equal the plain GROUP BY bit-for-bit on counts and to rounding on double sums.",
)
def q_salted_agg(spark, sf_dir):
    li = _li(spark, sf_dir)
    out = salted_group_agg(
        li,
        ["l_suppkey"],
        {
            "total_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
        num_salts=8,
    )
    return out.select(
        "l_suppkey",
        F.round("total_qty", 2).alias("total_qty"),
        "n",
        F.round("max_price", 2).alias("max_price"),
    )


@register(
    "q_media_stats",
    sql=None,  # media table is engine-synthesized (no oracle view); shapes in tests/test_multimodal.py
    doc="Multimodal metadata rollup (X6): binary payload column pruned at scan, metadata-only agg.",
)
def q_media_stats(spark, sf_dir):
    media = make_media_df(spark, n=200)
    return media_stats(media)
