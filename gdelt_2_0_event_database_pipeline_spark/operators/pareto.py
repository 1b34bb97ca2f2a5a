"""2D skyline (Pareto frontier) — keep the rows no other row dominates.

Dominance (minimize ``x``, maximize ``y``): ``p`` dominates ``q`` iff
``p.x <= q.x AND p.y >= q.y`` with at least one strict. The classic
multi-criteria shortlist ("earliest AND biggest", "cheapest AND best
quality") that SQL engines answer with a quadratic NOT EXISTS self-join.

Scale design — two phases, no all-pairs join:

1. **Bucket prune (distributed).** Bucket ``x`` into ``n_buckets``
   equal-width cells (bounds from one 1-row min/max aggregate). Per
   bucket, take ``max(y)``; the running best-so-far of STRICTLY EARLIER
   buckets is a prefix max over an ``n_buckets``-row frame, broadcast
   back. Any row with ``y <= prefix_max`` is dominated by that earlier
   bucket's maximizer (which has strictly smaller ``x``) and dies here —
   on sorted-ish real data this eliminates ~all rows, map-side.
2. **Exact window pass (survivors only).** One global window ordered by
   ``(x asc)``: a survivor is dominated iff
   ``max(y) over x' < x >= y`` or ``max(y) over x' <= x > y`` (the two
   range frames split the tie cases exactly). The global sort is bounded
   by the phase-1 survivor count — documented as the intentional small
   single-partition step, the same stance as the top-k plans.

The frontier itself is at most ``|distinct x|`` rows and is returned
exactly (ties on both coordinates all survive — none dominates another).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Rows on the (minimize ``x_col``, maximize ``y_col``) Pareto
    frontier. NULL coordinates are excluded (dominance is undefined).
    """
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast("double")

    bounds = base.agg(
        F.min(x).alias("__xlo__"), F.max(x).alias("__xhi__")
    )
    # bucket id in [0, n_buckets-1]; degenerate all-equal-x domain -> bucket 0
    span = F.col("__xhi__") - F.col("__xlo__")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("__xlo__")) / span * n_buckets),
            F.lit(n_buckets - 1),
        )
    ).cast("long")

    with_b = base.crossJoin(F.broadcast(bounds)).withColumn("__b__", bucket)
    bmax = with_b.groupBy("__b__").agg(F.max(F.col(y_col)).alias("__by__"))
    w_prev = (
        Window.orderBy("__b__")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prefix = bmax.select(
        "__b__", F.max("__by__").over(w_prev).alias("__prevmax__")
    )
    survivors = (
        with_b.join(F.broadcast(prefix), "__b__")
        .filter(
            F.col("__prevmax__").isNull()
            | (F.col(y_col) > F.col("__prevmax__"))
        )
        .drop("__b__", "__prevmax__", "__xlo__", "__xhi__")
    )

    yv = F.col(y_col).cast("double")
    # "strictly smaller x" as a range frame needs an exact integer key
    # (a fractional range offset on raw doubles mishandles adjacent
    # values): dense-rank x, then frame on the rank.
    xr = F.dense_rank().over(Window.orderBy(x))
    ranked = survivors.withColumn("__xr__", xr)
    w_lt = (
        Window.orderBy("__xr__").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.orderBy("__xr__").rangeBetween(Window.unboundedPreceding, 0)
    )
    max_lt = F.max(yv).over(w_lt)
    max_le = F.max(yv).over(w_le)
    dominated = (
        (max_lt.isNotNull() & (max_lt >= yv)) | (max_le > yv)
    )
    # window expressions can't sit in a WHERE — project, then filter
    return (
        ranked.withColumn("__dom__", dominated)
        .filter(~F.col("__dom__"))
        .drop("__xr__", "__dom__")
    )
