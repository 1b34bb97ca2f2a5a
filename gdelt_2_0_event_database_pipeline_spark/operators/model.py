"""Model-based quality scoring (SURVEY.md §2.10 X4 extension).

The modern pretraining-data pipeline filters with a *learned* classifier
(fastText in CCNet/LLaMA, DCLM's fastText quality model, FineWeb-Edu's
regression scorer), not only hand-written heuristics. This module is that
stage, Spark-first and dependency-free:

- features: the hashing-trick document vectors from
  :func:`..operators.text.hashed_feature_vector` — signed token counts,
  deterministic, no vocabulary to ship;
- fit: closed-form ridge regression on ±1 labels over a BOUNDED
  hash-ranked sample (same driver-side discipline as the IVF codebook fit —
  a k×dim numpy solve, never a full-corpus collect);
- score: a pure-Column dot product against broadcast-literal weights.

Weights are quantized to integers (``weight_scale``): every product
count × int-weight and their sum stay exactly representable as doubles, so
the fold is order-independent and an external SQL oracle reproduces scores
bit-identically — the same rational-arithmetic trick the tf-idf and
collocation operators use.

No reference counterpart (the reference has no model stage); the quality
*heuristic* twin is ``text.quality_score``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import hashed_feature_vector


def fit_linear_quality_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    dim: int = 64,
    sample_n: int = 10_000,
    hash_family: str = "xxhash64",
    l2: float = 1.0,
    weight_scale: int = 1_000_000,
) -> list[int]:
    """Fit a linear quality classifier and return integer-quantized weights.

    ``label_col`` must be numeric with positives > 0 and negatives <= 0
    (coerced to ±1). The sample is hash-ranked by ``md5(id)`` — deterministic
    and partitioning-independent — and capped at ``sample_n`` rows, so the
    driver-side work is a bounded ``sample_n × dim`` ridge solve regardless
    of corpus size. Returns ``dim`` weights scaled by ``weight_scale``,
    ready for :func:`score_linear_model` (Spark) or a
    ``list_dot_product(v, weights) / scale`` oracle (SQL).
    """
    import numpy as np

    labeled = hashed_feature_vector(
        df.select(id_col, text_col), id_col=id_col, text_col=text_col,
        dim=dim, hash_family=hash_family,
    ).join(df.select(id_col, label_col), id_col)
    rows = (
        labeled.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("fit_linear_quality_model: empty training sample")
    rows.sort(key=lambda r: r[id_col])
    X = np.array([r["vector"] for r in rows], dtype="float64")
    y = np.array([1.0 if r[label_col] > 0 else -1.0 for r in rows])
    w = np.linalg.solve(X.T @ X + l2 * np.eye(dim), X.T @ y)
    return [int(round(x * weight_scale)) for x in w]


def score_linear_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_scaled: Sequence[int],
    *,
    hash_family: str = "xxhash64",
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Score every document with a linear model over hashing-trick features:
    ``score = Σ count_bucket × w_bucket / weight_scale``.

    Pure Column algebra end-to-end — the only Python is the weight literals
    baked into the plan (≤ a few KiB, effectively a broadcast). Documents
    with no tokens score exactly 0.0 via the left join back to the id set.
    Products and their sum are integer-exact in doubles (counts ≤ ~1e3,
    |w| ≤ weight_scale), so scores are bit-identical on any engine.

    Returns (id_col, score).
    """
    dim = len(weights_scaled)
    vec = hashed_feature_vector(
        df.select(id_col, text_col), id_col=id_col, text_col=text_col,
        dim=dim, hash_family=hash_family,
    )
    wlit = F.array(*[F.lit(int(w)).cast("double") for w in weights_scaled])
    scored = vec.select(
        F.col(id_col),
        (
            F.aggregate(
                F.zip_with(F.col("vector"), wlit, lambda v, w: v * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(weight_scale))
        ).alias("score"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce("score", F.lit(0.0)).alias("score"))
    )
