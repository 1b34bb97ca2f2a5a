"""Privacy-hygiene operators for training-data release (extension surface;
the reference has no privacy stage — its nearest neighbour is NULL-column
filtering, ``filtering/filter.py:106-148``, and our PII scrubber
``text.redact_pii``).

k-anonymity is the standard pre-release gate: any combination of
quasi-identifier values shared by fewer than k rows is re-identifying and
must be suppressed (or generalized upstream). Both operators are one
grouped count over the quasi-identifier key — a single shuffle on the
column subset, never on payloads — followed by a broadcast-or-shuffle join
back; Catalyst picks broadcast when the violating-groups side is small,
which at 100 TB it is (violators are by definition the rare groups).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Per-equivalence-class audit: (quasi-identifier values, class size,
    whether the class violates k). NULL counts as a value (SQL GROUP BY
    semantics on both engines)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < k).alias("violates_k"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Drop every row whose quasi-identifier equivalence class has fewer
    than k members — the suppression route to a k-anonymous release. One
    window count over the quasi-key (single shuffle); rows with NULL quasi
    values form their own class, matching GROUP BY semantics."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in quasi_cols]))
    return df.withColumn("__cs__", w).filter(F.col("__cs__") >= k).drop("__cs__")


def _laplace_noise(key, scale: float, seed: int, family: str):
    """Deterministic Laplace(scale) noise derived from a hash of ``key``:
    u ~ Uniform(-1/2, 1/2) from the hash's mantissa bits, then the
    inverse CDF -scale*sign(u)*ln(1-2|u|). ``family='md5'`` makes the
    draw replayable in any engine with md5 (the sampling rank-twin
    discipline); 'xxhash64' is the cheaper JVM path.

    This is SEEDED noise — reproducible by anyone who knows (seed, key),
    which real DP release must not allow. See :func:`dp_noisy_counts`
    for where the trust boundary sits."""
    if family == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", key, F.lit(str(seed)))), 1, 13),
            16,
            10,
        ).cast("double")
        u = h / F.lit(float(16**13)) - F.lit(0.5)
    else:
        h = F.shiftrightunsigned(F.xxhash64(key, F.lit(seed)), 11).cast("double")
        u = h / F.lit(float(1 << 53)) - F.lit(0.5)
    # clamp |u| away from 1/2 so ln(1-2|u|) can't hit -inf on the one
    # hash value that lands exactly on the boundary
    au = F.least(F.abs(u), F.lit(0.499999999))
    return -F.lit(scale) * F.signum(u) * F.log(F.lit(1.0) - 2.0 * au)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    value_col: str | None = None,
    clip: float = 1.0,
    seed: int = 42,
    hash_family: str = "xxhash64",
    domain: DataFrame | None = None,
) -> DataFrame:
    """Epsilon-differentially-private histogram release via the Laplace
    mechanism (Dwork et al. 2006, "Calibrating Noise to Sensitivity"):
    per group, count + Laplace(1/eps) noise — and, with ``value_col``, a
    sum of values CLIPPED to [0, clip] plus Laplace(clip/eps) noise
    (clipping bounds each row's sensitivity, the standard
    contribution-bounding step). Epsilon splits evenly across the
    released statistics (sequential composition: eps/2 each when both
    are released). Output: (group_cols..., noisy_count double
    [, noisy_sum double]), rounded 4dp so cross-engine ``ln`` ULP noise
    cannot leak into comparisons.

    Plan shape: ONE grouped aggregation (map-side partials — the clip is
    a row-local least/greatest before the sum), then expression-only
    noise at the GROUP grain — no second pass, no per-row noise rows.

    Noise is SEEDED (hash of the group key + seed): deterministic,
    testable, and oracle-replayable — which also means anyone holding
    the seed can subtract the noise exactly. That is the correct shape
    for the utility/accounting half of a DP pipeline (clip -> aggregate
    -> noise calibrated to the right sensitivity), but a real release
    must draw the noise from a CSPRNG inside the trust boundary at
    publish time — swap the seed for publish-time entropy held by the
    curator; the plan is unchanged. With ``domain`` (a DataFrame of
    PUBLIC group keys, same columns as ``group_cols``) the histogram is
    densified before noising — every public key gets a released noisy
    row even at true count 0, so absence itself leaks nothing; keys in
    ``df`` but NOT in the public domain are DROPPED from the release (an
    unexpected private key appearing in the output would itself leak).
    Without ``domain``, groups absent from ``df`` are not released (the
    known-domain histogram caveat)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}"
        )
    n_stats = 2 if value_col is not None else 1
    eps_each = epsilon / n_stats
    aggs = [F.count(F.lit(1)).cast("double").alias("__n__")]
    if value_col is not None:
        clipped = F.least(
            F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
            F.lit(float(clip)),
        )
        aggs.append(F.sum(clipped).alias("__s__"))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
    if domain is not None:
        if sorted(domain.columns) != sorted(group_cols):
            raise ValueError(
                f"domain columns {sorted(domain.columns)} must equal "
                f"group_cols {sorted(group_cols)}"
            )
        # densify over the PUBLIC domain: inner-drop private-only keys,
        # zero-fill public keys absent from df. The domain is the small
        # side by definition (a released histogram's key space) — the
        # join broadcasts; the aggregated side is already group-grain.
        g = (
            domain.dropDuplicates(list(group_cols))
            .join(g, list(group_cols), "left")
            .fillna(0.0, subset=[c for c in ("__n__", "__s__") if c in g.columns])
        )
    key = F.concat_ws("", *[F.col(c).cast("string") for c in group_cols])
    cols = [
        *group_cols,
        F.round(
            F.col("__n__")
            + _laplace_noise(
                F.concat(key, F.lit("|count")), 1.0 / eps_each, seed, hash_family
            ),
            4,
        ).alias("noisy_count"),
    ]
    if value_col is not None:
        cols.append(
            F.round(
                F.col("__s__")
                + _laplace_noise(
                    F.concat(key, F.lit("|sum")),
                    float(clip) / eps_each,
                    seed,
                    hash_family,
                ),
                4,
            ).alias("noisy_sum")
        )
    return g.select(*cols)


def dp_error_bound(
    epsilon: float,
    n_stats: int = 1,
    sensitivity: float = 1.0,
    confidence: float = 0.95,
) -> float:
    """Additive error bound of one released statistic under
    :func:`dp_noisy_counts`'s budget split: with scale
    b = sensitivity/(epsilon/n_stats), Laplace tail gives
    P(|noise| > b*ln(1/delta)) = delta, so the bound at the given
    confidence is b*ln(1/(1-confidence)). Pure accounting — use it to
    size epsilon for a target accuracy BEFORE spending budget (e.g.
    counts accurate to +/-10 at 95%: epsilon >= n_stats*ln(20)/10)."""
    import math

    if not (0 < confidence < 1):
        raise ValueError(f"confidence must be in (0,1), got {confidence}")
    if epsilon <= 0 or sensitivity <= 0 or n_stats < 1:
        raise ValueError("epsilon and sensitivity must be > 0, n_stats >= 1")
    b = sensitivity / (epsilon / n_stats)
    return b * math.log(1.0 / (1.0 - confidence))
