"""Training-set assembly operators: the stages between a cleaned corpus and
training batches — fixed-size chunking, deterministic dataset splits, and
linear sequence packing. Extension surface (SURVEY.md §2.10 spirit): the
reference has no text pipeline at all; these are the pre-training staples
that complement dedup/quality/decontamination in ``dedup.py`` / ``text.py``.

All three are pure DataFrame transforms with engine-independent outputs, so
each carries a full DuckDB oracle twin in the registry:

- ``chunk_documents``  — token-window chunks with optional overlap; chunk
                         starts are a ``sequence`` explode, the chunk text a
                         ``slice`` of the token array. Map-only (no shuffle).
- ``assign_split``     — train/val/test by thresholding a deterministic
                         content hash (the oracle-able rolling fingerprint —
                         splits must survive re-runs and repartitions, which
                         rules out ``rand``).
- ``pack_linear``      — concatenate-then-cut packing: running token offsets
                         per shard, pack id = offset div budget. One window
                         over one shuffle per shard; shards keep the window
                         from going global at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, token_count, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size token windows (stride =
    ``chunk_tokens - overlap``). Returns (id, chunk_start, chunk_text,
    n_tokens); every document yields at least one (possibly empty) chunk so
    no input row silently disappears.

    Shape: tokens once per row, explode only the (small) start offsets, and
    slice the carried token array — map-only, chunk rows never shuffle. For
    pathological single-document gigabyte texts, chunk via the posexplode +
    window-lead form instead (see ``text.ngram_contamination``).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_tokens ({chunk_tokens})")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks__"),
            F.explode(starts).alias("chunk_start"),
        )
        .select(
            id_col,
            "chunk_start",
            F.array_join(
                F.slice(F.col("__toks__"), F.col("chunk_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size("__toks__") - F.col("chunk_start"), F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def assign_split(
    df: DataFrame,
    text_col: str = "text",
    splits: dict[str, float] | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = content fingerprint
    mod ``buckets``, thresholded by cumulative split weights. Content-keyed
    (not id-keyed) so exact duplicates always land in the same split — the
    leakage-safe choice — and reproducible across runs, partitionings, and
    engines (the fingerprint is the oracle-able rolling hash, not xxhash).
    Adds a ``split`` column."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {splits}")
    bucket = fingerprint(F.col(text_col)) % buckets
    expr: Column | None = None
    cum = 0.0
    *head, (last_name, _) = list(splits.items())
    for name, w in head:
        cum += w
        cond = bucket < int(round(cum * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (expr.otherwise(F.lit(last_name))
            if expr is not None else F.lit(last_name))
    return df.withColumn("split", expr)


def pack_first_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_col: Column | str | None = None,
    n_tokens_col: Column | str | None = None,
    budget: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """First-fit-decreasing whole-document packing: per shard, documents are
    sorted by descending token count (id tiebreak) and placed into the first
    bin with room; a document never straddles two packs — the loader shape
    for SFT/eval data where documents must stay intact (``pack_linear`` is
    the cut-anywhere pre-training variant). FFD is the classic 11/9·OPT+1
    bin-packing heuristic. Documents longer than ``budget`` get singleton
    bins and ``oversize=true``.

    Bin state is inherently sequential, so this is the sanctioned Python
    escape hatch: Arrow-batched ``applyInPandas`` grouped by shard — one
    shuffle on the shard key, plain vectorizable pandas inside, and shard
    granularity bounds per-group state exactly like a 1000-executor packing
    job must. The first-fit placement itself runs over a segment tree of
    per-bin remaining capacities (descend to the LEFTMOST bin that fits) —
    O(log bins) per document, identical placements to the naive linear scan
    it replaced (which was O(bins) per document: quadratic per shard once
    shards hold many documents). Output: (id, shard, n_tokens, pack_id,
    oversize), one row per input document. Deterministic on any
    partitioning.
    """
    import pandas as pd

    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str)
        else n_tokens_col if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    shard = (
        F.col(shard_col) if isinstance(shard_col, str)
        else shard_col if shard_col is not None
        else F.lit(0)
    )
    slim = df.select(
        F.col(id_col).cast("long").alias("id"),
        shard.cast("long").alias("shard"),
        nt.cast("long").alias("n_tokens"),
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        # segment tree over remaining capacities: tree[cap+i] = remaining
        # space of bin i; internal nodes hold subtree max. Leftmost-fit
        # descent preserves exact first-fit semantics in O(log bins).
        # Unused leaves and oversize bins hold -1 (not 0) so a zero-token
        # document can never match them.
        cap = 1
        tree = [-1, -1]
        n_bins = 0

        def _grow() -> None:
            nonlocal cap, tree
            old_cap, old = cap, tree
            cap *= 2
            tree = [-1] * (2 * cap)
            tree[cap : cap + old_cap] = old[old_cap : 2 * old_cap]
            for i in range(cap - 1, 0, -1):
                tree[i] = max(tree[2 * i], tree[2 * i + 1])

        def _set(i: int, rem: int) -> None:
            i += cap
            tree[i] = rem
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        def _new_bin(rem: int) -> int:
            nonlocal n_bins
            if n_bins == cap:
                _grow()
            b = n_bins
            n_bins += 1
            _set(b, rem)
            return b

        pack_ids, oversize = [], []
        for t in pdf.itertuples(index=False):
            n = t.n_tokens
            if n > budget:
                # oversize docs get singleton bins that never accept more
                pack_ids.append(_new_bin(-1))
                oversize.append(True)
                continue
            oversize.append(False)
            if tree[1] < n:  # no bin fits
                pack_ids.append(_new_bin(budget - n))
                continue
            i = 1
            while i < cap:  # descend to leftmost leaf with rem >= n
                i = 2 * i if tree[2 * i] >= n else 2 * i + 1
            b = i - cap
            _set(b, tree[i] - n)
            pack_ids.append(b)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    out = slim.groupBy("shard").applyInPandas(
        _ffd, "id long, shard long, n_tokens long, pack_id long, oversize boolean"
    )
    return out.withColumnRenamed("id", id_col)


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    buckets: int = 10_000,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic training-mixture downsampling: source ``s`` keeps a
    ``rates[s]`` fraction of its documents (sources absent from ``rates``
    keep ``default_rate``) — the standard mixture-weighting stage between a
    cleaned corpus and training (up-weight wiki, down-weight crawl, drop a
    source with rate 0).

    Selection is content-keyed (fingerprint bucket < rate·buckets), like
    :func:`assign_split`: reproducible across runs, partitionings, and
    engines; exact duplicates are kept-or-dropped together; and a document's
    fate never depends on which executor saw it. Map-only — the filter runs
    inside the scan stage, composable with quality/dedup filters in one
    pass. Rate granularity is 1/buckets.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    bucket = fingerprint(F.col(text_col)) % buckets
    in_rates = F.col(source_col).isin(list(rates))
    # NULL source falls into the default-rate bucket (isin yields NULL, not
    # False, for NULL — spelled out so such rows aren't silently dropped)
    keep = F.when(
        in_rates.isNull() | ~in_rates,
        bucket < int(round(default_rate * buckets)),
    )
    for s, r in rates.items():
        keep = keep.when(F.col(source_col) == s, bucket < int(round(r * buckets)))
    return df.filter(keep)


def select_token_budget(
    df: DataFrame,
    budget: int,
    score: Column,
    id_col: str = "doc_id",
    n_tokens_col: Column | str | None = None,
    text_col: str = "text",
    n_buckets: int = 256,
    score_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Token-budget corpus selection: rank documents by (``score`` DESC,
    ``id_col`` ASC) and keep the maximal prefix whose cumulative token count
    stays ≤ ``budget`` — the standard curation step between a scored corpus
    and a fixed training-compute budget ("take the best N tokens, not the
    best N documents"). Adds ``n_tokens`` and ``cum_tokens`` (global
    cumulative count, including the row itself).

    A naive ``sum() OVER (ORDER BY score)`` plans as a single-task global
    sort. Scale-safe shape (same machinery as ``sample_systematic``):
    range-bucket on score (descending — monotone ``floor((hi−s)/width)``),
    per-bucket token sums → cumulative offsets via a triangular self-join
    over the ≤``n_buckets``-row sums aggregate, then one per-bucket window
    (parallel sorts) adds the intra-bucket running sum. No ``Exchange
    SinglePartition`` anywhere in the returned plan. Equal scores sort by
    id within a bucket and always share a bucket, so the global order is
    total and engine-reproducible.

    ``score_bounds``: pass the score's known range (quality scores are
    [0, 1] by construction, cosine is [-1, 1]) to skip the bounds
    aggregate — that removes the operator's only driver action AND a full
    extra evaluation of the score expression over the corpus; for a
    regex-heavy quality score that second pass costs as much as the
    selection itself. Bounds only shape the buckets (clamped on both
    ends), never correctness. Without it, one bounded 1-row driver action
    computes exact bounds.
    """
    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str)
        else n_tokens_col if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    s = df.withColumn("__nt__", nt.cast("long")).withColumn("__score__", score)
    if score_bounds is not None:
        lo, hi = float(score_bounds[0]), float(score_bounds[1])
        if not lo <= hi:
            raise ValueError(f"score_bounds must be (lo, hi) with lo <= hi, got {score_bounds}")
    else:
        bounds = s.agg(
            F.min("__score__").alias("lo"), F.max("__score__").alias("hi")
        ).first()
        if bounds is None or bounds.lo is None:
            return (
                s.withColumnRenamed("__nt__", "n_tokens")
                .withColumn("cum_tokens", F.lit(0).cast("long"))
                .drop("__score__")
                .filter(F.lit(False))
            )
        lo, hi = float(bounds.lo), float(bounds.hi)
    width = (hi - lo) / n_buckets or 1.0
    # clamped on BOTH ends: correctness never depends on the bounds being
    # exact (out-of-range scores just land in the end buckets), which keeps
    # the door open to estimating bounds from a sample at extreme scale
    # instead of a full score pass
    bucket = F.greatest(
        F.least(
            F.floor((F.lit(hi) - F.col("__score__")) / F.lit(width)),
            F.lit(n_buckets - 1),
        ),
        F.lit(0),
    ).cast("int")
    with_bkt = s.withColumn("__bkt__", bucket)

    sums = with_bkt.groupBy("__bkt__").agg(F.sum("__nt__").alias("__bsum__"))
    prior = sums.select(
        F.col("__bkt__").alias("__pb__"), F.col("__bsum__").alias("__ps__")
    )
    offsets = (
        sums.join(F.broadcast(prior), F.col("__pb__") < F.col("__bkt__"), "left")
        .groupBy("__bkt__")
        .agg(F.coalesce(F.sum("__ps__"), F.lit(0)).alias("__off__"))
    )

    w = (
        Window.partitionBy("__bkt__")
        .orderBy(F.col("__score__").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_bkt.join(F.broadcast(offsets), "__bkt__")
        .withColumn("cum_tokens", F.sum("__nt__").over(w) + F.col("__off__"))
        .filter(F.col("cum_tokens") <= budget)
        .withColumnRenamed("__nt__", "n_tokens")
        .drop("__bkt__", "__off__", "__score__")
    )


def select_token_budget_per_group(
    df: DataFrame,
    budget_per_group: int,
    group_col: str,
    score: Column,
    id_col: str = "doc_id",
    n_tokens_col: Column | str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-budget selection: within each ``group_col`` value
    (language, source, domain…), keep the best documents by ``score`` until
    that group's budget fills — the balanced-mixture form of
    :func:`select_token_budget` (global prefix selection would let one
    dominant language eat the entire budget).

    Unlike the global variant this needs NO bucketing machinery: the
    cumulative sum partitions by group, so it is one grouped window over
    one shuffle on ``group_col`` — grouped windows are exactly what Spark
    parallelizes natively. Per-group skew is bounded by the budget itself
    (a group's window stops mattering past ``budget_per_group`` tokens,
    and AQE splits oversized partitions). Adds ``n_tokens`` and
    ``cum_tokens`` (cumulative within the group).
    """
    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str)
        else n_tokens_col if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    s = df.withColumn("__nt__", nt.cast("long")).withColumn("__score__", score)
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__score__").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        s.withColumn("cum_tokens", F.sum("__nt__").over(w))
        .filter(F.col("cum_tokens") <= budget_per_group)
        .withColumnRenamed("__nt__", "n_tokens")
        .drop("__score__")
    )


def pack_linear(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_col: Column | str | None = None,
    n_tokens_col: Column | str | None = None,
    budget: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-then-cut sequence packing: documents are laid end-to-end
    in ``id_col`` order and cut every ``budget`` tokens; ``pack_id`` =
    floor(start_offset / budget) — the standard pre-training packing
    semantics (a document may straddle two packs; the trainer's loader cuts
    at token granularity downstream).

    One running-sum window per shard over one shuffle. ``shard_col`` keeps
    the sort from going global: packs are independent per shard by
    construction, which is exactly how a 1000-executor packing job must run
    anyway. Adds (shard, start_offset, pack_id)."""
    nt = (
        F.col(n_tokens_col) if isinstance(n_tokens_col, str)
        else n_tokens_col if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    shard = (
        F.col(shard_col) if isinstance(shard_col, str)
        else shard_col if shard_col is not None
        else F.lit(0)
    )
    out = df.withColumn("__nt__", nt).withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("__cum__", F.sum("__nt__").over(w))
        .withColumn("start_offset", F.col("__cum__") - F.col("__nt__"))
        .withColumn("pack_id", (F.col("start_offset") / budget).cast("long"))
        .drop("__cum__", "__nt__")
    )


def class_balance(
    df: DataFrame,
    class_col: str,
    id_col: str,
) -> DataFrame:
    """Exact-parity oversampling: replicate every class's rows so each
    class totals EXACTLY the majority class's count — the deterministic
    fix for class imbalance before fine-tune/classifier training (random
    oversampling is irreproducible; quota sampling changes the majority).

    Replication plan: with majority count ``m`` and class count ``c``,
    every row gets ``m // c`` copies and the first ``m % c`` rows of the
    class (ordered by ``id_col``) get one extra — sum is exactly ``m`` per
    class. Output adds ``copy_idx`` (1..copies per source row), so
    downstream shuffles can decorrelate the replicas.

    Plan: one grouped count (tiny — |classes| rows) broadcast back, one
    rank window on the class key for the extra-copy threshold, then a
    map-side ``explode(sequence(...))``. The window shuffle keys on the
    class column — skewed by class size at extreme scale; swap the rank
    threshold for a hash-rank cut (``xxhash64(id) % c < m % c`` is
    approximate-parity) when a single class exceeds a task's sort budget.
    """
    cnt = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("__c__"))
    mx = cnt.agg(F.max("__c__").alias("__m__"))
    w = Window.partitionBy(class_col).orderBy(F.col(id_col).asc())
    ranked = (
        df.select(class_col, id_col)
        .withColumn("__i__", F.row_number().over(w))
        .join(F.broadcast(cnt), class_col)
        .crossJoin(F.broadcast(mx))
    )
    # integer `div`, not float division + truncate: a float quotient one ulp
    # below an exact integer would truncate to k-1 at large counts
    copies = F.expr("__m__ div __c__") + F.when(
        F.col("__i__") <= F.col("__m__") % F.col("__c__"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ranked.withColumn("__copies__", copies)
        .select(
            id_col,
            class_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies__"))).alias(
                "copy_idx"
            ),
        )
    )


def select_top_p(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    id_col: str,
    p: float,
) -> DataFrame:
    """Nucleus (top-p) curation per group: keep the highest-score rows
    until their cumulative score mass reaches fraction ``p`` of the
    group's total — the budget rule that adapts to each group's score
    distribution (a flat group keeps many rows, a spiky one few), unlike
    fixed top-k. The row that crosses the threshold is included, so the
    kept mass is always >= p (and the smallest superset achieving it).

    Requires non-negative integer-ish scores (token counts, char counts,
    vote counts) — cumulative and total sums stay exact, and the single
    threshold comparison ``(cum - score) < p * total`` is one pinned
    double expression. Total order (score desc, id asc) makes the kept
    set engine-independent under ties.

    ONE exchange: the running-sum window and the group-total window share
    the ``group_cols`` partitioning.
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = F.sum(score_col).over(w_ord)
    total = F.sum(score_col).over(w_all)
    keep = (cum - F.col(score_col)).cast("double") < F.lit(p) * total.cast(
        "double"
    )
    return (
        df.withColumn("__keep__", keep)
        .filter(F.col("__keep__"))
        .drop("__keep__")
    )


def shuffle_shard_assign(
    df: DataFrame,
    key_cols: list[str],
    shards: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle for training loaders: every row gets a
    ``(shard, pos)`` address — ``shard`` from an md5 bucket of its content
    key, ``pos`` its md5-rank within that shard — so a data loader reading
    shard files sequentially sees a uniformly shuffled corpus, reproducible
    bit-for-bit from ``(key, seed)`` on any cluster size or partitioning.
    This is the property ``orderBy(rand())`` cannot give (per-partition RNG
    streams) and a global ``ORDER BY hash`` pays a full range-shuffle sort
    for: here the ONLY exchange is the hash partition on ``shard`` and the
    sort is partition-local (the window), so the plan scales as a grouped
    window, not a global sort.

    The md5 rank string (``operators/sampling.py`` ``_key_string``
    discipline: ``key\\x1f…\\x1fseed``) is engine-portable, so the FULL
    assignment — bucket and position — is DuckDB-replayable
    (``q_shuffle_shards``). Epoch reshuffles are just a new ``seed``.

    Reference parity: the reference's terminal artifact is sampled parquet
    (samplers.py:83); shard-addressed shuffled export is the extension
    step every training pipeline needs between curation and the loader.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    if not key_cols:
        # an empty key would hash every row to the same bucket AND leave
        # pos ordered by nothing — silently non-deterministic
        raise ValueError("key_cols must name at least one column")
    from .sampling import _key_string

    h = F.md5(_key_string(key_cols, seed))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint"), F.lit(shards)
    )
    out = df.withColumn("shard", shard).withColumn("__h__", h)
    w = Window.partitionBy("shard").orderBy(
        F.col("__h__").asc(), *[F.col(c).asc() for c in key_cols]
    )
    return out.withColumn("pos", F.row_number().over(w)).drop("__h__")


def temperature_mix_weights(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled multinomial sampling weights over a grouping
    column — the standard multilingual mixing stage (public technique:
    exponentiated-share sampling with temperature, Conneau et al. XLM-R;
    mT5 uses the same alpha=0.3 default): group ``g`` with corpus share
    ``p_g`` is sampled with probability ``p_g^alpha / Σ_h p_h^alpha``,
    flattening head languages and up-weighting the tail as ``alpha → 0``.

    Returns one row per group: ``(group, n_docs, share, weight,
    expected_docs)`` where ``expected_docs = weight · N`` is the size of
    each group in a resampled-epoch of the original corpus size. One
    groupBy over the corpus + a 1-row total broadcast — the
    single-row-accumulator class, O(|groups|) after the count."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("__n__"),
    )
    pw = counts.crossJoin(F.broadcast(tot)).withColumn(
        "__pa__", F.pow(F.col("n_docs") / F.col("__n__"), F.lit(float(alpha)))
    )
    z = pw.agg(F.sum("__pa__").alias("__z__"))
    return (
        pw.crossJoin(F.broadcast(z))
        .select(
            "group",
            "n_docs",
            (F.col("n_docs") / F.col("__n__")).alias("share"),
            (F.col("__pa__") / F.col("__z__")).alias("weight"),
            (F.col("__pa__") / F.col("__z__") * F.col("__n__")).alias(
                "expected_docs"
            ),
        )
    )


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document DSIR importance score (public technique: Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    hashed-unigram log-likelihood ratio between a TARGET corpus slice and
    the full SOURCE — ``score(doc) = Σ_b count_b(doc) · λ_b`` with
    ``λ_b = ln p_target(b) − ln p_source(b)`` over ``dim`` md5 hash
    buckets (Laplace-smoothed). Selecting the top scores (or sampling
    ∝ exp(score)) biases a raw crawl toward the target distribution —
    the data-selection stage between dedup/quality and training.

    Engine-portable by construction: λ is quantized in-plan to
    ``round(scale·λ)`` integers, so each document's fold is a sum of
    exact integer products (counts ≤ 1e6, |λq| ≤ ~20·scale — comfortably
    inside 2^53), order-independent and bit-identical on any engine;
    only the final ``/scale`` reintroduces a float. Tokenless documents
    score exactly 0.0 via the left join back to the id set.

    Plan shape at 100 TB: token text never leaves the scan stage (tokens
    hash to (id, bucket) inside the explode projection); the two
    distribution aggregates are O(dim) rows; per-doc scoring is one
    broadcast join of the dim-row λ table + one integer-sum groupBy —
    no shuffle wider than (id, bucket)."""
    from .text import tokens

    def _bucket(col):
        m = F.md5(col)
        return F.pmod(
            F.conv(F.substring(m, 1, 10), 16, 10).cast("long"), F.lit(dim)
        )

    def _dist(d):
        ex = d.select(F.explode(tokens(text_col)).alias("__t__")).select(
            _bucket(F.col("__t__")).alias("__b__")
        )
        return ex.groupBy("__b__").agg(F.count(F.lit(1)).alias("__ct__"))

    spark = df.sparkSession
    buckets = spark.range(dim).select(F.col("id").cast("long").alias("__b__"))
    # each distribution is consumed TWICE (the λ join and its own total-sum
    # broadcast) — without the cut Catalyst duplicates the whole
    # tokenize+explode+aggregate subtree per consumer, scanning each corpus
    # twice (guide §2.4). The frames are ≤ dim rows (64), so the lazy
    # localCheckpoint is O(1)-sized and materialized by the first job.
    # the corpus TOTALS are global-window sums over the joined dim-row
    # frame instead of separate aggregate+crossJoin arms: the old shape
    # made Catalyst re-derive each corpus's whole tokenize+explode+
    # aggregate subtree a SECOND time for its total (guide §2.4 duplicated
    # subtrees — each corpus scanned twice). Every dist bucket is pmod-dim,
    # so the buckets frame retains every dist row and the window sum
    # equals the old total exactly (sum of longs; NULL gaps ignored, and
    # an empty dist yields NULL — the same NULL the old empty-frame
    # aggregate produced). The window runs over dim=64 rows.
    _w_all = Window.partitionBy()
    tdist = _dist(target).withColumnRenamed("__ct__", "__tc__")
    sdist = _dist(df).withColumnRenamed("__ct__", "__sc__")
    lam = (
        buckets.join(tdist, "__b__", "left")
        .join(sdist, "__b__", "left")
        .withColumn("__tt__", F.sum("__tc__").over(_w_all))
        .withColumn("__st__", F.sum("__sc__").over(_w_all))
        .select(
            "__b__",
            F.round(
                F.lit(float(scale))
                * (
                    F.log(
                        (F.coalesce("__tc__", F.lit(0)) + F.lit(1.0))
                        / (F.col("__tt__") + F.lit(float(dim)))
                    )
                    - F.log(
                        (F.coalesce("__sc__", F.lit(0)) + F.lit(1.0))
                        / (F.col("__st__") + F.lit(float(dim)))
                    )
                ),
                0,
            )
            .cast("long")
            .alias("__lam__"),
        )
    )
    per_tok = df.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(text_col)).alias("__t__"),
    ).select("__id__", _bucket(F.col("__t__")).alias("__b__"))
    scored = (
        per_tok.join(F.broadcast(lam), "__b__")
        .groupBy("__id__")
        .agg((F.sum("__lam__") / F.lit(float(scale))).alias("score"))
    )
    return (
        df.select(F.col(id_col))
        .join(scored.withColumnRenamed("__id__", id_col), id_col, "left")
        .select(id_col, F.coalesce("score", F.lit(0.0)).alias("score"))
    )
