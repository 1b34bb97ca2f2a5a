"""LLM-data-pipeline query plans (SURVEY.md §2.10 X1–X6): dedup, similarity,
text analysis, sketches — over the driver's ``documents`` / ``embeddings`` /
``events`` tables.

Oracle policy: exact/deterministic ops (exact dedup, n-gram Jaccard,
brute-force cosine top-k, text stats/fingerprint) carry full DuckDB SQL twins
— cross-engine experiments show ratio-of-int arithmetic, IEEE folds over
identical doubles, and char-level rolling hashes are bit-identical between
Spark and DuckDB. Hash-seeded ops (MinHash/SimHash/LSH — xxhash64 has no
DuckDB equivalent) and sketches (HLL) are rows-only, with invariants covered
by pytest property tests instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as X
from .registry import ORACLE_ARTIFACTS as _ORACLE_ARTIFACTS, register
from .relational import _events, _t

# DuckDB twin of operators.text.tokens() — documents.text is ASCII lowercase,
# where [^a-z0-9]+ ≡ [^\p{L}\p{N}]+.
_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x != '')"
)

#: session-scoped codebook cache for q_ivf_topk: (sf_dir, k, iters) → centroids
_IVF_FIT_CACHE: dict[tuple, list] = {}

import os as _os

#: at-rest location for q_pq_topk's persisted index (codes parquet +
#: codebook JSON): the DuckDB oracle replays the ADC scan + rerank over the
#: SAME artifacts, so the path must be knowable at module-import time (the
#: sql string is static). Rooted at the PER-PROCESS ORACLE_ARTIFACTS dir
#: (registry.py, r14 ADVICE) so concurrent runs never overwrite each
#: other; the query rebuilds the artifacts whenever a different sf_dir
#: was last materialized here.
_PQ_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "pq_oracle_index")


@register(
    "q_token_count_udf",
    # the SQL twin runs the LITERAL same pre-tokenizer pattern (RE2-safe by
    # construction, see operators.text.BPE_PRETOKEN_RE); '' escapes the quote
    sql=r"""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))
               AS bpe_udf_tokens
    FROM documents WHERE doc_id < 300
    """,
    doc=(
        "Arrow-batched pandas_udf token counter (the real-tokenizer seam, "
        "§2.8): GPT-2-style pre-tokenizer fallback counted with vectorized "
        "pandas; swapping in tiktoken is a dependency change only. The one "
        "sanctioned Python path — ArrowEvalPython, never BatchEvalPython."
    ),
)
def q_token_count_udf(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select("doc_id", X.token_count_bpe("text").alias("bpe_udf_tokens"))


# ---------------------------------------------------------------- text (X4)
@register(
    "q_text_stats",
    sql=f"""
    SELECT lang, source,
           count(*)                                   AS cnt,
           avg(n_chars)                               AS avg_chars,
           avg(len({_SQL_TOKENS}))                    AS avg_tokens,
           max(len({_SQL_TOKENS}))                    AS max_tokens
    FROM documents GROUP BY lang, source
    """,
    doc="Corpus stats per (lang, source): counts, char/token lengths. Token counting = X4.",
)
def q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tc = X.token_count("text")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg("n_chars").alias("avg_chars"),
        F.avg(tc).alias("avg_tokens"),
        F.max(tc).alias("max_tokens"),
    )


@register(
    "q_text_quality",
    sql=f"""
    SELECT doc_id,
           len({_SQL_TOKENS}) AS n_tokens,
           len(list_filter({_SQL_TOKENS},
               x -> list_contains({list(X.STOPWORDS_EN)!r}, x)))::DOUBLE
             / greatest(len({_SQL_TOKENS}), 1)        AS stop_ratio,
           list_sum(list_transform({_SQL_TOKENS}, x -> length(x)))::DOUBLE
             / greatest(len({_SQL_TOKENS}), 1)        AS mean_wlen
    FROM documents
    """,
    doc="Per-document quality signals: token count, stopword ratio, mean word length.",
)
def q_text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.stopword_ratio("text").alias("stop_ratio"),
        X.mean_word_len("text").alias("mean_wlen"),
    )


# DuckDB twin of operators.text.quality_score — mirrors the Spark expression
# term by term (same association order; ratios-of-ints and IEEE products of
# exact inputs are bit-identical cross-engine; [[:punct:]] == \p{Punct} on
# ASCII; 'g' flag matches Spark's replace-all regexp_replace).
_SQL_QUALITY = f"""(
      0.4 * least(length(text) / 500.0, 1.0)
    + 0.2 * (1.0 - least(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                         / greatest(length(text), 1) * 4, 1.0))
    + 0.2 * (1.0 - least(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         / greatest(length(text), 1) * 4, 1.0))
    + 0.2 * least(len(list_filter({_SQL_TOKENS},
                      x -> list_contains({list(X.STOPWORDS_EN)!r}, x)))
                  / greatest(len({_SQL_TOKENS}), 1) * 5, 1.0)
)"""


@register(
    "q_quality_filter",
    sql=f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             percent_rank() OVER (
               PARTITION BY lang ORDER BY {_SQL_QUALITY} DESC, doc_id
             ) AS pr
      FROM documents
    ) WHERE pr <= 0.5
    """,
    doc=(
        "Quality-quantile corpus pruning: keep the best half per language by "
        "the composite quality score (exact windowed gate; the approx-"
        "threshold broadcast variant is the 100 TB path, pinned in tests)."
    ),
)
def q_quality_filter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.quality_quantile_filter(
        d, "lang", X.quality_score("text"), keep_frac=0.5
    ).select("doc_id", "lang", "n_chars")


@register(
    "q_token_budget",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens, {_SQL_QUALITY} AS q
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             -- CAST: DuckDB window SUM -> HUGEINT -> float64 via Arrow
             CAST(sum(n_tokens) OVER (
               ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 10000
    """,
    doc=(
        "Token-budget corpus selection: best documents by quality score "
        "until a 10k-token training budget fills — curation for a fixed "
        "compute budget. Scale-safe: score range-buckets + triangular "
        "offsets instead of a global sort (operators/training.py)."
    ),
)
def q_token_budget(spark, sf_dir):
    from ..operators.training import select_token_budget

    d = _t(spark, sf_dir, "documents")
    # quality_score is [0,1] by construction -> known bounds make the
    # operator fully lazy (no bounds pass re-evaluating the regex-heavy
    # score over the whole corpus)
    return select_token_budget(
        d, budget=10_000, score=X.quality_score("text"), score_bounds=(0.0, 1.0)
    ).select("doc_id", "n_tokens", "cum_tokens")


@register(
    "q_token_budget_per_lang",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, lang, len({_SQL_TOKENS}) AS n_tokens, {_SQL_QUALITY} AS q
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 3000
    """,
    doc=(
        "Per-language token-budget curation: each language keeps its best "
        "documents up to a 3k-token budget — the balanced-mixture form "
        "(a global budget would let the dominant language eat everything). "
        "One grouped window over one shuffle on lang."
    ),
)
def q_token_budget_per_lang(spark, sf_dir):
    from ..operators.training import select_token_budget_per_group

    d = _t(spark, sf_dir, "documents")
    return select_token_budget_per_group(
        d, budget_per_group=3_000, group_col="lang", score=X.quality_score("text")
    ).select("doc_id", "lang", "n_tokens", "cum_tokens")


_LANG_CASES_SQL = " ".join(
    f"WHEN len(list_intersect(list_distinct({_SQL_TOKENS}), {list(m)!r})) > 0 "
    f"AND len(list_intersect(list_distinct({_SQL_TOKENS}), {list(m)!r})) = best THEN '{lang}'"
    for lang, m in X.LANG_MARKERS.items()
)


@register(
    "q_lang_id",
    sql=f"""
    SELECT doc_id, lang,
           (CASE {_LANG_CASES_SQL} ELSE 'und' END) AS lang_guess
    FROM (
      SELECT doc_id, lang, text,
             greatest({", ".join(f"len(list_intersect(list_distinct({_SQL_TOKENS}), {list(m)!r}))" for m in X.LANG_MARKERS.values())}) AS best
      FROM documents
    )
    """,
    doc="Language-ID heuristic: argmax of marker-lexicon hits, deterministic tie order.",
)
def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", X.lang_id("text").alias("lang_guess"))


@register(
    "q_fingerprint",
    sql=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split(text, ''), x -> ord(x)::BIGINT)),
             (acc, x) -> (acc * {X.FINGERPRINT_BASE} + x) % {X.FINGERPRINT_MOD}
           ) AS fp
    FROM documents
    """,
    doc="Document fingerprint: rolling polynomial hash over the char sequence (cross-engine identical).",
)
def q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint("text").alias("fp"))


@register(
    "q_token_histogram",
    sql=f"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
    GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    doc="Corpus token histogram (explode → count → deterministic top-20).",
)
def q_token_histogram(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


def _sql_redact(expr: str) -> str:
    """DuckDB twin of operators.text.redact_pii — generated from the same
    PII_PATTERNS so the two engines can never drift ('g' = replace-all,
    matching Spark's regexp_replace semantics)."""
    for pat, repl in X.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


@register(
    "q_redact_pii",
    sql=f"""
    SELECT doc_id,
           {_sql_redact("(text || ' contact user' || doc_id || '@example.com"
                        " call 555-123-4567 at 10.0.0.1')")} AS redacted
    FROM documents
    """,
    doc=(
        "PII redaction (emails/phones/IPv4 → typed placeholders), the "
        "pre-training scrub stage. PII is injected deterministically on both "
        "engines (the corpus itself is clean), so the oracle checks the "
        "regex chain end-to-end. Native regexp_replace — scan-stage, "
        "shuffle-free."
    ),
)
def q_redact_pii(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-123-4567 at 10.0.0.1"),
    )
    return d.select("doc_id", X.redact_pii(injected).alias("redacted"))


@register(
    "q_repetition",
    sql=f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT)        AS n_tokens,
           count(*)                        AS n_distinct,
           max(cnt)                        AS max_tok_cnt,
           1 - count(*) / CAST(sum(cnt) AS BIGINT) AS dup_ratio,
           max(cnt) / CAST(sum(cnt) AS BIGINT)     AS top_ratio
    FROM c GROUP BY doc_id
    """,
    doc=(
        "Repetition-based quality signals (C4/Gopher-style): duplicate-token "
        "ratio and top-token mass per document. Explode → two flat "
        "aggregations (map-side combine), not per-row HOF loops — ratios are "
        "int/int, oracle-exact."
    ),
)
def q_repetition(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    per_tok = (
        d.select(F.col("doc_id"), F.explode(X.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("max_tok_cnt"),
        (F.lit(1) - F.count(F.lit(1)) / F.sum("cnt")).alias("dup_ratio"),
        (F.max("cnt") / F.sum("cnt")).alias("top_ratio"),
    )


_SQL_GRAMS4 = (
    f"list_transform(range(1, greatest(len({_SQL_TOKENS}) - 3, 1) + 1), "
    f"i -> array_to_string(list_slice({_SQL_TOKENS}, i, i + 3), ' '))"
)


@register(
    "q_contamination",
    sql=f"""
    WITH probe AS (
      SELECT DISTINCT unnest(list_distinct({_SQL_GRAMS4})) AS g
      FROM documents WHERE doc_id < 3
    ),
    corpus AS (
      SELECT doc_id, unnest(list_distinct({_SQL_GRAMS4})) AS g
      FROM documents
    )
    SELECT c.doc_id, count(*) AS n_hits
    FROM corpus c JOIN probe p ON c.g = p.g
    GROUP BY c.doc_id
    """,
    doc=(
        "Eval-set decontamination: distinct word 4-grams shared with a "
        "probe set (docs 0-2 stand in for a benchmark suite). Probe grams "
        "broadcast; corpus text never shuffles — only (id, gram) matches."
    ),
)
def q_contamination(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.ngram_contamination(
        d, d.filter(F.col("doc_id") < 3), id_col="doc_id", text_col="text", n=4
    ).select("doc_id", "n_hits")


@register(
    "q_chunk_documents",
    sql=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents WHERE doc_id < 100),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), 40)) AS chunk_start
          FROM t)
    SELECT doc_id, chunk_start,
           array_to_string(toks[chunk_start + 1 : chunk_start + 50], ' ') AS chunk_text,
           least(len(toks) - chunk_start, 50) AS n_tokens
    FROM s
    """,
    doc=(
        "Fixed-size token chunking with overlap (50-token windows, stride "
        "40): the pre-training chunk stage. Starts are a sequence explode, "
        "chunk text a slice of the carried token array — map-only."
    ),
)
def q_chunk_documents(spark, sf_dir):
    from ..operators.training import chunk_documents

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = chunk_documents(d, "doc_id", "text", chunk_tokens=50, overlap=10)
    return out.select(
        "doc_id", "chunk_start", "chunk_text", F.col("n_tokens").cast("long").alias("n_tokens")
    )


@register(
    "q_assign_split",
    sql=f"""
    SELECT split, count(*) AS n_docs FROM (
      SELECT CASE
        WHEN fp % 10000 < 8000 THEN 'train'
        WHEN fp % 10000 < 9000 THEN 'val'
        ELSE 'test' END AS split
      FROM (
        SELECT list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split(text, ''), x -> ord(x)::BIGINT)),
                 (acc, x) -> (acc * {X.FINGERPRINT_BASE} + x) % {X.FINGERPRINT_MOD}
               ) AS fp
        FROM documents
      )
    ) GROUP BY split
    """,
    doc=(
        "Deterministic 80/10/10 train/val/test split keyed on the content "
        "fingerprint (duplicates land together — leakage-safe; reproducible "
        "across runs/partitionings/engines, unlike rand)."
    ),
)
def q_assign_split(spark, sf_dir):
    from ..operators.training import assign_split

    d = _t(spark, sf_dir, "documents")
    return assign_split(d).groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "q_mix_sources",
    sql=f"""
    SELECT source, count(*) AS n_docs FROM (
      SELECT source,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(string_split(text, ''), x -> ord(x)::BIGINT)),
               (acc, x) -> (acc * {X.FINGERPRINT_BASE} + x) % {X.FINGERPRINT_MOD}
             ) % 10000 AS b
      FROM documents
    )
    WHERE CASE source
            WHEN 'src0' THEN b < 5000
            WHEN 'src1' THEN b < 2500
            WHEN 'src2' THEN b < 0
            ELSE b < 10000 END
    GROUP BY source
    """,
    doc=(
        "Training-mixture source weighting: content-fingerprint-bucketed "
        "per-source keep rates (down-weight src0/src1, drop src2, keep the "
        "rest) — deterministic across runs/partitionings/engines, map-only."
    ),
)
def q_mix_sources(spark, sf_dir):
    from ..operators.training import mix_sources

    d = _t(spark, sf_dir, "documents")
    mixed = mix_sources(d, {"src0": 0.5, "src1": 0.25, "src2": 0.0})
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "q_pack_first_fit",
    # Oracle-flipped r14: the per-shard FFD greedy IS SQL-expressible — a
    # recursive CTE walks each shard's (n_tokens DESC, id) order carrying
    # the bin-remaining list as state; first-fit = the leftmost list index
    # with rem >= nt (list comprehension), oversize docs open -1 singleton
    # bins exactly like the segment tree's sentinel. Differentially pinned
    # bit-equal to pack_first_fit's segment-tree placements (incl. 0-token
    # and oversize docs) before wiring. Recursion depth = max docs/shard
    # (~8 at the driver's sf0.01 with 64 shards) — an oracle-side cost,
    # not an engine shape.
    sql=f"""
    WITH RECURSIVE items AS (
      SELECT doc_id % 64 AS shard, doc_id, len({_SQL_TOKENS})::BIGINT AS nt,
             row_number() OVER (PARTITION BY doc_id % 64
                                ORDER BY len({_SQL_TOKENS}) DESC, doc_id) AS i
      FROM documents
    ), rec AS (
      SELECT DISTINCT shard, 0::BIGINT AS i, []::BIGINT[] AS bins,
             NULL::BIGINT AS doc_id, NULL::BIGINT AS nt,
             NULL::BIGINT AS pack_id, NULL::BOOLEAN AS oversize
      FROM items
      UNION ALL
      SELECT s.shard, s.i, s.bins, s.doc_id, s.nt, s.pack_id, s.oversize
      FROM (
        SELECT r.shard, r.i + 1 AS i, it.doc_id, it.nt,
               CASE WHEN it.nt > 512 THEN list_append(r.bins, (-1)::BIGINT)
                    WHEN len(f.fits) > 0 THEN list_transform(
                         range(1, len(r.bins)+1),
                         j -> CASE WHEN j = f.fits[1] THEN r.bins[j] - it.nt
                              ELSE r.bins[j] END)
                    ELSE list_append(r.bins, 512 - it.nt) END AS bins,
               CASE WHEN it.nt > 512 THEN len(r.bins)
                    WHEN len(f.fits) > 0 THEN f.fits[1] - 1
                    ELSE len(r.bins) END AS pack_id,
               (it.nt > 512) AS oversize
        FROM rec r
        JOIN items it ON it.shard = r.shard AND it.i = r.i + 1
        CROSS JOIN LATERAL (
          SELECT [j FOR j IN range(1, len(r.bins)+1)
                  IF r.bins[j] >= it.nt] AS fits) f
      ) s
    )
    SELECT doc_id, shard, nt AS n_tokens, pack_id, oversize
    FROM rec WHERE doc_id IS NOT NULL
    """,
    doc=(
        "First-fit-decreasing whole-document packing per shard (SFT/eval "
        "loader shape, no document straddling): Arrow applyInPandas grouped "
        "by shard — the sanctioned stateful-Python path, one shuffle. "
        "Oracle-flipped r14: DuckDB replays the greedy exactly via a "
        "recursive CTE over each shard's FFD order with the bin-remaining "
        "list as carried state (differential pinned bit-equal to the "
        "segment-tree placements); capacity/efficiency invariants stay in "
        "tests/test_training.py."
    ),
)
def q_pack_first_fit(spark, sf_dir):
    from ..operators.training import pack_first_fit

    # 64 shards, not 8: shard count is the parallelism ceiling of the
    # sequential per-shard FFD, so it must scale with the data (round-3
    # verdict: 8 pinned tasks would bottleneck a 100× corpus). At sf0.1
    # (5k docs) 64 shards still hold ~80 docs each — enough to pack well.
    return pack_first_fit(
        _t(spark, sf_dir, "documents"), shard_col=(F.col("doc_id") % 64), budget=512
    )


@register(
    "q_pack_linear",
    sql=f"""
    WITH t AS (SELECT doc_id, doc_id % 8 AS shard, len({_SQL_TOKENS}) AS nt
               FROM documents),
    c AS (SELECT doc_id, shard, nt,
                 -- DuckDB window SUM returns HUGEINT which materializes as
                 -- float64 through Arrow; CAST keeps the column int64 to
                 -- match Spark (values are identical either way)
                 CAST(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                   AS BIGINT) AS start_offset
          FROM t)
    SELECT doc_id, shard, start_offset,
           CAST(floor(start_offset / 512) AS BIGINT) AS pack_id
    FROM c
    """,
    doc=(
        "Linear sequence packing (concatenate-then-cut at a 512-token "
        "budget): running token offsets per shard, pack id = offset div "
        "budget. One window per shard over one shuffle — shards keep the "
        "sort from going global at cluster scale."
    ),
)
def q_pack_linear(spark, sf_dir):
    from ..operators.training import pack_linear

    d = _t(spark, sf_dir, "documents")
    out = pack_linear(
        d, "doc_id", shard_col=(F.col("doc_id") % 8), budget=512
    )
    return out.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "start_offset",
        "pack_id",
    )


# ---------------------------------------------------------------- dedup (X1/X2)
@register(
    "q_dedup_exact",
    sql="""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Exact dedup, deterministic keep-first (X1): one row per (user_id, event_type), earliest ts.",
)
def q_dedup_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    return D.dedup_exact(
        e, subset=["user_id", "event_type"], order_by=["ts", "event_id"]
    ).select("event_id", "user_id", "event_type")


@register(
    "q_dedup_exact_hash",
    sql="""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN (SELECT text, min(doc_id) AS keep FROM documents GROUP BY text) k
      ON d.doc_id = k.keep
    """,
    doc=(
        "Content-hash exact dedup (X1 scale form): group on xxhash64(text) — "
        "8-byte shuffle keys, never document bodies — keep the min id. "
        "Oracle groups on the text itself; equal modulo a 64-bit collision."
    ),
)
def q_dedup_exact_hash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.dedup_exact_hash(d, "text", "doc_id").select("doc_id", "lang", "source")


@register(
    "q_ngram_jaccard",
    sql=f"""
    WITH g AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS gr
      FROM documents WHERE doc_id < 60
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.gr, b.gr)) / greatest(len(list_distinct(a.gr || b.gr)), 1) AS jaccard_sim
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.gr, b.gr)) / greatest(len(list_distinct(a.gr || b.gr)), 1) >= 0.5
    """,
    doc="Exact n-gram Jaccard pairs (verify kernel for near-dedup; ratio-of-ints, oracle-exact).",
)
def q_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.5)


@register(
    "q_dedup_canonical",
    sql=f"""
    WITH RECURSIVE
    g AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS gr
      FROM documents WHERE doc_id < 200
    ),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.gr, b.gr))
              / greatest(len(list_distinct(a.gr || b.gr)), 1) >= 0.6
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
    reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.src, reach.lbl FROM e JOIN reach ON e.dst = reach.id
    ),
    comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    losers AS (SELECT id FROM comp WHERE id <> cluster_id)
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id < 200 AND doc_id NOT IN (SELECT id FROM losers)
    """,
    doc=(
        "End-to-end near-dedup: exact-Jaccard pairs → connected components "
        "(label propagation; oracle = recursive-CTE transitive closure) → "
        "keep the min-id doc per cluster. Edges are deterministic "
        "ratio-of-ints, so the full pipeline is oracle-checkable; the LSH "
        "edge generator is exercised rows-only by q_dedup_minhash."
    ),
)
def q_dedup_canonical(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.6)
    return D.dedup_keep_canonical(d, pairs, "doc_id").select("doc_id", "lang", "source")


@register(
    "q_dedup_against",
    sql="""
    SELECT d.doc_id, d.source FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents r WHERE r.source = 'src0' AND r.text = d.text
    )
    """,
    doc=(
        "Cross-corpus exact dedup (X1 incremental form): keep only documents "
        "whose content is NOT already in the reference corpus (here: the "
        "src0 slice standing in for a previous training snapshot). "
        "Hash-anti-join — 8-byte keys shuffle, bodies never travel. Oracle "
        "matches modulo a 64-bit collision, like q_dedup_exact_hash."
    ),
)
def q_dedup_against(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("source") == "src0")
    return D.dedup_against(d, ref).select("doc_id", "source")


@register(
    "q_dedup_keep_longest",
    sql=f"""
    WITH RECURSIVE
    g AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS gr
      FROM documents WHERE doc_id < 200
    ),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.gr, b.gr))
              / greatest(len(list_distinct(a.gr || b.gr)), 1) >= 0.6
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION SELECT id_b, id_a FROM p),
    reach(id, lbl) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.src, reach.lbl FROM e JOIN reach ON e.dst = reach.id
    ),
    comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT doc_id, lang FROM (
      SELECT d.doc_id, d.lang,
             row_number() OVER (
               PARTITION BY coalesce(c.cluster_id, d.doc_id)
               ORDER BY len({_SQL_TOKENS}) DESC, d.doc_id
             ) AS rn
      FROM (SELECT * FROM documents WHERE doc_id < 200) d
      LEFT JOIN comp c ON d.doc_id = c.id
    ) WHERE rn = 1
    """,
    doc=(
        "Near-dedup keeping the LONGEST doc per cluster (token count desc, "
        "min-id tiebreak) — pipelines keep the most complete variant. Same "
        "deterministic exact-Jaccard edges + components as q_dedup_canonical; "
        "selection is an integer ordering, so fully oracle-checkable."
    ),
)
def q_dedup_keep_longest(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.6)
    out = D.dedup_keep_best(
        d,
        pairs,
        "doc_id",
        order_by=[
            F.desc(F.size(X.tokens("text"))),
            F.asc("doc_id"),
        ],
    )
    return out.select("doc_id", "lang")


@register(
    "q_dedup_chain",
    sql="""
    SELECT min(doc_id) AS cluster_id, count(*) AS n_members
    FROM documents GROUP BY doc_id % 40
    """,
    doc=(
        "Adversarial chain-graph components (VERDICT r4 #8): plant 40 drift "
        "chains (consecutive doc_ids within doc_id%40, the a→a'→a''… shape "
        "that defeats diameter-2 assumptions), recover components with "
        "two_hop pointer-doubling label propagation. The oracle knows each "
        "chain's component in closed form (bucket = component, cluster_id = "
        "its min doc_id), so the O(log d)-rounds path is fully "
        "value-checked, not rows-only; the rounds bound itself is pinned in "
        "test_dedup.py."
    ),
)
def q_dedup_chain(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 40).alias("__b__")
    )
    w = Window.partitionBy("__b__").orderBy("doc_id")
    pairs = (
        d.withColumn("__nxt__", F.lead("doc_id").over(w))
        .filter(F.col("__nxt__").isNotNull())
        .select(F.col("doc_id").alias("id_a"), F.col("__nxt__").alias("id_b"))
    )
    clusters = D.dedup_clusters(pairs, two_hop=True)
    return clusters.groupBy("cluster_id").agg(F.count("*").alias("n_members"))


@register(
    "q_top_tokens_per_lang",
    sql=f"""
    SELECT lang, token, cnt FROM (
      SELECT lang, token, count(*) AS cnt,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rn
      FROM (SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY lang, token
    ) WHERE rn <= 3
    """,
    doc="Top-3 tokens per language: explode → count → ranked window (deterministic tiebreak).",
)
def q_top_tokens_per_lang(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(X.tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "token", "cnt")
    )


# DuckDB twin of operators.dedup.char_ngrams(text, 3): lowercased char
# 3-gram shingles, one (possibly short) shingle for texts under 3 chars —
# exactly Spark's sequence(1, greatest(len-2, 1)) + substr(i, 3).
_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(t) - 2, 1) + 1), i -> t[i : i + 2]))"
)
# Kirsch–Mitzenmacher md5 family of minhash_near_dup_pairs: one md5 per
# shingle, h1/h2 = two 40-bit hex windows, h_i = h1 + i·h2 (matches Spark's
# conv(substring(md5, ...), 16, 10) halves exactly)
_SQL_MINHASH_SIG = ", ".join(
    f"list_min(list_transform(hp, p -> p[1] + {i} * p[2]))" for i in range(64)
)


@register(
    "q_dedup_minhash",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM docs
    ), hp AS (
      SELECT doc_id,
             list_transform(
               list_transform(sh, s -> md5(s)),
               m -> [('0x' || substr(m, 1, 10))::BIGINT,
                     ('0x' || substr(m, 11, 10))::BIGINT]) AS hp
      FROM sh
    ), sig AS (
      SELECT doc_id, [{_SQL_MINHASH_SIG}] AS hs FROM hp
    ), banded AS (
      SELECT doc_id, b,
             md5(concat_ws(',', hs[b*4+1], hs[b*4+2], hs[b*4+3], hs[b*4+4],
                           CAST(b AS VARCHAR))) AS bucket
      FROM sig, (SELECT unnest(range(0, 16)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           len(list_intersect(sa.sh, sb.sh))
             / greatest(len(list_distinct(sa.sh || sb.sh)), 1) AS jaccard_sim
    FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
    WHERE len(list_intersect(sa.sh, sb.sh))
            / greatest(len(list_distinct(sa.sh || sb.sh)), 1) >= 0.6
    """,
    doc=(
        "MinHash+LSH near-dup pairs with exact-Jaccard verify (X2, scale "
        "path), md5 hash family: the oracle replays the ENTIRE pipeline — "
        "64 minhashes, 16 banded buckets, candidate self-join, verify — "
        "in DuckDB, so LSH candidate generation itself is hash-checked, "
        "not just the verify kernel. The xxhash64 family (8-byte signature "
        "values, the 100 TB default) shares this exact plan shape and is "
        "covered by tests/test_dedup.py invariants."
    ),
)
def q_dedup_minhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.6, hash_family="md5"
    )


# DuckDB twin of operators.text.simhash64(hash_family="md5"): signature bit
# i = sign of the ±1 token votes, where a token's vote for bit i is bit
# (i mod 4) of hex digit (i div 4) of its single md5. Empty token lists give
# list_sum NULL → bit 0, matching Spark's zero-vote fold.
_SQL_SIMHASH_BITS = ", ".join(
    "CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN "
    f"((('0x' || h[{i // 4 + 1}])::INTEGER >> {i % 4}) & 1) = 1 "
    "THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END"
    for i in range(64)
)
# block c key = bits 16c..16c+15 as an int — numerically equal to Spark's
# (signature >> 16c) & 0xFFFF
_SQL_SIMHASH_BLOCKS = "\n      UNION ALL ".join(
    f"SELECT doc_id, {c} AS blk, "
    + " + ".join(f"bits[{16 * c + j + 1}] * {1 << j}" for j in range(16))
    + " AS key FROM bits"
    for c in range(4)
)


@register(
    "q_dedup_simhash",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE doc_id < 200
    ), hs AS (
      SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs FROM tok
    ), bits AS (
      SELECT doc_id, [{_SQL_SIMHASH_BITS}] AS bits FROM hs
    ), blocks AS (
      {_SQL_SIMHASH_BLOCKS}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id_a, id_b,
             CAST(list_sum(list_transform(range(1, 65),
               i -> CASE WHEN ba.bits[i] <> bb.bits[i] THEN 1 ELSE 0 END))
               AS INTEGER) AS hamming
      FROM cand
      JOIN bits ba ON ba.doc_id = cand.id_a
      JOIN bits bb ON bb.doc_id = cand.id_b
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """,
    doc=(
        "SimHash banded near-dup pairs (Hamming ≤ 3 over 64-bit "
        "signatures), md5 hash family: the oracle recomputes the per-token "
        "votes, the signed 64-bit signature, the four 16-bit pigeonhole "
        "blocks, the bucket self-join, and the Hamming verify in DuckDB — "
        "the whole pipeline is hash-checked. xxhash64 family stays the "
        "operator default with identical plan shape."
    ),
)
def q_dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.simhash_near_dup_pairs(
        d, "doc_id", "text", max_hamming=3, hash_family="md5"
    )


# ---------------------------------------------------------------- similarity (X3)
@register(
    "q_cosine_topk",
    sql="""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id
             ) AS rank
      FROM q JOIN c ON q.vec_id != c.vec_id
    ) WHERE rank <= 5
    """,
    doc="Brute-force exact cosine top-5 (X3 baseline); fold arithmetic is bit-identical cross-engine.",
)
def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


# The hyperplanes are driver-side literals (similarity.plane_weights), so the
# oracle embeds the IDENTICAL doubles (repr round-trips exactly) and DuckDB's
# list_dot_product matches Spark's left fold bit-for-bit (proven by
# q_cosine_topk) — the whole LSH path is replayable. dim=64 is table-constant
# across the test parquet (TESTDATA.md).
_EMB_DIM = 64


def _sql_sign_sig(planes: list[list[float]]) -> str:
    """DuckDB twin of similarity.lsh_signature over `v`: sum of sign bits."""
    return " + ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(w) for w in plane)
        + f"]) >= 0 THEN {1 << p} ELSE 0 END"
        for p, plane in enumerate(planes)
    )


def _lsh_probe_masks(num_planes: int, probe_hamming: int) -> list[int]:
    from itertools import combinations

    return [
        sum(1 << p for p in bits)
        for h in range(probe_hamming + 1)
        for bits in combinations(range(num_planes), h)
    ]


@register(
    "q_cosine_topk_lsh",
    sql=f"""
    WITH sigc AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_sql_sign_sig(S.plane_weights(6, _EMB_DIM, 42))} AS sig
      FROM embeddings
    ), probes AS (
      SELECT q.vec_id AS query_id, q.v AS qv, xor(q.sig, m.m) AS probe
      FROM sigc q, (SELECT unnest({_lsh_probe_masks(6, 2)}) AS m) m
      WHERE q.vec_id < 5
    ), scored AS (
      SELECT p.query_id, s.vec_id AS neighbor_id,
             list_dot_product(p.qv, s.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(s.v, s.v))) AS cos_sim
      FROM probes p JOIN sigc s
        ON s.sig = p.probe AND s.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc=(
        "LSH-bucketed approximate cosine top-k (X3 scale path): the oracle "
        "replays signature bits, the 22 multi-probe buckets (Hamming ≤ 2 of "
        "6 planes), the bucket join, and the exact rescore+rank in DuckDB "
        "from the identical hyperplane literals — the approximation is "
        "deterministic, so even the 'approximate' path is hash-checked. "
        "Recall vs brute force measured in tests/test_similarity.py."
    ),
)
def q_cosine_topk_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < 5), k=5)


_IVF_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "ivf_oracle_index")


def _write_probes_artifact(spark, queries_df, centroids, nprobe, root):
    """Persist per-query probe-cell assignments as ``<root>/probes``
    parquet — the r13 extension of the at-rest oracle argument to probe
    SELECTION: numpy's matmul argsort here vs a dot-product fold in the
    oracle engine could flip a probed cell on a centroid-distance
    near-tie across BLAS builds, so the probes become data both engines
    read. Bounded (queries × nprobe rows), computed driver-side exactly
    once per artifact write."""
    from ..operators.ivf import probe_assignments, well_formed_vectors

    rows = (
        well_formed_vectors(queries_df, "embedding")
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    probes = probe_assignments([r[1] for r in rows], centroids, nprobe)
    spark.createDataFrame(
        [(r[0], int(c)) for r, prow in zip(rows, probes) for c in prow],
        "query_id bigint, cell int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/probes")


@register(
    "q_ivf_topk",
    # Persisted-artifact oracle (r12; probes persisted r13): the (id,
    # cell) corpus assignment AND the per-query probe cells computed once
    # at ingest are DATA both engines read — not a float argmin/argsort
    # both must reproduce (a near-tie between centroid distances could
    # resolve differently across BLAS builds) — so DuckDB replays only
    # the cell equi-join over the stored assignment and the exact-cosine
    # rescore.
    sql=f"""
    WITH cl AS (
      SELECT vec_id, cell FROM read_parquet('{_IVF_ORACLE_ROOT}/cells/*.parquet')
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 5
    ),
    probes AS (
      SELECT query_id, cell
      FROM read_parquet('{_IVF_ORACLE_ROOT}/probes/*.parquet')
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.v, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               e.vec_id) AS rank
      FROM probes p
      JOIN q ON q.vec_id = p.query_id
      JOIN cl ON cl.cell = p.cell AND cl.vec_id != q.vec_id
      JOIN embeddings e ON e.vec_id = cl.vec_id
    ) WHERE rank <= 5
    """,
    doc=(
        "IVF ANN top-k (X3 scale path): deterministic k-means codebook fit "
        "(hash-seeded init), cell-equi-join probe + exact rescore; nprobe "
        "auto-derived from the measured ANN_RECALL.json curve for "
        "worst-case recall@5 >= 0.75 (tests/test_ivf.py re-measures it). "
        "Oracle-flipped r12 via the persisted-artifact replay: the (id, "
        "cell) assignment + centroids live at rest at a fixed path "
        "(computed once, the ingest shape — ivf_topk's corpus_cells "
        "parameter skips query-time assignment), and DuckDB replays probe "
        "selection + cell join + exact rescore over the same artifacts."
    ),
)
def q_ivf_topk(spark, sf_dir):
    from ..operators import ivf as I
    from ..util import single_partition_df

    emb = _t(spark, sf_dir, "embeddings")
    # 2 Lloyd iterations: each fit pass costs a full corpus assignment
    # (k×dim interpreted folds per row). nprobe is left at the auto
    # default (nprobe_for_recall: measured worst-case recall@5 >= 0.75 —
    # 4 of these 8 cells); the old fixed nprobe=3 measured 0.47 on the
    # near-uniform synthetic embeddings (ANN_RECALL.json, r8 verdict #6).
    # The fit is deterministic per (sf_dir, k, iters) — hash-seeded init,
    # fixed iteration count, immutable test parquet — so memoize it: the
    # codebook is fitted once per session, not at every plan-build.
    key = (sf_dir, 8, 2)
    centroids = _IVF_FIT_CACHE.get(key)
    if centroids is None:
        centroids = I.fit_ivf_centroids(emb, k=8, iters=2)
        _IVF_FIT_CACHE[key] = centroids
    if _IVF_FIT_CACHE.get("ivf_oracle_sf") != sf_dir:
        I.assign_cells(
            I.well_formed_vectors(emb, "embedding"), centroids, nprobe=1
        ).write.mode("overwrite").parquet(f"{_IVF_ORACLE_ROOT}/cells")
        single_partition_df(
            spark, [(centroids,)], "centroids array<array<double>>"
        ).write.mode("overwrite").json(f"{_IVF_ORACLE_ROOT}/centroids")
        _write_probes_artifact(
            spark, emb.filter(F.col("vec_id") < 5), centroids,
            I.nprobe_for_recall(len(centroids)), _IVF_ORACLE_ROOT,
        )
        _IVF_FIT_CACHE["ivf_oracle_sf"] = sf_dir
    cells = spark.read.parquet(f"{_IVF_ORACLE_ROOT}/cells")
    return I.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), centroids, k=5,
        corpus_cells=cells,
        query_probes=spark.read.parquet(f"{_IVF_ORACLE_ROOT}/probes"),
    )


@register(
    "q_pq_topk",
    # Persisted-artifact oracle (r11 verdict item 4, the q_minhash_index
    # precedent): the query materializes its deterministic index — codes
    # parquet + codebook JSON — at a fixed path, and DuckDB replays the
    # ENTIRE serving path over those artifacts: per-subspace LUT dots
    # (left-fold, matching Spark's aggregate fold: 0.0 + l1 + ... per the
    # q_cosine_topk bit-parity result), ADC ordering with the neighbor-id
    # tiebreak, the 100-candidate shortlist, and the exact-cosine re-rank.
    sql=f"""
    WITH b AS (
      SELECT codebooks FROM read_json_auto('{_PQ_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, codes, vhat_sq
      FROM read_parquet('{_PQ_ORACLE_ROOT}/codes/*.parquet')
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 5
    ),
    adc AS (
      SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id, q.v AS qv,
             CASE WHEN cd.vhat_sq > 0 AND q.qn > 0 THEN
               list_reduce(
                 list_transform(range(1, 17),
                   s -> list_dot_product(q.v[((s-1)*4+1):(s*4)],
                                         b.codebooks[s][cd.codes[s] + 1])),
                 (a, x) -> a + x)
               / (q.qn * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM q JOIN cd ON q.vec_id != cd.vec_id CROSS JOIN b
    ),
    short AS (
      SELECT query_id, neighbor_id, qv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS r
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.qv, s.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.qv, s.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.r <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "Product-quantization ANN top-k (X3 scale path; r8 verdict item 9, "
        "the standard IVF companion), served AT REST: per-subspace k-means "
        "codebooks fit on a hash-ranked bounded sample, one-shuffle codegen "
        "encode to 8-byte codes (32x compression), persisted via "
        "write_pq_index, then ADC scan over the stored codes + exact cosine "
        "re-rank of a 100-candidate shortlist. The oracle reads the SAME "
        "persisted artifacts (read_parquet + read_json_auto) and replays "
        "LUT build, ADC order, shortlist, and rerank — flipping this query "
        "from rows-only to hash-checked (r11 verdict item 4). Recall@5 "
        "0.94 measured on the near-uniform sf0.1 fixture (ANN_RECALL.json "
        "'pq'; tests/test_pq.py pins the 0.80 floor and encode==numpy)."
    ),
)
def q_pq_topk(spark, sf_dir):
    from ..operators import pq as Q

    emb = _t(spark, sf_dir, "embeddings")
    # same memoization contract as q_ivf_topk: the codebook fit is
    # deterministic per (sf_dir, m, ncodes, iters) on the immutable test
    # parquet, so fit once per session instead of at every plan-build.
    key = (sf_dir, "pq", 16, 16, 3)
    books = _IVF_FIT_CACHE.get(key)
    if books is None:
        books = Q.fit_pq_codebooks(emb, m=16, ncodes=16, iters=3)
        _IVF_FIT_CACHE[key] = books
    # materialize the at-rest form the oracle reads; rebuilt when a
    # different sf was last written here (encode is deterministic, so
    # same-session re-invocations skip straight to the read)
    if _IVF_FIT_CACHE.get("pq_oracle_sf") != sf_dir:
        Q.write_pq_index(
            Q.pq_encode(emb, books), books, _PQ_ORACLE_ROOT, mode="overwrite"
        )
        _IVF_FIT_CACHE["pq_oracle_sf"] = sf_dir
    codes, books2 = Q.read_pq_index(spark, _PQ_ORACLE_ROOT)
    return Q.pq_topk(
        codes, emb.filter(F.col("vec_id") < 5), books2, k=5, rerank=100, corpus=emb
    )


_PQ_APPEND_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "pq_append_oracle_index")

_IVFPQ_RAW_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "ivfpq_raw_oracle_index")

_IVFPQ_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "ivfpq_oracle_index")

_OPQ_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "opq_oracle_index")

_OPQ_MAINT_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "opq_maintained_oracle_index")


@register(
    "q_opq_maintained",
    # The r13 composition oracle: a MAINTAINED OPQ-IVF-PQ index at rest —
    # rotation lives in the index meta (not a sidecar file), the appended
    # batch was rotated+encoded+cell-assigned by append_pq_index itself,
    # probe cells are a persisted artifact, and DuckDB replays the whole
    # serving path: rotate queries (left-fold vs the meta's R rows — the
    # engine rotates queries with the same explicit fold), LUT/ADC over
    # the Hive-partitioned maintained codes, cell equi-join via the probe
    # artifact, shortlist, raw-space exact rerank.
    sql=f"""
    WITH m AS (
      SELECT codebooks, rotation
      FROM read_json_auto('{_OPQ_MAINT_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, cell, codes, vhat_sq
      FROM read_parquet('{_OPQ_MAINT_ORACLE_ROOT}/codes/*/*.parquet',
                        hive_partitioning=0)
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS rawv FROM embeddings WHERE vec_id < 5
    ),
    qr AS (
      SELECT q.vec_id, q.rawv,
             list_transform(range(1, 65),
                            j -> list_dot_product(q.rawv, m.rotation[j])) AS v
      FROM q CROSS JOIN m
    ),
    probes AS (
      SELECT query_id, cell
      FROM read_parquet('{_OPQ_MAINT_ORACLE_ROOT}/probes/*.parquet')
    ),
    adc AS (
      SELECT qr.vec_id AS query_id, cd.vec_id AS neighbor_id, qr.rawv,
             CASE WHEN cd.vhat_sq > 0
                   AND sqrt(list_dot_product(qr.v, qr.v)) > 0 THEN
               list_reduce(
                 list_transform(range(1, 17),
                   s -> list_dot_product(qr.v[((s-1)*4+1):(s*4)],
                                         m.codebooks[s][cd.codes[s] + 1])),
                 (a, x) -> a + x)
               / (sqrt(list_dot_product(qr.v, qr.v)) * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM probes p
      JOIN qr ON qr.vec_id = p.query_id
      JOIN cd ON cd.cell = p.cell AND cd.vec_id != qr.vec_id
      CROSS JOIN m
    ),
    short AS (
      SELECT query_id, neighbor_id, rawv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS rr
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.rawv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.rawv, s.rawv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.rawv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.rawv, s.rawv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.rr <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "Maintained OPQ-IVF-PQ index (r13 stretch, r12 verdict item 9; "
        "the FAISS 'OPQd,IVFx,PQy' composition, Ge et al. CVPR 2013): the "
        "rotation sidecar lives IN the index meta, so write/append/search/"
        "refit all dispatch on it — a 90% base is written rotated, the "
        "10% daily delta is appended RAW and rotated inside "
        "append_pq_index (same map-side fold a rebuild uses: "
        "append==rebuild parity in rotation space pinned in "
        "tests/test_opq.py), and ivf_pq_search_index rotates queries "
        "driver-side from the meta, probes via the persisted artifact, "
        "ADC-orders the survivors, and exact-reranks in RAW space. "
        "Hash-checked end-to-end against DuckDB over the same at-rest "
        "artifacts."
    ),
)
def q_opq_maintained(spark, sf_dir):
    from ..operators import opq as O
    from ..operators import pq as Q
    from ..operators.ivf import assign_cells, fit_ivf_centroids, probe_assignments

    emb = _t(spark, sf_dir, "embeddings")
    root = _OPQ_MAINT_ORACLE_ROOT
    key = (sf_dir, "opq", 16, 16)
    fit = _IVF_FIT_CACHE.get(key)
    if fit is None:
        fit = O.fit_opq(emb, m=16, ncodes=16, iters=3, opq_iters=6)
        _IVF_FIT_CACHE[key] = fit
    rot, books = fit

    def _rot_emb():
        # built lazily: the d²-literal Column tree costs seconds of py4j
        # round-trips to CONSTRUCT — only the fit/boot paths need it, so
        # the steady (append + search) invocation never pays it
        return O.rotate_vectors(emb, rot).select(
            "vec_id", F.col("rotated").alias("embedding")
        )

    ckey = (sf_dir, "opq_maint_cents", 8, 2)
    cents = _IVF_FIT_CACHE.get(ckey)
    if cents is None:
        cents = fit_ivf_centroids(_rot_emb(), k=8, iters=2)
        _IVF_FIT_CACHE[ckey] = cents
    if _IVF_FIT_CACHE.get("opq_maint_oracle_sf") != sf_dir:
        base = _rot_emb().filter(F.col("vec_id") % 10 != 9)
        codes = (
            Q.pq_encode(base, books)
            .join(assign_cells(base, cents, nprobe=1).select("vec_id", "cell"), "vec_id")
            .withColumn("ingest_day", F.lit("d0"))
        )
        Q.write_pq_index(
            codes, books, root, mode="overwrite",
            partition_col="ingest_day", centroids=cents, rotation=rot,
        )
        # probe artifact over ROTATED queries vs rotated-space centroids
        # (the left-fold rotation — same numbers the search will use)
        rotated_q, _ = O.rotate_queries_collected(
            emb.filter(F.col("vec_id") < 5), rot
        )
        rows = rotated_q.select("vec_id", "embedding").collect()
        probes = probe_assignments([r[1] for r in rows], cents, 4)
        spark.createDataFrame(
            [(r[0], int(c)) for r, prow in zip(rows, probes) for c in prow],
            "query_id bigint, cell int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/probes")
        _IVF_FIT_CACHE["opq_maint_oracle_sf"] = sf_dir
    # the steady maintenance op: append the RAW 10% delta (the index
    # rotates it internally) — idempotent, so re-invocation converges
    Q.append_pq_index(
        spark, root,
        emb.filter(F.col("vec_id") % 10 == 9).withColumn(
            "ingest_day", F.lit("d1")
        ),
    )
    return Q.ivf_pq_search_index(
        spark, root, emb.filter(F.col("vec_id") < 5),
        corpus=emb, k=5, nprobe=4, rerank=100,
        query_probes=spark.read.parquet(f"{root}/probes"),
    )


@register(
    "q_opq_topk",
    # Same persisted-artifact oracle as q_pq_topk, plus the rotation
    # sidecar: DuckDB rotates each query with left-fold dots against the
    # stored R rows (bit-identical to the engine's fold — opq_topk rotates
    # queries with an explicit left fold for exactly this reason), builds
    # the LUTs over the rotated query, replays ADC order + shortlist, and
    # re-ranks in RAW space (cosine is rotation-invariant).
    sql=f"""
    WITH r AS (
      SELECT rotation FROM read_json_auto('{_OPQ_ORACLE_ROOT}/rotation/*.json')
    ),
    b AS (
      SELECT codebooks FROM read_json_auto('{_OPQ_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, codes, vhat_sq
      FROM read_parquet('{_OPQ_ORACLE_ROOT}/codes/*.parquet')
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS rawv FROM embeddings WHERE vec_id < 5
    ),
    qr AS (
      SELECT q.vec_id, q.rawv,
             list_transform(range(1, 65),
                            j -> list_dot_product(q.rawv, r.rotation[j])) AS v
      FROM q CROSS JOIN r
    ),
    adc AS (
      SELECT qr.vec_id AS query_id, cd.vec_id AS neighbor_id, qr.rawv,
             CASE WHEN cd.vhat_sq > 0
                   AND sqrt(list_dot_product(qr.v, qr.v)) > 0 THEN
               list_reduce(
                 list_transform(range(1, 17),
                   s -> list_dot_product(qr.v[((s-1)*4+1):(s*4)],
                                         b.codebooks[s][cd.codes[s] + 1])),
                 (a, x) -> a + x)
               / (sqrt(list_dot_product(qr.v, qr.v)) * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM qr JOIN cd ON qr.vec_id != cd.vec_id CROSS JOIN b
    ),
    short AS (
      SELECT query_id, neighbor_id, rawv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS rr
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.rawv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.rawv, s.rawv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.rawv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.rawv, s.rawv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.rr <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "OPQ ANN top-k (r12 stretch, r11 verdict item 8; public technique: "
        "Ge et al. CVPR 2013, FAISS OPQMatrix): a learned orthogonal "
        "rotation ahead of PQ — alternating per-subspace Lloyd and "
        "closed-form Procrustes on the bounded fit sample — so the same 8 "
        "bytes/vector stop paying for correlated, unequally-energetic "
        "subspaces. Corpus rotation is a map-only codegen fold; queries "
        "rotate driver-side (left-fold, SQL-bit-compatible); serving reads "
        "the SAME persisted artifacts the oracle replays (rotation sidecar "
        "+ codes + codebooks), so the query is hash-checked end-to-end. "
        "Measured recall-vs-bytes curve in ANN_RECALL.json 'opq' section; "
        "tests/test_opq.py pins the error guarantee and raw-space rerank "
        "exactness."
    ),
)
def q_opq_topk(spark, sf_dir):
    from ..operators import opq as O
    from ..operators import pq as Q
    from ..util import single_partition_df

    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, "opq", 16, 16)
    fit = _IVF_FIT_CACHE.get(key)
    if fit is None:
        fit = O.fit_opq(emb, m=16, ncodes=16, iters=3, opq_iters=6)
        _IVF_FIT_CACHE[key] = fit
    rot, books = fit
    if _IVF_FIT_CACHE.get("opq_oracle_sf") != sf_dir:
        enc = Q.pq_encode(
            O.rotate_vectors(emb, rot).select(
                "vec_id", F.col("rotated").alias("embedding")
            ),
            books,
        )
        Q.write_pq_index(enc, books, _OPQ_ORACLE_ROOT, mode="overwrite")
        single_partition_df(
            spark, [(rot,)], "rotation array<array<double>>"
        ).write.mode("overwrite").json(f"{_OPQ_ORACLE_ROOT}/rotation")
        _IVF_FIT_CACHE["opq_oracle_sf"] = sf_dir
    codes, books2 = Q.read_pq_index(spark, _OPQ_ORACLE_ROOT)
    return O.opq_topk(
        codes, emb.filter(F.col("vec_id") < 5), rot, books2,
        k=5, rerank=100, corpus=emb,
    )


@register(
    "q_pq_append",
    # Persisted-artifact oracle (r12): append+search == rebuild+search
    # exactly (pq_encode is a deterministic expression of the frozen
    # codebooks — pinned in tests/test_pq.py), so after the append the
    # maintained index AT REST is replayable like q_pq_topk's: DuckDB
    # reads the Hive-partitioned codes (two-level glob) + codebook JSON
    # and replays LUT/ADC/shortlist/rerank.
    sql=f"""
    WITH b AS (
      SELECT codebooks FROM read_json_auto('{_PQ_APPEND_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, codes, vhat_sq
      FROM read_parquet('{_PQ_APPEND_ORACLE_ROOT}/codes/*/*.parquet')
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 5
    ),
    adc AS (
      SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id, q.v AS qv,
             CASE WHEN cd.vhat_sq > 0 AND q.qn > 0 THEN
               list_reduce(
                 list_transform(range(1, 17),
                   s -> list_dot_product(q.v[((s-1)*4+1):(s*4)],
                                         b.codebooks[s][cd.codes[s] + 1])),
                 (a, x) -> a + x)
               / (q.qn * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM q JOIN cd ON q.vec_id != cd.vec_id CROSS JOIN b
    ),
    short AS (
      SELECT query_id, neighbor_id, qv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS rr
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.qv, s.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.qv, s.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.rr <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "Incremental ANN index maintenance (r9 verdict stretch item 8, "
        "the streaming-ingest <-> ANN link): persist a PQ index over 90% "
        "of the corpus partitioned by ingest day, append the rest as a "
        "NEW batch encoded map-side against the PERSISTED codebooks "
        "(operators/pq.py append_pq_index -> streaming/upsert.py "
        "partition-scoped merge: only the batch's day partitions "
        "rewritten, O(touched partitions) per batch regardless of index "
        "size), then ADC-search the maintained codes. pq_encode is a "
        "deterministic expression of the codebooks, so append+search == "
        "rebuild+search exactly (pinned in tests/test_pq.py) — which is "
        "what lets the r12 oracle replay the post-append index at rest, "
        "hash-checking the MAINTAINED state, not just the search."
    ),
)
def q_pq_append(spark, sf_dir):
    from ..operators import pq as Q

    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, "pq", 16, 16, 3)
    books = _IVF_FIT_CACHE.get(key)
    if books is None:
        books = Q.fit_pq_codebooks(emb, m=16, ncodes=16, iters=3)
        _IVF_FIT_CACHE[key] = books
    root = _PQ_APPEND_ORACLE_ROOT
    # 90/10 split: the appended batch is a realistic daily delta (10% of
    # the corpus), so the steady cost is delta-encode + touched-partition
    # upsert + search — not a half-corpus re-encode.
    half = emb.filter(F.col("vec_id") % 10 != 9)
    rest = emb.filter(F.col("vec_id") % 10 == 9)
    # bootstrap the base index once per session (the q_bucketed_join
    # reuse_existing precedent), at the FIXED oracle path — rebuilt when a
    # different sf was last materialized there: repeated invocations then
    # measure the STEADY maintenance cost — append + search — not index
    # creation. Re-appending the same batch is the idempotence property
    # (test_streaming_ann.py), so the result is invocation-independent.
    if _IVF_FIT_CACHE.get("pq_append_oracle_sf") != sf_dir:
        base = Q.pq_encode(half, books).withColumn("ingest_day", F.lit("d0"))
        Q.write_pq_index(
            base, books, root, mode="overwrite", partition_col="ingest_day"
        )
        _IVF_FIT_CACHE["pq_append_oracle_sf"] = sf_dir
    Q.append_pq_index(spark, root, rest.withColumn("ingest_day", F.lit("d1")))
    codes, books2 = Q.read_pq_index(spark, root)
    return Q.pq_topk(
        codes.select("vec_id", "codes", "vhat_sq"),
        emb.filter(F.col("vec_id") < 5),
        books2,
        k=5,
        rerank=100,
        corpus=emb,
    )


_IVFPQ_DRIFT_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "ivfpq_drift_oracle_index")


@register(
    "q_ivf_pq_drift",
    # Persisted-artifact oracle (flipped r13, r12 verdict item 8b): the
    # occupancy-TVD half of index_drift_report is pure arithmetic over two
    # at-rest artifacts — the build-time cell snapshot (<path>/cell_stats)
    # and the live 8-byte code rows — so DuckDB replays it exactly. The
    # err-ratio half (which embeds a fresh k-means refit) stays OUT of the
    # oracle: it is pinned by tests/test_pq.py, the measured decision
    # curve in DRIFT_PROBE.json, and the streaming drift->refit loop test
    # (tests/test_streaming_ann.py).
    sql=f"""
    WITH b AS (
      SELECT cell, n_build
      FROM read_parquet('{_IVFPQ_DRIFT_ORACLE_ROOT}/cell_stats/*.parquet')
    ),
    c AS (
      SELECT cell, count(*) AS n_cur
      FROM read_parquet('{_IVFPQ_DRIFT_ORACLE_ROOT}/codes/*/*.parquet',
                        hive_partitioning=0)
      GROUP BY cell
    ),
    j AS (
      SELECT coalesce(b.n_build, 0) AS nb, coalesce(c.n_cur, 0) AS nc
      FROM b FULL JOIN c ON b.cell = c.cell
    ),
    t AS (SELECT CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc FROM j)
    SELECT t.tb AS n_build, t.tc AS n_current,
           round(0.5 * sum(abs(nb / greatest(t.tb, 1) - nc / greatest(t.tc, 1))), 8)
             AS occupancy_tvd,
           round(0.5 * sum(abs(nb / greatest(t.tb, 1) - nc / greatest(t.tc, 1))), 8)
             > 0.25 AS occupancy_flagged
    FROM j CROSS JOIN t GROUP BY t.tb, t.tc
    """,
    doc=(
        "Occupancy-drift monitor for the maintained IVF-PQ index (r11; "
        "oracle-flipped r13): appends assign cells against the FROZEN "
        "coarse quantizer, so recall decays silently under distribution "
        "drift. This query replays the metadata half of "
        "operators/pq.index_drift_report — total-variation distance "
        "between the build-time cell occupancy snapshot and the live "
        "at-rest code distribution after a planted 16-dim shifted append "
        "— as a full-outer join + one bounded fold over <= n_cells rows; "
        "DuckDB computes the identical TVD from the identical artifacts. "
        "The second, non-SQL half (frozen-vs-refit quantization-error "
        "ratio, which embeds a fresh k-means) is exercised by "
        "tests/test_pq.py, DRIFT_PROBE.json, and the streaming "
        "drift->refit loop (streaming/ann.py). Measured consequence at "
        "sf0.1: shifted-query recall@5 0.32 frozen vs 0.87 after the "
        "recommended refit rebuild."
    ),
)
def q_ivf_pq_drift(spark, sf_dir):
    from ..operators import pq as Q
    from ..operators.ivf import assign_cells, fit_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    root = _IVFPQ_DRIFT_ORACLE_ROOT
    key = (sf_dir, "pq", 16, 16, 3)
    books = _IVF_FIT_CACHE.get(key)
    if books is None:
        books = Q.fit_pq_codebooks(emb, m=16, ncodes=16, iters=3)
        _IVF_FIT_CACHE[key] = books
    ckey = (sf_dir, "ivfpq_drift_cents", 8, 2)
    cents = _IVF_FIT_CACHE.get(ckey)
    if cents is None:
        cents = fit_ivf_centroids(emb.filter(F.col("vec_id") % 10 != 9), k=8, iters=2)
        _IVF_FIT_CACHE[ckey] = cents
    base = emb.filter(F.col("vec_id") % 10 != 9)
    drifted = (
        emb.filter(F.col("vec_id") % 10 == 9)
        .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i < 16, x + F.lit(2.0)).otherwise(x),
            ),
        )
    )
    # bootstrap index + planted-drift append once per sf (q_pq_append
    # precedent): the steady, invocation-independent cost is the MONITOR
    if _IVF_FIT_CACHE.get("ivfpq_drift_oracle_sf") != sf_dir:
        codes = (
            Q.pq_encode(base, books)
            .join(assign_cells(base, cents).select("vec_id", "cell"), "vec_id")
            .withColumn("ingest_day", F.lit("d0"))
        )
        Q.write_pq_index(
            codes, books, root, mode="overwrite",
            partition_col="ingest_day", centroids=cents,
        )
        Q.append_pq_index(
            spark, root, drifted.withColumn("ingest_day", F.lit("d1"))
        )
        _IVF_FIT_CACHE["ivfpq_drift_oracle_sf"] = sf_dir
    cur = (
        spark.read.parquet(f"{root}/codes")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    build = spark.read.parquet(f"{root}/cell_stats")
    j = build.join(cur, "cell", "full_outer").select(
        F.coalesce("n_build", F.lit(0)).alias("nb"),
        F.coalesce("n_cur", F.lit(0)).alias("nc"),
    )
    tot = j.agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )  # <= n_cells rows on both sides: the cross join is trivially broadcast
    tvd = F.round(
        0.5
        * F.sum(
            F.abs(
                F.col("nb") / F.greatest(F.col("tb"), F.lit(1))
                - F.col("nc") / F.greatest(F.col("tc"), F.lit(1))
            )
        ),
        8,
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .groupBy("tb", "tc")
        .agg(tvd.alias("occupancy_tvd"))
        .select(
            F.col("tb").alias("n_build"),
            F.col("tc").alias("n_current"),
            "occupancy_tvd",
            (F.col("occupancy_tvd") > 0.25).alias("occupancy_flagged"),
        )
    )


@register(
    "q_ivf_pq_residual",
    # Persisted-artifact oracle (r12, extending the q_pq_topk flip to the
    # full IVFPQ construction; probes persisted r13): the index at rest
    # carries (cell, codes, vhat_sq) + a meta row with BOTH the residual
    # codebooks and the coarse centroids, and the per-query probe cells
    # (4 = nprobe_for_recall(8, 0.75)) are a parquet artifact too — probe
    # selection is data both engines read, not a float argsort both must
    # reproduce on centroid-distance near-ties. DuckDB replays the rest
    # of the serving path: the cell equi-join over stored codes, the
    # residual ADC score (LUT fold + the per-(query, cell) q·centroid
    # term), the shortlist, and the raw-space exact rerank.
    sql=f"""
    WITH m AS (
      SELECT codebooks, centroids
      FROM read_json_auto('{_IVFPQ_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, cell, codes, vhat_sq
      FROM read_parquet('{_IVFPQ_ORACLE_ROOT}/codes/*.parquet', hive_partitioning=0)
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 5
    ),
    probes AS (
      SELECT query_id, cell
      FROM read_parquet('{_IVFPQ_ORACLE_ROOT}/probes/*.parquet')
    ),
    adc AS (
      SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id, q.v AS qv,
             CASE WHEN cd.vhat_sq > 0 AND q.qn > 0 THEN
               (list_reduce(
                  list_transform(range(1, 17),
                    s -> list_dot_product(q.v[((s-1)*4+1):(s*4)],
                                          m.codebooks[s][cd.codes[s] + 1])),
                  (a, x) -> a + x)
                + list_dot_product(q.v, m.centroids[cd.cell + 1]))
               / (q.qn * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM probes p
      JOIN q ON q.vec_id = p.query_id
      JOIN cd ON cd.cell = p.cell AND cd.vec_id != q.vec_id
      CROSS JOIN m
    ),
    short AS (
      SELECT query_id, neighbor_id, qv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS rr
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.qv, s.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.qv, s.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.rr <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "Residual IVF-PQ search (r11; oracle-flipped r12 via the "
        "persisted-artifact replay): PQ codes over v − centroid[cell] — "
        "the standard FAISS IVFPQ construction (Jégou 2011 §III) — served "
        "AT REST through ivf_pq_search_index (version-resolved reader, no "
        "query-time corpus assignment). The 8 bytes/vector describe "
        "within-cell geometry instead of re-encoding the placement the "
        "IVF stage already knows: ADC-only recall@5 on clustered data "
        "beats raw encoding at identical bytes (test-pinned margin >0.1; "
        "ANN_RECALL.json 'ivfpq_residual'). DuckDB replays probe-cell "
        "selection, the cell equi-join, the residual ADC term, shortlist "
        "and raw-space rerank over the SAME artifacts — hash-checked."
    ),
)
def q_ivf_pq_residual(spark, sf_dir):
    from ..operators import pq as Q
    from ..operators.ivf import fit_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    ckey = (sf_dir, "ivfpq_drift_cents", 8, 2)  # share the drift query's fit
    cents = _IVF_FIT_CACHE.get(ckey)
    if cents is None:
        cents = fit_ivf_centroids(emb.filter(F.col("vec_id") % 10 != 9), k=8, iters=2)
        _IVF_FIT_CACHE[ckey] = cents
    rkey = (sf_dir, "res_books", 16, 16, 3)
    res_books = _IVF_FIT_CACHE.get(rkey)
    if res_books is None:
        res_books = Q.fit_residual_codebooks(emb, cents, m=16, ncodes=16, iters=3)
        _IVF_FIT_CACHE[rkey] = res_books
    if _IVF_FIT_CACHE.get("ivfpq_oracle_sf") != sf_dir:
        enc = Q.ivf_pq_encode_residual(emb, res_books, cents)
        Q.write_pq_index(
            enc, res_books, _IVFPQ_ORACLE_ROOT, mode="overwrite",
            centroids=cents, residual=True,
        )
        from ..operators.ivf import nprobe_for_recall

        _write_probes_artifact(
            spark, emb.filter(F.col("vec_id") < 5), cents,
            nprobe_for_recall(len(cents)), _IVFPQ_ORACLE_ROOT,
        )
        _IVF_FIT_CACHE["ivfpq_oracle_sf"] = sf_dir
    return Q.ivf_pq_search_index(
        spark, _IVFPQ_ORACLE_ROOT, emb.filter(F.col("vec_id") < 5),
        corpus=emb, k=5, rerank=100,
        query_probes=spark.read.parquet(f"{_IVFPQ_ORACLE_ROOT}/probes"),
    )


_SQ_CODE_SQL = """CASE WHEN b.mx = b.mn THEN 0
             ELSE least(255, greatest(0, floor((u.val - b.mn) / (b.mx - b.mn) * 255.0)))
             END"""

_SQ_BOUNDS_CTE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    u AS (SELECT vec_id, generate_subscripts(v, 1) AS ord,
                 unnest(v) AS val FROM e),
    b AS (SELECT ord, min(val) AS mn, max(val) AS mx FROM u GROUP BY ord)
"""


@register(
    "q_sq_encode",
    sql=_SQ_BOUNDS_CTE
    + f"""
    SELECT u.vec_id,
           CAST(u.ord AS INT)              AS ord,
           CAST({_SQ_CODE_SQL} AS INT)     AS code
    FROM u JOIN b USING (ord)
    """,
    doc=(
        "SQ8 scalar quantization encode (X3 compression ladder, ~4x at "
        "rest): per-dim [min,max] bounds from one posexplode aggregation, "
        "then a pure map-side transform to 8-bit codes. Fully "
        "deterministic closed form, so unlike the codebook-dependent "
        "PQ/IVF family it carries a complete DuckDB oracle "
        "(floor-before-int-cast on both engines). The API returns the "
        "packed array<int> codes column (test_sq.py); the driver row "
        "posexplodes it to (vec_id, ord, code) long format because the "
        "harness canonicalizer cannot sort/hash array cells (the "
        "q_explode_embeddings precedent)."
    ),
)
def q_sq_encode(spark, sf_dir):
    from ..operators import sq as SQ

    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, "sq")
    bounds = _IVF_FIT_CACHE.get(key)
    if bounds is None:
        bounds = SQ.fit_sq_bounds(emb)
        _IVF_FIT_CACHE[key] = bounds
    enc = SQ.sq_encode(emb, *bounds)
    return enc.select(
        "vec_id", F.posexplode("codes").alias("pos", "code")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).cast("int").alias("ord"),
        F.col("code").cast("int").alias("code"),
    )


@register(
    "q_sq_topk",
    sql=_SQ_BOUNDS_CTE
    + f""",
    dec AS (
      SELECT u.vec_id,
             list(b.mn + {_SQ_CODE_SQL} / 255.0 * (b.mx - b.mn)
                  ORDER BY u.ord) AS dv
      FROM u JOIN b USING (ord)
      GROUP BY u.vec_id
    ),
    q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 5)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, dec.vec_id AS neighbor_id,
             list_dot_product(q.v, dec.dv)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(dec.dv, dec.dv))) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, dec.dv)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(dec.dv, dec.dv))) DESC,
                 dec.vec_id
             ) AS rank
      FROM q JOIN dec ON q.vec_id != dec.vec_id
    ) WHERE rank <= 5
    """,
    doc=(
        "Approximate cosine top-5 over SQ8 codes: decode-on-the-fly corpus "
        "reconstruction vs true broadcast query vectors (the q_cosine_topk "
        "shape over a ~4x-smaller corpus at rest). Deterministic closed "
        "form -> full DuckDB oracle, the first oracle-checked member of "
        "the compressed-search family (fold/list_dot_product bit-parity "
        "proven by q_cosine_topk)."
    ),
)
def q_sq_topk(spark, sf_dir):
    from ..operators import sq as SQ

    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, "sq")
    bounds = _IVF_FIT_CACHE.get(key)
    if bounds is None:
        bounds = SQ.fit_sq_bounds(emb)
        _IVF_FIT_CACHE[key] = bounds
    enc = SQ.sq_encode(emb, *bounds)
    return SQ.sq_topk(enc, emb.filter(F.col("vec_id") < 5), *bounds, k=5)


@register(
    "q_ivf_pq_topk",
    # Persisted-artifact oracle (r12; probes persisted r13): the
    # raw-encoding twin of q_ivf_pq_residual's replay — same persisted
    # probe artifact and shortlist machinery, ADC score WITHOUT the
    # per-(query, cell) centroid term.
    sql=f"""
    WITH m AS (
      SELECT codebooks, centroids
      FROM read_json_auto('{_IVFPQ_RAW_ORACLE_ROOT}/codebooks/*.json')
    ),
    cd AS (
      SELECT vec_id, cell, codes, vhat_sq
      FROM read_parquet('{_IVFPQ_RAW_ORACLE_ROOT}/codes/*.parquet')
    ),
    q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
      FROM embeddings WHERE vec_id < 5
    ),
    probes AS (
      SELECT query_id, cell
      FROM read_parquet('{_IVFPQ_RAW_ORACLE_ROOT}/probes/*.parquet')
    ),
    adc AS (
      SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id, q.v AS qv,
             CASE WHEN cd.vhat_sq > 0 AND q.qn > 0 THEN
               list_reduce(
                 list_transform(range(1, 17),
                   s -> list_dot_product(q.v[((s-1)*4+1):(s*4)],
                                         m.codebooks[s][cd.codes[s] + 1])),
                 (a, x) -> a + x)
               / (q.qn * sqrt(cd.vhat_sq))
             END AS adc_sim
      FROM probes p
      JOIN q ON q.vec_id = p.query_id
      JOIN cd ON cd.cell = p.cell AND cd.vec_id != q.vec_id
      CROSS JOIN m
    ),
    short AS (
      SELECT query_id, neighbor_id, qv,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_sim DESC NULLS LAST, neighbor_id) AS rr
      FROM adc
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(s.qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(s.qv, s.qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos_sim,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY list_dot_product(s.qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(s.qv, s.qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC NULLS LAST,
               s.neighbor_id) AS rank
      FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
      WHERE s.rr <= 100
    ) WHERE rank <= 5
    """,
    doc=(
        "IVF-PQ composed ANN (X3 production path): IVF cells prune the scan "
        "to nprobe/cells of the corpus via a cell-id equi-join, ADC orders "
        "the survivors over 8-byte PQ codes, exact cosine re-ranks the "
        "100-candidate shortlist. Measured recall@5 0.76 at nprobe=8/16 "
        "cells on the near-uniform sf0.1 fixture (ANN_RECALL.json 'ivfpq'; "
        "tests/test_pq.py pins probe-all == pq_topk and the 0.70 floor). "
        "Oracle-flipped r12: served AT REST via ivf_pq_search_index over a "
        "persisted raw IVF-PQ index (codes + cells + centroids), with the "
        "DuckDB twin replaying probe selection, cell join, raw ADC order, "
        "shortlist and exact rerank over the same artifacts."
    ),
)
def q_ivf_pq_topk(spark, sf_dir):
    from ..operators import ivf as I
    from ..operators import pq as Q

    emb = _t(spark, sf_dir, "embeddings")
    ckey = (sf_dir, 8, 2)
    centroids = _IVF_FIT_CACHE.get(ckey)
    if centroids is None:
        centroids = I.fit_ivf_centroids(emb, k=8, iters=2)
        _IVF_FIT_CACHE[ckey] = centroids
    bkey = (sf_dir, "pq", 16, 16, 3)
    books = _IVF_FIT_CACHE.get(bkey)
    if books is None:
        books = Q.fit_pq_codebooks(emb, m=16, ncodes=16, iters=3)
        _IVF_FIT_CACHE[bkey] = books
    if _IVF_FIT_CACHE.get("ivfpq_raw_oracle_sf") != sf_dir:
        wf = I.well_formed_vectors(emb, "embedding")
        codes = Q.pq_encode(emb, books).join(
            I.assign_cells(wf, centroids, nprobe=1).select("vec_id", "cell"),
            "vec_id",
        )
        Q.write_pq_index(
            codes, books, _IVFPQ_RAW_ORACLE_ROOT, mode="overwrite",
            centroids=centroids,
        )
        _write_probes_artifact(
            spark, emb.filter(F.col("vec_id") < 5), centroids, 4,
            _IVFPQ_RAW_ORACLE_ROOT,
        )
        _IVF_FIT_CACHE["ivfpq_raw_oracle_sf"] = sf_dir
    return Q.ivf_pq_search_index(
        spark, _IVFPQ_RAW_ORACLE_ROOT, emb.filter(F.col("vec_id") < 5),
        corpus=emb, k=5, nprobe=4, rerank=100,
        query_probes=spark.read.parquet(f"{_IVFPQ_RAW_ORACLE_ROOT}/probes"),
    )


@register(
    "q_embedding_near_dup",
    sql=f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300
    ), banded AS (
      {"$BANDS$"}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT id_a, id_b,
             list_dot_product(va.v, vb.v)
               / (sqrt(list_dot_product(va.v, va.v))
                  * sqrt(list_dot_product(vb.v, vb.v))) AS cos_sim
      FROM cand JOIN base va ON va.vec_id = cand.id_a
                JOIN base vb ON vb.vec_id = cand.id_b
    ) WHERE cos_sim >= 0.25
    """.replace(
        "$BANDS$",
        "\n      UNION ALL ".join(
            f"SELECT vec_id, {i} AS band, "
            + _sql_sign_sig(S.plane_weights(8, _EMB_DIM, 42 + 7919 * i))
            + " AS key FROM base"
            for i in range(4)
        ),
    ),
    doc=(
        "Embedding-cosine near-duplicate pairs via banded sign-LSH + exact "
        "rescoring, fully oracle-replayed (4 bands x 8 hyperplanes from the "
        "identical plane literals, band bucket join, cosine verify). "
        "Threshold 0.25: the synthetic embeddings carry no planted "
        "near-dups (max pairwise cosine ≈0.4), so a production-grade 0.8 "
        "gate would emit zero rows and the driver row would prove nothing "
        "(0.25 keeps ~70 verified pairs in the oracle diff) — "
        "recall at high thresholds is pinned on planted dups in "
        "tests/test_similarity.py instead."
    ),
)
def q_embedding_near_dup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return S.embedding_near_dup_pairs(emb, threshold=0.25)


# ---------------------------------------------------------------- sketches (X5)
@register(
    "q_exact_distinct",
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type
    """,
    doc="Exact distinct-count baseline for the sketch below.",
)
def q_exact_distinct(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("distinct_users")
    )


@register(
    "q_approx_distinct",
    sql=None,  # HLL++ estimates are engine-specific; bounds asserted in tests
    doc="HyperLogLog++ distinct users per event type (X5; rsd=0.05).",
)
def q_approx_distinct(spark, sf_dir):
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.05).alias("approx_users")
    )


@register(
    "q_heavy_hitters",
    sql=None,  # freqItems returns an approximate SUPERSET in engine-specific
    # order; the planted-hitter containment invariant is pinned in
    # tests/test_text.py::test_frequent_items_contains_planted_hitter
    doc=(
        "Karp et al. frequent items (X5): event types above 10% support in "
        "one pass with no shuffle of raw values — the 100 TB replacement "
        "for an exact groupBy-count top-k when only the heavy tail matters."
    ),
)
def q_heavy_hitters(spark, sf_dir):
    from ..operators.sketches import frequent_items

    e = _events(spark, sf_dir)
    hh = frequent_items(e.select("event_type"), ["event_type"], 0.1)
    # freqItems returns ONE row holding an array column; explode to one
    # scalar row per hitter — the registry-wide output-shape contract
    # (r14 verdict item 2) bans top-level array cells even on rows-only
    # queries
    return hh.select(
        F.explode("event_type_freqItems").alias("event_type")
    )


@register(
    "q_heavy_hitters_exact",
    sql="""
    WITH c AS (
      SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
    ), t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
    SELECT event_type, cnt,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS support
    FROM c CROSS JOIN t
    WHERE CAST(cnt AS DOUBLE) >= 0.1 * CAST(total AS DOUBLE)
    """,
    doc=(
        "Exact oracle twin of q_heavy_hitters (round-6 verdict item 5): "
        "items at >=10% support by exact count-threshold — grouped count + "
        "broadcast 1-row grand total (partial-agg'd), "
        "HAVING cnt >= support*total. The freqItems sketch form stays "
        "rows-only (approximate superset by construction) with its planted-"
        "hitter containment pytest; this twin gives the family a "
        "rows+schema+hash CORRECTNESS row. Support ratio is one division "
        "of exact BIGINTs — engine-exact."
    ),
)
def q_heavy_hitters_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    c = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    total = c.agg(F.sum("cnt").alias("total"))
    return (
        c.join(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            >= F.lit(0.1) * F.col("total").cast("double")
        )
        .select(
            "event_type",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
                "support"
            ),
        )
    )


@register(
    "q_quantiles_approx",
    sql=None,  # sketch interpolation is engine-specific; q_quantiles is the exact twin
    doc=(
        "percentile_approx quantiles per group — the 100 TB path (bounded "
        "sketch merge, no per-group sort); q_quantiles is its exact, "
        "oracle-checked twin and the accuracy yardstick in tests."
    ),
)
def q_quantiles_approx(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.25), F.lit(10000)).alias("p25"),
        F.percentile_approx("l_extendedprice", F.lit(0.50), F.lit(10000)).alias("p50"),
        F.percentile_approx("l_extendedprice", F.lit(0.75), F.lit(10000)).alias("p75"),
    )


@register(
    "q_quantiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated quantiles per group (sketch twin percentile_approx is rows-only in tests).",
)
def q_quantiles(spark, sf_dir):
    # ONE percentile buffer for all three probs instead of three identical
    # full-multiset buffers: measured 3.5 s → 1.15 s warm (alternating A/B),
    # values unchanged (same exact sorted multiset, same interpolation per
    # prob).
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    qs = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("__qs__")
    )
    return qs.select(
        "l_returnflag",
        F.round(F.element_at("__qs__", 1), 4).alias("p25"),
        F.round(F.element_at("__qs__", 2), 4).alias("p50"),
        F.round(F.element_at("__qs__", 3), 4).alias("p75"),
    )


@register(
    "q_normalize_url",
    sql="""
    WITH variants AS (
      SELECT 'https://www.' || source || '.example.com/articles/' || doc_id AS url
      FROM documents
      UNION ALL
      SELECT 'http://' || source || '.example.com/articles/' || doc_id
             || '?utm_source=feed' FROM documents
      UNION ALL
      SELECT 'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM/articles/'
             || doc_id || '/#comments' FROM documents
    ), normed AS (
      SELECT regexp_replace(
               lower(regexp_extract(no_slash, '^([^/]*)', 1)),
               '^www\\.', '')
             || regexp_replace(no_slash, '^[^/]*', '') AS norm_url
      FROM (
        SELECT regexp_replace(
                 regexp_replace(
                   regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                   '[?#].*$', ''),
                 '/+$', '') AS no_slash
        FROM variants
      )
    )
    SELECT norm_url, count(*) AS n_variants
    FROM normed GROUP BY norm_url
    """,
    doc=(
        "URL canonicalization for SOURCEURL dedup keying (reference's only "
        "URL surface: scraping/scraper.py:115): scheme/www/query/fragment/"
        "trailing-slash-insensitive, host lowercased, path case preserved. "
        "Three syndication variants per document (https+www, http+tracking "
        "params, shouty-host+fragment) must collapse to ONE key each — the "
        "oracle replays the identical regexp chain in DuckDB and checks the "
        "grouped variant counts. Pure column algebra, zero Python on the "
        "hot path."
    ),
)
def q_normalize_url(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    stem = F.concat(
        F.col("source"), F.lit(".example.com/articles/"), F.col("doc_id").cast("string")
    )
    shouty = F.concat(
        F.upper(F.col("source")),
        F.lit(".EXAMPLE.COM/articles/"),
        F.col("doc_id").cast("string"),
    )
    variants = (
        d.select(F.concat(F.lit("https://www."), stem).alias("url"))
        .unionAll(
            d.select(
                F.concat(F.lit("http://"), stem, F.lit("?utm_source=feed")).alias("url")
            )
        )
        .unionAll(
            d.select(
                F.concat(F.lit("HTTPS://WWW."), shouty, F.lit("/#comments")).alias("url")
            )
        )
    )
    return (
        variants.select(X.normalize_url("url").alias("norm_url"))
        .groupBy("norm_url")
        .agg(F.count(F.lit(1)).alias("n_variants"))
    )


_SQL_SIMHASH_KEYS = ", ".join(
    "CAST("
    + " + ".join(f"bits[{16 * c + j + 1}] * {1 << j}" for j in range(16))
    + f" AS BIGINT) AS key{c}"
    for c in range(4)
)


@register(
    "q_simhash_signature",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE doc_id < 200
    ), hs AS (
      SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs FROM tok
    ), bits AS (
      SELECT doc_id, [{_SQL_SIMHASH_BITS}] AS bits FROM hs
    )
    SELECT doc_id, {_SQL_SIMHASH_KEYS} FROM bits
    """,
    doc=(
        "SimHash signature kernel (md5 family) as its four 16-bit block "
        "keys, one row per document: every bit of every signature is "
        "oracle-checked (the pairs query q_dedup_simhash only evidences "
        "signatures of surviving candidates). Pure expression, scan-stage "
        "computed, no shuffle."
    ),
)
def q_simhash_signature(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sig = X.simhash64(F.col("text"), hash_family="md5")
    out = d.select(F.col("doc_id"), sig.alias("__sig__"))
    return out.select(
        "doc_id",
        *[
            F.shiftright(F.col("__sig__"), 16 * c)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("long")
            .alias(f"key{c}")
            for c in range(4)
        ],
    )


# ---------------------------------------------------------------- SemDeDup (X2/X3)
@register(
    "q_semantic_dedup",
    sql="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 1000
    ), cent AS (
      SELECT vec_id AS c_id, v AS cv FROM base
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    ), scored AS (
      SELECT b.vec_id, b.v, c.c_id,
             list_dot_product(b.v, c.cv)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(c.cv, c.cv))) AS cos_c
      FROM base b CROSS JOIN cent c
    ), assigned AS (
      SELECT vec_id, v, c_id AS cluster_id, cos_c AS cos_to_centroid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos_c DESC, c_id
        ) AS rn FROM scored
      ) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       AND list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.25
    )
    SELECT vec_id, cluster_id, cos_to_centroid
    FROM assigned
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
    doc=(
        "SemDeDup-style semantic dedup (Abbas et al. 2023): cluster around "
        "8 hash-ranked exemplar centroids, drop every row with a smaller-id "
        "cosine-duplicate in its cluster. Fully oracle-replayed — the md5 "
        "exemplar rank, the argmax-cosine assignment, the within-cluster "
        "pair join and the min-id dominance rule all recompute identically "
        "in DuckDB (IEEE folds over identical doubles). Threshold 0.25 "
        "matches the synthetic corpus' cosine range (max pairwise ~0.4, "
        "as q_embedding_near_dup); production-threshold recall is pinned "
        "on planted duplicates in tests/test_similarity.py. Corpus capped "
        "at vec_id < 1000 (no-op at the sf0.01 oracle scale) so the exact "
        "within-cluster pair stage stays bounded at bench sf — the "
        "uncapped 100 TB route is raising k with corpus size, which a "
        "static oracle string cannot express."
    ),
)
def q_semantic_dedup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return S.semantic_dedup(emb, k=8, threshold=0.25)


# ---------------------------------------------------------------- CDC diff
@register(
    "q_snapshot_diff",
    sql="""
    WITH old AS (
      SELECT doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 5 <> 0
    ), new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL
       OR o.text IS DISTINCT FROM n.text
       OR o.lang IS DISTINCT FROM n.lang
       OR o.source IS DISTINCT FROM n.source
       OR o.n_chars IS DISTINCT FROM n.n_chars
    """,
    doc=(
        "Row-level CDC between two lake snapshots (added/removed/changed "
        "by key) — the row-level twin of the reference's file-level "
        "skip-existing incrementality (scraper.py:239-242, "
        "converter.py:118-125). Spark diffs 8-byte null-sentinel xxhash64 "
        "digests so payloads never shuffle; the oracle compares the values "
        "directly (IS DISTINCT FROM), so the digest equivalence itself is "
        "under test. Snapshots derived deterministically from documents: "
        "old = doc_id%5<>0, new = doc_id%3<>0 with text uppercased at "
        "doc_id%11=0."
    ),
)
def q_snapshot_diff(spark, sf_dir):
    from ..operators import cdc as C

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 3 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    return C.snapshot_diff(old, new, key_cols=["doc_id"])


@register(
    "q_dedup_against_bloom",
    sql="""
    SELECT d.doc_id, d.source FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents r WHERE r.source = 'src1' AND r.text = d.text
    )
    """,
    doc=(
        "Cross-corpus exact dedup through the broadcast-bloom prefilter "
        "(the 100 TB shape: crawl rows failing any bloom probe never "
        "shuffle; only bloom-positive candidates reach the exact hash "
        "anti-join). Result is EXACT — false positives die in the verify "
        "join, false negatives are impossible — so the oracle is the plain "
        "NOT EXISTS twin, same as q_dedup_against; equality with the "
        "unfiltered operator is also pinned by a differential pytest."
    ),
)
def q_dedup_against_bloom(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("source") == "src1")
    return D.dedup_against_bloom(d, ref, num_bits=1 << 13, num_hashes=5).select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------- domain curation
@register(
    "q_domain_stats",
    sql="""
    WITH urls AS (
      SELECT doc_id, n_chars,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://www.' ELSE 'http://' END)
             || (CASE WHEN doc_id % 4 = 0 THEN 'news.' ELSE '' END)
             || source || '.example.com'
             || (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END)
             || '/articles/' || doc_id AS url
      FROM documents
    ), domains AS (
      SELECT doc_id, n_chars,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   lower(regexp_extract(
                     regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                     '^([^/?#]*)', 1)),
                   '^[^@]*@', ''),
                 ':[0-9]+$', ''),
               '^www\\.', '') AS domain
      FROM urls
    )
    SELECT domain, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
    FROM domains
    WHERE domain NOT IN ('src0.example.com', 'news.src2.example.com')
    GROUP BY domain
    """,
    doc=(
        "Per-domain corpus stats behind a blocklist — the domain-curation "
        "stage every crawl pipeline runs (per-domain quality priors, crawl "
        "budgets, spam blocklists). url_domain() is pure regexp column "
        "algebra (scheme/userinfo/port/www-insensitive), the blocklist is a "
        "broadcast anti-join, and the aggregate is one hash shuffle on the "
        "domain key. URLs derived deterministically from documents "
        "(scheme/subdomain/port varied by doc_id residues) so the extractor "
        "is exercised across all its normalizations; oracle replays the "
        "identical regexp chain in DuckDB."
    ),
)
def q_domain_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://www.")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 4 == 0, F.lit("news.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/articles/"),
        F.col("doc_id").cast("string"),
    )
    blocklist = spark.createDataFrame(
        [("src0.example.com",), ("news.src2.example.com",)], "domain string"
    )
    return (
        d.withColumn("domain", X.url_domain(url))
        .join(F.broadcast(blocklist), "domain", "left_anti")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------- TF-IDF keywords
@register(
    "q_tfidf_keywords",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150
    ), toks AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM docs
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfx AS (
      SELECT term, count(*) AS df_cnt FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM docs
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT tf.doc_id, tf.term,
             tf.tf * (n.n_docs - dfx.df_cnt + 0.5) / (dfx.df_cnt + 0.5) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * (n.n_docs - dfx.df_cnt + 0.5)
                          / (dfx.df_cnt + 0.5) DESC, tf.term
             ) AS rank
      FROM tf JOIN dfx USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    """,
    doc=(
        "Top-3 keywords per document by tf-idf with the rational BM25-style "
        "idf (N - df + 0.5)/(df + 0.5): same ranking as the log form for "
        "fixed N, but every operation is IEEE-bit-identical across engines "
        "(ln is not), so the score column itself is hash-checked. Two "
        "map-side-partial aggregations, a shuffle join on the term key, a "
        "broadcast one-row corpus count, and a per-doc ranked window."
    ),
)
def q_tfidf_keywords(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return X.tfidf_top_terms(d, "doc_id", "text", k=3)


def _sql_minhash_side(name: str, where: str) -> str:
    """CTE chain (docs → shingles → hash pairs → signature → bands) for one
    side of the asymmetric LSH join; same construction as q_dedup_minhash."""
    return f"""
    docs_{name} AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE {where}
    ), sh_{name} AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM docs_{name}
    ), hp_{name} AS (
      SELECT doc_id,
             list_transform(
               list_transform(sh, s -> md5(s)),
               m -> [('0x' || substr(m, 1, 10))::BIGINT,
                     ('0x' || substr(m, 11, 10))::BIGINT]) AS hp
      FROM sh_{name}
    ), sig_{name} AS (
      SELECT doc_id, [{_SQL_MINHASH_SIG}] AS hs FROM hp_{name}
    ), banded_{name} AS (
      SELECT doc_id, b,
             md5(concat_ws(',', hs[b*4+1], hs[b*4+2], hs[b*4+3], hs[b*4+4],
                           CAST(b AS VARCHAR))) AS bucket
      FROM sig_{name}, (SELECT unnest(range(0, 16)) AS b)
    )"""


@register(
    "q_dedup_near_against",
    sql=f"""
    WITH {_sql_minhash_side("new", "doc_id < 150")},
    {_sql_minhash_side("ref", "doc_id >= 150 AND doc_id < 300")},
    cand AS (
      SELECT DISTINCT a.doc_id AS id, c.doc_id AS ref_id
      FROM banded_new a JOIN banded_ref c
        ON a.b = c.b AND a.bucket = c.bucket
    )
    SELECT id, ref_id, jaccard_sim FROM (
      SELECT id, ref_id,
             len(list_intersect(sa.sh, sb.sh))
               / greatest(len(list_distinct(sa.sh || sb.sh)), 1) AS jaccard_sim
      FROM cand JOIN sh_new sa ON sa.doc_id = id
                JOIN sh_ref sb ON sb.doc_id = ref_id
    ) WHERE jaccard_sim >= 0.6
    """,
    doc=(
        "Asymmetric MinHash+LSH near-dup join: NEW batch (doc_id < 150) vs "
        "REFERENCE snapshot (150-299) — the near-dup twin of "
        "q_dedup_against (which only catches byte-exact matches). md5 "
        "Kirsch-Mitzenmacher family, so DuckDB replays the full pipeline "
        "on both sides plus the cross-corpus bucket join and verify. At "
        "scale the reference's banded frame is computed once and persisted;"
        " each incremental crawl batch joins against it."
    ),
)
def q_dedup_near_against(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") < 150)
    ref = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    return D.minhash_near_dup_against(
        new, ref, "doc_id", "text", threshold=0.6, hash_family="md5"
    )


_SQL_INDEP_SIG = ", ".join(
    "list_min(list_transform(sh, s -> "
    f"('0x' || substr(md5(s || '|{i}'), 1, 15))::BIGINT))"
    for i in range(64)
)


@register(
    "q_minhash_index",
    sql=f"""
    WITH {_sql_minhash_side("new", "doc_id < 150")},
    {_sql_minhash_side("ref", "doc_id >= 150 AND doc_id < 300")},
    isig_new AS (
      SELECT doc_id, [{_SQL_INDEP_SIG}] AS hs FROM sh_new
    ), isig_ref AS (
      SELECT doc_id, [{_SQL_INDEP_SIG}] AS hs FROM sh_ref
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id, c.doc_id AS ref_id
      FROM banded_new a JOIN banded_ref c
        ON a.b = c.b AND a.bucket = c.bucket
    )
    SELECT id, ref_id, est_jaccard FROM (
      SELECT id, ref_id,
             len(list_filter(range(1, 65), i -> sa.hs[i] = sb.hs[i])) / 64.0
               AS est_jaccard
      FROM cand JOIN isig_new sa ON sa.doc_id = id
                JOIN isig_ref sb ON sb.doc_id = ref_id
    ) WHERE est_jaccard >= 0.6
    """,
    doc=(
        "PERSISTED MinHash signature index (r10): the reference snapshot "
        "(doc_id 150-299) is signatures-at-rest — <path>/bands for "
        "candidate joins, <path>/sigs for match-time similarity, meta "
        "JSON pinning the LSH parameter set — and the new batch "
        "(doc_id < 150) matches against it WITHOUT the reference text "
        "ever being stored or re-read (~8(k+bands) bytes/doc instead of "
        "documents). Similarity is the signature-estimated Jaccard "
        "(agreeing-minhash fraction, the standard k-sample estimator); "
        "the oracle replays signatures on both sides, the bucket join, "
        "and the agreement count — the full pipeline, hash-checked. "
        "Index bootstrap is session-memoized (q_pq_append precedent); "
        "incremental append==one-shot-build parity is pinned in "
        "tests/test_minhash_index.py."
    ),
)
def q_minhash_index(spark, sf_dir):
    import os
    import re

    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") < 150)
    ref = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        f"minhash_index_{tag}",
    )
    boot_key = (sf_dir, "minhash_index_built")
    if boot_key not in _IVF_FIT_CACHE:
        D.write_minhash_index(
            ref, root, "doc_id", "text", hash_family="md5", mode="overwrite"
        )
        _IVF_FIT_CACHE[boot_key] = True
    return D.minhash_match_index(spark, root, new, "doc_id", "text", threshold=0.6)


@register(
    "q_dedup_minhash_index",
    sql=f"""
    WITH {_sql_minhash_side("new", "doc_id < 150")},
    {_sql_minhash_side("ref", "doc_id >= 150 AND doc_id < 300")},
    isig_new AS (
      SELECT doc_id, [{_SQL_INDEP_SIG}] AS hs FROM sh_new
    ), isig_ref AS (
      SELECT doc_id, [{_SQL_INDEP_SIG}] AS hs FROM sh_ref
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id, c.doc_id AS ref_id
      FROM banded_new a JOIN banded_ref c
        ON a.b = c.b AND a.bucket = c.bucket
    ),
    matched AS (
      SELECT DISTINCT id FROM (
        SELECT id,
               len(list_filter(range(1, 65), i -> sa.hs[i] = sb.hs[i])) / 64.0
                 AS est_jaccard
        FROM cand JOIN isig_new sa ON sa.doc_id = id
                  JOIN isig_ref sb ON sb.doc_id = ref_id
      ) WHERE est_jaccard >= 0.6
    )
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id < 150 AND doc_id NOT IN (SELECT id FROM matched)
    """,
    doc=(
        "Crawl-ingest KEEP/DROP decision over the persisted MinHash "
        "signature index (r11, closing the q_minhash_index story): the "
        "new batch (doc_id < 150) keeps only rows with NO index match at "
        "threshold 0.6 — a distinct-ids anti-join over the match frame, "
        "so the decision inherits the match path's scale shape (bands "
        "candidate join + signature-estimate verify; reference text never "
        "stored or re-read). md5 family, so the oracle replays the ENTIRE "
        "decision — both signature sides, the bucket join, the agreement "
        "estimate, and the NOT IN — making the keep-set hash-checked, not "
        "just row-counted. Shares q_minhash_index's session-memoized "
        "index bootstrap (same root, same memo key)."
    ),
)
def q_dedup_minhash_index(spark, sf_dir):
    import os
    import re

    d = _t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") < 150)
    ref = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        f"minhash_index_{tag}",
    )
    boot_key = (sf_dir, "minhash_index_built")
    if boot_key not in _IVF_FIT_CACHE:
        D.write_minhash_index(
            ref, root, "doc_id", "text", hash_family="md5", mode="overwrite"
        )
        _IVF_FIT_CACHE[boot_key] = True
    kept = D.dedup_against_minhash_index(
        spark, root, new, "doc_id", "text", threshold=0.6
    )
    return kept.select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------- winsorize
@register(
    "q_winsorize",
    sql="""
    WITH th AS (
      SELECT l_returnflag,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS lo,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           count(*) FILTER (WHERE l.l_extendedprice < th.lo) AS n_clipped_low,
           count(*) FILTER (WHERE l.l_extendedprice > th.hi) AS n_clipped_high,
           round(avg(least(greatest(l.l_extendedprice, th.lo), th.hi)), 4)
             AS mean_wins
    FROM lineitem l JOIN th USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc=(
        "Winsorized per-group mean (outlier hygiene for quality scores): "
        "p05/p95 thresholds per group from ONE tiny aggregate, broadcast "
        "back, map-side clip, then the grouped mean — the row stream never "
        "shuffles for the clip itself. Exact percentile interpolation is "
        "cross-engine on identical doubles (q_quantiles); the mean is "
        "rounded like every double aggregate."
    ),
)
def q_winsorize(spark, sf_dir):
    from ..operators import profile as P

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = P.winsorize(li, "l_extendedprice", group_col="l_returnflag")
    return w.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_extendedprice_clipped_low"), 1)).alias("n_clipped_low"),
        F.count(F.when(F.col("l_extendedprice_clipped_high"), 1)).alias("n_clipped_high"),
        F.round(F.avg("l_extendedprice_wins"), 4).alias("mean_wins"),
    )


# ---------------------------------------------------------------- mergeable sketches
@register(
    "q_hll_rollup",
    sql=None,  # DataSketches binary sketches have no DuckDB twin; the
    # sketch-vs-exact tolerance and union-idempotence invariants are pinned
    # in tests/test_plans.py::test_hll_rollup_*
    doc=(
        "Incremental distinct-count maintenance (X5 scale path): per-"
        "(event_type, day) HLL sketches — the kilobyte pre-aggregate a lake "
        "persists per partition — unioned up to per-event_type estimates "
        "without touching raw events. HLL union is exact over overlap, so "
        "re-processing a day never double-counts; estimates are within "
        "~1.6% of exact at lg_k=12 (tolerance pinned in pytest vs the "
        "exact twin q_exact_distinct)."
    ),
)
def q_hll_rollup(spark, sf_dir):
    from ..operators import sketches as SK

    ev = _events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = SK.hll_sketch_table(ev, ["event_type", "day"], "user_id")
    return SK.hll_rollup_estimate(daily, ["event_type"])


# --------------------------------------------------- model-free semantic dedup
_SQL_HASHED_VEC = """
    tok AS (
      SELECT doc_id, {toks} AS toks
      FROM documents WHERE doc_id < 200
    ), ex AS (
      SELECT doc_id, unnest(toks) AS t FROM tok
    ), tb AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 10))::BIGINT % 64 AS b,
             CASE WHEN (('0x' || substr(md5(t), 11, 1))::INTEGER % 2) = 0
                  THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS s
      FROM ex
    ), bw AS (
      SELECT doc_id, b, sum(s) AS w FROM tb GROUP BY doc_id, b
    ), mv AS (
      SELECT doc_id, map_from_entries(list({{'k': b, 'v': w}})) AS m
      FROM bw GROUP BY doc_id
    ), base AS (
      SELECT doc_id AS vec_id,
             list_transform(range(0, 64), i -> coalesce(m[i][1], 0.0::DOUBLE)) AS v
      FROM mv
    )""".format(toks=_SQL_TOKENS)


@register(
    "q_hashed_semantic_dedup",
    sql=f"""
    WITH {_SQL_HASHED_VEC},
    nz AS (
      SELECT vec_id, v FROM base WHERE list_dot_product(v, v) > 0
    ), cent AS (
      SELECT vec_id AS c_id, v AS cv FROM nz
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 6
    ), scored AS (
      SELECT b.vec_id, b.v, c.c_id,
             list_dot_product(b.v, c.cv)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(c.cv, c.cv))) AS cos_c
      FROM nz b CROSS JOIN cent c
    ), assigned AS (
      SELECT vec_id, v, c_id AS cluster_id, cos_c AS cos_to_centroid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos_c DESC, c_id
        ) AS rn FROM scored
      ) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       AND list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.8
    )
    SELECT vec_id AS doc_id, cluster_id, cos_to_centroid
    FROM assigned
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
    doc=(
        "Model-free semantic dedup over RAW TEXT: hashing-trick document "
        "vectors (signed token counts, md5 bucket/sign family, "
        "un-normalized so counts stay exactly representable) feed straight "
        "into the SemDeDup operator — the composition that runs embedding-"
        "style dedup on tables that ship no embeddings. The oracle replays "
        "the whole chain: tokenize, hash to 64 dims, sparse-to-dense "
        "assembly, zero-vector guard, exemplar centroids, argmax "
        "assignment, dominance rule. 81 of 200 docs drop at cosine 0.8 on "
        "the synthetic corpus's near-dup pairs."
    ),
)
def q_hashed_semantic_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    vec = X.hashed_feature_vector(d, dim=64, hash_family="md5").filter(
        F.exists("vector", lambda x: x != 0)
    )
    return S.semantic_dedup(vec, k=6, threshold=0.8, id_col="doc_id", vec_col="vector")


@register(
    "q_histogram",
    sql="""
    SELECT l_returnflag, bucket,
           1000.0 + bucket * ((60000.0 - 1000.0) / 20) AS bucket_lo,
           count(*) AS n
    FROM (
      SELECT l_returnflag,
             CAST(least(greatest(floor((l_extendedprice - 1000.0)
                 / ((60000.0 - 1000.0) / 20)), 0), 19) AS BIGINT) AS bucket
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    GROUP BY l_returnflag, bucket
    """,
    doc=(
        "Fixed-width numeric histogram (20 buckets of l_extendedprice over "
        "[1000, 60000) per return flag, out-of-range clamped to the edges) "
        "— the profile-stage staple, as pure floor arithmetic so both "
        "engines derive identical bucket ids. One map-side-partial "
        "aggregation, no sort, no width_bucket dialect dependence."
    ),
)
def q_histogram(spark, sf_dir):
    from ..operators import profile as P

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return P.numeric_histogram(
        li, "l_extendedprice", 1000.0, 60000.0, 20, group_col="l_returnflag"
    )


@register(
    "q_setsim_join",
    sql=f"""
    WITH s AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS st
      FROM documents WHERE doc_id < 120
    )
    SELECT id_a, id_b, jaccard_sim FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.st, b.st))
               / greatest(len(list_distinct(a.st || b.st)), 1) AS jaccard_sim
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    ) WHERE jaccard_sim >= 0.5
    """,
    doc=(
        "EXACT set-similarity self-join (prefix filtering, PPJoin family): "
        "ALL token-set pairs with Jaccard >= 0.5 — the lossless alternative "
        "to MinHash when missed pairs are unacceptable. The oracle is the "
        "brute-force all-pairs join, so the driver hash-check proves the "
        "prefix filter drops NO qualifying pair; candidate-space pruning "
        "vs brute force is pinned in tests."
    ),
)
def q_setsim_join(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    toks = d.select("doc_id", X.tokens("text").alias("toks"))
    return D.set_similarity_join(toks, "doc_id", "toks", threshold=0.5)


@register(
    "q_containment_join",
    sql=f"""
    WITH a AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS st
      FROM documents WHERE doc_id < 100
    ), b AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS st
      FROM documents WHERE doc_id >= 100 AND doc_id < 250
    )
    SELECT id, ref_id, containment FROM (
      SELECT a.doc_id AS id, b.doc_id AS ref_id,
             len(list_intersect(a.st, b.st))
               / greatest(len(a.st), 1) AS containment
      FROM a JOIN b ON TRUE
    ) WHERE containment >= 0.8
    """,
    doc=(
        "EXACT asymmetric containment join (|a∩b|/|a| >= 0.8): how much of "
        "each new doc's token set lies inside a reference doc — the quote/"
        "subset detector symmetric Jaccard under-scores across size "
        "mismatches. Prefix filtering on the probe side only (rare-first "
        "by frequency), full index on the reference side; the brute-force "
        "all-pairs oracle proves losslessness."
    ),
)
def q_containment_join(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") < 100).select("doc_id", X.tokens("text").alias("toks"))
    b = (
        d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250))
        .select("doc_id", X.tokens("text").alias("toks"))
    )
    return D.containment_join(a, b, "doc_id", "toks", threshold=0.8)


@register(
    "q_boilerplate_lines",
    sql="""
    WITH docs AS (
      SELECT doc_id,
             'SITE HEADER NAVIGATION' || chr(10) || text || chr(10) ||
             (CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
                   ELSE 'copyright 2024 example corp' END) AS text
      FROM documents WHERE doc_id < 150
    ), la AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs
    ), lines AS (
      SELECT doc_id, i AS pos, ls[i] AS ln
      FROM la, unnest(range(1, len(ls) + 1)) AS t(i)
    ), common AS (
      SELECT ln FROM (
        SELECT ln, count(DISTINCT doc_id) AS nd
        FROM lines WHERE trim(ln) != '' GROUP BY ln
      ) WHERE nd >= 10
    ), kept AS (
      SELECT doc_id, pos, ln FROM lines
      WHERE ln NOT IN (SELECT ln FROM common)
    ), tot AS (
      SELECT doc_id, count(*) AS n FROM lines GROUP BY doc_id
    )
    SELECT k.doc_id,
           string_agg(k.ln, chr(10) ORDER BY k.pos) AS clean_text,
           any_value(t.n) - count(*) AS n_dropped_lines
    FROM kept k JOIN tot t ON k.doc_id = t.doc_id
    GROUP BY k.doc_id
    """,
    doc=(
        "Corpus-level boilerplate line removal (CCNet/RefinedWeb line "
        "dedup): headers/footers planted onto every document (the header "
        "on all, two footer variants on thirds) are lines appearing in "
        ">= 10 distinct docs and get deleted everywhere; document body "
        "lines shared by >= 10 docs (exact-dup bodies) go too — that IS "
        "the semantics. Order-preserving reassembly; oracle replays "
        "split, distinct-doc counting, anti-join, and ordered rejoin."
    ),
)
def q_boilerplate_lines(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    docs = d.select(
        "doc_id",
        F.concat(
            F.lit("SITE HEADER NAVIGATION\n"),
            F.col("text"),
            F.lit("\n"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("subscribe to our newsletter"))
            .otherwise(F.lit("copyright 2024 example corp")),
        ).alias("text"),
    )
    return X.drop_boilerplate_lines(docs, "doc_id", "text", min_docs=10)


@register(
    "q_collocations",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), uni AS (
      SELECT unnest(toks) AS w FROM tok
    ), pairs AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM tok, unnest(range(1, len(toks))) AS t(i)
    ), pc AS (
      SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY w1, w2
    ), uc AS (
      SELECT w, count(*) AS wc FROM uni GROUP BY w
    ), tots AS (
      SELECT (SELECT count(*) FROM uni) AS t_uni,
             (SELECT count(*) FROM pairs) AS t_pair
    )
    SELECT w1, w2, pair_count, lift, rank FROM (
      SELECT pc.w1, pc.w2, pair_count,
             (CAST(pair_count AS DOUBLE) * t_uni * t_uni)
               / (CAST(t_pair AS DOUBLE) * c1.wc * c2.wc) AS lift,
             row_number() OVER (
               ORDER BY (CAST(pair_count AS DOUBLE) * t_uni * t_uni)
                          / (CAST(t_pair AS DOUBLE) * c1.wc * c2.wc) DESC,
                        pc.w1, pc.w2
             ) AS rank
      FROM pc
      JOIN uc c1 ON pc.w1 = c1.w
      JOIN uc c2 ON pc.w2 = c2.w
      CROSS JOIN tots
      WHERE pair_count >= 5
    ) WHERE rank <= 20
    """,
    doc=(
        "Top-20 two-word collocations by lift (P(w1 w2)/(P(w1)P(w2))) with "
        "min support 5 — phrase mining with PMI's ranking but no log, so "
        "the score is a fixed IEEE op sequence both engines reproduce "
        "bit-identically. Adjacent-pair explode, two counting aggregates, "
        "per-word joins, broadcast one-row totals, deterministic top-k."
    ),
)
def q_collocations(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.collocations(d, "text", min_count=5, k=20)


@register(
    "q_dup_spans",
    sql="""
    WITH docs AS (
      SELECT doc_id,
             text || (CASE WHEN doc_id % 4 = 0
               THEN ' share and subscribe to our channel for more daily news updates'
               ELSE '' END) AS text
      FROM documents WHERE doc_id < 200
    ), base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS toks
      FROM docs
    ), sized AS (
      SELECT doc_id, toks, len(toks) AS n FROM base
    ), wins AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i : i + 7], ' ')) AS h
      FROM sized, unnest(range(1, n - 8 + 2)) AS t(i)
      WHERE n >= 8
    ), dup AS (
      SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
    ), cov AS (
      SELECT DISTINCT w.doc_id, w.pos + o.off AS p
      FROM wins w JOIN dup USING (h), unnest(range(0, 8)) AS o(off)
    ), tp AS (
      SELECT doc_id, i AS p, toks[i] AS tok
      FROM sized, unnest(range(1, n + 1)) AS t(i)
    ), kept AS (
      SELECT tp.* FROM tp
      WHERE NOT EXISTS (SELECT 1 FROM cov
                        WHERE cov.doc_id = tp.doc_id AND cov.p = tp.p)
    ), agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           s.n - coalesce(a.n_kept, 0) AS n_dropped_tokens
    FROM sized s LEFT JOIN agg a USING (doc_id)
    """,
    doc=(
        "ExactSubstr-style duplicated-span removal (Lee et al. 2022): a "
        "shared 11-token promo tail planted on every 4th doc makes its "
        "8-token windows corpus-duplicates, so the tail is cut from EVERY "
        "copy while unique body text survives; natural cross-doc duplicate "
        "spans in the corpus are cut too. Windows are md5-hashed inside a "
        "higher-order transform BEFORE the explode, so only (id, pos, hash) "
        "rows shuffle. Oracle replays window hashing, frequency filter, "
        "position coverage, and ordered reassembly."
    ),
)
def q_dup_spans(spark, sf_dir):
    from ..operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" share and subscribe to our channel for more daily news updates"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_duplicate_spans(docs, "doc_id", "text", window=8, min_count=2)


#: deterministic literal weights for the oracle-checked scoring query —
#: Knuth multiplicative spread over [-1e6, 1e6], identical on both engines.
_MODEL_W = [((i + 1) * 2654435761) % 2000001 - 1000000 for i in range(64)]


@register(
    "q_model_score",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE doc_id < 300
    ), ex AS (
      SELECT doc_id, unnest(toks) AS t FROM tok
    ), tb AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 10))::BIGINT % 64 AS b,
             CASE WHEN (('0x' || substr(md5(t), 11, 1))::INTEGER % 2) = 0
                  THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS s
      FROM ex
    ), bw AS (
      SELECT doc_id, b, sum(s) AS w FROM tb GROUP BY doc_id, b
    ), mv AS (
      SELECT doc_id, map_from_entries(list({{'k': b, 'v': w}})) AS m
      FROM bw GROUP BY doc_id
    ), base AS (
      SELECT doc_id,
             list_transform(range(0, 64), i -> coalesce(m[i][1], 0.0::DOUBLE)) AS v
      FROM mv
    )
    SELECT d.doc_id,
           coalesce(list_dot_product(b.v,
             [{", ".join(str(w) for w in _MODEL_W)}]::DOUBLE[]) / 1000000.0,
             0.0) AS score
    FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
    LEFT JOIN base b USING (doc_id)
    """,
    doc=(
        "Linear-model quality scoring (the DCLM/FineWeb classifier-filter "
        "stage) with fixed literal weights: hashing-trick signed token "
        "counts dotted with integer-quantized weights, one final division. "
        "Every product and partial sum is integer-exact in doubles, so the "
        "fold is order-independent and the oracle's list_dot_product "
        "reproduces scores bit-identically. Tokenless docs score exactly "
        "0.0 via the left join back to the id set."
    ),
)
def q_model_score(spark, sf_dir):
    from ..operators.model import score_linear_model

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return score_linear_model(
        d, "doc_id", "text", _MODEL_W, hash_family="md5"
    )


#: q_model_fit_score's persisted-artifact root (r13 verdict item 5): the
#: integer-quantized ridge weights live at rest as a 64-row JSON, and the
#: DuckDB oracle replays score_linear_model over the SAME weights — the
#: q_model_score SQL shape with the literal weight vector swapped for a
#: scalar-subquery read of the artifact. The numpy solve itself stays
#: pytest (separation invariants in test_model.py).
_MODEL_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "model_oracle_weights")


@register(
    "q_model_fit_score",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE doc_id < 400
    ), ex AS (
      SELECT doc_id, unnest(toks) AS t FROM tok
    ), tb AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 10))::BIGINT % 64 AS b,
             CASE WHEN (('0x' || substr(md5(t), 11, 1))::INTEGER % 2) = 0
                  THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS s
      FROM ex
    ), bw AS (
      SELECT doc_id, b, sum(s) AS w FROM tb GROUP BY doc_id, b
    ), mv AS (
      SELECT doc_id, map_from_entries(list({{'k': b, 'v': w}})) AS m
      FROM bw GROUP BY doc_id
    ), base AS (
      SELECT doc_id,
             list_transform(range(0, 64), i -> coalesce(m[i][1], 0.0::DOUBLE)) AS v
      FROM mv
    ), wt AS (
      SELECT list(w::DOUBLE ORDER BY i) AS wv
      FROM read_json_auto('{_MODEL_ORACLE_ROOT}/*.json')
    )
    SELECT d.doc_id,
           coalesce(list_dot_product(b.v, (SELECT wv FROM wt)) / 1000000.0,
                    0.0) AS score,
           coalesce(list_dot_product(b.v, (SELECT wv FROM wt)) / 1000000.0,
                    0.0) > 0 AS pred_en
    FROM (SELECT doc_id FROM documents WHERE doc_id < 400) d
    LEFT JOIN base b USING (doc_id)
    """,
    doc=(
        "End-to-end classifier-filter stage: fit a ridge model on weak "
        "labels (lang == 'en' vs rest) over a bounded hash-ranked sample "
        "(driver-side numpy solve, IVF-fit discipline), then score the "
        "corpus with the quantized weights as pure Column algebra. "
        "Oracle-flipped r14 via the persisted-artifact discipline: the "
        "integer-quantized weight vector lives at rest (64-row JSON), "
        "BOTH engines read it, and DuckDB replays the hashing-trick "
        "feature build + exact-in-doubles dot product (the q_model_score "
        "precedent proves the scoring math bit-identical). The solve "
        "itself stays pytest (test_model.py separation invariants)."
    ),
)
def q_model_fit_score(spark, sf_dir):
    from ..operators.model import fit_linear_quality_model, score_linear_model
    from ..util import single_partition_df

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    if _IVF_FIT_CACHE.get("model_oracle_sf") != sf_dir:
        labeled = d.withColumn(
            "label", F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        )
        w = fit_linear_quality_model(
            labeled, "doc_id", "text", "label", dim=64, sample_n=5000,
            hash_family="md5",
        )
        single_partition_df(
            spark, [(i, int(wi)) for i, wi in enumerate(w)], "i long, w long"
        ).write.mode("overwrite").json(_MODEL_ORACLE_ROOT)
        _IVF_FIT_CACHE["model_oracle_sf"] = sf_dir
    # score over exactly what the oracle reads (at-rest weights), even
    # when the in-process fit is warm
    at_rest = sorted(
        spark.read.json(_MODEL_ORACLE_ROOT).collect(), key=lambda r: r["i"]
    )
    w = [int(r["w"]) for r in at_rest]
    out = score_linear_model(d, "doc_id", "text", w, hash_family="md5")
    return out.withColumn("pred_en", F.col("score") > 0)


@register(
    "q_k_anonymity",
    sql="""
    SELECT c_custkey, c_nationkey, c_mktsegment
    FROM (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS cs
      FROM customer
    ) WHERE cs >= 8
    """,
    doc=(
        "k-anonymity suppression (k = 8) over the (nation, market-segment) "
        "quasi-identifier: rows in equivalence classes smaller than k are "
        "re-identifying and dropped before release. One window count over "
        "the quasi-key — a single shuffle on the column subset."
    ),
)
def q_k_anonymity(spark, sf_dir):
    from ..operators.privacy import suppress_small_groups

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return suppress_small_groups(c, ["c_nationkey", "c_mktsegment"], k=8)


@register(
    "q_k_anonymity_report",
    sql="""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS class_size,
           count(*) < 8 AS violates_k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    doc=(
        "k-anonymity audit: per-equivalence-class sizes and violation flags "
        "for the (nation, market-segment) quasi-identifier — the release-"
        "gate report preceding suppression or generalization."
    ),
)
def q_k_anonymity_report(spark, sf_dir):
    from ..operators.privacy import k_anonymity_report

    c = _t(spark, sf_dir, "customer")
    return k_anonymity_report(c, ["c_nationkey", "c_mktsegment"], k=8)


@register(
    "q_dp_release",
    sql="""
    WITH g AS (
      SELECT l_returnflag,
             count(*)::DOUBLE AS n,
             sum(least(greatest(l_quantity::DOUBLE, 0.0), 50.0)) AS s
      FROM lineitem GROUP BY l_returnflag
    ), u AS (
      SELECT l_returnflag, n, s,
        (('0x' || substr(md5(l_returnflag || '|count|42'), 1, 13))::BIGINT::DOUBLE
          / 4503599627370496.0 - 0.5) AS uc,
        (('0x' || substr(md5(l_returnflag || '|sum|42'), 1, 13))::BIGINT::DOUBLE
          / 4503599627370496.0 - 0.5) AS us
    FROM g
    )
    SELECT l_returnflag,
      round(n - 2.0  * sign(uc) * ln(1 - 2*least(abs(uc), 0.499999999)), 4)
        AS noisy_count,
      round(s - 100.0 * sign(us) * ln(1 - 2*least(abs(us), 0.499999999)), 4)
        AS noisy_sum
    FROM u
    """,
    doc=(
        "Epsilon-DP histogram release (Laplace mechanism, eps=1 split "
        "across two statistics): per-flag count + Laplace(1/0.5) noise and "
        "a quantity sum CLIPPED to [0, 50] + Laplace(50/0.5) noise — the "
        "clip bounds per-row sensitivity, the standard contribution-"
        "bounding step. One grouped aggregation with map-side partials, "
        "noise as an expression at the GROUP grain (no per-row noise "
        "pass). Noise is seeded (md5 inverse-CDF draw) so the ENTIRE "
        "mechanism — clip, sensitivity scales, composition split, noise "
        "values — replays in DuckDB and is hash-checked; the operator doc "
        "records why a production release swaps the seed for curator-held "
        "entropy at publish time (the plan is unchanged)."
    ),
)
def q_dp_release(spark, sf_dir):
    from ..operators.privacy import dp_noisy_counts

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return dp_noisy_counts(
        li,
        ["l_returnflag"],
        epsilon=1.0,
        value_col="l_quantity",
        clip=50.0,
        hash_family="md5",
    )


@register(
    "q_familiarity",
    sql=f"""
    WITH base AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE doc_id < 250
    ), ex AS (
      SELECT doc_id, unnest(toks) AS t FROM base
    ), vocab AS (
      SELECT t, count(*) AS cf FROM ex GROUP BY t
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(cf) / count(*) AS familiarity
      FROM ex JOIN vocab USING (t)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           p.familiarity
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=(
        "Corpus-familiarity scoring (unigram-LM-lite): mean corpus "
        "frequency of a document's token instances — integer sums and one "
        "division, no log arithmetic, so scores are engine-exact. Flags "
        "OCR garbage / non-language docs (low) and boilerplate-heavy "
        "outliers (high) without training a model."
    ),
)
def q_familiarity(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return X.familiarity_score(d, "doc_id", "text")


@register(
    "q_corpus_report",
    sql="""
    WITH t AS (
      SELECT len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x != '')) AS n,
             lang, source
      FROM documents
    ), agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(n) AS DOUBLE) AS n_tokens,
             sum(n) / count(*) AS mean_tokens_per_doc,
             count(CASE WHEN lang = 'en' THEN 1 END) / count(*) AS frac_en,
             CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
             CAST(count(DISTINCT source) AS DOUBLE) AS n_sources
      FROM t
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM agg
      UNION ALL SELECT 'n_tokens', n_tokens FROM agg
      UNION ALL SELECT 'mean_tokens_per_doc', mean_tokens_per_doc FROM agg
      UNION ALL SELECT 'frac_en', frac_en FROM agg
      UNION ALL SELECT 'n_langs', n_langs FROM agg
      UNION ALL SELECT 'n_sources', n_sources FROM agg
    )
    """,
    doc=(
        "Corpus card (dataset-release summary): doc count, token volume, "
        "mean length, language/source concentration — one aggregation "
        "job unpivoted to a tall (metric, value) frame; every value a "
        "count or single ratio, engine-exact."
    ),
)
def q_corpus_report(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.corpus_report(d)


@register(
    "q_winnow",
    sql="""
    WITH docs AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 150
    ), hs AS (
      SELECT doc_id,
             list_transform(
               list_transform(range(1, greatest(len(t) - 7, 1) + 1),
                              i -> t[i : i + 7]),
               g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) AS hashes
      FROM docs
    ), fp AS (
      SELECT DISTINCT doc_id, f
      FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(hashes) - 4, 1) + 1),
                 i -> list_min(hashes[i : i + 4])))) AS f
        FROM hs
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS nf FROM fp GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= 8
    )
    SELECT p.id_a, p.id_b, p.shared_fps,
           p.shared_fps / least(sa.nf, sb.nf) AS overlap
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    """,
    doc=(
        "Winnowing (MOSS) copied-content detection: char 8-gram hashes, "
        "window-5 minima as positional fingerprints (any shared run >= 12 "
        "chars leaves a common print), pair join on shared prints, "
        "containment-style overlap score. md5 hash family so DuckDB "
        "replays the FULL pipeline — grams, window minima, dedup, pair "
        "counts — value-identically."
    ),
)
def q_winnow(spark, sf_dir):
    from ..operators.dedup import winnow_similarity_join

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return winnow_similarity_join(
        d, "doc_id", "text", k=8, window=5, min_shared=8, hash_family="md5"
    )


#: q_compression_ratio's persisted-artifact root (r14): the DEFLATE byte
#: count is engine-specific (no zlib in the oracle engine) — so it lives
#: at rest as an exact integer, and ratio = zlen / octet_length(text) is
#: one exact-in-doubles integer division both engines reproduce
#: bit-identically. The compressor itself stays pytest (test_text.py's
#: planted-repetitive floor invariants).
_ZLIB_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "zlib_oracle_sizes")


@register(
    "q_compression_ratio",
    sql=f"""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN rtrim(repeat('spam spam spam ', 40))
                  ELSE text END AS text
      FROM documents WHERE doc_id < 200
    )
    SELECT d.doc_id,
           z.zlen / octet_length(encode(d.text)) AS zratio,
           d.doc_id % 10 = 0 AS planted_repetitive
    FROM docs d
    JOIN read_parquet('{_ZLIB_ORACLE_ROOT}/*.parquet') z USING (doc_id)
    """,
    doc=(
        "zlib compression-ratio quality signal (Gopher/RefinedWeb "
        "repetitiousness filter): compressed/raw bytes per document plus a "
        "planted highly-repetitive control group that must score below the "
        "natural-text floor. Arrow-batched pandas_udf (no Column-level "
        "DEFLATE). Oracle-flipped r14 via the persisted-artifact "
        "discipline: the compressed byte COUNT (exact integer) lives at "
        "rest, BOTH engines read it, and the ratio is one exact integer "
        "division against octet_length — bit-identical cross-engine; the "
        "compressor invariants stay in test_text.py."
    ),
)
def q_compression_ratio(spark, sf_dir):
    from ..operators.text import compressed_size

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(" ", F.array_repeat(F.lit("spam spam spam"), 40)),
        ).otherwise(F.col("text")).alias("text"),
    )
    if _IVF_FIT_CACHE.get("zlib_oracle_sf") != sf_dir:
        docs.select(
            "doc_id", compressed_size("text").alias("zlen")
        ).write.mode("overwrite").parquet(_ZLIB_ORACLE_ROOT)
        _IVF_FIT_CACHE["zlib_oracle_sf"] = sf_dir
    z = spark.read.parquet(_ZLIB_ORACLE_ROOT)
    return docs.join(z, "doc_id").select(
        "doc_id",
        (F.col("zlen") / F.octet_length("text")).alias("zratio"),
        (F.col("doc_id") % 10 == 0).alias("planted_repetitive"),
    )


@register(
    "q_dup_spans_keep_first",
    sql="""
    WITH docs AS (
      SELECT doc_id,
             text || (CASE WHEN doc_id % 4 = 0
               THEN ' share and subscribe to our channel for more daily news updates'
               ELSE '' END) AS text
      FROM documents WHERE doc_id < 200
    ), base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS toks
      FROM docs
    ), sized AS (
      SELECT doc_id, toks, len(toks) AS n FROM base
    ), wins AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i : i + 7], ' ')) AS h
      FROM sized, unnest(range(1, n - 8 + 2)) AS t(i)
      WHERE n >= 8
    ), dup AS (
      SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
    ), occ AS (
      SELECT w.doc_id, w.pos, w.h,
             row_number() OVER (PARTITION BY w.h
                                ORDER BY w.doc_id, w.pos) AS rn
      FROM wins w SEMI JOIN dup ON w.h = dup.h
    ), cov AS (
      SELECT DISTINCT o.doc_id, o.pos + x.off AS p
      FROM occ o, unnest(range(0, 8)) AS x(off)
      WHERE o.rn >= 2
    ), tp AS (
      SELECT doc_id, i AS p, toks[i] AS tok
      FROM sized, unnest(range(1, n + 1)) AS t(i)
    ), kept AS (
      SELECT tp.* FROM tp
      WHERE NOT EXISTS (SELECT 1 FROM cov
                        WHERE cov.doc_id = tp.doc_id AND cov.p = tp.p)
    ), agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           s.n - coalesce(a.n_kept, 0) AS n_dropped_tokens
    FROM sized s LEFT JOIN agg a USING (doc_id)
    """,
    doc=(
        "Duplicated-span removal, canonical keep-one-copy mode: per "
        "duplicated window the lowest-(doc, pos) occurrence survives, so "
        "exactly one copy of the planted promo tail remains in the corpus "
        "(doc 0) while every other copy is cut. Oracle replays the window "
        "rank and coverage."
    ),
)
def q_dup_spans_keep_first(spark, sf_dir):
    from ..operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" share and subscribe to our channel for more daily news updates"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_duplicate_spans(
        docs, "doc_id", "text", window=8, min_count=2, keep_first=True
    )


@register(
    "q_bm25_search",
    sql=f"""
    WITH base AS (
      SELECT doc_id,
             len({_SQL_TOKENS}) AS l,
             len(list_filter({_SQL_TOKENS}, x -> x = 'spark')) AS tf0,
             len(list_filter({_SQL_TOKENS}, x -> x = 'shuffle')) AS tf1,
             len(list_filter({_SQL_TOKENS}, x -> x = 'window')) AS tf2
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS N,
             CAST(sum(l) AS BIGINT) AS TL,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM base
    )
    SELECT doc_id, score FROM (
      SELECT doc_id,
        ((N - df0 + 0.5) / (df0 + 0.5))
          * (CAST(tf0 AS DOUBLE) * 2.2)
          / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
        + ((N - df1 + 0.5) / (df1 + 0.5))
          * (CAST(tf1 AS DOUBLE) * 2.2)
          / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
        + ((N - df2 + 0.5) / (df2 + 0.5))
          * (CAST(tf2 AS DOUBLE) * 2.2)
          / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
        AS score
      FROM base CROSS JOIN stats
    ) WHERE score > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
    doc=(
        "BM25 full-text retrieval for the literal query ['spark', "
        "'shuffle', 'window']: one 1-row corpus-stats aggregate broadcast "
        "back, map-side rational scoring (rational idf, integer tf/len, "
        "per-term contributions added in literal term order so the float "
        "ops mirror exactly), total-ordered top-10. Search over the lake "
        "with no index build."
    ),
)
def q_bm25_search(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.bm25_topk(d, ["spark", "shuffle", "window"], k=10)


@register(
    "q_hybrid_rrf",
    sql=f"""
    WITH base AS (
      SELECT doc_id,
             len({_SQL_TOKENS}) AS l,
             len(list_filter({_SQL_TOKENS}, x -> x = 'spark')) AS tf0,
             len(list_filter({_SQL_TOKENS}, x -> x = 'shuffle')) AS tf1,
             len(list_filter({_SQL_TOKENS}, x -> x = 'window')) AS tf2
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS N,
             CAST(sum(l) AS BIGINT) AS TL,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM base
    ), lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
      FROM (
        SELECT doc_id,
          ((N - df0 + 0.5) / (df0 + 0.5))
            * (CAST(tf0 AS DOUBLE) * 2.2)
            / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
          + ((N - df1 + 0.5) / (df1 + 0.5))
            * (CAST(tf1 AS DOUBLE) * 2.2)
            / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
          + ((N - df2 + 0.5) / (df2 + 0.5))
            * (CAST(tf2 AS DOUBLE) * 2.2)
            / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))
          AS score
        FROM base CROSS JOIN stats
      ) WHERE score > 0
    ), q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0
    ), c AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), vec AS (
      SELECT c.vec_id AS doc_id,
             row_number() OVER (
               ORDER BY list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id ASC
             ) AS rnk
      FROM q JOIN c ON q.vec_id != c.vec_id
    ), contrib AS (
      SELECT doc_id, 1.0 / (60 + CAST(rnk AS DOUBLE)) AS contrib
      FROM lex WHERE rnk <= 10
      UNION ALL
      SELECT doc_id, 1.0 / (60 + CAST(rnk AS DOUBLE)) AS contrib
      FROM vec WHERE rnk <= 10
    ), fused AS (
      SELECT doc_id, sum(contrib) AS rrf_score FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, rrf_score, rank FROM (
      SELECT doc_id, rrf_score,
             row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= 10
    """,
    doc=(
        "Hybrid retrieval via reciprocal-rank fusion (Cormack 2009): BM25 "
        "top-10 for ['spark','shuffle','window'] fused with cosine top-10 "
        "for query vector 0 over the shared item-id space; fused score = "
        "sum(1/(60+rank)) - rank-only, so the incomparable BM25/cosine "
        "score scales never need calibration. Two-system sums are "
        "commutative-exact in IEEE, so the oracle matches bit-for-bit."
    ),
)
def q_hybrid_rrf(spark, sf_dir):
    from ..operators.fusion import rrf_fuse
    from ..operators.similarity import cosine_topk

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    from pyspark.sql import Window as W

    lex = X.bm25_topk(d, ["spark", "shuffle", "window"], k=10).withColumn(
        "rank",
        F.row_number().over(
            W.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    )
    vec = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=10).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex.select("doc_id", "rank"), vec], k=10)


# Batch hybrid retrieval: N queries fused per-query in ONE job (the shape
# q_hybrid_rrf would take in a real batch pipeline). Shared term universe
# across the three queries; each query also has a vector twin (vec_id = its
# query id). Keys are ints so lex and vector ranks share an id space.
_RRF_BATCH_QUERIES: dict[int, list[str]] = {
    0: ["spark", "shuffle", "window"],
    1: ["join", "hash"],
    2: ["stream", "batch", "sort"],
}


def _bm25_batch_sql(queries: dict[int, list[str]]) -> str:
    """lex CTE body for the batch oracle, generated from the SAME dict the
    Spark plan uses so union-term indexing and per-query term-addition
    order can never drift. Mirrors q_bm25_search's per-term contribution
    exactly (rational idf, left-assoc additions)."""
    union_terms: list[str] = []
    for ts in queries.values():
        for t in ts:
            if t not in union_terms:
                union_terms.append(t)
    idx = {t: i for i, t in enumerate(union_terms)}
    tf_cols = ",\n             ".join(
        f"len(list_filter({_SQL_TOKENS}, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(union_terms)
    )
    df_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(union_terms))
    )

    def contrib(i: int) -> str:
        return (
            f"((N - df{i} + 0.5) / (df{i} + 0.5))"
            f" * (CAST(tf{i} AS DOUBLE) * 2.2)"
            f" / (CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l * N AS DOUBLE) / TL)))"
        )

    score_selects = "\n      UNION ALL\n".join(
        f"""      SELECT {qid} AS query_id, doc_id,
             {' + '.join(contrib(idx[t]) for t in ts)} AS score
      FROM base CROSS JOIN stats"""
        for qid, ts in queries.items()
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             len({_SQL_TOKENS}) AS l,
             {tf_cols}
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS N,
             CAST(sum(l) AS BIGINT) AS TL,
             {df_cols}
      FROM base
    ), scored AS (
{score_selects}
    ), lex AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS rnk
      FROM scored WHERE score > 0
    )"""


@register(
    "q_hybrid_rrf_batch",
    sql=_bm25_batch_sql(_RRF_BATCH_QUERIES)
    + """, q AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 3
    ), c AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), vec AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id ASC
             ) AS rnk
      FROM q JOIN c ON q.vec_id != c.vec_id
    ), contrib AS (
      SELECT query_id, doc_id, 1.0 / (60 + CAST(rnk AS DOUBLE)) AS contrib
      FROM lex WHERE rnk <= 10
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60 + CAST(rnk AS DOUBLE)) AS contrib
      FROM vec WHERE rnk <= 10
    ), fused AS (
      SELECT query_id, doc_id, sum(contrib) AS rrf_score
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_score, rank FROM (
      SELECT query_id, doc_id, rrf_score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
             ) AS rank
      FROM fused
    ) WHERE rank <= 10
    """,
    doc=(
        "Batch hybrid retrieval (r9 verdict item 6): THREE queries' "
        "BM25 and cosine rankings fused per-query in ONE job. Lexical "
        "side is bm25_topk_batch — corpus tokenized once, tf for the "
        "union of all 8 distinct terms in one map pass, ONE broadcast "
        "1-row stats aggregate, per-query map-side scores unpivoted and "
        "ranked by a query-partitioned window. Vector side is the "
        "standard multi-query cosine_topk (vec_id < 3). rrf_fuse with "
        "query_col partitions its grouped sum on (query, doc) and its "
        "rank window by query — never a global sort; two-system sums "
        "stay commutative-exact in IEEE so the oracle is bit-for-bit."
    ),
)
def q_hybrid_rrf_batch(spark, sf_dir):
    from ..operators.fusion import rrf_fuse
    from ..operators.similarity import cosine_topk

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = X.bm25_topk_batch(d, _RRF_BATCH_QUERIES, k=10).select(
        F.col("query_id").cast("long").alias("query_id"), "doc_id", "rank"
    )
    vec = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([lex, vec], k=10, query_col="query_id")


def _idcg_literals_sql(k: int = 10) -> tuple[str, str]:
    """(gains_list, cum_list) SQL literals from fusion._cum_idcg — the
    SAME Python floats the Spark plan embeds (repr round-trips exactly),
    so libm log2 differences can never surface cross-engine."""
    from ..operators.fusion import _cum_idcg

    cum = _cum_idcg(k)
    gains = [cum[i + 1] - cum[i] for i in range(k)]
    return (
        "[" + ", ".join(repr(g) for g in gains) + "]",
        "[" + ", ".join(repr(c) for c in cum) + "]",
    )


_IR_GAINS_SQL, _IR_CUM_SQL = _idcg_literals_sql(10)


@register(
    "q_retrieval_metrics",
    sql=f"""
    WITH q AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), ranked AS (
      SELECT query_id, neighbor_id, rnk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                   c.vec_id ASC
               ) AS rnk
        FROM q JOIN c ON q.vec_id != c.vec_id
      ) WHERE rnk <= 10
    ), rel AS (
      SELECT q.vec_id AS query_id, c.vec_id AS item_id
      FROM q JOIN c ON q.label = c.label AND q.vec_id != c.vec_id
    ), totals AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS total_rel
      FROM rel GROUP BY query_id
    ), per_q AS (
      SELECT r.query_id,
             CAST(sum(CASE WHEN rel.item_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
             max(CASE WHEN rel.item_id IS NOT NULL THEN 1.0 / r.rnk END) AS mrr_raw,
             sum(CASE WHEN rel.item_id IS NOT NULL
                 THEN ({_IR_GAINS_SQL})[r.rnk] END) AS dcg
      FROM ranked r
      LEFT JOIN rel ON r.query_id = rel.query_id AND r.neighbor_id = rel.item_id
      GROUP BY r.query_id
    )
    SELECT query_id, coalesce(p.hits, 0) AS hits,
           round(coalesce(p.mrr_raw, 0.0), 6) AS mrr,
           CASE WHEN coalesce(t.total_rel, 0) > 0 THEN
             round(coalesce(p.dcg, 0.0)
                   / ({_IR_CUM_SQL})[least(t.total_rel, 10) + 1], 6)
           END AS ndcg_at_k,
           round(coalesce(p.hits, 0) / 10.0, 6) AS precision_at_k,
           CASE WHEN coalesce(t.total_rel, 0) > 0 THEN
             round(CAST(coalesce(p.hits, 0) AS DOUBLE) / t.total_rel, 6)
           END AS recall_at_k
    FROM per_q p FULL JOIN totals t USING (query_id)
    """,
    doc=(
        "Retrieval evaluation (X3/X4 surface): MRR, NDCG@10, precision@10, "
        "recall@10 per query for cosine top-10 against same-label "
        "relevance (the standard qrels contract). DCG position gains and "
        "the cumulative-ideal table are ONE Python-computed literal list "
        "embedded in both engines (the LSH-plane pattern), and float "
        "metrics are rounded to 6dp both sides - full DuckDB oracle."
    ),
)
def q_retrieval_metrics(spark, sf_dir):
    from ..operators.fusion import retrieval_metrics
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ranked = cosine_topk(emb, queries, k=10)
    rel = (
        queries.select(F.col("vec_id").alias("query_id"), "label")
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__l2__")),
            F.col("label") == F.col("__l2__"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return retrieval_metrics(ranked, rel, k=10)


@register(
    "q_hard_negatives",
    sql="""
    WITH a AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label,
           cos_sim, rank
    FROM (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             list_dot_product(a.v, c.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.v, c.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id
             ) AS rank
      FROM a JOIN c
        ON a.vec_id != c.vec_id AND a.label != c.label
    ) WHERE rank <= 5
    """,
    doc=(
        "Hard-negative mining for contrastive training: per anchor, the 5 "
        "most-similar OTHER-label vectors (boundary negatives, not random "
        "ones). Same broadcast-anchor map-only shape as q_cosine_topk — "
        "the label-mismatch predicate rides the broadcast join, the corpus "
        "never shuffles; fold arithmetic bit-identical cross-engine."
    ),
)
def q_hard_negatives(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "q_class_balance",
    sql="""
    WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
    mx AS (SELECT max(c) AS m FROM cnt),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS i
      FROM documents
    ),
    rep AS (
      SELECT r.doc_id, r.lang,
             (m // c) + CASE WHEN i <= (m % c) THEN 1 ELSE 0 END AS copies
      FROM r JOIN cnt USING (lang) CROSS JOIN mx
    )
    SELECT doc_id, lang, unnest(range(1, copies + 1)) AS copy_idx
    FROM rep
    """,
    doc=(
        "Exact-parity class-balanced oversampling by language: every class "
        "replicates to EXACTLY the majority count (m div c copies each, "
        "first m%c rows by doc_id get one extra) — deterministic, "
        "reproducible, oracle-exact. Tiny count aggregate broadcast back; "
        "replication is a map-side explode(sequence)."
    ),
)
def q_class_balance(spark, sf_dir):
    from ..operators.training import class_balance

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return class_balance(d, "lang", "doc_id")


@register(
    "q_fuzzy_blocked",
    sql="""
    WITH d AS (
      SELECT doc_id, substr(text, 1, 30) AS prefix,
             substr(text, 1, 10) AS blk
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.prefix, b.prefix) AS edit_dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 8
    """,
    doc=(
        "Blocked fuzzy join (entity-resolution shape): exact 10-char "
        "prefix blocks bound candidates via an EQUI-join, levenshtein "
        "verifies survivors only — the scale pattern that replaces the "
        "O(n^2) all-pairs kernel (q_levenshtein stays as the capped "
        "verification twin). Identical pair set on both engines."
    ),
)
def q_fuzzy_blocked(spark, sf_dir):
    from ..operators.dedup import fuzzy_join_blocked

    d = _t(spark, sf_dir, "documents")
    return fuzzy_join_blocked(
        d, "doc_id", "text", block_len=10, prefix_len=30, max_dist=8
    )


#: q_bpe_train's persisted-artifact root (r13 verdict item 4, the
#: codebook/rotation precedent): the learned merge table lives at rest as
#: JSON, and the DuckDB oracle replays encode_bpe over the SAME merges —
#: a recursive CTE walks merge_idx in training order, and each step is
#: the identical sequential left-fold (list_reduce with a prepended
#: empty-list seed; q_ewma proved ordered-fold bit-parity).
_BPE_ORACLE_ROOT = _os.path.join(_ORACLE_ARTIFACTS, "bpe_oracle_merges")


@register(
    "q_bpe_train",
    sql=f"""
    WITH RECURSIVE
    m AS (SELECT merge_idx, "left" AS l, "right" AS r
          FROM read_json_auto('{_BPE_ORACLE_ROOT}/*.json')),
    nm AS (SELECT count(*) AS n FROM m),
    w AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> ''),
               wd -> list_append(string_split(wd, ''), '▁')
             ) AS syms
      FROM documents WHERE doc_id < 50
    ),
    enc AS (
      SELECT doc_id, syms, 0 AS i FROM w
      UNION ALL
      SELECT e.doc_id,
             list_transform(e.syms, s ->
               list_reduce(
                 list_prepend([]::VARCHAR[], list_transform(s, x -> [x])),
                 (acc, el) -> CASE
                   WHEN len(acc) > 0 AND acc[-1] = m.l AND el[1] = m.r
                   THEN list_concat(acc[1:len(acc)-1], [m.l || m.r])
                   ELSE list_concat(acc, el) END
               )) AS syms,
             e.i + 1 AS i
      FROM enc e JOIN m ON m.merge_idx = e.i
    ),
    final AS (
      SELECT doc_id, flatten(syms) AS bpe_tokens
      FROM enc, nm WHERE i = nm.n
    )
    SELECT doc_id,
           CAST(generate_subscripts(bpe_tokens, 1) AS INT) AS ord,
           unnest(bpe_tokens) AS token,
           CAST(len(bpe_tokens) AS BIGINT) AS n_tokens
    FROM final
    """,
    doc=(
        "BPE tokenizer training (Sennrich-style merge learning) on a "
        "200-document slice, via the (word, count)-collapsed production "
        "path: the corpus aggregates ONCE to a weighted vocabulary, so "
        "each merge round counts pairs over |vocab| rows (Zipf-sublinear "
        "in corpus size) — not |corpus| documents. Per round: one map-"
        "side-combinable weighted grouped count, a 1-row driver argmax "
        "with lexicographic tie-break, and a map-side aggregate-fold "
        "merge with exact sequential chain semantics. Oracle-flipped r14 "
        "via the persisted-artifact discipline: the learned merge table "
        "lives at rest (JSON), BOTH engines read it, and the result is "
        "encode_bpe over a 50-document slice — DuckDB replays the word "
        "split, per-word sequential merge folds in merge order "
        "(recursive CTE over merge_idx), and the flatten. Output is "
        "posexploded to (doc_id, ord, token, n_tokens) long format — "
        "the canonicalizer cannot sort array cells. The train "
        "loop itself stays pytest (known-sequence, tie-determinism, "
        "partitioning-invariance, chain-fold, collapsed==per-document "
        "differentials in test_bpe.py)."
    ),
)
def q_bpe_train(spark, sf_dir):
    from ..operators.bpe import encode_bpe, train_bpe
    from ..util import single_partition_df

    d = _t(spark, sf_dir, "documents")
    if _IVF_FIT_CACHE.get("bpe_oracle_sf") != sf_dir:
        merges = train_bpe(d.filter(F.col("doc_id") < 200), "text", num_merges=6)
        single_partition_df(
            spark,
            [(i, a, b, c) for i, (a, b, c) in enumerate(merges)],
            "merge_idx long, left string, right string, pair_count long",
        ).write.mode("overwrite").json(_BPE_ORACLE_ROOT)
        _IVF_FIT_CACHE["bpe_oracle_sf"] = sf_dir
    # read the merges BACK from the artifact — the encode must run over
    # exactly what the oracle reads, even when the in-process fit is warm
    at_rest = sorted(
        spark.read.json(_BPE_ORACLE_ROOT).collect(), key=lambda r: r["merge_idx"]
    )
    merges = [(r["left"], r["right"], int(r["pair_count"])) for r in at_rest]
    enc = encode_bpe(d.filter(F.col("doc_id") < 50), merges)
    # long format (doc_id, ord, token, n_tokens): the harness
    # canonicalizer cannot sort/hash array cells (q_sq_encode /
    # q_explode_embeddings precedent; r14 verdict item 1).
    # localCheckpoint barrier BEFORE the explode: Generate re-evaluates
    # its input expression on the interpreted-HOF path, so feeding the
    # 6-merge fold chain straight into posexplode costs ~12x (measured
    # 9.9 s vs 0.8 s at sf0.1) — materialize the 50-row (bounded by the
    # doc_id < 50 slice) array column once, then explode stored
    # attributes. Same barrier rationale as the OPQ mapInPandas note in
    # SCALE.md.
    barrier = enc.select("doc_id", "bpe_tokens").localCheckpoint(eager=False)
    return barrier.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_tokens"),
        F.posexplode("bpe_tokens").alias("pos", "token"),
    ).select(
        "doc_id",
        (F.col("pos") + F.lit(1)).cast("int").alias("ord"),
        "token",
        "n_tokens",
    )


@register(
    "q_apply_changes",
    sql="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 4 <> 0
    ), changes AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'delete' ELSE 'upsert' END AS op,
             upper(text) AS text, lang, source, n_chars
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
           CASE WHEN c.op = 'upsert' THEN c.text ELSE b.text END AS text,
           CASE WHEN c.op = 'upsert' THEN c.lang ELSE b.lang END AS lang,
           CASE WHEN c.op = 'upsert' THEN c.source ELSE b.source END AS source,
           CASE WHEN c.op = 'upsert' THEN c.n_chars ELSE b.n_chars END AS n_chars
    FROM base b FULL JOIN changes c ON b.doc_id = c.doc_id
    WHERE c.op IS NULL OR c.op = 'upsert'
    """,
    doc=(
        "Batch MERGE/upsert (CDC apply): one full-outer join on the key "
        "with a map-side case merge — deletes drop, upserts replace or "
        "insert, untouched keys keep the base payload. The inverse of "
        "q_snapshot_diff (the apply(old, diff)==new round-trip is pinned "
        "in test_cdc.py). Base = doc_id%4<>0; changes = doc_id%2=0 "
        "(deletes where also %3=0, upserts with uppercased text)."
    ),
)
def q_apply_changes(spark, sf_dir):
    from ..operators.cdc import apply_changes

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    base = d.filter(F.col("doc_id") % 4 != 0)
    changes = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.upper(F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return apply_changes(base, changes, ["doc_id"])


@register(
    "q_zipf",
    sql=f"""
    WITH h AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY token
    ), r AS (
      SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token) AS rank
      FROM h
    )
    SELECT rank, token, freq, CAST(rank AS BIGINT) * freq AS rank_x_freq
    FROM r WHERE rank <= 50
    """,
    doc=(
        "Zipf's-law check: top-50 tokens with rank x frequency (constant "
        "under Zipf — the quick 'is this corpus natural language or "
        "template spam' screen). Exact integers; the rank window runs "
        "over the vocabulary-bounded histogram, selection total-ordered."
    ),
)
def q_zipf(spark, sf_dir):
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    h = (
        d.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = W.orderBy(F.desc("freq"), F.asc("token"))
    return (
        h.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .select(
            "rank",
            "token",
            "freq",
            (F.col("rank").cast("bigint") * F.col("freq")).alias(
                "rank_x_freq"
            ),
        )
    )


@register(
    "q_ttr",
    sql=f"""
    SELECT doc_id,
           CAST(len(list_distinct({_SQL_TOKENS})) AS BIGINT) AS n_types,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
           CASE WHEN len({_SQL_TOKENS}) > 0 THEN
             CAST(len(list_distinct({_SQL_TOKENS})) AS DOUBLE)
               / CAST(len({_SQL_TOKENS}) AS DOUBLE)
           END AS ttr
    FROM documents
    """,
    doc=(
        "Type-token ratio per document (lexical diversity — the cheap "
        "'template spam vs natural text' signal that complements the "
        "repetition and compression-ratio screens): distinct-token and "
        "token counts are exact integers from map-side array ops, one "
        "IEEE division, no shuffle at all."
    ),
)
def q_ttr(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n_types = F.size(F.array_distinct(toks)).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    return d.select(
        "doc_id",
        n_types.alias("n_types"),
        n_tokens.alias("n_tokens"),
        F.when(
            n_tokens > 0, n_types.cast("double") / n_tokens.cast("double")
        ).alias("ttr"),
    )


@register(
    "q_odds_ratio",
    sql="""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS a
      FROM documents GROUP BY source, lang
    ), src AS (
      SELECT source, CAST(sum(a) AS BIGINT) AS src_total FROM cells GROUP BY source
    ), lng AS (
      SELECT lang, CAST(sum(a) AS BIGINT) AS lang_total FROM cells GROUP BY lang
    ), n AS (SELECT CAST(sum(a) AS BIGINT) AS grand FROM cells)
    SELECT c.source, c.lang, a,
           src_total - a AS b,
           lang_total - a AS c,
           grand - src_total - lang_total + a AS d,
           CASE WHEN (src_total - a) * (lang_total - a) > 0 THEN
             CAST(a * (grand - src_total - lang_total + a) AS DOUBLE)
               / CAST((src_total - a) * (lang_total - a) AS DOUBLE)
           END AS odds_ratio
    FROM cells c JOIN src USING (source) JOIN lng USING (lang) CROSS JOIN n
    """,
    doc=(
        "Keyness/affinity odds ratio per (source, language): the 2x2 "
        "cell counts (a,b,c,d) are exact integers from one grouped count "
        "plus broadcast marginals, and OR = ad/bc is one pinned division "
        "— engine-exact, no logs (the plain-OR form of the log-odds "
        "keyness staple). Degenerate cells (b*c = 0) yield NULL."
    ),
)
def q_odds_ratio(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    src = cells.groupBy("source").agg(
        F.sum("a").cast("bigint").alias("src_total")
    )
    lng = cells.groupBy("lang").agg(
        F.sum("a").cast("bigint").alias("lang_total")
    )
    n = cells.agg(F.sum("a").cast("bigint").alias("grand"))
    j = (
        cells.join(F.broadcast(src), "source")
        .join(F.broadcast(lng), "lang")
        .crossJoin(F.broadcast(n))
    )
    b = F.col("src_total") - F.col("a")
    c = F.col("lang_total") - F.col("a")
    dd = F.col("grand") - F.col("src_total") - F.col("lang_total") + F.col("a")
    return j.select(
        "source",
        "lang",
        "a",
        b.alias("b"),
        c.alias("c"),
        dd.alias("d"),
        F.when(
            b * c > 0, (F.col("a") * dd).cast("double") / (b * c).cast("double")
        ).alias("odds_ratio"),
    )


@register(
    "q_label_separability",
    sql="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e
      FROM embeddings WHERE vec_id < 80
    ), pairs AS (
      SELECT CASE WHEN a.label = b.label THEN 'within' ELSE 'across' END
               AS pair_kind,
             list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))) AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT pair_kind, count(*) AS n_pairs,
           round(avg(cos_sim), 6) AS mean_cos
    FROM pairs GROUP BY pair_kind
    """,
    doc=(
        "Label separability of the embedding space: mean cosine within "
        "vs across labels over the vec_id<80 capped pair kernel (the "
        "documented O(n^2) verification-sized stance — at scale, sample "
        "per label first). Per-pair folds are bit-identical cross-engine; "
        "the mean is a float aggregate, rounded 6dp. A within-across gap "
        "near zero means the labels are not linearly separable — the "
        "go/no-go check before training a centroid classifier."
    ),
)
def q_label_separability(spark, sf_dir):
    from ..operators.similarity import cosine

    v = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 80)
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.when(F.col("a.label") == F.col("b.label"), "within")
        .otherwise("across")
        .alias("pair_kind"),
        cosine(F.col("a.e"), F.col("b.e")).alias("cos_sim"),
    )
    return pairs.groupBy("pair_kind").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("cos_sim"), 6).alias("mean_cos"),
    )


@register(
    "q_dim_variance",
    sql="""
    WITH x AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    )
    SELECT dim, count(*) AS n,
           round(var_samp(v), 8) AS variance,
           round(avg(v), 8) AS mean
    FROM x GROUP BY dim
    """,
    doc=(
        "Per-dimension embedding variance (dead/collapsed-dimension "
        "detection — a near-zero-variance dimension carries no signal "
        "and wastes index space): posexplode to (dim, value), one "
        "grouped variance over 64 integer keys. Float aggregates rounded "
        "8dp both sides."
    ),
)
def q_dim_variance(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    )
    return x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.var_samp("v"), 8).alias("variance"),
        F.round(F.avg("v"), 8).alias("mean"),
    )


# DuckDB twin of operators.lm._doc_bigrams + house tokenizer: adjacent
# token pairs per document, 1-based list indexing over range(1, len-1+1).
_SQL_LM_BI = (
    "SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 "
    "FROM toks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2"
)


@register(
    "q_lm_score",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents
    ), bi AS ({_SQL_LM_BI}),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ws) AS t FROM toks)
    )
    SELECT b.doc_id, count(*) AS n_bigrams,
           ROUND(avg(-log2((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS xent_bits
    FROM bi b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
    GROUP BY b.doc_id
    """,
    doc=(
        "CCNet-style LM quality score (Wenzek 2019, public method): per-"
        "document cross-entropy in bits/bigram under an add-0.5-smoothed "
        "bigram LM trained on the corpus itself (operators/lm.py). LM "
        "tables are vocabulary-bounded; the only corpus-sized shuffles "
        "are the combinable bigram count and the fine-grained (w1,w2) "
        "score join. Probabilities are exact integer-count arithmetic in "
        "one pinned double tree; the order-sensitive per-doc average is "
        "rounded 6dp on both engines."
    ),
)
def q_lm_score(spark, sf_dir):
    from ..operators.lm import bigram_lm_crossentropy

    d = _t(spark, sf_dir, "documents")
    return bigram_lm_crossentropy(d, "text", "doc_id", k=0.5)


@register(
    "q_lm_score_against",
    sql=f"""
    WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS ws FROM train
    ), bi AS ({_SQL_LM_BI}),
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ws) AS t FROM toks)
    ),
    stoks AS (
      SELECT doc_id, {_SQL_TOKENS} AS ws FROM documents WHERE doc_id % 2 = 1
    ), sbi AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM stoks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
    )
    SELECT b.doc_id, count(*) AS n_bigrams,
           ROUND(avg(-log2(
             (COALESCE(c12, 0) + 0.5) / (COALESCE(c1, 0) + 0.5 * v)
           )), 6) AS xent_bits
    FROM sbi b
    LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN vocab
    GROUP BY b.doc_id
    """,
    doc=(
        "Leakage-free LM scoring: train the bigram LM on even doc_ids, "
        "score odd doc_ids — the production split (score a new crawl "
        "slice against last month's LM). Exercises the unseen-bigram / "
        "unseen-history smoothing floor k/(c1 + k*V) via left-join "
        "coalesce — never NULL, never -inf. Same rounding discipline as "
        "q_lm_score."
    ),
)
def q_lm_score_against(spark, sf_dir):
    from ..operators.lm import bigram_lm_crossentropy

    d = _t(spark, sf_dir, "documents")
    return bigram_lm_crossentropy(
        d.filter(F.col("doc_id") % 2 == 1),
        "text",
        "doc_id",
        k=0.5,
        train_df=d.filter(F.col("doc_id") % 2 == 0),
    )


@register(
    "q_shuffle_shards",
    sql="""
    WITH r AS (
      SELECT doc_id, md5(concat_ws(chr(31), doc_id, '42')) AS h FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8 AS shard,
           row_number() OVER (
             PARTITION BY CAST(('0x' || substr(h, 1, 13)) AS BIGINT) % 8
             ORDER BY h, doc_id
           ) AS pos
    FROM r
    """,
    doc=(
        "Deterministic global shuffle for training loaders (r12, X4+ "
        "assembly family): every document gets a (shard, pos) address — "
        "md5-bucket shard + md5-rank position within the shard — so "
        "sequential shard reads see a uniformly shuffled corpus, "
        "reproducible from (key, seed) on any partitioning; epoch "
        "reshuffles are a new seed. The only exchange is the hash "
        "partition on shard; the sort is partition-local (grouped "
        "window), never a global ORDER BY hash. md5 rank string, so the "
        "FULL assignment is replayed and hash-checked in DuckDB."
    ),
)
def q_shuffle_shards(spark, sf_dir):
    from ..operators.training import shuffle_shard_assign

    d = _t(spark, sf_dir, "documents")
    return shuffle_shard_assign(d, ["doc_id"], shards=8, seed=42).select(
        "doc_id", "shard", "pos"
    )


@register(
    "q_temperature_mix",
    sql="""
    WITH c AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    t AS (SELECT sum(n_docs) AS n FROM c),
    p AS (
      SELECT c.lang, c.n_docs,
             c.n_docs / t.n AS share,
             pow(c.n_docs / t.n, 0.3) AS pa,
             t.n AS n
      FROM c CROSS JOIN t
    ),
    z AS (SELECT sum(pa) AS z FROM p)
    SELECT p.lang, p.n_docs,
           round(p.share, 8)           AS share,
           round(p.pa / z.z, 8)        AS weight,
           round(p.pa / z.z * p.n, 4)  AS expected_docs
    FROM p CROSS JOIN z
    """,
    doc=(
        "Temperature-scaled multilingual sampling weights (X4+ assembly "
        "family; public technique: exponentiated-share sampling, Conneau "
        "et al. XLM-R / mT5, alpha=0.3): language with corpus share p is "
        "sampled with p^alpha / sum(p^alpha), flattening head languages "
        "and up-weighting the tail. One groupBy + two 1-row accumulator "
        "broadcasts (the permanent single-row exemption class); output is "
        "|languages| rows with the resampled-epoch expected sizes. "
        "Rounded on both engines (pow/sum ULP wobble)."
    ),
)
def q_temperature_mix(spark, sf_dir):
    from ..operators.training import temperature_mix_weights

    d = _t(spark, sf_dir, "documents")
    w = temperature_mix_weights(d, group_col="lang", alpha=0.3)
    return w.select(
        F.col("group").alias("lang"),
        "n_docs",
        F.round("share", 8).alias("share"),
        F.round("weight", 8).alias("weight"),
        F.round("expected_docs", 4).alias("expected_docs"),
    )


@register(
    "q_dsir_weights",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    tb AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 10))::BIGINT % 64 AS b
      FROM tok
    ),
    tdist AS (
      SELECT b, count(*) AS tc FROM tb
      WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
      GROUP BY b
    ),
    sdist AS (SELECT b, count(*) AS sc FROM tb GROUP BY b),
    tt AS (SELECT sum(tc) AS tt FROM tdist),
    st AS (SELECT sum(sc) AS st FROM sdist),
    lam AS (
      SELECT r.b,
             CAST(round(1000000.0 * (
               ln((coalesce(tc, 0) + 1.0) / (tt + 64.0))
               - ln((coalesce(sc, 0) + 1.0) / (st + 64.0))
             ), 0) AS BIGINT) AS lam
      FROM (SELECT unnest(range(0, 64)) AS b) r
      LEFT JOIN tdist USING (b)
      LEFT JOIN sdist USING (b)
      CROSS JOIN tt CROSS JOIN st
    ),
    sc2 AS (
      SELECT tb.doc_id, sum(lam) / 1000000.0 AS score
      FROM tb JOIN lam USING (b) GROUP BY tb.doc_id
    )
    SELECT d.doc_id, coalesce(sc2.score, 0.0) AS score
    FROM documents d LEFT JOIN sc2 USING (doc_id)
    """,
    doc=(
        "DSIR importance weights (X4+ data-selection family; public "
        "technique: Xie et al. 2023, importance resampling for LM data "
        "selection): per-document hashed-unigram log-likelihood ratio "
        "between the English target slice and the full source corpus — "
        "top scores are the documents most target-like. Engine-portable "
        "by construction: the per-bucket log-ratio is quantized in-plan "
        "to round(1e6*lambda) integers, so every document fold is an "
        "order-independent exact integer sum (the q_model_score "
        "discipline); ln-ULP wobble is confined to the lambda rounding "
        "boundary. Token text never leaves the scan stage; distributions "
        "are O(64) rows; scoring is a broadcast join + integer groupBy."
    ),
)
def q_dsir_weights(spark, sf_dir):
    from ..operators.training import dsir_importance

    d = _t(spark, sf_dir, "documents")
    return dsir_importance(d, d.filter(F.col("lang") == "en"))
