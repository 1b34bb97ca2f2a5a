"""N-gram language-model quality scoring — the CCNet-style LM filter
(Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" — public method): score every document by its
cross-entropy under a corpus-trained n-gram LM, then keep/bucket documents
by score. Complements the surface-statistics quality scores
(``text.quality_score``): an LM score catches fluent-looking gibberish
that length/punctuation ratios miss.

Spark-first shape (all Column algebra, no UDFs):

1. tokenize once (shared :func:`..operators.text.tokens` house tokenizer);
2. per-document adjacent bigrams via the same ``transform + slice``
   pattern as BPE pair counting (``operators/bpe.py``) — map-side;
3. TRAIN: global bigram counts ``c(w1,w2)`` and history counts ``c(w1)``
   — two grouped counts on fine-grained vocabulary keys (map-side
   partials absorb Zipf head skew), plus one 1-row vocabulary-size
   aggregate broadcast into the scoring expression;
4. SCORE: each document's bigrams equi-join the count tables on
   vocabulary keys, per-row add-k probability
   ``p = (c12 + k) / (c1 + k·V)`` and one grouped average of
   ``-log2(p)`` → bits per bigram.

Scale ledger: the LM tables are vocabulary-bounded (≪ corpus); the only
corpus-sized shuffles are the bigram count (weighted rows, combinable)
and the score join keyed on (w1, w2) — both fine-grained. Train and
score corpora may differ (``train_df``): score a new crawl slice against
last month's LM without retraining. With a separate train corpus, unseen
bigrams/histories hit the add-k floor ``k / (c1 + k·V)`` (or ``1/V`` for
an unseen history) via the left-join coalesce — never NULL, never -inf.

Determinism: probabilities are pure per-row count arithmetic (exact
integers into one pinned double tree); only the per-document AVERAGE is
order-sensitive, so the result rounds to 6 decimals on both engines
(house float-aggregate discipline, see tools/verify_local.py notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

__all__ = ["bigram_lm_crossentropy"]


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair per document."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__ws__")).filter(
        F.size("__ws__") >= 2
    )
    pair = F.transform(
        F.slice(F.col("__ws__"), 1, F.size("__ws__") - 1),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(F.col("__ws__"), i + 2).alias("w2")
        ),
    )
    return toks.select(id_col, F.explode(pair).alias("__p__")).select(
        id_col, F.col("__p__.w1").alias("__w1__"), F.col("__p__.w2").alias("__w2__")
    )


def bigram_lm_crossentropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: float = 0.5,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document cross-entropy (bits per bigram) under an add-``k``
    smoothed bigram LM trained on ``train_df`` (default: the scored corpus
    itself). Returns ``(id_col, n_bigrams, xent_bits)``; documents with
    fewer than 2 tokens have no bigrams and drop out (documented contract —
    an LM score over zero events is undefined, not 0).

    ``V`` (the smoothing vocabulary) = distinct tokens in the TRAIN corpus.
    """
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    train = train_df if train_df is not None else df
    train_bi = _doc_bigrams(train, text_col, id_col)
    # the bigram-count model table is materialized once (lazy checkpoint,
    # first consuming job runs it): it feeds BOTH the score join and the
    # c1 marginal below, and without the cut Catalyst duplicates the whole
    # tokenize+explode+aggregate subtree per consumer. Its size is
    # |distinct bigrams| (vocabulary-bounded — the LM itself), never
    # corpus-sized, so the materialization is scale-safe.
    c2 = train_bi.groupBy("__w1__", "__w2__").agg(
        F.count(F.lit(1)).alias("__c12__")
    ).localCheckpoint(eager=False)
    # c1 (bigram count by first token) is the w2-marginal of c2 — summing
    # integer counts is exact, so deriving it from c2 instead of a second
    # groupBy over the raw bigram stream removes one full tokenize+explode
    # pass over the train corpus (guide §2.4 duplicated subtrees); the
    # re-aggregate runs over |distinct bigrams| rows, not |bigrams|
    c1 = c2.groupBy("__w1__").agg(F.sum("__c12__").alias("__c1__"))
    vocab = (
        train.select(F.explode(tokens(text_col)).alias("__t__"))
        .agg(F.countDistinct("__t__").alias("__v__"))
    )

    score_bi = _doc_bigrams(df, text_col, id_col)
    joined = (
        score_bi.join(c2, ["__w1__", "__w2__"], "left")
        .join(c1, ["__w1__"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.coalesce(F.col("__c12__"), F.lit(0)) + F.lit(k)) / (
        F.coalesce(F.col("__c1__"), F.lit(0)) + F.lit(k) * F.col("__v__")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(-F.log2(p)), 6).alias("xent_bits"),
    )
