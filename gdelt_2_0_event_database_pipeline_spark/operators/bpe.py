"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The missing third leg of the tokenizer story: ``text.token_count`` counts
whitespace/BPE-ish regex tokens, ``text.token_count_bpe`` applies a
PRE-TRAINED encoding behind the tiktoken seam — this module LEARNS the
merge table from the corpus itself, the way sentencepiece/tiktoken
vocabularies are built (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public algorithm).

Distributed shape per merge round:

1. every document is an ARRAY of current symbols (starts as characters
   with a word-boundary marker);
2. adjacent-pair counting is ``transform + posexplode`` → one grouped
   count — the only shuffle, carrying (pair, partial count) rows;
3. the argmax pair is a 1-row driver aggregate (deterministic: count
   desc, then lexicographic pair order);
4. the merge applies map-side via one ``aggregate`` fold that rebuilds
   each symbol array, fusing occurrences left-to-right (exactly the
   sequential BPE semantics — a fold, not a parallel zip, because merges
   can chain: ``a a a`` with merge ``(a,a)`` → ``aa a``).

Iterations are driver-bounded like PageRank/k-hop: ``num_merges`` rounds,
``localCheckpoint`` every round to keep lineage flat. At 100 TB the
pair-count shuffle is the whole cost and it is map-side-combinable. The
production evolution (not needed at test scale) collapses the corpus to a
(word, count) table first — one extra groupBy — so each round counts
pairs over |vocab| weighted rows instead of |corpus| documents; the merge
fold and argmax are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: end-of-word marker (GPT-2 style trailing marker keeps merges from
#: crossing word boundaries)
EOW = "▁"


def _word_symbol_arrays(text_col) -> "F.Column":
    """text -> array of per-WORD symbol arrays (chars + end-of-word marker).

    Words stay separate arrays so adjacent-pair counting can never merge
    across a word boundary — flattening the document into one stream
    would make ``(EOW, first-char-of-next-word)`` the top pair on any
    natural corpus, which is not BPE."""
    words = F.split(F.lower(text_col), r"\s+")
    return F.transform(
        F.filter(words, lambda w: w != F.lit("")),
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))),
    )


def _apply_merge(sym_col, a: str, b: str):
    """Fold the symbol array left-to-right, fusing adjacent (a, b) pairs.

    Sequential semantics: after fusing, the NEW symbol cannot re-pair with
    the element before it in the same round (matching the reference BPE
    implementation's scan) — the fold naturally gives that, because the
    accumulator's tail is only compared against the incoming element.
    """
    merged = a + b
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the merge
    table ``[(left, right, count_at_merge_time), ...]`` in merge order —
    the artifact a tokenizer ships. Deterministic: ties on count break by
    lexicographic pair order, so any cluster size/partitioning produces
    the identical table."""
    syms = df.select(
        F.explode(_word_symbol_arrays(F.col(text_col))).alias("s")
    )
    syms = syms.filter(F.size("s") > 1).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = syms.select(
            F.posexplode(
                F.transform(
                    F.slice(F.col("s"), 1, F.size("s") - 1),
                    lambda x, i: F.struct(
                        x.alias("a"), F.element_at(F.col("s"), i + 2).alias("b")
                    ),
                )
            ).alias("pos", "p")
        )
        top = (
            pairs.groupBy("p")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["p"]["a"], top[0]["p"]["b"], top[0]["cnt"]
        merges.append((a, b, cnt))
        syms = syms.select(_apply_merge(F.col("s"), a, b).alias("s"))
        syms = syms.localCheckpoint()
    return merges


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to a corpus (map-side only — the merge
    list becomes plan literals, no join, no shuffle). Adds ``out_col`` as
    the symbol array after all merges in training order."""
    def _merge_each_word(a: str, b: str):
        # closure factory, NOT default-arg capture: a lambda with extra
        # defaulted params would change pyspark's HOF arity detection
        return lambda w: _apply_merge(w, a, b)

    out = _word_symbol_arrays(F.col(text_col))
    for a, b, _ in merges:
        out = F.transform(out, _merge_each_word(a, b))
    return df.withColumn(out_col, F.flatten(out))
