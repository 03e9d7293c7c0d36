"""Query catalog — the engine's declared operator surface.

Every operator family from SURVEY.md §2 (plus the beyond-reference
LLM-data-pipeline operators) is declared here as a named entry with

- ``fn(spark, sf_dir) -> DataFrame``: the Spark-first implementation
  (DataFrame API / Spark SQL), and
- ``oracle``: the equivalent ANSI SQL that DuckDB runs on the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops —
  the driver then records a rows-only check).

Column names are aliased identically on both sides; the driver's
compare sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


CATALOG: dict[str, QueryEntry] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in CATALOG:
            raise ValueError(f"duplicate query name {name!r}")
        CATALOG[name] = QueryEntry(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # importing the modules populates CATALOG via @register
    from . import tpch  # noqa: F401
    from . import relational  # noqa: F401
    from . import timeops  # noqa: F401
    from . import textops  # noqa: F401
    from . import corpusops  # noqa: F401
    from . import vectorops  # noqa: F401
    from . import linkingops  # noqa: F401
    from . import dedupops  # noqa: F401
    from . import streamops  # noqa: F401
    from . import parity  # noqa: F401
    from . import trackingops  # noqa: F401
    from . import llmprep  # noqa: F401
    from . import hygieneops  # noqa: F401
    from . import sketchops  # noqa: F401
    from . import graphops  # noqa: F401
    from . import behaviorops  # noqa: F401
    from . import searchops  # noqa: F401
    from . import cdcops  # noqa: F401
    from . import webprep  # noqa: F401
    from . import prepops  # noqa: F401
    from . import evalops  # noqa: F401
    from . import statops  # noqa: F401
    from . import mlops  # noqa: F401
    from . import martops  # noqa: F401
    from . import insightops  # noqa: F401
    from . import nlops  # noqa: F401


# Queries already driver-verified green in CORRECTNESS_r01.json or
# CORRECTNESS_r02.json. Emitted LAST so that, if the harness caps the
# per-round query count (~50/round observed), the not-yet-verified
# entries get checked first.
_R1_VERIFIED: frozenset[str] = frozenset({
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "q20_potential_promotion", "q21_waiting_orders", "q22_global_sales_opportunity",
    "filter_date_between", "filter_latest_day", "filter_conditional",
    "filter_isin", "filter_nonzero_notnull", "semi_join_dim", "anti_join_errors",
    "classify_when_otherwise", "broadcast_dim_join", "tracking_set_diff",
    "session_differencing", "keep_last_dedup", "rolling_avg_24",
    "topk_per_group", "group_agg_sum_first", "dup_row_aggregation",
    "exact_row_dedup", "value_quality_stats", "cube_rollup_agg",
    "sign_multiplier", "union_by_name", "unpivot_measures", "pivot_status",
    "ntile_quartiles", "sql_api_revenue_report", "hourly_rollup",
    "expand_hourly_to_15min", "parse_hour_range", "parse_quarter_period",
    "parse_european_decimal",
    # CORRECTNESS_r02 greens
    "embedding_near_dup_pairs", "simhash_near_pairs", "minhash_lsh_pairs",
    "minhash_signatures", "ann_lsh_bucketed", "ann_ivf_topk",
    "ann_ivf_trained", "ann_cosine_topk", "pipeline_esios_e2e",
    "pipeline_omie_e2e", "pipeline_i90_errors_e2e",
    "pipeline_intra_differencing_e2e", "precios_hourly_read_e2e",
    "linking_hash_match", "linking_profile_hash", "streaming_hourly_agg",
    "stateful_user_totals", "session_window_agg", "zr_tracking_changes",
    "p48_tecnologias_update", "near_dup_clusters", "near_dup_keep_corpus",
    "stream_stream_join", "cluster_balanced_sample", "minhash_lsh_pairs_k32",
    "asof_join_last_click", "decontaminate_ngrams", "train_val_test_split",
    "exact_dedup_docs", "ngram_jaccard_pairs", "multimodal_features",
    "multimodal_frame_sample", "text_fingerprint", "madrid_local_to_utc",
    "up_tracking_changes", "pipeline_curtailments_e2e", "pii_scrub",
    "intra_doc_dedup", "embedding_norm_stats", "text_bpe_token_count",
    "text_repetition_score", "stratified_sample_docs", "text_token_stats",
    "text_quality_score", "text_lang_id",
})


# Queries driver-verified green in CORRECTNESS_r04.json (49 greens at
# 12:58 UTC on the final r4 commit — every row is on current code).
# The one r4 FAIL, inverted_index_postings, stays out of this set and
# at the head of _PRIORITY: its array output column crashed the
# driver's pandas canonicalizer, fixed in r5 by emitting the sorted
# posting list comma-joined as a string (searchops.py).
_R4_VERIFIED: frozenset[str] = frozenset({
    "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_trained",
    "ann_lsh_bucketed", "audio_features_e2e", "bloom_decontaminate",
    "bpe_merge_pair_counts", "cdc_apply_changes", "cms_join_cardinality",
    "cms_token_counts", "compaction_bin_packing", "doc_chunk_windows",
    "domain_quota_cap", "dup_window_spans", "embedding_near_dup_pairs",
    "funnel_conversion", "fuzzy_decontaminate_minhash",
    "fuzzy_name_match_pairs", "gopher_quality_report",
    "hll_distinct_audit", "hll_set_union_intersect",
    "incremental_agg_maintenance", "length_band_trim",
    "minhash_lsh_pairs", "minhash_lsh_pairs_capped",
    "minhash_lsh_pairs_k32", "multimodal_features", "near_dup_clusters",
    "near_dup_clusters_star", "near_dup_keep_corpus",
    "ngram_jaccard_pairs", "ngram_lm_score", "pagerank_bipartite",
    "perplexity_tertile_split", "q11_important_stock",
    "q12_shipping_modes", "random_projection_reduce",
    "retention_cohorts", "salted_skew_join", "scd2_point_in_time_join",
    "semdedup_prune", "shingle_containment_pairs", "simhash_fingerprint",
    "simhash_near_pairs", "stream_funnel_stage", "table_profile_stats",
    "up_link_eligibility", "url_canonicalize_dedup",
    "zorder_layout_stats",
})

# Queries driver-verified green in CORRECTNESS_r05.json (50/50 green
# on the final r5 commit). This run cleared the whole r4 backlog: the
# 3 _REVERIFY names (inverted_index_postings reshape, semdedup_prune
# repartition, url_canonicalize_dedup idempotence fix), the 32
# never-checked r4 additions, and 15 of the 21 r5 additions.
_R5_VERIFIED: frozenset[str] = frozenset({
    "attribution_u_shaped", "bpe_encode_corpus", "bpe_train_merges",
    "bucketed_join_noshuffle", "chat_turns_assemble",
    "collocation_lift_topk", "concurrent_intervals_peak",
    "content_defined_chunks", "dataset_snapshot_diff",
    "dedup_cluster_report", "delta_encode_postings",
    "dq_expectations_report", "embedding_centroid_shift",
    "entity_resolution_golden", "event_pattern_match",
    "event_transition_matrix", "ewma_anomaly", "grid_gap_interpolation",
    "hard_negative_mining", "histogram_quantile_estimate",
    "hopping_window_agg", "hybrid_rrf_fusion", "incremental_minhash_dedup",
    "inverted_index_postings", "jaccard_knn_topk", "kcore_decomposition",
    "key_skew_report", "lsh_recall_eval", "ngram_novelty_score",
    "normalized_exact_dedup", "pareto_frontier", "phrase_match_count",
    "prefix_filter_jaccard_join", "priority_sample_weighted",
    "reservoir_group_sample", "rfm_segmentation", "seasonal_naive_backtest",
    "semdedup_prune", "sequence_support_topk", "span_corruption_pairs",
    "stream_ewma_anomaly", "stream_topk_trending",
    "temperature_mixture_sample", "time_to_convert_cohorts",
    "time_weighted_average", "triangle_count", "url_canonicalize_dedup",
    "value_outlier_mad", "vocab_oov_coverage", "winsorized_robust_stats",
})

# Queries driver-verified green in CORRECTNESS_r06.json (50/50 green
# at 09:20 UTC on the final r6 commit — every row on current code).
# This run re-proved the whole r6 _REVERIFY set (the x30-probe
# redesigns: scaled-codebook semdedup, 60-bit simhash, scaled-plane
# embedding LSH, unrounded-jaccard knn oracle, per-run bucketed-join
# tables) plus 44 of the r6 additions.
_R6_VERIFIED: frozenset[str] = frozenset({
    "jaccard_knn_topk", "bucketed_join_noshuffle", "semdedup_prune",
    "simhash_fingerprint", "simhash_near_pairs",
    "embedding_near_dup_pairs", "greedy_max_coverage",
    "ohlc_bars_hourly", "table_checksum_diff", "cusum_changepoint",
    "ann_recall_mrr_eval", "stream_cusum_alarm", "leakage_safe_split",
    "tokenizer_fertility_report", "pq_quantize_stats",
    "lsh_edit_distance_verify", "boilerplate_line_removal",
    "seasonal_decompose_ma", "hashed_linear_classifier",
    "k_anonymity_report", "stream_scd1_upsert",
    "dsir_importance_weights", "late_arrival_audit", "ann_pq_adc_topk",
    "quality_keeper_selection", "exact_substring_trim",
    "source_overlap_matrix", "domain_blocklist_filter",
    "classifier_auc_eval", "nb_crossval_accuracy", "nb_lang_confusion",
    "minhash_estimate_error", "chi2_feature_terms",
    "khop_reachability", "twopass_exact_median",
    "distribution_drift_chi2", "neyman_allocation_sample",
    "bloom_join_prefilter", "spearman_rank_corr", "ks_drift_stat",
    "cohens_kappa_agreement", "gini_token_concentration",
    "benford_first_digit", "lexical_diversity_report",
    "zipf_octave_profile", "zonemap_prune_audit", "l_diversity_report",
    "pca_power_iteration", "skipgram_negative_samples",
    "analyze_column_stats",
})

# Queries driver-verified green in CORRECTNESS_r07.json (50/50 green
# on the final r7 commit — every row on current code). This run
# cleared the whole backlog: the 2 r7 _REVERIFY names (x100-probe
# re-plans), all 24 never-checked late-r6 ops, the 5 early-r7 ops,
# and 19 of the 23 hint-only names.
_R7_VERIFIED: frozenset[str] = frozenset({
    "ab_test_zscore", "activity_streaks", "asof_join_next_purchase",
    "autocorrelation_lags", "badword_filter_report",
    "bitmap_intersection_audit", "bloom_decontaminate",
    "boilerplate_ngrams", "brand_month_movers", "calibration_ece_report",
    "cohort_ltv_curve", "conformal_prediction_interval",
    "copurchase_item_similarity", "corpus_prep_e2e",
    "cross_doc_paragraph_dedup", "dataset_card_report",
    "decontaminate_hashed_ngrams", "decontaminate_ngrams",
    "dict_encoding_audit", "dow_hour_heatmap", "dup_window_spans",
    "fk_integrity_audit", "fuzzy_decontaminate_minhash",
    "graph_modularity_score", "grouping_sets_report", "hll_daily_series",
    "image_bucket_batching", "interleave_mixture_shards",
    "ivf_incremental_assign", "label_centroid_similarity",
    "markov_attribution_removal", "markov_steady_state",
    "minhash_signatures", "near_dup_clusters", "near_dup_clusters_star",
    "near_dup_keep_corpus", "ngram_jaccard_pairs", "ngram_lm_score",
    "order_total_reconciliation", "preference_pairs_assemble",
    "q14_promo_revenue", "q19_disjunctive_predicates",
    "q21_waiting_orders", "q3_shipping_priority", "semdedup_prune",
    "shingle_containment_pairs", "simhash_near_pairs",
    "stream_conformal_alarm", "t_closeness_report",
    "weighted_percentile_exact",
})

# Queries driver-verified green in CORRECTNESS_r08.json (50/50 green).
# This run cleared the backlog completely: all 25 never-driver-checked
# names (5 late-r7 + 20 r8 additions), the 2 r8 _REVERIFY names
# (simhash localCheckpoint re-plan, semdedup oracle extension), the 4
# hint-only TPC-H spillovers, and 19 TPC-H re-proves. After this
# freeze: 307 queries, 307 ever driver-checked, zero never-checked.
_R8_VERIFIED: frozenset[str] = frozenset({
    "asof_join_feature_staleness", "blocking_strategy_eval",
    "burst_detection_viterbi", "doremi_domain_weights",
    "filter_date_between", "fim_transform_spans",
    "hourly_trend_regression", "join_cardinality_audit",
    "kcenter_coreset_sample", "kmv_theta_setops", "lsh_parameter_plan",
    "misra_gries_heavy_hitters", "ndcg_at_k_eval", "nl_avg_daily_price",
    "nl_avg_volume_latest_day", "nl_price_volume_join",
    "nl_total_volume_by_market", "pass_at_k_eval", "q10_returned_items",
    "q11_important_stock", "q12_shipping_modes",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "q1_pricing_summary", "q20_potential_promotion", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "rendezvous_shard_rebalance", "salt_plan_report", "semdedup_prune",
    "sequential_sprt_monitor", "shuffle_partition_advisor",
    "simhash_near_pairs", "sorted_neighborhood_pairs",
    "source_lexical_distance", "token_budget_waterfill",
    "vopt_histogram_boundaries",
})

# Queries driver-verified green in CORRECTNESS_r09.json (50/50 green
# on the final r9 commit). This run cleared the whole r9 queue: the 16
# _REVERIFY names (10 streaming drive-path + 6 ADVICE-fix), all 25 r9
# additions (including the two final-commit ops
# power_analysis_sample_size / srm_check, independently re-verified at
# sf0.1 by the r9 judge), and 9 TPC-H re-proves. After this freeze:
# 332 queries, 332 ever driver-checked, zero never-checked, zero red.
_R9_VERIFIED: frozenset[str] = frozenset({
    "best_of_n_curve", "bradley_terry_mm", "brier_decomposition",
    "classifier_fairness_audit", "contrastive_hard_negatives",
    "cuped_variance_reduction", "delta_method_ratio_ci",
    "difference_in_differences", "facility_location_select",
    "fim_transform_spans", "isotonic_calibration_pav",
    "kmeans_lloyd_refine", "logistic_regression_gd",
    "loo_source_influence", "mann_whitney_u_test",
    "matryoshka_dim_recall", "mmr_diverse_rank", "nb_learning_curve",
    "nelson_aalen_hazard", "nl_avg_daily_price",
    "nl_avg_volume_latest_day", "nl_price_volume_join",
    "nl_total_volume_by_market", "pass_at_k_eval",
    "permutation_test_fdr", "poisson_bootstrap_ci",
    "post_stratified_effect", "power_analysis_sample_size",
    "q10_returned_items", "q14_promo_revenue",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q1_pricing_summary", "q22_global_sales_opportunity",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "shapley_channel_attribution", "srm_check",
    "stateful_user_totals", "stream_conformal_alarm",
    "stream_cusum_alarm", "stream_dedup", "stream_ewma_anomaly",
    "stream_funnel_stage", "stream_scd1_upsert",
    "stream_session_window", "stream_stream_join",
    "stream_topk_trending", "streaming_hourly_agg",
})

# Queries driver-verified green in CORRECTNESS_r10.json (50/50 green
# on the final r10 commit): the 3 _REVERIFY names (r9 ADVICE fixes),
# all 20 r10 additions, all 22 TPC-H queries, and 5 filter parity
# queries. After this freeze: 352 queries, 352 ever driver-checked,
# zero never-checked, zero red.
_R10_VERIFIED: frozenset[str] = frozenset({
    "best_of_n_curve", "chunk_overlap_stitch", "cluster_purity_nmi",
    "dup_substring_maxlen", "edge_triangle_support",
    "filter_conditional", "filter_date_between", "filter_isin",
    "filter_latest_day", "filter_nonzero_notnull",
    "greedy_unigram_acceptance", "grpo_advantage",
    "hilbert_layout_stats", "krippendorff_alpha",
    "length_controlled_win_rate", "mcnemar_paired_test",
    "nucleus_topp_cutoff", "post_stratified_effect",
    "preference_cycle_audit", "psi_drift_report", "q10_returned_items",
    "q11_important_stock", "q12_shipping_modes",
    "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_predicates", "q1_pricing_summary",
    "q20_potential_promotion", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "readability_index_report", "shapley_channel_attribution",
    "stream_dedup_within_watermark", "stream_full_outer_join",
    "stream_hourly_agg_append", "stream_session_window_append",
    "stream_stream_left_outer", "weighted_jaccard_pairs",
})

_R11_VERIFIED: frozenset[str] = frozenset({
    "bigram_entropy_rate", "bloom_prune_audit", "cem_matching_att",
    "degree_assortativity", "dpo_pair_loss_stats", "eb_rate_shrinkage",
    "hill_tail_index", "icws_weighted_lsh_pairs", "ktruss_decomposition",
    "label_propagation_cc", "lm_bigram_perplexity", "lrs_cross_doc_exact",
    "mlm_masking_plan", "offpolicy_ips_snips", "qte_median",
    "quantile_norm_map", "stream_full_outer_asym_wm",
    "stream_rate_limit_window", "successive_halving_suppliers",
})

# Queries driver-verified green in CORRECTNESS_r12.json (50/50 green on
# the final r12 commit): the 5 r12 _REVERIFY names (ADVICE r11 fixes),
# all 14 r12 additions, the 22 TPC-H queries and the filter/join parity
# rows the sample rotated in. After this freeze: every green name in
# the newest driver CORRECTNESS file is frozen into a _RN_VERIFIED set.
_R12_VERIFIED: frozenset[str] = frozenset({
    "anti_join_errors", "broadcast_dim_join", "classify_when_otherwise",
    "exact_substring_remove", "fellegi_sunter_linkage",
    "filter_conditional", "filter_date_between", "filter_isin",
    "filter_latest_day", "filter_nonzero_notnull", "hill_tail_index",
    "holt_linear_forecast", "icws_weighted_lsh_pairs",
    "icws_weighted_lsh_pairs_prod", "incremental_join_maintenance",
    "lm_stupid_backoff_perplexity", "louvain_one_pass",
    "lrs_cross_doc_exact", "maxsim_multivector_topk",
    "nl_rolling_avg_price_24", "nl_top_markets_by_volume",
    "q10_returned_items", "q11_important_stock", "q12_shipping_modes",
    "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_predicates", "q1_pricing_summary",
    "q20_potential_promotion", "q21_waiting_orders",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "semi_join_dim", "stream_chained_window_rollup",
    "stream_rate_limit_window", "stream_visit_ttl_timeout",
    "vinculacion_monitor_e2e", "weighted_jaccard_pairs",
    "winnowing_fingerprints",
})

# Queries whose Spark implementation changed AFTER their last green
# driver CORRECTNESS row (VERDICT r3 "What's wrong" §1: a green row on
# old code is not a green row on current code). These are pulled back
# out of the verified-emit-last set and emitted FIRST so the capped
# (~50/round) driver run re-checks the current code.
# r13 queue — optimization-round plan changes, impl changed after the
# last green driver rows (every one re-proven against the local DuckDB
# oracle at sf0.01 AND sf0.1 before landing; the queue just routes the
# capped driver run at fresh greens on current code):
# markov_attribution_removal: empty-events .get() guard + bounded-state
#   assert around the collected transition matrix (ADVICE r12).
# IVF-assignment family: with_ivf_cell(n_probe=1) carries payload
#   columns inside the min-struct key instead of F.first() (ADVICE r12
#   coherent-row fix) — touches every n_probe=1 assignment consumer.
# doremi_domain_weights: iterations moved to a bounded driver-side
#   integer fixed point (markov precedent).
# loo_source_influence: window argmax -> min-struct aggregate.
# lsh_recall_eval: one shared checkpointed shingle lineage feeds both
#   the exact-truth and the candidate sides.
_REVERIFY: tuple[str, ...] = (
    "markov_attribution_removal",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "ann_recall_mrr_eval",
    "cluster_balanced_sample",
    "hard_negative_mining",
    "doremi_domain_weights",
    "loo_source_influence",
    "lsh_recall_eval",
    # lsh_candidate_pairs: banded table checkpointed so the bucket
    #   self-join no longer re-runs the signature lineage per side —
    #   touches every MinHash-LSH candidate consumer:
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_capped",
    "minhash_lsh_pairs_k32",
    "lsh_edit_distance_verify",
    "jaccard_knn_topk",
    "minhash_estimate_error",
    # lrs_cross_doc_exact: cross-doc bucket count folded into the
    #   suffix window pass (second corpus explode removed).
    "lrs_cross_doc_exact",
    # _cws_parts: the checkpointed capped tf relation now carries
    #   xxhash64 int64 gram keys for the exact/verify joins.
    "icws_weighted_lsh_pairs",
    "icws_weighted_lsh_pairs_prod",
)

# Queries driver-verified green in CORRECTNESS_r03.json whose code is
# UNCHANGED since the r3 gate commit (f5a5c16) — they join the
# emit-last tail so the capped run spends its slots on unverified and
# impl-changed entries instead of re-proving stable code.
_R3_VERIFIED: frozenset[str] = frozenset({
    "bm25_topk_docs", "boilerplate_ngrams", "decontaminate_hashed_ngrams",
    "deterministic_shuffle", "embedding_quantize_int8",
    "first_ordered_per_group", "incremental_exact_dedup",
    "interval_range_join", "json_extract_props", "json_map_explode",
    "literal_map_lookup", "parse_contract_code",
    "percentile_distinct_stats", "quality_filter_chain",
    "quarantine_bad_records", "range_window_1h", "rollup_agg",
    "rollup_cascade_daily", "skew_twophase_agg", "stream_dedup",
    "tfidf_topk_docs", "zero_padded_codes",
    "sessionization", "corpus_prep_e2e",
    "corpus_composition_report", "token_budget_packing",
    "quarter_to_utc", "cross_doc_paragraph_dedup", "mixture_resample",
    "q5_local_supplier_volume",
})

# Within the unverified set, emit first the re-verification queue
# (impl changed after the last green driver row), then new r10
# operators (appended as they land). Per the freeze ritual: every
# CORRECTNESS_r09 green is frozen in _R9_VERIFIED above AND pruned
# from this tuple — _ordered() subtracts set(_PRIORITY) from the
# verified set, so a stale entry here would silently re-prove a
# frozen name and burn a cap slot
# (test_frozen_names_pruned_from_priority closes the loophole).
_PRIORITY: tuple[str, ...] = _REVERIFY + (
    # r13 additions (never driver-checked) append here as they land
)


def _ordered() -> list[str]:
    names = list(CATALOG)
    verified = (
        _R1_VERIFIED | _R3_VERIFIED | _R4_VERIFIED | _R5_VERIFIED
        | _R6_VERIFIED | _R7_VERIFIED | _R8_VERIFIED | _R9_VERIFIED
        | _R10_VERIFIED | _R11_VERIFIED | _R12_VERIFIED
    ) - set(_PRIORITY)
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    unverified = sorted(
        (n for n in names if n not in verified),
        key=lambda n: (rank.get(n, len(_PRIORITY)), names.index(n)),
    )
    return unverified + [n for n in names if n in verified]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: CATALOG[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: CATALOG[name].oracle for name in _ordered() if CATALOG[name].oracle is not None}
