"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 is exposed here as a named query
over the driver testdata so the driver's correctness gate (Spark vs DuckDB,
row-count + schema + order-insensitive value hash) covers it. Column aliases
are kept IDENTICAL between the Spark plan and the oracle SQL.

Cross-engine determinism rules used throughout:
  - raw values (min/max/count and projected columns) are emitted untouched;
  - derived floating-point values (sums/avgs/corr/cosine) are rounded inside
    BOTH queries so bit-level accumulation-order differences cannot leak into
    the hash;
  - timestamps are emitted as microseconds-since-epoch (unix_micros/epoch_us)
    to avoid engine-specific timestamp rendering;
  - no bare LIMIT on ties — top-k always breaks ties on a unique key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => driver records rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 registry entries.
# Rounds 2-8 cumulatively hash-checked 221 of the 236 registrations then
# present (r8: 50/50 green); round 9 adds 19 new oracle-backed queries
# (259 registered / 253 oracled) which queue below the cutoff for the
# round-10 rotation — each verified this round by the local gate at
# sf0.01 (full-registry closing run), by hash against DuckDB on the
# generated sf1 tree, and by pure-Python replays at sf0.001
# (tests/test_round9b_ops.py). Rows-only-by-design set (unchanged):
# dedup_minhash_lsh / dedup_simhash / sim_ivf_topk / sim_lsh_bucketed /
# e2_yap (+ scale twin), each pinned by an oracle-backed deterministic
# operating-point twin (sim_lsh_bucketed additionally by the
# sim_lsh_recall ledger as of round 8). Everything outside the current
# window stays locally verified via scripts/verify_local.py (pandas
# canonicalization, driver-realistic).
#
# Round-9 window (verdict r8 item 1): positions 1-15 are the 15 round-8
# registrations that had never been driver-attested; 16-40 the 25 entries
# whose latest driver evidence is r4; 41-44 the queries whose code changes
# this round (CC large-star/small-star, streaming fixed-cost trim); 45-50
# the oldest r5-evidence slice. Everything below the cutoff is ordered
# stalest-evidence-first (r5, r6, r7, r8) so round 10 continues naturally.
_DRIVER_PRIORITY: list[str] = [
    # --- round-8 registrations, never driver-attested (15)
    "dedup_sorted_neighborhood",
    "doc_sequential_poisson_sample",
    "sim_hard_negatives",
    "ml_stump_split_finding",
    "txt_bm25_topk",
    "evt_survival_hazard",
    "graph_clustering_coeff",
    "sim_pq_adc_topk",
    "asof_nearest_purchase",
    "stat_spearman_rank_corr",
    "evt_burstiness_fano",
    "evt_position_attribution",
    "dq_drift_population",
    "graph_pagerank_personalized",
    "graph_degree_distribution",
    # --- r4-stale entries (25)
    "txt_bpe_train",
    "txt_bpe_pretokenize",
    "txt_bpe_pair_counts",
    "dq_column_profile",
    "evt_rolling_24h",
    "txt_unigram_surprisal",
    "doc_quality_zscore_bucket",
    "doc_length_batches",
    "emb_pca_power_iteration",
    "doc_training_order",
    "evt_transition_matrix",
    "evt_user_zscore_outliers",
    "txt_vocab_coverage",
    "dq_split_leakage_audit",
    "txt_pii_redact",
    "doc_select_token_budget",
    "doc_dsir_importance",
    "txt_heavy_hitters",
    "txt_bpe_encode",
    "doc_dsir_select",
    "dedup_multi_signal_clusters",
    "tpch_q11_important_parts",
    "tpch_q15_top_revenue_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promotion_suppliers",
    # --- code changed this round (re-attestation)
    "dedup_cluster_assign",
    "dedup_cluster_representative",
    "stream_session_stats",
    "stream_window_stats",
    # --- new round-9 registrations (never attested — take the fill slots)
    "graph_hits_integer",
    "evt_markov_stationary",
    "stat_welch_ttest",
    "sim_mmr_diversified_topk",
    # --- oldest r5-evidence slice (remaining fills)
    "dq_footer_profile",
    "doc_mix_weights",
    # ---------------- position 50 cutoff ----------------
    # Below: stalest-evidence-first (r5 remainder, then r6/r7/r8).
    "ml_quality_classifier_train",
    "e2_yap_closed_form_curved",
    "dedup_semantic",
    "e1_max_params",
    "e2_yap",
    "stream_dedup_frames",
    "flagship_bounded_max",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_priority",
    "tpch_q14_promo_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_orders",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_join",
    "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_accounts",
    "pivot_priority_by_nation",
    "unpivot_part_metrics",
    "grouped_having_sort",
    "corr_per_group",
    "histogram_bins",
    "trig_heading_wrap",
    "conditional_recode_clip",
    "join_multi_key",
    "temporal_self_join",
    "batch_sessionize",
    "asof_last_purchase",
    "range_join_near_events",
    "semi_anti_join",
    "union_dedup_sorted",
    "offset_from_first",
    "first_crossing_after_start",
    "rollup_hierarchy",
    "cube_order_profile",
    "set_ops_intersect_except",
    "window_rank_family",
    "approx_count_distinct",
    "skew_salted_agg",
    "sql_interface",
    "graph_khop_reachability",
    "agg_countmin_sketch",
    "evt_ewma_fixed_point",
    "evt_sequence_match",
    "src_schema_evolution_scan",
    "stat_chi2_independence",
    "evt_sliding_distinct_users",
    "txt_token_lift_pairs",
    "txt_simpson_diversity",
    "doc_winsorized_stats",
    "ml_naive_bayes_train",
    "dq_referential_integrity",
    "evt_autocovariance_lags",
    "stream_sliding_window_stats",
    "graph_triangle_count",
    "evt_gap_fill_locf",
    "txt_fuzzy_blocked_levenshtein",
    "agg_hll_shard_union",
    "ml_linreg_closed_form",
    "stat_ks_two_sample",
    "src_binaryfile_scan",
    "src_xml_roundtrip",
    "agg_grouping_sets",
    "dq_try_arithmetic",
    "evt_session_window_batch",
    "cdc_apply_changelog",
    "json_variant_extract",
    "txt_chunk_udtf",
    "agg_weighted_median",
    "dq_observe_metrics",
    "src_pysource_generate",
    "stream_state_introspection",
    "emb_arrow_norm_audit",
    "src_pysource_write_roundtrip",
    "src_pysource_stream_agg",
    "scd2_pointintime_join",
    "cogroup_order_reconcile",
    "src_jsonl_roundtrip",
    "src_orc_roundtrip",
    "src_zorder_pruned_scan",
    "evt_hypertable_rollup",
    "txt_bigram_lm_surprisal",
    "stream_enrich_window_stats",
    "src_snapshot_time_travel",
    "evt_rollup_incremental_refresh",
    "stream_interval_join_stats",
    "stream_stateful_running_max",
    "mm_byte_features",
    "stat_mann_whitney_u",
    "agg_gini_per_nation",
    "argmax_per_group",
    "distinct_keys",
    "filter_project_pushdown",
    "grouped_percentiles",
    "json_props_rollup",
    "ordered_rank_lag",
    "point_lookup",
    "skew_salted_join",
    "summary_stats",
    "timestamp_parts",
    "approx_quantiles",
    "dedup_embedding_cosine",
    "dedup_incremental_batch",
    "dedup_ngram_jaccard",
    "doc_leakage_safe_split",
    "doc_pack_context_windows",
    "doc_shard_manifest",
    "doc_stratified_sample",
    "dq_expectations_check",
    "emb_dimension_stats",
    "emb_int8_quantize",
    "emb_kmeans_lloyd",
    "emb_label_centroids",
    "evt_cohort_retention",
    "evt_funnel_conversion",
    "mm_binary_stats",
    "mm_frame_sample",
    "pipeline_corpus_clean",
    "sim_label_cohesion",
    "sim_knn_join",
    "sim_topk_bruteforce",
    "single_play_trajectory",
    "tpch_q2_top_supplier_per_nation",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_nation_profit",
    "txt_contamination_check",
    "txt_fingerprint_exact_dedup",
    "txt_repetition_filter",
    "txt_span_dedup",
    "txt_tfidf_topterms",
    "txt_token_quality",
    "txt_vocab_topk",
    "txt_winnow_fingerprint",
    "dedup_prefix_filter_jaccard",
    "agg_kmv_distinct",
    "agg_bitmap_audience_overlap",
    "graph_weighted_sssp",
    "graph_label_propagation",
    "stat_anova_oneway",
    "evt_changepoint_cusum",
    "evt_last_touch_attribution",
    "scd2_bitemporal_asof",
    "dq_benford_first_digit",
    "evt_rfm_segmentation",
    "graph_adamic_adar_links",
    "spatial_proximity_pairs",
    "agg_hll_overlap_estimate",
    "opt_pareto_frontier",
    "dedup_containment_pairs",
    "graph_temporal_reachability",
    "doc_quota_sample",
    "evt_absence_churn",
    "evt_interval_union_time",
    "evt_seasonal_decompose",
    "ml_eval_confusion",
    "stat_mad_outliers",
    "agg_fixed_grid_quantiles",
    "agg_cms_join_size",
    "dq_skew_report",
    "dq_table_checksum",
    "dedup_minhash_exact_dups",
    "dedup_simhash_identical",
    "e2_yap_scale",
    "sim_ivf_probeall_topk",
    "sim_lsh_bucketed",
    "sim_lsh_recall",
    "case_lookup_dim_join",
    "graph_kcore_peel",
    "graph_pagerank_trading",
    "e2_yap_closed_form",
    "e3_player_stats",
    "e3_position_params",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ivf_topk",
    "txt_lang_id",
    "txt_regex_extract",
    "json_build_extract",
    "arr_top_components",
    "pipeline_curation_funnel",
    "mm_decode_features",
    "mm_video_frame_decode",
    "mm_resize_features",
    "mm_audio_features",
    "doc_quota_per_source",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry. The
    # pipeline family modules (split out of pipeline_ops in round 9)
    # register directly; pipeline_ops remains the compat re-export.
    from . import relational  # noqa: F401
    from . import pipeline_txt  # noqa: F401
    from . import pipeline_evt  # noqa: F401
    from . import pipeline_stats  # noqa: F401
    from . import pipeline_graph  # noqa: F401
    from . import pipeline_sim  # noqa: F401
    from . import domain  # noqa: F401
    from . import reporting  # noqa: F401
    from . import tpch_suite  # noqa: F401
    from . import format_ops  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
