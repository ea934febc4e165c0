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
# Round-2 verified the 50 relational registrations; round 3 rotated onto the
# domain/LLM-pipeline half (46 green / 1 float-flake, fixed). Round 4 closes
# the LAST evidence gap: the window now leads with every query that has
# NEVER had a driver correctness row in any round (26 carried over from the
# round-3 audit + the sixteen new round-4 registrations: the YAP closed-form
# operating point, the image/video/resize/audio decode paths, the
# tumbling-window and at-least-once-dedup streaming queries, the 3-round
# BPE merge trainer, the curation funnel, the PII scrub, the token-budget
# selection prefix-sum, the DSIR importance weights + budgeted DSIR
# selection, the Misra-Gries exact heavy-hitters and the BPE
# encoder), then the queries whose code
# changed this round and need fresh rows (doc_mix_weights' exact-integer
# denominator fix; the two dedup-clustering queries now riding the banded-LSH
# edge source), then 5 re-confirmation slots (domain kernels E1/E2/E3
# and streaming sessionization — the dedup/similarity/clustering/text
# re-confirmations listed after position 50 are round-2/3 driver-green
# and sit outside this round's window).
# Everything displaced is driver-green from
# rounds 2-3 with unchanged code and stays locally verified via
# scripts/verify_local.py. Four of the leading entries (dedup_minhash_lsh /
# dedup_simhash / sim_ivf_topk / mm_byte_features) are rows-only BY DESIGN
# (hash-seeded machinery; their deterministic oracle-backed operating
# points dedup_minhash_exact_dups / dedup_simhash_identical /
# sim_ivf_probeall_topk all carry green round-3 driver rows and sit
# past position 50 this round).
_DRIVER_PRIORITY: list[str] = [
    # --- never driver-checked: TPC-H scalar-subquery/anti-join shapes
    "tpch_q11_important_parts",
    "tpch_q15_top_revenue_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promotion_suppliers",
    # --- never driver-checked: embeddings / events analytics
    "emb_pca_power_iteration",
    "evt_rolling_24h",
    "evt_transition_matrix",
    "evt_user_zscore_outliers",
    # --- never driver-checked: CCNet/Gopher-style curation + data ops
    "txt_unigram_surprisal",
    "txt_vocab_coverage",
    "doc_training_order",
    "doc_quality_zscore_bucket",
    "doc_length_batches",
    "dq_split_leakage_audit",
    "dq_column_profile",
    "doc_quota_per_source",
    "txt_bpe_pretokenize",
    "txt_bpe_pair_counts",
    # --- never driver-checked: map-only text/JSON/array shapes
    "txt_lang_id",
    "txt_regex_extract",
    "json_build_extract",
    "arr_top_components",
    # --- never driver-checked: rows-only by design (hash-seeded)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ivf_topk",
    "mm_byte_features",
    # --- new this round
    "e2_yap_closed_form",
    "mm_decode_features",
    "mm_video_frame_decode",
    "mm_resize_features",
    "mm_audio_features",
    "stream_window_stats",
    "stream_dedup_frames",
    "txt_bpe_train",
    "txt_bpe_encode",
    "pipeline_curation_funnel",
    "txt_pii_redact",
    "doc_select_token_budget",
    "doc_dsir_importance",
    "doc_dsir_select",
    "txt_heavy_hitters",
    "dedup_multi_signal_clusters",
    # --- changed this round: need fresh rows
    "doc_mix_weights",
    "dedup_cluster_assign",
    "dedup_cluster_representative",
    # --- re-confirmation slots (driver-green r2/r3, code unchanged)
    "e1_max_params",
    "e2_yap",
    "stream_session_stats",
    "e3_player_stats",
    "e3_position_params",
    "dedup_minhash_exact_dups",
    "dedup_simhash_identical",
    "sim_ivf_probeall_topk",
    "sim_knn_join",
    "emb_kmeans_lloyd",
    "ml_quality_classifier_train",
    "dedup_ngram_jaccard",
]


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from . import relational  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import domain  # noqa: F401
    from . import reporting  # noqa: F401
    from . import tpch_suite  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
