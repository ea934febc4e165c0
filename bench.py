"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Each query is forced end-to-end with the no-op sink (full compute, no
collect-to-driver overhead) after one warm-up of the Spark session. Prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_bounded_max",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "grouped_having_sort",
    "temporal_self_join",
    "offset_from_first",
    "txt_token_quality",
    "txt_fingerprint_exact_dedup",
    "txt_winnow_fingerprint",
    "emb_dimension_stats",
    "pivot_priority_by_nation",
    "tpch_q18_large_orders",
    "tpch_q8_market_share",
    "tpch_q21_waiting_supplier",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_lsh_bucketed",
    "mm_binary_stats",
    "e2_yap",
    "e2_yap_scale",
    "skew_salted_agg",
    "asof_last_purchase",
    "batch_sessionize",
    "txt_tfidf_topterms",
    "doc_pack_context_windows",
    "grouped_percentiles",
    "doc_leakage_safe_split",
    "emb_int8_quantize",
    "cube_order_profile",
    "txt_vocab_topk",
    "txt_repetition_filter",
    "txt_contamination_check",
    "doc_mix_weights",
    "dedup_cluster_representative",
    "emb_kmeans_lloyd",
    "sim_knn_join",
    "evt_rolling_24h",
    "txt_unigram_surprisal",
    "txt_span_dedup",
    "doc_quality_zscore_bucket",
    "doc_length_batches",
    "dedup_incremental_batch",
    "dq_expectations_check",
    "ml_quality_classifier_train",
    "emb_pca_power_iteration",
    "doc_training_order",
    "evt_transition_matrix",
    "evt_user_zscore_outliers",
    "txt_vocab_coverage",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from nfl_big_data_bowl_2024_spark.plans import all_queries
    from nfl_big_data_bowl_2024_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warm the JVM/session so the first measured query doesn't pay startup.
    registry["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warm the Python worker fleet too: the first Arrow-UDF stage of a
    # session spawns one worker per core, each importing numpy/pandas
    # (~10-15 s across 32 workers). That is one-time session setup, not
    # query cost — pay it here so the first UDF-bearing headline query is
    # measured at steady state, like every other query.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        import numpy as np  # noqa: F401
        import pandas as pd

        return pd.Series([float(x) for x in v])

    spark.range(0, 320, 1, 32).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # min of three runs per query: steady-state timing (the first run can
    # pay residual JIT; run-to-run variance on the shared box is high and
    # occasionally spikes multi-second, so one extra rep buys robustness).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
