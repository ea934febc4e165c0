"""Partitioning-independence guard for hash-checked queries.

The round-3 doc_mix_weights flake was a float accumulation whose order
changed with the physical partitioning, flipping a half-up floor at the
rounding boundary. Every query that rounds or thresholds a derived
statistic must now produce BIT-IDENTICAL rows regardless of how the data
is split — this test re-runs the boundary-sensitive registry queries
under very different shuffle-partition settings (same session, runtime
conf) and diffs the collected rows."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

# The queries whose outputs pass through a floor/threshold on a derived
# statistic — the class where accumulation-order sensitivity would show.
BOUNDARY_QUERIES = [
    "doc_mix_weights",
    "doc_quality_zscore_bucket",
    "evt_user_zscore_outliers",
    "txt_unigram_surprisal",
    "evt_rolling_24h",
    "doc_dsir_importance",
    "doc_dsir_select",
    "doc_select_token_budget",
    "txt_heavy_hitters",
    "txt_bpe_encode",
    # rounded float pipelines with wide margins — pinned here so a margin
    # regression (e.g. a finer rounding step) surfaces as a test failure
    # instead of a driver-gate flake
    "emb_pca_power_iteration",
    "txt_vocab_coverage",
    "e3_position_params",
]


@pytest.mark.parametrize("name", BOUNDARY_QUERIES)
def test_rows_identical_across_partitionings(spark, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from nfl_big_data_bowl_2024_spark.plans import all_queries

    q = all_queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(tuple(r) for r in q.fn(spark, SF).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = sorted(tuple(r) for r in q.fn(spark, SF).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a, name
    assert a == b, f"{name}: rows differ between 3- and 64-partition runs"
