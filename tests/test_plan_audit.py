"""Physical-plan audits: the properties that make these queries survive a
100x scale-up must be visible in the executed plan, not just intended."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import sys

    sys.path.insert(0, "/root/repo")
    from nfl_big_data_bowl_2024_spark.plans import all_queries

    return all_queries()


def test_filter_and_column_pushdown_reach_scan(spark, queries):
    df = queries["filter_project_pushdown"].fn(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # at least one concrete predicate pushed into the parquet scan
    assert "GreaterThanOrEqual" in plan or "In(l_returnflag" in plan
    # column pruning: ReadSchema must NOT include unused wide columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_suppkey" not in read_schema
    assert "l_tax" not in read_schema


def test_q6_is_scan_plus_agg_only(spark, queries):
    df = queries["tpch_q6_forecast_revenue"].fn(spark, SF)
    df.collect()  # finalize the adaptive plan so codegen stages are visible
    plan = _plan(df)
    assert "Join" not in plan
    assert "PushedFilters: [" in plan
    assert "*(" in plan  # whole-stage codegen stage markers


def test_dim_joins_broadcast_not_sortmerge(spark, queries):
    plan = _plan(queries["tpch_q5_local_supplier_volume"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims broadcast at this scale


def test_topk_queries_avoid_global_window(spark, queries):
    for name in ["sim_topk_bruteforce", "tpch_q10_returned_items", "txt_vocab_topk"]:
        plan = _plan(queries[name].fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, name
        assert "Window" not in plan, name


def test_flagship_shuffles_only_on_group_key(spark, queries):
    plan = _plan(queries["flagship_bounded_max"].fn(spark, SF))
    # every hash exchange in the plan keys on user_id (exchange reuse across
    # the window/crossing/bounded spine)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "user_id" in ln, ln


# Oracle-backed queries whose plans legitimately contain a VECTORIZED
# (Arrow) kernel — the documented "built-ins genuinely can't express it
# efficiently" exceptions. Row-at-a-time BatchEvalPython stays banned
# everywhere.
_ARROW_KERNEL_ALLOWLIST = {
    "sim_ivf_probeall_topk",  # BLAS centroid assignment (operators/similarity.py)
    "sim_lsh_recall",  # runs the REAL lsh_bucketed_pairs operator whose
    # Arrow-batched pair-cosine re-rank is the documented vectorization
    # exception (operators/similarity.py) — the ledger must exercise the
    # production path, not a JVM-only stand-in
    "txt_chunk_udtf",  # ArrowEvalPythonUDTF — the table-function extension
    # point (functions/chunking.py); chunk-content emission is the part
    # sequence()-based JVM plans cannot express
}


def test_no_python_udfs_in_relational_paths(spark, queries):
    # Every oracle-backed query must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython nodes); kernels (rows-only entries) are exempt, and
    # a small allowlist covers oracle-backed ops whose Arrow-batched
    # kernels are the documented vectorization exception.
    for name, spec in queries.items():
        if spec.oracle is None:
            continue
        plan = _plan(spec.fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} has a ROW-AT-A-TIME Python UDF"
        if name not in _ARROW_KERNEL_ALLOWLIST:
            assert "EvalPython" not in plan, f"{name} has a Python UDF in the hot path"


def test_approx_distinct_error_bound(spark, queries):
    # The bound check is computed inside the plan (the oracle emits literal
    # TRUE, so a sketch outside its 2% bound becomes a hash-fail AND a
    # test-fail here).
    row = queries["approx_count_distinct"].fn(spark, SF).collect()[0]
    assert row["exact_orders"] > 0
    assert row["approx_within_2pct"] is True, "HLL++ error exceeds 2%"


def test_winnow_fingerprint_shuffles_only_raw_text(spark, queries):
    """The fingerprint derivation itself is map-side: the single exchange is
    the _spread repartition of the raw text (parallelism for the hashing),
    never an aggregation shuffle of the hash arrays."""
    plan = _plan(queries["txt_winnow_fingerprint"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    # the exchange happens BELOW the hash derivation: no HOF expressions in
    # the exchange's child, i.e. the plan has no aggregate at all
    assert "HashAggregate" not in plan


def test_pivot_has_no_value_discovery_scan(spark, queries):
    """Explicit pivot values -> exactly one scan per input table (an implicit
    pivot would add a distinct-discovery job over orders)."""
    plan = _plan(queries["pivot_priority_by_nation"].fn(spark, SF))
    assert plan.count("Scan parquet") == 3


def test_array_and_json_queries_do_not_shuffle(spark, queries):
    for name in ("arr_top_components", "json_build_extract", "txt_regex_extract"):
        plan = _plan(queries[name].fn(spark, SF))
        assert "Exchange" not in plan, name


def test_dimension_stats_output_is_bounded(spark, queries):
    """emb_dimension_stats aggregates to O(dim) rows: the plan is
    generate -> partial agg -> single exchange on the 64 dim keys."""
    plan = _plan(queries["emb_dimension_stats"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    assert "Generate" in plan


def test_stratified_sample_is_map_only(spark, queries):
    """The sampling decision is a scan-level filter: no exchange anywhere."""
    plan = _plan(queries["doc_stratified_sample"].fn(spark, SF))
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_tfidf_has_no_global_window(spark, queries):
    """Every window must be partitioned (doc_id for the top-3 rank, term
    for the doc-frequency count); a global window (empty partitionBy)
    would funnel the corpus through one task."""
    plan = _plan(queries["txt_tfidf_topterms"].fn(spark, SF))
    assert "Window" in plan
    for ln in plan.splitlines():
        if "Window" in ln and "partitionBy" not in ln:
            # physical Window node prints its partition spec inline:
            # Window [ ...windowspecdefinition(<keys>, ...)... ], [<keys>]
            assert ("doc_id" in ln) or ("term" in ln), ln
            assert not ln.rstrip().endswith("], []"), f"global window: {ln}"


def test_q21_single_fact_scan(spark, queries):
    """The EXISTS/NOT-EXISTS collapse: one lineitem scan feeding stacked
    aggregates, not three scans through two self-joins."""
    plan = _plan(queries["tpch_q21_waiting_supplier"].fn(spark, SF))
    assert plan.count("Scan parquet") == 2  # lineitem + supplier dim
    assert "SortMergeJoin" not in plan


def test_single_subtree_rewrites_scan_counts(spark, queries):
    """Queries whose textbook form references a derived relation twice
    (Catalyst does NOT CSE DataFrame subtrees) are written single-subtree:
    the plan must scan each table exactly once."""
    expected = {
        "tpch_q17_small_qty_revenue": 2,     # lineitem + part
        "tpch_q18_large_orders": 3,          # lineitem + orders + customer
        "txt_tfidf_topterms": 2,             # documents (tf) + documents (N)
    }
    for name, n in expected.items():
        plan = _plan(queries[name].fn(spark, SF))
        assert plan.count("Scan parquet") == n, f"{name}: {plan.count('Scan parquet')} scans"


def test_grand_total_queries_checkpoint_not_rescan_not_single_partition(
    spark, queries
):
    """Q11/Q15 attach a grand total to a per-key aggregate. The aggregate
    is materialized once (eager localCheckpoint), so the final plan must
    contain NO parquet re-scan of the fact (both consumers read the
    checkpoint blocks) and NO window node (the total is a distributed
    scalar aggregate broadcast back — its single-partition exchange
    carries one partial row per task — never a global window sorting the
    whole aggregate on one task)."""
    for name in ("tpch_q11_important_parts", "tpch_q15_top_revenue_supplier"):
        plan = _plan(queries[name].fn(spark, SF))
        assert "ExistingRDD" in plan, name
        assert "Window" not in plan, name
        fact_scans = [
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        ]
        assert not fact_scans, f"{name}: fact re-scanned: {fact_scans}"


def test_q7_q8_fact_never_shuffled_before_agg(spark, queries):
    """All dims broadcast: the only exchanges are the final small groupBys."""
    for name in ("tpch_q7_nation_volume", "tpch_q8_market_share"):
        plan = _plan(queries[name].fn(spark, SF))
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_bpe_pretokenize_is_map_only(spark, queries):
    plan = _plan(queries["txt_bpe_pretokenize"].fn(spark, SF))
    assert "Exchange" not in plan


def test_label_centroids_single_exchange(spark, queries):
    """posexplode -> partial agg -> ONE exchange on (label, dim)."""
    plan = _plan(queries["emb_label_centroids"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    assert "Generate" in plan


def test_json_rollup_shuffles_extracted_value_not_json(spark, queries):
    """The JSON text must not survive past the scan-side projection: the
    exchange carries only event_type + typed partials."""
    plan = _plan(queries["json_props_rollup"].fn(spark, SF))
    assert plan.count("Exchange") == 1
    ex_line = [ln for ln in plan.splitlines() if "Exchange" in ln][0]
    assert "props" not in ex_line


def test_leakage_split_and_quantize_are_map_only(spark, queries):
    # Split-by-fingerprint and per-vector quantization are pure
    # scan->project: any Exchange would mean a needless shuffle of the
    # full corpus at 100 TB.
    for name in ["doc_leakage_safe_split", "emb_int8_quantize"]:
        plan = _plan(queries[name].fn(spark, SF))
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_shard_manifest_single_partial_agg_exchange(spark, queries):
    # One hash aggregate with map-side partials: exactly one shuffle,
    # carrying only the 16-group partial rows, never the text column.
    plan = _plan(queries["doc_shard_manifest"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    exch = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln][0]
    assert "text" not in exch


def test_event_analytics_avoid_windows_and_cartesians(spark, queries):
    # Funnel and cohort are aggregate+join shapes on user_id — a global
    # Window or nested-loop join here would be the 100 TB killer.
    import re

    for name in ["evt_funnel_conversion", "evt_cohort_retention"]:
        plan = _plan(queries[name].fn(spark, SF))
        assert "Window" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # Cohort: every repartitioning exchange is keyed on user_id or the
    # final tiny (cohort_week, offset) rollup keys — never unkeyed.
    plan = _plan(queries["evt_cohort_retention"].fn(spark, SF))
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert re.search(r"user_id|cohort_week_us", ln), ln


def test_repetition_filter_is_map_only(spark, queries):
    # The Gopher-style filter computes top-bigram multiplicity as a
    # sorted-array run-length fold, so the whole corpus gate must be
    # scan -> project: zero exchanges, one scan.
    plan = _plan(queries["txt_repetition_filter"].fn(spark, SF))
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1


def test_contamination_check_broadcasts_benchmark(spark, queries):
    # The benchmark shingle set is the small side — it must broadcast;
    # a sort-merge join would shuffle the full corpus shingle stream.
    plan = _plan(queries["txt_contamination_check"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mix_weights_single_fact_scan(spark, queries):
    # The denominator attaches via the checkpointed grand-total idiom: the
    # final plan reads checkpoint blocks (no fact re-scan, no window).
    plan = _plan(queries["doc_mix_weights"].fn(spark, SF))
    assert "ExistingRDD" in plan
    assert "FileScan" not in plan
    assert "Window" not in plan


def test_rolling_24h_single_user_exchange(spark, queries):
    plan = _plan(queries["evt_rolling_24h"].fn(spark, SF))
    # one shuffle, keyed on user_id; the RANGE frame sort rides the same
    # partitioning (no extra exchange, no single-partition window)
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "user_id" in ex[0], ex
    assert "SinglePartition" not in plan


def test_unigram_surprisal_model_broadcasts(spark, queries):
    plan = _plan(queries["txt_unigram_surprisal"].fn(spark, SF))
    # the trained LM joins back as a broadcast, never a sort-merge; the
    # normalizer is a scalar aggregate over the checkpointed vocab, so
    # nothing funnels through a single-partition window sort
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_span_dedup_shuffles_on_span_then_doc(spark, queries):
    """Span chunking is map-only (no UDF, no Generate-side exchange); the
    only shuffles are the span-keyed window and the doc-keyed final
    aggregate — nothing single-partition."""
    plan = _plan(queries["txt_span_dedup"].fn(spark, SF))
    assert "SinglePartition" not in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 2, ex
    assert any("span" in ln for ln in ex), ex
    assert any("doc_id" in ln for ln in ex), ex


def test_zscore_bucket_corpus_never_shuffles(spark, queries):
    """Corpus-relative bucketing: the per-doc pass is scan + broadcast-attach
    of the 1-row stats + project. The only exchanges belong to the scalar
    stats aggregate (partial rows) and its broadcast — the corpus itself is
    never hash-partitioned."""
    plan = _plan(queries["doc_quality_zscore_bucket"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan


def test_length_batches_window_is_band_partitioned(spark, queries):
    """Within-band ordering must partition by the length band — never a
    global sequence — and the batch aggregate is the only other shuffle."""
    plan = _plan(queries["doc_length_batches"].fn(spark, SF))
    assert "SinglePartition" not in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 2, ex
    assert any("band" in ln for ln in ex), ex


def test_incremental_dedup_keys_everything_on_fingerprint(spark, queries):
    """Batch window and index join both key on the fingerprint; nothing
    single-partition, and the source filters reach both scans."""
    plan = _plan(queries["dedup_incremental_batch"].fn(spark, SF))
    assert "SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "fingerprint" in ln, ln
    assert plan.count("PushedFilters: [In(source") == 2 or plan.count("In(source") >= 2


def test_dq_expectations_scan_each_fact_once_outside_fk(spark, queries):
    """Per-table metric aggregates are checkpointed 1-row relations reused
    by their union branches; the only live parquet scans in the final plan
    belong to the FK anti-join (lineitem keys + orders keys)."""
    plan = _plan(queries["dq_expectations_check"].fn(spark, SF))
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")


def test_training_order_window_is_shard_partitioned(spark, queries):
    plan = _plan(queries["doc_training_order"].fn(spark, SF))
    assert "SinglePartition" not in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(ex) == 1 and "shard" in ex[0], ex


def test_transition_matrix_windows_are_keyed(spark, queries):
    """The lag window keys on user_id; the row-normalize window keys on
    prev_type over the bounded post-agg relation. Nothing global."""
    plan = _plan(queries["evt_transition_matrix"].fn(spark, SF))
    assert "SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert ("user_id" in ln) or ("prev_type" in ln), ln


def test_user_outliers_stats_attach_reuses_user_key(spark, queries):
    """Both the stats aggregate and the join hash on user_id — no other
    key appears in any exchange, nothing single-partition."""
    plan = _plan(queries["evt_user_zscore_outliers"].fn(spark, SF))
    assert "SinglePartition" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "user_id" in ln, ln


def _global_windows(plan: str) -> list[str]:
    """Window nodes whose input is a single-partition exchange — i.e.
    GLOBAL windows (empty partition spec), ordered or not. Detected
    structurally: a physical Window requires its child distribution to be
    SinglePartition exactly when the partition spec is empty, so the plan
    prints the Window followed (through an optional Sort) by an
    `Exchange SinglePartition`. Substring checks on windowspecdefinition
    are NOT enough: ordered global windows print their ordering columns
    before specifiedwindowframe."""
    def depth(ln: str) -> int:
        # tree-glyph prefix is spaces plus ':' '+' '-'; the node text
        # (or its '*(n)' codegen marker) starts right after
        return len(ln) - len(ln.lstrip(" :+-"))

    lines = plan.splitlines()
    hits = []
    for k, ln in enumerate(lines):
        if "Window" not in ln:
            continue
        d = depth(ln)
        # Walk the Window's child subtree by indentation (NOT a fixed
        # 2-line lookahead: AQEShuffleRead / ReusedExchange / codegen
        # markers / stacked Sorts can interpose). The FIRST Exchange met
        # going down is the one feeding the Window; SinglePartition there
        # means the window is global. ReusedExchange lines embed the
        # referenced exchange's string, so the substring check covers
        # them too; ShuffleQueryStage lines carry no partitioning and are
        # passed through (their child Exchange line decides).
        for nxt in lines[k + 1 :]:
            if depth(nxt) <= d:
                break  # left the Window's subtree
            if "Exchange" in nxt:
                if "SinglePartition" in nxt:
                    hits.append(ln.strip()[:100])
                break
    return hits


def test_global_window_detector_catches_ordered_form(spark):
    """Self-check: the detector must flag row_number over a GLOBAL
    ordering (the classic scale-killer the substring check missed)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert _global_windows(_plan(df))


def test_no_scale_killer_nodes_anywhere(spark, queries):
    """Registry-wide sweep: NO registered query's executed plan may
    contain a CartesianProduct, a row-at-a-time Python UDF, or a GLOBAL
    window (empty partition spec — ordered or unordered — funnels the
    relation through one task). Zero exceptions — the per-query audits
    above pin the positive shapes; this pins the absence of the three
    plan nodes that kill a 100x scale-up."""
    offenders = []
    for name, spec in queries.items():
        plan = _plan(spec.fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        for hit in _global_windows(plan):
            offenders.append((name, f"global window: {hit}"))
    assert not offenders, offenders


def test_bucketed_tracking_keeps_e1_fact_shuffle_free(spark, tmp_path):
    """The 100 TB layout claim, plan-verified: tracking stored bucketed on
    (gameId, playId) feeds the whole E1 max-params pipeline without the
    FACT ever re-shuffling — every window/groupBy key in the single-scan
    heavy stage (_max_params_per_player, optimization round 13) is a
    superset of the bucket keys, which the session factory's
    requireAllClusterKeysForCoPartition=false lets Spark exploit. Since
    the r13 stacked-window restructure the assertion is STRONGER than the
    old one (which allowed dim-side exchanges): the heavy stage's plan
    must contain NO shuffle exchange at all on bucketed input — one
    bucketed scan, stacked windows, terminal aggregate, nothing else.
    Also asserts row parity with the non-bucketed path over the full
    assembled pipeline, so shuffle-freedom isn't bought with wrong
    results."""
    from nfl_big_data_bowl_2024_spark import fixtures
    from nfl_big_data_bowl_2024_spark.plans.domain import (
        _max_params_per_player,
        max_params_plan,
    )
    from nfl_big_data_bowl_2024_spark.sources.writers import write_bucketed

    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    write_bucketed(
        fixtures.tracking_df(spark),
        "tracking_bucketed_audit",
        ["gameId", "playId"],
        n_buckets=8,
        sort_cols=["gameId", "playId", "nflId", "frameId"],
        path=str(tmp_path / "tracking_bucketed"),
    )
    try:
        dims = (
            fixtures.players_df(spark),
            fixtures.plays_df(spark),
            fixtures.tackles_df(spark),
        )
        heavy = _max_params_per_player(
            spark.table("tracking_bucketed_audit"), dims[1]
        )
        heavy.collect()  # finalize the AQE plan before reading it
        hplan = _plan(heavy)
        assert "Bucketed: true" in hplan
        shuffles = [
            ln
            for ln in hplan.splitlines()
            if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
        ]
        # the bucketed fact satisfies every window/groupBy clustering in
        # the stage: zero shuffle exchanges anywhere in the heavy plan
        assert not shuffles, shuffles
        got = {
            (r.game_ID, r.play_ID, r.NFL_ID): (r.max_vel, r.max_accel, r.status)
            for r in max_params_plan(
                spark.table("tracking_bucketed_audit"), *dims
            ).collect()
        }
        want = {
            (r.game_ID, r.play_ID, r.NFL_ID): (r.max_vel, r.max_accel, r.status)
            for r in max_params_plan(fixtures.tracking_df(spark), *dims).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS tracking_bucketed_audit")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")


def test_bloom_filter_prunes_fact_fact_join(spark):
    """Runtime Bloom-filter join pruning (session.py enables it): when the
    build side of a join cannot broadcast — the fact-to-fact case at
    100 TB — the probe side's scan must be pre-filtered by a
    might_contain(bloom_filter_agg(...)) subquery on the join key, so only
    ~the matching fraction of the big fact reaches the shuffle. Forced
    here by disabling broadcast and lowering the size thresholds (at
    sf0.01 everything would otherwise broadcast and the filter correctly
    stays out of the plan)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(j)
        assert "might_contain" in plan, "bloom filter not injected"
        assert "bloom_filter_agg" in plan
        # the filter sits on the PROBE (lineitem) side's key
        probe_lines = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert any("l_orderkey" in ln for ln in probe_lines)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_media_decode_family_is_map_only(spark, queries):
    """The whole decode family must be scan -> generate -> mapInPandas
    with ZERO exchanges — parallelism equals input-split count, the shape
    that survives any scale-up (payloads never shuffle)."""
    for name in (
        "mm_decode_features",
        "mm_resize_features",
        "mm_audio_features",
        "mm_video_frame_decode",
    ):
        plan = _plan(queries[name].fn(spark, SF))
        assert "Exchange" not in plan, name
        assert "MapInPandas" in plan, name


def test_footer_stats_use_aggregate_pushdown(spark):
    """parquet_footer_stats must answer COUNT/MIN/MAX from footer
    statistics (PushedAggregation in the V2 scan), match a real scan's
    answers, and leave the session's reader confs untouched."""
    from pyspark.sql import functions as F

    from nfl_big_data_bowl_2024_spark.sources.readers import parquet_footer_stats

    before = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    out = parquet_footer_stats(
        spark, f"{SF}/orders.parquet", ["o_orderkey", "o_totalprice"]
    )
    assert "PushedAggregation" in out._footer_stats_plan
    got = out.collect()[0]
    want = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
            F.min("o_totalprice").alias("plo"),
            F.max("o_totalprice").alias("phi"),
        )
        .collect()[0]
    )
    assert (got.n_rows, got.min_o_orderkey, got.max_o_orderkey) == (
        want.n, want.lo, want.hi
    )
    assert (got.min_o_totalprice, got.max_o_totalprice) == (want.plo, want.phi)
    assert spark.conf.get("spark.sql.sources.useV1SourceList", None) == before


def test_curation_funnel_one_scan_one_fingerprint_exchange(spark, queries):
    """pipeline_curation_funnel's docstring claims: one documents scan,
    one fingerprint exchange (the canonical-choice window), one small
    stage aggregate. Pin it."""
    plan = _plan(queries["pipeline_curation_funnel"].fn(spark, SF))
    assert plan.count("Scan parquet") == 1
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # window exchange on fp + the final stage aggregate's exchange
    assert len(hash_exchanges) == 2, hash_exchanges
    assert any("fp" in ln for ln in hash_exchanges)


def test_every_oracle_parses_in_duckdb(queries):
    """Parse-lint every registered oracle with DuckDB BEFORE any Spark
    run: a syntax error in an oracle otherwise only surfaces as a driver
    ERROR row (this class of bug shipped once as a dangling comma).
    EXPLAIN against empty same-named views validates syntax + most
    binding without executing anything."""
    import duckdb

    con = duckdb.connect()
    import pyarrow as pa
    import pyarrow.parquet  # noqa: F401

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0"
        )
    bad = []
    for name, spec in queries.items():
        if spec.oracle is None:
            continue
        try:
            con.execute("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_bitemporal_probe_join_is_broadcast_not_cartesian(spark, queries):
    """The non-equi double-interval join must build on the BOUNDED (3-row)
    probe side: left to size estimates Catalyst broadcast the versions
    relation instead, which degraded to a CartesianProduct past the
    broadcast threshold (measured 36 s -> ~2 s at the generated sf10)."""
    df = queries["scd2_bitemporal_asof"].fn(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # probes enter as the LEFT relation, so the pinned build side prints
    # as BuildLeft — the versions relation is always the streamed side
    assert "BroadcastNestedLoopJoin BuildLeft" in plan


def test_kmv_sketch_uses_window_group_limit(spark, queries):
    """agg_kmv_distinct's rank filter must compile to WindowGroupLimit so
    each map task keeps only k rows per group BEFORE the exchange — the
    distributed bottom-k merge that makes the sketch scale."""
    plan = _plan(queries["agg_kmv_distinct"].fn(spark, SF))
    assert "WindowGroupLimit" in plan


def test_table_checksum_is_fixed_grid(spark, queries):
    """dq_table_checksum reduces onto the fixed 8-shard grid: exactly one
    exchange (on the shard key), with partial aggregation before it."""
    plan = _plan(queries["dq_table_checksum"].fn(spark, SF))
    assert plan.count("Exchange") == 1


def test_ngram_jaccard_checkpointed_guard_and_data_sized_pairs(spark, queries):
    """The round-11 dedup_ngram_jaccard shape: the guarded shingle
    relation is materialized ONCE (the eager localCheckpoint whose Scan
    ExistingRDD all three consumers read — counts, doc lists, and the
    pair-count sizing agg), and the candidate-pair stream repartitions on
    doc_a ALONE, which must satisfy the (doc_a, doc_b) clustering so the
    grouped count plans partial+final with NO second exchange between
    repartition and aggregate."""
    plan = _plan(queries["dedup_ngram_jaccard"].fn(spark, SF))
    assert "Scan ExistingRDD" in plan  # the checkpointed guard relation
    assert "hashpartitioning(doc_a" in plan  # the data-sized pair exchange

    def depth(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-"))

    lines = plan.splitlines()
    # find the REPARTITION_BY_NUM exchange (the pair stream); between it
    # and the HashAggregate above it there must be no other Exchange
    for k, ln in enumerate(lines):
        if "REPARTITION_BY_NUM" in ln:
            above = [x for x in lines[:k] if depth(x) < depth(ln)]
            assert not any(
                "Exchange" in x and "Broadcast" not in x for x in above[-3:]
            ), above[-3:]
            break
    else:
        raise AssertionError("pair repartition not found in plan")
