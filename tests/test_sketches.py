"""Misra-Gries heavy-hitter candidates: superset guarantee and exactness
of the 2-pass pattern when the vocabulary is far larger than k."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.sketches import misra_gries_candidates


def _skewed_terms(spark):
    """60k tokens: 5 hot terms (~9% each) + 10k-term rare tail, shuffled
    across 8 partitions so each partition sees a mix."""
    return (
        spark.range(0, 60_000, 1, 8)
        .select(
            F.when(F.col("id") % 11 < 3, F.concat(F.lit("hot"), (F.col("id") % 5).cast("string")))
            .otherwise(F.concat(F.lit("rare"), (F.col("id") % 10_000).cast("string")))
            .alias("term")
        )
    )


def test_mg_candidates_contain_every_true_heavy_hitter(spark):
    toks = _skewed_terms(spark)
    k = 64
    total = toks.count()
    exact = {
        r["term"]
        for r in toks.groupBy("term").count().filter(F.col("count") > total / k).collect()
    }
    cands = {r["term"] for r in misra_gries_candidates(toks, "term", k=k).collect()}
    assert exact, "fixture must actually have heavy hitters"
    assert exact <= cands
    # the candidate relation is bounded: at most k rows per partition
    assert len(cands) <= k * 8


def test_two_pass_heavy_hitters_equal_direct_groupby(spark):
    """The full registered shape (candidates -> broadcast -> exact count ->
    integer threshold) must equal the direct groupBy answer on data whose
    vocab (10k) dwarfs the sketch size (k=256)."""
    toks = _skewed_terms(spark)
    total = toks.count()
    cands = misra_gries_candidates(toks, "term", k=256).select("term").distinct()
    got = {
        (r["term"], r["n"])
        for r in toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 50 >= total)
        .collect()
    }
    want = {
        (r["term"], r["count"])
        for r in toks.groupBy("term")
        .count()
        .filter(F.col("count") * 50 >= total)
        .collect()
    }
    assert got == want and got


def test_hll_shard_union_equals_whole_corpus_sketch(spark):
    """Mergeability — the property agg_hll_shard_union sells: unioning
    per-shard sketches must give the SAME estimate as sketching the whole
    column in one pass, and adding a new shard must only touch its delta."""
    df = spark.range(30000).selectExpr(
        "id % 10 as shard", "id % 2311 as u"  # heavy cross-shard overlap
    )
    whole = df.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(u, 14))").alias("e")
    ).first()["e"]
    sharded = (
        df.groupBy("shard")
        .agg(F.expr("hll_sketch_agg(u, 14)").alias("sk"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("e")
        )
        .first()["e"]
    )
    assert sharded == whole
    # incremental: merge 9 old shard sketches + 1 new one == full re-union
    old = df.filter("shard < 9").groupBy("shard").agg(
        F.expr("hll_sketch_agg(u, 14)").alias("sk")
    )
    new = df.filter("shard = 9").groupBy("shard").agg(
        F.expr("hll_sketch_agg(u, 14)").alias("sk")
    )
    inc = (
        old.unionByName(new)
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("e")
        )
        .first()["e"]
    )
    assert inc == sharded
    # and the estimate is tight at this lgK / cardinality
    assert abs(sharded - 2311) <= 0.02 * 2311


def test_cms_estimate_upper_bounds_and_mostly_matches_exact(spark):
    from nfl_big_data_bowl_2024_spark.operators.sketches import (
        count_min_counters,
        count_min_estimate,
    )

    # 20k rows over 300 keys with a skewed head; CMS never undercounts,
    # and with w=64 x d=4 most keys collide enough that some overcount —
    # assert the guarantee (estimate >= exact) plus bounded total error.
    df = spark.range(0, 20_000, 1, 8).select(
        (F.col("id") % 300 * F.col("id") % 300 % 300).alias("k")
    )
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    counters = count_min_counters(df, "k")
    keys = df.select("k").distinct()
    est = {r["k"]: r["cms_n"] for r in count_min_estimate(keys, counters, "k").collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
    # CMS error bound: overcount per key <= 2N/w with prob 1-2^-d; assert
    # the deterministic aggregate form loosely (total overcount bounded).
    total_over = sum(est[k] - exact[k] for k in exact)
    assert total_over <= 4 * 20_000  # d*w grid absorbs the stream 4x over

def test_cms_counters_partitioning_invariant(spark):
    from nfl_big_data_bowl_2024_spark.operators.sketches import count_min_counters

    base = spark.range(0, 5_000).select((F.col("id") % 97).alias("k"))
    a = {(r["d"], r["bucket"]): r["cnt"] for r in count_min_counters(base, "k").collect()}
    b = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in count_min_counters(base.repartition(17), "k").collect()
    }
    assert a == b  # additive merge: same counters under any partitioning


def test_bitmap_overlap_equals_hll_exact_twin(spark):
    """The positional-bitmap intersection (exact by construction) must agree
    pair-for-pair with the exact-overlap twin the HLL estimate query emits —
    two independent constructions of |A intersect B| over the same segments."""
    from nfl_big_data_bowl_2024_spark.plans.registry import all_queries

    SF = "/root/testdata/sf0.001"
    qs = all_queries()
    bitmap = {
        (r["seg_a"], r["seg_b"]): r["n_common"]
        for r in qs["agg_bitmap_audience_overlap"].fn(spark, SF).collect()
    }
    hll = {
        (r["type_a"], r["type_b"]): r["exact_overlap"]
        for r in qs["agg_hll_overlap_estimate"].fn(spark, SF).collect()
    }
    assert bitmap == hll
    assert len(bitmap) == 10  # C(5,2) segment pairs
