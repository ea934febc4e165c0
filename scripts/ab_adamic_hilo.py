"""A/B: adamic fallback (>=2^31 ids) wedge exchange — flattened (ya, yb)
two-long keys (arm A, HEAD) vs hi/lo packed (kh:int, kl:long) keys (arm D).

W = bit_length(max_node). kh = ya >> (63-W) (2W-63 bits, int-castable for
W<=47), kl = ((ya & (2^(63-W)-1)) << W) | yb  (63 bits, non-negative).
Bijective for ya, yb < 2^W; unpack after the agg. Exchange row narrows
(long,long,int)=20B -> (int,long,int)=16B and the map-side Generate emits
a narrower struct.

Interleaved A,D,D,A inside one session; shared prefix (pairs checkpoint,
edge persist) runs once; probes before/after; top-25 equality asserted.
Usage: python /tmp/ab_adamic_hilo.py [sf_dir] [reps_per_arm]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import calibration_probes_multi
from nfl_big_data_bowl_2024_spark.operators.graph import (
    _edges_on_disk,
    _exchange_width,
)
from nfl_big_data_bowl_2024_spark.plans.pipeline_graph import _AA_LOG2_MICRO_SQL
from nfl_big_data_bowl_2024_spark.session import get_spark
from nfl_big_data_bowl_2024_spark.sources.readers import read_testdata_table as _t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = get_spark("ab-adamic-hilo")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"probes_before={calibration_probes_multi(spark)}", flush=True)

    t0 = time.time()
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    print(f"pairs_sec={time.time()-t0:.1f}", flush=True)

    max_node = pairs.agg(
        F.max(F.greatest(F.col("c") * 2, F.col("s") * 2 + 1)).alias("m")
    ).collect()[0]["m"]
    W = int(max_node).bit_length()
    LOW = 63 - W
    print(f"max_node={max_node} W={W} LOW={LOW}", flush=True)
    assert W >= 32, "fallback arm only relevant past the single-long gate"

    t0 = time.time()
    edges, n_edges = _edges_on_disk(
        pairs.select(
            (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
        ).unionAll(
            pairs.select(
                (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
            )
        )
    )
    print(f"edges_sec={time.time()-t0:.1f} n_edges={n_edges}", flush=True)

    sc = spark.sparkContext
    width = _exchange_width(sc, n_edges)
    wedge_width = _exchange_width(sc, n_edges * 20, target_rows=4_000_000)

    def _nbrs():
        deg = (
            edges.repartition(width, "src")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= 64)
        )
        adj = (
            edges.repartition(width, "src")
            .join(deg, edges["src"] == deg["node"])
            .select(F.col("src").alias("x"), F.col("dst").alias("nbr"), "d")
        )
        return (
            adj.groupBy("x")
            .agg(
                F.array_sort(F.collect_list("nbr")).alias("ns"),
                F.any_value("d").alias("d"),
            )
            .select(
                "ns",
                F.expr(
                    f"element_at(array({_AA_LOG2_MICRO_SQL}), CAST(d AS INT))"
                ).alias("w"),
            )
        )

    def arm_a():
        wedge = _nbrs().select(
            "w",
            F.explode(
                F.expr(
                    "flatten(transform(ns, (y, i) -> transform("
                    "slice(ns, i + 2, 64), z -> struct(y AS ya, z AS yb))))"
                )
            ).alias("p"),
        ).select(F.col("p.ya").alias("ya"), F.col("p.yb").alias("yb"), "w")
        scored = (
            wedge.repartition(wedge_width, "ya", "yb")
            .groupBy("ya", "yb")
            .agg(
                F.sum("w").cast("long").alias("aa_micro"),
                F.count(F.lit(1)).alias("n_common"),
            )
        )
        return (
            scored.select(
                F.col("ya").cast("long").alias("node_a"),
                F.col("yb").cast("long").alias("node_b"),
                "aa_micro",
                F.col("n_common").cast("long").alias("n_common"),
            )
            .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
            .limit(25)
        )

    def arm_d():
        low_mask = (1 << LOW) - 1
        wedge = _nbrs().select(
            "w",
            F.explode(
                F.expr(
                    "flatten(transform(ns, (y, i) -> transform("
                    f"slice(ns, i + 2, 64), z -> struct("
                    f"CAST(shiftright(y, {LOW}) AS INT) AS kh, "
                    f"shiftleft(y & {low_mask}, {W}) + z AS kl))))"
                )
            ).alias("p"),
        ).select(F.col("p.kh").alias("kh"), F.col("p.kl").alias("kl"), "w")
        scored = (
            wedge.repartition(wedge_width, "kh", "kl")
            .groupBy("kh", "kl")
            .agg(
                F.sum("w").cast("long").alias("aa_micro"),
                F.count(F.lit(1)).alias("n_common"),
            )
        )
        return (
            scored.select(
                (
                    F.shiftleft(F.col("kh").cast("long"), LOW)
                    + F.shiftright("kl", W)
                ).alias("node_a"),
                (F.col("kl") % F.lit(1 << W)).cast("long").alias("node_b"),
                "aa_micro",
                F.col("n_common").cast("long").alias("n_common"),
            )
            .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
            .limit(25)
        )

    # equality first (cheap: runs both once... not cheap at sf10 but required)
    order = []
    for r in range(reps):
        order += ["A", "D"] if r % 2 == 0 else ["D", "A"]
    times = {"A": [], "D": []}
    arms = {"A": arm_a, "D": arm_d}
    results = {}
    for i, arm in enumerate(order):
        spark.sparkContext.setJobDescription(f"adamic {arm} #{i}")
        t0 = time.time()
        df = arms[arm]()
        rows = [tuple(r) for r in df.collect()]
        dt = round(time.time() - t0, 1)
        times[arm].append(dt)
        results.setdefault(arm, rows)
        print(f"  {arm}: {dt}s", flush=True)
        assert results[arm] == rows, f"{arm} nondeterministic!"
    print(f"probes_after={calibration_probes_multi(spark)}", flush=True)
    print(f"EQUAL: {results['A'] == results['D']}", flush=True)
    print(f"RESULT A(ya,yb): min={min(times['A'])} all={times['A']}", flush=True)
    print(f"RESULT D(hi/lo): min={min(times['D'])} all={times['D']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
