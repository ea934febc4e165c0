"""A/B: graph_adamic_adar_links wedge exchange — struct(ya,yb) keys vs one
packed int64 key (r12 verdict item 4, candidate b).

The r12 decomposition (PERF.md, scripts/decompose_adamic.py) localized
~102 s of the sf10 run to the wedge explode + (ya,yb) exchange +
aggregate. Candidate (b): emit each wedge pair as ONE packed long
``shiftleft(ya, 32) | yb`` straight from the array HOF, so

  - the explode emits a bigint instead of a two-long struct (map-side
    width 8 B vs 16 B + struct overhead),
  - the exchange carries (key:long, w:int) instead of (ya, yb, w) —
    ~40%% narrower rows,
  - the hash aggregate keys on a single long (one 8-B comparison per
    probe) instead of a two-column composite,
  - ya/yb unpack after the agg with shiftright/bitwise-and (exact: node
    ids are < 2^31 whenever max node id fits 32 bits — gated, see
    below).

Shared prefix (pairs join+distinct+checkpoint, edge persist, probes)
runs once; then A and B full wedge+agg+top25 stages run interleaved
A,B,B,A so within-session drift cannot favor either arm. Equality of
the two arms' top-25 output is asserted (same rows, same order).

Scale gate measured here too: packing is valid iff max(node id) < 2^31;
the gate is a 1-row max over the checkpointed pairs (cost recorded).

Usage: python scripts/ab_adamic_packed.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf10"
    from pyspark.sql import functions as F

    from bench import calibration_probes_multi
    from nfl_big_data_bowl_2024_spark.operators.graph import (
        _edges_on_disk,
        _exchange_width,
    )
    from nfl_big_data_bowl_2024_spark.plans.pipeline_graph import (
        _AA_LOG2_MICRO_SQL,
    )
    from nfl_big_data_bowl_2024_spark.session import get_spark
    from nfl_big_data_bowl_2024_spark.sources.readers import (
        read_testdata_table as _t,
    )

    spark = get_spark("ab-adamic-packed")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"sf_dir": sf_dir}

    rec["box_probes"] = calibration_probes_multi(spark)

    t0 = time.time()
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    rec["pairs_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    max_node = pairs.agg(
        F.max(F.greatest(F.col("c") * 2, F.col("s") * 2 + 1)).alias("m")
    ).collect()[0]["m"]
    rec["max_node_gate_sec"] = round(time.time() - t0, 2)
    rec["max_node"] = int(max_node)
    # Direct packing (arm B) is only valid when raw node ids fit 32 bits;
    # the generated sf10 ids reach ~2e10 (35 bits), so at scale the packed
    # key needs the order-preserving dense remap (arm C) instead.
    direct_pack_ok = max_node < (1 << 31)
    rec["direct_pack_ok"] = direct_pack_ok

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
    rec["edges_sec"] = round(time.time() - t0, 1)
    rec["n_edges"] = n_edges

    sc = spark.sparkContext
    width = _exchange_width(sc, n_edges)
    wedge_width = _exchange_width(sc, n_edges * 20, target_rows=4_000_000)
    rec["width"] = width
    rec["wedge_width"] = wedge_width

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

    def arm_b():
        wedge = _nbrs().select(
            "w",
            F.explode(
                F.expr(
                    "flatten(transform(ns, (y, i) -> transform("
                    "slice(ns, i + 2, 64), "
                    "z -> shiftleft(y, 32) + z)))"
                )
            ).alias("k"),
        )
        scored = (
            wedge.repartition(wedge_width, "k")
            .groupBy("k")
            .agg(
                F.sum("w").cast("long").alias("aa_micro"),
                F.count(F.lit(1)).alias("n_common"),
            )
        )
        return (
            scored.select(
                F.shiftright("k", 32).cast("long").alias("node_a"),
                (F.col("k") % F.lit(1 << 32)).cast("long").alias("node_b"),
                "aa_micro",
                F.col("n_common").cast("long").alias("n_common"),
            )
            .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
            .limit(25)
        )

    def arm_c():
        """Order-preserving dense remap to 32-bit ids, then packed-key
        wedge: nid = global rank of node id (operators/dedup.py
        global_sort_rank — range partition + local rank + broadcast
        offsets, no global window), so packed-key order equals
        (node_a, node_b) order and the top-25 tie-break is EXACT; the
        unpack after the top-25 is two map-side scans of the remap with
        the 25-row side broadcast."""
        from nfl_big_data_bowl_2024_spark.operators.dedup import (
            global_sort_rank,
        )

        deg_all = (
            edges.repartition(width, "src")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
        )
        remap = global_sort_rank(deg_all, ["node"], "nid").localCheckpoint()
        nbr_map = remap.select(
            F.col("node").alias("src"), F.col("nid").cast("int").alias("nbr32")
        )
        i_rel = edges.join(nbr_map, "src").select(
            F.col("dst").alias("x"), "nbr32"
        )
        low = remap.filter(F.col("d") <= 64).select(
            F.col("node").alias("x"), "d"
        )
        j_rel = i_rel.repartition(width, "x").join(low, "x")
        nbrs = (
            j_rel.groupBy("x")
            .agg(
                F.array_sort(F.collect_list("nbr32")).alias("ns"),
                F.any_value("d").alias("d"),
            )
            .select(
                "ns",
                F.expr(
                    f"element_at(array({_AA_LOG2_MICRO_SQL}), CAST(d AS INT))"
                ).alias("w"),
            )
        )
        wedge = nbrs.select(
            "w",
            F.explode(
                F.expr(
                    "flatten(transform(ns, (y, i) -> transform("
                    "slice(ns, i + 2, 64), "
                    "z -> shiftleft(CAST(y AS BIGINT), 32) + z)))"
                )
            ).alias("k"),
        )
        scored = (
            wedge.repartition(wedge_width, "k")
            .groupBy("k")
            .agg(
                F.sum("w").cast("long").alias("aa_micro"),
                F.count(F.lit(1)).alias("n_common"),
            )
        )
        top = scored.orderBy(F.col("aa_micro").desc(), F.col("k")).limit(25)
        t = top.select(
            F.shiftright("k", 32).cast("int").alias("ya32"),
            (F.col("k") % F.lit(1 << 32)).cast("int").alias("yb32"),
            "aa_micro",
            "n_common",
        )
        r1 = remap.select(
            F.col("nid").cast("int").alias("ya32"),
            F.col("node").alias("node_a"),
        )
        r2 = remap.select(
            F.col("nid").cast("int").alias("yb32"),
            F.col("node").alias("node_b"),
        )
        return (
            t.join(r1, "ya32")
            .join(r2, "yb32")
            .select(
                F.col("node_a").cast("long"),
                F.col("node_b").cast("long"),
                "aa_micro",
                F.col("n_common").cast("long").alias("n_common"),
            )
            .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
        )

    arms = {"a": arm_a, "c": arm_c}
    if direct_pack_ok:
        arms["b"] = arm_b
    # Strict alternation with a probe vector beside EVERY rep (the
    # box-noise discipline: the first sf10 run of this script showed a
    # 2.8x within-session swing — arm A 234.3 -> 84.9 s — with membw
    # 2.5 -> 5.2 across the session; per-rep probes let each timing be
    # read against the box state that produced it). With --arm=X only
    # that arm runs (fresh-session-per-rep mode: the in-session
    # alternation run died UNABLE_TO_ACQUIRE_MEMORY on rep 3 — drive
    # one process per rep from a shell loop instead, like the sf10
    # sweeps).
    solo = None
    for a in sys.argv[1:]:
        if a.startswith("--arm="):
            solo = a.split("=", 1)[1]
    if solo is not None:
        order = (solo,)
    else:
        order = ("a", "c", "b") * 2 if direct_pack_ok else ("a", "c") * 3
    rec["arm_sec"] = {k: [] for k in arms}
    rec["rep_probes"] = []
    for arm in order:
        t0 = time.time()
        arms[arm]().write.format("noop").mode("overwrite").save()
        rec["arm_sec"][arm].append(round(time.time() - t0, 1))
        rec["rep_probes"].append(
            {"arm": arm, **calibration_probes_multi(spark)}
        )
    if solo is not None:
        print(json.dumps(rec, indent=1))
        return

    ra = [tuple(r) for r in arm_a().collect()]
    rc = [tuple(r) for r in arm_c().collect()]
    rec["arms_equal_ac"] = ra == rc
    if direct_pack_ok:
        rb = [tuple(r) for r in arm_b().collect()]
        rec["arms_equal_ab"] = ra == rb
    rec["probes_after"] = calibration_probes_multi(spark)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
