"""Per-stage decomposition of graph_adamic_adar_links at the generated
sf10 point (verdict r11 item 3: the 119.2 -> 167.4 s drift on untouched
code needs the MinHash treatment — stage timings beside the multi-shape
box probes, so the record either quotes probes proving box drift or
localizes the regression to a stage).

Stages (cumulative noop-forced prefixes of the real plan):
  probes      cpu / shuffle / pyudf frozen shapes (bench.calibration_probes_multi)
  pairs       orders x lineitem join + distinct + eager localCheckpoint
  edges       symmetrized union -> DISK_ONLY persist + count
  nbrs        deg filter + adjacency join + collect_list arrays (noop)
  full        wedge explode + (ya,yb) exchange + agg + top-25 (noop)
wedge+agg cost ~= full - nbrs (both read the persisted edge relation).

Usage: python scripts/decompose_adamic.py [sf_dir]   (one fresh session)
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

    spark = get_spark("decompose-adamic")
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
            .select(F.col("x").alias("x") if False else F.col("src").alias("x"),
                    F.col("dst").alias("nbr"), "d")
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

    t0 = time.time()
    _nbrs().write.format("noop").mode("overwrite").save()
    rec["nbrs_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
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
    (
        scored.orderBy(F.col("aa_micro").desc(), "ya", "yb")
        .limit(25)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    rec["full_sec"] = round(time.time() - t0, 1)
    rec["wedge_agg_sec_approx"] = round(rec["full_sec"] - rec["nbrs_sec"], 1)
    rec["total_sec"] = round(
        rec["pairs_sec"] + rec["edges_sec"] + rec["full_sec"], 1
    )
    print(json.dumps(rec, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
