"""As-of join and range join unit tests (operators/temporal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.temporal import asof_join, range_join_count


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        "k long, ts long, v double",
    )
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(left, right, by="k", value_cols=["v"]).collect()
    }
    assert out["a"] == 100.0   # equality matches (ts 10 >= 10)
    assert out["b"] == 150.0   # latest preceding, not first
    assert out["c"] is None    # nothing precedes ts 5
    assert out["d"] is None    # right row at 60 is in the future


def test_asof_plan_has_no_nested_loop(spark):
    left = spark.range(100).select(F.lit(1).alias("k"), F.col("id").alias("ts"))
    right = spark.range(100).select(
        F.lit(1).alias("k"), F.col("id").alias("ts"), F.col("id").cast("double").alias("v")
    )
    plan = asof_join(left, right, by="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Window" in plan  # the carry-forward shape


def test_range_join_count_matches_naive(spark):
    probe = spark.createDataFrame(
        [(1, 1000, 10), (1, 5000, 11), (2, 1000, 12)],
        "k long, us long, pid long",
    ).select("k", F.timestamp_micros(F.col("us") * 1_000_000).alias("ts"), "pid")
    build = spark.createDataFrame(
        [(1, 900), (1, 1100), (1, 3000), (1, 7000), (2, 999)], "k long, us long"
    ).select("k", F.timestamp_micros(F.col("us") * 1_000_000).alias("ts"))
    out = {
        r["pid"]: r["n_in_range"]
        for r in range_join_count(probe, build, "k", "ts", "ts", radius_sec=200).collect()
    }
    # pid 10 (t=1000): build at 900, 1100 within 200 -> 2; 3000/7000 out
    # pid 11 (t=5000): none within 200 -> 0
    # pid 12 (t=1000, k=2): build 999 within -> 1
    assert out == {10: 2, 11: 0, 12: 1}


def test_range_join_plan_is_equi_hash(spark):
    probe = spark.range(100).select(
        F.lit(1).alias("k"), F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("pid"),
    )
    build = spark.range(100).select(
        F.lit(1).alias("k"), F.timestamp_micros(F.col("id") * 500_000).alias("ts")
    )
    plan = (
        range_join_count(probe, build, "k", "ts", "ts", 60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan  # bucketing made it an equi-join
