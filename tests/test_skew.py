"""Salted aggregation equals direct aggregation on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    # 10k rows, 95% in one hot key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 20 == 0, F.col("id") % 3).otherwise(F.lit(99)).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    direct = {
        r["k"]: (r["n"], r["total"], r["mx"], r["mn"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.max("v").alias("mx"), F.min("v").alias("mn"),
        ).collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["mx"], r["mn"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", "*"), "total": ("sum", "v"),
             "mx": ("max", "v"), "mn": ("min", "v")},
            n_salts=8,
        ).collect()
    }
    assert direct == salted


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="not an algebraic aggregate"):
        salted_agg(df, ["k"], {"m": ("median", "v")})
