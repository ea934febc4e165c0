"""checkpoint_with_scalar materialization modes (operators/scalars.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.scalars import (
    CHECKPOINT_MODE_CONF,
    checkpoint_with_scalar,
)


def _attach_share(cp, scalar):
    return (
        cp.crossJoin(scalar)
        .select("k", (F.col("v") * 100 / F.col("tot")).alias("pct"))
        .collect()
    )


def test_local_and_reliable_modes_agree(spark):
    df = spark.createDataFrame([(1, 10), (2, 30), (3, 60)], "k int, v int")
    cp_l, sc_l = checkpoint_with_scalar(df, F.sum("v").alias("tot"), mode="local")
    want = {(r["k"], r["pct"]) for r in _attach_share(cp_l, sc_l)}
    assert want == {(1, 10.0), (2, 30.0), (3, 60.0)}

    ckdir = tempfile.mkdtemp(prefix="reliable_ck_")
    try:
        spark.sparkContext.setCheckpointDir(ckdir)
        cp_r, sc_r = checkpoint_with_scalar(
            df, F.sum("v").alias("tot"), mode="reliable"
        )
        assert {(r["k"], r["pct"]) for r in _attach_share(cp_r, sc_r)} == want
        # the reliable variant really wrote checkpoint files: a surviving
        # on-disk copy is the whole point (executor loss cannot drop it)
        import os

        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckdir)
            for f in fs
            if not f.startswith(".")
        ]
        assert files, "reliable mode left no checkpoint files"
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)


def test_mode_resolves_from_session_conf(spark):
    df = spark.createDataFrame([(1, 5)], "k int, v int")
    ckdir = tempfile.mkdtemp(prefix="reliable_ck_conf_")
    try:
        spark.sparkContext.setCheckpointDir(ckdir)
        spark.conf.set(CHECKPOINT_MODE_CONF, "reliable")
        cp, sc = checkpoint_with_scalar(df, F.sum("v").alias("tot"))
        assert cp.count() == 1 and sc.first()["tot"] == 5
        spark.conf.set(CHECKPOINT_MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="bogus"):
            checkpoint_with_scalar(df, F.sum("v").alias("tot"))
    finally:
        spark.conf.unset(CHECKPOINT_MODE_CONF)
        shutil.rmtree(ckdir, ignore_errors=True)


def test_banded_running_sum_ascending_matches_global_window(spark):
    """descending=False gives the ascending global running sum a rank/CDF
    computation needs — compare against a single-partition recompute."""
    from pyspark.sql import functions as F

    from nfl_big_data_bowl_2024_spark.operators.prefix import banded_running_sum

    df = (
        spark.range(0, 1000, 1, 8)
        .select((F.col("id") * 37 % 500).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("band", F.expr("v div 64"))
    )
    got = {
        r["v"]: r["cum"]
        for r in banded_running_sum(
            df, "band", [F.col("v")], "n", descending=False
        ).collect()
    }
    rows = sorted((r["v"], r["n"]) for r in df.collect())
    cum, expect = 0, {}
    for v, n in rows:
        cum += n
        expect[v] = cum
    assert got == expect
