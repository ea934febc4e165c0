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


def test_anova_matches_numpy_float_reference(spark):
    """The fixed-point ANOVA's defined floor-division slack must stay
    negligible: F in milli-units vs the float F computed by numpy from
    the same cents quantization, within 2 milli (flooring slack bound)."""
    import numpy as np

    from nfl_big_data_bowl_2024_spark.plans import all_queries

    SF = "/root/testdata/sf0.01"
    row = all_queries()["stat_anova_oneway"].fn(spark, SF).collect()[0]
    pdf = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
    groups = [cents[(pdf["event_type"] == t).to_numpy()]
              for t in pdf["event_type"].unique()]
    k, n = len(groups), len(cents)
    grand = cents.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["f_milli"] - round(f_ref * 1000)) <= 2, (
        row["f_milli"], f_ref * 1000
    )
    # the exact integer SS decomposition must re-add to the total SS
    # (floor slack cancels: ssb + ssw uses sum_a with opposite signs)
    total_ss = int((cents.astype(object) ** 2).sum()) - \
        int(cents.astype(object).sum()) ** 2 // n
    assert abs(int(row["ssb_cents2"]) + int(row["ssw_cents2"]) - total_ss) <= 1


def test_cusum_matches_recursive_reference(spark):
    """The window formulation S_t = P_t - min(0, cummin P) must equal the
    textbook recursion S_t = max(0, S_{t-1} + dev_t) replayed in Python
    over the same hourly rollup."""
    import collections

    from nfl_big_data_bowl_2024_spark.plans import all_queries

    SF = "/root/testdata/sf0.01"
    got = {r["event_type"]: r for r in
           all_queries()["evt_changepoint_cusum"].fn(spark, SF).collect()}
    from nfl_big_data_bowl_2024_spark.sources.readers import (
        read_testdata_table,
    )

    ev = (
        read_testdata_table(spark, SF, "events")
        .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS hour")
        .toPandas()
    )
    counts = collections.Counter(zip(ev["event_type"], ev["hour"]))
    by_type = collections.defaultdict(dict)
    for (t, h), c in counts.items():
        by_type[t][h] = c
    for t, hours in by_type.items():
        xs = [hours[h] for h in sorted(hours)]
        ref = sum(xs) // len(xs)
        s, smax, alarms, first = 0, 0, 0, None
        for h, x in zip(sorted(hours), xs):
            s = max(0, s + (x - ref))
            smax = max(smax, s)
            if s > 5 * ref:
                alarms += 1
                if first is None:
                    first = h
        r = got[t]
        assert r["max_cusum"] == smax, (t, r["max_cusum"], smax)
        assert r["n_alarm_hours"] == alarms
        assert r["first_alarm_hour"] == first


def test_benford_and_rfm_invariants(spark):
    """Cheap structural invariants on the round-7 DQ/segmentation pair:
    Benford digit rows partition the order count; RFM cells partition the
    customer set and its monetary total."""
    from nfl_big_data_bowl_2024_spark.plans import all_queries
    from nfl_big_data_bowl_2024_spark.sources.readers import (
        read_testdata_table,
    )

    SF = "/root/testdata/sf0.01"
    qs = all_queries()
    orders = read_testdata_table(spark, SF, "orders")

    ben = qs["dq_benford_first_digit"].fn(spark, SF).collect()
    assert sorted(r["digit"] for r in ben) == list(range(1, 10))
    assert sum(r["n"] for r in ben) == orders.count()
    # expected counts are a probability distribution scaled by the total
    total = sum(r["n"] for r in ben)
    assert abs(sum(r["expected_n"] for r in ben) - total) <= 9  # floor slack

    rfm = qs["evt_rfm_segmentation"].fn(spark, SF).collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rfm) == n_cust
    for r in rfm:
        assert 1 <= r["r_seg"] <= 5 and 1 <= r["f_seg"] <= 5 and 1 <= r["m_seg"] <= 5


def test_pareto_frontier_matches_quadratic_dominance(spark):
    """The banded sort-based skyline must equal the O(n^2) dominance
    definition: p survives iff no q has (price <= p.price AND size >=
    p.size) with at least one strict inequality."""
    from nfl_big_data_bowl_2024_spark.plans.registry import all_queries
    from nfl_big_data_bowl_2024_spark.sources.readers import read_testdata_table

    SF = "/root/testdata/sf0.001"
    got = {
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in all_queries()["opt_pareto_frontier"].fn(spark, SF).collect()
    }
    parts = [
        (r["p_partkey"], r["p_size"], r["p_retailprice"])
        for r in read_testdata_table(spark, SF, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]
    want = {
        p
        for p in parts
        if not any(
            q[2] <= p[2] and q[1] >= p[1] and (q[2] < p[2] or q[1] > p[1])
            for q in parts
        )
    }
    assert got == want
    assert want, "fixture must have a non-empty frontier"
