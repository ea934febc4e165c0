"""Unit tests for the ordered-sequence operators (SURVEY §2.5 W1-W4/A1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.windows import (
    bounded_group_max,
    event_window,
    first_crossing,
    offset_from_first,
    ordered_slice,
)

ROWS = [
    # (grp, ord, event, val)
    ("a", 1, None, 1.0),
    ("a", 2, "ball_snap", 2.0),
    ("a", 3, "handoff", 3.0),
    ("a", 4, None, 9.0),
    ("a", 5, "tackle", 4.0),
    ("a", 6, None, 5.0),
    ("b", 1, "ball_snap", 1.0),
    ("b", 2, None, 7.0),
    ("b", 3, "tackle", 2.0),
    ("c", 1, None, 1.0),  # no events at all
]


def _df(spark):
    return spark.createDataFrame(ROWS, "grp string, ord int, event string, val double")


def test_event_window_with_fallback(spark):
    win = event_window(
        _df(spark), ["grp"], "ord", "event",
        start_events=["handoff"], stop_events=["tackle"],
        fallback_start_event="ball_snap",
    )
    got = {r["grp"]: (r["start_ord"], r["stop_ord"]) for r in win.collect()}
    assert got == {"a": (3, 5), "b": (1, 3), "c": (None, None)}


def test_event_window_no_fallback(spark):
    win = event_window(
        _df(spark), ["grp"], "ord", "event",
        start_events=["handoff"], stop_events=["tackle"],
    )
    got = {r["grp"]: r["start_ord"] for r in win.collect()}
    assert got["b"] is None  # b only has the fallback event


def test_first_crossing_strict_after(spark):
    df = _df(spark).withColumn("start_ord", F.lit(3))
    got = {
        r["grp"]: r["crossing_ord"]
        for r in first_crossing(
            df, ["grp"], "ord", F.col("val") > 3.0, F.col("start_ord")
        ).collect()
    }
    # grp a: val>3 at ord 4(9.0),5(4.0),6(5.0) -> first after 3 is 4
    # grp b: val>3 at ord 2 only, not > start 3 -> NULL
    assert got == {"a": 4, "b": None, "c": None}


def test_ordered_slice_python_semantics(spark):
    df = _df(spark).withColumn("lo", F.lit(2)).withColumn("hi", F.lit(5))
    got = sorted(
        r["ord"] for r in ordered_slice(df, "ord", "lo", "hi").filter("grp='a'").collect()
    )
    assert got == [2, 3, 4]  # lo inclusive, hi exclusive


def test_bounded_group_max_null_when_no_rows(spark):
    df = (
        _df(spark)
        .withColumn("lo", F.when(F.col("grp") == "a", 2).otherwise(F.lit(None)))
        .withColumn("hi", F.when(F.col("grp") == "a", 5).otherwise(F.lit(None)))
    )
    out = bounded_group_max(df, ["grp"], "ord", "lo", "hi", {"val": "max_val"})
    got = {r["grp"]: r["max_val"] for r in out.collect()}
    assert got == {"a": 9.0}  # groups with NULL bounds drop out (caller left-joins)


def test_offset_from_first(spark):
    out = offset_from_first(_df(spark), ["grp"], "ord", "val", "elapsed")
    got = {(r["grp"], r["ord"]): r["elapsed"] for r in out.collect()}
    assert got[("a", 1)] == 0.0
    assert got[("a", 4)] == 8.0  # 9.0 - 1.0
    assert got[("b", 3)] == 1.0  # 2.0 - 1.0
