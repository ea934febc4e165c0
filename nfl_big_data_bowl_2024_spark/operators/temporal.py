"""Temporal join operators Spark lacks natively: as-of join and range join.

Both are implemented as compositions of built-in operators chosen for their
100 TB shape — neither falls back to a nested-loop join:

  asof_join    union + ordered window carry-forward: one shuffle on the key,
               one sort — O(n log n) per key regardless of how many right
               rows precede each left row. (The naive inequality-join
               alternative is O(left x right) per key.)
  range_join   interval bucketing: each probe-side row explodes to the
               (few) fixed-width buckets its window overlaps, the join is a
               plain EQUI-join on (key, bucket), and the exact predicate
               re-filters — turning BroadcastNestedLoopJoin into a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` key (NULL values when no
    right row precedes).

    Right rows must be unique per (by, right_ts) — pre-aggregate ties, since
    an as-of match against tied timestamps is engine-arbitrary.

    Shape: tag both sides, union, ONE window over (by, ts) with
    ``last(value, ignorenulls)`` carrying the right values forward, keep the
    left rows. Right rows order BEFORE left rows on timestamp ties so
    equality matches (ASOF >= semantics).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (by, right_ts)]

    l_tag = left.select(
        F.col(by),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (by, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, left_ts)],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .drop("_is_left", *[f"_r_{c}" for c in value_cols])
        .withColumnRenamed("_ts", left_ts)
    )


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    by: str,
    probe_ts: str,
    build_ts: str,
    radius_sec: int,
    agg_alias: str = "n_in_range",
) -> DataFrame:
    """Count build-side rows within ``radius_sec`` seconds of each probe row
    (same ``by`` key), via interval bucketing.

    Probe rows explode to the up-to-3 buckets their +/-radius window can
    overlap (bucket width = radius), the join is an equi-join on
    (by, bucket), each build row is examined at most 3x, and the exact
    |delta| <= radius predicate filters before the final aggregate.
    """
    width = radius_sec
    p = probe.select(
        F.col(by),
        F.unix_micros(probe_ts).alias("_p_us"),
        *[c for c in probe.columns if c not in (by, probe_ts)],
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.expr(f"_p_us div {width * 1_000_000} - 1"),
                F.expr(f"_p_us div {width * 1_000_000}"),
                F.expr(f"_p_us div {width * 1_000_000} + 1"),
            )
        ),
    )
    b = build.select(
        F.col(by).alias("_b_key"),
        F.unix_micros(build_ts).alias("_b_us"),
    ).withColumn("_bucket", F.expr(f"_b_us div {width * 1_000_000}"))

    joined = p.join(
        b, (p[by] == b["_b_key"]) & (p["_bucket"] == b["_bucket"]), "left"
    ).withColumn(
        "_hit",
        F.when(
            F.abs(F.col("_b_us") - F.col("_p_us")) <= width * 1_000_000, 1
        ).otherwise(0),
    )
    group_cols = [by, "_p_us"] + [
        c for c in probe.columns if c not in (by, probe_ts)
    ]
    return (
        joined.groupBy(*group_cols)
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias(agg_alias))
        .withColumnRenamed("_p_us", f"{probe_ts}_us")
    )
