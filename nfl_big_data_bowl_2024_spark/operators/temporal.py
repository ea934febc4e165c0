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

Row-atomicity contract (advice r9): the right-side value columns are carried
through the window as ONE struct, so every ``asof_<col>`` output comes from
the SAME matched right row even when some of its value columns are NULL —
matching true ASOF / DuckDB semantics. (A per-column carry would silently
fill a NULL column from a different, further right row.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def _right_struct_type(right: DataFrame, value_cols: list[str]) -> StructType:
    """Struct type bundling the right value columns (row-atomic carry)."""
    return StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward', the default) or the
    EARLIEST right row with ``right_ts >= left_ts``
    (direction='forward') within the same ``by`` key (NULL values when
    no right row qualifies).

    Right rows must be unique per (by, right_ts) — pre-aggregate ties, since
    an as-of match against tied timestamps is engine-arbitrary.

    Shape: tag both sides, union, ONE window over (by, ts) with
    ``last(struct, ignorenulls)`` carrying the matched right ROW forward (or
    ``first`` over the following frame for direction='forward'), keep
    the left rows. On timestamp ties right rows order on the MATCHING
    side of left rows (before for backward, after for forward) so
    equality matches in both directions. The carried struct is non-null
    exactly when a right row matched, so NULLs inside individual right
    value columns never mix rows.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (by, right_ts)]
    if not value_cols:
        # F.struct() with zero fields raises; a right side with nothing to
        # carry has no meaningful as-of output either — fail loudly.
        raise ValueError(
            "asof_join: right side has no value columns to carry "
            f"(columns besides by={by!r} and right_ts={right_ts!r})"
        )
    stype = _right_struct_type(right, value_cols)

    l_tag = left.select(
        F.col(by),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (by, left_ts)],
        F.lit(None).cast(stype).alias("_r"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, left_ts)],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy("_ts", "_is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(by)
            .orderBy("_ts", F.desc("_is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.select(
            "*", F.first("_r", ignorenulls=True).over(w).alias("_m")
        )
    else:
        raise ValueError(f"direction must be backward|forward: {direction}")
    return carried.filter(F.col("_is_left") == 1).select(
        F.col(by),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left.columns if c not in (by, left_ts)],
        *[F.col("_m").getField(c).alias(f"asof_{c}") for c in value_cols],
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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'): for
    every left row, the right row minimizing |right_ts - left_ts| within
    the same key, optionally within ``tolerance_us`` microseconds; ties
    between an equally-near predecessor and successor go BACKWARD (the
    predecessor), and an exact-timestamp match is a backward match with
    dt 0. Appends ``asof_<col>`` for each value column plus ``asof_dt_us``
    (signed: negative = matched row precedes, positive = follows; NULL =
    no match in tolerance).

    Right rows must be unique per (by, right_ts) — pre-aggregate ties.

    Shape: the same union + single (by, ts)-sorted exchange as the
    backward asof_join, but with TWO window frames over that one sort —
    a backward last(ignorenulls) carry and a forward first(ignorenulls)
    carry, each of ONE struct bundling the right timestamp and all value
    columns (row-atomic) — then a per-row integer-microsecond argmin
    between the two candidate rows. Still one shuffle + one sort per
    key; never an inequality join.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, right_ts)
    ]
    # The carried struct leads with the right timestamp in microseconds
    # (long) followed by the value columns, so candidate-row distance and
    # candidate-row values can never come from different rows.
    stype = StructType(
        [StructField("_rus", LongType())]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )

    l_tag = left.select(
        F.col(by),
        F.unix_micros(F.col(left_ts)).alias("_us"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (by, left_ts)],
        F.lit(None).cast(stype).alias("_r"),
    )
    r_tag = right.select(
        F.col(by),
        F.unix_micros(F.col(right_ts)).alias("_us"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (by, left_ts)
        ],
        F.struct(
            F.unix_micros(F.col(right_ts)).alias("_rus"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort BEFORE left rows on timestamp ties, so the backward
    # frame sees an equal-timestamp right row (dt 0) and the forward frame
    # (currentRow onward) does not double-count it.
    w_back = (
        Window.partitionBy(by)
        .orderBy("_us", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(by)
        .orderBy("_us", "_is_left")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.last("_r", ignorenulls=True).over(w_back).alias("_b"),
        F.first("_r", ignorenulls=True).over(w_fwd).alias("_f"),
    ).filter(F.col("_is_left") == 1)
    bus = F.col("_b").getField("_rus")
    fus = F.col("_f").getField("_rus")
    bdt = F.col("_us") - bus  # >= 0 when backward exists
    fdt = fus - F.col("_us")  # >= 0 when forward exists
    b_ok = bus.isNotNull() & (
        F.lit(True) if tolerance_us is None else (bdt <= tolerance_us)
    )
    f_ok = fus.isNotNull() & (
        F.lit(True) if tolerance_us is None else (fdt <= tolerance_us)
    )
    take_back = b_ok & (~f_ok | (bdt <= fdt))
    take_fwd = f_ok & ~take_back
    picked = carried.select(
        by,
        "_us",
        *[c for c in left.columns if c not in (by, left_ts)],
        *[
            F.when(take_back, F.col("_b").getField(c))
            .when(take_fwd, F.col("_f").getField(c))
            .alias(f"asof_{c}")
            for c in value_cols
        ],
        F.when(take_back, -bdt)
        .when(take_fwd, fdt)
        .cast("long")
        .alias("asof_dt_us"),
    )
    return picked.withColumnRenamed("_us", f"{left_ts}_us")
