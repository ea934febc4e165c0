"""Distributed global running sum — no global window, no driver collect.

A corpus-wide running sum (ORDER BY <global key>) is a single-task stage
if expressed as an unpartitioned window. When the global sort key admits
a BOUNDED banding (a quantized score, a coarsened weight), the same
result decomposes into three fully distributed steps:

  1. per-band value totals (one hash aggregate over the bounded bands),
  2. a triangular band-level self-join for each band's EXCLUSIVE offset
     (sum of totals over strictly-earlier bands — the band relation is
     tiny, so the O(B^2) join is trivial and avoids both a driver
     collect and a single-partition window),
  3. a band-partitioned window adding the in-band running sum.

``band_col`` must be monotone in the global sort order (band-major order
== global order), and ``order_cols`` must sort rows within a band exactly
as the global order does. Used by doc_select_token_budget and
doc_dsir_select; their DuckDB oracles state the semantics as the plain
global window this replaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def banded_running_sum(
    df: DataFrame,
    band_col: str,
    order_cols: Sequence[Column],
    value_col: str,
    out_col: str = "cum",
    descending: bool = True,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` in (band,
    *order_cols) global order. With ``descending=True`` (default) bands
    sort DESCENDING — earlier = larger band value, matching the
    best-first selection queries; ``descending=False`` gives the
    ascending order rank/CDF computations need (``order_cols`` must then
    sort ascending within bands to match)."""
    bands = df.groupBy(band_col).agg(F.sum(value_col).alias("_band_total"))
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    earlier = (
        F.col(f"b2.{band_col}") > F.col(f"b1.{band_col}")
        if descending
        else F.col(f"b2.{band_col}") < F.col(f"b1.{band_col}")
    )
    offsets = (
        b1.join(b2, earlier, "left")
        .groupBy(F.col(f"b1.{band_col}").alias(band_col))
        .agg(
            F.coalesce(F.sum(F.col("b2._band_total")), F.lit(0))
            .cast("long")
            .alias("_band_offset")
        )
    )
    w = (
        Window.partitionBy(band_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum_in_band", F.sum(value_col).over(w))
        .join(F.broadcast(offsets), band_col)
        .withColumn(
            out_col,
            (F.col("_band_offset") + F.col("_cum_in_band")).cast("long"),
        )
        .drop("_band_offset", "_cum_in_band")
    )
