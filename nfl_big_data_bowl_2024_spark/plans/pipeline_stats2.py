"""Classical-statistics queries, second module (stat_*).

pipeline_stats.py reached the 2,500-LoC split threshold set by the
round-8 refactor (r11 verdict item 6), so round-12+ statistics
registrations land here. Same conventions: exact fixed-point arithmetic
with engine-defined floor division, grid/value-level rank machinery
instead of row-level sorts, banded prefix sums instead of
single-partition global windows, and a DuckDB oracle beside every
Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.prefix import banded_running_sum
from ..sources.readers import read_testdata_table as _t
from .registry import register


@register(
    "stat_kruskal_wallis",
    """
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    g AS (SELECT cents, count(*) AS dup FROM v GROUP BY cents),
    c AS (
        SELECT cents, dup,
               sum(dup) OVER (ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
        FROM g
    ),
    r AS (SELECT cents, dup, 2 * cum - dup + 1 AS r2 FROM c),
    ge AS (
        SELECT event_type, cents, count(*) AS cg
        FROM v GROUP BY event_type, cents
    ),
    s AS (
        SELECT ge.event_type,
               CAST(sum(ge.cg) AS BIGINT)          AS n_i,
               CAST(sum(ge.cg * r.r2) AS BIGINT)   AS r2_i
        FROM ge JOIN r USING (cents) GROUP BY ge.event_type
    ),
    ties AS (
        SELECT CAST(sum(CAST(dup AS HUGEINT) * dup * dup - dup) AS HUGEINT)
                   AS t
        FROM g
    ),
    parts AS (
        SELECT count(*) AS k,
               sum(n_i) AS n,
               sum(CAST(r2_i AS HUGEINT) * r2_i // n_i) AS a4
        FROM s
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(n AS BIGINT) AS n,
           CAST(t AS BIGINT) AS tie_term,
           CAST((3000 * a4 // 4) // (n * (n + 1)) - 3000 * (n + 1)
                AS BIGINT) AS h_milli,
           CAST((1000 * ((3 * a4 // 4) * (n - 1)
                         - 3 * n * (n - 1) * (n + 1) * (n + 1)))
                // (CAST(n AS HUGEINT) * n * n - n - t) AS BIGINT)
               AS hc_milli
    FROM parts, ties
    """,
    doc="Kruskal-Wallis rank test across event types (does the VALUE "
    "distribution's location differ by type, assuming nothing about "
    "its shape?) — the k-group generalization of stat_mann_whitney_u "
    "and the nonparametric twin of stat_anova_oneway, completing the "
    "location-test triple (parametric ANOVA / 2-group MW / k-group "
    "KW); reported both raw (h_milli) and tie-corrected (hc_milli, "
    "divisor 1 - sum(t^3-t)/(N^3-N) folded into exact integer "
    "cross-multiplication via (N^3-N)/(N(N+1)) = N-1). EXACT integers "
    "end to end: combined-sample midranks as doubled midranks "
    "(2*cum - dup + 1, the ml_roc_auc/MW tie idiom) over the bounded "
    "distinct-cents grid, per-group doubled rank sums R2_i from grid "
    "counts (never row-level ranks), and H = 3/(N(N+1)) * sum(R2_i^2/"
    "n_i) - 3(N+1) with every quotient a defined truncate-toward-zero "
    "division in 128-bit intermediates (R2_i^2 ~ 4N^4 — DECIMAL(38)/"
    "HUGEINT holds to ~sf1000, documented bound). Plan discipline: the "
    "global cumulative over the value grid uses the banded prefix-sum "
    "operator (per-band totals + band offsets + band-partitioned "
    "window), NEVER a single-partition window; the doubled-rank "
    "relation is value-level and re-enters broadcast; everything else "
    "is two partial-aggregated exchanges and a 1-row fold.",
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    g = (
        v.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("dup"))
        .withColumn("band", F.expr("cents div 1024"))
    )
    cum = banded_running_sum(
        g, "band", [F.col("cents")], "dup", out_col="cum", descending=False
    )
    r = cum.select(
        "cents",
        "dup",
        (F.lit(2) * F.col("cum") - F.col("dup") + 1).alias("r2"),
    )
    ge = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cg"))
    s = (
        ge.join(F.broadcast(r.select("cents", "r2")), "cents")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("long").alias("n_i"),
            F.sum(F.col("cg") * F.col("r2")).cast("long").alias("r2_i"),
        )
    )
    ties = g.agg(
        F.sum(
            F.expr("CAST(dup AS DECIMAL(28,0)) * dup * dup - dup")
        )
        .cast("decimal(38,0)")
        .alias("t")
    )
    parts = s.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_i").alias("n"),
        # a4 = sum(R2_i^2 div n_i) = 4 * sum(R_i^2 div' n_i): the doubled
        # ranks keep ties integral; the /4 is folded into the final
        # milli-divisions below (defined truncate-toward-zero protocol,
        # see stat_anova_oneway's comment)
        F.sum(
            F.expr(
                "CAST(CAST(r2_i AS DECIMAL(22,0)) * r2_i div n_i"
                " AS DECIMAL(38,0))"
            )
        ).alias("a4"),
    )
    # Spark's `div` returns BIGINT even for DECIMAL operands, so the
    # big quotients (3000*a4/4 ~ 1e26 at sf10) must stay decimal via the
    # exact floor-division identity (q - q % d) / 4 (agg_gini precedent:
    # q % d makes the numerator divisible, decimal `/` is then exact);
    # `div` is used only where the RESULT fits int64.
    return parts.crossJoin(ties).select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("t").cast("long").alias("tie_term"),
        F.expr(
            "CAST(CAST((3000 * a4 - (3000 * a4) % 4) / 4 AS DECIMAL(38,0))"
            " div (n * (n + 1)) - 3000 * (n + 1) AS BIGINT)"
        ).alias("h_milli"),
        F.expr(
            "CAST((1000 * ("
            "CAST((3 * a4 - (3 * a4) % 4) / 4 AS DECIMAL(38,0)) * (n - 1)"
            " - 3 * CAST(n AS DECIMAL(38,0)) * (n - 1) * (n + 1) * (n + 1)))"
            " div (CAST(n AS DECIMAL(38,0)) * n * n - n - t) AS BIGINT)"
        ).alias("hc_milli"),
    )
