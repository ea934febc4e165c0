"""E3 — reporting stage (reference plot_YAP.py:31-81).

The reference reads the three stage-2 CSVs, joins actual vs optimal params,
clips/recodes, then hand-rolls per-player stats with a concat-accumulator
loop (plot_YAP.py:17-28). Here the whole chain is ONE DataFrame plan ending
in a tiny aggregate (plot-ready; S5 figure rendering is a driver-side
``toPandas`` + matplotlib shim in sources/report_sink.py).

Runs over the deterministic stage-2 fixture (fixtures.py §A6); the oracle
rebuilds the identical rows via a VALUES CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from .registry import register

_KEYS = ["game_ID", "play_ID", "NFL_ID", "name", "position"]


def player_stats_plan(
    yap: DataFrame,
    max_params: DataFrame,
    max_params_opt: DataFrame,
    position_group: str = "LB",
    min_count: int = 5,
) -> DataFrame:
    """plot_YAP.py chain: rename-opt -> left join actual<->opt -> deltas ->
    left join YAP -> clip YAP>=0 -> position coarsening -> per-player stats
    -> count threshold (reference :35-46,72-75). The accumulator loop
    becomes one hash aggregate (A3/U4)."""
    mpo = max_params_opt.withColumnsRenamed(
        {"max_vel": "max_vel_opt", "max_accel": "max_accel_opt"}
    )
    mp = (
        max_params.join(mpo, _KEYS, "left")
        .dropDuplicates()
        .withColumn("delta_vel", F.col("max_vel_opt") - F.col("max_vel"))
        .withColumn("delta_accel", F.col("max_accel_opt") - F.col("max_accel"))
    )
    joined = (
        yap.join(mp, _KEYS, "left")
        .dropDuplicates()
        # Clip negatives but PRESERVE NULLs (reference's masked update leaves
        # NaN untouched; greatest() would swallow NULL into 0 on one engine).
        .withColumn("YAP", F.when(F.col("YAP") < 0, F.lit(0.0)).otherwise(F.col("YAP")))
        .withColumn(
            "position",
            F.when(F.col("position").isin("CB", "SS", "FS"), "DB")
            .when(F.col("position").isin("MLB", "OLB", "ILB"), "LB")
            .when(F.col("position").isin("DT", "NT"), "T")
            .otherwise(F.col("position")),
        )
    )
    stats = (
        joined.filter(F.col("position") == position_group)
        .groupBy("NFL_ID", "name", "position")
        .agg(
            (
                F.floor(
                    F.sum(F.col("YAP").cast("decimal(24,10)")).cast("double")
                    / F.count("YAP")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("YAP_mean"),
            F.expr("percentile(YAP, 0.5)").alias("YAP_med"),
            F.max("YAP").alias("YAP_max"),
            F.count("YAP").alias("n_plays"),
        )
    )
    return stats.filter(F.col("n_plays") >= min_count)


_E3_ORACLE = f"""
WITH stage2 AS (SELECT * FROM {fixtures.stage2_values_cte()}),
yap AS (SELECT game_ID, play_ID, NFL_ID, name, position, YAP FROM stage2),
mp AS (SELECT game_ID, play_ID, NFL_ID, name, position, max_vel, max_accel FROM stage2),
mpo AS (SELECT game_ID, play_ID, NFL_ID, name, position,
               max_vel_opt AS max_vel, max_accel_opt AS max_accel FROM stage2),
joined AS (
    SELECT y.NFL_ID, y.name,
           CASE WHEN y.position IN ('CB','SS','FS') THEN 'DB'
                WHEN y.position IN ('MLB','OLB','ILB') THEN 'LB'
                WHEN y.position IN ('DT','NT') THEN 'T'
                ELSE y.position END AS position,
           CASE WHEN y.YAP < 0 THEN 0.0 ELSE y.YAP END AS YAP
    FROM yap y
    LEFT JOIN (
        SELECT a.game_ID, a.play_ID, a.NFL_ID, a.name, a.position,
               a.max_vel, a.max_accel,
               o.max_vel AS max_vel_opt, o.max_accel AS max_accel_opt
        FROM mp a LEFT JOIN mpo o
          ON a.game_ID = o.game_ID AND a.play_ID = o.play_ID
         AND a.NFL_ID = o.NFL_ID AND a.name = o.name AND a.position = o.position
    ) m
      ON y.game_ID = m.game_ID AND y.play_ID = m.play_ID
     AND y.NFL_ID = m.NFL_ID AND y.name = m.name AND y.position = m.position
)
SELECT NFL_ID, name, position,
       floor(CAST(sum(CAST(YAP AS DECIMAL(24,10))) AS DOUBLE)
             / count(YAP) * 10000 + 0.5) / 10000 AS YAP_mean,
       quantile_cont(YAP, 0.5) AS YAP_med,
       max(YAP) AS YAP_max,
       count(YAP) AS n_plays
FROM joined
WHERE position = 'LB'
GROUP BY NFL_ID, name, position
HAVING count(YAP) >= 5
"""


_E3B_ORACLE = f"""
WITH stage2 AS (SELECT * FROM {fixtures.stage2_values_cte().replace('fx(', 'fxb(')}),
recoded AS (
    SELECT CASE WHEN position IN ('CB','SS','FS') THEN 'DB'
                WHEN position IN ('MLB','OLB','ILB') THEN 'LB'
                WHEN position IN ('DT','NT') THEN 'T'
                ELSE position END AS position,
           max_vel, max_accel
    FROM stage2
)
SELECT position,
       count(*) AS n,
       floor(CAST(sum(CAST(max_vel AS DECIMAL(24,10))) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS mean_vel,
       floor(CAST(sum(CAST(max_accel AS DECIMAL(24,10))) AS DOUBLE)
             / count(*) * 10000 + 0.5) / 10000 AS mean_accel,
       round(corr(max_vel, max_accel), 4) AS vel_accel_corr,
       min(max_vel) AS min_vel, max(max_vel) AS max_vel_obs
FROM recoded
GROUP BY position
"""


@register(
    "e3_position_params",
    _E3B_ORACLE,
    doc="E3b reporting (reference plot_max_parameters.py:16-44): position "
    "coarsening -> per-position distribution stats + Pearson correlation of "
    "max velocity vs max acceleration, over the stage-2 fixture.",
)
def e3_position_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = fixtures.stage2_df(spark)
    recoded = s2.select(
        F.when(F.col("position").isin("CB", "SS", "FS"), "DB")
        .when(F.col("position").isin("MLB", "OLB", "ILB"), "LB")
        .when(F.col("position").isin("DT", "NT"), "T")
        .otherwise(F.col("position"))
        .alias("position"),
        "max_vel",
        "max_accel",
    )
    n = F.count(F.lit(1))
    return recoded.groupBy("position").agg(
        n.alias("n"),
        (
            F.floor(F.sum(F.col("max_vel").cast("decimal(24,10)")).cast("double") / n * 10000 + 0.5)
            / 10000
        ).alias("mean_vel"),
        (
            F.floor(F.sum(F.col("max_accel").cast("decimal(24,10)")).cast("double") / n * 10000 + 0.5)
            / 10000
        ).alias("mean_accel"),
        F.round(F.corr("max_vel", "max_accel"), 4).alias("vel_accel_corr"),
        F.min("max_vel").alias("min_vel"),
        F.max("max_vel").alias("max_vel_obs"),
    )


@register(
    "e3_player_stats",
    _E3_ORACLE,
    doc="E3 reporting chain over the stage-2 fixture: J3 multi-key joins + F6 "
    "rename/deltas + F7 clip/recode + A3/U4 per-player stats + O2 having "
    "(reference plot_YAP.py:31-81).",
)
def e3_player_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = fixtures.stage2_df(spark)
    yap = s2.select(*_KEYS, "YAP")
    mp = s2.select(*_KEYS, "max_vel", "max_accel")
    mpo = s2.select(
        *_KEYS,
        F.col("max_vel_opt").alias("max_vel"),
        F.col("max_accel_opt").alias("max_accel"),
    )
    return player_stats_plan(yap, mp, mpo)
