"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``nfl_big_data_bowl_2024_spark.plans.registry``
(one registered entry per operator family from SURVEY.md §2, Spark
callable and DuckDB oracle side by side); this module only adapts
that registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nfl_big_data_bowl_2024_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (E1 pipeline shape: event window -> first crossing ->
    bounded grouped max -> dim join -> having) on sf0.001."""
    from nfl_big_data_bowl_2024_spark.plans.relational import flagship_bounded_max

    return flagship_bounded_max(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; hash-seeded / kernel queries register
    ``oracle=None`` and are omitted (driver records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
