"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every setting is chosen
for the real deployment target: a multi-executor cluster scanning ~100 TB.

Scale rationale (audited via .explain("formatted") in tests):
  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
    Play groups are mildly skewed (long plays have more frames) and document
    dedup buckets are heavily skewed; AQE handles both without hand-tuning.
  - shuffle.partitions is a default for the local harness; on a 1000-executor
    cluster AQE's coalescing makes the initial number mostly irrelevant as
    long as it is high enough, so production would set it ~2-3x total cores.
  - autoBroadcastJoinThreshold 64m: every dimension table in the reference's
    data model (games/players/plays/tackles ~ a few MB even at 100x NFL scale)
    must broadcast; fact-to-fact joins (tracking self-join) stay sort-merge.
  - Arrow enabled: all custom kernels are pandas UDF / applyInPandas; Arrow
    batching is the only acceptable Python boundary at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "nfl-bdb-2024-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Joins whose keys are a SUPERSET of a table's bucket keys (E1/E2
        # join tracking on (game, play, frame) / (game, play, nflId) over
        # storage bucketed on (game, play)) may reuse the bucket
        # partitioning instead of re-shuffling both sides — the default
        # (true, since Spark 3.3) only accepts exact key matches. This is
        # what makes the bucketed 100 TB layout shuffle-free for the whole
        # domain pipeline (plan-asserted in tests/test_plan_audit.py).
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Runtime Bloom-filter join pruning: when a selective filter sits on
        # the build side of a NON-broadcast join (the fact-to-fact case at
        # 100 TB — at local scale dims broadcast and this never fires), the
        # probe side's scan is pre-filtered by a bloom_filter_agg subquery
        # (might_contain on xxhash64 of the join key), cutting the shuffled
        # volume to ~the matching fraction. No-op for broadcast joins;
        # plan-audited under forced-shuffle conditions in
        # tests/test_plan_audit.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
