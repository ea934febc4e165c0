"""Sinks (SURVEY §2.1 S3/S4).

The reference appends one CSV row per tackler per play with a header-on-create
dance (reference optimal_pursuit.py:256-259,568-571) and a separate error CSV
fed by a blanket try/except (calculate_YAP.py:42-49). Spark-first: results are
written once per job, and failures travel WITH the data as a ``status`` column
so one pass feeds two sinks — no driver-side exception bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_result(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (S3). Spark writers are job-idempotent; no header dance."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed/external table for co-located joins.

    Two fact tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle (each bucket pairs 1:1) — at 100 TB this is the
    difference between a full-network sort-merge and a local join. Sorting
    within buckets additionally removes the sort from sort-merge joins.
    Bucketing requires saveAsTable (the bucket metadata lives in the
    catalog); ``path`` makes it an external table.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_with_error_sink(df: DataFrame, ok_path: str, error_path: str, status_col: str = "status") -> None:
    """Two-sink split (S4): rows with status=='ok' -> result table, the rest ->
    error ledger. ``df`` should be cached by the caller if recomputing it is
    expensive; at scale prefer persist(DISK_ONLY) over recompute for kernels.
    """
    df.filter(F.col(status_col) == "ok").drop(status_col).write.mode("overwrite").parquet(ok_path)
    df.filter(F.col(status_col) != "ok").write.mode("overwrite").parquet(error_path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-Lines sink — the interchange format of LLM training-data
    pipelines (one JSON object per line, gzip-splittable at the file level).
    Spark's json writer emits JSONL natively, one file per partition;
    ``partition_by`` lays out hive-style directories (lang=en/...) so a
    downstream scan prunes strata without listing the rest."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(bytes / target_mb) files.

    Streaming sinks and over-parallel writers leave thousands of KB-sized
    files; at 100 TB the scan's task-scheduling and footer-reading overhead
    then dominates. Sizing comes from the filesystem's content summary (the
    Hadoop FS API, so it works on HDFS/S3/local alike) — metadata only, no
    data pass. Returns the target file count. The repartition is a full
    shuffle by design: it rebalances skewed input files; for
    already-balanced input, coalesce() would avoid the shuffle but inherits
    any skew.
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(n_bytes / (target_mb * 1024 * 1024)))
    spark.read.parquet(in_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return n_files


def upsert_parquet(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> None:
    """SCD-1 latest-wins upsert on a plain parquet dataset (no table format).

    Read target + union updates + keep the newest row per key
    (row_number over ``order_cols`` DESC — include a unique tiebreaker for
    determinism), then swap the dataset: Spark cannot safely overwrite a
    path that the same job is reading, so the merged result writes to a
    sibling temp dir and replaces the target via a filesystem rename (the
    same commit pattern table formats wrap in a metadata transaction; this
    is the honest non-transactional version — concurrent readers of ``path``
    during the swap see either old or new, writers must be externally
    serialized).

    Scale note: this rewrites the whole dataset — correct for dimension/
    metadata tables (the use case), wasteful for fact tables, where the fix
    is partition-scoped overwrite (partitionOverwriteMode=dynamic) or a
    transactional format.
    """
    tgt = spark.read.parquet(path)
    merged = tgt.unionByName(updates)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    _swap_dataset(spark, latest, path)


def _swap_dataset(spark, df: DataFrame, path: str) -> None:
    """Write ``df`` to a sibling temp dir, then replace ``path`` via a
    filesystem rename (see upsert_parquet's docstring for the
    non-transactional-commit caveats)."""
    tmp = path.rstrip("/") + ".__upsert_tmp__"
    df.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    fs = hadoop_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hadoop_path(path), True)
    if not fs.rename(hadoop_path(tmp), hadoop_path(path)):
        raise IOError(f"rename {tmp} -> {path} failed")


def upsert_scd2_parquet(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
) -> None:
    """SCD-2 history-preserving upsert: validity intervals instead of
    latest-wins.

    The target dataset carries ``valid_from`` (long) and ``valid_to``
    (long, NULL = current). Each update row (with its effective timestamp
    in ``ts_col``) opens a new version: the previously-current row for
    that key closes at the update's timestamp, and multiple updates for
    one key inside a batch chain correctly (ordered by ``ts_col``). Keys
    the batch does not touch pass through untouched; closed history rows
    are never rewritten logically (the dataset IS rewritten physically —
    same dimension-table scope and swap caveats as upsert_parquet).

    Shape: one window over (keys) ordered by valid_from computes every
    row's ``valid_to`` as the next version's ``valid_from`` — a single
    key-partitioned shuffle of current+new rows only; the closed-history
    side is a pass-through union. The target is read once (eager
    localCheckpoint) — hist and cur are two filters of the SAME read, and
    Catalyst does not CSE DataFrame subtrees.

    Late arrivals are REJECTED: an update whose timestamp is at or before
    its key's current ``valid_from`` would splice an interval inside the
    closed history (overlapping intervals, nondeterministic tie order).
    Chaining is only correct for strictly-increasing timestamps per key,
    so the writer raises instead of corrupting the dataset — route
    late-arriving facts through a history rebuild, not an upsert.
    """
    from pyspark.sql.window import Window

    tgt = spark.read.parquet(path).localCheckpoint(eager=True)
    hist = tgt.filter(F.col("valid_to").isNotNull())
    cur = tgt.filter(F.col("valid_to").isNull()).drop("valid_to")
    # Materialize the caller's updates ONCE: the guards below and the
    # final write must see identical rows, and a nondeterministic source
    # (rand(), a non-snapshot stream) re-evaluated per action could pass
    # the guards yet write rows violating the interval invariants.
    upd = (
        updates.withColumn("valid_from", F.col(ts_col).cast("long"))
        .drop(ts_col)
        .localCheckpoint(eager=True)
    )
    n_late = (
        upd.select(*keys, F.col("valid_from").alias("_new_from"))
        .join(cur.select(*keys, F.col("valid_from").alias("_cur_from")), keys)
        .filter(F.col("_new_from") <= F.col("_cur_from"))
        .count()
    )
    if n_late:
        raise ValueError(
            f"upsert_scd2_parquet: {n_late} update row(s) carry a timestamp "
            "at or before their key's current valid_from — late arrivals "
            "would splice intervals inside closed history; rebuild instead"
        )
    n_dup = (
        upd.groupBy(*keys, "valid_from")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    if n_dup:
        raise ValueError(
            f"upsert_scd2_parquet: {n_dup} (key, timestamp) pair(s) appear "
            "more than once in the batch — equal timestamps make the "
            "version chain order nondeterministic"
        )
    w = Window.partitionBy(*keys).orderBy("valid_from")
    chained = (
        cur.unionByName(upd)
        .withColumn("valid_to", F.lead("valid_from").over(w))
    )
    _swap_dataset(spark, hist.unionByName(chained), path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted parquet layout for data skipping.

    repartitionByRange gives files DISJOINT key ranges and
    sortWithinPartitions orders rows inside each, so every parquet
    row-group's min/max statistics become selective: a point or range
    predicate on ``sort_cols`` skips whole files/row-groups at scan time
    (the reader consults footer stats before reading pages). This is the
    poor-man's clustering key — the same reason table formats Z-order.
    Range partitioning samples the key distribution, so skewed keys still
    yield balanced files (unlike hash bucketing, this also preserves
    range-scan locality).
    """
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def _spread_bits16(c):
    """Spread a 16-bit value's bits to even positions (0b...b1b0 ->
    0b..0b1_0b0) with the classic magic-mask shifts — four shift/and
    rounds, all JVM integer ops inside whole-stage codegen."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def write_zorder(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) parquet layout: 2-D data skipping.

    ``write_range_sorted`` clusters ONE key; predicates on a second column
    still touch every file. Z-ordering interleaves the bits of two
    rank-quantized keys so rows close in (x, y) space land in the same
    file — per-file footer min/max stats become selective for BOTH
    columns at once, which is why table formats offer Z-order clustering.

    Mechanics: one tiny 4-number min/max aggregate (driver-held, same
    order of cost as repartitionByRange's own sampling pass) rank-scales
    each column to 16 bits; the Morton code is pure shift/mask integer
    expressions (codegen, no UDF); repartitionByRange on the code gives
    files disjoint curve segments and sortWithinPartitions orders rows
    along the curve inside each.
    """
    xd, yd = F.col(col_x).cast("double"), F.col(col_y).cast("double")
    mnx, mxx, mny, mxy = df.agg(
        F.min(xd), F.max(xd), F.min(yd), F.max(yd)
    ).first()
    spanx = (mxx - mnx) or 1.0
    spany = (mxy - mny) or 1.0

    def quant(c, mn, span):
        q = F.floor((c - F.lit(mn)) / F.lit(span) * 65535).cast("long")
        return F.least(F.greatest(q, F.lit(0)), F.lit(65535))

    z = _spread_bits16(quant(xd, mnx, spanx)).bitwiseOR(
        F.shiftleft(_spread_bits16(quant(yd, mny, spany)), 1)
    )
    zdf = df.withColumn("__z", z)
    parted = (
        zdf.repartitionByRange(n_files, "__z")
        if n_files
        else zdf.repartitionByRange("__z")
    )
    parted.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


# --- Snapshot-versioned tables (time travel / snapshot isolation) -----------


def _fs_for(spark, path: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    return hp.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def list_snapshot_versions(spark, path: str) -> list[int]:
    """Sorted version numbers present under a snapshot table root."""
    fs, jvm = _fs_for(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def write_snapshot(spark, df: DataFrame, path: str) -> int:
    """Versioned snapshot write: the table-format commit primitive on plain
    parquet.

    Layout: ``path/v=N/`` per snapshot plus a ``path/_LATEST`` pointer file
    holding N. A write lands ENTIRELY in a fresh ``v=N`` directory before
    the pointer moves, so concurrent readers that resolved the pointer see
    a complete, immutable snapshot for the whole lifetime of their query —
    snapshot isolation without a metastore. Time travel is
    ``read_snapshot(path, version=K)``: old versions stay readable until
    ``vacuum_snapshots`` reclaims them (exactly Delta/Iceberg's
    snapshot + retention model, minus the transaction log).

    The commit itself is the pointer swap (tmp file + delete + rename via
    the Hadoop FS API, so HDFS/S3A/local all work). On a POSIX FS the
    rename is atomic; the delete->rename pair leaves a sub-millisecond
    window where the pointer is absent — honest limitation of
    log-free plain parquet; a real deployment serializes WRITERS
    externally (readers are always safe: they either resolve the old or
    the new version, never a partial one).

    At 100 TB the cost over a plain write is ZERO data movement — the
    snapshot directory IS the written output; version resolution is one
    metadata read, and no reader ever lists more than its own version's
    files.
    """
    fs, jvm = _fs_for(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    versions = list_snapshot_versions(spark, path)
    n = (versions[-1] + 1) if versions else 1
    df.write.mode("overwrite").parquet(f"{path}/v={n}")
    tmp = P(f"{path}/_LATEST.tmp")
    out = fs.create(tmp, True)
    out.write(str(n).encode("ascii"))
    out.close()
    ptr = P(f"{path}/_LATEST")
    fs.delete(ptr, False)
    if not fs.rename(tmp, ptr):
        raise IOError(f"pointer swap failed for {path}")
    return n


def vacuum_snapshots(spark, path: str, keep: int = 2) -> list[int]:
    """Retention: delete all but the newest ``keep`` versions (and never
    the pointer target). Returns the removed version numbers. Readers
    holding a vacuumed version fail on their NEXT file access — the same
    contract as Delta's VACUUM; retention must exceed the longest-running
    reader."""
    from .readers import read_snapshot_version

    fs, jvm = _fs_for(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    latest = read_snapshot_version(spark, path)
    versions = list_snapshot_versions(spark, path)
    doomed = [v for v in versions[:-keep] if v != latest] if keep > 0 else []
    for v in doomed:
        fs.delete(P(f"{path}/v={v}"), True)
    return doomed
