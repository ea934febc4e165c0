"""Sink tests: S3 parquet, S4 error split, S5 figure shim."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.sources.report_sink import save_figure
from nfl_big_data_bowl_2024_spark.sources.writers import (
    write_result,
    write_with_error_sink,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_result_partitioned(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)], "id long, k string, v double"
    )
    write_result(df, f"{tmpdir}/out", partition_by=["k"])
    assert os.path.isdir(f"{tmpdir}/out/k=a")
    back = spark.read.parquet(f"{tmpdir}/out")
    assert back.count() == 3


def test_error_sink_split(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "ok"), (2, "error_no_window"), (3, "ok"), (4, "error_unknown_position")],
        "id long, status string",
    )
    write_with_error_sink(df, f"{tmpdir}/ok", f"{tmpdir}/err")
    ok = spark.read.parquet(f"{tmpdir}/ok")
    err = spark.read.parquet(f"{tmpdir}/err")
    assert sorted(r["id"] for r in ok.collect()) == [1, 3]
    assert "status" not in ok.columns  # ok sink drops the routing column
    assert sorted(r["id"] for r in err.collect()) == [2, 4]
    assert "status" in err.columns  # error ledger keeps the reason


def test_figure_sink_small_aggregate(spark, tmpdir):
    df = spark.createDataFrame(
        [("LB", 4.2), ("DB", 3.1), ("T", 1.9)], "position string, yap_mean double"
    )
    out = save_figure(df, f"{tmpdir}/fig/yap_by_pos", kind="bar", x="position", y="yap_mean")
    assert os.path.exists(out)
    assert glob.glob(f"{tmpdir}/fig/yap_by_pos.*")


def test_figure_sink_rejects_unaggregated(spark, tmpdir):
    big = spark.range(20_000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    with pytest.raises(ValueError, match="aggregate before plotting"):
        save_figure(big, f"{tmpdir}/fig/too_big", x="id", y="v")


def test_bucketed_write_shuffle_free_join(spark, tmpdir):
    from nfl_big_data_bowl_2024_spark.sources.writers import write_bucketed

    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bt_a", ["k"], n_buckets=4, sort_cols=["k"], path=f"{tmpdir}/bt_a")
    write_bucketed(b, "bt_b", ["k"], n_buckets=4, sort_cols=["k"], path=f"{tmpdir}/bt_b")
    joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join plans with NO shuffle exchange
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def test_compact_parquet_reduces_files_and_preserves_rows(spark):
    import glob
    import shutil
    import tempfile

    from nfl_big_data_bowl_2024_spark.sources.writers import compact_parquet

    d_in = tempfile.mkdtemp(prefix="cmp_in_")
    d_out = tempfile.mkdtemp(prefix="cmp_out_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.repartition(40).write.mode("overwrite").parquet(d_in)
        assert len(glob.glob(f"{d_in}/part-*")) == 40
        n = compact_parquet(spark, d_in, d_out, target_mb=256)
        assert n == 1
        assert len(glob.glob(f"{d_out}/part-*")) == 1
        a = {tuple(r) for r in spark.read.parquet(d_out).collect()}
        b = {tuple(r) for r in docs.collect()}
        assert a == b
    finally:
        shutil.rmtree(d_in, ignore_errors=True)
        shutil.rmtree(d_out, ignore_errors=True)


def test_upsert_parquet_latest_wins(spark):
    import shutil
    import tempfile

    from nfl_big_data_bowl_2024_spark.sources.writers import upsert_parquet

    d = tempfile.mkdtemp(prefix="upsert_")
    path = f"{d}/state"
    try:
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 10), (3, "c", 10)],
            "k long, v string, ver long",
        )
        base.write.parquet(path)
        updates = spark.createDataFrame(
            [(2, "b2", 20), (4, "d", 20), (2, "b1", 15)],
            "k long, v string, ver long",
        )
        upsert_parquet(spark, path, updates, keys=["k"], order_cols=["ver"])
        got = {(r["k"], r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
        assert got == {(1, "a", 10), (2, "b2", 20), (3, "c", 10), (4, "d", 20)}
        # idempotent re-apply: same updates, same state
        upsert_parquet(spark, path, updates, keys=["k"], order_cols=["ver"])
        again = {(r["k"], r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}
        assert again == got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_range_sorted_write_has_disjoint_file_ranges(spark):
    """Files written by write_range_sorted must carry disjoint min/max key
    ranges in their parquet footers — the property row-group skipping needs."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from nfl_big_data_bowl_2024_spark.sources.writers import write_range_sorted

    d = tempfile.mkdtemp(prefix="rsort_")
    try:
        from nfl_big_data_bowl_2024_spark.sources.readers import read_testdata_table

        ev = read_testdata_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "value"
        )
        write_range_sorted(ev, d, ["user_id"], n_files=4)
        ranges = []
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            md = pq.read_metadata(f)
            col_idx = md.schema.names.index("user_id")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        assert len(ranges) == 4
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"
        back = spark.read.parquet(d)
        assert back.count() == ev.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_write_localizes_both_dimensions(spark):
    """Z-ordered files must narrow per-file footer ranges for BOTH columns
    (the 2-D skipping property), where a 1-D sort only narrows its own key."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from nfl_big_data_bowl_2024_spark.sources.readers import read_testdata_table
    from nfl_big_data_bowl_2024_spark.sources.writers import (
        write_range_sorted,
        write_zorder,
    )

    def span_frac(path, col):
        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        spans, glo, ghi = [], None, None
        for f in files:
            md = pq.read_metadata(f)
            ci = md.schema.names.index(col)
            mins = [md.row_group(r).column(ci).statistics.min for r in range(md.num_row_groups)]
            maxs = [md.row_group(r).column(ci).statistics.max for r in range(md.num_row_groups)]
            lo, hi = min(mins), max(maxs)
            spans.append(hi - lo)
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return sum(spans) / len(spans) / ((ghi - glo) or 1.0)

    ev = read_testdata_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    dz = tempfile.mkdtemp(prefix="zord_")
    d1 = tempfile.mkdtemp(prefix="rsort1d_")
    try:
        write_zorder(ev, dz, "user_id", "value", n_files=16)
        write_range_sorted(ev, d1, ["user_id"], n_files=16)

        # 1-D sort: its own key is tightly clustered; the other column is
        # left wide (not fully ~1.0 here only because the skewed value
        # distribution truncates subset maxima).
        assert span_frac(d1, "user_id") < 0.2
        v1 = span_frac(d1, "value")
        assert v1 > 0.5, v1
        # Z-order: BOTH columns clustered — and the second column far
        # tighter than the 1-D layout leaves it.
        zx, zy = span_frac(dz, "user_id"), span_frac(dz, "value")
        assert zx < 0.4, zx
        assert zy < 0.4, zy
        assert zy < v1 / 2
        back = spark.read.parquet(dz)
        assert back.count() == ev.count()
    finally:
        shutil.rmtree(dz, ignore_errors=True)
        shutil.rmtree(d1, ignore_errors=True)
