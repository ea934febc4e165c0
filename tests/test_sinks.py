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


# --- S5b animation/GIF sink -------------------------------------------------
# The decoder below implements the GIF89a LZW decode algorithm from the spec
# independently of the encoder, so a round-trip failure localizes encoder
# bugs (bit packing, code-size bumps, table reset at 4096).


def _gif_parse(data: bytes):
    import struct as _s

    assert data[:6] == b"GIF89a"
    w, h = _s.unpack("<HH", data[6:10])
    packed = data[10]
    assert packed & 0x80
    gct_bits = (packed & 0x07) + 1
    pos = 13
    palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(1 << gct_bits)]
    pos += 3 * (1 << gct_bits)
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        assert b == 0x2C, hex(b)
        fx, fy, fw, fh = _s.unpack("<HHHH", data[pos + 1 : pos + 9])
        assert data[pos + 9] == 0  # no local color table
        pos += 10
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        frames.append((fw, fh, _gif_lzw_decode(bytes(lzw), mcs, fw * fh)))
    return w, h, palette, frames


def _gif_lzw_decode(data: bytes, mcs: int, n_px: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = mcs + 1
    bitpos = 0
    prev = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = mcs + 1
        prev = None

    reset()
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        byte0 = bitpos // 8
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (chunk >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        else:
            assert code == len(table), "invalid code"
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        out += entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = code
        if len(out) >= n_px:
            break
    return bytes(out[:n_px])


def test_gif_roundtrip_small_frames():
    import numpy as np

    from nfl_big_data_bowl_2024_spark.sources.animation_sink import write_gif

    f0 = np.zeros((30, 40), dtype=np.uint8)
    f0[5:10, 5:15] = 3
    f1 = np.full((30, 40), 1, dtype=np.uint8)
    f1[::2, ::3] = 7
    d = tempfile.mkdtemp(prefix="gif_")
    try:
        p = write_gif([f0, f1], os.path.join(d, "t.gif"), fps=10)
        data = open(p, "rb").read()
        w, h, palette, frames = _gif_parse(data)
        assert (w, h) == (40, 30)
        assert len(frames) == 2
        for src, (fw, fh, px) in zip([f0, f1], frames):
            got = np.frombuffer(px, dtype=np.uint8).reshape(fh, fw)
            assert np.array_equal(got, src)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gif_lzw_table_reset_path():
    import numpy as np

    from nfl_big_data_bowl_2024_spark.sources.animation_sink import write_gif

    # High-entropy frame large enough to overflow the 4096-entry LZW table
    # (forces the mid-stream CLEAR + reset path).
    i, j = np.indices((120, 200))
    noisy = ((i * 37 + j * 101 + i * j) % 16).astype(np.uint8)
    d = tempfile.mkdtemp(prefix="gif_")
    try:
        p = write_gif([noisy], os.path.join(d, "n.gif"), fps=5)
        w, h, _, frames = _gif_parse(open(p, "rb").read())
        got = np.frombuffer(frames[0][2], dtype=np.uint8).reshape(h, w)
        assert np.array_equal(got, noisy)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_animation_sink_renders_trajectory(spark):
    import numpy as np

    from nfl_big_data_bowl_2024_spark.plans.domain import single_play_trajectory
    from nfl_big_data_bowl_2024_spark.sources.animation_sink import (
        PALETTE,
        save_animation,
    )

    df = single_play_trajectory(spark, "/root/testdata/sf0.001")
    d = tempfile.mkdtemp(prefix="gif_")
    try:
        p = save_animation(df, os.path.join(d, "play"), fps=10)
        assert p.endswith(".gif")
        data = open(p, "rb").read()
        w, h, palette, frames = _gif_parse(data)
        assert len(frames) == df.count()  # one GIF frame per tracked frame
        assert palette[: len(PALETTE)] == [tuple(c) for c in PALETTE]
        # Carrier (idx 3) and tackler (idx 4) are drawn on every frame; the
        # vicinity ring (idx 7) appears only on in-vicinity frames.
        n_vic = df.where("in_vicinity = 1").count()
        seen_vic = 0
        for fw, fh, px in frames:
            arr = np.frombuffer(px, dtype=np.uint8)
            assert (arr == 3).any() and (arr == 4).any()
            seen_vic += int((arr == 7).any())
        assert seen_vic == n_vic
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_scd2_validity_chains(spark):
    import shutil
    import tempfile

    from nfl_big_data_bowl_2024_spark.sources.writers import upsert_scd2_parquet

    d = tempfile.mkdtemp(prefix="scd2_")
    path = f"{d}/dim"
    try:
        base = spark.createDataFrame(
            [(1, "a", 10, None), (2, "b", 10, None)],
            "k long, v string, valid_from long, valid_to long",
        )
        base.write.parquet(path)
        # two chained updates for k=1 in ONE batch, plus a brand-new key
        updates = spark.createDataFrame(
            [(1, "a2", 20), (1, "a1", 15), (3, "c", 20)],
            "k long, v string, ts long",
        )
        upsert_scd2_parquet(spark, path, updates, keys=["k"], ts_col="ts")
        got = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            (1, "a", 10, 15),    # closed by the 15-update
            (1, "a1", 15, 20),   # closed by the 20-update, same batch
            (1, "a2", 20, None), # current
            (2, "b", 10, None),  # untouched key passes through
            (3, "c", 20, None),  # new key, current from its first version
        }
        # a later batch closes only what it touches and keeps history
        upsert_scd2_parquet(
            spark,
            path,
            spark.createDataFrame([(2, "b2", 30)], "k long, v string, ts long"),
            keys=["k"],
            ts_col="ts",
        )
        after = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in spark.read.parquet(path).collect()
        }
        assert (2, "b", 10, 30) in after and (2, "b2", 30, None) in after
        assert (1, "a", 10, 15) in after  # closed history untouched
        assert len(after) == 6
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_scd2_rejects_late_and_duplicate_timestamps(spark):
    import shutil
    import tempfile

    import pytest as _pytest

    from nfl_big_data_bowl_2024_spark.sources.writers import upsert_scd2_parquet

    d = tempfile.mkdtemp(prefix="scd2g_")
    path = f"{d}/dim"
    try:
        spark.createDataFrame(
            [(1, "a", 10, 15), (1, "a1", 15, None)],
            "k long, v string, valid_from long, valid_to long",
        ).write.parquet(path)
        # late arrival: ts=12 falls inside closed history [10,15)
        with _pytest.raises(ValueError, match="late arrivals"):
            upsert_scd2_parquet(
                spark,
                path,
                spark.createDataFrame([(1, "x", 12)], "k long, v string, ts long"),
                keys=["k"],
                ts_col="ts",
            )
        # duplicate (key, ts) in one batch: nondeterministic chain order
        with _pytest.raises(ValueError, match="nondeterministic"):
            upsert_scd2_parquet(
                spark,
                path,
                spark.createDataFrame(
                    [(1, "x", 30), (1, "y", 30)], "k long, v string, ts long"
                ),
                keys=["k"],
                ts_col="ts",
            )
        # the rejected batches must not have modified the dataset
        got = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {(1, "a", 10, 15), (1, "a1", 15, None)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_upsert_scd2_evaluates_updates_once(spark):
    """The updates DataFrame is materialized ONCE (eager localCheckpoint)
    before the guards: the late/duplicate checks and the final write must
    see identical rows, or a nondeterministic source (rand(), a
    non-snapshot view) could pass the guards yet write rows violating the
    interval invariants.  An accumulator-backed source counts evaluations
    directly — two actions (guards) + one write would otherwise re-run it
    three times."""
    import shutil
    import tempfile

    from nfl_big_data_bowl_2024_spark.sources.writers import upsert_scd2_parquet

    d = tempfile.mkdtemp(prefix="scd2once_")
    path = f"{d}/dim"
    try:
        spark.createDataFrame(
            [(1, "a", 10, None)], "k long, v string, valid_from long, valid_to long"
        ).write.parquet(path)
        acc = spark.sparkContext.accumulator(0)

        def _emit(i):
            acc.add(1)
            return (int(i), f"u{i}", 20 + int(i))

        # explicit schema: inference would sample the RDD before the writer
        # ever sees it and over-count
        updates = spark.createDataFrame(
            spark.sparkContext.parallelize([1, 2], 1).map(_emit),
            "k long, v string, ts long",
        )
        upsert_scd2_parquet(spark, path, updates, keys=["k"], ts_col="ts")
        assert acc.value == 2, f"updates evaluated {acc.value / 2:g} times"
        got = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            (1, "a", 10, 21),
            (1, "u1", 21, None),
            (2, "u2", 22, None),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshot_versions_time_travel_and_vacuum(spark):
    """write_snapshot / read_snapshot / vacuum_snapshots: versions are
    immutable, the pointer resolves the newest commit, time travel reads
    any retained version, vacuum removes only the oldest and never the
    pointer target."""
    import shutil
    import tempfile

    import pytest as _pytest

    from nfl_big_data_bowl_2024_spark.sources.readers import (
        read_snapshot,
        read_snapshot_version,
    )
    from nfl_big_data_bowl_2024_spark.sources.writers import (
        list_snapshot_versions,
        vacuum_snapshots,
        write_snapshot,
    )

    d = tempfile.mkdtemp(prefix="snap_")
    path = d + "/tbl"
    try:
        base = spark.range(0, 100).withColumn("v", F.col("id") * 2)
        assert write_snapshot(spark, base, path) == 1
        assert write_snapshot(spark, base.withColumn("v", F.col("v") + 1), path) == 2
        assert write_snapshot(spark, base.limit(10), path) == 3
        assert read_snapshot_version(spark, path) == 3
        assert list_snapshot_versions(spark, path) == [1, 2, 3]
        # latest + time travel
        assert read_snapshot(spark, path).count() == 10
        assert read_snapshot(spark, path, version=1).agg(F.sum("v")).first()[0] == 9900
        assert read_snapshot(spark, path, version=2).agg(F.sum("v")).first()[0] == 10000
        # a v1 reader resolved BEFORE the v2/v3 commits still sees v1 bytes
        # (the new commits never touched v=1)
        assert read_snapshot(spark, path, version=1).count() == 100
        # vacuum: keep newest 2 -> v1 goes, pointer target stays
        assert vacuum_snapshots(spark, path, keep=2) == [1]
        assert list_snapshot_versions(spark, path) == [2, 3]
        assert read_snapshot_version(spark, path) == 3
        assert read_snapshot(spark, path, version=2).count() == 100
        with _pytest.raises(Exception):
            read_snapshot(spark, path, version=1).count()
        # keep=0 is clamped to never delete the pointer target
        assert vacuum_snapshots(spark, path, keep=0) == []
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_animation_field_markings_and_arrows(spark):
    """Field-marking parity with the reference plot (optimal_pursuit.py:
    367-380): hash-mark rows at 70'9\" from each sideline, 5-yd minor yard
    lines, black marker edges, and orientation arrows when the input
    carries compass headings (single_play_animation_input)."""
    import numpy as np

    from nfl_big_data_bowl_2024_spark.plans.domain import (
        single_play_animation_input,
        single_play_trajectory,
    )
    from nfl_big_data_bowl_2024_spark.sources.animation_sink import (
        _HASH_Y,
        rasterize_play_frames,
    )

    scale, field_y = 3.0, 53.3
    with_dirs = rasterize_play_frames(
        single_play_animation_input(spark, "/root/testdata/sf0.001").toPandas(),
        scale=scale,
    )
    without = rasterize_play_frames(
        single_play_trajectory(spark, "/root/testdata/sf0.001").toPandas(),
        scale=scale,
    )
    assert len(with_dirs) == len(without) > 0
    # hash-mark rows: gridline ticks at a non-yard-line x on both hash rows
    f0 = with_dirs[0]
    probe_x = int(12 * scale)  # 12-yd column: not a 5- or 10-yd line
    for hy in (_HASH_Y, field_y - _HASH_Y):
        py = int(round((field_y - hy) * scale))
        assert f0[py, probe_x] == 2, (py, probe_x, int(f0[py, probe_x]))
    # 5-yd minor line present (dashed: every other pixel) at x=15
    col15 = f0[:, int(15 * scale)]
    assert (col15 == 2).sum() >= col15.size // 3
    # orientation arrows (palette 14) appear ONLY when headings are given
    assert any((fr == 14).any() for fr in with_dirs)
    assert not any((fr == 14).any() for fr in without)
    # black-edged markers: some border-color pixels beyond the frame edges
    inner = with_dirs[0][2:-2, 2:-2]
    assert (inner == 8).any()
