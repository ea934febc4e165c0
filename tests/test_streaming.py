"""Structured Streaming tests: file source -> watermark/session/stateful ops
-> memory sink, cross-checked against the equivalent batch aggregation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nfl_big_data_bowl_2024_spark import streaming as st

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("gameId", T.LongType(), False),
        T.StructField("playId", T.LongType(), False),
        T.StructField("nflId", T.LongType(), False),
        T.StructField("frameId", T.IntegerType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("s", T.DoubleType(), True),
        T.StructField("a", T.DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def stream_dir(spark):
    """Two parquet files (= two micro-batch candidates) of 10 Hz frames for
    two plays, event-times anchored at a fixed epoch."""
    d = tempfile.mkdtemp(prefix="trkstream_")
    base = 1_700_000_000

    def rows(play, frames, nfl, t0):
        return [
            (1, play, nfl, f, base + t0 + f * 0.1, 3.0 + 0.1 * f * (nfl % 3), 1.0)
            for f in frames
        ]

    batch1 = rows(1, range(1, 16), 11, 0) + rows(1, range(1, 16), 12, 0)
    batch2 = rows(1, range(16, 31), 11, 0) + rows(2, range(1, 21), 13, 60)
    for i, rws in enumerate([batch1, batch2]):
        spark.createDataFrame(
            [(g, p, n, f, float(t), s, a) for g, p, n, f, t, s, a in rws],
            "gameId long, playId long, nflId long, frameId int, ts double, s double, a double",
        ).withColumn("event_time", F.timestamp_seconds("ts")).drop("ts").select(
            "gameId", "playId", "nflId", "frameId", "event_time", "s", "a"
        ).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(q):
    q.awaitTermination(120)


def test_windowed_play_stats_matches_batch(spark, stream_dir):
    stream = st.read_tracking_stream(spark, stream_dir, STREAM_SCHEMA)
    assert stream.isStreaming
    q = st.run_to_memory_sink(
        st.windowed_play_stats(stream, window_len="1 second"),
        "win_stats", "append",
    )
    _drain(q)
    got = spark.table("win_stats")
    batch = (
        spark.read.schema(STREAM_SCHEMA).parquet(stream_dir)
        .groupBy(F.window("event_time", "1 second").alias("win"), "gameId", "playId")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("s").alias("max_speed"),
             F.max("a").alias("max_accel"))
        .select("gameId", "playId", F.col("win.start").alias("win_start"),
                "n_frames", "max_speed", "max_accel")
    )
    # Append mode emits only watermark-closed windows -> subset of batch rows.
    got_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in batch.collect()}
    assert got_rows <= batch_rows
    assert len(got_rows) > 0


def test_sessionized_play_stats(spark, stream_dir):
    stream = st.read_tracking_stream(spark, stream_dir, STREAM_SCHEMA)
    q = st.run_to_memory_sink(
        st.sessionized_play_stats(stream), "sess_stats", "append"
    )
    _drain(q)
    rows = {
        (r["gameId"], r["playId"], r["n_frames"], r["first_frame"], r["last_frame"])
        for r in spark.table("sess_stats").collect()
    }
    # Play 1: 45 frames (two players, frames 1-30/1-15 merged into one session);
    # play 2 is 60 s later so it can close play 1's session. Only sessions the
    # watermark has passed are emitted; play 1 must be among them.
    assert (1, 1, 45, 1, 30) in rows


def test_running_player_max_state_across_batches(spark, stream_dir):
    stream = st.read_tracking_stream(
        spark, stream_dir, STREAM_SCHEMA, max_files_per_trigger=1
    )
    q = st.run_to_memory_sink(st.running_player_max(stream), "run_max", "update")
    _drain(q)
    out = spark.table("run_max").toPandas()
    # update mode re-emits per batch; the LAST row per key is the final state.
    final = out.groupby(["gameId", "playId", "nflId"]).last()
    batch = (
        spark.read.schema(STREAM_SCHEMA).parquet(stream_dir)
        .groupBy("gameId", "playId", "nflId")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("s").alias("max_speed"))
        .toPandas().set_index(["gameId", "playId", "nflId"])
    )
    for key, row in batch.iterrows():
        assert final.loc[key, "n_frames"] == row["n_frames"]
        assert final.loc[key, "max_speed"] == pytest.approx(row["max_speed"])
    # player 11 spans both files: state really carried across micro-batches.
    assert final.loc[(1, 1, 11), "n_frames"] == 30


def test_watermark_drops_late_frames(spark):
    """A frame arriving a micro-batch AFTER the watermark has passed its
    event time must be dropped from the aggregation (the late-data
    guarantee); the same data aggregated in batch DOES count it."""
    import os
    import time as _time

    d = tempfile.mkdtemp(prefix="trklate_")
    try:
        base = 1_700_000_000

        def write_file(rws, mtime):
            before = set(os.listdir(d))
            spark.createDataFrame(
                rws,
                "gameId long, playId long, nflId long, frameId int, ts double, s double, a double",
            ).withColumn("event_time", F.timestamp_seconds("ts")).drop("ts").select(
                "gameId", "playId", "nflId", "frameId", "event_time", "s", "a"
            ).coalesce(1).write.mode("append").parquet(d)
            for f in set(os.listdir(d)) - before:
                os.utime(os.path.join(d, f), (mtime, mtime))

        # Batch 1: play 1 frames at t=0.1..0.9 plus a play-2 row at t=60 that
        # advances the watermark to 60-10=50 s.
        b1 = [(1, 1, 11, f, base + f * 0.1, 3.0, 1.0) for f in range(1, 10)]
        b1.append((1, 2, 13, 1, base + 60.0, 3.0, 1.0))
        # Batch 2: a play-2 row. During THIS batch the watermark (now 50 s)
        # evicts play 1's t=[0,1) window state and emits it (9 frames).
        b2 = [(1, 2, 13, 2, base + 61.0, 3.0, 1.0)]
        # Batch 3: one LATE play-1 frame at t=0.5. Its window was already
        # emitted, so the watermark filter must DROP it — a row merged into
        # live state is "late but accepted"; only post-eviction arrivals
        # carry the drop guarantee.
        b3 = [(1, 1, 11, 99, base + 0.5, 3.0, 1.0)]
        now = _time.time()
        write_file(b1, now - 60)
        write_file(b2, now - 30)
        write_file(b3, now)

        stream = st.read_tracking_stream(spark, d, STREAM_SCHEMA, max_files_per_trigger=1)
        agg = st.windowed_play_stats(
            stream, time_col="event_time", watermark="10 seconds", window_len="1 second"
        )
        q = st.run_to_memory_sink(agg, "late_drop_q")
        _drain(q)
        play1 = [
            (r["win_start"], r["n_frames"])
            for r in spark.table("late_drop_q").collect()
            if r["playId"] == 1
        ]
        # Exactly one emission for play 1's t=[0,1) window, with the 9
        # pre-watermark frames; the late row neither re-opens the window nor
        # appears as a new emission (batch aggregation would count 10).
        assert play1 == [(play1[0][0], 9)], play1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_static_join_enriches_every_frame(spark, stream_dir):
    roster = spark.createDataFrame(
        [(11, "CB"), (12, "WR"), (13, "S")], "nflId long, position string"
    )
    stream = st.read_tracking_stream(spark, stream_dir, STREAM_SCHEMA)
    q = st.run_to_memory_sink(
        st.enriched_frame_stream(stream, roster), "enriched", "append"
    )
    _drain(q)
    got = spark.table("enriched")
    batch = spark.read.schema(STREAM_SCHEMA).parquet(stream_dir)
    assert got.count() == batch.count()  # left join: no frame lost
    assert got.filter(F.col("position").isNull()).count() == 0
    assert {
        (r["nflId"], r["position"])
        for r in got.select("nflId", "position").distinct().collect()
    } == {(11, "CB"), (12, "WR"), (13, "S")}


def test_streaming_dedup_drops_replayed_frames(spark):
    """An at-least-once source replays frames (within one file and across
    micro-batches); dropDuplicatesWithinWatermark must emit each frame
    identity exactly once."""
    import shutil as _sh

    d = tempfile.mkdtemp(prefix="trkdup_")
    try:
        base = 1_700_000_000
        mk = lambda f: (1, 1, 11, f, base + f * 0.1, 3.0, 1.0)
        # file 1: frames 1-10 with 3-5 duplicated; file 2 replays 8-10.
        b1 = [mk(f) for f in range(1, 11)] + [mk(f) for f in (3, 4, 5)]
        b2 = [mk(f) for f in (8, 9, 10)]
        for rws in (b1, b2):
            spark.createDataFrame(
                rws,
                "gameId long, playId long, nflId long, frameId int, ts double, s double, a double",
            ).withColumn("event_time", F.timestamp_seconds("ts")).drop("ts").select(
                "gameId", "playId", "nflId", "frameId", "event_time", "s", "a"
            ).coalesce(1).write.mode("append").parquet(d)
        stream = st.read_tracking_stream(spark, d, STREAM_SCHEMA, max_files_per_trigger=1)
        q = st.run_to_memory_sink(st.dedup_frame_stream(stream), "deduped", "append")
        _drain(q)
        out = spark.table("deduped")
        assert out.count() == 10
        assert out.select("frameId").distinct().count() == 10
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_stream_stream_interval_join_matches_batch(spark, stream_dir):
    # Events stream: one 'snap' at each play's first frame time, one
    # 'whistle' 2 s in; frames join events within a 5 s lookback.
    import tempfile, shutil

    base = 1_700_000_000
    edir = tempfile.mkdtemp(prefix="evtstream_")
    try:
        spark.createDataFrame(
            [
                (1, 1, float(base + 0.1), "snap"),
                (1, 1, float(base + 2.0), "whistle"),
                (1, 2, float(base + 60.1), "snap"),
            ],
            "gameId long, playId long, ts double, event string",
        ).withColumn("evt_time", F.timestamp_seconds("ts")).drop("ts").coalesce(
            1
        ).write.mode("append").parquet(edir)

        EVT_SCHEMA = T.StructType(
            [
                T.StructField("gameId", T.LongType(), False),
                T.StructField("playId", T.LongType(), False),
                T.StructField("event", T.StringType(), False),
                T.StructField("evt_time", T.TimestampType(), False),
            ]
        )
        frames = st.read_tracking_stream(spark, stream_dir, STREAM_SCHEMA)
        events = st.read_tracking_stream(spark, edir, EVT_SCHEMA)
        joined = st.frame_event_interval_join(frames, events)
        _drain(st.run_to_memory_sink(joined, "ssj", output_mode="append"))
        got = spark.table("ssj").collect()

        bf = spark.read.schema(STREAM_SCHEMA).parquet(stream_dir).alias("f")
        be = spark.read.schema(EVT_SCHEMA).parquet(edir).alias("e")
        cond = (
            (F.col("f.gameId") == F.col("e.gameId"))
            & (F.col("f.playId") == F.col("e.playId"))
            & (F.col("e.evt_time") >= F.col("f.event_time") - F.expr("INTERVAL 5 seconds"))
            & (F.col("e.evt_time") <= F.col("f.event_time"))
        )
        want = (
            bf.join(be, cond)
            .select("f.gameId", "f.playId", "f.nflId", "f.frameId", "f.event_time",
                    "e.event", "e.evt_time")
            .collect()
        )
        key = lambda r: (r.gameId, r.playId, r.nflId, r.frameId, r.event)
        assert sorted(key(r) for r in got) == sorted(key(r) for r in want)
        assert len(want) > 0  # the fixture actually exercises the join
    finally:
        shutil.rmtree(edir, ignore_errors=True)


def test_checkpoint_resume_processes_only_new_files(spark):
    """Exactly-once file-source semantics across RESTARTS: a query drained
    with trigger(availableNow) against a checkpointLocation, then
    restarted after new files arrive, must process ONLY the new files —
    the checkpoint's source log, not the sink's content, carries the
    progress. This is the durability contract a 100 TB ingestion pipeline
    leans on (reprocessing a day of input on every restart is not an
    option)."""
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_log_")
    out = tempfile.mkdtemp(prefix="ckpt_out_") + "/sink"
    try:
        base = 1_700_000_000

        def write_batch(play, n0, n1):
            rows = [
                (1, play, 11, f, float(base + f * 0.1), 3.0, 1.0)
                for f in range(n0, n1)
            ]
            spark.createDataFrame(
                rows,
                "gameId long, playId long, nflId long, frameId int,"
                " ts double, s double, a double",
            ).withColumn("event_time", F.timestamp_seconds("ts")).drop(
                "ts"
            ).coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src)
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        write_batch(1, 1, 11)
        run_once()
        first = spark.read.parquet(out).count()
        assert first == 10

        # restart with NO new input: nothing may be reprocessed
        run_once()
        assert spark.read.parquet(out).count() == 10

        # new file arrives; restart processes exactly the delta
        write_batch(2, 1, 6)
        run_once()
        got = spark.read.parquet(out)
        assert got.count() == 15
        assert got.filter(F.col("playId") == 2).count() == 5
        # no duplicates of the first batch
        assert got.select("playId", "frameId").distinct().count() == 15
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)


def test_stream_upsert_foreachbatch_latest_wins_and_resumes(spark):
    """foreachBatch SCD-1 maintenance: (a) later micro-batches overwrite
    earlier versions of a key, latest-wins; (b) a restart against the
    same checkpoint applies nothing new (idempotent-by-progress); (c) a
    fresh update file upserts only the delta."""
    src = tempfile.mkdtemp(prefix="fb_src_")
    ckpt = tempfile.mkdtemp(prefix="fb_ckpt_")
    tgt = tempfile.mkdtemp(prefix="fb_tgt_") + "/dim"
    try:
        def write_updates(rows):
            spark.createDataFrame(
                rows, "k long, v string, ver long"
            ).coalesce(1).write.mode("append").parquet(src)

        def run():
            stream = spark.readStream.schema("k long, v string, ver long").parquet(src)
            q = st.stream_upsert_to_parquet(
                stream, tgt, keys=["k"], order_cols=["ver"], checkpoint_dir=ckpt
            )
            q.awaitTermination(120)

        write_updates([(1, "a1", 1), (2, "b1", 1)])
        run()
        assert {(r.k, r.v) for r in spark.read.parquet(tgt).collect()} == {
            (1, "a1"), (2, "b1"),
        }

        # restart, no new input: target unchanged
        run()
        assert spark.read.parquet(tgt).count() == 2

        # delta: key 2 updated, key 3 new
        write_updates([(2, "b2", 2), (3, "c1", 1)])
        run()
        got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
        assert got == {(1, "a1"), (2, "b2"), (3, "c1")}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tgt.rsplit("/", 1)[0], ignore_errors=True)


def test_stream_upsert_bootstrap_batch_dedups_backlog(spark):
    """ADVICE r4: with availableNow and no file cap, the ENTIRE backlog
    lands in the FIRST micro-batch — the target-bootstrap path must apply
    the same latest-wins dedup as the upsert path, or multiple versions of
    a key persist in the fresh target, violating the one-row-per-key SCD-1
    contract."""
    src = tempfile.mkdtemp(prefix="fb_boot_src_")
    ckpt = tempfile.mkdtemp(prefix="fb_boot_ckpt_")
    tgt = tempfile.mkdtemp(prefix="fb_boot_tgt_") + "/dim"
    try:
        # three versions of key 1 plus an exact-duplicate row for key 2,
        # all present BEFORE the stream first starts
        spark.createDataFrame(
            [(1, "a1", 1), (1, "a2", 2), (1, "a3", 3), (2, "b1", 1), (2, "b1", 1)],
            "k long, v string, ver long",
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k long, v string, ver long").parquet(src)
        q = st.stream_upsert_to_parquet(
            stream, tgt, keys=["k"], order_cols=["ver"], checkpoint_dir=ckpt
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(tgt).collect()
        assert len(rows) == 2, f"bootstrap kept duplicates: {rows}"
        assert {(r.k, r.v) for r in rows} == {(1, "a3"), (2, "b1")}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tgt.rsplit("/", 1)[0], ignore_errors=True)


def test_map_only_curation_ops_compose_into_streams(spark):
    """The curation column functions (PII redaction here) are pure
    projections, so the SAME expression must run unchanged on a
    readStream and emit exactly the batch result — the property that
    lets the curation pipeline process a live ingest feed without a
    separate code path."""
    from nfl_big_data_bowl_2024_spark.functions.text import count_pii, redact_pii

    d = tempfile.mkdtemp(prefix="stream_pii_")
    try:
        rows = [
            (1, "reach me at a@b.io or 10.0.0.1"),
            (2, "call 555-0142 twice 555-0143"),
            (3, "clean text only"),
        ]
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("text", T.StringType(), False),
            ]
        )
        batch_df = spark.createDataFrame(rows, schema)
        batch_df.coalesce(1).write.mode("overwrite").parquet(d)

        def scrub(df):
            return df.select(
                "doc_id",
                redact_pii(F.col("text")).alias("clean"),
                count_pii(F.col("text")).alias("n_pii"),
            )

        stream = spark.readStream.schema(schema).parquet(d)
        q = (
            scrub(stream)
            .writeStream.format("memory")
            .queryName("stream_pii_q")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.table("stream_pii_q").collect()}
        want = {tuple(r) for r in scrub(batch_df).collect()}
        assert got == want
        assert {r[0]: r[2] for r in want} == {1: 2, 2: 2, 3: 0}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rate_micro_batch_source_smoke(spark):
    """External-connector-shaped streaming smoke (SURVEY §2.9 names
    file/Kafka sources; no broker exists in this sandbox, so Spark's
    built-in rate-micro-batch source stands in as the unbounded
    always-more-data connector): deterministic per-trigger admission
    (rowsPerBatch) -> event-time tumbling windows -> complete-mode sink.
    Asserts the admission contract (every commit is a whole batch: total
    rows ≡ 0 mod rowsPerBatch) and the window math (1 s batch advance
    into 2 s windows -> every window holds one or two whole batches)."""
    import time as _time

    rows_per_batch = 100
    q = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
        .groupBy(F.window("timestamp", "2 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .writeStream.format("memory")
        .queryName("rate_smoke_q")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            rows = spark.table("rate_smoke_q").collect()
            if sum(r["n"] for r in rows) >= 3 * rows_per_batch:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("rate_smoke_q").collect()
    total = sum(r["n"] for r in rows)
    assert total >= 3 * rows_per_batch
    assert total % rows_per_batch == 0  # whole batches only
    for r in rows:
        assert r["n"] in (rows_per_batch, 2 * rows_per_batch)
    # rate values are the global sequence 0..total-1: the window sums must
    # partition the arithmetic series exactly
    assert sum(r["sv"] for r in rows) == total * (total - 1) // 2
