"""Multimodal binary-column plumbing tests (operators/multimodal.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from nfl_big_data_bowl_2024_spark.operators.multimodal import (
    binary_stats,
    decode_media,
    extract_byte_features,
    frame_sample_plan,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "aaaa"), (3, ""), (4, "spark éé")],
        "doc_id long, text string",
    )


def test_binary_stats_jvm_side(spark, docs):
    out = {r["doc_id"]: r for r in binary_stats(with_binary_payload(docs), "doc_id").collect()}
    assert out[1]["n_bytes"] == 11
    assert out[4]["n_bytes"] == 10  # 'spark ' (6) + two 2-byte UTF-8 chars
    assert out[2]["magic_hex"] == "61616161"  # 'aaaa'
    import hashlib

    assert out[1]["content_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_extract_byte_features_matches_python_oracle(spark, docs):
    got = {r["doc_id"]: r for r in extract_byte_features(with_binary_payload(docs)).collect()}
    for doc_id, text in [(1, "hello world"), (2, "aaaa"), (4, "spark éé")]:
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        r = got[doc_id]
        assert r["n_bytes"] == b.size
        assert r["mean_byte"] == pytest.approx(float(b.mean()), abs=1e-6)
        hist = np.bincount(b, minlength=256)
        p = hist[hist > 0] / b.size
        assert r["byte_entropy"] == pytest.approx(
            float(-(p * np.log2(p)).sum()), abs=2e-4
        )
        fk = [r[f"f{k}"] for k in range(8)]
        assert sum(fk) == pytest.approx(1.0, abs=1e-5)
    # 'aaaa': single byte value -> zero entropy, mean 97
    assert got[2]["byte_entropy"] == 0.0
    assert got[2]["mean_byte"] == 97.0
    # empty payload -> NULL features, zero bytes
    assert got[3]["n_bytes"] == 0 and got[3]["mean_byte"] is None


def test_byte_features_corpus_is_ascii_and_log2_margins_safe():
    """The mm_byte_features oracle treats characters as bytes (per-char
    unnest + ascii()), valid only for a pure-ASCII corpus — assert that at
    both driver scales.  Also assert every half-up-rounded micro term
    (entropy term, mean, bucket fraction) on the real corpus sits away from
    the .5 boundary by >= 1e-6 in units, so the ~1-ulp log2 / division
    difference between numpy and DuckDB libm cannot flip a floor (the
    ADVICE.md flake class)."""
    import duckdb
    import math

    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        bad = con.sql(
            f"SELECT count(*) FROM '{path}' WHERE len(text) != "
            "octet_length(encode(text)) OR len(text) = 0"
        ).fetchone()[0]
        assert bad == 0, f"non-ASCII or empty text in {path}"
    # mean_byte and the bucket fractions use only IEEE-exactly-rounded ops
    # (+ * /) on exact integers in one fixed order, so both engines produce
    # BIT-IDENTICAL doubles — even an exact x.5 floors deterministically.
    # The only cross-libm exposure is log2 in the entropy terms.  For
    # power-of-two p, log2 is exact (every libm returns the integer); for
    # the rest, assert a +/-2-ulp perturbation of log2's result cannot flip
    # the half-up floor of the micro term.
    texts = [t for (t,) in con.sql(
        "SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()]
    checked = 0
    for t in texts:
        b = np.frombuffer(t.encode(), dtype=np.uint8)
        n = int(b.size)
        hist = np.bincount(b, minlength=256)
        for c in hist[hist > 0]:
            p = int(c) * 1.0 / n
            lg = math.log2(p)
            if lg == int(lg) and p == 2.0 ** int(lg):
                continue  # exact power of two: log2 exact in every libm
            floors = set()
            for nudged in (
                lg,
                np.nextafter(np.nextafter(lg, -np.inf), -np.inf),
                np.nextafter(np.nextafter(lg, np.inf), np.inf),
            ):
                floors.add(math.floor(-(p * float(nudged)) * 1000000 + 0.5))
            assert len(floors) == 1, (
                f"entropy term p={p} (c={c}, n={n}) flips its floor under a "
                f"2-ulp log2 perturbation: {floors}"
            )
            checked += 1
    assert checked > 1000  # the corpus genuinely exercises inexact log2


def test_codec_roundtrip_all_variants():
    """encode->decode returns the exact pixel array for every decoder
    branch: 24bpp bottom-up (padded rows: w=15 gives stride 48), 32bpp
    top-down, and PPM P6 (with a header comment)."""
    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        _decode_bmp,
        _decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    h, w = 5, 15
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    rgb = np.stack(
        [(3 * x + 5 * y) % 256, (x + 7 * y) % 256, (11 * x + y) % 256], axis=-1
    ).astype(np.uint8)
    assert (_decode_bmp(encode_bmp(rgb, bpp=24)) == rgb).all()
    assert (_decode_bmp(encode_bmp(rgb, bpp=32, top_down=True)) == rgb).all()
    assert (_decode_ppm(encode_ppm(rgb)) == rgb).all()
    commented = b"P6\n# a comment\n15 5\n255\n" + rgb.tobytes()
    assert (_decode_ppm(commented) == rgb).all()


def test_decode_media_errors_are_rows(spark):
    """Corrupt/truncated/unknown payloads must come back as status rows,
    never exceptions."""
    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        encode_bmp,
        synth_image_rgb,
    )

    good = encode_bmp(synth_image_rgb(4))
    rows = [
        (1, bytearray(b"ZZ garbage")),
        (2, bytearray(good[:30])),  # truncated BMP header
        (3, bytearray(b"P6\n16 8\n255\n" + b"\x00" * 10)),  # truncated PPM
        (4, bytearray(good)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["status"] for r in decode_media(df).collect()}
    assert got == {
        1: "error_unknown_format",
        2: "error_corrupt",
        3: "error_corrupt",
        4: "ok",
    }


def test_decode_media_matches_closed_form(spark):
    """The synthetic-payload pipeline decodes back to the closed-form
    pixel model for every variant stripe (BMP 24/32, PPM, corrupt)."""
    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        synth_image_rgb,
        synth_payload_df,
    )

    ids = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in decode_media(synth_payload_df(ids)).collect()
    }
    for i in range(16):
        r = got[i]
        if i % 7 == 3:
            assert r["status"] == "error_unknown_format"
            assert r["mean_r"] is None and r["width"] is None
            continue
        rgb = synth_image_rgb(i)
        assert r["status"] == "ok"
        assert r["media_type"] == ("bmp" if i % 2 == 0 else "ppm")
        assert (r["width"], r["height"]) == (16, 8)
        assert r["px00_r"] == int(rgb[0, 0, 0])
        assert r["mean_r"] == float(rgb[..., 0].mean())
        assert r["mean_g"] == float(rgb[..., 1].mean())
        assert r["mean_b"] == float(rgb[..., 2].mean())


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 25), (2, 3), (3, 0)], "doc_id long, n_frames int")
    got = sorted(
        (r["doc_id"], r["frame_idx"]) for r in frame_sample_plan(df, every_k=10).collect()
    )
    assert got == [(1, 0), (1, 10), (1, 20), (2, 0), (3, 0)]


def test_video_stream_sampled_decode(spark):
    """Sampled-frame decode over a concatenated-P6 stream: only requested
    indices come back, values match the closed-form frame model, and a
    mid-stream corruption turns the remaining wanted frames into error
    rows (earlier frames still decode)."""
    from pyspark.sql import functions as F

    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        synth_video_df,
        synth_video_payload,
        synth_video_rgb,
        video_frame_count,
        video_frame_features,
    )

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    sampled = synth_video_df(ids).withColumn(
        "sample_idxs", F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2))
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in video_frame_features(sampled).collect()
    }
    want_keys = {
        (d, f)
        for d in range(8)
        for f in range(0, video_frame_count(d), 2)
    }
    assert set(got) == want_keys
    for (d, f), r in got.items():
        rgb = synth_video_rgb(d, f)
        assert r["status"] == "ok"
        assert r["px00_r"] == int(rgb[0, 0, 0])
        assert r["mean_g"] == float(rgb[..., 1].mean())

    # corrupt the stream after the first frame: frame 0 decodes, the
    # later sampled frames become error rows
    good = synth_video_payload(4)  # 7 frames? no: 3 + 4%4 = 3 frames
    one_frame = len(good) // video_frame_count(4)
    broken = good[: one_frame + 4]  # frame 0 intact, frame 1 truncated
    df = spark.createDataFrame(
        [(4, bytearray(broken), [0, 2])],
        "doc_id long, payload binary, sample_idxs array<int>",
    )
    rows = {r["frame_idx"]: r["status"] for r in video_frame_features(df).collect()}
    assert rows == {0: "ok", 2: "error_corrupt"}

    # duplicate wanted index: deduped, one row per distinct frame with the
    # RIGHT frame's features (before the fix, the second occurrence of 1
    # silently emitted frame 2's features labeled frame_idx=1, status ok)
    dup = spark.createDataFrame(
        [(5, bytearray(synth_video_payload(5)), [1, 1, 2])],
        "doc_id long, payload binary, sample_idxs array<int>",
    )
    dup_rows = {
        r["frame_idx"]: r for r in video_frame_features(dup).collect()
    }
    assert sorted(dup_rows) == [1, 2]
    for f in (1, 2):
        rgb = synth_video_rgb(5, f)
        assert dup_rows[f]["status"] == "ok"
        assert dup_rows[f]["px00_r"] == int(rgb[0, 0, 0])
        assert dup_rows[f]["mean_b"] == float(rgb[..., 2].mean())


def test_wav_roundtrip_and_chunk_walking():
    """encode->decode returns the exact samples; the RIFF walker must
    tolerate an extra chunk before data and word-aligned odd-size chunks."""
    import struct

    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        _decode_wav,
        encode_wav,
        synth_audio_samples,
    )

    s = synth_audio_samples(11)
    got, rate = _decode_wav(encode_wav(s))
    assert rate == 8000 and (got == s).all()

    # splice an odd-sized LIST chunk between fmt and data
    b = encode_wav(s)
    fmt_end = b.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # word pad
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got2, _ = _decode_wav(spliced)
    assert (got2 == s).all()


def test_resize_box_means_match_numpy(spark):
    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        resize_features,
        synth_image_rgb,
        synth_payload_df,
    )

    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in resize_features(synth_payload_df(ids), factor=2).collect()
    }
    for i in range(10):
        r = got[i]
        if i % 7 == 3:
            assert r["status"] == "error_undecodable" and r["out_w"] is None
            continue
        rgb = synth_image_rgb(i).astype(np.float64)
        boxes = rgb.reshape(4, 2, 8, 2, 3).mean(axis=(1, 3))
        assert (r["out_w"], r["out_h"]) == (8, 4)
        assert r["px00_r"] == float(boxes[0, 0, 0])
        assert r["pxlast_b"] == float(boxes[-1, -1, 2])
        assert r["mean_r"] == float(boxes[..., 0].mean())


def test_audio_features_error_rows(spark):
    from nfl_big_data_bowl_2024_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxxNOPE")), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["status"] for r in audio_features(df).collect()}
    assert got == {1: "error_undecodable", 2: "error_undecodable"}


def test_codec_roundtrip_property():
    """Property test: encode->decode is the identity for arbitrary image
    shapes/contents (BMP 24/32, PPM) and arbitrary int16 waveforms (WAV).
    Deterministic content derived per example — exercises odd widths
    (row padding), 1-pixel edges, and extreme sample values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nfl_big_data_bowl_2024_spark.operators.multimodal import (
        _decode_bmp,
        _decode_ppm,
        _decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 21),
        h=st.integers(1, 13),
        seed=st.integers(0, 10_000),
    )
    def check_images(w, h, seed):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        rgb = np.stack(
            [
                (seed * 7 + 3 * x + 5 * y) % 256,
                (seed * 11 + x + 2 * y) % 256,
                (seed + 13 * x + y) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        assert (_decode_bmp(encode_bmp(rgb, bpp=24)) == rgb).all()
        assert (_decode_bmp(encode_bmp(rgb, bpp=24, top_down=True)) == rgb).all()
        assert (_decode_bmp(encode_bmp(rgb, bpp=32)) == rgb).all()
        assert (_decode_ppm(encode_ppm(rgb)) == rgb).all()

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 200),
        seed=st.integers(0, 10_000),
        amp=st.sampled_from([1, 1000, 32767]),
    )
    def check_audio(n, seed, amp):
        i = np.arange(n, dtype=np.int64)
        s = (((seed * 31 + 17 * i) % (2 * amp + 1)) - amp).astype(np.int16)
        got, rate = _decode_wav(encode_wav(s))
        assert rate == 8000 and got.size == n and (got == s).all()

    check_images()
    check_audio()
