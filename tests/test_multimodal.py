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
        assert r["mean_byte"] == pytest.approx(float(b.mean()))
        hist = np.bincount(b, minlength=256)
        p = hist[hist > 0] / b.size
        assert r["byte_entropy"] == pytest.approx(float(-(p * np.log2(p)).sum()))
        assert len(r["feature"]) == 8
        assert sum(r["feature"]) == pytest.approx(1.0)
    # 'aaaa': single byte value -> zero entropy, mean 97
    assert got[2]["byte_entropy"] == 0.0
    assert got[2]["mean_byte"] == 97.0
    # empty payload -> NULL features, zero bytes
    assert got[3]["n_bytes"] == 0 and got[3]["mean_byte"] is None


def test_decode_media_is_explicit_stub(spark, docs):
    with pytest.raises(NotImplementedError):
        decode_media(with_binary_payload(docs))


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 25), (2, 3), (3, 0)], "doc_id long, n_frames int")
    got = sorted(
        (r["doc_id"], r["frame_idx"]) for r in frame_sample_plan(df, every_k=10).collect()
    )
    assert got == [(1, 0), (1, 10), (1, 20), (2, 0), (3, 0)]
