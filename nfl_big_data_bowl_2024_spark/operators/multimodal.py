"""Multimodal column handling: opaque binary payloads + typed metadata.

The 100 TB training-data pipeline treats image/audio/video as opaque
``binary`` columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` kernels. The decode step itself is STUBBED here — the
container has no image/audio codecs — but everything Spark-side is real and
tested: schema, column plumbing, batch iteration, partition behavior.

Design rules for scale:
  - payloads never pass through Python row-at-a-time: mapInPandas receives
    Arrow record batches; numpy views the bytes zero-copy.
  - metadata lives in a STRUCT column so Catalyst prunes it independently of
    the payload (a metadata-only query never reads the bytes when the source
    is Parquet with column pruning).
  - byte-level stats that ARE expressible as built-ins (length, hashes,
    magic-number prefixes) stay JVM-side; Python is reserved for the decode
    boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Testdata adapter: UTF-8 bytes of a text column as the opaque payload
    (the testdata ships no real media; the byte-column plumbing is identical)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_stats(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """JVM-side byte stats: size, content hash, magic prefix. No Python."""
    return df.select(
        F.col(id_col),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
        F.upper(F.hex(F.substring(F.col(payload_col), 1, 4))).alias("magic_hex"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_byte_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", n_buckets: int = 8
) -> DataFrame:
    """mapInPandas feature extractor over binary payloads.

    Deterministic stand-in for a real media featurizer (CNN embedding /
    mel-spectrogram): per payload emits byte mean, byte-histogram entropy and
    an ``n_buckets``-bin byte-class histogram as the feature vector. The
    Arrow-batch shape, schema and partition behavior are exactly what a real
    decoder would use — swap ``_featurize`` for the codec call.
    """

    def _featurize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if b.size == 0:
                    out.append((int(doc_id), 0, None, None, None))
                    continue
                hist = np.bincount(b, minlength=256).astype(np.float64)
                p = hist[hist > 0] / b.size
                entropy = float(-(p * np.log2(p)).sum())
                buckets = hist.reshape(n_buckets, 256 // n_buckets).sum(axis=1) / b.size
                out.append(
                    (int(doc_id), int(b.size), float(b.mean()), entropy, buckets.tolist())
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "mean_byte", "byte_entropy", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(_featurize, FEATURE_SCHEMA)


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — real image/audio decode (PIL/libsndfile/ffmpeg) is unavailable
    in this container. The contract when codecs exist: mapInPandas batches
    payload bytes -> decoded arrays -> typed MEDIA_META + feature columns,
    exactly the extract_byte_features shape."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use extract_byte_features for the plumbing-equivalent path"
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
    every_k: int = 10,
) -> DataFrame:
    """Frame-sampling plan for video payloads: exploded (doc, frame_idx) rows
    for every k-th frame, JVM-side via sequence() — the decode of each
    sampled frame would then run through the mapInPandas boundary."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_k))
        ).alias("frame_idx"),
    )
