"""Similarity search over an embedding column (array<float>).

Dot products and norms run JVM-side via zip_with/aggregate in DOUBLE precision
(arrays are cast up front so results are bit-identical to a double-precision
oracle accumulating in the same element order).

  brute_force_topk    exact baseline: broadcast the query vector, score every
                      row, global top-k with deterministic tie-break.
  lsh_bucketed_pairs  scale path: sign-random-projection signatures bucket the
                      vectors; the candidate join is per-bucket instead of the
                      quadratic cross join; exact cosine re-ranks candidates.

At 100 TB the brute-force path is only for one-off queries (single broadcast +
one pass + a tree-reduced top-k); the LSH path is the ANN-index equivalent
(signatures are precomputable and bucketed joins co-locate candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a, b) -> Column:
    """Sequential left-to-right double dot product of two array columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_col(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_col(a, b) / (F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b)))


def brute_force_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every vector against the vector with id
    ``query_vec_id``. Cosine is rounded to 4dp BEFORE ranking so the ordering
    (and thus the returned set) is stable across engines; ties break on id."""
    v = df.select(
        id_col, "label", F.col(vec_col).cast("array<double>").alias("emb")
    )
    q = v.filter(F.col(id_col) == query_vec_id).select(F.col("emb").alias("qv"))
    scored = (
        v.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(cosine_col("emb", "qv"), 4).alias("cosine"),
        )
    )
    # orderBy+limit plans as TakeOrderedAndProject: each partition keeps its
    # local top-k, the driver merges k*partitions rows — no single-partition
    # global window, so this survives a 100x scale-up.
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _deterministic_plane(bit: int, dim: int) -> list[float]:
    """Pseudo-random hyperplane components from a fixed LCG — reproducible
    across sessions with no RNG state (Date/random are banned in this repo's
    workflow scripts and unnecessary here)."""
    vals = []
    x = bit * 2654435761 % (2**32)
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append(x / float(2**30) - 1.0)
    return vals


def lsh_bucketed_pairs(
    df: DataFrame,
    bands: int = 8,
    bits_per_band: int = 4,
    min_cosine: float = 0.7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH near-neighbor pairs with OR-amplification.

    Each band packs ``bits_per_band`` sign bits (bit = sign(<emb, plane>))
    into one small signature; two vectors are CANDIDATES if ANY band matches
    (OR over bands, AND within a band — same banding scheme as the MinHash
    path, operators/dedup.py:77-119). Candidates are de-duplicated, re-ranked
    by exact cosine, and filtered at ``min_cosine``.

    Recall at cosine c: with p = 1 - arccos(c)/pi per bit,
    1 - (1 - p^r)^b -> ~0.95 at c=0.7 for (b=8, r=4), vs ~3% for the old
    single 12-bit all-match signature. At 100 TB the per-band bucket join
    replaces the quadratic cross join; hot buckets split via AQE skew-join.
    """
    v = df.select(id_col, F.col(vec_col).cast("array<double>").alias("emb"))
    band_structs = []
    for b in range(bands):
        sig = F.lit(0)
        for r in range(bits_per_band):
            plane = F.array(
                *[F.lit(c) for c in _deterministic_plane(b * bits_per_band + r, dim)]
            )
            sig = sig + F.when(
                dot_col("emb", plane) > 0, F.shiftleft(F.lit(1), r)
            ).otherwise(F.lit(0))
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), sig.alias("band_sig"))
        )
    banded = v.select(
        id_col, "emb", F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col, "emb",
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.band_sig").alias("band_sig"),
    )
    a = banded.select(
        F.col(id_col).alias("vid_a"), F.col("emb").alias("emb_a"),
        "band_id", "band_sig",
    )
    b = banded.select(
        F.col(id_col).alias("vid_b"), F.col("emb").alias("emb_b"),
        "band_id", "band_sig",
    )
    candidates = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("vid_a") < F.col("vid_b"))
        .select("vid_a", "vid_b", "emb_a", "emb_b")
        .dropDuplicates(["vid_a", "vid_b"])
    )
    return (
        candidates.select(
            "vid_a",
            "vid_b",
            F.round(cosine_col("emb_a", "emb_b"), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
