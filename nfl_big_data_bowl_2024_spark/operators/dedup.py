"""Distributed document deduplication operators.

All shingling/hashing runs JVM-side (higher-order array functions + murmur3/
xxhash64) — no Python in the hot path. Shapes:

  exact         one shuffle on the text fingerprint (see plans.pipeline_ops)
  n-gram Jaccard  shingle -> explode -> self-join on shingle -> overlap counts
  MinHash+LSH   shingle -> 32 permuted min-hashes -> banded bucket join ->
                exact-Jaccard verification of candidates only
  SimHash       token hashes -> 64 signed bit-sums -> packed 64-bit signature
                + 16-bit bands for bucketed near-dup search

Scale notes: the Jaccard self-join is quadratic per shared shingle — safe only
after stopword-shingle removal or as the *verify* stage on LSH candidates; the
MinHash path is the 100 TB default (band buckets bound the join fan-out, AQE
skew-join splits hot buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """Distinct character n-gram shingles, exploded to (id, sh) rows.

    Positions are generated JVM-side with sequence/transform; short texts
    (< n chars) contribute their whole text as a single shingle.
    """
    upper = F.greatest(F.length(text_col) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), upper), lambda g: F.col(text_col).substr(g, F.lit(n))
    )
    return df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold.
    """
    sh = char_shingles(df, id_col, text_col, n)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    overlap = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        overlap.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, num_perm: int = 32
) -> DataFrame:
    """MinHash signature per document: num_perm seeded murmur3 min-hashes over
    the shingle set, computed in ONE hash aggregate (num_perm conditional mins,
    map-side partial agg collapses before the shuffle)."""
    sh = char_shingles(df, id_col, text_col, n)
    mins = [F.min(F.hash("sh", F.lit(p))).alias(f"mh{p}") for p in range(num_perm)]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    num_perm: int = 32,
    bands: int = 8,
    verify_threshold: float = 0.2,
) -> DataFrame:
    """Banded-LSH candidate pairs + exact-Jaccard verification.

    bands x rows_per_band = num_perm; two docs are candidates if any band of
    their signatures matches exactly. Candidates (a tiny fraction of all
    pairs) are then verified with exact Jaccard — computed only over
    candidate documents' shingles, which is what keeps this linear-ish at
    100 TB.
    Returns (doc_a, doc_b, est_jaccard, jaccard).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_perm)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.hash(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band_id").alias("band_id"), F.col("bb.band_hash").alias("band_hash")
    )
    left = banded.select(F.col(id_col).alias("doc_a"), "band_id", "band_hash")
    right = banded.select(F.col(id_col).alias("doc_b"), "band_id", "band_hash")
    candidates = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Estimated Jaccard = fraction of agreeing permutations.
    sa = sig.select(F.col(id_col).alias("doc_a"), *[F.col(f"mh{p}").alias(f"a{p}") for p in range(num_perm)])
    sb = sig.select(F.col(id_col).alias("doc_b"), *[F.col(f"mh{p}").alias(f"b{p}") for p in range(num_perm)])
    agree = sum(
        F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0) for p in range(num_perm)
    )
    est = candidates.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", (agree / F.lit(float(num_perm))).alias("est_jaccard")
    )

    # Exact verification restricted to candidate docs only.
    cand_docs = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    verified = ngram_jaccard_pairs(
        df.join(F.broadcast(cand_docs), id_col, "left_semi"),
        id_col,
        text_col,
        n,
        threshold=verify_threshold,
    )
    return (
        est.join(verified, ["doc_a", "doc_b"])
        .select("doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard"), "jaccard")
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document over whitespace tokens (xxhash64), plus four
    16-bit band columns for bucketed near-dup joins (two docs within Hamming
    distance 3 share >=1 identical band by pigeonhole at 4 bands)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit{j}")
        for j in range(64)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    simhash = None
    for j in range(64):
        term = F.when(
            F.col(f"bit{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    sig = sums.select(F.col(id_col), simhash.alias("simhash"))
    for b in range(4):
        sig = sig.withColumn(
            f"band{b}",
            F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return sig
