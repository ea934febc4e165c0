"""Training-data pipeline queries over ``documents`` / ``embeddings``.

These extend the engine beyond the reference's own operators with the
operations a 100 TB training-data pipeline needs: dedup (exact, n-gram
Jaccard, MinHash+LSH, SimHash), similarity search (brute-force cosine top-k
baseline + LSH-bucketed scale path), and text analysis (language ID, quality
scoring, token counting, fingerprinting).

SQL-expressible ops carry a DuckDB oracle; the hash-seeded ones (MinHash /
SimHash / random-hyperplane LSH) are Spark-only and registered with
``oracle=None`` (driver records a rows-only check) but are cross-validated in
tests/ against exact Jaccard / exact cosine instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    simhash_signatures,
)
from ..operators.similarity import brute_force_topk, cosine_col
from ..operators.prefix import banded_running_sum
from ..sources.readers import read_testdata_table as _t
from .registry import register


def _content_fingerprint():
    """Canonical document fingerprint: md5 of the lower-trimmed text.

    Single definition shared by every exact-dedup / incremental-dedup /
    corpus-clean query; the oracle SQL mirrors it literally as
    ``md5(lower(trim(text)))``. Change both together.
    """
    return F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))


def _n_ws_tokens():
    """Whitespace token count via the space-count identity (spaces + 1) —
    the oracle-side form is ``length(text) - length(replace(text,' ','')) +
    1``. Shared by every query that pairs a token count with that SQL
    shape; equals ``size(split(text,' '))`` on this corpus (no
    leading/trailing/double spaces)."""
    return (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )


def _mean_token_len():
    """Per-doc quality score: mean token length — an exact integer ratio,
    so Spark and DuckDB agree bit-for-bit. Shared by the z-score bucketer
    and the classifier's x1 feature."""
    return F.length("text") * 1.0 / F.size(F.split("text", " "))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "txt_token_quality",
    """
    SELECT doc_id, lang,
           length(text) AS n_chars_actual,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
           round((length(text) - length(replace(text, ' ', '')) + 1) * 1.0
                 / (length(text) + 1), 4) AS token_density,
           CAST(length(text) - length(replace(text, 'the', ''))
                AS BIGINT) // 3 AS stopword_hits,
           CASE WHEN length(text) BETWEEN 100 AND 5000
                 AND length(text) - length(replace(text, ' ', '')) + 1 >= 10
                THEN 'keep' ELSE 'drop' END AS quality_gate
    FROM documents
    """,
    doc="Token counting + quality scoring (length/stopword heuristics) — pure JVM "
    "string expressions, no UDF; the keep/drop gate is the standard corpus filter shape.",
)
def txt_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    stop_hits = (
        (n_chars - F.length(F.replace(F.col("text"), F.lit("the"), F.lit("")))) / 3
    ).cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_chars.cast("long").alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_tokens * 1.0 / (n_chars + 1), 4).alias("token_density"),
        stop_hits.alias("stopword_hits"),
        F.when(n_chars.between(100, 5000) & (n_tokens >= 10), "keep")
        .otherwise("drop")
        .alias("quality_gate"),
    )


@register(
    "txt_lang_id",
    """
    WITH scores AS (
        SELECT doc_id, lang,
               (length(text) - length(replace(text, ' the ', ''))) // 5 AS en_score,
               (length(text) - length(replace(text, ' data ', ''))) // 6 AS data_score,
               (length(text) - length(replace(text, ' spark ', ''))) // 7 AS spark_score
        FROM documents
    )
    SELECT doc_id, lang, en_score, data_score, spark_score,
           CASE WHEN en_score >= data_score AND en_score >= spark_score THEN 'marker_the'
                WHEN data_score >= spark_score THEN 'marker_data'
                ELSE 'marker_spark' END AS dominant_marker
    FROM scores
    """,
    doc="Language-ID-style n-gram marker scoring with argmax classification "
    "(deterministic tie-break) — the distributed lang-ID shape; real marker tables "
    "drop in as a broadcast dim.",
)
def txt_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")

    def marker(m: str):
        return (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(m), F.lit(""))))
            / len(m)
        ).cast("long")

    scored = d.select(
        "doc_id",
        "lang",
        marker(" the ").alias("en_score"),
        marker(" data ").alias("data_score"),
        marker(" spark ").alias("spark_score"),
    )
    dominant = (
        F.when(
            (F.col("en_score") >= F.col("data_score"))
            & (F.col("en_score") >= F.col("spark_score")),
            "marker_the",
        )
        .when(F.col("data_score") >= F.col("spark_score"), "marker_data")
        .otherwise("marker_spark")
    )
    return scored.withColumn("dominant_marker", dominant)


@register(
    "txt_fingerprint_exact_dedup",
    """
    SELECT md5(lower(trim(text))) AS fingerprint,
           min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
    doc="Document fingerprinting + exact dedup: hash-groupBy keeping the smallest id "
    "as canonical. At 100 TB this is one shuffle on the fingerprint.",
)
def txt_fingerprint_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No pre-repartition here: md5 is cheaper than a shuffle of the raw text,
    # and the testdata parquet is single-row-group (serial scan either way).
    # At 100 TB the scan itself arrives in thousands of splits.
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        _content_fingerprint().alias("fingerprint")
    ).agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))


@register(
    "txt_regex_extract",
    """
    SELECT doc_id,
           regexp_extract(text, 's[a-z]*k')                 AS first_sk_word,
           len(regexp_extract_all(text, '\\bthe\\b'))       AS n_the,
           len(regexp_extract_all(text, '[a-z]+'))          AS n_words,
           CAST(regexp_matches(text, 'spark') AS INT)       AS has_spark
    FROM documents
    """,
    doc="Regex extraction/counting over documents (first-match extract, "
    "word-boundary count, token count, predicate) — JVM-side regexp_* "
    "expressions; patterns stay in the RE2-compatible subset so the same "
    "query text runs on either engine.",
)
def txt_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "s[a-z]*k", 0).alias("first_sk_word"),
        F.regexp_count("text", F.lit(r"\bthe\b")).cast("long").alias("n_the"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("long").alias("n_words"),
        F.regexp_like("text", F.lit("spark")).cast("int").alias("has_spark"),
    )


@register(
    "json_build_extract",
    """
    SELECT doc_id,
           json_extract_string(to_json(struct_pack(
               doc_id := doc_id, lang := lang, n := n_chars)), '$.lang') AS j_lang,
           CAST(json_extract(to_json(struct_pack(
               doc_id := doc_id, n := n_chars)), '$.n') AS BIGINT)       AS j_n
    FROM documents
    """,
    doc="JSON build + path extraction: serialize a struct column to JSON "
    "(to_json) and pull typed values back out (get_json_object). Compared on "
    "the EXTRACTED values — the serialized text itself differs across "
    "engines (key order/whitespace) and is not a stable contract.",
)
def json_build_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    j3 = F.to_json(F.struct(F.col("doc_id"), F.col("lang"), F.col("n_chars").alias("n")))
    j2 = F.to_json(F.struct(F.col("doc_id"), F.col("n_chars").alias("n")))
    return d.select(
        "doc_id",
        F.get_json_object(j3, "$.lang").alias("j_lang"),
        F.get_json_object(j2, "$.n").cast("long").alias("j_n"),
    )


@register(
    "arr_top_components",
    """
    SELECT vec_id,
           list_sort(CAST(embedding AS DOUBLE[]), 'DESC')[1] AS c1,
           list_sort(CAST(embedding AS DOUBLE[]), 'DESC')[2] AS c2,
           CAST(list_position(CAST(embedding AS DOUBLE[]),
                list_max(CAST(embedding AS DOUBLE[]))) AS BIGINT) AS argmax_pos
    FROM embeddings
    """,
    doc="Array algebra over the embedding column: per-vector top-2 "
    "components (sort_array desc + element_at) and 1-based argmax position "
    "(array_position of array_max) — pure JVM array expressions, no "
    "explode/shuffle, exact float comparisons (no arithmetic).",
)
def arr_top_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    srt = F.sort_array(arr, asc=False)
    return e.select(
        "vec_id",
        F.element_at(srt, 1).alias("c1"),
        F.element_at(srt, 2).alias("c2"),
        F.array_position(arr, F.array_max(arr)).cast("long").alias("argmax_pos"),
    )


@register(
    "emb_dimension_stats",
    """
    SELECT i AS dim_idx,
           round(avg(embedding[i]), 4) + 0.0 AS mean_v,
           round(stddev(embedding[i]), 4)    AS std_v,
           min(embedding[i])                 AS min_v,
           max(embedding[i])                 AS max_v
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    GROUP BY i
    """,
    doc="Dimension-wise embedding statistics (posexplode -> per-dimension "
    "mean/std/min/max): the feature-normalization pass of a training "
    "pipeline. One Expand-style generate + one hash aggregate keyed on the "
    "64 dimension indices — output is O(dim), so the final agg is a "
    "broadcast-sized normalization table no matter the corpus size. "
    "`+ 0.0` on both sides canonicalizes IEEE negative zero: zero-centered "
    "dims round to -0.0 in DuckDB but 0.0 in Spark (repr-level hash "
    "mismatch at sf0.1 even though -0.0 == 0.0 — the round-7 scale find).",
)
def emb_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy((F.col("pos") + 1).cast("long").alias("dim_idx")).agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_v"),
        F.round(F.stddev("v"), 4).alias("std_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@register(
    "txt_winnow_fingerprint",
    """
    WITH h AS (
        SELECT doc_id,
               [md5(substr(text, i, 8))
                FOR i IN range(1, greatest(length(text) - 6, 2))] AS hashes
        FROM documents
    ), w AS (
        SELECT doc_id, hashes,
               [list_min(hashes[j:j+3])
                FOR j IN range(1, greatest(len(hashes) - 2, 2))] AS fps
        FROM h
    )
    SELECT doc_id,
           len(hashes) AS n_kgrams,
           len(list_distinct(fps)) AS n_fingerprints,
           list_min(fps) AS min_fp
    FROM w
    """,
    doc="Document fingerprinting by winnowing (Schleimer et al. 2003): rolling "
    "k-gram hashes (k=8), min-hash per sliding window (w=4), distinct minima are "
    "the document's fingerprints. All JVM-side higher-order array functions — no "
    "UDF; the only exchange is the _spread raw-text repartition that buys "
    "full-cluster parallelism for the CPU-heavy hashing (on a real 100 TB scan "
    "the splits already arrive spread, and the pass is map-only). Fingerprints "
    "feed the same inverted-index bucket join as MinHash (operators/dedup.py). "
    "The reference has no fingerprinting; training-data-pipeline extension.",
)
def txt_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, W = 8, 4
    from ..operators.dedup import _spread

    # ~len(text) md5 calls per document: CPU-heavy enough that the raw-text
    # shuffle in _spread pays for itself (unlike the single-md5 exact-dedup
    # path). Measured 2.9s -> 0.4s at sf0.1 on local[32].
    d = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    n = F.length("text")
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (K - 1), F.lit(1))),
        lambda i: F.md5(F.substr(F.col("text"), i, F.lit(K)).cast("binary")),
    )
    with_h = d.select("doc_id", hashes.alias("hashes"))
    # least(element_at...) instead of array_min(slice(...)): no per-window
    # array allocation — measured 2x on the window stage. Indices clamp to
    # the array end so short documents (< W hashes) read duplicated elements
    # — same minimum as the truncated-slice semantics.
    m = F.size("hashes")
    fps = F.transform(
        F.sequence(F.lit(1), F.greatest(m - (W - 1), F.lit(1))),
        lambda j: F.least(
            *[F.element_at(F.col("hashes"), F.least(j + k, m)) for k in range(W)]
        ),
    )
    return with_h.select(
        "doc_id",
        F.size("hashes").cast("long").alias("n_kgrams"),
        F.size(F.array_distinct(fps)).cast("long").alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# Dedup: n-gram Jaccard (oracle-checked), MinHash+LSH / SimHash (rows-only)
# ---------------------------------------------------------------------------

# The registered query runs at the PRODUCTION operating point of the guard
# (max_df=256), mirrored EXACTLY in the oracle, so both engines compute
# Jaccard over the identical filtered shingle space. Why the guard must be
# on by default: the per-shingle self-join costs sum(df^2) pairs, and at
# the generated sf1 point (50k docs, 130k distinct shingles, avg df 104)
# the UNguarded join generates 2.8e9 candidate pairs (~99 s on local[32]);
# df<=256 keeps near-dup discrimination (true near-dups share RARE
# shingles) while cutting the pair volume ~50x. The unguarded exact form
# stays available via max_df=None and is what the MinHash subset/equality
# tests compare against.
_JACCARD_ORACLE = """
WITH shingles AS (
    SELECT doc_id, unnest(list_distinct([substr(text, g, 8)
           FOR g IN range(1, greatest(length(text) - 6, 2))])) AS sh
    FROM documents
),
freq AS (SELECT sh, count(*) AS d FROM shingles GROUP BY sh),
kept AS (
    SELECT s.doc_id, s.sh FROM shingles s JOIN freq USING (sh)
    WHERE freq.d <= 256
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
pair_overlap AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4) AS jaccard
FROM pair_overlap
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.2
"""


@register(
    "dedup_ngram_jaccard",
    _JACCARD_ORACLE,
    doc="Near-dup detection via exact character-8-gram Jaccard: shingle -> explode -> "
    "self-join on shingle -> overlap counts. Runs at the max_df=256 hot-shingle "
    "operating point (oracle applies the identical filter); the guard is what "
    "bounds the self-join's sum(df^2) pair volume at corpus scale.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=8, threshold=0.2, max_df=256)


_MINHASH_DUP_ORACLE = """
WITH shingles AS (
    SELECT doc_id, unnest(list_distinct([substr(text, g, 8)
           FOR g IN range(1, greatest(length(text) - 6, 2))])) AS sh
    FROM documents
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
pair_overlap AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common), 4) AS jaccard
FROM pair_overlap
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.9
"""


@register(
    "dedup_minhash_exact_dups",
    _MINHASH_DUP_ORACLE,
    doc="MinHash+LSH at the DEDUP operating point, oracle-checked: at "
    "verify threshold 0.9 with 16 bands x 2 rows the per-pair miss "
    "probability for a J>=0.9 pair is (1-J^2)^16 <= 3.3e-12, so the "
    "LSH output is (statistically) EQUAL to the exact-Jaccard answer and "
    "DuckDB can verify it — the one operating point where a hash-seeded "
    "sketch pipeline admits a deterministic oracle. The estimate column "
    "is excluded from the output (it IS hash-dependent); the exact "
    "verified jaccard is not. The general-threshold variant "
    "(dedup_minhash_lsh, 0.2) stays rows-only: partial recall at low "
    "similarity is the documented LSH tradeoff.",
)
def dedup_minhash_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, "doc_id", "text", n=8, num_perm=32, bands=16, verify_threshold=0.9
    ).select("doc_a", "doc_b", "jaccard")


@register(
    "dedup_prefix_filter_jaccard",
    """
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS d FROM toks GROUP BY tok),
    kept AS (
        SELECT t.doc_id, t.tok FROM toks t JOIN freq USING (tok)
        WHERE freq.d <= 256
    ),
    counts AS (SELECT doc_id, count(*) AS n_tok FROM kept GROUP BY doc_id),
    pair_overlap AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           floor(n_common * 1.0 / (ca.n_tok + cb.n_tok - n_common)
                 * 10000 + 0.5) / 10000.0 AS jaccard
    FROM pair_overlap
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_common * 1.0 / (ca.n_tok + cb.n_tok - n_common) >= 0.5
    """,
    doc="Exact word-token Jaccard join via PPJoin-style PREFIX FILTERING "
    "(operators/dedup.py:prefix_filter_jaccard_pairs): each document "
    "explodes only its n - ceil(t*n) + 1 RAREST tokens (global "
    "document-frequency order) as join keys — provably lossless for "
    "Jaccard >= t, and the candidate join touches only low-df tokens, so "
    "its fan-out stays bounded where a full inverted index pays "
    "sum(df^2). The third exact-dedup scale path next to the hot-shingle "
    "guard and MinHash+LSH: deterministic (no hashing), so the ORACLE "
    "can check it with a plain inverted-index join — same semantics, "
    "different algorithm, which is exactly what the gate is for.",
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        d, "doc_id", "text", threshold=0.5, max_df=256
    )


@register(
    "dedup_containment_pairs",
    """
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS d FROM toks GROUP BY tok),
    kept AS (
        SELECT t.doc_id, t.tok FROM toks t JOIN freq USING (tok)
        WHERE freq.d <= 256
    ),
    counts AS (SELECT doc_id, count(*) AS n_tok FROM kept GROUP BY doc_id),
    pair_overlap AS (
        SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super, count(*) AS n_common
        FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_sub, doc_super,
           CAST((20000 * n_common + ca.n_tok) // (2 * ca.n_tok)
                AS BIGINT) / 10000.0 AS containment
    FROM pair_overlap
    JOIN counts ca ON ca.doc_id = doc_sub
    WHERE 10 * n_common >= 9 * ca.n_tok
    """,
    doc="DIRECTIONAL near-dup detection by set containment |A&B| / |A| >= "
    "0.9 — the asymmetric relation Jaccard misses: a short document "
    "quoted or templated inside a long one scores low symmetric Jaccard "
    "but high containment, the boilerplate/quotation case a training-"
    "corpus curator actually prunes. Same filtered word-token space and "
    "df<=256 hot-token guard as the Jaccard paths (the guard bounds the "
    "inverted-index join's sum(df^2)); the threshold test and 4dp output "
    "are integer cross-multiplication / (2A+B) div (2B) — no float "
    "ratio. Emits (doc_sub, doc_super) ordered pairs, BOTH directions "
    "when two docs mutually contain each other.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    rare = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df_tok"))
        .filter(F.col("df_tok") <= 256)
        .select("tok")
    )
    kept = toks.join(rare, "tok", "left_semi")
    counts = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = kept.select(F.col("doc_id").alias("doc_sub"), "tok")
    b = kept.select(F.col("doc_id").alias("doc_super"), "tok")
    overlap = (
        a.join(b, "tok")
        .filter(F.col("doc_sub") != F.col("doc_super"))
        .groupBy("doc_sub", "doc_super")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_sub"), "n_tok")
    return (
        overlap.join(F.broadcast(ca), "doc_sub")
        .filter(10 * F.col("n_common") >= 9 * F.col("n_tok"))
        .select(
            "doc_sub",
            "doc_super",
            (
                F.expr(
                    "CAST((20000 * n_common + n_tok) div (2 * n_tok) AS BIGINT)"
                )
                / 10000.0
            ).alias("containment"),
        )
    )


@register(
    "dedup_minhash_lsh",
    None,
    doc="MinHash (32 perms) + banded LSH (8 bands x 4 rows) candidate pairs with exact "
    "Jaccard verification. Hash-seeded, so Spark-only; tests cross-check the surviving "
    "pairs against dedup_ngram_jaccard's exact answer.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, "doc_id", "text", n=8, num_perm=32, bands=8, verify_threshold=0.2
    )


@register(
    "dedup_simhash",
    None,
    doc="64-bit SimHash signatures + banded near-dup buckets (4 x 16-bit bands). "
    "Spark-only (xxhash64-seeded).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash_signatures(d, "doc_id", "text")


@register(
    "dedup_simhash_identical",
    """
    WITH norm AS (
        SELECT doc_id,
               list_sort(list_distinct(string_split(text, ' '))) AS toks
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM norm a JOIN norm b ON a.toks = b.toks AND a.doc_id < b.doc_id
    """,
    doc="SimHash as the BLOCKING step with exact verification — the "
    "bucket-then-verify shape every sketch dedup path here uses. The "
    "64-bit signature is a pure function of the DISTINCT TOKEN SET, so "
    "every identical-token-set pair shares a signature and the "
    "signature join loses nothing; but simhash bits are majority votes, "
    "so NEAR-identical token sets also collide (measured: 439 of 36045 "
    "sf0.1 candidate pairs differ in a few tokens yet share all 64 "
    "bits — the round-7 scale find). Candidates are therefore verified "
    "on an md5 fingerprint of the sorted distinct token list (32 chars "
    "carried through the join instead of the full token array). DuckDB "
    "computes the identical-token-set pairs directly. The banded "
    "near-dup buckets (dedup_simhash) stay rows-only: Hamming-near "
    "pairs have no engine-independent definition.",
)
def dedup_simhash_identical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok_fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
        ).cast("binary")
    )
    sig = simhash_signatures(d, "doc_id", "text").select("doc_id", "simhash")
    sig = sig.join(d.select("doc_id", tok_fp.alias("tok_fp")), "doc_id")
    a = sig.select(
        F.col("doc_id").alias("doc_a"), "simhash", F.col("tok_fp").alias("fp_a")
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), "simhash", F.col("tok_fp").alias("fp_b")
    )
    return (
        a.join(b, "simhash")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("fp_a") == F.col("fp_b")))
        .select("doc_a", "doc_b")
    )


@register(
    "pipeline_curation_funnel",
    """
    WITH base AS (
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               (length(text) BETWEEN 100 AND 5000
                AND length(text) - length(replace(text, ' ', '')) + 1 >= 10)
                   AS gated,
               md5(lower(trim(text))) AS fp,
               CASE WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'cc000000'
                    THEN 'train'
                    WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'e6000000'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    canon AS (
        SELECT *,
               (gated AND doc_id = min(CASE WHEN gated THEN doc_id END)
                              OVER (PARTITION BY fp)) AS is_canon
        FROM base
    )
    SELECT 0 AS stage_ord, 'raw' AS stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM canon
    UNION ALL
    SELECT 1, 'quality_gate', CAST(count(*) AS BIGINT),
           CAST(sum(n_tokens) AS BIGINT) FROM canon WHERE gated
    UNION ALL
    SELECT 2, 'dedup', CAST(count(*) AS BIGINT),
           CAST(sum(n_tokens) AS BIGINT) FROM canon WHERE is_canon
    UNION ALL
    SELECT CASE split WHEN 'train' THEN 3 WHEN 'val' THEN 4 ELSE 5 END,
           'split_' || split, CAST(count(*) AS BIGINT),
           CAST(sum(n_tokens) AS BIGINT)
    FROM canon WHERE is_canon GROUP BY split
    """,
    doc="The whole curation pipeline as ONE plan with a funnel ledger: "
    "quality gate -> exact content dedup -> leakage-safe content-keyed "
    "split, emitting per-stage retention (docs + tokens) the way a "
    "training-data run reports its losses. Spark computes every stage "
    "membership as per-row FLAGS in one projection (gate predicate, "
    "canonical = min gated doc_id per fingerprint via ONE "
    "fingerprint-partitioned window, content-hash split), explodes each "
    "row's contributing-stage list map-side, and aggregates once on "
    "stage — one scan, one fingerprint exchange, one small stage "
    "aggregate; the oracle re-derives the same ledger as stacked "
    "aggregates. Because the split key is the dedup fingerprint itself, "
    "the composition is leakage-free by construction "
    "(dq_split_leakage_audit checks the same invariant corpus-wide).",
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    fp = _content_fingerprint()
    bucket = F.substring(F.md5(fp.cast("binary")), 1, 8)
    base = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_chars.between(100, 5000) & (n_tokens >= 10)).alias("gated"),
        fp.alias("fp"),
        F.when(bucket < "cc000000", "train")
        .when(bucket < "e6000000", "val")
        .otherwise("test")
        .alias("split"),
    )
    w = Window.partitionBy("fp")
    canon = base.withColumn(
        "is_canon",
        F.col("gated")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("gated"), F.col("doc_id"))).over(w)
        ),
    )
    stage = lambda o, s: F.struct(  # noqa: E731
        F.lit(o).alias("o") if isinstance(o, int) else o.alias("o"),
        F.lit(s).alias("s") if isinstance(s, str) else s.alias("s"),
    )
    empty = F.slice(F.array(stage(0, "x")), 1, 0)
    stages = F.concat(
        F.array(stage(0, "raw")),
        F.when(F.col("gated"), F.array(stage(1, "quality_gate"))).otherwise(empty),
        F.when(
            F.col("is_canon"),
            F.array(
                stage(2, "dedup"),
                stage(
                    F.when(F.col("split") == "train", 3)
                    .when(F.col("split") == "val", 4)
                    .otherwise(5),
                    F.concat(F.lit("split_"), F.col("split")),
                ),
            ),
        ).otherwise(empty),
    )
    return (
        canon.select("n_tokens", F.explode(stages).alias("st"))
        .groupBy(
            F.col("st.o").cast("int").alias("stage_ord"),
            F.col("st.s").alias("stage"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )



@register(
    "pipeline_corpus_clean",
    """
    WITH gated AS (
        SELECT doc_id, lang, text,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
        WHERE length(text) BETWEEN 100 AND 5000
          AND length(text) - length(replace(text, ' ', '')) + 1 >= 10
    ),
    canonical AS (
        SELECT min(doc_id) AS doc_id FROM gated
        GROUP BY md5(lower(trim(text)))
    )
    SELECT g.lang,
           count(*) AS n_docs,
           CAST(sum(g.n_tokens) AS BIGINT) AS total_tokens,
           floor(avg(g.n_chars) * 100 + 0.5) / 100 AS mean_chars
    FROM gated g JOIN canonical c ON g.doc_id = c.doc_id
    GROUP BY g.lang
    """,
    doc="End-to-end corpus-cleaning pipeline as ONE plan: quality gate -> "
    "exact dedup (canonical = min doc_id per fingerprint) -> per-language "
    "stats of the surviving corpus. The full training-data-prep shape, no "
    "materialization between stages.",
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    gated = d.filter(n_chars.between(100, 5000) & (n_tokens >= 10)).select(
        "doc_id", "lang", "text",
        n_chars.alias("n_chars"), n_tokens.alias("n_tokens"),
    )
    canonical = (
        gated.groupBy(_content_fingerprint())
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        gated.join(canonical, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.floor(F.avg("n_chars") * 100 + 0.5) / 100).alias("mean_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal binary columns
# ---------------------------------------------------------------------------


@register(
    "mm_binary_stats",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           upper(substring(hex(encode(text)), 1, 8)) AS magic_hex
    FROM documents
    """,
    doc="Multimodal binary-column stats (size / content hash / magic prefix) — "
    "all JVM-side; payload is the UTF-8 byte view of the text column (the "
    "plumbing is identical for real media bytes).",
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import binary_stats, with_binary_payload

    d = with_binary_payload(_t(spark, sf_dir, "documents"))
    return binary_stats(d, "doc_id")


@register(
    "mm_byte_features",
    """
    WITH ch AS (
        SELECT doc_id, ascii(substring(text, CAST(i AS INTEGER) + 1, 1)) AS byte
        FROM (SELECT doc_id, text, unnest(range(len(text))) AS i
              FROM documents)
    ),
    hist AS (
        SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS c
        FROM ch GROUP BY doc_id, byte
    ),
    n AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(byte * c) AS BIGINT) AS sum_bytes
        FROM hist GROUP BY doc_id
    ),
    feat AS (
        SELECT h.doc_id,
               CAST(sum(CAST(floor(-((h.c * 1.0 / n.n) * log2(h.c * 1.0 / n.n))
                                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS ent_micro,
               CAST(sum(CASE WHEN h.byte // 32 = 0 THEN h.c ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN h.byte // 32 = 1 THEN h.c ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN h.byte // 32 = 2 THEN h.c ELSE 0 END) AS BIGINT) AS c2,
               CAST(sum(CASE WHEN h.byte // 32 = 3 THEN h.c ELSE 0 END) AS BIGINT) AS c3,
               CAST(sum(CASE WHEN h.byte // 32 = 4 THEN h.c ELSE 0 END) AS BIGINT) AS c4,
               CAST(sum(CASE WHEN h.byte // 32 = 5 THEN h.c ELSE 0 END) AS BIGINT) AS c5,
               CAST(sum(CASE WHEN h.byte // 32 = 6 THEN h.c ELSE 0 END) AS BIGINT) AS c6,
               CAST(sum(CASE WHEN h.byte // 32 = 7 THEN h.c ELSE 0 END) AS BIGINT) AS c7
        FROM hist h JOIN n USING (doc_id) GROUP BY h.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(n.n, 0) AS BIGINT) AS n_bytes,
           floor((n.sum_bytes * 1.0 / n.n) * 1000000 + 0.5) / 1000000 AS mean_byte,
           f.ent_micro / 1000000.0 AS byte_entropy,
           floor(f.c0 * 1000000.0 / n.n + 0.5) / 1000000 AS f0,
           floor(f.c1 * 1000000.0 / n.n + 0.5) / 1000000 AS f1,
           floor(f.c2 * 1000000.0 / n.n + 0.5) / 1000000 AS f2,
           floor(f.c3 * 1000000.0 / n.n + 0.5) / 1000000 AS f3,
           floor(f.c4 * 1000000.0 / n.n + 0.5) / 1000000 AS f4,
           floor(f.c5 * 1000000.0 / n.n + 0.5) / 1000000 AS f5,
           floor(f.c6 * 1000000.0 / n.n + 0.5) / 1000000 AS f6,
           floor(f.c7 * 1000000.0 / n.n + 0.5) / 1000000 AS f7
    FROM documents d
    LEFT JOIN n ON d.doc_id = n.doc_id
    LEFT JOIN feat f ON d.doc_id = f.doc_id
    """,
    doc="mapInPandas feature extraction over binary payloads (Arrow-batched, "
    "zero-copy numpy byte views): mean byte, histogram entropy, 8-bucket "
    "byte-class fractions as SCALAR columns f0..f7 (flat, so the driver's "
    "pandas canonicalizer can sort/hash rows — arrays are unhashable there). "
    "The payload is the deterministic UTF-8 byte view of text (pure-ASCII "
    "corpus, asserted in tests), so the oracle recomputes every feature "
    "from a per-character unnest in SQL; the oracle LEFT JOINs from "
    "documents so an empty payload yields the same (id, 0, NULL...) row "
    "the Spark path emits — parity holds at any scale or generator, not "
    "just corpora with no empty docs. Determinism: all floats derive "
    "from the exact integer histogram with one fixed op order; entropy "
    "rounds each -(p*log2 p) term to integer micros before the integer "
    "sum (order-independent), leaving only the ~1-ulp log2 cross-libm "
    "exposure, margin-tested in tests/test_multimodal.py.",
)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_byte_features, with_binary_payload

    d = with_binary_payload(_t(spark, sf_dir, "documents"))
    return extract_byte_features(d, "doc_id")


@register(
    "mm_decode_features",
    """
    WITH px AS (
        SELECT d.doc_id, x.range AS x, y.range AS y
        FROM documents d, range(16) x, range(8) y
    ),
    m AS (
        SELECT doc_id,
               sum((7 * doc_id + 3 * x + 5 * y) % 256) / 128.0 AS mean_r,
               sum((11 * doc_id + x) % 256) / 128.0 AS mean_g,
               sum((13 * y + doc_id) % 256) / 128.0 AS mean_b
        FROM px GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL
                WHEN d.doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS media_type,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE 16 END AS width,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE 8 END AS height,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL
                ELSE CAST((7 * d.doc_id) % 256 AS INTEGER) END AS px00_r,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE m.mean_r END AS mean_r,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE m.mean_g END AS mean_g,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE m.mean_b END AS mean_b,
           CASE WHEN d.doc_id % 7 = 3 THEN 'error_unknown_format'
                ELSE 'ok' END AS status
    FROM documents d JOIN m ON d.doc_id = m.doc_id
    """,
    doc="REAL image decode through the mapInPandas boundary (replaces the "
    "round-3 NotImplementedError stub): per document a synthetic image "
    "whose pixel (x,y) color is a closed-form function of doc_id is "
    "encoded executor-side as BMP (32 bpp top-down / 24 bpp bottom-up) or "
    "PPM P6 — plus a corrupt-payload stripe — then decoded by the pure-"
    "numpy decoder (operators/multimodal.py): header parse, row padding, "
    "BGR(A) order, vertical flip. Spark round-trips actual bytes; the "
    "oracle computes every decoded feature (dimensions, the orientation-"
    "sensitive (0,0) pixel, exact channel means — 128 px so /128 is an "
    "exact binary division) directly from doc_id in SQL. Corrupt payloads "
    "emit error-status rows (S4 errors-as-data), never stage failures.",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, synth_payload_df

    d = synth_payload_df(_t(spark, sf_dir, "documents"))
    return decode_media(d, "doc_id")


@register(
    "mm_video_frame_decode",
    """
    WITH f AS (
        SELECT d.doc_id, g.range AS frame_idx
        FROM documents d, range(0, 7, 2) g
        WHERE g.range < 3 + d.doc_id % 4
    ),
    px AS (
        SELECT f.doc_id, f.frame_idx, x.range AS x, y.range AS y
        FROM f, range(16) x, range(8) y
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           16 AS width, 8 AS height,
           CAST((7 * doc_id + 11 * frame_idx) % 256 AS INTEGER) AS px00_r,
           sum((7 * doc_id + 3 * x + 5 * y + 11 * frame_idx) % 256) / 128.0
               AS mean_r,
           sum((11 * doc_id + x + 13 * frame_idx) % 256) / 128.0 AS mean_g,
           sum((13 * y + doc_id + 7 * frame_idx) % 256) / 128.0 AS mean_b,
           'ok' AS status
    FROM px GROUP BY doc_id, frame_idx
    """,
    doc="VIDEO path end-to-end: per document a multi-frame payload "
    "(concatenated P6 frames — ffmpeg's image2pipe ppm stream container, "
    "3-6 frames) is generated executor-side; the every-2nd-frame sampling "
    "decision is derived JVM-side (F.sequence over the n_frames metadata "
    "column — never Python); ONE mapInPandas pass walks each stream and "
    "decodes ONLY the sampled frames (skipping others header-by-header), "
    "emitting a row per sampled frame. Frame pixels are a closed-form "
    "function of (doc_id, frame_idx) so the oracle computes every decoded "
    "feature in SQL; 128 px/frame keeps the channel means exact binary "
    "divisions. No shuffle anywhere — scan -> generate -> sample -> "
    "decode is the map-only shape that survives any scale.",
)
def mm_video_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import synth_video_df, video_frame_features

    v = synth_video_df(_t(spark, sf_dir, "documents"))
    sampled = v.withColumn(
        "sample_idxs",
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2)),
    )
    return video_frame_features(sampled)


@register(
    "mm_resize_features",
    """
    WITH px AS (
        SELECT d.doc_id, x.range AS x, y.range AS y,
               (7 * d.doc_id + 3 * x.range + 5 * y.range) % 256 AS r,
               (13 * y.range + d.doc_id) % 256 AS b
        FROM documents d, range(16) x, range(8) y
        WHERE d.doc_id % 7 <> 3
    ),
    boxes AS (
        SELECT doc_id, x // 2 AS bx, y // 2 AS by,
               sum(r) / 4.0 AS box_r, sum(b) / 4.0 AS box_b
        FROM px GROUP BY doc_id, x // 2, y // 2
    ),
    agg AS (
        SELECT doc_id,
               max(CASE WHEN bx = 0 AND by = 0 THEN box_r END) AS px00_r,
               max(CASE WHEN bx = 7 AND by = 3 THEN box_b END) AS pxlast_b,
               sum(box_r) / 32.0 AS mean_r
        FROM boxes GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE 8 END AS out_w,
           CASE WHEN d.doc_id % 7 = 3 THEN NULL ELSE 4 END AS out_h,
           a.px00_r, a.pxlast_b, a.mean_r,
           CASE WHEN d.doc_id % 7 = 3 THEN 'error_undecodable'
                ELSE 'ok' END AS status
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    doc="Image RESIZE through the decode boundary (the brief's named "
    "multimodal op): decode (BMP or PPM) + exact 2x2 box-mean downsample "
    "in one mapInPandas pass, emitting resized dims, two alignment-"
    "sensitive probe pixels (top-left red / bottom-right blue block "
    "means — wrong block alignment or channel order changes them) and "
    "the resized red mean. Box means over power-of-two blocks are exact "
    "doubles, so the oracle replays them bit-for-bit from the closed-form "
    "pixel model; the corrupt-payload stripe degrades to error rows.",
)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_features, synth_payload_df

    d = synth_payload_df(_t(spark, sf_dir, "documents"))
    return resize_features(d, "doc_id", factor=2)


@register(
    "mm_audio_features",
    """
    WITH s AS (
        SELECT d.doc_id, i.range AS i,
               (37 * d.doc_id + 17 * i.range) % 4001 - 2000 AS v
        FROM documents d, range(69) i
        WHERE i.range < 64 + d.doc_id % 5
    ),
    feat AS (
        SELECT doc_id,
               CAST(count(*) AS INTEGER) AS n_samples,
               CAST(max(abs(v)) AS INTEGER) AS peak_abs,
               CAST(sum(v * v) AS BIGINT) AS sum_sq
        FROM s GROUP BY doc_id
    ),
    zc AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN (prev < 0 AND v > 0) OR (prev > 0 AND v < 0)
                             THEN 1 ELSE 0 END) AS INTEGER) AS n_zero_cross
        FROM (SELECT doc_id, v,
                     lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM s) t
        GROUP BY doc_id
    )
    SELECT f.doc_id, 8000 AS sample_rate, f.n_samples, f.peak_abs, f.sum_sq,
           zc.n_zero_cross, 'ok' AS status
    FROM feat f JOIN zc USING (doc_id)
    """,
    doc="AUDIO path end-to-end: real 16-bit mono PCM WAV payloads "
    "(RIFF/WAVE with proper chunk walking) generated executor-side from a "
    "closed-form int16 waveform, decoded by the pure-struct/numpy parser, "
    "emitting EXACT-INTEGER signal features (peak, energy as sum of "
    "squares, strict sign-change zero crossings) — integer outputs mean "
    "the cross-engine hash needs no float rounding at all. The oracle "
    "replays the waveform from doc_id via generate_series + a lag window.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_features, synth_audio_df

    d = synth_audio_df(_t(spark, sf_dir, "documents"))
    return audio_features(d, "doc_id")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
    SELECT e.vec_id, e.label,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
)
SELECT vec_id, label, cosine
FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, vec_id) AS rk FROM scored)
WHERE rk <= 25
"""


@register(
    "sim_topk_bruteforce",
    _TOPK_ORACLE,
    doc="Brute-force cosine top-k against a query vector (vec_id=0). Dot products run "
    "JVM-side via zip_with/aggregate in double precision; ties broken on vec_id. "
    "Scale path is sim_lsh_bucketed.",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(e, query_vec_id=0, k=25)


@register(
    "sim_ivf_topk",
    None,
    doc="IVF approximate top-k: deterministic-seed coarse quantizer + one "
    "Lloyd refinement, probe the query's 4/16 nearest centroids, exact "
    "cosine within the probed inverted lists. Probe-all equals brute force "
    "exactly (asserted in tests); recall-vs-scan-fraction is the ANN knob.",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, query_vec_id=0, k=25, n_centroids=16, nprobe=4)


@register(
    "sim_ivf_probeall_topk",
    _TOPK_ORACLE,
    doc="IVF at the oracle-checkable operating point: probing ALL inverted "
    "lists makes the result exactly the brute-force top-k (asserted in "
    "tests as well), so the same DuckDB oracle applies while the query "
    "still exercises the full IVF machinery — deterministic-seed coarse "
    "quantizer, Lloyd refinement, vectorized assignment, per-list "
    "pruning plumbing. The partial-probe variant (sim_ivf_topk, "
    "nprobe=4/16) stays rows-only: its recall-vs-scan-fraction tradeoff "
    "is the ANN knob, not a deterministic answer.",
)
def sim_ivf_probeall_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, query_vec_id=0, k=25, n_centroids=16, nprobe=16)


@register(
    "sim_label_cohesion",
    """
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
               WHERE vec_id < 200),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT CASE WHEN label_a = label_b THEN 'same_label' ELSE 'cross_label' END AS bucket,
           count(*) AS n_pairs,
           round(avg(cosine), 4) AS mean_cosine
    FROM pairs GROUP BY 1
    """,
    doc="Embedding-space sanity metric: same-label vs cross-label mean cosine over all "
    "pairs of the first 200 vectors. Validates the vector column plumbing end-to-end.",
)
def sim_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("emb"))
    )
    a = e.select(
        F.col("vec_id").alias("vid_a"), F.col("label").alias("label_a"), F.col("emb").alias("emb_a")
    )
    b = e.select(
        F.col("vec_id").alias("vid_b"), F.col("label").alias("label_b"), F.col("emb").alias("emb_b")
    )
    pairs = a.join(b, F.col("vid_a") < F.col("vid_b")).select(
        "label_a", "label_b", cosine_col("emb_a", "emb_b").alias("cosine")
    )
    return (
        pairs.withColumn(
            "bucket",
            F.when(F.col("label_a") == F.col("label_b"), "same_label").otherwise(
                "cross_label"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cosine"), 4).alias("mean_cosine"),
        )
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < 2000)
    SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.emb, b.emb)
          / (sqrt(list_dot_product(a.emb, a.emb))
             * sqrt(list_dot_product(b.emb, b.emb))) >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs, EXACT all-pairs baseline (capped to "
    "vec_id<2000 — the quadratic join is the oracle/verify path only; "
    "sim_lsh_bucketed is the scale path). JVM-side sequential double "
    "accumulation matches DuckDB's list_dot_product element order exactly.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import all_pairs_cosine

    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2000)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    # Blocked matrix product (see all_pairs_cosine): the join formulations
    # of n^2/2 pairs moved every vector across the Arrow boundary once per
    # PAIR — 65 s as a single-task nested-loop + HOF cosine, ~5 s with
    # repartition + einsum kernel; the blocked form is sub-second compute
    # with one bounded collect of the capped vector set.
    return all_pairs_cosine(e, min_cosine=0.4)


@register(
    "sim_lsh_bucketed",
    None,
    doc="Random-hyperplane (sign) LSH ANN with OR-amplification (16 bands, "
    "AUTO bits-per-band sized to corpus count so per-bucket occupancy stays "
    "~constant): any-band bucket join generates candidates (ids only; "
    "embeddings re-attached post-distinct), exact cosine re-ranks. The "
    "100 TB path: per-band bucket join replaces the quadratic cross join, "
    "and auto band width keeps candidate volume near-linear in n (fixed "
    "64-bucket bands measured scaling exponent 1.08 at sf0.1->sf1 — the "
    "suite's only superlinear query before this). Threshold 0.45 sits "
    "inside the testdata's cosine range so the query is non-vacuous; at "
    "LOW thresholds sign-LSH recall is partial by design (ANN tradeoff; "
    "near-dup thresholds >=0.95 recall ~1.0 across the auto range — "
    "asserted on planted near-duplicates in tests/test_dedup_similarity.py).",
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_bucketed_pairs

    e = _t(spark, sf_dir, "embeddings")
    return lsh_bucketed_pairs(e, bands=16, bits_per_band="auto", min_cosine=0.45)


@register(
    "sim_lsh_recall",
    """
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings WHERE vec_id < 2000
    ),
    seed AS (SELECT vec_id, emb FROM base WHERE vec_id < 200),
    planted AS (
        SELECT vec_id, list_concat([emb[1] + 0.1], emb[2:64]) AS emb2
        FROM seed
    ),
    truth AS (
        SELECT s.vec_id FROM seed s JOIN planted p USING (vec_id)
        WHERE list_dot_product(s.emb, p.emb2)
              / (sqrt(list_dot_product(s.emb, s.emb))
                 * sqrt(list_dot_product(p.emb2, p.emb2))) >= 0.95
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS recall_ge_90
    FROM truth
    """,
    doc="Recall LEDGER for the sign-LSH ANN path — the driver-attested "
    "quality twin of the rows-only sim_lsh_bucketed (the same idiom that "
    "gave MinHash/SimHash their oracle-backed operating-point twins): "
    "plant one near-duplicate per seed vector DETERMINISTICALLY inside "
    "the query (first component += 0.1, cosine ~0.999 — identical IEEE "
    "double arithmetic on both engines via the same prepend+slice "
    "expression), run the REAL lsh_bucketed_pairs operator (16 bands, "
    "auto bits) over base+planted at the near-dup threshold 0.95 where "
    "the operating point guarantees recall ~1.0, and report (a) the "
    "exact ground-truth pair count — hash-checked against DuckDB "
    "computing the identical construction — and (b) recall >= 90% as a "
    "boolean the oracle emits as literal TRUE. Any pair at cosine >= "
    "0.95 is necessarily a planted pair (the natural corpus maxes out "
    "near 0.6), so the recall denominator is exactly the planted truth "
    "set. The hash-seeded signatures never reach the output — only "
    "their QUALITY does, which is what makes ANN recall driver-visible "
    "instead of pytest-only (tests/test_dedup_similarity.py keeps the "
    "planted-pair recall >= 0.9 assertion).",
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_bucketed_pairs

    base = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2000)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
    )
    seed = base.filter(F.col("vec_id") < 200)
    # planted twin: first component += 0.1, rest unchanged — the same
    # prepend+slice expression as the oracle (list_concat([emb[1]+0.1],
    # emb[2:64])), so the exact-cosine ground truth matches bit-for-bit
    twin_emb = F.concat(
        F.array(F.element_at(F.col("emb"), 1) + F.lit(0.1)),
        F.slice(F.col("emb"), 2, 63),
    )
    planted = seed.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        twin_emb.alias("emb"),
    )
    from ..operators.similarity import cosine_col

    truth = (
        seed.alias("s")
        .join(
            planted.select(
                (F.col("vec_id") - F.lit(10_000_000)).alias("vec_id"),
                F.col("emb").alias("emb2"),
            ).alias("p"),
            "vec_id",
        )
        .filter(cosine_col("emb", "emb2") >= 0.95)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    corpus = base.unionByName(planted).select(
        "vec_id", F.col("emb").alias("embedding")
    )
    cand = lsh_bucketed_pairs(
        corpus, bands=16, bits_per_band="auto", min_cosine=0.95
    )
    found = cand.filter(
        F.col("vid_b") == F.col("vid_a") + F.lit(10_000_000)
    ).join(truth.withColumnRenamed("vec_id", "vid_a"), "vid_a", "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .select(
            "n_true",
            (10 * F.col("n_found") >= 9 * F.col("n_true")).alias(
                "recall_ge_90"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round-2 additions: dedup clustering, deterministic sampling, TF-IDF
# ---------------------------------------------------------------------------

_CLUSTER_ORACLE = """
WITH RECURSIVE shingles AS (
    SELECT doc_id, unnest(list_distinct([substr(text, g, 12)
           FOR g IN range(1, greatest(length(text) - 10, 2))])) AS sh
    FROM documents
),
freq AS (SELECT sh, count(*) AS d FROM shingles GROUP BY sh),
kept AS (
    SELECT s.doc_id, s.sh FROM shingles s JOIN freq USING (sh)
    WHERE freq.d <= 256
),
counts AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
pair_overlap AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b
    FROM pair_overlap
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.2
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, lbl) AS (
    SELECT DISTINCT src, src FROM edges
    UNION
    SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
"""


@register(
    "dedup_cluster_assign",
    _CLUSTER_ORACLE,
    doc="Duplicate-CLUSTER assignment: connected components over the "
    "MinHash+LSH near-dup graph (12-gram shingles, 16 bands x 2 rows, "
    "exact-Jaccard verify at 0.2) — the 100 TB composition: candidate "
    "generation is the banded id-only join, never the per-shingle "
    "self-join whose sum(df^2) fan-out is the documented non-scale path "
    "(PERF.md). Pair detection alone can't answer 'keep one doc per "
    "duplicate set' — that needs the transitive closure, which Spark "
    "computes as iterative min-label propagation (operators/graph.py; "
    "one join + grouped min per round, rounds = graph diameter, lineage "
    "truncated per round). The DuckDB oracle stays on the EXACT-pair "
    "recursive CTE (the audit twin): near-dup clusters in this corpus "
    "are tight (J >= ~0.95), so LSH recall is 1.0 and the label sets "
    "coincide — asserted pair-for-pair and label-for-label against the "
    "exact composition at sf0.01 AND sf0.1 in "
    "tests/test_dedup_similarity.py.",
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    return connected_components(
        _cluster_pairs_lsh(d), "doc_a", "doc_b"
    ).withColumnRenamed("node", "doc_id")


def _cluster_pairs_lsh(d: DataFrame) -> DataFrame:
    """Scale-path near-dup edge source shared by the two clustering
    queries: banded MinHash-LSH candidates + exact verify. 16 bands x 2
    rows => a J>=0.9 pair is missed with prob (1-J^2)^16 <= 3.3e-12."""
    return minhash_lsh_candidates(
        d, "doc_id", "text", n=12, num_perm=32, bands=16, verify_threshold=0.2
    )


def cluster_pairs_exact(d: DataFrame) -> DataFrame:
    """Audit twin of ``_cluster_pairs_lsh``: the exact per-shingle
    self-join pair generator (sum(df^2) fan-out — NOT the 100 TB path).
    Kept callable so tests can assert the two compositions produce
    identical edges and labels on the testdata; mirrors the max_df=256
    hot-shingle operating point of the recursive-CTE oracles."""
    from ..operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        d, "doc_id", "text", n=12, threshold=0.2, max_df=256
    )


@register(
    "doc_stratified_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(text), 1, 8) <
          CASE lang WHEN 'en' THEN '40000000' ELSE '80000000' END
    """,
    doc="Deterministic stratified sampling — the training-data downsampling "
    "primitive (e.g. downweight overrepresented English). The sample "
    "decision is a pure function of the CONTENT (md5 hex prefix under a "
    "per-stratum threshold: en 25%, others 50%), so it is reproducible "
    "across engines, runs, and partitionings — unlike TABLESAMPLE/rand(), "
    "which are seed- and split-dependent. Map-only: filter evaluates at "
    "the scan, no shuffle, trivially 100 TB-parallel; md5 hex compares "
    "identically in Spark and DuckDB (portable-hash cookbook rule).",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", "40000000").otherwise("80000000")
    return d.filter(
        F.substring(F.md5(F.col("text").cast("binary")), 1, 8) < thr
    ).select("doc_id", "lang", "source")


@register(
    "txt_tfidf_topterms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS dfq FROM tf GROUP BY term),
    scored AS (
        SELECT t.doc_id, t.term,
               t.tf * (SELECT count(*) FROM documents) * 1.0 / d.dfq AS score
        FROM tf t JOIN dfreq d ON t.term = d.term
    )
    SELECT doc_id, term, floor(score * 10000 + 0.5) / 10000 AS score, rk
    FROM (SELECT doc_id, term, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term) AS rk
          FROM scored)
    WHERE rk <= 3
    """,
    doc="TF-IDF characteristic terms: top-3 terms per document by "
    "tf * N/df (ratio idf — ln() differs in last-ULP between libm "
    "implementations, so the portable score keeps to exactly-rounded "
    "IEEE ops: int multiply, one double divide). Tokenize -> per-doc "
    "term counts (ONE shuffle on doc_id+term) -> doc-frequency as "
    "count() OVER (PARTITION BY term) on the tf relation: a join against "
    "a separate dfreq aggregate would make Catalyst compute the whole "
    "explode+aggregate tf subtree TWICE (DataFrame subtree reuse is not "
    "CSE'd — same finding as the Q21 rewrite; measured 27 s -> 6 s at "
    "the generated sf10) -> per-doc window top-3 (partitioned by doc_id "
    "— no global window). N arrives as a broadcast one-row join, not a "
    "collected literal.",
)
def txt_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    dfq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("dfq", dfq)
        .join(F.broadcast(ndocs))
        .withColumn(
            "score", F.col("tf") * F.col("n_docs") * F.lit(1.0) / F.col("dfq")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id", "term",
            (F.floor(F.col("score") * 10000 + 0.5) / 10000).alias("score"),
            "rk",
        )
    )


@register(
    "doc_quota_per_source",
    """
    SELECT doc_id, source, lang
    FROM (SELECT doc_id, source, lang,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(text), doc_id) AS rn
          FROM documents)
    WHERE rn <= 40
    """,
    doc="Quota sampling: at most K docs per source, selected by content-hash "
    "order — the domain-mixing primitive (cap any one crawl/source's "
    "contribution to the training mix). Hash order makes the quota a "
    "uniform-without-replacement draw that is reproducible across engines "
    "and partitionings; the window partitions by source, so no global "
    "ordering bottleneck.",
)
def doc_quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text").cast("binary")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "source", "lang")
    )


@register(
    "doc_pack_context_windows",
    """
    WITH sized AS (
        SELECT doc_id, source,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, source, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY source
                           ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / 256) AS BIGINT) AS bin_id
        FROM sized
    )
    SELECT source, bin_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin_id
    """,
    doc="Sequence packing: assign docs to ~256-token context windows by "
    "running token count within each source (bin = floor(prefix_sum/budget) "
    "— the streaming-greedy approximation of bin packing used by training "
    "pipelines). Deterministic doc order (doc_id) makes the layout "
    "reproducible; the window partitions by source so packing parallelizes "
    "per stratum, and the ROWS frame makes the running sum one pass.",
)
def doc_pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "doc_id", "source", n_tokens.alias("n_tokens")
    ).withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 256).cast(
            "long"
        ),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )


@register(
    "mm_frame_sample",
    """
    SELECT doc_id,
           unnest(generate_series(0, greatest((n_chars % 100) - 1, 0), 10))
               AS frame_idx
    FROM documents
    """,
    doc="Video frame-sampling plan (operators/multimodal.py): every 10th "
    "frame index per document as exploded (doc, frame_idx) rows, JVM-side "
    "via sequence() — the decode of each sampled frame then crosses the "
    "mapInPandas boundary once per SAMPLED frame, not per frame. Frame "
    "counts derive deterministically from metadata (n_chars % 100 stands "
    "in for the container's frame count). Map-only: generate, no shuffle.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") % 100).alias("n_frames")
    )
    return frame_sample_plan(d, "doc_id", "n_frames", every_k=10)


_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
# one sentinel char per merge round; verified absent from the corpus, so a
# sentinel unambiguously denotes that round's merged symbol inside the
# packed string representation
_BPE_SENT = ["\x01", "\x02", "\x03"]


def _bpe_train_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str, int]]:
    """Run the 3 BPE merge rounds and return ``[(packed_pair, sentinel,
    count), ...]`` in train order. The merge table is the driver-held
    bounded model (3 rows) shared by the trainer output query and the
    encoder; packed pairs may contain earlier rounds' sentinel chars."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
            ).alias("s")
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)  # reused by all three rounds
    )
    cur = words
    merges: list[tuple[str, str, int]] = []
    for r in range(1, 4):
        pairs = cur.filter(F.length("s") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(s) - 1),"
                    " i -> substring(s, i, 2))"
                )
            ).alias("pair"),
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()[0]
        )
        sent = _BPE_SENT[r - 1]
        merges.append((top["pair"], sent, int(top["n"])))
        if r < 3:  # the final round's replaced vocab is never read
            cur = cur.select(
                F.replace(
                    F.col("s"), F.lit(top["pair"]), F.lit(sent)
                ).alias("s"),
                "freq",
            ).localCheckpoint(eager=True)
    return merges


@register(
    "txt_bpe_train",
    rf"""
    WITH words AS (
        SELECT tok AS s0, count(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(text, '{_BPE_RE}')) AS tok
            FROM documents) GROUP BY tok
    ),
    p1 AS (
        SELECT s0[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM words, unnest(generate_series(1, length(s0) - 1)) AS t(i)
        GROUP BY pair
    ),
    m1 AS (SELECT pair, n FROM p1 ORDER BY n DESC, pair LIMIT 1),
    w1 AS (SELECT replace(s0, (SELECT pair FROM m1), chr(1)) AS s1, freq
           FROM words),
    p2 AS (
        SELECT s1[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM w1, unnest(generate_series(1, length(s1) - 1)) AS t(i)
        GROUP BY pair
    ),
    m2 AS (SELECT pair, n FROM p2 ORDER BY n DESC, pair LIMIT 1),
    w2 AS (SELECT replace(s1, (SELECT pair FROM m2), chr(2)) AS s2, freq
           FROM w1),
    p3 AS (
        SELECT s2[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM w2, unnest(generate_series(1, length(s2) - 1)) AS t(i)
        GROUP BY pair
    ),
    m3 AS (SELECT pair, n FROM p3 ORDER BY n DESC, pair LIMIT 1),
    raw AS (
        SELECT 1 AS round, pair, n FROM m1
        UNION ALL SELECT 2, pair, n FROM m2
        UNION ALL SELECT 3, pair, n FROM m3
    )
    -- sentinels only ever reference EARLIER rounds, so expanding round-3's
    -- marker first, then round-2's, then round-1's resolves every symbol
    SELECT round,
           replace(replace(replace(pair[1:1],
               chr(3), replace(replace((SELECT pair FROM m3),
                   chr(2), (SELECT pair FROM m2)),
                   chr(1), (SELECT pair FROM m1))),
               chr(2), replace((SELECT pair FROM m2),
                   chr(1), (SELECT pair FROM m1))),
               chr(1), (SELECT pair FROM m1)) AS sym_a,
           replace(replace(replace(pair[2:2],
               chr(3), replace(replace((SELECT pair FROM m3),
                   chr(2), (SELECT pair FROM m2)),
                   chr(1), (SELECT pair FROM m1))),
               chr(2), replace((SELECT pair FROM m2),
                   chr(1), (SELECT pair FROM m1))),
               chr(1), (SELECT pair FROM m1)) AS sym_b,
           n
    FROM raw
    """,
    doc="Distributed BPE TRAINER (3 merge rounds) — the tokenizer-build "
    "loop itself, not just one pair count. Per round: adjacent-pair "
    "counts over the word-frequency table (classic BPE trains on "
    "distinct words x freq — vocab-sized, not corpus-sized), argmax with "
    "a deterministic (count DESC, pair ASC) tiebreak collected as ONE "
    "driver row (the bounded-model pattern of kmeans/logreg), then the "
    "merge applied via replace(word, a||b, sentinel) — string replace is "
    "leftmost-non-overlapping on both engines, which IS the greedy BPE "
    "merge order, and one reserved sentinel char per round keeps merged "
    "symbols atomic inside the packed string. The oracle replays all "
    "three rounds in SQL (same counts, same argmax, same replace "
    "semantics) and expands sentinels back to concrete symbol strings. "
    "Scale: the words table is built once (one corpus shuffle) and each "
    "round adds one vocab-sized aggregate + a map-only replace.",
)

def txt_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train_merges(spark, sf_dir)
    sent_to_pair = {sent: pair for pair, sent, _ in merges}
    out_rows = []
    for r, (pair, _sent, n) in enumerate(merges, start=1):

        def expand(sym: str) -> str:
            # sentinels reference earlier rounds only -> expand newest first
            for s_ch in reversed(_BPE_SENT[:r]):
                if s_ch in sent_to_pair:
                    sym = sym.replace(s_ch, sent_to_pair[s_ch])
            return sym

        out_rows.append((r, expand(pair[0]), expand(pair[1]), n))
    return spark.createDataFrame(
        out_rows, "round int, sym_a string, sym_b string, n long"
    )



@register(
    "txt_bpe_pretokenize",
    r"""
    WITH toks AS (
        SELECT doc_id, lang,
               regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')
                   AS bpe_toks,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_ws_tokens
        FROM documents
    )
    SELECT doc_id, lang,
           len(bpe_toks)                 AS n_bpe_tokens,
           len(list_distinct(bpe_toks))  AS n_distinct_tokens,
           n_ws_tokens,
           floor(len(bpe_toks) * 1.0 / n_ws_tokens * 10000 + 0.5) / 10000
               AS bpe_per_ws
    FROM toks
    """,
    doc="BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape: "
    "space-prefixed letter runs | digit runs | punctuation runs) via "
    "regexp_extract_all — the token-budget estimator that runs BEFORE a "
    "real BPE merge table. Pure JVM regex (the pattern stays in the "
    "RE2-and-Java-compatible subset so the DuckDB oracle matches "
    "byte-for-byte); map-only, no shuffle. A real tokenizer's merge "
    "step would consume these pre-tokens through a Pandas UDF.",
)
def txt_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), F.lit(0)
    )
    n_ws = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).cast("long").alias("n_distinct_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        (
            F.floor(F.size(bpe) * 1.0 / n_ws * 10000 + 0.5) / 10000
        ).alias("bpe_per_ws"),
    )


@register(
    "emb_label_centroids",
    """
    SELECT label, i AS dim_idx,
           round(avg(embedding[i]), 4) + 0.0 AS centroid_v,
           count(*)                          AS n_members
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
    doc="Per-label centroid vectors (the nearest-centroid classifier / "
    "class-balance diagnostic for labeled embedding data): posexplode -> "
    "one hash aggregate keyed on (label, dim). Output is O(labels x dim) "
    "— a broadcast-sized model no matter the corpus size; map-side "
    "partials do the heavy reduction. `+ 0.0` canonicalizes IEEE "
    "negative zero on both sides (see emb_dimension_stats).",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy(
        "label", (F.col("pos") + 1).cast("long").alias("dim_idx")
    ).agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid_v"),
        F.count(F.lit(1)).alias("n_members"),
    )


# ---------------------------------------------------------------------------
# Train/test hygiene, quantization, output sharding
# ---------------------------------------------------------------------------


@register(
    "doc_leakage_safe_split",
    """
    SELECT doc_id, lang,
           md5(lower(trim(text))) AS fingerprint,
           CASE WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'cc000000'
                THEN 'train'
                WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'e6000000'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Leakage-safe train/val/test split: the split is a function of the "
    "content FINGERPRINT, not the doc_id, so every exact duplicate of a "
    "document lands in the same split — the standard guard against "
    "train/test contamination. Entirely map-side (two md5 calls per row, "
    "zero shuffles, zero joins): group identity is content-derived, so "
    "no groupBy is needed to agree on a group's split. Thresholds on the "
    "first 8 hex chars give ~80/10/10 (0xcc/0x100, 0xe6/0x100). At 100 TB "
    "this is a pure scan->project — the cheapest possible shape.",
)
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = _content_fingerprint()
    bucket = F.substring(F.md5(fp.cast("binary")), 1, 8)
    return d.select(
        "doc_id",
        "lang",
        fp.alias("fingerprint"),
        F.when(bucket < "cc000000", "train")
        .when(bucket < "e6000000", "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "emb_int8_quantize",
    """
    WITH scaled AS (
        SELECT vec_id, label,
               list_transform(embedding, y -> CAST(y AS DOUBLE)) AS xd,
               127.0 / list_aggregate(
                   list_transform(embedding, y -> abs(CAST(y AS DOUBLE))),
                   'max') AS scale
        FROM embeddings
    )
    SELECT vec_id, label,
           floor(scale * 1000000 + 0.5) / 1000000 AS scale_r,
           floor(list_aggregate(
                     list_transform(
                         xd, y -> abs(y - floor(y * scale + 0.5) / scale)),
                     'max') * 1000000 + 0.5) / 1000000 AS max_err_r,
           CAST(floor(xd[1] * scale + 0.5) AS BIGINT) AS q1,
           CAST(floor(xd[2] * scale + 0.5) AS BIGINT) AS q2,
           CAST(floor(xd[3] * scale + 0.5) AS BIGINT) AS q3,
           CAST(floor(xd[4] * scale + 0.5) AS BIGINT) AS q4
    FROM scaled
    """,
    doc="Symmetric per-vector int8 quantization (the storage/ANN-index "
    "compression step for embedding corpora): scale = 127/max|x|, "
    "q_i = floor(x_i*scale + 0.5) in [-127, 127], plus the max "
    "reconstruction error per vector. All higher-order array functions "
    "(transform/array_max) on the JVM — no UDF, no explode: one row in, "
    "one row out, zero shuffles. Cross-engine determinism: float->double "
    "casts are exact, floor(x+0.5) is the portable round, max (not mean) "
    "keeps the reduction accumulation-order-free.",
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda y: y.cast("double"))
    base = e.select(
        "vec_id",
        "label",
        xd.alias("xd"),
        (F.lit(127.0) / F.array_max(F.transform(xd, F.abs))).alias("scale"),
    )
    s = F.col("scale")

    def q(i: int):
        return F.floor(F.element_at("xd", i) * s + F.lit(0.5)).cast("long")

    err = F.array_max(
        F.transform(
            F.col("xd"),
            lambda y: F.abs(y - F.floor(y * s + F.lit(0.5)) / s),
        )
    )
    return base.select(
        "vec_id",
        "label",
        (F.floor(s * 1000000 + F.lit(0.5)) / 1000000).alias("scale_r"),
        (F.floor(err * 1000000 + F.lit(0.5)) / 1000000).alias("max_err_r"),
        q(1).alias("q1"),
        q(2).alias("q2"),
        q(3).alias("q3"),
        q(4).alias("q4"),
    )


@register(
    "doc_shard_manifest",
    """
    WITH sharded AS (
        SELECT doc_id, n_chars,
               strpos('0123456789abcdef',
                      substr(md5(lower(trim(text))), 1, 1)) - 1 AS shard
        FROM documents
    )
    SELECT CAST(shard AS BIGINT)        AS shard,
           count(*)                     AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id)                  AS min_doc,
           max(doc_id)                  AS max_doc
    FROM sharded
    GROUP BY shard
    """,
    doc="Deterministic 16-way shard manifest for training-data output: "
    "shard = first hex nibble of the content fingerprint (engine-portable, "
    "unlike hash()%16), manifest = per-shard doc count / byte volume / "
    "doc_id range proving the shards are balanced. At scale this is the "
    "audit table written next to repartition(shard).write: one scan, one "
    "16-group hash aggregate with map-side partials, O(shards) output.",
)
def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = _content_fingerprint()
    shard = (
        F.expr(
            "instr('0123456789abcdef', substring("
            "md5(cast(lower(trim(text)) as binary)), 1, 1)) - 1"
        )
    ).cast("long")
    return (
        d.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "txt_vocab_topk",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM toks
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 50
    """,
    doc="Corpus vocabulary head: global top-50 terms by frequency (the "
    "wordcount that seeds tokenizer training / stopword lists). "
    "Explode -> one hash aggregate on term (map-side partials collapse "
    "the per-partition duplicates before the shuffle) -> distributed "
    "top-k via TakeOrderedAndProject: each partition keeps its local 50, "
    "the driver merges O(partitions x 50) rows — no global sort, no "
    "single-partition window, ties broken on the term itself so LIMIT "
    "is deterministic.",
)
def txt_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), "term")
        .limit(50)
    )


@register(
    "evt_funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
    doc="Ordered funnel conversion (view -> click -> purchase, each stage "
    "strictly AFTER the user's previous stage): the event-analytics "
    "sequence query. Each stage is one per-user conditional-min aggregate "
    "joined to the previous stage's firsts — every shuffle is keyed on "
    "user_id, so at scale the three stages reuse one partitioning; stage "
    "tables shrink monotonically (firsts per user, not events), so the "
    "joins get cheaper down the funnel. No window over the full event "
    "stream, no per-user sort.",
)
def evt_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view").unionAll(stage(c, "2_click")).unionAll(stage(p, "3_purchase"))
    )


@register(
    "evt_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    )
    SELECT epoch_us(f.cw) AS cohort_week_us,
           (epoch_us(a.aw) - epoch_us(f.cw)) // 604800000000 AS week_offset,
           count(*) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention triangle: cohort = week of a user's first "
    "event, cell = distinct users from that cohort active k weeks later. "
    "Two aggregates (per-user firsts; per-(user, week) distinct activity) "
    "+ one user-keyed join + the tiny (cohort, offset) rollup — all "
    "shuffles on user_id or coarser. Week arithmetic is integer epoch-us "
    "division on week-truncated UTC timestamps, exact in both engines.",
)
def evt_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", F.date_trunc("week", "first_ts").alias("cw"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            F.unix_micros("cw").alias("cohort_week_us"),
            F.expr("(unix_micros(aw) - unix_micros(cw)) div 604800000000").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week_us", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "txt_bpe_pair_counts",
    r"""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
               AS tok
        FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                     i -> tok[i:i+1])) AS pair
        FROM toks
        WHERE length(tok) >= 2
    )
    SELECT pair, count(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 50
    """,
    doc="The first BPE merge iteration at corpus scale: count every "
    "adjacent symbol pair inside the pre-tokens (same GPT-2-style "
    "pre-tokenizer as txt_bpe_pretokenize) and take the most frequent "
    "pairs — the argmax of this table IS the next merge rule a BPE "
    "trainer would add. Pre-tokenize and pair-expand are JVM regex + "
    "higher-order functions (no UDF); the pair counts collapse map-side "
    "before the single shuffle, and the top-k is the distributed "
    "TakeOrdered merge with ties broken on the pair itself. Re-running "
    "per merge round gives full distributed BPE training.",
)
def txt_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(
                F.col("text"), F.lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), F.lit(0)
            )
        ).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


@register(
    "dq_footer_profile",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(o_orderkey) AS min_o_orderkey,
           max(o_orderkey) AS max_o_orderkey,
           min(o_totalprice) AS min_o_totalprice,
           max(o_totalprice) AS max_o_totalprice
    FROM orders
    """,
    doc="Metadata-only dataset profile: COUNT/MIN/MAX answered from "
    "parquet FOOTER statistics via DSv2 aggregate pushdown "
    "(PushedAggregation in the plan, asserted in tests/test_plan_audit) "
    "— at 100 TB a footer pass instead of a full scan for the 'how many "
    "rows, what key range' query every pipeline runs first. The V2 "
    "reader is scoped to this call (sources/readers.py:"
    "parquet_footer_stats); the session default stays V1 for bucketing.",
)
def dq_footer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import parquet_footer_stats

    return parquet_footer_stats(
        spark, f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"]
    )


@register(
    "dq_column_profile",
    """
    SELECT 'c_acctbal' AS col,
           count(*) - count(c_acctbal) AS n_nulls,
           count(DISTINCT c_acctbal)   AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', count(*) - count(c_mktsegment),
           count(DISTINCT c_mktsegment) FROM customer
    UNION ALL
    SELECT 'c_name', count(*) - count(c_name),
           count(DISTINCT c_name) FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*) - count(c_nationkey),
           count(DISTINCT c_nationkey) FROM customer
    """,
    doc="Data-quality column profile (null counts + distinct cardinality "
    "per column) — the audit that gates every ingest. The Spark plan "
    "computes ALL columns' profiles in ONE scan + one aggregate (Spark "
    "expands multi-distinct into one Expand pass), then unpivots the "
    "single profile row with stack(); the 4-leg UNION in the oracle is "
    "DuckDB-side only. At 100 TB: one pass over the fact table instead "
    "of one scan per column.",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    prof = c.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            x
            for col in ("c_acctbal", "c_mktsegment", "c_name", "c_nationkey")
            for x in (
                F.count(col).alias(f"nn_{col}"),
                F.countDistinct(col).alias(f"nd_{col}"),
            )
        ],
    )
    legs = ", ".join(
        f"'{col}', n - nn_{col}, nd_{col}"
        for col in ("c_acctbal", "c_mktsegment", "c_name", "c_nationkey")
    )
    return prof.selectExpr(
        f"stack(4, {legs}) AS (col, n_nulls, n_distinct)"
    )


# ---------------------------------------------------------------------------
# Round-3 additions: repetition quality, contamination, mixing, cluster reps
# ---------------------------------------------------------------------------


@register(
    "txt_repetition_filter",
    """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    uni AS (
        SELECT doc_id, len(w) AS n_words,
               len(list_distinct(w)) AS n_distinct
        FROM w
    ),
    bg AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
        FROM w, unnest(range(1, len(w))) AS t(i)
    ),
    c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
    t AS (SELECT doc_id, max(c) AS top_bg FROM c GROUP BY doc_id)
    SELECT u.doc_id, u.n_words,
           round(u.n_distinct * 1.0 / u.n_words, 4) AS distinct_ratio,
           round(t.top_bg * 1.0 / (u.n_words - 1), 4) AS top_bigram_frac,
           CASE WHEN round(u.n_distinct * 1.0 / u.n_words, 4) >= 0.4
                 AND round(t.top_bg * 1.0 / (u.n_words - 1), 4) <= 0.05
                THEN 'keep' ELSE 'drop' END AS gate
    FROM uni u JOIN t USING (doc_id)
    """,
    doc="Gopher-style repetition quality filter (type-token ratio + "
    "most-repeated-bigram fraction + keep/drop gate). The Spark side is "
    "MAP-ONLY: the per-doc top-bigram count is a max-run-length fold over "
    "the SORTED bigram array (array_sort + aggregate HOF) — equal "
    "elements group under any total order, so no collation sensitivity — "
    "meaning the whole corpus filter is scan -> project with ZERO "
    "shuffles at 100 TB (plan-asserted). The oracle takes the "
    "explode + group-by route, which computes the same max bigram "
    "multiplicity. Gates compare the ROUNDED metrics in both engines so "
    "the keep/drop boundary cannot flip on last-ULP division noise.",
)
def txt_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    bga = F.array_sort(
        F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
        )
    )
    # Max run length of equal adjacent elements in the sorted bigram array
    # == max multiplicity of any bigram. Guard the size<2 sequence()
    # descending-range footgun explicitly.
    top_bg = F.expr(
        "if(size(bga) < 2, size(bga), aggregate("
        "  sequence(2, size(bga)),"
        "  named_struct('run', 1, 'best', 1),"
        "  (acc, i) -> if(element_at(bga, i) = element_at(bga, i - 1),"
        "    named_struct('run', acc.run + 1,"
        "                 'best', greatest(acc.best, acc.run + 1)),"
        "    named_struct('run', 1, 'best', acc.best)),"
        "  acc -> acc.best))"
    )
    m = base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        bga.alias("bga"),
    ).select(
        "doc_id",
        "n_words",
        F.round(F.col("n_distinct") / F.col("n_words"), 4).alias(
            "distinct_ratio"
        ),
        F.round(top_bg / (F.col("n_words") - 1), 4).alias("top_bigram_frac"),
    )
    gate = F.when(
        (F.col("distinct_ratio") >= 0.4) & (F.col("top_bigram_frac") <= 0.05),
        "keep",
    ).otherwise("drop")
    return m.withColumn("gate", gate)


@register(
    "txt_contamination_check",
    """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 4
    ),
    e AS (
        SELECT doc_id,
               unnest(list_distinct([list_aggregate(w[i:i+3], 'string_agg', ' ')
                                     FOR i IN range(1, len(w) - 2)])) AS sh
        FROM w
    ),
    bench AS (SELECT doc_id AS bid, sh FROM e WHERE doc_id % 23 = 0),
    corpus AS (SELECT doc_id, sh FROM e WHERE doc_id % 23 <> 0)
    SELECT c.doc_id,
           count(DISTINCT c.sh)  AS n_hit_shingles,
           count(DISTINCT b.bid) AS n_bench_docs
    FROM corpus c JOIN bench b USING (sh)
    GROUP BY c.doc_id
    """,
    doc="Benchmark-contamination check: word-4-gram overlap between the "
    "training corpus and a held-out benchmark set (deterministically "
    "keyed here as doc_id %% 23 == 0 so both engines agree). The "
    "decontamination pass every serious training pipeline runs before "
    "training. Scale shape: the benchmark side is a SMALL fixed suite -> "
    "its shingle set broadcasts; the corpus side is shingled map-side "
    "and never shuffles before the per-doc aggregate of HIT rows only — "
    "at 100 TB the join is a broadcast-hash probe at scan speed, and "
    "only contaminated (doc, shingle, bench) rows enter the exchange. "
    "(Here both sides derive from one table, so the plan shows two "
    "scans; in production the benchmark suite is its own tiny table and "
    "the corpus is scanned exactly once.)",
)
def txt_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 4)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(w) - 3),"
                        " i -> concat_ws(' ', slice(w, i, 4)))"
                    )
                )
            ).alias("sh"),
        )
    )
    bench = sh.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("bid"), "sh"
    )
    corpus = sh.filter(F.col("doc_id") % 23 != 0)
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_hit_shingles"),
            F.countDistinct("bid").alias("n_bench_docs"),
        )
    )


@register(
    "doc_mix_weights",
    """
    WITH s AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    s2 AS (
        SELECT source, n_docs, n_tokens,
               CAST(floor(sqrt(n_tokens) * 1000000 + 0.5) AS BIGINT) AS num_i
        FROM s
    ),
    tot AS (SELECT CAST(sum(num_i) AS BIGINT) AS z_i FROM s2)
    SELECT source, n_docs, n_tokens,
           floor(CAST(num_i AS DOUBLE) / CAST(z_i AS DOUBLE) * 1000000 + 0.5)
               / 1000000 AS mix_weight
    FROM s2, tot
    """,
    doc="Temperature-scaled source mixing weights (alpha = 0.5): "
    "w_s = sqrt(tokens_s) / sum_s' sqrt(tokens_s') — the domain-mixing "
    "knob that upweights small high-quality sources relative to raw "
    "proportional sampling. sqrt is IEEE-754 exactly rounded (unlike "
    "pow/ln, which differ between libm builds — same portability rule as "
    "the TF-IDF ratio idf), so both engines compute bit-identical "
    "per-source terms.  Cross-engine determinism: each term is first "
    "half-up rounded to integer micro-units (num_i BIGINT); the "
    "denominator z is the EXACT integer sum of those units, so its value "
    "cannot depend on accumulation order (the round-3 driver flake was a "
    "~1-ulp float-sum z flipping the 1e-6 half-up floor); the final "
    "weight is one exactly-rounded double division of two <2^53 "
    "integers.  One agg on source (tiny group count); the denominator "
    "attaches via the shared checkpointed-grand-total idiom "
    "(operators/scalars.py) — one fact scan, and the registry-wide "
    "sweep audit stays at ZERO global windows with no exceptions.",
)
def doc_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalars import checkpoint_with_scalar

    d = _t(spark, sf_dir, "documents")
    s, z = checkpoint_with_scalar(
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
        .withColumn(
            # half-up-rounded micro-sqrt units: BIGINT, so the grand total
            # below is an order-independent integer sum on both engines
            "num_i",
            F.floor(F.sqrt("n_tokens") * 1000000 + F.lit(0.5)),
        ),
        F.sum("num_i").alias("z_i"),
    )
    return s.crossJoin(z).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.floor(
                F.col("num_i").cast("double")
                / F.col("z_i").cast("double")
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("mix_weight"),
    )


_REP_TAIL = """
,
labeled AS (SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id),
joined AS (
    SELECT l.component, l.doc_id, d.n_chars
    FROM labeled l JOIN documents d USING (doc_id)
),
ranked AS (
    SELECT component, doc_id,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id) AS rk,
           count(*)    OVER (PARTITION BY component) AS n_members
    FROM joined
)
SELECT component, doc_id AS rep_doc_id, n_members
FROM ranked WHERE rk = 1
"""

# Share the recursive-CTE cluster derivation with dedup_cluster_assign's
# oracle and swap only its final SELECT for the per-cluster argmax.
_CLUSTER_FINAL = "SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id"
assert _CLUSTER_FINAL in _CLUSTER_ORACLE
_REP_ORACLE = _CLUSTER_ORACLE.replace(_CLUSTER_FINAL, "") .rstrip().rstrip(")") + ")" + _REP_TAIL


@register(
    "dedup_cluster_representative",
    _REP_ORACLE,
    doc="Duplicate-cluster representative selection — the 'which copy do we "
    "KEEP' step that turns cluster assignment into an actual dedup "
    "decision: per connected component, the member with the most content "
    "(n_chars DESC, doc_id as the deterministic tiebreak) plus the "
    "member count. Spark computes it as ONE grouped aggregate over the "
    "labels-x-documents join (max_by on a (n_chars, -doc_id) struct — "
    "no window, no second shuffle); the oracle takes the recursive-CTE + "
    "window route. The labels join is on doc_id, the same key the CC "
    "output is already hashed on. Edges come from the banded-LSH scale "
    "path (_cluster_pairs_lsh) like dedup_cluster_assign; the exact-pair "
    "composition remains the oracle/audit twin.",
)
def dedup_cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    labels = connected_components(
        _cluster_pairs_lsh(d), "doc_a", "doc_b"
    ).withColumnRenamed("node", "doc_id")
    m = labels.join(d.select("doc_id", "n_chars"), "doc_id")
    return m.groupBy("component").agg(
        F.expr(
            "max_by(doc_id, named_struct('a', n_chars, 'b', -doc_id))"
        ).alias("rep_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


# ---------------------------------------------------------------------------
# Clustering: k-means training (the IVF index build) and k-NN join
# ---------------------------------------------------------------------------


@register(
    "emb_kmeans_lloyd",
    """
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    seeds AS (
      SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, e
      FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 8) s
    ),
    d1 AS (
      SELECT emb.vec_id, emb.e, seeds.cid,
             floor(list_distance(emb.e, seeds.e) * 1e9 + 0.5) / 1e9 AS d
      FROM emb CROSS JOIN seeds
    ),
    a1 AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d1) t WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, list(cv ORDER BY pos) AS e FROM (
        SELECT cid, pos, floor(avg(v) * 1e6 + 0.5) / 1e6 AS cv FROM (
          SELECT cid, unnest(e) AS v, unnest(generate_series(1, len(e))) AS pos
          FROM a1) u GROUP BY cid, pos) g GROUP BY cid
    ),
    d2 AS (
      SELECT emb.vec_id, c1.cid,
             floor(list_distance(emb.e, c1.e) * 1e9 + 0.5) / 1e9 AS d
      FROM emb CROSS JOIN c1
    ),
    a2 AS (
      SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d2) t WHERE rn = 1
    )
    SELECT cid AS cluster_id, count(*) AS n_members,
           floor(avg(d) * 1e4 + 0.5) / 1e4 AS avg_dist,
           min(vec_id) AS first_member_id
    FROM a2 GROUP BY cid
    """,
    doc="Distributed k-means trainer (Lloyd, k=8, 2 assignment rounds from "
    "lowest-id seeds) — the 100 TB way to BUILD the centroid table that "
    "ivf_assign searches with. Assignment is map-only (centroids are a "
    "driver-held k x dim model embedded as plan literals, argmin via "
    "array_sort over (dist, cid) structs); the update is posexplode + one "
    "hash aggregate whose exchange carries k x dim partials, never n x dim "
    "rows. Distances round to 9 dp pre-argmin and refined centroids to "
    "6 dp pre-round-2, so a DuckDB oracle replays the whole iteration "
    "bit-identically. Output: per-cluster size, mean distance, lowest "
    "member id (operators/clustering.py:kmeans_lloyd).",
)
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_lloyd

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    assigned = kmeans_lloyd(e, k=8, iters=2, id_col="vec_id", vec_col="e")
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.floor(F.avg("d") * 1e4 + 0.5) / 1e4).alias("avg_dist"),
        F.min("vec_id").alias("first_member_id"),
    )


# DuckDB replay of kmeans_lloyd(k=8, iters=2, lowest-id seeds) ending in an
# ``a2(vec_id, e, cid)`` assignment relation — the same iteration the
# emb_kmeans_lloyd oracle replays, re-used by the SemDeDup oracle below.
_KMEANS_ASSIGN_CTE = """
    emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    seeds AS (
      SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, e
      FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 8) s
    ),
    d1 AS (
      SELECT emb.vec_id, emb.e, seeds.cid,
             floor(list_distance(emb.e, seeds.e) * 1e9 + 0.5) / 1e9 AS d
      FROM emb CROSS JOIN seeds
    ),
    a1 AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d1) t WHERE rn = 1
    ),
    c1 AS (
      SELECT cid, list(cv ORDER BY pos) AS e FROM (
        SELECT cid, pos, floor(avg(v) * 1e6 + 0.5) / 1e6 AS cv FROM (
          SELECT cid, unnest(e) AS v, unnest(generate_series(1, len(e))) AS pos
          FROM a1) u GROUP BY cid, pos) g GROUP BY cid
    ),
    d2 AS (
      SELECT emb.vec_id, emb.e, c1.cid,
             floor(list_distance(emb.e, c1.e) * 1e9 + 0.5) / 1e9 AS d
      FROM emb CROSS JOIN c1
    ),
    a2 AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d2) t WHERE rn = 1
    )
"""


@register(
    "dedup_semantic",
    f"""
    WITH {_KMEANS_ASSIGN_CTE},
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             floor(list_cosine_similarity(a.e, b.e) * 1e6 + 0.5) / 1e6 AS c
      FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    dropped AS (
      SELECT ib AS vec_id, min(ia) AS dup_of FROM p WHERE c >= 0.45 GROUP BY ib
    )
    SELECT a2.vec_id, a2.cid AS cluster_id,
           CASE WHEN d.vec_id IS NULL THEN 'kept'
                ELSE 'dropped_semantic' END AS verdict,
           d.dup_of
    FROM a2 LEFT JOIN dropped d USING (vec_id)
    """,
    doc="SemDeDup semantic deduplication (Abbas et al. 2023): k-means the "
    "embedding space (the driver-replayable Lloyd trainer, k=8 x 2 "
    "rounds, lowest-id seeds), then near-dup search ONLY within clusters "
    "— all-pairs cosine's n^2/2 collapses to sum(|cluster|^2) (15.6k of "
    "124.7k pairs here, and at corpus scale k grows with n so cluster "
    "size stays bounded and the cluster-keyed self-join parallelizes). "
    "Verdict: dropped iff a lower-id cluster member has cosine >= 0.45 "
    "(the deterministic keep-lowest-id variant of the paper's keep-one "
    "rule); dup_of = that lowest id. Cosine half-up floored to 6 dp on "
    "both engines pre-threshold; 2-ulp accumulation margins asserted in "
    "tests/test_dedup_similarity.py "
    "(operators/clustering.py:semantic_dedup).",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    return semantic_dedup(e, tau=0.45, k=8, iters=2)


@register(
    "sim_knn_join",
    """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e FROM emb WHERE vec_id % 50 = 0),
    c AS (SELECT vec_id AS neighbor_id, e FROM emb WHERE vec_id % 50 <> 0),
    p AS (
      SELECT q.query_id, c.neighbor_id,
             floor(list_cosine_similarity(q.e, c.e) * 1e6 + 0.5) / 1e6
               AS cosine
      FROM q CROSS JOIN c)
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM p) t WHERE rk <= 3
    """,
    doc="k-NN JOIN: top-3 cosine neighbors for EVERY query in a query set "
    "(vs sim_topk_bruteforce's single query). The query side is a "
    "driver-held matrix (bounded by contract); ONE mapInPandas corpus "
    "pass scores each Arrow batch against all queries with a single BLAS "
    "matmul and emits only per-batch top-k candidates — selected by an "
    "integer composite key that reproduces the global (cosine DESC, id) "
    "order exactly — so the final per-query window sees O(partitions x "
    "|Q| x k) rows, never the |Q| x |C| pair table "
    "(operators/clustering.py:knn_join).",
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import knn_join

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    q = emb.filter(F.col("vec_id") % 50 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    c = emb.filter(F.col("vec_id") % 50 != 0).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    return knn_join(q, c, k=3)


@register(
    "evt_rolling_24h",
    """
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      FROM events
    )
    SELECT event_id, user_id, ts_us,
           count(*) OVER w AS n_24h,
           CAST(sum(c) OVER w AS BIGINT) / 100.0 AS sum_24h,
           floor(CAST(sum(c) OVER w AS BIGINT) * 100.0
                 / count(*) OVER w + 0.5) / 10000 AS avg_24h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-24-hour rolling aggregates per user (RANGE frame over "
    "epoch-microseconds — a TIME-based sliding window, not a row-count "
    "frame: the frame widens and narrows with event density, the shape "
    "rowsBetween cannot express). One shuffle on user_id + one sort; "
    "Spark's range-frame executor buffers only the current frame span per "
    "partition, so memory is bounded by events-per-24h, not by user "
    "history. Epoch-us frame bounds and lossless integer-cent sums keep "
    "every emitted value engine-exact (the frames are float-free).",
)
def evt_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lossless integer cents make the frame sums exact, so the rolling
    # aggregates cannot drift with the engines' different sliding-frame
    # accumulation strategies (incremental add/remove vs segment tree).
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("c").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        n.alias("n_24h"),
        (s / 100.0).alias("sum_24h"),
        (F.floor(s * 100.0 / n + 0.5) / 10000).alias("avg_24h"),
    )


@register(
    "txt_unigram_surprisal",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    model AS (
        SELECT term, count(*) AS n FROM toks GROUP BY term
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM model),
    model_p AS (
        SELECT term,
               CAST(floor(-log2(n * 1.0 / tot) * 1000000 + 0.5) AS BIGINT)
                   AS surprisal_micro
        FROM model, tot
    )
    SELECT t.doc_id, count(*) AS n_toks,
           floor(CAST(sum(m.surprisal_micro) AS BIGINT)
                 / (count(*) * 100.0) + 0.5) / 10000 AS mean_surprisal,
           floor(max(m.surprisal_micro) / 100.0 + 0.5) / 10000
               AS max_surprisal
    FROM toks t JOIN model_p m USING (term)
    GROUP BY t.doc_id
    """,
    doc="Perplexity-proxy quality score: train a corpus unigram LM (one "
    "token aggregate, materialized once via eager localCheckpoint; the "
    "normalizer is a distributed scalar aggregate over the checkpointed "
    "vocab — never a single-partition window sort, which would break "
    "when web-scale token vocab reaches billions of rows), broadcast "
    "it, and score every document's mean/max token surprisal in a "
    "second pass. The classic two-pass train-then-score shape: the "
    "model is O(vocab), so scoring is a broadcast hash join + one "
    "doc-keyed aggregate (past broadcast size, drop the hint and AQE "
    "keeps it a shuffle join on term). Gibberish and boilerplate land "
    "in the distribution tails, which is how CCNet-style pipelines "
    "bucket quality.",
)
def txt_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    from ..operators.scalars import checkpoint_with_scalar

    model, total = checkpoint_with_scalar(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("n")),
        F.sum("n").alias("tot"),
    )
    # Per-term surprisal is rounded to BIGINT micro-units BEFORE the
    # per-doc aggregation, so the mean comes from an order-independent
    # integer sum (the r3 doc_mix_weights lesson: a float avg's
    # accumulation order differs across partitionings and engines, and a
    # floor at the 1e-4 boundary can flip on a ~ulp difference).
    model_p = model.crossJoin(total).select(
        "term",
        F.floor(-F.log2(F.col("n") * 1.0 / F.col("tot")) * 1000000 + 0.5)
        .cast("long")
        .alias("surprisal_micro"),
    )
    return (
        toks.join(F.broadcast(model_p), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("surprisal_micro").alias("sum_micro"),
            F.max("surprisal_micro").alias("max_micro"),
        )
        .select(
            "doc_id",
            "n_toks",
            (
                F.floor(
                    F.col("sum_micro") / (F.col("n_toks") * 100.0) + 0.5
                )
                / 10000
            ).alias("mean_surprisal"),
            (F.floor(F.col("max_micro") / 100.0 + 0.5) / 10000).alias(
                "max_surprisal"
            ),
        )
    )


@register(
    "txt_bigram_lm_surprisal",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT unnest(t) AS term FROM toks
    ),
    uc AS (SELECT term, count(*) AS n FROM uni GROUP BY term),
    vocab AS (SELECT count(*) AS v FROM uc),
    pairs AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    bc AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY w1, w2),
    model AS (
        SELECT bc.w1, bc.w2,
               CAST(floor(-log2((bc.nb + 1.0) / (uc.n + vocab.v))
                          * 1000000 + 0.5) AS BIGINT) AS s_micro
        FROM bc JOIN uc ON bc.w1 = uc.term CROSS JOIN vocab
    )
    SELECT p.doc_id, count(*) AS n_bigrams,
           floor(CAST(sum(m.s_micro) AS BIGINT)
                 / (count(*) * 100.0) + 0.5) / 10000 AS mean_surprisal,
           floor(max(m.s_micro) / 100.0 + 0.5) / 10000 AS max_surprisal
    FROM pairs p JOIN model m ON p.w1 = m.w1 AND p.w2 = m.w2
    GROUP BY p.doc_id
    """,
    doc="Bigram-LM perplexity proxy with add-one smoothing — the stronger "
    "sibling of txt_unigram_surprisal (a unigram LM scores word CHOICE; "
    "the bigram model scores word ORDER, so shuffled/boilerplate text "
    "that fools unigram stats lands in this tail). p(w2|w1) = "
    "(c(w1,w2)+1)/(c(w1)+V). Bigram extraction is MAP-ONLY: the token "
    "array is sliced and zipped per row (no posexplode self-join, no "
    "lead() window — a window would shuffle the whole corpus on doc_id "
    "just to pair adjacent tokens). Model build is two hash aggregates "
    "(term; (w1,w2) pair); V is a distributed scalar over the "
    "checkpointed vocab (never a single-partition window). Scoring "
    "re-joins pairs to the model on (w1,w2) — the model side is already "
    "hashed on that key from its own aggregate, so the exchange is "
    "reused; at web scale the bigram model outgrows broadcast, and the "
    "shuffle join is the right default (AQE flips small models back to "
    "broadcast at runtime). Per-pair surprisal is rounded to integer "
    "micros in the MODEL (once per distinct bigram), so per-doc sums are "
    "order-independent integer sums; only the ~1-ulp cross-libm log2 "
    "exposure remains, same accepted class as txt_unigram_surprisal. "
    "Docs under 2 tokens have no bigrams and emit no row on either "
    "engine (inner-join semantics).",
)
def txt_bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalars import checkpoint_with_scalar

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    uc_base = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uc, vocab = checkpoint_with_scalar(uc_base, F.count(F.lit(1)).alias("v"))
    # map-only adjacent-pair extraction: zip the array against itself
    # shifted by one — no join, no window
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("w1"),
                    F.slice("t", 2, F.size("t") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    model = (
        bc.join(F.broadcast(uc.withColumnRenamed("term", "w1")), "w1")
        .crossJoin(vocab)
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log2((F.col("nb") + 1.0) / (F.col("n") + F.col("v")))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("s_micro").alias("sum_micro"),
            F.max("s_micro").alias("max_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.floor(F.col("sum_micro") / (F.col("n_bigrams") * 100.0) + 0.5)
                / 10000
            ).alias("mean_surprisal"),
            (F.floor(F.col("max_micro") / 100.0 + 0.5) / 10000).alias(
                "max_surprisal"
            ),
        )
    )


@register(
    "txt_span_dedup",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(CAST(ceil(len(toks) / 5.0) AS BIGINT))) AS span_idx
        FROM toks
    ),
    spans AS (
        SELECT doc_id, span_idx,
               array_to_string(toks[span_idx * 5 + 1 : span_idx * 5 + 5], ' ')
                   AS span
        FROM idx
    ),
    ranked AS (
        SELECT doc_id, span_idx,
               row_number() OVER (
                   PARTITION BY span ORDER BY doc_id, span_idx) AS rn
        FROM spans
    )
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM ranked GROUP BY doc_id
    """,
    doc="Sub-document (span-level) exact dedup, the C4/CCNet line-dedup "
    "shape: chunk every document into consecutive 5-token spans, keep "
    "each distinct span's FIRST occurrence corpus-wide (ordered by "
    "doc_id, then position), and report kept/dropped span counts per "
    "document. Chunking is map-only (one transform+posexplode, no UDF); "
    "first-occurrence selection is one window keyed on the span itself — "
    "partitioned by span, so boilerplate-heavy corpora shard across the "
    "cluster by span hash rather than funneling anywhere. At 100 TB the "
    "span relation is corpus-sized but the shuffle carries (hash, doc_id, "
    "idx) only; swap the span string for xxhash64(span) to shrink the "
    "exchange further (kept as text here so the oracle is "
    "engine-portable).",
)
def txt_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    spans = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(toks) / 5.0) as int) - 1), "
                "i -> array_join(slice(toks, i * 5 + 1, 5), ' '))"
            )
        ).alias("span_idx", "span"),
    )
    w = Window.partitionBy("span").orderBy("doc_id", "span_idx")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    "doc_quality_zscore_bucket",
    """
    WITH scored AS (
        SELECT doc_id,
               CAST(floor(length(text) * 1000.0 /
                    len(string_split(text, ' '))) AS BIGINT) AS s
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS n,
               CAST(sum(s) AS BIGINT) AS s1,
               CAST(sum(s * s) AS BIGINT) AS s2
        FROM scored
    )
    SELECT doc_id, z,
           CASE WHEN z < -1.0 THEN 'head'
                WHEN z > 1.0 THEN 'tail'
                ELSE 'middle' END AS bucket
    FROM (
        SELECT doc_id,
               floor((s - s1 * 1.0 / n) /
                     sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1.0))
                     * 10000 + 0.5) / 10000 AS z
        FROM scored, stats
    )
    """,
    doc="Corpus-relative quality bucketing (the CCNet head/middle/tail "
    "cut): score each document (mean token length in exact integer "
    "milli-units), compute the corpus moments (n, sum, sum-of-squares) as "
    "EXACT integer sums in one distributed scalar aggregate — so mu/sigma "
    "and every z are bit-identical across partitionings and engines, "
    "never a summation-order-dependent float accumulation — broadcast "
    "that single row back, and bucket every document by z-score. Two source scans by design: "
    "re-scanning the SOURCE table is the cheap branch of the "
    "single-subtree rule (the stats subtree is scan+agg, nothing "
    "expensive to re-derive), and the per-doc pass stays map-only — "
    "scan, broadcast-attach one row, project. No shuffle of the corpus "
    "at all.",
)
def doc_quality_zscore_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Integer milli-unit score -> the corpus moments (n, S1, S2) are EXACT
    # integer sums, so mu/sigma — and therefore every z and bucket — are
    # bit-identical regardless of partitioning or engine. The r3
    # doc_mix_weights lesson applied: never round a float ACCUMULATION;
    # accumulate integers and derive the float once, deterministically.
    # Bounds: s ~ 5e3 milli-units -> s^2 ~ 2.5e7, so S2 stays inside
    # BIGINT up to ~1e11 documents; past that, combine per-shard moments
    # as decimals.
    s_int = F.floor(
        F.length("text") * 1000.0 / F.size(F.split("text", " "))
    ).cast("long")
    scored = d.select("doc_id", s_int.alias("s"))
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("s1"),
        F.sum(F.col("s") * F.col("s")).alias("s2"),
    )
    mu = F.col("s1") * 1.0 / F.col("n")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1.0)
    )
    z4 = F.floor((F.col("s") - mu) / sigma * 10000 + 0.5) / 10000
    return (
        scored.crossJoin(F.broadcast(stats))
        .select("doc_id", z4.alias("z"))
        .select(
            "doc_id",
            "z",
            F.when(F.col("z") < -1.0, "head")
            .when(F.col("z") > 1.0, "tail")
            .otherwise("middle")
            .alias("bucket"),
        )
    )


@register(
    "doc_length_batches",
    """
    WITH sized AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_toks
        FROM documents
    ),
    banded AS (
        SELECT doc_id, n_toks,
               CAST(floor(n_toks / 8) AS BIGINT) AS band,
               row_number() OVER (
                   PARTITION BY CAST(floor(n_toks / 8) AS BIGINT)
                   ORDER BY n_toks, doc_id) AS rn
        FROM sized
    )
    SELECT band,
           CAST(floor((rn - 1) / 16) AS BIGINT) AS batch_idx,
           count(*) AS n_docs,
           max(n_toks) AS max_toks,
           CAST(count(*) * max(n_toks) - sum(n_toks) AS BIGINT) AS pad_waste
    FROM banded
    GROUP BY band, floor((rn - 1) / 16)
    """,
    doc="Sequence-length-bucketed batching — group documents of similar "
    "token count into fixed-size batches so per-batch padding (to the "
    "batch max) is minimized; pad_waste is the padding-token bill the "
    "trainer pays per batch. One shuffle on the length band for the "
    "within-band ordering window, one AQE-coalesced aggregate on "
    "(band, batch_idx). Bands (width 8) bound both the padding per batch "
    "AND the window partition size; at 100 TB the band width is the "
    "parallelism/padding trade knob — narrower bands shard finer and pad "
    "less (a length histogram picks the width; skewed corpora sub-salt "
    "the dominant band). Deterministic: ordering key (n_toks, doc_id) is "
    "unique, all outputs integer.",
)
def doc_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    band = F.floor(F.col("n_toks") / 8).cast("bigint")
    w = Window.partitionBy(band).orderBy("n_toks", "doc_id")
    banded = sized.select(
        "doc_id",
        "n_toks",
        band.alias("band"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        banded.groupBy(
            "band",
            F.floor((F.col("rn") - 1) / 16).cast("bigint").alias("batch_idx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_toks").alias("max_toks"),
            (F.count(F.lit(1)) * F.max("n_toks") - F.sum("n_toks"))
            .cast("bigint")
            .alias("pad_waste"),
        )
    )


@register(
    "dedup_incremental_batch",
    """
    WITH fp AS (
        SELECT doc_id, source, md5(lower(trim(text))) AS fingerprint
        FROM documents
    ),
    batch AS (
        SELECT doc_id, fingerprint,
               row_number() OVER (
                   PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM fp WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
    ),
    index_fps AS (
        SELECT DISTINCT fingerprint
        FROM fp WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4')
    )
    SELECT b.doc_id,
           CASE WHEN i.fingerprint IS NOT NULL THEN 'dup_of_index'
                WHEN b.rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS verdict
    FROM batch b LEFT JOIN index_fps i USING (fingerprint)
    """,
    doc="Incremental dedup — the production shape for continuous crawl "
    "ingestion: an incoming batch (sources src0-src4 here) dedups "
    "against the EXISTING corpus index without re-deduping the corpus "
    "itself. Per batch doc: 'dup_of_index' (fingerprint already "
    "ingested), 'dup_in_batch' (first occurrence wins within the batch, "
    "by doc_id), else 'new'. One fingerprint-keyed window over the "
    "batch + one left join against the distinct index fingerprints — "
    "window and join share the same shuffle key, so the exchange is "
    "reused. At 100 TB the index side is a persisted fingerprint table "
    "(corpus-sized, so a shuffle hash join — never broadcast) and only "
    "the BATCH is scanned fresh; the pushed source-IN filters mean "
    "neither side reads the other's bytes.",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    batch_srcs = ["src0", "src1", "src2", "src3", "src4"]
    fp = _content_fingerprint()
    batch = (
        d.filter(F.col("source").isin(batch_srcs))
        .select("doc_id", fp.alias("fingerprint"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
    )
    index_fps = (
        d.filter(~F.col("source").isin(batch_srcs))
        .select(fp.alias("fingerprint"))
        .distinct()
        .withColumn("in_index", F.lit(1))
    )
    return batch.join(index_fps, "fingerprint", "left").select(
        "doc_id",
        F.when(F.col("in_index").isNotNull(), "dup_of_index")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("new")
        .alias("verdict"),
    )


@register(
    "dq_expectations_check",
    """
    WITH o AS (
        SELECT count(*) AS n_rows,
               count(DISTINCT o_orderkey) AS n_keys,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_null_cust
        FROM orders
    ),
    l AS (
        SELECT sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) AS n_qty_oob,
               sum(CASE WHEN l_shipdate <  TIMESTAMP '1992-01-01 00:00:00'
                          OR l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
                        THEN 1 ELSE 0 END) AS n_date_oob
        FROM lineitem
    ),
    fk AS (
        SELECT count(*) AS n_orphans
        FROM lineitem li LEFT JOIN orders oo ON li.l_orderkey = oo.o_orderkey
        WHERE oo.o_orderkey IS NULL
    )
    SELECT 'orders.o_orderkey unique' AS expectation,
           CAST(n_rows - n_keys AS BIGINT) AS violations,
           n_rows = n_keys AS passed FROM o
    UNION ALL
    SELECT 'orders.o_custkey not null',
           CAST(n_null_cust AS BIGINT), n_null_cust = 0 FROM o
    UNION ALL
    SELECT 'lineitem.l_quantity in [1,50]',
           CAST(n_qty_oob AS BIGINT), n_qty_oob = 0 FROM l
    UNION ALL
    SELECT 'lineitem.l_shipdate in [1992,1999)',
           CAST(n_date_oob AS BIGINT), n_date_oob = 0 FROM l
    UNION ALL
    SELECT 'lineitem.l_orderkey references orders',
           CAST(n_orphans AS BIGINT), n_orphans = 0 FROM fk
    """,
    doc="Declarative data-quality gate (the Deequ/Great-Expectations "
    "shape) — the admission check a training pipeline runs before a "
    "batch enters the corpus: uniqueness, completeness, range, and "
    "referential-integrity expectations evaluated to one row each with "
    "the violation count. All per-table metrics for a table fuse into "
    "ONE scan's aggregate (map-side partials, 1-row output); the FK "
    "expectation is the only join — left-anti count against the orders "
    "key set, which at dim-scale broadcasts and at fact-scale is one "
    "key-only shuffle. The expectation rows themselves are 1-row "
    "relations unioned driver-free.",
)
def dq_expectations_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    om = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "n_null_cust"
        ),
    ).localCheckpoint(eager=True)  # 1 row; reused by two union branches
    lm = li.agg(
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).alias("n_qty_oob"),
        F.sum(
            F.when(
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("n_date_oob"),
    ).localCheckpoint(eager=True)  # 1 row; reused by two union branches
    fk = (
        li.select("l_orderkey")
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    row = F.lit  # brevity

    def expect(src, name, violations, passed):
        return src.select(
            row(name).alias("expectation"),
            violations.cast("bigint").alias("violations"),
            passed.alias("passed"),
        )

    return (
        expect(
            om,
            "orders.o_orderkey unique",
            F.col("n_rows") - F.col("n_keys"),
            F.col("n_rows") == F.col("n_keys"),
        )
        .unionAll(
            expect(
                om,
                "orders.o_custkey not null",
                F.col("n_null_cust"),
                F.col("n_null_cust") == 0,
            )
        )
        .unionAll(
            expect(
                lm,
                "lineitem.l_quantity in [1,50]",
                F.col("n_qty_oob"),
                F.col("n_qty_oob") == 0,
            )
        )
        .unionAll(
            expect(
                lm,
                "lineitem.l_shipdate in [1992,1999)",
                F.col("n_date_oob"),
                F.col("n_date_oob") == 0,
            )
        )
        .unionAll(
            expect(
                fk,
                "lineitem.l_orderkey references orders",
                F.col("n_orphans"),
                F.col("n_orphans") == 0,
            )
        )
    )


@register(
    "ml_quality_classifier_train",
    """
    WITH feat AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               length(text) * 1.0 / len(string_split(text, ' ')) AS x1,
               len(string_split(text, ' ')) / 100.0 AS x2
        FROM documents
    ),
    g1 AS (  -- round 1: w = 0, so p = 0.5 exactly (no exp needed)
        SELECT avg(0.5 - y) AS g0,
               avg((0.5 - y) * x1) AS g1,
               avg((0.5 - y) * x2) AS g2
        FROM feat
    ),
    w1 AS (
        SELECT floor(-0.5 * g0 * 1e9 + 0.5) / 1e9 AS w0,
               floor(-0.5 * g1 * 1e9 + 0.5) / 1e9 AS w1,
               floor(-0.5 * g2 * 1e9 + 0.5) / 1e9 AS w2
        FROM g1
    ),
    g2 AS (
        SELECT avg(1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) AS g0,
               avg((1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) * x1)
                   AS g1,
               avg((1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) - y) * x2)
                   AS g2,
               any_value(w0) AS pw0, any_value(w1) AS pw1, any_value(w2) AS pw2
        FROM feat, w1
    ),
    w2 AS (
        SELECT floor((pw0 - 0.5 * g0) * 1e9 + 0.5) / 1e9 AS w0,
               floor((pw1 - 0.5 * g1) * 1e9 + 0.5) / 1e9 AS w1,
               floor((pw2 - 0.5 * g2) * 1e9 + 0.5) / 1e9 AS w2
        FROM g2
    )
    SELECT doc_id, p, p >= 0.5 AS pred, y FROM (
        SELECT f.doc_id,
               floor(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2)))
                     * 1e6 + 0.5) / 1e6 AS p,
               CAST(f.y AS BIGINT) AS y
        FROM feat f, w2 w
    )
    """,
    doc="Distributed quality-classifier training — the fasttext-style "
    "linear gate LLM pipelines train to score crawl quality: full-batch "
    "gradient-descent logistic regression (label: lang='en'; features: "
    "mean token length, scaled token count — exact integer ratios). Each "
    "GD round is ONE aggregate whose d+1-double gradient is the only "
    "driver traffic (operators/clustering.py:logreg_train_gd, same "
    "bounded-index contract as the k-means trainer); the feature "
    "relation is checkpointed once so rounds re-read blocks, not text. "
    "Weights round to 9 dp per round, which lets the oracle replay both "
    "rounds bit-identically (round 1 needs no exp at all; round 2's "
    "~1-ulp libm exp differences vanish under averaging + rounding). "
    "Output: per-doc score, hard prediction, label.",
)
def ml_quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import logreg_train_gd

    d = _t(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    feat = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        _mean_token_len().alias("x1"),
        (n_toks / 100.0).alias("x2"),
    ).localCheckpoint(eager=True)
    w = logreg_train_gd(feat, ["x1", "x2"], "y", lr=0.5, iters=2)
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # pred derives from the ROUNDED p (the value both engines hash), so a
    # ~1-ulp libm exp() difference cannot flip a boundary prediction.
    return feat.select(
        "doc_id",
        (F.floor(p * 1e6 + 0.5) / 1e6).alias("p"),
        F.col("y").cast("bigint").alias("y"),
    ).select(
        "doc_id", "p", (F.col("p") >= 0.5).alias("pred"), "y"
    ).select("doc_id", "p", "pred", "y")


@register(
    "emb_pca_power_iteration",
    """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cr AS (
        SELECT i, j, floor(sum(e[i] * e[j]) * 1e6 + 0.5) / 1e6 AS c
        FROM emb,
             unnest(generate_series(1, 64)) AS ti(i),
             unnest(generate_series(1, 64)) AS tj(j)
        GROUP BY i, j
    ),
    v1r AS (SELECT i, sum(c) * 0.125 AS w FROM cr GROUP BY i),
    n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM v1r),
    v1 AS (SELECT i, floor(w / nrm * 1e9 + 0.5) / 1e9 AS v FROM v1r, n1),
    v2r AS (
        SELECT cr.i, sum(cr.c * v1.v) AS w
        FROM cr JOIN v1 ON cr.j = v1.i GROUP BY cr.i
    ),
    n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM v2r),
    v2 AS (SELECT i, floor(w / nrm * 1e9 + 0.5) / 1e9 AS v FROM v2r, n2),
    proj AS (
        SELECT vec_id, sum(e[t.i] * v2.v) AS p
        FROM emb, unnest(generate_series(1, len(e))) AS t(i)
        JOIN v2 ON v2.i = t.i
        GROUP BY vec_id
    )
    SELECT vec_id, floor(p * 1e6 + 0.5) / 1e6 AS pc1 FROM proj
    """,
    doc="Distributed power iteration toward the corpus Gram matrix's top "
    "direction — the dimensionality-reduction pass of an embedding "
    "pipeline (operators/clustering.py:power_iteration_top_direction). "
    "The Gram matrix is ONE corpus pass: a BLAS X^T.X per Arrow batch "
    "emitting 64x64 partials (the outer-product explode would be 4096 "
    "JVM rows per vector; the matmul is the documented vectorization "
    "exception), summed into a d^2-row relation — bounded at any corpus "
    "size, so it lands driver-side under the same bounded-index contract "
    "as the k-means centroids. Two iteration rounds run on the driver "
    "with 9-dp rounding per round (Gram entries rounded 6 dp first), "
    "which the oracle replays bit-identically in SQL; the projection "
    "back onto the corpus is map-only with the final direction as a "
    "literal. Start vector 1/sqrt(64) = 0.125 is exactly representable, "
    "so round 1 is pure rational arithmetic. Convergence is the "
    "standard (lambda2/lambda1)^k rate and needs a spectral gap: the "
    "driver's synthetic embeddings are isotropic by construction "
    "(lambda1/lambda2 ~ 1.07), so THIS registered operating point "
    "exercises the distributed machinery and its cross-engine replay; "
    "the planted-spike test (test_clustering.py) demonstrates the "
    "convergent regime the operator exists for.",
)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import power_iteration_top_direction

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    v = power_iteration_top_direction(e, "e", iters=2)
    varr = F.array(*[F.lit(float(x)) for x in v])
    proj = F.aggregate(
        F.zip_with("e", varr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id", (F.floor(proj * 1e6 + 0.5) / 1e6).alias("pc1")
    )


@register(
    "doc_training_order",
    """
    WITH keyed AS (
        SELECT doc_id,
               strpos('0123456789abcdef',
                      substr(md5(lower(trim(text))), 1, 1)) - 1 AS shard,
               substr(md5(lower(trim(text))), 2, 16) AS ord_key
        FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           row_number() OVER (
               PARTITION BY shard ORDER BY ord_key, doc_id) AS position
    FROM keyed
    """,
    doc="Deterministic global training-order shuffle: every document gets "
    "a reproducible (shard, position) — shard from the content "
    "fingerprint's first nibble (same layout as doc_shard_manifest), "
    "position by the next 16 hex digits (tie-broken on doc_id). "
    "Content-keyed, so the order is stable across runs, engines, and "
    "input partitionings — unlike orderBy(rand(seed)), whose result "
    "depends on the physical split layout. One window per shard (hash-"
    "keyed, so the corpus shards across the cluster); readers stream "
    "shard files in position order and get the same epoch permutation "
    "everywhere. For a different epoch, salt the md5 input with the "
    "epoch number.",
)
def doc_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    keyed = d.select(
        "doc_id",
        (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
        ).cast("bigint").alias("shard"),
        F.substring(h, 2, 16).alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("position")
    )


@register(
    "evt_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           floor(n * 1.0 / sum(n) OVER (PARTITION BY prev_type)
                 * 1000000 + 0.5) / 1000000 AS p
    FROM t
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences — the user-journey / session-flow analytics primitive. "
    "One user-keyed lag window (the corpus shards by user), one hash "
    "aggregate down to the BOUNDED |types|^2 transition relation, and "
    "row-normalization as a window over that post-agg relation "
    "(partitioned by prev_type — the doc_mix_weights bounded-denominator "
    "case, never a data-scale window). Ordering ties break on event_id, "
    "so the lag sequence is deterministic.",
)
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    wseq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(wseq).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        (
            F.floor(F.col("n") * 1.0 / F.sum("n").over(wrow) * 1000000 + 0.5)
            / 1000000
        ).alias("p"),
    )


@register(
    "evt_user_zscore_outliers",
    """
    WITH ev AS (
        SELECT event_id, user_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    stats AS (
        SELECT user_id, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2,
               min(c) AS mn, max(c) AS mx
        FROM ev GROUP BY user_id
    ),
    z AS (
        SELECT e.event_id, e.user_id,
               floor((e.c - s.s1 * 1.0 / s.n) /
                     sqrt((s.s2 - s.s1 * 1.0 * s.s1 / s.n) / (s.n - 1.0))
                     * 10000 + 0.5) / 10000 AS z
        FROM ev e JOIN stats s USING (user_id)
        WHERE s.n > 1 AND s.mn < s.mx
    )
    SELECT event_id, user_id, z FROM z WHERE abs(z) > 3.0
    """,
    doc="Per-entity outlier detection — the anomaly/noise filter a "
    "training pipeline runs per source/user/session rather than "
    "globally: z-score each event against ITS OWN user's mean/stddev "
    "and keep |z| > 3. Per-key two-pass normalization: one hash "
    "aggregate to the |users|-row stats relation, one equi-join back on "
    "the same user_id key (both sides hash-partition on user_id, so the "
    "stats attach rides the aggregate's own exchange layout; at dim-"
    "scale AQE broadcasts the stats side instead). Values are lossless "
    "integer cents, so the per-user moments are exact integer sums and "
    "every z is bit-identical across partitionings/engines; the outlier "
    "cut runs on the 4-dp-rounded z and the sigma>0 guard is the exact, "
    "overflow-free condition min(c) < max(c). Single-event users drop "
    "via n > 1.",
)
def evt_user_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Event values are 2-decimal data: half-up rounding to integer cents is
    # lossless, and the per-user moments (n, S1, S2) become EXACT integer
    # sums — mu/sigma and every z are then bit-identical across
    # partitionings and engines. The sigma>0 guard is min(c) < max(c) —
    # exactly equivalent to sample variance > 0 and overflow-free (the
    # naive s2*n > s1*s1 product would exceed BIGINT around 1e9 events
    # per user at ~$100 values). S2 itself is exact up to ~1e9 such
    # events per user (c^2 ~ 1e8 -> s2 ~ 1e17 < 2^63); past that, shard
    # the user's moments and combine as decimals.
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
    )
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
    )
    mu = F.col("s1") * 1.0 / F.col("n")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1.0)
    )
    z4 = F.floor((F.col("c") - mu) / sigma * 10000 + 0.5) / 10000
    return (
        ev.join(stats, "user_id")
        .filter((F.col("n") > 1) & (F.col("mn") < F.col("mx")))
        .select("event_id", "user_id", z4.alias("z"))
        .filter(F.abs(F.col("z")) > 3.0)
    )


@register(
    "txt_vocab_coverage",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, count(*) AS n FROM toks GROUP BY term
            ORDER BY n DESC, term LIMIT 20
        )
    )
    SELECT t.doc_id,
           count(*) AS n_toks,
           CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_in_vocab,
           floor(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*) * 10000 + 0.5) / 10000 AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (term)
    GROUP BY t.doc_id
    """,
    doc="Tokenizer-fit metric: apply a trained vocabulary (here the "
    "corpus top-20 terms — deterministic ties-on-term top-k, the "
    "txt_vocab_topk machinery) to every document and report its "
    "out-of-vocabulary rate — the number that tells you a tokenizer or "
    "stopword list does not fit a new corpus before you pay for "
    "training on it. The vocab is bounded (top-k), so the apply step is "
    "a broadcast left join onto the token stream + one doc-keyed "
    "aggregate; two corpus passes total (vocab build, vocab apply) — "
    "the same train-then-score shape as the unigram LM.",
)
def txt_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.when(F.col("in_vocab").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_vocab"),
            (
                F.floor(
                    F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                    * 1.0
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("oov_rate"),
        )
    )


@register(
    "dq_split_leakage_audit",
    """
    WITH assigned AS (
        SELECT md5(lower(trim(text))) AS fingerprint,
               CASE WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'cc000000'
                    THEN 'train'
                    WHEN substr(md5(md5(lower(trim(text)))), 1, 8) < 'e6000000'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    per_fp AS (
        SELECT fingerprint,
               count(*) AS n_copies,
               count(DISTINCT split) AS n_splits
        FROM assigned GROUP BY fingerprint
    )
    SELECT CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_duplicated,
           CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaking,
           sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) = 0 AS leakage_free
    FROM per_fp
    """,
    doc="Split-integrity audit — the invariant check a pipeline runs "
    "before training: no content fingerprint may span more than one "
    "train/val/test split. Re-derives doc_leakage_safe_split's "
    "content-keyed assignment and aggregates per fingerprint "
    "(n_splits must be 1 everywhere); n_duplicated reports how live the "
    "check is (the sf0.1 corpus has 8 exact-duplicate rows; sf0.01 has "
    "none) and leakage_free=TRUE is the proof the content-hash split "
    "construction works. One shuffle on the fingerprint, 1-row output. "
    "A doc_id-keyed split would FAIL this audit on the first duplicated "
    "document.",
)
def dq_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = _content_fingerprint()
    split_key = F.substring(F.md5(fp.cast("binary")), 1, 8)
    assigned = d.select(
        fp.alias("fingerprint"),
        F.when(split_key < "cc000000", "train")
        .when(split_key < "e6000000", "val")
        .otherwise("test")
        .alias("split"),
    )
    per_fp = assigned.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("split").alias("n_splits"),
    )
    leaking = F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
    return per_fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_duplicated"),
        leaking.cast("bigint").alias("n_leaking"),
        (leaking == 0).alias("leakage_free"),
    )


# ---------------------------------------------------------------------------
# Curation add-ons: PII redaction, token-budget selection, DSIR importance
# ---------------------------------------------------------------------------


# The oracle interpolates the SAME pattern/token table the Spark side uses
# (functions/text.py PII_PATTERNS) — the single source of truth, so a
# pattern tweak cannot silently drift the query from its oracle.
from ..functions.text import PII_PATTERNS as _PII_PATTERNS

(_PII_EMAIL, _PII_EMAIL_TOK), (_PII_IP, _PII_IP_TOK), (_PII_PHONE, _PII_PHONE_TOK) = (
    _PII_PATTERNS
)


@register(
    "txt_pii_redact",
    f"""
    WITH aug AS (
        SELECT doc_id, text,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@ex' || CAST(doc_id % 10 AS VARCHAR) || '.org or call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST(doc_id % 200 AS VARCHAR) AS pii_text
        FROM documents
    ),
    steps AS (
        SELECT doc_id, text, pii_text,
               regexp_replace(pii_text,
                   '{_PII_EMAIL}', '{_PII_EMAIL_TOK}', 'g') AS r1
        FROM aug
    ),
    steps2 AS (
        SELECT doc_id, text, pii_text, r1,
               regexp_replace(r1,
                   '{_PII_IP}', '{_PII_IP_TOK}', 'g') AS r2
        FROM steps
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text,
                    '{_PII_EMAIL}'))
              + len(regexp_extract_all(r1,
                    '{_PII_IP}'))
              + len(regexp_extract_all(r2, '{_PII_PHONE}')) AS BIGINT) AS n_pii,
           substr(regexp_replace(r2, '{_PII_PHONE}', '{_PII_PHONE_TOK}', 'g'),
                  length(text) + 2) AS redacted_tail
    FROM steps2
    """,
    doc="PII scrub as a map-only column expression (functions/text.py "
    "redact_pii/count_pii): email -> IPv4 -> phone regexp_replace chain, "
    "counts taken against the same sequential order so a digit-bearing "
    "email local-part is never double-counted. The synthetic corpus has "
    "no organic PII, so the query plants a deterministic doc_id-derived "
    "email/IP/phone per document and proves all three are found and "
    "replaced. Patterns stay in the RE2<->Java-regex common subset so the "
    "oracle interpolates functions/text.py PII_PATTERNS directly — one "
    "source of truth, no hand-copied regex to drift. Zero exchanges, zero Python: whole-stage codegen "
    "keeps the scrub inside the scan projection at 100 TB.",
)
def txt_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import count_pii, redact_pii

    d = _t(spark, sf_dir, "documents")
    s = lambda c: c.cast("string")  # noqa: E731
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"), s(F.col("doc_id")),
        F.lit("@ex"), s(F.col("doc_id") % 10), F.lit(".org or call 555-"),
        F.lpad(s(F.col("doc_id") % 10000), 4, "0"),
        F.lit(" from 10.0."), s(F.col("doc_id") % 256),
        F.lit("."), s(F.col("doc_id") % 200),
    )
    return d.select(
        "doc_id",
        count_pii(pii_text).alias("n_pii"),
        F.substring(
            redact_pii(pii_text), F.length("text") + 2, 1 << 30
        ).alias("redacted_tail"),
    )


@register(
    "doc_select_token_budget",
    """
    WITH d AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens,
               CAST(floor(length(text) * 1000.0 /
                    (length(text) - length(replace(text, ' ', '')) + 1))
                    AS BIGINT) AS score_milli
        FROM documents
    ),
    b AS (SELECT CAST(floor(sum(n_tokens) * 0.4) AS BIGINT) AS budget FROM d),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (
                   ORDER BY score_milli DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
        FROM d
    )
    SELECT doc_id, n_tokens, cum_tokens FROM c, b WHERE cum_tokens <= budget
    """,
    doc="Token-budget corpus selection: rank documents by a quality score "
    "(mean token length in exact integer milli-units) and keep the best "
    "prefix whose cumulative token count fits 40% of the corpus. The "
    "oracle's global running sum is the semantics; the Spark plan is the "
    "SCALE form — a distributed prefix sum: per-band (score value) token "
    "totals, a triangular band-level self-join for each band's exclusive "
    "offset (bands are bounded: scores are quantized to 1e-3, so the "
    "band relation is tiny and fully distributed — no driver collect, no "
    "single-partition window), then one band-partitioned window adds the "
    "in-band running sum. The corpus-wide budget scalar rides the same "
    "eager checkpoint (operators/scalars.py), so the documents scan "
    "happens exactly once.",
)
def doc_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalars import checkpoint_with_scalar

    d = _t(spark, sf_dir, "documents")
    n_tokens = _n_ws_tokens().cast("long")
    docs = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.floor(F.length("text") * 1000.0 / n_tokens).cast("long").alias(
            "score_milli"
        ),
    )
    cp, tot = checkpoint_with_scalar(docs, F.sum("n_tokens").alias("tot"))
    cum = banded_running_sum(
        cp, "score_milli", [F.col("doc_id")], "n_tokens", "cum_tokens"
    )
    return (
        cum.crossJoin(tot)
        .select(
            "doc_id",
            "n_tokens",
            "cum_tokens",
            F.floor(F.col("tot") * 0.4).cast("long").alias("budget"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "n_tokens", "cum_tokens")
    )


@register(
    "doc_dsir_importance",
    """
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    lm AS (
        SELECT term, count(*) AS c_r,
               CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_t
        FROM toks GROUP BY term
    ),
    consts AS (
        SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
               CAST(sum(c_t) AS BIGINT) AS n_t,
               count(*) AS v
        FROM lm
    ),
    ratio AS (
        SELECT term,
               CAST(floor(ln(((c_t + 1.0) * (n_r + v)) /
                             ((c_r + 1.0) * (n_t + v)))
                          * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
        FROM lm, consts
    )
    SELECT t.doc_id, count(*) AS n_toks,
           CAST(sum(r.lr_micro) AS BIGINT) AS dsir_weight_micro
    FROM toks t JOIN ratio r USING (term)
    GROUP BY t.doc_id
    """,
    doc="DSIR-style importance weight (Xie et al. 2023, Data Selection via "
    "Importance Resampling): per-document log-likelihood ratio of a "
    "target-domain unigram LM (docs from source 'src0') vs the raw-corpus "
    "LM, add-1 smoothed over the shared vocabulary. ONE token aggregate "
    "builds both LMs (the target count is a conditional sum in the same "
    "groupBy); the three normalizer scalars ride an eager checkpoint of "
    "that vocab relation, never a single-partition window. Per-token log "
    "ratios are half-up-rounded to BIGINT micro-units BEFORE the per-doc "
    "sum so the total is an order-independent integer sum (the "
    "doc_mix_weights lesson: never hash a float accumulation). Scale "
    "shape: vocab is O(unique tokens) and broadcasts back onto the token "
    "stream; the only corpus-sized exchanges are the term groupBy and the "
    "doc_id groupBy.",
)
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_doc_weights(spark, sf_dir)


def _dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DSIR relation ``(doc_id, n_toks, dsir_weight_micro)`` —
    shared by the weights query and the budgeted selection built on it."""
    from ..operators.scalars import checkpoint_with_scalar

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    )
    lm = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c_t"),
    )
    cp, consts = checkpoint_with_scalar(
        lm,
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio = cp.crossJoin(consts).select(
        "term",
        F.floor(
            F.log(
                ((F.col("c_t") + 1.0) * (F.col("n_r") + F.col("v")))
                / ((F.col("c_r") + 1.0) * (F.col("n_t") + F.col("v")))
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("lr_micro"),
    )
    return (
        toks.join(F.broadcast(ratio), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("lr_micro").cast("long").alias("dsir_weight_micro"),
        )
    )


@register(
    "txt_heavy_hitters",
    """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tot AS (SELECT count(*) AS n_total FROM toks)
    SELECT term, count(*) AS n
    FROM toks, tot
    GROUP BY term, n_total
    HAVING count(*) * 50 >= n_total
    """,
    doc="Exact heavy hitters (terms holding >= 2% of all tokens) via the "
    "2-pass Misra-Gries pattern (operators/sketches.py): per-partition "
    "k=256-counter MG summaries produce a bounded candidate relation "
    "(any term above N/256 globally is guaranteed in it, and the 2% "
    "threshold is far above that), then the candidates broadcast back "
    "onto the token stream for an EXACT count + integer threshold "
    "(n * 50 >= N, no floats anywhere). The oracle is a plain GROUP "
    "BY/HAVING: the sketch only bounds the candidate set, never the "
    "answer. At 100 TB the full vocabulary (billions of rare terms) "
    "never enters an exchange — only candidate tokens shuffle; the "
    "total-token scalar comes from a doc-level length aggregate on a "
    "separate cheap scan, not from the exploded stream.",
)
def txt_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import misra_gries_candidates

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    cands = (
        misra_gries_candidates(toks, "term", k=256)
        .select("term")
        .distinct()
    )
    n_tokens = _n_ws_tokens().cast("long")
    total = F.broadcast(d.agg(F.sum(n_tokens).alias("n_total")))
    return (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(total)
        .filter(F.col("n") * 50 >= F.col("n_total"))
        .select("term", "n")
    )


@register(
    "txt_bpe_encode",
    rf"""
    WITH words AS (
        SELECT tok AS s0, count(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(text, '{_BPE_RE}')) AS tok
            FROM documents) GROUP BY tok
    ),
    p1 AS (
        SELECT s0[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM words, unnest(generate_series(1, length(s0) - 1)) AS t(i)
        GROUP BY pair
    ),
    m1 AS (SELECT pair FROM p1 ORDER BY n DESC, pair LIMIT 1),
    w1 AS (SELECT replace(s0, (SELECT pair FROM m1), chr(1)) AS s1, freq
           FROM words),
    p2 AS (
        SELECT s1[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM w1, unnest(generate_series(1, length(s1) - 1)) AS t(i)
        GROUP BY pair
    ),
    m2 AS (SELECT pair FROM p2 ORDER BY n DESC, pair LIMIT 1),
    w2 AS (SELECT replace(s1, (SELECT pair FROM m2), chr(2)) AS s2, freq
           FROM w1),
    p3 AS (
        SELECT s2[i:i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        FROM w2, unnest(generate_series(1, length(s2) - 1)) AS t(i)
        GROUP BY pair
    ),
    m3 AS (SELECT pair FROM p3 ORDER BY n DESC, pair LIMIT 1),
    doc_toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '{_BPE_RE}')) AS tok
        FROM documents
    ),
    enc AS (
        SELECT doc_id, tok,
               replace(replace(replace(tok,
                   (SELECT pair FROM m1), chr(1)),
                   (SELECT pair FROM m2), chr(2)),
                   (SELECT pair FROM m3), chr(3)) AS e
        FROM doc_toks
    )
    SELECT doc_id,
           count(*) AS n_bpe_tokens,
           CAST(sum(length(e)) AS BIGINT) AS n_syms,
           floor(CAST(sum(length(e)) AS BIGINT) * 1.0
                 / CAST(sum(length(tok)) AS BIGINT) * 10000 + 0.5) / 10000
               AS compression
    FROM enc GROUP BY doc_id
    """,
    doc="BPE ENCODER — apply the trained merge table to every document "
    "(the tokenize-the-corpus pass that follows txt_bpe_train): the 3 "
    "merges are re-derived by the shared _bpe_train_merges driver-held "
    "bounded model (3 rows), then encoding is a map-only chain of "
    "replace(tok, pair_r, sentinel_r) in train order — leftmost-non-"
    "overlapping replace IS greedy BPE application, identical on both "
    "engines. Emits per-doc symbol counts and the compression ratio "
    "(symbols per input char, single float division over exact integer "
    "sums). Scale: training cost is vocab-sized (see txt_bpe_train); "
    "encoding is one corpus scan with literal merge strings baked into "
    "the projection — zero Python, zero joins, one doc_id aggregate.",
)
def txt_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train_merges(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
        ).alias("tok"),
    )
    enc = F.col("tok")
    for pair, sent, _n in merges:
        enc = F.replace(enc, F.lit(pair), F.lit(sent))
    return (
        toks.withColumn("e", enc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bpe_tokens"),
            F.sum(F.length("e")).cast("long").alias("n_syms"),
            (
                F.floor(
                    F.sum(F.length("e")).cast("long")
                    * 1.0
                    / F.sum(F.length("tok")).cast("long")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("compression"),
        )
    )


@register(
    "doc_dsir_select",
    """
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    lm AS (
        SELECT term, count(*) AS c_r,
               CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_t
        FROM toks GROUP BY term
    ),
    consts AS (
        SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
               CAST(sum(c_t) AS BIGINT) AS n_t,
               count(*) AS v
        FROM lm
    ),
    ratio AS (
        SELECT term,
               CAST(floor(ln(((c_t + 1.0) * (n_r + v)) /
                             ((c_r + 1.0) * (n_t + v)))
                          * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
        FROM lm, consts
    ),
    w AS (
        SELECT t.doc_id, count(*) AS n_toks,
               CAST(sum(r.lr_micro) AS BIGINT) AS dsir_weight_micro
        FROM toks t JOIN ratio r USING (term)
        GROUP BY t.doc_id
    ),
    b AS (SELECT CAST(floor(sum(n_toks) * 0.3) AS BIGINT) AS budget FROM w),
    c AS (
        SELECT doc_id, n_toks, dsir_weight_micro,
               CAST(sum(n_toks) OVER (
                   ORDER BY dsir_weight_micro DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tokens
        FROM w
    )
    SELECT doc_id, n_toks, dsir_weight_micro, cum_tokens
    FROM c, b WHERE cum_tokens <= budget
    """,
    doc="DSIR SELECTION — the method's actual output (Xie et al. 2023): "
    "keep the highest-importance documents whose cumulative token count "
    "fits 30% of the corpus. The oracle's global running sum over "
    "(weight DESC, doc_id) is the semantics; the Spark plan is the SCALE "
    "form — the same distributed prefix sum as doc_select_token_budget, "
    "banded on floor(weight/1000) (monotone in weight, so band-major "
    "order equals the global order; the band relation is bounded by the "
    "log-ratio range over milli-steps, not by corpus size): per-band "
    "token totals, triangular band self-join for exclusive offsets, one "
    "band-partitioned window. Weights ride the exact-integer micro-unit "
    "machinery of doc_dsir_importance, so the ordering has no float "
    "ties to flip.",
)
def doc_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalars import checkpoint_with_scalar

    w, tot = checkpoint_with_scalar(
        _dsir_doc_weights(spark, sf_dir), F.sum("n_toks").alias("tot")
    )
    banded = w.withColumn(
        "band", F.floor(F.col("dsir_weight_micro") / 1000.0).cast("long")
    )
    cum = banded_running_sum(
        banded,
        "band",
        [F.desc("dsir_weight_micro"), F.col("doc_id")],
        "n_toks",
        "cum_tokens",
    )
    return (
        cum.crossJoin(tot)
        .select(
            "doc_id",
            "n_toks",
            "dsir_weight_micro",
            "cum_tokens",
            F.floor(F.col("tot") * 0.3).cast("long").alias("budget"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "n_toks", "dsir_weight_micro", "cum_tokens")
    )


@register(
    "dedup_multi_signal_clusters",
    """
    WITH RECURSIVE fp AS (
        SELECT doc_id, md5(lower(trim(text))) AS f FROM documents
    ),
    fstar AS (
        SELECT f, min(doc_id) AS root FROM fp GROUP BY f HAVING count(*) > 1
    ),
    text_pairs AS (
        SELECT s.root AS doc_a, p.doc_id AS doc_b
        FROM fstar s JOIN fp p USING (f) WHERE p.doc_id > s.root
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings WHERE vec_id < 2000),
    emb_pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb))
                 * sqrt(list_dot_product(b.emb, b.emb))) >= 0.4
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM text_pairs
        UNION
        SELECT doc_a, doc_b FROM emb_pairs
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
    """,
    doc="Multi-signal duplicate clustering — the production dedup shape: "
    "UNION the edge sets from two independent signals (exact content "
    "fingerprint star-pairs; embedding-cosine >= 0.4 from the bounded "
    "exact all-pairs path shared with dedup_embedding_cosine) and run "
    "ONE connected-components pass over the combined graph, so a "
    "document caught by either signal lands in the same cluster as its "
    "transitive duplicates across BOTH signals. Scale: the text edges "
    "are one fingerprint aggregate (star edges to the min doc, never "
    "the within-group quadratic); the embedding edges ride the "
    "documented bounded/exact audit path (sim_lsh_bucketed is the scale "
    "generator to swap in at 100 TB); CC is the same pointer-doubling "
    "operator as dedup_cluster_assign. Oracle: recursive-CTE closure "
    "over the identical SQL edge union.",
)
def dedup_multi_signal_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components
    from ..operators.similarity import all_pairs_cosine

    d = _t(spark, sf_dir, "documents")
    fp = d.select("doc_id", _content_fingerprint().alias("f"))
    stars = (
        fp.groupBy("f")
        .agg(F.min("doc_id").alias("root"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    text_pairs = (
        fp.join(stars, "f")
        .filter(F.col("doc_id") > F.col("root"))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2000)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    emb_pairs = all_pairs_cosine(e, min_cosine=0.4).select(
        F.col("vid_a").alias("doc_a"), F.col("vid_b").alias("doc_b")
    )
    edges = text_pairs.unionByName(emb_pairs).distinct()
    return connected_components(edges, "doc_a", "doc_b").withColumnRenamed(
        "node", "doc_id"
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled integer-PageRank iteration (see operators/graph.py:
    pagerank_integer — div of positive ints matches Spark's div exactly)."""
    return f"""{out} AS (
        SELECT e.dst AS node,
               b.b + (85 * sum(p.r // e.outdeg)) // 100 AS r
        FROM ed e JOIN {prev} p ON e.src = p.node CROSS JOIN base b
        GROUP BY e.dst, b.b
    )"""


@register(
    "graph_pagerank_trading",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
    n AS (SELECT count(*) AS n FROM deg),
    base AS (SELECT (15 * 1000000) // (100 * n) AS b FROM n),
    r0 AS (SELECT src AS node, 1000000 // n.n AS r FROM deg, n),
    {_pagerank_iter_sql("r0", "r1")},
    {_pagerank_iter_sql("r1", "r2")},
    {_pagerank_iter_sql("r2", "r3")}
    SELECT CAST(node % 2 AS INTEGER) AS is_supplier,
           CAST(node // 2 AS BIGINT) AS entity_id,
           CAST(r AS BIGINT) AS rank_micro
    FROM r3
    """,
    doc="Deterministic integer PageRank over the customer<->supplier "
    "trading graph (distinct trading pairs from orders x lineitem, "
    "symmetrized so every node both emits and receives mass) — the "
    "iterative NUMERIC fixpoint shape next to connected_components' "
    "label fixpoint: 3 synchronous power iterations, each one shuffle "
    "join of the degree-annotated edge relation with the rank vector on "
    "src plus one grouped integer sum on dst, lineage truncated per "
    "round. Rank arithmetic is float-free (micro-units, div/// of "
    "positive ints) so the DuckDB oracle replays all three iterations "
    "bit-exactly — a hash-checked iterative algorithm, not a rows-only "
    "one (operators/graph.py:pagerank_integer).",
)
def graph_pagerank_trading(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_integer

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    r = pagerank_integer(edges, iters=3)
    return r.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("rank_micro").cast("long").alias("rank_micro"),
    )


@register(
    "txt_chunk_udtf",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE doc_id % 5 = 0
    ),
    c AS (
        SELECT doc_id, t,
               unnest(generate_series(0, len(t) - 1, 48)) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST(start / 48 AS INTEGER)                   AS chunk_idx,
           CAST(least(len(t) - start, 64) AS INTEGER)    AS n_toks,
           t[start + 1]                                  AS first_tok,
           t[least(start + 64, len(t))]                  AS last_tok
    FROM c
    """,
    doc="Overlapping token-window chunking (size 64 / stride 48) via a "
    "Spark 4 Python UDTF in a LATERAL join — the table-function extension "
    "point: one document row yields a variable number of chunk rows whose "
    "columns (chunk content endpoints) only the chunker can derive. "
    "Arrow-batched (ArrowEvalPythonUDTF, allowlisted as a documented "
    "vectorized kernel — never row-at-a-time pickling) and map-only: the "
    "explode shuffles nothing, and the doc_id filter is pushed below the "
    "lateral to the parquet scan. The DuckDB oracle mirrors the chunk rule "
    "with generate_series over the same empty-preserving space-split, so "
    "the UDTF's emission logic is hash-checked end to end.",
)
def txt_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.chunking import register_token_chunks

    fn = register_token_chunks(spark)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    d.select("doc_id", "text").createOrReplaceTempView("_chunk_udtf_docs")
    return spark.sql(
        f"""
        SELECT doc_id, c.chunk_idx, c.n_toks, c.first_tok, c.last_tok
        FROM _chunk_udtf_docs, LATERAL {fn}(text) AS c
        """
    )


@register(
    "dq_observe_metrics",
    """
    SELECT source,
           count(*)                                        AS n_kept,
           CAST(sum(n_chars) AS BIGINT)                    AS kept_chars
    FROM documents
    WHERE n_chars >= 200 AND lang = 'en'
    GROUP BY source
    """,
    doc="Single-pass in-flight pipeline telemetry via the Observation API "
    "(CollectMetrics): the curation gate's admission metrics — rows "
    "scanned, rows admitted, total chars scanned — are observed on the "
    "SAME job that produces the per-source rollup, so at 100 TB the "
    "monitoring costs zero extra scans (the naive form is a second "
    "full-table aggregate). The observed values are asserted against "
    "independently-computed aggregates in tests/test_modern_api.py; the "
    "driver hash-checks the rollup itself. CollectMetrics is a "
    "pass-through node: the plan below it is the same pushed-filter scan "
    "+ single hash aggregate as an unobserved gate.",
)
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    d = _t(spark, sf_dir, "documents")
    obs = Observation("curation_gate")
    gated = d.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("n_chars").cast("long")).alias("chars_scanned"),
        F.sum(
            ((F.col("n_chars") >= 200) & (F.col("lang") == "en")).cast("long")
        ).alias("rows_admitted"),
    ).filter((F.col("n_chars") >= 200) & (F.col("lang") == "en"))
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars").cast("long")).cast("long").alias("kept_chars"),
    )


@register(
    "emb_arrow_norm_audit",
    """
    WITH q AS (
        SELECT label,
               CAST(list_sum(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                      * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               )) AS BIGINT) AS sum_sq
        FROM embeddings
    )
    SELECT label,
           count(*)                          AS n,
           min(sum_sq)                       AS min_sq,
           max(sum_sq)                       AS max_sq,
           CAST(sum(sum_sq) AS BIGINT)       AS total_sq
    FROM q GROUP BY label
    """,
    doc="Per-label embedding-norm audit via mapInArrow "
    "(operators/similarity.py:arrow_sq_norms) — the RecordBatch-level "
    "custom-compute modality: zero-copy Arrow list buffers straight into "
    "one vectorized numpy pass per batch (quantize to int64 micro-units, "
    "offset-difference over a flat cumulative sum), no pandas "
    "conversion and no per-row Python. Exact integer arithmetic makes a "
    "kernel over FLOAT vectors hash-checkable cross-engine — the audit a "
    "pipeline runs to catch un-normalized or corrupted embedding shards "
    "before they poison ANN indexes. Map-only below the final per-label "
    "aggregate.",
)
def emb_arrow_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import arrow_sq_norms

    e = _t(spark, sf_dir, "embeddings")
    norms = arrow_sq_norms(e, "vec_id", "embedding", keep=["label"])
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("sum_sq").alias("min_sq"),
        F.max("sum_sq").alias("max_sq"),
        F.sum("sum_sq").cast("long").alias("total_sq"),
    )


@register(
    "cogroup_order_reconcile",
    """
    WITH l AS (
        SELECT l_orderkey AS k,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS line_cents,
               count(*) AS n_lines
        FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey
    ),
    o AS (
        SELECT o_orderkey AS k, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
        FROM orders WHERE o_orderkey % 100 = 0
    ),
    j AS (
        SELECT coalesce(o.k, l.k) AS k,
               coalesce(o_orderpriority, '<NO_ORDER>') AS pri,
               coalesce(total_cents, 0) AS tc,
               coalesce(line_cents, 0) AS lc,
               coalesce(n_lines, 0) AS nl
        FROM o FULL OUTER JOIN l ON o.k = l.k
    )
    SELECT pri AS o_orderpriority,
           count(*)                        AS n_orders,
           CAST(sum(nl) AS BIGINT)         AS n_lines,
           CAST(sum(abs(tc - lc)) AS BIGINT) AS abs_delta_cents
    FROM j GROUP BY pri
    """,
    doc="Cogrouped applyInPandas (the two-relation custom-compute "
    "modality): orders and their lineitems meet per order key in one "
    "pandas kernel that reconciles the order header's total against the "
    "recomputed line revenue in EXACT integer cents — emitting one "
    "delta row per key, including headerless line groups and lineless "
    "orders (the empty-side cases cogroup exists for). The aggregate "
    "per priority is JVM-side. NOTE: this reconciliation is "
    "SQL-expressible (the oracle IS the DF-native production "
    "formulation — two aggregates + one full-outer join); the cogrouped "
    "kernel is registered as the extension-point exhibit with exact "
    "parity, the same role as U3's UDF parity twin — use it when the "
    "per-key logic genuinely exceeds relational algebra (per-key "
    "simulation, rule engines, model scoring over both sides). Keyed "
    "subset (k % 100 = 0) bounds the group count BY CONTRACT: measured "
    "~3 ms per tiny cogroup dispatch (15k groups took 50 s at sf0.1 — "
    "the per-group pandas call is the intrinsic cost of this API, which "
    "is exactly why the relational twin is the production path and why "
    "group COUNT, not row count, is what must be bounded).",
)
def cogroup_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    )

    def reconcile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(left):
            pri = left["o_orderpriority"].iloc[0]
            tc = int(np.floor(left["o_totalprice"].iloc[0] * 100 + 0.5))
        else:
            pri, tc = "<NO_ORDER>", 0
        if len(right):
            cents = np.floor(
                right["l_extendedprice"]
                * (1 - right["l_discount"])
                * (1 + right["l_tax"])
                * 100
                + 0.5
            ).astype("int64")
            lc, nl = int(cents.sum()), len(right)
        else:
            lc, nl = 0, 0
        return pd.DataFrame(
            {"pri": [pri], "tc": [tc], "lc": [lc], "nl": [nl]}
        )

    per_key = (
        o.groupBy(F.col("o_orderkey").alias("k"))
        .cogroup(l.groupBy(F.col("l_orderkey").alias("k")))
        .applyInPandas(reconcile, "pri string, tc long, lc long, nl long")
    )
    return per_key.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("nl").cast("long").alias("n_lines"),
        F.sum(F.abs(F.col("tc") - F.col("lc"))).cast("long").alias(
            "abs_delta_cents"
        ),
    )


@register(
    "graph_triangle_count",
    """
    WITH lo AS (
        SELECT l_orderkey AS ok, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    canon AS (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM lo a JOIN lo b ON a.ok = b.ok AND a.p < b.p
    ),
    deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM canon
            UNION ALL
            SELECT b AS node FROM canon
        ) GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.a ELSE c.b END AS lo,
               CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.b ELSE c.a END AS hi
        FROM canon c
        JOIN deg da ON c.a = da.node
        JOIN deg db ON c.b = db.node
    ),
    tri AS (
        SELECT w1.lo AS x, w1.hi AS y, w2.hi AS z
        FROM oriented w1
        JOIN oriented w2 ON w1.lo = w2.lo AND w1.hi <> w2.hi
        JOIN oriented e ON e.lo = w1.hi AND e.hi = w2.hi
    )
    SELECT node AS part_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri
    )
    GROUP BY node
    """,
    doc="Per-node triangle counts over the part co-purchase graph (parts "
    "sharing an order, every 4th order) — the third graph-analytics shape "
    "next to connected_components' label fixpoint and PageRank's numeric "
    "fixpoint: a SINGLE-PASS join algorithm whose scale risk is fan-out, "
    "not iteration. Degree-ordered edge orientation (Cohen's MapReduce "
    "graph-twiddling) caps oriented out-degree at O(sqrt(E)) so the wedge "
    "self-join never explodes on power-law hubs — a star contributes ZERO "
    "wedges at its center. All joins are equi-keyed (apex, then the "
    "(y,z) closing pair); integer-only arithmetic, so the DuckDB oracle "
    "replays the orientation and enumeration bit-exactly "
    "(operators/graph.py:triangle_counts).",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    lo = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
    )
    pairs = (
        lo.alias("x")
        .join(
            lo.alias("y"),
            (F.col("x.ok") == F.col("y.ok")) & (F.col("x.p") < F.col("y.p")),
        )
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
    )
    return triangle_counts(pairs).select(
        F.col("node").alias("part_id"), "n_triangles"
    )


@register(
    "evt_gap_fill_locf",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS h,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        FROM events WHERE user_id % 10 = 0
    ),
    obs AS (
        SELECT user_id, h, count(*) AS n_events,
               CAST(sum(c) AS BIGINT) AS cents
        FROM e GROUP BY user_id, h
    ),
    span AS (
        SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span
    )
    SELECT g.user_id,
           CAST(g.h AS BIGINT)                                AS hour,
           CAST(coalesce(o.n_events, 0) AS BIGINT)            AS n_events,
           CAST(last_value(o.cents IGNORE NULLS) OVER w AS BIGINT)
                                                              AS locf_cents,
           CAST(g.h - last_value(CASE WHEN o.n_events IS NOT NULL
                                      THEN g.h END IGNORE NULLS) OVER w
                AS BIGINT)                                    AS gap_age_h,
           CAST(CASE WHEN o.n_events IS NULL THEN 1 ELSE 0 END AS INTEGER)
                                                              AS is_gap
    FROM grid g
    LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
    WINDOW w AS (PARTITION BY g.user_id ORDER BY g.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Time-series resample + gap-fill: bucket events to hours per user, "
    "densify each user's span to a complete hourly grid "
    "(sequence+explode — generated map-side from one (h0,h1) row per "
    "user, so the grid never shuffles raw events), then "
    "last-observation-carried-forward via last(ignorenulls) over an "
    "unbounded-preceding frame, plus the staleness age of the carried "
    "value. The hypertable rollup's missing half: rollups aggregate what "
    "IS there, gap-fill materializes what ISN'T — the densify-then-LOCF "
    "idiom every downstream ML featurizer needs for regular time grids. "
    "Scale: the grid is O(users x span-hours) independent of event count, "
    "LOCF is one partition-local sorted window per user (no global sort), "
    "and sums ride integer cents so both engines agree bit-for-bit.",
)
def evt_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
        )
    )
    obs = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("c").cast("long").alias("cents"),
    )
    span = obs.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    joined = grid.join(obs, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").cast("long").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("cents", ignorenulls=True).over(w).cast("long").alias(
            "locf_cents"
        ),
        (
            F.col("h")
            - F.last(
                F.when(F.col("n_events").isNotNull(), F.col("h")),
                ignorenulls=True,
            ).over(w)
        )
        .cast("long")
        .alias("gap_age_h"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).cast("int").alias(
            "is_gap"
        ),
    )


@register(
    "txt_fuzzy_blocked_levenshtein",
    """
    WITH d AS (
        SELECT doc_id, substr(text, 1, 16) AS blk, substr(text, 1, 120) AS p
        FROM documents
        WHERE length(text) = strlen(text)  -- ASCII guard: see doc
    ),
    ok_blk AS (
        SELECT blk FROM d GROUP BY blk
        HAVING count(*) BETWEEN 2 AND 64
    ),
    b AS (SELECT d.* FROM d JOIN ok_blk USING (blk))
    SELECT x.doc_id AS doc_a,
           y.doc_id AS doc_b,
           CAST(levenshtein(x.p, y.p) AS INTEGER) AS edit_dist,
           CAST(100 - (100 * levenshtein(x.p, y.p))
                      // greatest(length(x.p), length(y.p)) AS INTEGER)
               AS sim_pct
    FROM b x JOIN b y ON x.blk = y.blk AND x.doc_id < y.doc_id
    WHERE levenshtein(x.p, y.p) <= 10
    """,
    doc="Blocked fuzzy matching by edit distance — the dedup family's "
    "character-level member (exact/MinHash/SimHash/Jaccard/cosine see "
    "token or vector space; OCR noise, typo variants and boilerplate "
    "drift need true Levenshtein). Prefix-16 blocking turns the "
    "quadratic all-pairs into per-block candidate sets; a 2..64 "
    "block-size band is the hot-block guard (same discipline as the "
    "n-gram Jaccard hot-shingle cap) so one boilerplate prefix cannot "
    "explode the self-join at 100 TB; the distance itself runs on a "
    "120-char prefix, capping per-pair cost at O(120^2) inside "
    "whole-stage codegen (JVM levenshtein, no UDF). Spark's levenshtein "
    "counts codepoints while DuckDB's counts bytes, so candidates are "
    "restricted to byte-pure strings via length=octet_length — a "
    "predicate both engines evaluate identically (on this corpus it "
    "keeps everything).",
)
def txt_fuzzy_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") == F.octet_length("text"))
        .select(
            "doc_id",
            F.substring("text", 1, 16).alias("blk"),
            F.substring("text", 1, 120).alias("p"),
        )
    )
    ok_blk = (
        d.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= 64))
        .select("blk")
    )
    b = d.join(F.broadcast(ok_blk), "blk")
    x = b.alias("x")
    y = b.alias("y")
    dist = F.levenshtein(F.col("x.p"), F.col("y.p"))
    return (
        x.join(
            y,
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(dist <= 10)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_dist"),
            (
                F.lit(100)
                - F.expr(
                    "(100 * levenshtein(x.p, y.p))"
                    " div greatest(length(x.p), length(y.p))"
                )
            )
            .cast("int")
            .alias("sim_pct"),
        )
    )


@register(
    "ml_linreg_closed_form",
    """
    WITH f AS (
        SELECT source,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS x,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
    ),
    s AS (
        SELECT source,
               CAST(count(*) AS BIGINT)    AS n,
               CAST(sum(x) AS BIGINT)      AS sx,
               CAST(sum(y) AS BIGINT)      AS sy,
               CAST(sum(x * x) AS BIGINT)  AS sxx,
               CAST(sum(y * y) AS BIGINT)  AS syy,
               CAST(sum(x * y) AS BIGINT)  AS sxy
        FROM f GROUP BY source
    )
    SELECT source,
           n AS n_docs,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS intercept,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx))
               * ((n * sxy - sx * sy) / (n * syy - sy * sy)) AS r2
    FROM s
    """,
    doc="Closed-form OLS regression (chars-per-token fit per source) via "
    "SUFFICIENT STATISTICS — the non-iterative sibling of "
    "ml_quality_classifier_train's gradient loop: slope/intercept/r2 "
    "derive entirely from {n, Sx, Sy, Sxx, Syy, Sxy}, so the whole fit "
    "is ONE map-side-combined groupBy over the corpus — one shuffle of "
    "six numbers per group, no iterations, no driver-side matrices, the "
    "way a 100 TB calibration fit should run. Both x and y are integers, "
    "so the six moments are EXACT BIGINTs; each engine then performs the "
    "IDENTICAL scalar float expression on identical integers "
    "(bigint/bigint division promotes to double in both Spark and "
    "DuckDB), which is why a float regression can be hash-checked at all "
    "— regr_slope/regr_r2 built-ins would accumulate in "
    "partitioning-dependent order and could never cross-engine match.",
)
def ml_linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _t(spark, sf_dir, "documents").select(
        "source",
        _n_ws_tokens().cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").alias("slope"),
        F.expr(
            "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"
        ).alias("intercept"),
        F.expr(
            "((n * sxy - sx * sy) / (n * sxx - sx * sx))"
            " * ((n * sxy - sx * sy) / (n * syy - sy * sy))"
        ).alias("r2"),
    )


@register(
    "stat_ks_two_sample",
    """
    WITH e AS (
        SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS i1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    g AS (
        SELECT c, CAST(sum(i1) AS BIGINT) AS d1,
                  CAST(sum(i2) AS BIGINT) AS d2
        FROM e GROUP BY c
    ),
    r AS (
        SELECT c,
               CAST(sum(d1) OVER (ORDER BY c) AS BIGINT) AS c1,
               CAST(sum(d2) OVER (ORDER BY c) AS BIGINT) AS c2
        FROM g
    ),
    t AS (
        SELECT CAST(sum(d1) AS BIGINT) AS n1,
               CAST(sum(d2) AS BIGINT) AS n2
        FROM g
    )
    SELECT n1, n2,
           CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS ks_scaled,
           CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) / (n1 * n2) AS ks_stat
    FROM r, t GROUP BY n1, n2
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the 'view' and "
    "'purchase' value distributions — distribution-drift detection, the "
    "statistical gate a training pipeline runs between corpus versions / "
    "shards before accepting new data. The KS statistic is "
    "max|F1(x)-F2(x)| over the pooled support, i.e. a GLOBAL running "
    "count — the oracle states it as the textbook unpartitioned window, "
    "while the Spark plan rides banded_running_sum (per-band totals + "
    "triangular band offsets + band-local windows; operators/prefix.py), "
    "so no stage ever sorts the pooled sample on one task. Counts stay "
    "integers and the deviation is computed CROSS-MULTIPLIED "
    "(|C1*n2 - C2*n1|, exact BIGINT) rather than as float CDF "
    "differences, so the max is engine-exact; the only float is the "
    "final scalar division.",
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import banded_running_sum
    from ..operators.scalars import checkpoint_with_scalar

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("i1"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("i2"),
        )
    )
    g = e.groupBy("c").agg(
        F.sum("i1").cast("long").alias("d1"),
        F.sum("i2").cast("long").alias("d2"),
    )
    # Band DESC == global order, so ascending-c cumsums band on -(c div 1000).
    g = g.withColumn("band", -F.expr("c div 1000"))
    g = banded_running_sum(g, "band", [F.col("c").asc()], "d1", out_col="c1")
    g = banded_running_sum(g, "band", [F.col("c").asc()], "d2", out_col="c2")
    cp, tot = checkpoint_with_scalar(
        g,
        F.sum("d1").cast("long").alias("n1"),
        F.sum("d2").cast("long").alias("n2"),
    )
    dev = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return (
        cp.join(tot)
        .groupBy("n1", "n2")
        .agg(F.max(dev).cast("long").alias("ks_scaled"))
        .select(
            "n1",
            "n2",
            "ks_scaled",
            (F.col("ks_scaled") / (F.col("n1") * F.col("n2"))).alias(
                "ks_stat"
            ),
        )
    )


@register(
    "evt_session_window_batch",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    m AS (
        SELECT user_id, ts_us, c,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    s AS (
        SELECT user_id, ts_us, c,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id,
           CAST(min(ts_us) AS BIGINT)  AS session_start_us,
           CAST(count(*) AS BIGINT)    AS n_events,
           CAST(sum(c) AS BIGINT)      AS cents
    FROM s GROUP BY user_id, sid
    """,
    doc="The BUILT-IN session_window aggregation running in BATCH mode "
    "(30 min gap) — batch_sessionize hand-rolls the same semantics with "
    "lag + running-sum islands; this is the declarative form, one "
    "groupBy(user_id, session_window(ts)) whose merging Spark executes "
    "with a dedicated sort-merge session aggregate "
    "(UpdatingSessionsExec), and the SAME expression works unchanged "
    "under readStream (stream_session_stats is exactly that) — the "
    "batch/stream unification Structured Streaming promises. The oracle "
    "states the gap-islands definition relationally, so the built-in's "
    "merge rule (new session iff gap STRICTLY exceeds 30 min — a point "
    "event owns the closed interval [ts, ts+gap], so an exact-gap "
    "successor still merges) is pinned "
    "against the textbook formulation; micro-second integer timestamps "
    "and cent sums keep it engine-exact.",
)
def evt_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
    )
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("c").cast("long").alias("cents"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            "n_events",
            "cents",
        )
    )


@register(
    "cdc_apply_changelog",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    r AS (
        SELECT user_id, ts_us, event_id, is_del, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM e
    )
    SELECT user_id,
           CAST(ts_us AS BIGINT) AS last_ts_us,
           cents                 AS last_cents,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM r WHERE rn = 1 AND is_del = 0
    """,
    doc="CDC changelog apply (log compaction): replay an ordered "
    "upsert/delete stream (events; event_type='error' acts as the "
    "tombstone op) down to current state per key — the Debezium/Kafka "
    "ingest step that turns a 100 TB change log into a dimension "
    "snapshot, and the batch complement of the SCD-2 writer (which "
    "keeps HISTORY; this keeps the HEAD, dropping keys whose final op "
    "is a delete). One hash exchange on the key + a partition-local "
    "sort takes the latest op per key with a deterministic "
    "(ts, event_id) tie-break; no driver loops, no global sort. "
    "Row-number-desc rather than max_by so delete tombstones can "
    "suppress the key entirely while still counting replayed ops.",
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_del"
        ),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wn))
        .filter((F.col("rn") == 1) & (F.col("is_del") == 0))
        .select(
            "user_id",
            F.col("ts_us").cast("long").alias("last_ts_us"),
            F.col("cents").alias("last_cents"),
            F.col("n_ops").cast("long").alias("n_ops"),
        )
    )

@register(
    "graph_khop_reachability",
    """
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    seeds AS (
        SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_suppkey % 10 = 0
    ),
    reach AS (
        SELECT node, 0 AS hops FROM seeds
        UNION
        SELECT e.dst AS node, r.hops + 1 AS hops
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < 3
    )
    SELECT CAST(node % 2 AS INTEGER)  AS is_supplier,
           CAST(node // 2 AS BIGINT)  AS entity_id,
           CAST(min(hops) AS INTEGER) AS hops
    FROM reach GROUP BY node
    """,
    doc="Bounded-depth multi-source BFS over the customer<->supplier "
    "trading graph: minimum hop distance (<= 3) from the seeded supplier "
    "cohort, via the synchronous frontier loop in "
    "operators/graph.py:bfs_min_hops — Spark's recursive-CTE substitute. "
    "Each round is one keyed frontier-x-edges shuffle join + distinct + "
    "left-anti against the visited set (the wavefront drives the join, "
    "never the full graph), lineage truncated per round. Pure integer set "
    "algebra, so the DuckDB oracle IS a recursive CTE replaying the same "
    "fixpoint — the third hash-checked iterative algorithm next to "
    "connected components (label fixpoint) and integer PageRank (numeric "
    "fixpoint): this one is the frontier/reachability fixpoint.",
)
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_min_hops

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    reach = bfs_min_hops(edges, seeds, max_hops=3)
    return reach.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("hops").cast("int").alias("hops"),
    )


@register(
    "graph_temporal_reachability",
    """
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS d
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst, d AS t FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst, d AS t FROM pairs
    ),
    seeds AS (
        SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_suppkey % 10 = 0
    ),
    walk AS (
        SELECT node, CAST(0 AS BIGINT) AS arr, 0 AS hops FROM seeds
        UNION
        SELECT e.dst AS node, e.t AS arr, w.hops + 1 AS hops
        FROM walk w JOIN edges e ON e.src = w.node AND e.t >= w.arr
        WHERE w.hops < 3
    )
    SELECT CAST(node % 2 AS INTEGER) AS is_supplier,
           CAST(node // 2 AS BIGINT)  AS entity_id,
           CAST(min(arr) AS BIGINT)  AS arrival_day
    FROM walk GROUP BY node
    """,
    doc="TIME-RESPECTING reachability over the trading graph (temporal-"
    "network semantics, Holme & Saramaki 2012): an edge dated day d is "
    "usable only if d >= the arrival time at its source, and the answer "
    "is the EARLIEST arrival day within <= 3 edges of the seeded "
    "supplier cohort — who could a signal emitted by these suppliers "
    "actually have reached, given transaction ordering? Plain BFS "
    "overcounts (it ignores that influence cannot flow backward in "
    "time). Same delta-propagating fixpoint scaffolding as "
    "graph_weighted_sssp with the relax rule swapped to min-arrival "
    "(operators/graph.py:temporal_reachability) — monotone because an "
    "earlier arrival enables a superset of edges. Integer epoch-days; "
    "the recursive-CTE oracle replays the fixpoint exactly — the FIFTH "
    "hash-checked iterative algorithm in the graph family.",
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import temporal_reachability

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_suppkey").alias("s"),
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("d"),
        )
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"),
        (F.col("s") * 2 + 1).alias("dst"),
        F.col("d").alias("t"),
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"),
            (F.col("c") * 2).alias("dst"),
            F.col("d").alias("t"),
        )
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    arr = temporal_reachability(edges, seeds, rounds=3)
    return arr.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("arrival").cast("long").alias("arrival_day"),
    )


@register(
    "graph_weighted_sssp",
    """
    WITH RECURSIVE
    pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst, 1 + (c + s) % 5 AS w FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst, 1 + (c + s) % 5 AS w FROM pairs
    ),
    seeds AS (
        SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_suppkey % 10 = 0
    ),
    walk AS (
        SELECT node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM seeds
        UNION
        SELECT e.dst AS node, wk.cost + e.w AS cost, wk.hops + 1 AS hops
        FROM walk wk JOIN edges e ON e.src = wk.node
        WHERE wk.hops < 4
    )
    SELECT CAST(node % 2 AS INTEGER) AS is_supplier,
           CAST(node // 2 AS BIGINT)  AS entity_id,
           CAST(min(cost) AS BIGINT) AS cost
    FROM walk GROUP BY node
    """,
    doc="Bounded-round multi-source WEIGHTED shortest paths over the "
    "customer<->supplier trading graph (integer edge weights "
    "1 + (c+s) % 5): minimum path cost within <= 4 edges of the seeded "
    "supplier cohort, via synchronous Bellman-Ford with delta "
    "propagation (operators/graph.py:bellman_ford_bounded) — the "
    "weighted sibling of graph_khop_reachability's BFS. Only nodes "
    "whose distance improved last round drive each relaxation join, so "
    "per-round cost tracks the improving wavefront; lineage truncated "
    "and edges DISK_ONLY per the graph memory discipline. Pure integer "
    "min-plus algebra: the DuckDB recursive CTE replays the fixpoint "
    "bit-for-bit — the fourth hash-checked iterative algorithm next to "
    "CC (label fixpoint), PageRank (numeric fixpoint), and BFS "
    "(frontier fixpoint): this one is the min-plus relaxation fixpoint.",
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bellman_ford_bounded

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    wcol = (F.lit(1) + (F.col("c") + F.col("s")) % 5).alias("w")
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst"), wcol
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst"), wcol
        )
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    dist = bellman_ford_bounded(edges, seeds, rounds=4)
    return dist.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("cost").cast("long").alias("cost"),
    )


@register(
    "agg_countmin_sketch",
    """
    WITH h(d, a, b) AS (
        VALUES (0, 3079, 1531), (1, 4093, 2389),
               (2, 5351, 3271), (3, 6151, 4447)
    ),
    cnt AS (
        SELECT h.d, ((h.a * e.user_id + h.b) % 8191) % 64 AS bucket,
               count(*) AS cnt
        FROM events e CROSS JOIN h
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
    ),
    est AS (
        SELECT x.user_id, min(coalesce(c.cnt, 0)) AS cms_n
        FROM exact x CROSS JOIN h
        LEFT JOIN cnt c
          ON c.d = h.d
         AND c.bucket = ((h.a * x.user_id + h.b) % 8191) % 64
        GROUP BY x.user_id
    )
    SELECT CAST(x.user_id AS BIGINT)            AS user_id,
           CAST(x.exact_n AS BIGINT)            AS exact_n,
           CAST(e.cms_n AS BIGINT)              AS cms_n,
           CAST(e.cms_n - x.exact_n AS BIGINT)  AS overcount
    FROM exact x JOIN est e ON x.user_id = e.user_id
    """,
    doc="Count-Min sketch frequency estimation over the event stream "
    "(d=4 x w=64, universal integer hashing mod the Mersenne prime 8191) "
    "with the exact per-key count joined alongside as the audit twin — "
    "rounding out the sketch family: HLL (distinct count), Misra-Gries "
    "(heavy hitters), CMS (point frequency). CMS counters are additive "
    "integer sums into a FIXED d x w grid, so map-side partials collapse "
    "each task to <= 256 rows and the raw key column never shuffles — the "
    "100 TB contract (operators/sketches.py:count_min_counters); the "
    "estimate pass is a broadcast of the 256-row counter table, map-only. "
    "Merge-order insensitivity makes the estimates deterministic, hence a "
    "pure-SQL oracle replaying both the sketch and the exact twin.",
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import count_min_counters, count_min_estimate

    ev = _t(spark, sf_dir, "events").select("user_id")
    counters = count_min_counters(ev, "user_id", width=64, depth=4)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = count_min_estimate(
        exact.select("user_id"), counters, "user_id", width=64, depth=4
    )
    return exact.join(est, "user_id").select(
        F.col("user_id").cast("long").alias("user_id"),
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overcount"),
    )


@register(
    "doc_quota_sample",
    """
    SELECT doc_id, lang, rn AS sample_rank
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 25
    """,
    doc="Exact-k quota sampling: EXACTLY 25 documents per language by md5 "
    "hash priority — the reproducible eval-set/debug-slice primitive "
    "rate-based sampling (doc_stratified_sample) cannot provide: a rate "
    "gives binomial-varying counts, a quota gives a fixed-size, "
    "engine-independent, rerun-stable slice (adding documents only "
    "replaces members whose hash priority loses). The rank filter "
    "compiles to WindowGroupLimit, so each map task keeps at most k "
    "rows per language before the exchange — the same distributed "
    "bottom-k as the KMV sketch, here over hash priorities.",
)
def doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 25)
    )


@register(
    "evt_absence_churn",
    """
    WITH s AS (
        SELECT user_id, min(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (SELECT user_id, epoch_us(ts) AS pus
          FROM events WHERE event_type = 'purchase'),
    j AS (
        SELECT s.user_id, s.signup_us,
               min(CASE WHEN p.pus >= s.signup_us THEN p.pus END)
                   AS first_purchase_us
        FROM s LEFT JOIN p ON p.user_id = s.user_id
        GROUP BY s.user_id, s.signup_us
    )
    SELECT user_id, signup_us, first_purchase_us,
           CAST(CASE WHEN first_purchase_us IS NOT NULL
                      AND first_purchase_us - signup_us <= 604800000000
                     THEN 1 ELSE 0 END AS INTEGER) AS converted_7d,
           CAST((first_purchase_us - signup_us) // 86400000000
                AS BIGINT) AS days_to_convert
    FROM j
    """,
    doc="Absence/churn detection — the NEGATIVE-evidence query funnels "
    "don't answer: for every signed-up user, did a purchase FOLLOW the "
    "first signup, and within the 7-day window? Users with no subsequent "
    "purchase surface with NULL first_purchase_us (the churn cohort). "
    "One user-keyed left join + conditional min — the absence test is "
    "the NULL of a conditional aggregate, not an anti-join, so the "
    "convert-lag rides along in the same pass. Pure integer epoch-us "
    "arithmetic; day lag via integer division.",
)
def evt_absence_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("signup_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pus")
    )
    j = (
        s.join(p, "user_id", "left")
        .groupBy("user_id", "signup_us")
        .agg(
            F.min(
                F.when(F.col("pus") >= F.col("signup_us"), F.col("pus"))
            ).alias("first_purchase_us")
        )
    )
    lag = F.col("first_purchase_us") - F.col("signup_us")
    return j.select(
        "user_id",
        "signup_us",
        "first_purchase_us",
        F.when(
            F.col("first_purchase_us").isNotNull()
            & (lag <= F.lit(604_800_000_000)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("converted_7d"),
        F.expr(
            "CAST((first_purchase_us - signup_us) div 86400000000 AS BIGINT)"
        ).alias("days_to_convert"),
    )


@register(
    "evt_interval_union_time",
    """
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
        FROM events
    ),
    m AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_max_e
        FROM iv
    ),
    seg AS (
        SELECT user_id, s, e,
               sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS seg_id
        FROM m
    ),
    per_seg AS (
        SELECT user_id, seg_id, min(s) AS seg_s, max(e) AS seg_e
        FROM seg GROUP BY user_id, seg_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(seg_e - seg_s) AS BIGINT) AS covered_us
    FROM per_seg GROUP BY user_id
    """,
    doc="Interval-union length per user (the sweep-line 'merge overlapping "
    "intervals' pattern): each event opens a 30-minute activity interval; "
    "the covered time is the total length of the UNION of those "
    "intervals — overlapping intervals must not double-count, which "
    "plain sessionization (gap-based) does not answer when intervals "
    "have fixed extents. Decomposition: per-user exclusive running max "
    "of interval ends (one window) -> a new segment opens exactly where "
    "an interval starts past every previous end -> running sum of those "
    "flags numbers the segments -> per-segment min/max + one sum. Two "
    "windows + one aggregate, all partitioned by user_id (one shuffle "
    "key, reused); pure integer epoch-us arithmetic.",
)
def evt_interval_union_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1_800_000_000)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = iv.withColumn("prev_max_e", F.max("e").over(w_prev))
    seg = m.withColumn(
        "seg_id",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    per_seg = seg.groupBy("user_id", "seg_id").agg(
        F.min("s").alias("seg_s"), F.max("e").alias("seg_e")
    )
    return per_seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("seg_e") - F.col("seg_s")).cast("long").alias("covered_us"),
    )


@register(
    "evt_seasonal_decompose",
    """
    WITH b AS (
        SELECT event_type,
               CAST((epoch_us(ts) // 3600000000) % 24 AS INTEGER) AS hour_of_day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type, hour_of_day, count(*) AS n, sum(cents) AS s
        FROM b GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(n) AS tn, sum(s) AS ss FROM g GROUP BY 1)
    SELECT g.event_type, g.hour_of_day, CAST(g.n AS BIGINT) AS n,
           floor((200.0 * g.s + g.n) / (2.0 * g.n)) / 10000.0 AS hourly_mean,
           floor((200.0 * g.s + g.n) / (2.0 * g.n)) / 10000.0
           - floor((200.0 * t.ss + t.tn) / (2.0 * t.tn)) / 10000.0
               AS seasonal_delta
    FROM g JOIN t USING (event_type)
    """,
    doc="Seasonal decomposition of the event stream: per (event_type, "
    "hour-of-day) mean vs the type's overall mean — the additive seasonal "
    "index of a classical decomposition, the load-shaping/anomaly "
    "baseline for ops telemetry. Hour-of-day is epoch-derived "
    "((epoch_us div 3600e6) mod 24), so it is timezone-free and "
    "identical across engines regardless of session TZ. One groupBy onto "
    "the FIXED types x 24 grid (map-side partials collapse every task to "
    "<= 120 rows — the CMS shape), then a window over that tiny "
    "aggregate for the per-type totals: zero additional full-data "
    "shuffles. Means are integer-exact over cent sums (floor-parity).",
)
def evt_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    hod = (F.expr("unix_micros(ts) div 3600000000") % 24).cast("int")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    g = ev.groupBy(
        "event_type", hod.alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s"))
    w = Window.partitionBy("event_type")
    tn = F.sum("n").over(w)
    ss = F.sum("s").over(w)
    hourly = F.floor(
        (F.lit(200.0) * F.col("s") + F.col("n")) / (F.lit(2.0) * F.col("n"))
    ) / 10000.0
    overall = F.floor((F.lit(200.0) * ss + tn) / (F.lit(2.0) * tn)) / 10000.0
    return g.select(
        "event_type",
        "hour_of_day",
        "n",
        hourly.alias("hourly_mean"),
        (hourly - overall).alias("seasonal_delta"),
    )


@register(
    "ml_eval_confusion",
    """
    WITH ex AS (
        SELECT vec_id, label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    cent AS (
        SELECT label AS clabel, pos,
               CAST((2 * sum(vq) + count(*)) // (2 * count(*)) AS BIGINT) AS c4
        FROM ex GROUP BY label, pos
    ),
    dist AS (
        SELECT e.vec_id, e.label, c.clabel,
               sum((e.vq - c.c4) * (e.vq - c.c4)) AS d2
        FROM ex e JOIN cent c ON e.pos = c.pos
        GROUP BY e.vec_id, e.label, c.clabel
    ),
    pred AS (
        SELECT vec_id, label,
               CAST(min(d2 * 16 + clabel) % 16 AS INTEGER) AS pred_label
        FROM dist GROUP BY vec_id, label
    ),
    m AS (
        SELECT t.label,
               t.n_true, coalesce(p.n_pred, 0) AS n_pred,
               coalesce(tp.tp, 0) AS tp
        FROM (SELECT label, count(*) AS n_true FROM pred GROUP BY label) t
        LEFT JOIN (SELECT pred_label, count(*) AS n_pred
                   FROM pred GROUP BY pred_label) p ON p.pred_label = t.label
        LEFT JOIN (SELECT label, count(*) AS tp FROM pred
                   WHERE label = pred_label GROUP BY label) tp
               ON tp.label = t.label
    )
    SELECT label, CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
           CAST(CASE WHEN n_pred = 0 THEN 0
                ELSE (2000 * tp + n_pred) // (2 * n_pred) END AS BIGINT)
               AS precision_milli,
           CAST((2000 * tp + n_true) // (2 * n_true) AS BIGINT)
               AS recall_milli,
           CAST((2 * 2000 * tp + (n_true + n_pred)) // (2 * (n_true + n_pred))
                AS BIGINT) AS f1_milli
    FROM m
    """,
    doc="Classifier EVALUATION — the metrics pass the ml_* training "
    "queries feed: a nearest-centroid classifier over the labeled "
    "embeddings, scored with the per-label confusion diagonal, "
    "precision, recall, and F1 (per mille). Entirely in exact integer "
    "space: embeddings quantize to 1e-4 grid ints, centroids are "
    "(2S + n) div (2n) integer half-up means, squared distances are "
    "integer sums (no float accumulation can flip an argmin near a "
    "tie), the argmin is min over the packed key d2*16 + label (a total "
    "order with the label as deterministic tie-break; labels are 0-9), "
    "and the metric ratios are (2A + B) div (2B). Shapes: one "
    "posexplode, the 640-row centroid model broadcast back, one "
    "(vec, candidate-label) aggregate, O(labels) rollups. F1 per label "
    "is exactly 2*TP/(n_true + n_pred) — no float harmonic mean.",
)
def ml_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        # cast float32 -> double BEFORE scaling: engines promote a
        # float * int differently, and a single-precision product can
        # quantize to a different grid cell
        F.floor(F.col("v").cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("vq"),
    )
    cent = (
        ex.groupBy(F.col("label").alias("clabel"), "pos")
        .agg(F.sum("vq").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "clabel",
            "pos",
            F.expr("CAST((2 * s + n) div (2 * n) AS BIGINT)").alias("c4"),
        )
    )
    diff = F.col("vq") - F.col("c4")
    dist = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    pred = dist.groupBy("vec_id", "label").agg(
        (F.min(F.col("d2") * 16 + F.col("clabel")) % 16)
        .cast("int")
        .alias("pred_label")
    )
    t = pred.groupBy("label").agg(F.count(F.lit(1)).alias("n_true"))
    p = pred.groupBy(F.col("pred_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        pred.filter(F.col("label") == F.col("pred_label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    m = (
        t.join(p, "label", "left")
        .join(tp, "label", "left")
        .select(
            "label",
            "n_true",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    return m.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.expr(
            "CAST(CASE WHEN n_pred = 0 THEN 0"
            " ELSE (2000 * tp + n_pred) div (2 * n_pred) END AS BIGINT)"
        ).alias("precision_milli"),
        F.expr("CAST((2000 * tp + n_true) div (2 * n_true) AS BIGINT)").alias(
            "recall_milli"
        ),
        F.expr(
            "CAST((2 * 2000 * tp + (n_true + n_pred))"
            " div (2 * (n_true + n_pred)) AS BIGINT)"
        ).alias("f1_milli"),
    )


@register(
    "agg_bitmap_audience_overlap",
    """
    WITH s AS (
        SELECT event_type, user_id // 63 AS word,
               (1::BIGINT << (user_id % 63)) AS bits
        FROM events
    ),
    bm AS (SELECT event_type, word, bit_or(bits) AS bm FROM s GROUP BY 1, 2),
    sz AS (SELECT event_type, sum(bit_count(bm)) AS n FROM bm GROUP BY 1),
    inter AS (
        SELECT a.event_type AS seg_a, b.event_type AS seg_b,
               sum(bit_count(a.bm & b.bm)) AS n_common
        FROM bm a JOIN bm b ON a.word = b.word AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT seg_a, seg_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           floor(n_common * 1.0 / (sa.n + sb.n - n_common) * 10000 + 0.5)
               / 10000.0 AS jaccard
    FROM inter
    JOIN sz sa ON sa.event_type = seg_a
    JOIN sz sb ON sb.event_type = seg_b
    """,
    doc="EXACT audience overlap between every pair of event-type segments "
    "via positional bitmaps — the precise twin of the round-7 HLL "
    "inclusion-exclusion ESTIMATE, and the Druid/ClickHouse-style bitmap "
    "index technique re-expressed in pure DataFrame ops: pack users into "
    "63-bit words (word = user_id div 63; 63 not 64 because a signed "
    "1<<63 overflows ANSI engines), bit_or per (segment, word) — "
    "duplicate events are idempotent under OR, so NO distinct "
    "pre-shuffle is needed and map-side partials compress 63 users into "
    "one long before the exchange. Intersections are then a "
    "word-aligned join + popcount sum: |A & B| exact, 64x less shuffle "
    "than shuffling user sets. Spark's bit_or/bit_count/bitwiseAND are "
    "JVM codegen'd; DuckDB mirrors them 1:1.",
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    sel = ev.select(
        "event_type",
        F.expr("user_id div 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias(
            "bits"
        ),
    )
    bm = sel.groupBy("event_type", "word").agg(F.bit_or("bits").alias("bm"))
    sz = bm.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("n")
    )
    a = bm.select(
        F.col("event_type").alias("seg_a"), "word", F.col("bm").alias("bm_a")
    )
    b = bm.select(
        F.col("event_type").alias("seg_b"), "word", F.col("bm").alias("bm_b")
    )
    inter = (
        a.join(b, "word")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(
            F.sum(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b"))))
            .cast("long")
            .alias("n_common")
        )
    )
    sa = sz.select(F.col("event_type").alias("seg_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("seg_b"), F.col("n").alias("n_b"))
    jac = F.col("n_common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        inter.join(F.broadcast(sa), "seg_a")
        .join(F.broadcast(sb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_common",
            (F.floor(jac * 10000 + F.lit(0.5)) / 10000.0).alias("jaccard"),
        )
    )


@register(
    "stat_mad_outliers",
    """
    WITH g AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type,
               min(CASE WHEN 2 * cum_c >= n THEN cents END) AS med_c,
               max(n) AS n
        FROM (
            SELECT event_type, cents, c,
                   sum(c) OVER (PARTITION BY event_type ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_c,
                   sum(c) OVER (PARTITION BY event_type) AS n
            FROM g
        ) GROUP BY event_type
    ),
    dev AS (
        SELECT g.event_type, abs(g.cents - m.med_c) AS d, sum(g.c) AS c
        FROM g JOIN med m USING (event_type)
        GROUP BY 1, 2
    ),
    mad AS (
        SELECT event_type,
               min(CASE WHEN 2 * cum_c >= n THEN d END) AS mad_c
        FROM (
            SELECT event_type, d, c,
                   sum(c) OVER (PARTITION BY event_type ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_c,
                   sum(c) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           m.med_c / 100.0 AS median_v,
           a.mad_c / 100.0 AS mad_v,
           CAST(coalesce(sum(g.c) FILTER (
               WHERE abs(g.cents - m.med_c) > 3 * a.mad_c), 0) AS BIGINT)
               AS n_outliers
    FROM med m
    JOIN mad a USING (event_type)
    JOIN g USING (event_type)
    GROUP BY m.event_type, m.n, m.med_c, a.mad_c
    """,
    doc="Robust outlier detection by median absolute deviation — the "
    "breakdown-resistant alternative to the z-score path "
    "(evt_user_zscore_outliers): per group, median, MAD, and the count "
    "of values beyond 3 MADs. BOTH medians come from the fixed cents "
    "counting grid (agg_fixed_grid_quantiles' shape), and the deviation "
    "median is computed from the GRID re-keyed by |cents - median| — "
    "counts re-aggregate, so the raw data is scanned ONCE and every "
    "later stage is O(distinct cents). Lower-nearest-rank medians via "
    "integer cross-multiplication; all arithmetic integer.",
)
def stat_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    g = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )

    def _grid_median(grid, key_col):
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy(key_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("event_type")
        cum = grid.select(
            "event_type",
            key_col,
            F.sum("c").over(w_cum).alias("cum_c"),
            F.sum("c").over(w_all).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.min(
                F.when(2 * F.col("cum_c") >= F.col("n"), F.col(key_col))
            ).alias("med"),
            F.max("n").alias("n"),
        )

    med = _grid_median(g, "cents").select(
        "event_type", F.col("med").alias("med_c"), "n"
    )
    dev = (
        g.join(F.broadcast(med.select("event_type", "med_c")), "event_type")
        .groupBy("event_type", F.abs(F.col("cents") - F.col("med_c")).alias("d"))
        .agg(F.sum("c").alias("c"))
    )
    mad = _grid_median(dev, "d").select(
        "event_type", F.col("med").alias("mad_c")
    )
    out = (
        g.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med_c", "mad_c")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(F.col("cents") - F.col("med_c"))
                        > 3 * F.col("mad_c"),
                        F.col("c"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("med_c") / 100.0).alias("median_v"),
        (F.col("mad_c") / 100.0).alias("mad_v"),
        "n_outliers",
    )


@register(
    "agg_fixed_grid_quantiles",
    """
    WITH g AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, cents, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_c,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM g
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN 2 * cum_c >= n THEN cents END) / 100.0  AS p50,
           min(CASE WHEN 10 * cum_c >= 9 * n THEN cents END) / 100.0 AS p90,
           min(CASE WHEN 100 * cum_c >= 99 * n THEN cents END) / 100.0 AS p99
    FROM cum GROUP BY event_type
    """,
    doc="Exact distributed quantiles WITHOUT a sort of the data: the value "
    "domain is bounded fixed-point (2dp), so a counting-sort grid — one "
    "hash aggregate onto (group, cents) with map-side partials — plus a "
    "cumulative window over the DISTINCT cents (bounded by the domain, "
    "not the row count) yields exact lower-nearest-rank order statistics "
    "p50/p90/p99. The grid is mergeable across shards by addition, the "
    "per-group state is O(domain) regardless of data size, and the rank "
    "thresholds are integer cross-multiplications (k * cum >= q * n) — "
    "no float rank arithmetic. The counting-sort dual of "
    "grouped_percentiles' interpolated-percentile path.",
)
def agg_fixed_grid_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "cents",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    def q(mult_cum, mult_n):
        return F.min(
            F.when(mult_cum * F.col("cum_c") >= mult_n * F.col("n"), F.col("cents"))
        ) / 100.0

    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        q(F.lit(2), F.lit(1)).alias("p50"),
        q(F.lit(10), F.lit(9)).alias("p90"),
        q(F.lit(100), F.lit(99)).alias("p99"),
    )


@register(
    "agg_kmv_distinct",
    """
    WITH d AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events
    ),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d
    ),
    s AS (
        SELECT event_type, max(h) AS h_k, count(*) AS k_eff
        FROM r WHERE rn <= 64 GROUP BY 1
    ),
    x AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY 1
    )
    SELECT s.event_type,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           CAST(CASE WHEN s.k_eff < 64 THEN s.k_eff
                     ELSE floor(63.0 * 1152921504606846976 / s.h_k)
                END AS BIGINT) AS kmv_estimate
    FROM s JOIN x USING (event_type)
    """,
    doc="Per-group distinct-count estimation via the KMV (k-minimum-values "
    "/ bottom-k) sketch, Bar-Yossef et al. 2002: keep the k=64 smallest "
    "md5-derived hash values per group; estimate D ~ (k-1)/u_k where u_k "
    "is the k-th smallest hash normalized to [0,1) (here 2^60 since 15 "
    "hex chars). Rounds out the sketch family — HLL (union-mergeable "
    "distinct), CMS (frequency, join size), Misra-Gries (heavy hitters), "
    "KMV (distinct + set operations on sketches). The rank filter "
    "rn <= k compiles to Catalyst's WindowGroupLimit, which keeps only "
    "k rows per group in EACH map task before the exchange — the "
    "bottom-k merge IS the distributed sketch union, no full per-group "
    "sort ever materializes. md5 keeps both engines' hash spaces "
    "identical, so the sketch itself is deterministic and the gate "
    "checks it exactly; the exact distinct rides along as audit twin.",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    K = 64
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    d = ev.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    s = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .groupBy("event_type")
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("k_eff"))
    )
    x = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(F.col("k_eff") < K, F.col("k_eff")).otherwise(
        F.floor(F.lit(63.0) * F.lit(1152921504606846976) / F.col("h_k"))
    )
    return s.join(x, "event_type").select(
        "event_type",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        est.cast("long").alias("kmv_estimate"),
    )


@register(
    "agg_cms_join_size",
    """
    WITH h(d, a, b) AS (
        VALUES (0, 3079, 1531), (1, 4093, 2389),
               (2, 5351, 3271), (3, 6151, 4447)
    ),
    r AS (SELECT user_id FROM events WHERE event_type = 'click'),
    s AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
    cr AS (
        SELECT h.d, ((h.a * r.user_id + h.b) % 8191) % 64 AS bucket,
               count(*) AS cnt
        FROM r CROSS JOIN h GROUP BY 1, 2
    ),
    cs AS (
        SELECT h.d, ((h.a * s.user_id + h.b) % 8191) % 64 AS bucket,
               count(*) AS cnt
        FROM s CROSS JOIN h GROUP BY 1, 2
    ),
    ip AS (
        SELECT cr.d, sum(cr.cnt * cs.cnt) AS ip
        FROM cr JOIN cs USING (d, bucket) GROUP BY 1
    ),
    est AS (SELECT min(ip) AS cms_join_size FROM ip),
    exact AS (
        SELECT count(*) AS exact_join_size FROM r JOIN s USING (user_id)
    )
    SELECT CAST(exact_join_size AS BIGINT)                 AS exact_join_size,
           CAST(cms_join_size AS BIGINT)                   AS cms_join_size,
           CAST(cms_join_size - exact_join_size AS BIGINT) AS overcount
    FROM exact CROSS JOIN est
    """,
    doc="Equi-join cardinality estimation from two Count-Min sketches via "
    "their inner product (Cormode & Muthukrishnan 2005 §4.3): "
    "|R JOIN S| = sum_k fR(k)*fS(k), estimated as min over depth rows of "
    "sum_b cntR[d,b]*cntS[d,b] — the optimizer-side primitive for "
    "deciding broadcast vs shuffle WITHOUT executing the join. Each side "
    "collapses to a fixed 4x64 counter grid through map-side partials "
    "(no raw-key shuffle; operators/sketches.py:cms_join_size_estimate), "
    "and the inner product is a 256-row join — O(1) beyond the scans. "
    "Collisions only add mass, so the estimate provably OVERcounts (safe "
    "direction); the exact join size rides along as the audit twin.",
)
def agg_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_join_size_estimate

    ev = _t(spark, sf_dir, "events")
    r = ev.filter(F.col("event_type") == "click").select("user_id")
    s = ev.filter(F.col("event_type") == "purchase").select("user_id")
    est = cms_join_size_estimate(r, s, "user_id", width=64, depth=4)
    exact = r.join(s, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_join_size")
    )
    return exact.crossJoin(est).select(
        "exact_join_size",
        "cms_join_size",
        (F.col("cms_join_size") - F.col("exact_join_size"))
        .cast("long")
        .alias("overcount"),
    )


@register(
    "evt_ewma_fixed_point",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    l AS (
        SELECT user_id, ts_us, event_id, cents,
               lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
               lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
               lag(cents, 5) OVER w AS c5, lag(cents, 6) OVER w AS c6,
               lag(cents, 7) OVER w AS c7,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT CAST(user_id AS BIGINT)  AS user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(128 * cents
                + 64 * coalesce(c1, 0) + 32 * coalesce(c2, 0)
                + 16 * coalesce(c3, 0) +  8 * coalesce(c4, 0)
                +  4 * coalesce(c5, 0) +  2 * coalesce(c6, 0)
                +  1 * coalesce(c7, 0) AS BIGINT)            AS ewma_w256,
           CAST(128
                + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
                + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
                + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
                + CASE WHEN c4 IS NULL THEN 0 ELSE  8 END
                + CASE WHEN c5 IS NULL THEN 0 ELSE  4 END
                + CASE WHEN c6 IS NULL THEN 0 ELSE  2 END
                + CASE WHEN c7 IS NULL THEN 0 ELSE  1 END AS BIGINT)
                                                             AS norm_w
    FROM l WHERE rn = 1
    """,
    doc="Fixed-point EWMA (alpha=1/2, 8-term truncation, weights scaled "
    "by 256 so everything stays integer) of each user's cent-valued "
    "signal at their LATEST event — the exponential-decay smoothing "
    "featurizers apply before training, next to the rolling-24h mean "
    "(uniform weights) and gap-fill LOCF (no decay). The recurrence "
    "y_t = x_t/2 + y_{t-1}/2 is unrolled into eight lag() terms over one "
    "partition-local sorted window per user (no global sort, one "
    "exchange), with the realized weight mass emitted alongside so "
    "missing-history normalization needs no division. Integer weights "
    "mean both engines agree bit-for-bit — a hash-checked oracle over a "
    "smoothing kernel that is float-and-flaky in its textbook form.",
)
def evt_ewma_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    wn = Window.partitionBy("user_id")
    lags = e.select(
        "user_id",
        "cents",
        *[F.lag("cents", i).over(w).alias(f"c{i}") for i in range(1, 8)],
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_events"),
    )
    weights = [64, 32, 16, 8, 4, 2, 1]
    ewma = F.lit(128) * F.col("cents")
    norm = F.lit(128)
    for i, wt in enumerate(weights, start=1):
        ewma = ewma + F.lit(wt) * F.coalesce(F.col(f"c{i}"), F.lit(0))
        norm = norm + F.when(F.col(f"c{i}").isNull(), 0).otherwise(wt)
    return lags.filter(F.col("rn") == 1).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_events").cast("long").alias("n_events"),
        ewma.cast("long").alias("ewma_w256"),
        norm.cast("long").alias("norm_w"),
    )


@register(
    "evt_sequence_match",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               substr(event_type, 1, 1) AS ch
        FROM events
    ),
    seq AS (
        SELECT user_id,
               string_agg(ch, '' ORDER BY ts_us, event_id) AS s
        FROM e GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT)                          AS user_id,
           CAST(length(s) AS BIGINT)                        AS n_events,
           CAST((length(s) - length(replace(s, 'vcp', ''))) // 3
                AS BIGINT)                                  AS n_conversions,
           CAST(strpos(s, 'vcp') AS BIGINT)                 AS first_conv_pos
    FROM seq
    """,
    doc="Ordered sequence-pattern matching (MATCH_RECOGNIZE shape): each "
    "user's event history is folded into an ordered type-code string "
    "(event types map to distinct first letters) and scanned for the "
    "consecutive view->click->purchase funnel — count of non-overlapping "
    "conversions plus the first conversion position. Complements "
    "evt_funnel_conversion (which allows gaps between stages): this is "
    "the STRICT-CONTIGUITY pattern a MATCH_RECOGNIZE engine compiles. "
    "One exchange on user_id; the per-user fold is "
    "sort_array(collect_list(struct(ts,id,ch))) — partition-local, "
    "deterministic under the unique (ts_us, event_id) tie-break, with "
    "per-key sequence length bounded by contract (sessionize first for "
    "unbounded keys). String matching is engine-agnostic left-to-right "
    "replace/locate, so the oracle hash-matches exactly.",
)
def evt_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seq = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts_us", "event_id", "ch"))
                    ),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("s")
        )
    )
    return seq.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.length("s").cast("long").alias("n_events"),
        F.expr("(length(s) - length(replace(s, 'vcp', ''))) div 3")
        .cast("long")
        .alias("n_conversions"),
        F.instr(F.col("s"), "vcp").cast("long").alias("first_conv_pos"),
    )


@register(
    "stat_chi2_independence",
    """
    WITH e AS (
        SELECT event_type AS t, user_id % 4 AS c FROM events
    ),
    cells AS (SELECT t, c, count(*) AS o_n FROM e GROUP BY t, c),
    rt AS (SELECT t, sum(o_n) AS rt FROM cells GROUP BY t),
    ct AS (SELECT c, sum(o_n) AS ct FROM cells GROUP BY c),
    n AS (SELECT sum(o_n) AS n FROM cells),
    grid AS (
        SELECT rt.t, ct.c, rt.rt, ct.ct, n.n,
               coalesce(cells.o_n, 0) AS o_n
        FROM rt CROSS JOIN ct CROSS JOIN n
        LEFT JOIN cells ON cells.t = rt.t AND cells.c = ct.c
    )
    SELECT t AS event_type,
           CAST(c AS BIGINT)                    AS cohort,
           CAST(o_n AS BIGINT)                  AS o_n,
           CAST((rt * ct * 1000) // n AS BIGINT) AS e_milli,
           CAST(((o_n * 1000 - (rt * ct * 1000) // n)
                 * (o_n * 1000 - (rt * ct * 1000) // n))
                // (1000 * ((rt * ct * 1000) // n)) AS BIGINT)
                                                AS chi2_term_milli
    FROM grid
    """,
    doc="Chi-squared independence test (event_type x user cohort) in "
    "exact fixed-point arithmetic: expected counts in milli-units "
    "(E_milli = rt*ct*1000 div N, floor division DEFINED identically on "
    "both engines), per-cell contribution dev^2/(1000*E_milli) — the "
    "categorical-drift statistic next to the KS test's continuous one, "
    "emitted per cell so the hash pins every intermediate, with zero "
    "cells materialized via the rowtot x coltot grid (chi2 is wrong "
    "without them). Plan: one hash aggregate over the (t,c) cells — "
    "tiny, checkpointed — then row/col/grand totals all DERIVED from "
    "the cell relation (no second fact scan) and broadcast back; at "
    "100 TB the fact table is read once. Milli-scaling bounds "
    "intermediates at (N*1000)^2, inside int64 through sf10-per-cell "
    "~3e9 events; beyond that the documented move is micro->milli unit "
    "drop, not silent float fallback.",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), (F.col("user_id") % 4).alias("c")
    )
    cells = (
        ev.groupBy("t", "c")
        .agg(F.count(F.lit(1)).alias("o_n"))
        .localCheckpoint(eager=True)  # tiny: |types| x |cohorts| rows
    )
    rt = cells.groupBy("t").agg(F.sum("o_n").alias("rt"))
    ct = cells.groupBy("c").agg(F.sum("o_n").alias("ct"))
    n = cells.agg(F.sum("o_n").alias("n"))
    grid = (
        F.broadcast(rt)
        .crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(cells), ["t", "c"], "left")
        .withColumn("o_n", F.coalesce("o_n", F.lit(0)))
    )
    e_milli = F.expr("(rt * ct * 1000) div n")
    dev = F.col("o_n") * 1000 - e_milli
    return grid.select(
        F.col("t").alias("event_type"),
        F.col("c").cast("long").alias("cohort"),
        F.col("o_n").cast("long").alias("o_n"),
        e_milli.cast("long").alias("e_milli"),
        (dev * dev).cast("long").alias("_d2"),
    ).select(
        "event_type",
        "cohort",
        "o_n",
        "e_milli",
        F.expr("_d2 div (1000 * e_milli)").cast("long").alias(
            "chi2_term_milli"
        ),
    )


@register(
    "evt_sliding_distinct_users",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
    ),
    w AS (
        SELECT user_id, unnest(generate_series(d - 6, d)) AS wd FROM e
    )
    SELECT CAST(wd AS BIGINT)                     AS window_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*)                               AS n_events
    FROM w GROUP BY wd
    """,
    doc="Sliding-window distinct counting: 7-day windows advancing 1 day "
    "(Spark's native sliding window(ts, '7 days', '1 day') — each event "
    "replicated into its 7 covering windows by the JVM Expand, "
    "epoch-aligned starts) with an EXACT per-window distinct-user count "
    "— the rolling-reach / WAU-style metric. Distinct-over-sliding is "
    "the shape approx sketches usually absorb; here the exact form is "
    "two-level aggregation (partial distinct inside the Expand exchange) "
    "and the oracle replays the window replication with generate_series "
    "— swap in the HLL shard union when 7x replication of a 100 TB "
    "stream outgrows exact (the documented scale path, "
    "agg_hll_shard_union). Window starts are pure integer day indexes, "
    "so both engines agree exactly.",
)
def evt_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.expr("unix_micros(w.start) div 86400000000")
            .cast("long")
            .alias("window_day"),
            "n_users",
            "n_events",
        )
    )


@register(
    "txt_token_lift_pairs",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) WHERE length(tok) >= 4
    ),
    kept AS (
        SELECT doc_id FROM toks GROUP BY doc_id HAVING count(*) <= 64
    ),
    t AS (SELECT toks.* FROM toks JOIN kept USING (doc_id)),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t),
    df AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
        FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
        HAVING count(*) >= 5
    )
    SELECT p.tok_a, p.tok_b,
           CAST(p.n_ab AS BIGINT)  AS n_ab,
           CAST(da.n AS BIGINT)    AS n_a,
           CAST(db.n AS BIGINT)    AS n_b,
           CAST((p.n_ab * n.n_docs * 1000) // (da.n * db.n) AS BIGINT)
                                   AS lift_milli
    FROM pairs p
    JOIN df da ON da.tok = p.tok_a
    JOIN df db ON db.tok = p.tok_b
    CROSS JOIN n
    """,
    doc="Association mining (market-basket lift) over token co-occurrence: "
    "each document is a basket of its distinct >=4-char tokens; pairs "
    "co-occurring in >= 5 baskets are scored by lift = P(ab)/(P(a)P(b)) "
    "in exact integer milli-units (n_ab*N*1000 div (n_a*n_b)) — the "
    "A-priori association statistic, log-free so both engines agree "
    "bit-for-bit (PMI is this with a log around it). Scale guards: the "
    "per-doc basket is capped at 64 distinct tokens (the quadratic "
    "fan-out driver — same discipline as the hot-shingle guard), the "
    "pair join is keyed on doc_id with BOTH sides sharing one "
    "partitioning, and the document-frequency relation re-enters "
    "broadcast. The basket-universe count N is derived from the SAME "
    "guarded relation the frequencies come from, so the lift "
    "denominator is consistent at any scale.",
)
def txt_token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") >= 4)
        .distinct()
    )
    kept = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz")).filter(
        F.col("sz") <= 64
    )
    t = toks.join(kept.select("doc_id"), "doc_id").localCheckpoint(eager=True)
    n_docs = t.select("doc_id").distinct().count()  # bounded scalar
    df_rel = t.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    a = t.select("doc_id", F.col("tok").alias("tok_a"))
    b = t.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    da = df_rel.select(F.col("tok").alias("tok_a"), F.col("n").alias("n_a"))
    db = df_rel.select(F.col("tok").alias("tok_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(f"(n_ab * {n_docs} * 1000) div (n_a * n_b)")
            .cast("long")
            .alias("lift_milli"),
        )
    )


@register(
    "txt_simpson_diversity",
    """
    WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    c AS (
        SELECT source, tok, count(*) AS n FROM t
        WHERE tok <> '' GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(n) AS BIGINT)                           AS n_tokens,
           CAST(count(*) AS BIGINT)                         AS n_vocab,
           CAST(sum(n * (n - 1)) * 1000
                // (sum(n) * (sum(n) - 1)) AS BIGINT)       AS simpson_conc_milli
    FROM c GROUP BY source
    """,
    doc="Simpson concentration index per source (the log-free diversity "
    "statistic): sum n_i(n_i-1) / (N(N-1)) — the probability two tokens "
    "drawn without replacement coincide; 1 - it is Simpson diversity, "
    "and its reciprocal the effective vocabulary size. Purely rational, "
    "so milli-unit integer floor division replays exactly cross-engine "
    "where Shannon entropy would drag float logs into the hash. Plan: "
    "one (source, tok) aggregate (map-side partials absorb the token "
    "stream) then one per-source fold of the count relation — the "
    "vocabulary shuffles once, raw tokens never do. Milli-scaling keeps "
    "sum(n^2) * 1000 inside int64 through ~10^15 tokens per source.",
)
def txt_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "text")
    c = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.expr("sum(n * (n - 1)) * 1000 div (sum(n) * (sum(n) - 1))")
        .cast("long")
        .alias("simpson_conc_milli"),
    )


@register(
    "doc_winsorized_stats",
    """
    WITH r AS (
        SELECT source, n_chars, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS cnt
        FROM documents
    ),
    th AS (
        SELECT source,
               min(CASE WHEN rn = ((cnt - 1) * 10) // 100 + 1
                        THEN n_chars END) AS p10,
               min(CASE WHEN rn = ((cnt - 1) * 90) // 100 + 1
                        THEN n_chars END) AS p90
        FROM r GROUP BY source
    )
    SELECT r.source,
           CAST(max(r.cnt) AS BIGINT)                     AS n_docs,
           CAST(max(th.p10) AS BIGINT)                    AS p10_chars,
           CAST(max(th.p90) AS BIGINT)                    AS p90_chars,
           CAST(sum(least(greatest(r.n_chars, th.p10), th.p90))
                AS BIGINT)                                AS sum_winsorized,
           CAST(sum(CASE WHEN r.n_chars < th.p10 THEN 1 ELSE 0 END)
                AS BIGINT)                                AS n_clipped_low,
           CAST(sum(CASE WHEN r.n_chars > th.p90 THEN 1 ELSE 0 END)
                AS BIGINT)                                AS n_clipped_high
    FROM r JOIN th ON r.source = th.source
    GROUP BY r.source
    """,
    doc="Winsorized robust statistics per source: exact discrete "
    "p10/p90 thresholds (rank-based — index ((cnt-1)*q) div 100 + 1 on "
    "the (n_chars, doc_id)-ordered group, integer-only so both engines "
    "pick the identical element) clip the tails before aggregating — "
    "the outlier-robust moment estimation feature pipelines apply "
    "before normalization, complementing grouped_percentiles "
    "(interpolated, reporting) and conditional_recode_clip (fixed "
    "bounds): here the bounds are DATA-DERIVED per group. Plan: one "
    "exchange on source feeds both the ranking window and the clipped "
    "re-aggregate; thresholds re-enter as a broadcast of one row per "
    "source — the fact relation is scanned once and never re-sorted.",
)
def doc_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    th = r.groupBy("source").agg(
        F.min(
            F.when(
                F.col("rn") == F.expr("((cnt - 1) * 10) div 100 + 1"),
                F.col("n_chars"),
            )
        ).alias("p10"),
        F.min(
            F.when(
                F.col("rn") == F.expr("((cnt - 1) * 90) div 100 + 1"),
                F.col("n_chars"),
            )
        ).alias("p90"),
    )
    clipped = r.join(F.broadcast(th), "source")
    return clipped.groupBy("source").agg(
        F.max("cnt").cast("long").alias("n_docs"),
        F.max("p10").cast("long").alias("p10_chars"),
        F.max("p90").cast("long").alias("p90_chars"),
        F.sum(F.least(F.greatest("n_chars", "p10"), "p90"))
        .cast("long")
        .alias("sum_winsorized"),
        F.sum(F.when(F.col("n_chars") < F.col("p10"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("n_chars") > F.col("p90"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
    )


def _kcore_round_sql(e_in: str, e_out: str, k: int) -> str:
    """One unrolled peel round (see operators/graph.py:kcore_peel)."""
    return f"""d_{e_out} AS (
        SELECT src, count(*) AS n FROM {e_in} GROUP BY src
    ),
    k_{e_out} AS (SELECT src FROM d_{e_out} WHERE n >= {k}),
    {e_out} AS (
        SELECT {e_in}.src, {e_in}.dst FROM {e_in}
        JOIN k_{e_out} a ON {e_in}.src = a.src
        JOIN k_{e_out} b ON {e_in}.dst = b.src
    )"""


@register(
    "graph_kcore_peel",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    e0 AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    {_kcore_round_sql("e0", "e1", 20)},
    {_kcore_round_sql("e1", "e2", 20)},
    {_kcore_round_sql("e2", "e3", 20)}
    SELECT CAST(src % 2 AS INTEGER)  AS is_supplier,
           CAST(src // 2 AS BIGINT)  AS entity_id,
           CAST(count(*) AS BIGINT)  AS deg
    FROM e3 GROUP BY src
    """,
    doc="Fixed-round k-core peeling (k=20, 3 synchronous rounds) over the "
    "trading graph — the monotone-peeling iterative shape next to CC "
    "(label fixpoint), PageRank (numeric fixpoint) and BFS (frontier "
    "fixpoint): each round drops every node of degree < k and the edges "
    "touching it, isolating the densely-interconnected trading core "
    "(the engagement/fraud-analysis primitive). The round count is part "
    "of the DEFINED semantics (like pagerank_integer's iteration "
    "count), so the unrolled SQL oracle replays every peel bit-exactly; "
    "peeling is monotone, so r rounds equal the true k-core whenever it "
    "converges within r. Per round: one grouped degree count + one "
    "semi-join per endpoint — keyed shuffles over an edge set that only "
    "shrinks (operators/graph.py:kcore_peel).",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    core = kcore_peel(edges, k=20, rounds=3)
    return core.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("deg").cast("long").alias("deg"),
    )


@register(
    "ml_naive_bayes_train",
    """
    WITH t AS (
        SELECT source AS label, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    c AS (
        SELECT label, tok, count(*) AS n_lt FROM t
        WHERE tok <> '' GROUP BY label, tok
    ),
    lt AS (SELECT label, sum(n_lt) AS n_l FROM c GROUP BY label),
    v AS (SELECT count(DISTINCT tok) AS v FROM c),
    ld AS (SELECT source AS label, count(*) AS n_docs_l FROM documents
           GROUP BY source),
    nd AS (SELECT count(*) AS n_docs FROM documents)
    SELECT c.label, c.tok,
           CAST(c.n_lt AS BIGINT)                             AS n_lt,
           CAST((c.n_lt + 1) * 1000000 // (lt.n_l + v.v)
                AS BIGINT)                                    AS cond_micro,
           CAST(ld.n_docs_l * 1000 // nd.n_docs AS BIGINT)    AS prior_milli
    FROM c
    JOIN lt ON lt.label = c.label
    JOIN ld ON ld.label = c.label
    CROSS JOIN v CROSS JOIN nd
    """,
    doc="Multinomial naive-Bayes training in exact fixed point: "
    "class-conditional token probabilities with add-one smoothing "
    "((n_lt+1)*1e6 div (n_l+V)) and class priors in milli-units — "
    "count-based ML training is pure relational algebra, so unlike the "
    "GD-trained classifier (ml_quality_classifier_train, replayed "
    "round-by-round) the WHOLE training run is one hash-checked "
    "aggregate pass. Plan: one (label, tok) aggregate absorbs the "
    "token stream map-side; class totals and the vocabulary size "
    "derive from the count relation (no second corpus scan) and "
    "re-enter broadcast. Scoring is a broadcast-model join of these "
    "micro-unit log-free weights (the txt_bigram_lm_surprisal pattern).",
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        F.col("source").alias("label"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    c = t.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("n_lt"))
    c = c.localCheckpoint(eager=True)  # bounded: |labels| x |vocab|
    lt = c.groupBy("label").agg(F.sum("n_lt").alias("n_l"))
    v = c.agg(F.countDistinct("tok").alias("v"))
    ld = d.groupBy(F.col("source").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs_l")
    )
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        c.join(F.broadcast(lt), "label")
        .join(F.broadcast(ld), "label")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(nd))
        .select(
            "label",
            "tok",
            F.col("n_lt").cast("long").alias("n_lt"),
            F.expr("(n_lt + 1) * 1000000 div (n_l + v)")
            .cast("long")
            .alias("cond_micro"),
            F.expr("n_docs_l * 1000 div n_docs")
            .cast("long")
            .alias("prior_milli"),
        )
    )


@register(
    "dq_skew_report",
    """
    WITH f AS (
        SELECT 'orders.o_custkey' AS key_name, o_custkey AS k FROM orders
        UNION ALL
        SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
        UNION ALL
        SELECT 'events.user_id', user_id FROM events
    ),
    freq AS (
        SELECT key_name, k, count(*) AS c FROM f GROUP BY key_name, k
    ),
    ranked AS (
        SELECT key_name, c,
               row_number() OVER (PARTITION BY key_name
                                  ORDER BY c DESC, k) AS rn
        FROM freq
    ),
    agg AS (
        SELECT key_name,
               sum(c)   AS n_rows,
               count(*) AS n_keys,
               max(c)   AS max_freq
        FROM freq GROUP BY key_name
    ),
    top10 AS (
        SELECT key_name, sum(c) AS top10_rows
        FROM ranked WHERE rn <= 10 GROUP BY key_name
    )
    SELECT a.key_name,
           CAST(a.n_rows AS BIGINT)   AS n_rows,
           CAST(a.n_keys AS BIGINT)   AS n_keys,
           CAST(a.max_freq AS BIGINT) AS max_freq,
           CAST(t.top10_rows AS BIGINT) AS top10_rows,
           CAST((2000 * t.top10_rows + a.n_rows) // (2 * a.n_rows)
                AS BIGINT) AS top10_per_mille,
           CAST((2 * a.max_freq * a.n_keys + a.n_rows) // (2 * a.n_rows)
                AS BIGINT) AS skew_x
    FROM agg a JOIN top10 t USING (key_name)
    """,
    doc="Join-key skew diagnostics — the audit an optimizer (or an engineer "
    "choosing between broadcast, salting, and AQE skew-join) runs before "
    "committing a shuffle plan: per key column, cardinality, max key "
    "frequency, the top-10-keys row share (per mille), and skew_x = "
    "max_freq / (rows/keys), the hot key's multiple of the uniform load. "
    "Everything is integer-exact — shares via (2A + B) div (2B) half-up, "
    "no interpolated percentile — so the report hashes identically at any "
    "scale. One count aggregate per key column plus a WindowGroupLimit "
    "top-10 (partial per-task bottom-k), then O(keys) scalar rollups.",
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    parts = []
    for name, table, col in [
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("events.user_id", "events", "user_id"),
    ]:
        parts.append(
            _t(spark, sf_dir, table).select(
                F.lit(name).alias("key_name"), F.col(col).alias("k")
            )
        )
    f = parts[0].unionByName(parts[1]).unionByName(parts[2])
    freq = f.groupBy("key_name", "k").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("key_name").orderBy(F.col("c").desc(), "k")
    top10 = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("key_name")
        .agg(F.sum("c").alias("top10_rows"))
    )
    agg = freq.groupBy("key_name").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_freq"),
    )
    return (
        agg.join(top10, "key_name")
        .select(
            "key_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            "n_keys",
            "max_freq",
            "top10_rows",
            F.expr(
                "CAST((2000 * top10_rows + n_rows) div (2 * n_rows) AS BIGINT)"
            ).alias("top10_per_mille"),
            F.expr(
                "CAST((2 * max_freq * n_keys + n_rows) div (2 * n_rows)"
                " AS BIGINT)"
            ).alias("skew_x"),
        )
    )


@register(
    "dq_table_checksum",
    """
    WITH rows_h AS (
        SELECT o_orderkey % 8 AS shard,
               CAST(concat('0x', substr(md5(
                   concat_ws('|',
                       CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR),
                       CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS VARCHAR),
                       CAST(epoch_us(o_orderdate) AS VARCHAR),
                       o_orderpriority)
               ), 1, 12)) AS BIGINT) AS row_h
        FROM orders
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*) AS n_rows,
           CAST(sum(row_h) % 4611686018427387904 AS BIGINT) AS checksum
    FROM rows_h GROUP BY shard
    """,
    doc="Order-insensitive, mergeable table checksum (the content "
    "verification primitive for replicated / migrated datasets): each row "
    "canonicalizes to a '|'-joined string of engine-stable renderings "
    "(integer keys, cent-scaled price, epoch-us date), hashes through "
    "md5 (12 hex chars -> int, < 2^48 so a DECIMAL(38,0)/HUGEINT sum "
    "stays exact for ~1e23 rows), and SUMS per shard mod 2^62. Sum is "
    "commutative, so the checksum is independent of row order and "
    "partitioning, shard checksums merge by addition across files or "
    "clusters, and a CDC delta patches it incrementally (add inserts, "
    "subtract deletes) without rescanning. Map-only -> fixed 8-cell "
    "grid: map-side partials collapse every task to <= 8 rows, the "
    "cheapest possible audit shape at 100 TB.",
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.unix_micros("o_orderdate").cast("string"),
        F.col("o_orderpriority"),
    )
    row_h = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 12), 16, 10).cast(
        "long"
    )
    return (
        o.select((F.col("o_orderkey") % 8).alias("shard"), row_h.alias("row_h"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("row_h").cast("decimal(38,0)")) % F.lit(4611686018427387904))
            .cast("long")
            .alias("checksum"),
        )
        .select(F.col("shard").cast("long").alias("shard"), "n_rows", "checksum")
    )


@register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT count(*) FROM lineitem)                     AS n_child,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey)) AS n_childless
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_suppkey = s.s_suppkey))
    """,
    doc="Referential-integrity audit across three FK edges of the star "
    "schema: orphaned children (FK with no parent — anti-join child vs "
    "parent) and childless parents (reverse anti-join; customers with "
    "no orders are the nonzero case in this corpus) — the DQ gate that "
    "runs before any OLAP backfill, completing the data-quality family "
    "(column profile, expectations, footer stats, observe, try_*). "
    "Plan: each direction is one LeftAnti broadcast/shuffle join "
    "feeding a count; parents broadcast (dimension-sized), the child "
    "side is scanned with only the key column (pruned scan). At 100 TB "
    "each audit is one pass over the fact's key column.",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")

    def audit(name, child, ckey, parent, pkey):
        n_child = child.count()
        n_orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).count()
        n_childless = parent.join(
            child, parent[pkey] == child[ckey], "left_anti"
        ).count()
        return (name, n_child, n_orphans, n_childless)

    rows = [
        audit("lineitem->orders", li.select("l_orderkey"), "l_orderkey",
              o.select("o_orderkey"), "o_orderkey"),
        audit("orders->customer", o.select("o_custkey"), "o_custkey",
              cu.select("c_custkey"), "c_custkey"),
        audit("lineitem->supplier", li.select("l_suppkey"), "l_suppkey",
              su.select("s_suppkey"), "s_suppkey"),
    ]
    return _t(spark, sf_dir, "region").sparkSession.createDataFrame(
        rows, "fk_edge: string, n_child: long, n_orphans: long, n_childless: long"
    )


@register(
    "evt_autocovariance_lags",
    """
    WITH h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    lags AS (SELECT unnest(generate_series(1, 3)) AS lag)
    SELECT a.event_type,
           CAST(l.lag AS INTEGER)        AS lag,
           CAST(count(*) AS BIGINT)      AS n_pairs,
           CAST(sum(a.cents) AS BIGINT)  AS sum_x,
           CAST(sum(b.cents) AS BIGINT)  AS sum_y,
           CAST(sum(a.cents * b.cents) AS BIGINT) AS sum_xy
    FROM h a
    CROSS JOIN lags l
    JOIN h b ON b.event_type = a.event_type AND b.h = a.h + l.lag
    GROUP BY a.event_type, l.lag
    """,
    doc="Autocovariance sufficient statistics at lags 1-3 of the hourly "
    "cent-valued signal per event type: exact integer (n, sum_x, sum_y, "
    "sum_xy) over observed-hour pairs (h, h+lag) — the closed-form-OLS "
    "pattern (ml_linreg_closed_form) applied to serial dependence; the "
    "caller derives autocorrelation as (n*sxy - sx*sy) / ... in one "
    "driver-side step, keeping the distributed pass float-free. Pairs "
    "come from an equi-join of the hourly rollup with itself on "
    "(type, h+lag) — keyed, never a range scan — and the rollup is "
    "computed once, map-side partials absorbing the event stream. "
    "Gaps are handled by construction: only observed pairs join.",
)
def evt_autocovariance_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("c"),
    )
    h = (
        ev.groupBy("event_type", "h")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=True)  # reused by both join sides
    )
    lags = h.sparkSession.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    a = h.select("event_type", "h", F.col("cents").alias("x"))
    b = h.select(
        "event_type", F.col("h").alias("hb"), F.col("cents").alias("y")
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .withColumn("hb", F.col("h") + F.col("lag"))
        .join(b, ["event_type", "hb"])
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sum_x"),
            F.sum("y").cast("long").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
        )
    )


@register(
    "stat_mann_whitney_u",
    """
    WITH v AS (SELECT source, n_chars FROM documents),
    g AS (SELECT n_chars, count(*) AS dup FROM v GROUP BY n_chars),
    c AS (
        SELECT n_chars, dup,
               sum(dup) OVER (ORDER BY n_chars
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
        FROM g
    ),
    r AS (SELECT n_chars, 2 * cum - dup + 1 AS r2 FROM c),
    s AS (
        SELECT v.source, count(*) AS n_s,
               CAST(sum(r.r2) AS BIGINT) AS r2_sum
        FROM v JOIN r USING (n_chars) GROUP BY v.source
    )
    SELECT source,
           CAST(n_s AS BIGINT)                        AS n_docs,
           r2_sum,
           CAST(r2_sum - n_s * (n_s + 1) AS BIGINT)   AS u2_vs_rest
    FROM s
    """,
    doc="Mann-Whitney rank-sum statistic (one-vs-rest per source, over "
    "doc length): combined-sample midranks carried as INTEGER doubled "
    "midranks (2*midrank = 2*cnt_less + dup + 1 — tie handling without "
    "fractions), per-source rank sum R2 and U2 = 2U = R2 - n(n+1) — the "
    "nonparametric location test next to the KS statistic (which "
    "compares whole CDFs; MW tests stochastic dominance). Exact "
    "integers end to end, so the oracle replays it bit-for-bit. Plan "
    "discipline: the global cumulative count over the value-level "
    "relation uses the banded prefix-sum operator (operators/prefix.py "
    "— per-band totals + triangular band offsets + band-partitioned "
    "window), NEVER a single-partition global window; the doubled-rank "
    "relation is value-level (bounded by distinct lengths) and "
    "re-enters broadcast.",
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "n_chars")
    g = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("dup")).withColumn(
        "band", F.expr("n_chars div 128")
    )
    cum = banded_running_sum(
        g, "band", [F.col("n_chars")], "dup", out_col="cum", descending=False
    )
    r = cum.select(
        "n_chars", (F.lit(2) * F.col("cum") - F.col("dup") + 1).alias("r2")
    )
    s = (
        d.join(F.broadcast(r), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.sum("r2").cast("long").alias("r2_sum"),
        )
    )
    return s.select(
        "source",
        F.col("n_s").cast("long").alias("n_docs"),
        "r2_sum",
        (F.col("r2_sum") - F.col("n_s") * (F.col("n_s") + 1))
        .cast("long")
        .alias("u2_vs_rest"),
    )


@register(
    "agg_gini_per_nation",
    """
    WITH v AS (
        SELECT n.n_name AS nation,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
               o.o_orderkey
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    r AS (
        SELECT nation, cents,
               row_number() OVER (PARTITION BY nation
                                  ORDER BY cents, o_orderkey) AS i
        FROM v
    ),
    s AS (
        SELECT nation, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_x,
               CAST(sum(i * cents) AS BIGINT) AS sum_ix
        FROM r GROUP BY nation
    )
    SELECT nation,
           CAST(n AS BIGINT) AS n_orders,
           sum_x             AS total_cents,
           CAST(((2 * sum_ix - (n + 1) * sum_x) // n) * 1000000
                // sum_x AS BIGINT) AS gini_micro
    FROM s
    """,
    doc="Exact Gini concentration index of order value per customer "
    "nation, via the rank formulation G = (2*sum(i*x_i) - (n+1)*sum x) "
    "/ (n*sum x) over the ascending-sorted group — the inequality/"
    "concentration statistic (revenue concentration, whale detection) "
    "in pure integer arithmetic: cent-quantized values, a deterministic "
    "(cents, orderkey) tie-break, and micro-unit floor division, so "
    "both engines agree bit-for-bit (the per-n floor division happens "
    "BEFORE the micro scaling so the numerator never exceeds int64 — "
    "relative floor error <= 1/(A/n) ~ 1e-10, part of the defined "
    "semantics). Plan: one exchange on nation feeds "
    "a partition-local ranking window and the grouped fold — no global "
    "sort, no single-partition exchange (ranks are PER GROUP; for a "
    "corpus-wide Gini the banded prefix-sum operator supplies the "
    "global rank, as in stat_mann_whitney_u). Intermediates bound by "
    "n*max_cents*n — inside int64 through ~10^5 orders/nation at these "
    "prices; the documented scale move past that is milli-unit values.",
)
def agg_gini_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    v = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "cents", "o_orderkey")
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_orderkey")
    r = v.withColumn("i", F.row_number().over(w))
    s = r.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("sum_x"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("sum_ix"),
    )
    return s.select(
        "nation",
        F.col("n").cast("long").alias("n_orders"),
        F.col("sum_x").alias("total_cents"),
        F.expr("((2 * sum_ix - (n + 1) * sum_x) div n) * 1000000 div sum_x")
        .cast("long")
        .alias("gini_micro"),
    )


# ---------------------------------------------------------------------------
# Round-7 additions: LPA community detection, fixed-point one-way ANOVA,
# CUSUM changepoint detection.
# ---------------------------------------------------------------------------


def _lpa_iter_sql(prev: str, cnt: str, out: str) -> str:
    """One unrolled synchronous mode-LPA round (see operators/graph.py:
    label_propagation_mode — argmax by (count desc, label asc))."""
    return f"""{cnt} AS (
        SELECT e.dst AS node, l.lab, count(*) AS cnt
        FROM edges e JOIN {prev} l ON e.src = l.node
        GROUP BY e.dst, l.lab
    ),
    {out} AS (
        SELECT n.node, coalesce(w.lab, n.node) AS lab
        FROM nodes n LEFT JOIN (
            SELECT node, lab FROM (
                SELECT node, lab, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn
                FROM {cnt}) t
            WHERE rn = 1
        ) w ON n.node = w.node
    )"""


@register(
    "graph_label_propagation",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    lab0 AS (SELECT node, node AS lab FROM nodes),
    {_lpa_iter_sql("lab0", "cnt1", "lab1")},
    {_lpa_iter_sql("lab1", "cnt2", "lab2")}
    SELECT CAST(node % 2 AS INTEGER)  AS is_supplier,
           CAST(node // 2 AS BIGINT)  AS entity_id,
           CAST(lab AS BIGINT)        AS community
    FROM lab2
    """,
    doc="Community detection via synchronous mode-based Label Propagation "
    "over the customer<->supplier trading graph — the FREQUENCY fixpoint "
    "completing the iterative-graph family (CC=min-label, PageRank="
    "numeric mass, BFS=reachability, k-core=monotone peeling, triangles="
    "wedge counting): 2 fixed rounds, each one edge-x-label shuffle join "
    "+ one (node,label) count aggregate + a max_by-shaped argmax "
    "(max(struct(cnt,-lab)) — no per-node window/sort), ties to the "
    "lowest label so the unrolled row_number oracle replays every round "
    "deterministically. Classic async LPA visits nodes in random order; "
    "the synchronized deterministic variant is what makes a cross-engine "
    "hash possible at all (operators/graph.py:label_propagation_mode).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation_mode

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    lab = label_propagation_mode(edges, iters=2)
    return lab.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("community").cast("long").alias("community"),
    )


@register(
    "stat_anova_oneway",
    """
    WITH x AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type, count(*) AS n_i,
               CAST(sum(cents) AS BIGINT) AS t_i,
               CAST(sum(cents * cents) AS BIGINT) AS q_i
        FROM x GROUP BY event_type
    ),
    parts AS (
        SELECT count(*) AS k, sum(n_i) AS n,
               sum(CAST(t_i AS HUGEINT) * t_i // n_i) AS sum_a,
               sum(t_i) AS t, sum(q_i) AS q
        FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           CAST(sum_a - (CAST(t AS HUGEINT) * t // n) AS BIGINT) AS ssb_cents2,
           CAST(q - sum_a AS BIGINT) AS ssw_cents2,
           CAST((CAST(1000 AS HUGEINT) * (sum_a - CAST(t AS HUGEINT) * t // n)
                 * (n - k))
                // ((q - sum_a) * (k - 1)) AS BIGINT) AS f_milli
    FROM parts
    """,
    doc="One-way ANOVA across event types (does mean event value differ "
    "by type?) in EXACT fixed point — the omnibus location test "
    "completing the stats family (KS=distribution drift, chi2="
    "independence, Mann-Whitney=two-sample location, Gini/winsorized="
    "dispersion): values quantized to integer cents, per-group exact "
    "sufficient statistics (n_i, sum, sum-of-squares) in ONE aggregate "
    "pass with map-side partials, then SSB/SSW via the computational "
    "formula with DEFINED floor division (sum T_i^2 div n_i in 128-bit "
    "intermediates — DECIMAL(38) on Spark, HUGEINT in DuckDB — since "
    "T_i^2 overflows int64 beyond sf0.01) and the F statistic emitted in "
    "integer milli-units. The <=1-cent^2 flooring slack per group is part "
    "of the defined semantics, identical on both engines — no float ever "
    "enters, so the hash check is exact at any scale factor.",
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    g = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("cents").cast("long").alias("t_i"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q_i"),
    )
    parts = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_i").alias("n"),
        # True integral division (`div`, truncate-toward-zero) — NOT
        # floor(a / b): Spark decimal `/` rounds HALF_UP at result scale
        # before floor, so a quotient within ~5e-7 of an integer floors one
        # high vs DuckDB's exact `//`. Both `div` and `//` truncate toward
        # zero, so the engines agree bit-for-bit (relational.py money
        # protocol). Each per-group quotient T_i^2/n_i ~ n_i*mean^2 fits
        # int64 (Spark `div` returns BIGINT) up to ~3e9 rows/group; the SUM
        # across groups is carried in DECIMAL(38,0).
        F.sum(
            F.expr(
                "CAST(CAST(t_i AS DECIMAL(19,0)) * t_i div n_i"
                " AS DECIMAL(38,0))"
            )
        ).alias("sum_a"),
        F.sum("t_i").alias("t"),
        F.sum("q_i").alias("q"),
    )
    return parts.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.expr(
            "CAST(sum_a - CAST(t AS DECIMAL(19,0)) * t div n AS BIGINT)"
        ).alias("ssb_cents2"),
        F.expr("CAST(q - sum_a AS BIGINT)").alias("ssw_cents2"),
        F.expr(
            "CAST(1000 * (sum_a - CAST(t AS DECIMAL(19,0)) * t div n)"
            " * (n - k) div ((q - sum_a) * (k - 1)) AS BIGINT)"
        ).alias("f_milli"),
    )


@register(
    "evt_changepoint_cusum",
    """
    WITH hourly AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS hour,
               count(*) AS x
        FROM events GROUP BY event_type, hour
    ),
    ref AS (
        SELECT event_type,
               CAST(sum(x) AS BIGINT) // count(*) AS ref_x
        FROM hourly GROUP BY event_type
    ),
    dev AS (
        SELECT h.event_type, h.hour, h.x, r.ref_x,
               sum(h.x - r.ref_x) OVER (
                   PARTITION BY h.event_type ORDER BY h.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM hourly h JOIN ref r ON h.event_type = r.event_type
    ),
    cusum AS (
        SELECT event_type, hour, ref_x,
               p - least(CAST(0 AS BIGINT), min(p) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        FROM dev
    )
    SELECT event_type,
           CAST(max(s) AS BIGINT)                    AS max_cusum,
           CAST(min(CASE WHEN s > 5 * ref_x THEN hour END) AS BIGINT)
                                                     AS first_alarm_hour,
           CAST(sum(CASE WHEN s > 5 * ref_x THEN 1 ELSE 0 END) AS BIGINT)
                                                     AS n_alarm_hours
    FROM cusum GROUP BY event_type
    """,
    doc="CUSUM changepoint detection over the hourly per-type event "
    "stream — the sequential drift detector next to the EWMA smoother "
    "and the KS drift statistic: the recursive page form S_t = max(0, "
    "S_{t-1} + (x_t - ref)) is rewritten NON-recursively as P_t - "
    "min(0, running-min of P) (P = running sum of deviations), so two "
    "partition-local ordered windows over the tiny hourly rollup replace "
    "an un-expressible recursion; alarm threshold 5x the per-type "
    "reference rate, first alarm hour + alarm-hour count + peak CUSUM "
    "emitted per type. All arithmetic is exact integers (counts, floor-"
    "div reference), so the oracle hash-matches at any scale. Scale "
    "shape: raw events collapse in the ONE hourly hash aggregate "
    "(map-side partials); the windows run over event_type partitions "
    "bounded by distinct hours, never raw rows.",
)
def evt_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    hourly = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    ref = hourly.groupBy("event_type").agg(
        F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("ref_x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = hourly.join(ref, "event_type").withColumn(
        "p", F.sum(F.col("x") - F.col("ref_x")).over(w)
    )
    cusum = dev.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    alarm = F.col("s") > 5 * F.col("ref_x")
    return cusum.groupBy("event_type").agg(
        F.max("s").cast("long").alias("max_cusum"),
        F.min(F.when(alarm, F.col("hour"))).cast("long").alias("first_alarm_hour"),
        F.sum(F.when(alarm, 1).otherwise(0)).cast("long").alias("n_alarm_hours"),
    )


@register(
    "evt_last_touch_attribution",
    """
    WITH ev AS (
        SELECT event_id, user_id, event_type, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    seq AS (
        SELECT *,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_channel,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN epoch_us(ts) END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_us
        FROM ev
    )
    SELECT coalesce(CASE WHEN epoch_us(ts) - touch_us
                              <= CAST(604800000000 AS BIGINT)
                         THEN touch_channel END, 'organic') AS channel,
           CAST(count(*) AS BIGINT)     AS n_purchases,
           CAST(sum(cents) AS BIGINT)   AS revenue_cents
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY channel
    """,
    doc="Last-touch marketing attribution: every purchase is credited to "
    "the user's most recent non-purchase event within a 7-day lookback "
    "(older or absent touches fall to 'organic') — the sessionless "
    "attribution shape next to evt_funnel_conversion (ordered funnel) "
    "and evt_cohort_retention (cohort triangles). One user-keyed ordered "
    "window carries BOTH the channel and its timestamp via "
    "last_value(...) IGNORE NULLS over an unbounded-to-1-preceding "
    "frame; ties at identical timestamps break on event_id so the "
    "cross-engine replay is deterministic. Exact integer cents. Scale "
    "shape: one exchange on user_id (partition-local sort bounded by "
    "per-user event counts), then a channel-keyed aggregate over "
    "purchases only.",
)
def evt_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    seq = ev.withColumn(
        "touch_channel",
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True).over(w),
    ).withColumn(
        "touch_us",
        F.last(
            F.when(non_purchase, F.unix_micros("ts")), ignorenulls=True
        ).over(w),
    )
    in_window = (
        F.unix_micros("ts") - F.col("touch_us") <= 7 * 86400 * 1_000_000
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(in_window, F.col("touch_channel")), F.lit("organic")
            ).alias("channel"),
            "cents",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


@register(
    "scd2_bitemporal_asof",
    """
    WITH base AS (SELECT doc_id, n_chars FROM documents),
    mx AS (SELECT max(doc_id) AS m FROM base),
    -- Standard bitemporal correction protocol: the original belief row
    -- (A: valid [0,inf), believed [0,inf)) gets its TRANSACTION
    -- interval closed at the correction instant 2000+doc_id, and two
    -- rows open believed-from that instant: the restated history
    -- (B: original value, valid [0, 1000+doc_id)) and the correction
    -- (C: new value, valid [1000+doc_id, inf)). Valid-time history is
    -- never destroyed; earlier beliefs remain queryable by tx.
    versions AS (
        SELECT doc_id, n_chars,
               CAST(0 AS BIGINT) AS valid_from,
               CAST(NULL AS BIGINT) AS valid_to,
               CAST(0 AS BIGINT) AS tx_from,
               CASE WHEN doc_id % 2 = 0 THEN 2000 + doc_id END AS tx_to
        FROM base
        UNION ALL
        SELECT doc_id, n_chars,
               0, 1000 + doc_id,
               2000 + doc_id, NULL
        FROM base WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, n_chars + 1,
               1000 + doc_id, NULL,
               2000 + doc_id, NULL
        FROM base WHERE doc_id % 2 = 0
    ),
    probes AS (
        SELECT CAST(500 AS BIGINT) AS tx_at, 1501 + m AS valid_at, m
        FROM mx
        UNION ALL
        SELECT 2501 + m, 1501 + m, m FROM mx
        UNION ALL
        SELECT 2501 + m, CAST(500 AS BIGINT), m FROM mx
    ),
    hits AS (
        SELECT p.tx_at, p.valid_at, v.doc_id, v.n_chars
        FROM probes p JOIN versions v
          ON v.tx_from <= p.tx_at
         AND (v.tx_to IS NULL OR p.tx_at < v.tx_to)
         AND v.valid_from <= p.valid_at
         AND (v.valid_to IS NULL OR p.valid_at < v.valid_to)
    )
    SELECT tx_at, valid_at,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS total_chars
    FROM hits GROUP BY tx_at, valid_at
    """,
    doc="BITEMPORAL as-of join — the two-axis extension of "
    "scd2_pointintime_join: every version carries a VALID-time interval "
    "(when the fact was true in the world) AND a TRANSACTION-time "
    "interval (when the warehouse believed it), so 'what did we know at "
    "tx=T about time V' is answerable after late corrections without "
    "rewriting history. The correction protocol closes the original "
    "row's TRANSACTION interval at tx=2000+doc_id and opens two rows "
    "believed from that instant — restated history (original value, "
    "valid to 1000+doc_id) and the correction (new value, valid "
    "onward) — so probe (tx=500, V=late) sees the ORIGINAL values "
    "everywhere (the correction was not yet known: every doc present), "
    "probe (tx=late, V=late) sees the corrected values for even docs, "
    "and probe (tx=late, V=500) reaches back to the restated original "
    "validity — all probes data-derived (offsets past max(doc_id)) so "
    "the assertions hold at any scale factor. Plan shape: the probe "
    "side is "
    "3 rows, so Catalyst broadcasts it and the residual double-interval "
    "predicate evaluates on the dimension scan — never a cartesian "
    "product; at warehouse scale the dimension shuffles once on the "
    "equi-key (doc_id when probing per-document) exactly like the SCD-2 "
    "single-axis case.",
)
def scd2_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = d.agg(F.max("doc_id")).first()[0]
    even = F.col("doc_id") % 2 == 0
    null_l = F.lit(None).cast("long")
    # A: original belief — valid forever, believed until the correction
    va = d.select(
        "doc_id",
        "n_chars",
        F.lit(0).cast("long").alias("valid_from"),
        null_l.alias("valid_to"),
        F.lit(0).cast("long").alias("tx_from"),
        F.when(even, F.col("doc_id") + 2000).cast("long").alias("tx_to"),
    )
    # B: restated history — original value, validity closed at the
    # correction's effective time, believed from the correction instant
    vb = d.filter(even).select(
        "doc_id",
        "n_chars",
        F.lit(0).cast("long").alias("valid_from"),
        (F.col("doc_id") + 1000).cast("long").alias("valid_to"),
        (F.col("doc_id") + 2000).cast("long").alias("tx_from"),
        null_l.alias("tx_to"),
    )
    # C: the correction itself
    vc = d.filter(even).select(
        "doc_id",
        (F.col("n_chars") + 1).alias("n_chars"),
        (F.col("doc_id") + 1000).cast("long").alias("valid_from"),
        null_l.alias("valid_to"),
        (F.col("doc_id") + 2000).cast("long").alias("tx_from"),
        null_l.alias("tx_to"),
    )
    versions = va.unionByName(vb).unionByName(vc)
    probes = d.sparkSession.createDataFrame(
        [(500, 1501 + m), (2501 + m, 1501 + m), (2501 + m, 500)],
        "tx_at long, valid_at long",
    )
    # The probe side is 3 rows BY CONSTRUCTION — broadcast it explicitly.
    # Left to stats, Catalyst broadcasts whichever side estimates smaller:
    # at sf0.01 that is the versions relation (a fine BNLJ), but at sf10
    # versions outgrow the threshold and the non-equi join degrades to a
    # CartesianProduct that re-reads the dimension per probe partition
    # (measured 36 s -> ~2 s). With the bounded side pinned as the build,
    # the plan is one streamed pass over versions at any scale factor.
    hits = F.broadcast(probes).join(
        versions,
        (F.col("tx_from") <= F.col("tx_at"))
        & (F.col("tx_to").isNull() | (F.col("tx_at") < F.col("tx_to")))
        & (F.col("valid_from") <= F.col("valid_at"))
        & (F.col("valid_to").isNull() | (F.col("valid_at") < F.col("valid_to"))),
    )
    return hits.groupBy("tx_at", "valid_at").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# Benford first-digit expected probabilities log10(1+1/d) in micro-units
# (fixed literals on BOTH engines — no float log at query time).
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "dq_benford_first_digit",
    f"""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents WHERE c > 0
    ),
    obs AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT sum(n) AS t FROM obs),
    exp_tbl AS (
        SELECT * FROM (VALUES
            {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_MICRO.items()))}
        ) AS e(digit, p_micro)
    )
    SELECT e.digit,
           CAST(coalesce(o.n, 0) AS BIGINT)            AS n,
           CAST(t.t * e.p_micro // 1000000 AS BIGINT)  AS expected_n,
           CAST(abs(coalesce(o.n, 0) * 1000000 - t.t * e.p_micro)
                // t.t AS BIGINT)                      AS abs_dev_micro
    FROM exp_tbl e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN tot t
    """,
    doc="Benford's-law first-digit audit over order totals — the "
    "fraud/fabrication screen in the data-quality family (expectations "
    "gate, referential integrity, column profile, try_* absorption): "
    "first digits come from exact integer cents via string head (no "
    "float log at query time), observed counts vs the Benford expected "
    "distribution with log10(1+1/d) pinned as integer micro-unit "
    "LITERALS identical in both engines, deviations in exact micro "
    "units via integer floor division. One aggregate pass collapses the "
    "fact table to <= 9 rows; the expected table is a 9-row literal "
    "relation broadcast onto it.",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c")
    )
    obs = (
        c.filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exp_tbl = spark.createDataFrame(
        sorted(_BENFORD_MICRO.items()), "digit long, p_micro long"
    )
    tot = obs.agg(F.sum("n").alias("t"))
    return (
        exp_tbl.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.expr("CAST((t * p_micro) div 1000000 AS BIGINT)").alias("expected_n"),
            F.expr(
                "CAST(abs(coalesce(n, 0) * 1000000 - t * p_micro) div t AS BIGINT)"
            ).alias("abs_dev_micro"),
        )
    )


@register(
    "evt_rfm_segmentation",
    """
    WITH rfm AS (
        SELECT o_custkey,
               CAST((SELECT max(epoch_us(o_orderdate)) FROM orders)
                    // 86400000000
                    - max(epoch_us(o_orderdate)) // 86400000000
                    AS BIGINT)                                  AS recency_days,
               count(*)                                         AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)                                  AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT 'r' AS met, recency_days AS v FROM rfm
        UNION ALL SELECT 'f' AS met, CAST(n_orders AS BIGINT) AS v FROM rfm
        UNION ALL SELECT 'm' AS met, monetary_cents AS v FROM rfm
    ),
    grid AS (SELECT met, v, count(*) AS c FROM m GROUP BY met, v),
    cum AS (
        SELECT met, v,
               sum(c) OVER (PARTITION BY met ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_c,
               sum(c) OVER (PARTITION BY met) AS n
        FROM grid
    ),
    cl AS (
        SELECT met,
               min(CASE WHEN 5 * cum_c >= 1 * n THEN v END) AS c1,
               min(CASE WHEN 5 * cum_c >= 2 * n THEN v END) AS c2,
               min(CASE WHEN 5 * cum_c >= 3 * n THEN v END) AS c3,
               min(CASE WHEN 5 * cum_c >= 4 * n THEN v END) AS c4
        FROM cum GROUP BY met
    ),
    cuts AS (
        SELECT
            min(CASE WHEN met = 'r' THEN c1 END) AS r1,
            min(CASE WHEN met = 'r' THEN c2 END) AS r2,
            min(CASE WHEN met = 'r' THEN c3 END) AS r3,
            min(CASE WHEN met = 'r' THEN c4 END) AS r4,
            min(CASE WHEN met = 'f' THEN c1 END) AS f1,
            min(CASE WHEN met = 'f' THEN c2 END) AS f2,
            min(CASE WHEN met = 'f' THEN c3 END) AS f3,
            min(CASE WHEN met = 'f' THEN c4 END) AS f4,
            min(CASE WHEN met = 'm' THEN c1 END) AS m1,
            min(CASE WHEN met = 'm' THEN c2 END) AS m2,
            min(CASE WHEN met = 'm' THEN c3 END) AS m3,
            min(CASE WHEN met = 'm' THEN c4 END) AS m4
        FROM cl
    )
    SELECT CAST(1 + CAST(recency_days > r1 AS INTEGER)
                  + CAST(recency_days > r2 AS INTEGER)
                  + CAST(recency_days > r3 AS INTEGER)
                  + CAST(recency_days > r4 AS INTEGER) AS BIGINT)       AS r_seg,
           CAST(1 + CAST(n_orders > f1 AS INTEGER)
                  + CAST(n_orders > f2 AS INTEGER)
                  + CAST(n_orders > f3 AS INTEGER)
                  + CAST(n_orders > f4 AS INTEGER) AS BIGINT)           AS f_seg,
           CAST(1 + CAST(monetary_cents > m1 AS INTEGER)
                  + CAST(monetary_cents > m2 AS INTEGER)
                  + CAST(monetary_cents > m3 AS INTEGER)
                  + CAST(monetary_cents > m4 AS INTEGER) AS BIGINT)     AS m_seg,
           CAST(count(*) AS BIGINT)              AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT)   AS total_monetary_cents
    FROM rfm CROSS JOIN cuts
    GROUP BY r_seg, f_seg, m_seg
    """,
    doc="RFM (recency/frequency/monetary) customer segmentation — the "
    "classic warehouse cohorting shape next to funnel/retention/"
    "attribution: per-customer exact integer metrics (days since last "
    "order, order count, lifetime cents) in one keyed aggregate, "
    "quintile cutoffs from EXACT counting-grid order statistics (the "
    "agg_fixed_grid_quantiles lower-nearest-rank pattern: unpivot the "
    "three integer metrics, count per distinct value, cumulative window "
    "over the bounded value domain, then min value whose 5*cum >= k*n — "
    "integer cross-multiplication, no interpolation, so the cuts are "
    "integer-exact on both engines; interpolated percentile() vs "
    "quantile_cont() can differ by 1 ulp and reclassify every customer "
    "sitting on a boundary) broadcast back, and each quintile index "
    "computed as 1 + sum of strict-threshold exceedances — boolean "
    "integer adds, no window over customers, no ntile (a global ntile "
    "would funnel every customer through one task; the threshold form "
    "keeps the relation partitioned). Output is the 125-cell segment "
    "cube with customer counts and monetary totals. The grid state is "
    "O(distinct metric values), mergeable by addition — the 100 TB "
    "path, no per-buffer value vector.",
)
def evt_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    rfm = o.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("monetary_cents"),
    )
    global_last = rfm.agg(F.max("last_day").alias("g")).first()["g"]
    rfm = rfm.withColumn(
        "recency_days", (F.lit(global_last) - F.col("last_day")).cast("long")
    )

    # Exact lower-nearest-rank quintile cuts via the counting-grid pattern
    # (agg_fixed_grid_quantiles): integer-exact on both engines, O(distinct
    # values) state, no interpolation arithmetic to diverge by 1 ulp.
    m = rfm.select(
        F.expr(
            "stack(3, 'r', recency_days, 'f', CAST(n_orders AS BIGINT),"
            " 'm', monetary_cents) AS (met, v)"
        )
    )
    grid = m.groupBy("met", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("met")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "met",
        "v",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(Window.partitionBy("met")).alias("n"),
    )
    cl = cum.groupBy("met").agg(
        *[
            F.min(
                F.when(5 * F.col("cum_c") >= k * F.col("n"), F.col("v"))
            ).alias(f"c{k}")
            for k in range(1, 5)
        ]
    )
    cuts = cl.agg(
        *[
            F.min(F.when(F.col("met") == met, F.col(f"c{k}"))).alias(
                f"{met}{k}"
            )
            for met in ("r", "f", "m")
            for k in range(1, 5)
        ]
    )

    def seg(metric, pfx):
        s = F.lit(1)
        for i in range(1, 5):
            s = s + (F.col(metric) > F.col(f"{pfx}{i}")).cast("int")
        return s.cast("long")

    return (
        rfm.crossJoin(F.broadcast(cuts))
        .select(
            seg("recency_days", "r").alias("r_seg"),
            seg("n_orders", "f").alias("f_seg"),
            seg("monetary_cents", "m").alias("m_seg"),
            "monetary_cents",
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("total_monetary_cents"),
        )
    )


# Adamic-Adar inverse-log-degree weights in integer micro-units, as a
# 64-entry fixed-point table so no float arithmetic reaches either engine:
# position d (1-based) = round(1e6 / log2(d)). Wedge apexes always have
# degree >= 2 (a wedge needs two distinct neighbors), so position 1 is an
# unused 0; the adjacency filter caps degree at 64.
_AA_LOG2_MICRO: list[int] = [0] + [
    round(1_000_000 / math.log2(d)) for d in range(2, 65)
]
_AA_LOG2_MICRO_SQL = ", ".join(str(w) for w in _AA_LOG2_MICRO)


@register(
    "graph_adamic_adar_links",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    -- low-degree connector apexes only (<= 64): bounds the wedge
    -- fan-out AND matches Adamic-Adar's rationale (hubs carry little
    -- link signal; their inverse-degree weight is near zero anyway)
    adj AS (
        SELECT e.src AS x, e.dst AS nbr, d.d
        FROM edges e JOIN deg d ON e.src = d.node WHERE d.d <= 64
    ),
    wedge AS (
        SELECT a.nbr AS ya, b.nbr AS yb, a.d
        FROM adj a JOIN adj b ON a.x = b.x AND a.nbr < b.nbr
    ),
    scored AS (
        SELECT ya, yb,
               CAST(sum(([{_AA_LOG2_MICRO_SQL}])[d]) AS BIGINT) AS aa_micro,
               count(*) AS n_common
        FROM wedge GROUP BY ya, yb
    ),
    non_edges AS (
        SELECT sc.* FROM scored sc
        LEFT JOIN edges e ON sc.ya = e.src AND sc.yb = e.dst
        WHERE e.src IS NULL
    )
    SELECT CAST(ya AS BIGINT) AS node_a, CAST(yb AS BIGINT) AS node_b,
           aa_micro, CAST(n_common AS BIGINT) AS n_common
    FROM non_edges
    ORDER BY aa_micro DESC, node_a, node_b LIMIT 25
    """,
    doc="Link prediction via Adamic-Adar common-neighbor scoring over the "
    "trading graph — the predictive-analytics member of the graph family "
    "(CC/PageRank/BFS/k-core/LPA/triangles describe the graph; this "
    "predicts its next edges): candidate pairs are generated by a wedge "
    "self-join restricted to connector apexes of degree <= 64 — the "
    "hub guard bounding the quadratic fan-out (the same cap idiom as the "
    "token-lift basket and the fuzzy-match block), which HERE also "
    "matches the measure's own rationale: Adamic-Adar weights each "
    "common neighbor by 1/log(degree), so excluded hubs contribute "
    "little signal by construction. Weights come from a 64-entry "
    "fixed-point table (round(1e6/log2(d)), identical integer literal "
    "array on both engines — no float arithmetic in either plan), "
    "existing edges drop via an anti-join on the symmetrized edge set, "
    "and the top 25 predicted links break ties on the node pair so the "
    "hash check is exact.",
)
def graph_adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import _edges_on_disk, _exchange_width

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # DISK_ONLY + size-aware widths (operators/graph.py memory
    # discipline): the wedge relation is ~sum(deg_capped^2) rows — ~1B at
    # the sf10 trading graph — so its aggregate exchange must scale with
    # the data, and the edge relation must not pin execution memory.
    edges, n_edges = _edges_on_disk(
        pairs.select(
            (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
        ).unionAll(
            pairs.select(
                (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
            )
        )
    )
    sc = spark.sparkContext
    width = _exchange_width(sc, n_edges)
    # wedge volume ~ capped-degree^2 per apex; width accordingly wider
    wedge_width = _exchange_width(sc, n_edges * 40)
    deg = edges.repartition(width, "src").groupBy(
        F.col("src").alias("node")
    ).agg(F.count(F.lit(1)).alias("d"))
    adj = (
        edges.repartition(width, "src")
        .join(deg, edges["src"] == deg["node"])
        .filter(F.col("d") <= 64)
        .select(F.col("src").alias("x"), F.col("dst").alias("nbr"), "d")
    )
    a = adj.select(F.col("x"), F.col("nbr").alias("ya"), "d")
    b = adj.select(F.col("x"), F.col("nbr").alias("yb"))
    wedge = a.join(b, "x").filter(F.col("ya") < F.col("yb"))
    scored = wedge.repartition(wedge_width, "ya", "yb").groupBy("ya", "yb").agg(
        F.sum(
            F.expr(
                f"element_at(array({_AA_LOG2_MICRO_SQL}), CAST(d AS INT))"
            )
        )
        .cast("long")
        .alias("aa_micro"),
        F.count(F.lit(1)).alias("n_common"),
    )
    non_edges = scored.join(
        edges,
        (scored["ya"] == edges["src"]) & (scored["yb"] == edges["dst"]),
        "left_anti",
    )
    return (
        non_edges.select(
            F.col("ya").cast("long").alias("node_a"),
            F.col("yb").cast("long").alias("node_b"),
            "aa_micro",
            F.col("n_common").cast("long").alias("n_common"),
        )
        .orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
        .limit(25)
    )


@register(
    "spatial_proximity_pairs",
    """
    WITH pts AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) * 100 AS x,
               CAST(embedding[2] AS DOUBLE) * 100 AS y
        FROM embeddings
    ),
    offs AS (SELECT unnest(generate_series(-1, 1)) AS o),
    a AS (
        SELECT p.vec_id, p.x, p.y,
               CAST(floor(p.x / 5.0) AS BIGINT) + ox.o AS cx,
               CAST(floor(p.y / 5.0) AS BIGINT) + oy.o AS cy
        FROM pts p CROSS JOIN offs ox CROSS JOIN offs oy
    ),
    b AS (
        SELECT vec_id, x, y,
               CAST(floor(x / 5.0) AS BIGINT) AS cx,
               CAST(floor(y / 5.0) AS BIGINT) AS cy
        FROM pts
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                   AS dist
        FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy
        WHERE a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           floor(dist * 10000 + 0.5) / 10000 AS dist
    FROM pairs WHERE dist <= 5.0
    """,
    doc="Spatial proximity self-join (all point pairs within radius 5) "
    "via 2-D grid bucketing — the SPATIAL JOIN operator Spark lacks "
    "natively, built the same way the engine builds every all-pairs "
    "shape: bucket to kill the quadratic, exact predicate to finish. "
    "Cell size equals the radius, so |dx|<=r implies a cell delta of at "
    "most 1 — but a cross-cell pair only needs ONE of its points to "
    "visit the other's home cell, so each point replicates to its home "
    "plus the 4 FORWARD neighbors only (E, NE, N, NW: exactly one of "
    "{delta, -delta} per nonzero offset), a 5x map-side explode instead "
    "of the naive 3x3's 9x — 44% less replicated exchange volume with "
    "exactly-once pair coverage preserved (same-cell pairs keep the "
    "id-order dedup; cross-cell pairs are id-normalized on emit; "
    "asserted pair-for-pair against the quadratic brute force in "
    "tests/test_temporal_joins.py). The equi-join on (cx, cy) is an "
    "ordinary hash join: skew from dense cells splits via AQE exactly "
    "like the LSH band buckets. Points derive deterministically from "
    "the embedding table's first two components scaled to a field-sized "
    "span; distances emitted at the engine's 4 dp half-up contract.",
)
def spatial_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Forward-neighbor replication: the self-join analog of build-side
    # replication. A 3x3 replicate-one-side plan ships every point 9x;
    # but a pair in DIFFERENT cells only needs ONE of the two points to
    # visit the other's home cell, so replicating each point to its home
    # plus the 4 FORWARD neighbors (E, NE, N, NW — exactly one of
    # {delta, -delta} for each of the 8 nonzero cell offsets) still meets
    # every qualifying pair exactly once at 5/9 the exploded volume.
    # Same-cell pairs meet home-vs-home and keep the id_a < id_b dedup;
    # cross-cell pairs meet once by construction (the forward set never
    # contains both delta and -delta) and are emitted id-normalized via
    # least/greatest. The squared differences are symmetric in IEEE
    # (negation is exact), so the id-normalized distance is bit-identical
    # to the oracle's replicate-9x formulation and the oracle is
    # unchanged; pair-set equality with the 3x3 plan is asserted in
    # tests/test_sketches.py.
    r = 5.0
    pts = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("embedding")[0].cast("double") * 100).alias("x"),
        (F.col("embedding")[1].cast("double") * 100).alias("y"),
    )
    fwd = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1))
            ]
        )
    )
    a = pts.select(
        F.col("vec_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.floor(F.col("x") / r).cast("long").alias("hx"),
        F.floor(F.col("y") / r).cast("long").alias("hy"),
        fwd.alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("hx") + F.col("o.dx")).alias("cx"),
        (F.col("hy") + F.col("o.dy")).alias("cy"),
        (F.col("o.dx") == 0).__and__(F.col("o.dy") == 0).alias("same_cell"),
    )
    b = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.floor(F.col("x") / r).cast("long").alias("cx"),
        F.floor(F.col("y") / r).cast("long").alias("cy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        a.join(b, ["cx", "cy"])
        .filter(
            (F.col("same_cell") & (F.col("id_a") < F.col("id_b")))
            | (~F.col("same_cell"))
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") <= r)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            (F.floor(F.col("dist") * 10000 + 0.5) / 10000).alias("dist"),
        )
    )


@register(
    "agg_hll_overlap_estimate",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    a AS (SELECT event_type, user_id FROM ut),
    b AS (SELECT event_type, user_id FROM ut),
    ov AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS exact_overlap
        FROM a JOIN b ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, CAST(exact_overlap AS BIGINT) AS exact_overlap,
           TRUE AS sketch_within_tol
    FROM ov
    """,
    doc="Audience-overlap estimation via HLL sketch algebra — the "
    "set-INTERSECTION sibling of agg_hll_shard_union: |A intersect B| = "
    "|A| + |B| - |A union B| by inclusion-exclusion, where each term is "
    "an HLL estimate and the union comes from hll_union of the two "
    "per-type sketches — so pairwise audience overlaps across N "
    "segments need N sketches (16 KB each), not N^2 distinct-count "
    "scans; a new segment means ONE new sketch. Per the registry's "
    "sketch idiom the emitted columns are the EXACT overlap (one "
    "distinct (user,type) relation self-joined on user, keyed shuffle) "
    "plus a Spark-computed tolerance boolean the oracle emits as literal "
    "TRUE. The tolerance is max(5% of exact overlap, 5% of |A|+|B|): "
    "inclusion-exclusion error is ABSOLUTE in the set sizes (std ~ "
    "1.04/sqrt(2^14) ~ 0.81% per term, <= ~1.6% of |A|+|B| combined, so "
    "5% is ~3 sigma), while a purely relative 5%-of-overlap check would "
    "false-fail any low-overlap pair at larger scale factors where the "
    "exact intersection is small relative to the audiences.",
)
def agg_hll_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ut = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    sk = ut.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ska = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
    )
    skb = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
    )
    est = (
        ska.crossJoin(skb)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (
                F.expr("hll_sketch_estimate(sk_a)")
                + F.expr("hll_sketch_estimate(sk_b)")
                - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
            ).alias("est_overlap"),
        )
    )
    return exact.join(F.broadcast(est), ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_overlap",
        # absolute floor: HLL error compounds absolutely in |A|+|B|, not
        # relative to the (possibly tiny) intersection
        (
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            <= F.greatest(
                0.05 * F.col("exact_overlap"),
                0.05 * (F.col("n_a") + F.col("n_b")),
            )
        ).alias("sketch_within_tol"),
    )


# ---------------------------------------------------------------------------
# Round-8 additions: sorted-neighborhood dedup, weighted sampling,
# hard-negative mining, histogram split finding
# ---------------------------------------------------------------------------


@register(
    "dedup_sorted_neighborhood",
    """
    WITH ranked AS (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY text, doc_id) AS g
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.g - a.g AS INTEGER) AS gap,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
    FROM ranked a JOIN ranked b ON b.g > a.g AND b.g <= a.g + 4
    WHERE levenshtein(a.text, b.text) <= 60
    """,
    doc="Sorted-neighborhood dedup (Hernandez & Stolfo 1995 merge/purge) — "
    "the third near-dup METHOD family next to MinHash-LSH and SimHash: "
    "sort by a blocking key (here the text itself + id tiebreak, a total "
    "order identical under Spark's and DuckDB's binary string collation), "
    "compare each record with only its 4 sort-successors, keep pairs "
    "within Levenshtein 60. O(n log n + 4n) comparisons, no signature "
    "state. The distributed global rank comes from global_sort_rank "
    "(operators/dedup.py): ONE range exchange + per-partition row_number "
    "+ broadcast partition-count offsets (the only driver state, one long "
    "per partition) — never a single-partition global window; neighbor "
    "pairing is then a keyed EQUI-join on rank (rank_b = rank_a + j, j "
    "exploded 1..4), balanced at any scale. The edit-distance filter uses "
    "Spark's bounded levenshtein(a, b, threshold) which abandons a pair "
    "early once the bound is exceeded.",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import sorted_neighborhood_pairs

    d = _t(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        d, "doc_id", "text", window=4, max_distance=60
    )


@register(
    "doc_sequential_poisson_sample",
    """
    WITH w AS (
        SELECT source, doc_id,
               CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
                   // greatest(coalesce(n_chars, 1), 1) AS priority
        FROM documents
    )
    SELECT source, doc_id, CAST(priority AS BIGINT) AS priority
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY priority, doc_id) AS rk
          FROM w) t
    WHERE rk <= 20
    """,
    doc="Weighted sampling without replacement via sequential Poisson "
    "sampling (Ohlsson 1998, the order-sampling approximation of "
    "probability-proportional-to-size used by statistics agencies): each "
    "doc draws priority u/w where u is a 60-bit uniform derived from the "
    "CONTENT (md5 hex prefix -> integer, the portable-hash cookbook rule) "
    "and w = n_chars is the size weight; the k=20 smallest priorities per "
    "source stratum are the sample, so longer documents are "
    "proportionally more likely to be drawn. The division stays in exact "
    "integer arithmetic (Spark `div` = DuckDB `//`) with doc_id "
    "tiebreaks, so the draw is reproducible across engines, runs, and "
    "partitionings — the weighted complement of doc_quota_sample's "
    "uniform hash-priority draw. Map-only scoring at the scan, then one "
    "per-stratum top-k window that Spark 3.5+ executes as "
    "WindowGroupLimit (partial per-partition top-k before the exchange, "
    "never a full sort of the corpus).",
)
def doc_sequential_poisson_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(CAST(text AS BINARY)), 1, 15), 16, 10)"
            " AS BIGINT) div greatest(coalesce(n_chars, 1L), 1L)"
        ).alias("priority"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy("priority", "doc_id")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 20)
        .select("source", "doc_id", "priority")
    )


@register(
    "sim_hard_negatives",
    """
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    a AS (SELECT * FROM v WHERE vec_id < 100),
    scored AS (
        SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
               round(list_dot_product(a.emb, c.emb)
                     / (sqrt(list_dot_product(a.emb, a.emb))
                        * sqrt(list_dot_product(c.emb, c.emb))), 4) AS cosine
        FROM a JOIN v c ON c.label <> a.label
    )
    SELECT anchor_id, cand_id AS negative_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY cosine DESC, cand_id) AS rk
          FROM scored) t
    WHERE rk <= 1
    """,
    doc="Hard-negative mining for contrastive training: for each anchor "
    "(vec_id < 100) the single most-similar vector with a DIFFERENT "
    "label — the negatives that actually move a contrastive loss. "
    "Exact top-1 by rounded cosine with vec_id tiebreak (ties broken on "
    "the 4-dp ROUNDED value so both engines break the same ties). Plan: "
    "anchors broadcast against the corpus (BroadcastNestedLoopJoin on "
    "the label inequality — the anchor batch is the bounded side by "
    "contract), cosine JVM-side via zip_with/aggregate, then ONE "
    "partial-aggregated max_by struct per anchor, so only |anchors| "
    "rows reach the exchange. At corpus scale the same contract as "
    "sim_topk_bruteforce applies: this is the exact baseline; the ANN "
    "path for unbounded anchor sets is label-filtered sim_knn_join / "
    "IVF probing.",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    anchors = e.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("emb").alias("a_emb"),
    )
    cos4 = F.round(cosine_col("a_emb", "emb"), 4)
    scored = (
        F.broadcast(anchors)
        .join(e, F.col("label") != F.col("a_label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("cand_id"),
            cos4.alias("cosine"),
        )
    )
    best = scored.groupBy("anchor_id").agg(
        F.max(
            F.struct(
                F.col("cosine").alias("c"),
                (-F.col("cand_id")).alias("neg_vid"),
            )
        ).alias("b")
    )
    return best.select(
        "anchor_id",
        (-F.col("b.neg_vid")).cast("long").alias("negative_id"),
        F.col("b.c").alias("cosine"),
    )


@register(
    "ml_stump_split_finding",
    """
    WITH pts AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    melted AS (
        SELECT 'quantity' AS feature, qty AS val, y FROM pts
        UNION ALL
        SELECT 'discount' AS feature, disc AS val, y FROM pts
    ),
    hist AS (
        SELECT feature, val,
               count(*) AS n_b,
               CAST(sum(y) AS HUGEINT) AS s_b
        FROM melted GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, val,
               sum(n_b) OVER w AS n_l,
               sum(s_b) OVER w AS s_l,
               sum(n_b) OVER (PARTITION BY feature) AS n_t,
               sum(s_b) OVER (PARTITION BY feature) AS s_t
        FROM hist
        WINDOW w AS (PARTITION BY feature ORDER BY val
                     ROWS UNBOUNDED PRECEDING)
    ),
    gains AS (
        SELECT feature, val AS threshold,
               (s_l * s_l) // n_l
                 + ((s_t - s_l) * (s_t - s_l)) // (n_t - n_l)
                 - (s_t * s_t) // n_t AS gain
        FROM cum WHERE n_l < n_t
    )
    SELECT feature, CAST(threshold AS BIGINT) AS threshold,
           CAST(gain // 1000000000 AS BIGINT) AS gain_1e9
    FROM (SELECT *, row_number() OVER (PARTITION BY feature
                                       ORDER BY gain DESC, threshold) AS rk
          FROM gains) t
    WHERE rk <= 1
    """,
    doc="Histogram-based best-split finding — one round of the split "
    "search inside every gradient-boosted-tree trainer (XGBoost/LightGBM "
    "hist mode): for each feature (l_quantity; l_discount in integer "
    "percent) and each candidate threshold t, the SSE reduction of "
    "splitting at val <= t, computed from per-bin (count, sum) "
    "histograms only — gain = S_L^2/n_L + S_R^2/n_R - S^2/n needs no "
    "sum of squares. All arithmetic exact: y in integer cents, sums as "
    "DECIMAL(38,0)/HUGEINT, quotients via true integer division (Spark "
    "`div` = DuckDB `//`), ties to the lowest threshold. Scale shape is "
    "the gradient-histogram pattern: ONE shuffle builds the per-(feature,"
    "bin) histogram (map-side partial agg collapses 100 TB of rows to "
    "#bins rows), the cumulative-sum window then runs over <=61 bins per "
    "feature — bounded regardless of data size.",
)
def ml_stump_split_finding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("disc"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("y"),
    )
    melted = pts.select(
        F.expr("stack(2, 'quantity', qty, 'discount', disc)").alias(
            "feature", "val"
        ),
        "y",
    )
    hist = melted.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("y").cast("decimal(38,0)").alias("s_b"),
    )
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "val",
        F.sum("n_b").over(w_cum).alias("n_l"),
        F.sum("s_b").over(w_cum).alias("s_l"),
        F.sum("n_b").over(w_tot).alias("n_t"),
        F.sum("s_b").over(w_tot).alias("s_t"),
    )
    # Floor division in PURE decimal: Spark's `div` operator always
    # returns BIGINT, and S^2/n already exceeds int64 at sf0.1 (~8e18).
    # For nonnegative decimals a div b == (a - a % b) / b, and that
    # division's result is exactly integral, so the decimal divide's
    # HALF_UP rounding is the identity — exact floor division with no
    # long anywhere.
    def _idiv(a: str, b: str) -> str:
        return f"CAST((({a}) - ({a}) % ({b})) / ({b}) AS DECIMAL(38,0))"

    gains = cum.filter(F.col("n_l") < F.col("n_t")).select(
        "feature",
        F.col("val").alias("threshold"),
        F.expr(
            _idiv("s_l * s_l", "n_l")
            + " + "
            + _idiv("(s_t - s_l) * (s_t - s_l)", "n_t - n_l")
            + " - "
            + _idiv("s_t * s_t", "n_t")
        ).alias("gain"),
    )
    rk = F.row_number().over(
        Window.partitionBy("feature").orderBy(
            F.col("gain").desc(), "threshold"
        )
    )
    return (
        gains.withColumn("rk", rk)
        .filter(F.col("rk") <= 1)
        .select(
            "feature",
            F.col("threshold").cast("long").alias("threshold"),
            # The argmax ranks on the FULL-precision integer gain; only the
            # reported value is coarsened (// 1e9) so it fits BIGINT on
            # both engines at any scale (gain <= S^2/n ~ 8e24 cents^2 at
            # the 100 TB point -> 8e15 after the division, inside 2^53 and
            # int64 alike — no decimal->double conversion, the tpch_q9
            # 1-ulp divergence class never arises).
            F.expr(
                "CAST((gain - gain % 1000000000) / 1000000000 AS BIGINT)"
            ).alias("gain_1e9"),
        )
    )


@register(
    "txt_bm25_topk",
    """
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
        SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM d
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents) t
        WHERE term IN ('hash', 'join', 'scan')
        GROUP BY doc_id, term
    ),
    per AS (
        SELECT f.doc_id,
               CAST(floor(
                   (s.n * 1.0 / count(*) OVER (PARTITION BY f.term))
                   * (f.tf * 2.2)
                   / (f.tf + 1.2 * (0.25 + 0.75 * (d.dl * 1.0 / s.avgdl)))
                   * 10000 + 0.5) AS BIGINT) AS s4
        FROM tf f JOIN d USING (doc_id) CROSS JOIN stats s
    )
    SELECT doc_id, CAST(sum(s4) AS BIGINT) AS score_1e4,
           CAST(count(*) AS INTEGER) AS n_terms
    FROM per GROUP BY doc_id
    ORDER BY score_1e4 DESC, doc_id
    LIMIT 25
    """,
    doc="BM25 relevance scoring (Robertson-Sparck Jones, k1=1.2 b=0.75) "
    "for a fixed query — the retrieval-grade ranker behind "
    "query-relevance data curation, one step past txt_tfidf_topterms: "
    "tf saturation via k1 and length normalization via b*dl/avgdl. "
    "Ratio idf (N/df) keeps the whole score inside exactly-rounded IEEE "
    "ops — no ln(), no libm divergence — and each (doc, term) score is "
    "fixed-pointed to 1e-4 BEFORE the per-doc sum, so the cross-row "
    "aggregation is an order-free exact INTEGER sum (a float sum's "
    "addend order is partitioning-dependent). Scale shape: document "
    "length is size(split(...)) map-side (the corpus never explodes for "
    "it); only query-term tokens survive the explode into the ONE "
    "(doc, term) shuffle; df comes from count() OVER (PARTITION BY "
    "term) on that tf relation so the tf subtree is computed once (the "
    "tfidf CSE finding); N/avgdl arrive as a broadcast one-row join; "
    "the final top-25 is TakeOrderedAndProject (distributed top-k, "
    "never a global sort).",
)
def txt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    TERMS = ["hash", "join", "scan"]
    # constants written EXACTLY as the oracle writes them (2.2, not
    # k1 + 1.0: the python fold happens to round to the same double, but
    # the equality is a literal-for-literal contract, not an accident)
    K1, K1P1, B = 1.2, 2.2, 0.75
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = docs.select("doc_id", F.size("toks").alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    per = (
        tf.withColumn("df", dfq)
        .join(d, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                (F.col("n") * 1.0 / F.col("df"))
                * (F.col("tf") * K1P1)
                / (
                    F.col("tf")
                    + K1
                    * (
                        (1.0 - B)
                        + B * (F.col("dl") * 1.0 / F.col("avgdl"))
                    )
                )
                * 10000
                + 0.5
            )
            .cast("long")
            .alias("s4"),
        )
    )
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("s4").cast("long").alias("score_1e4"),
            F.count(F.lit(1)).cast("int").alias("n_terms"),
        )
        .orderBy(F.col("score_1e4").desc(), "doc_id")
        .limit(25)
    )


@register(
    "evt_survival_hazard",
    """
    WITH b AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
    u AS (
        SELECT user_id, min(epoch_us(ts)) AS entry_us,
               max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    t AS (
        SELECT CASE WHEN u.last_us < b.end_us - 86400000000
                    THEN (u.last_us - u.entry_us) // 86400000000
                    ELSE (b.end_us - u.entry_us) // 86400000000 END AS t_day,
               CASE WHEN u.last_us < b.end_us - 86400000000
                    THEN 1 ELSE 0 END AS died
        FROM u CROSS JOIN b
    ),
    per AS (
        SELECT t_day, count(*) AS n_all, sum(died) AS d FROM t GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n FROM t),
    cum AS (
        SELECT t_day, n_all, d,
               sum(n_all) OVER (ORDER BY t_day
                                ROWS UNBOUNDED PRECEDING) AS cle
        FROM per
    )
    SELECT t_day, CAST(n - (cle - n_all) AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(1000000 * d // (n - (cle - n_all)) AS BIGINT) AS hazard_ppm
    FROM cum CROSS JOIN tot
    WHERE d > 0
    """,
    doc="Kaplan-Meier-style survival/hazard table with right censoring — "
    "the at-risk accounting cohort retention and absence/churn queries "
    "skip: a user's lifetime runs from first to last event; users last "
    "seen within 24 hours of the study end are CENSORED at study end "
    "(still alive, exit the risk set without an event), everyone else "
    "churns at their last-seen day. For each event day t: n_risk = "
    "users whose lifetime >= t, d = churns at t, hazard in exact ppm "
    "(1e6*d div n_risk — the discrete KM increment; the survival curve "
    "is the running product of (1 - h_t), left to the consumer because "
    "a cross-row float PRODUCT is exactly the order-dependence this "
    "engine's determinism contract bans). Pure epoch-us integer "
    "arithmetic throughout. Scale shape: one user-keyed aggregate, one "
    "day-keyed aggregate (map-side combined), then the at-risk "
    "complement comes from banded_running_sum — the banded prefix-sum "
    "pattern, never a single-partition global window — plus two "
    "broadcast one-row joins (study end, cohort size).",
)
def evt_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    b = ev.agg(F.max("us").alias("end_us"))
    u = ev.groupBy("user_id").agg(
        F.min("us").alias("entry_us"), F.max("us").alias("last_us")
    )
    HORIZON_US, DAY_US = 86_400_000_000, 86_400_000_000
    t = u.crossJoin(F.broadcast(b)).select(
        F.when(
            F.col("last_us") < F.col("end_us") - HORIZON_US,
            F.expr(f"(last_us - entry_us) div {DAY_US}"),
        )
        .otherwise(F.expr(f"(end_us - entry_us) div {DAY_US}"))
        .alias("t_day"),
        F.when(
            F.col("last_us") < F.col("end_us") - HORIZON_US, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("died"),
    )
    per = t.groupBy("t_day").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("died").alias("d")
    )
    tot = t.agg(F.count(F.lit(1)).alias("n"))
    cum = banded_running_sum(
        per.withColumn("_band", F.expr("t_day div 32")),
        "_band",
        [F.col("t_day").asc()],
        "n_all",
        out_col="cle",
        descending=False,
    ).drop("_band")
    n_risk = F.col("n") - (F.col("cle") - F.col("n_all"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("d") > 0)
        .select(
            "t_day",
            n_risk.cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d_events"),
            F.expr(
                "CAST(1000000 * d div "
                "(n - (cle - n_all)) AS BIGINT)"
            ).alias("hazard_ppm"),
        )
    )


@register(
    "graph_clustering_coeff",
    """
    WITH lo AS (
        SELECT l_orderkey AS ok, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 4 = 0
    ),
    canon AS (
        SELECT DISTINCT a.p AS a, b.p AS b
        FROM lo a JOIN lo b ON a.ok = b.ok AND a.p < b.p
    ),
    deg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM canon
            UNION ALL
            SELECT b AS node FROM canon
        ) GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.a ELSE c.b END AS lo,
               CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                    THEN c.b ELSE c.a END AS hi
        FROM canon c
        JOIN deg da ON c.a = da.node
        JOIN deg db ON c.b = db.node
    ),
    tri AS (
        SELECT w1.lo AS x, w1.hi AS y, w2.hi AS z
        FROM oriented w1
        JOIN oriented w2 ON w1.lo = w2.lo AND w1.hi <> w2.hi
        JOIN oriented e ON e.lo = w1.hi AND e.hi = w2.hi
    ),
    pt AS (
        SELECT node, count(*) AS n_tri
        FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y AS node FROM tri
            UNION ALL SELECT z AS node FROM tri
        )
        GROUP BY node
    )
    SELECT d.node AS part_id, CAST(d.deg AS BIGINT) AS deg,
           CAST(coalesce(pt.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(2000000 * coalesce(pt.n_tri, 0) // (d.deg * (d.deg - 1))
                AS BIGINT) AS lcc_ppm
    FROM deg d LEFT JOIN pt ON d.node = pt.node
    WHERE d.deg >= 2
    """,
    doc="Local clustering coefficient per node — 2*triangles(v) / "
    "(deg(v)*(deg(v)-1)) in exact ppm over the part co-purchase graph: "
    "the standard 'how clique-like is this node's neighborhood' metric "
    "(Watts-Strogatz), and the canonical CONSUMER of per-node triangle "
    "counts. Rides graph_triangle_count's degree-oriented enumeration "
    "(out-degree capped at O(sqrt(E)), hot hubs contribute zero wedges "
    "at their center) plus one left join back to the degree relation so "
    "triangle-free nodes report lcc = 0 instead of vanishing. Integer "
    "arithmetic end-to-end (ppm via exact integer division), so the "
    "oracle replays bit-exactly.",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    lo = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
    )
    pairs = (
        lo.alias("x")
        .join(
            lo.alias("y"),
            (F.col("x.ok") == F.col("y.ok")) & (F.col("x.p") < F.col("y.p")),
        )
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("src").alias("node"))
        .unionAll(pairs.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(pairs)
    return (
        deg.join(tri, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            F.col("node").alias("part_id"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.expr(
                "CAST(2000000 * coalesce(n_triangles, 0) div "
                "(deg * (deg - 1)) AS BIGINT)"
            ).alias("lcc_ppm"),
        )
    )


@register(
    "sim_pq_adc_topk",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                   AS a
        FROM embeddings
    ),
    sub AS (
        SELECT vec_id, s.sub,
               v.a[s.sub * 4 + 1 : s.sub * 4 + 4] AS sv
        FROM v CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sub) s
    ),
    ranked AS (
        SELECT vec_id, sub, sv,
               row_number() OVER (
                   PARTITION BY sub
                   ORDER BY list_dot_product(sv, sv), vec_id) AS rk,
               count(*) OVER (PARTITION BY sub) AS n
        FROM sub
    ),
    cent0 AS (
        SELECT r.sub, c.cid, r.sv AS cv
        FROM ranked r
        JOIN (SELECT unnest(generate_series(0, 15)) AS cid) c
          ON r.rk = ((c.cid + 1) * r.n) // 17
    ),
    asg1 AS (
        SELECT vec_id, sub, sv, cid FROM (
            SELECT s.vec_id, s.sub, s.sv, c.cid,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cv) + list_dot_product(c.cv, c.cv),
                                c.cid) AS rn
            FROM sub s JOIN cent0 c USING (sub)) t
        WHERE rn = 1
    ),
    cent1 AS (
        SELECT sub, cid,
               [CAST(floor(sum(sv[1]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[2]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[3]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[4]) * 1.0 / count(*)) AS BIGINT)] AS cv
        FROM asg1 GROUP BY sub, cid
    ),
    asg2 AS (
        SELECT vec_id, sub, sv, cid FROM (
            SELECT s.vec_id, s.sub, s.sv, c.cid,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cv) + list_dot_product(c.cv, c.cv),
                                c.cid) AS rn
            FROM sub s JOIN cent1 c USING (sub)) t
        WHERE rn = 1
    ),
    cent2 AS (
        SELECT sub, cid,
               [CAST(floor(sum(sv[1]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[2]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[3]) * 1.0 / count(*)) AS BIGINT),
               CAST(floor(sum(sv[4]) * 1.0 / count(*)) AS BIGINT)] AS cv
        FROM asg2 GROUP BY sub, cid
    ),
    codes AS (
        SELECT vec_id, sub, cid FROM (
            SELECT s.vec_id, s.sub, s.sv, c.cid,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cv) + list_dot_product(c.cv, c.cv),
                                c.cid) AS rn
            FROM sub s JOIN cent2 c USING (sub)) t
        WHERE rn = 1
    ),
    qsub AS (SELECT sub, sv AS qv FROM sub WHERE vec_id = 0),
    dt AS (
        SELECT c.sub, c.cid,
               CAST(list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv) AS BIGINT) AS qd
        FROM cent2 c JOIN qsub q USING (sub)
    )
    SELECT k.vec_id, CAST(sum(d.qd) AS BIGINT) AS adc_dist2
    FROM codes k JOIN dt d ON k.sub = d.sub AND k.cid = d.cid
    WHERE k.vec_id <> 0
    GROUP BY k.vec_id
    ORDER BY adc_dist2, vec_id
    LIMIT 25
    """,
    doc="Product-quantization ANN with asymmetric distance computation "
    "(Jegou et al. 2011) at the oracle-checkable operating point — the "
    "memory-compression ANN path that completes the similarity family "
    "(brute force / IVF / sign-LSH / kNN-join / PQ): 64-dim vectors "
    "fixed-pointed to 1e6-scaled integers, split into 16 subspaces of 4 (a 16x16 codebook, 64-bit codes; measured recall@25 of the exact-L2 top-10 = 0.8 on the sf0.01 corpus), "
    "codebooks TRAINED by two unrolled integer-Lloyd rounds from "
    "order-statistic seeds — re-centering on floor(sum/count), a floor "
    "that is provably exact in double because a non-integer quotient's "
    "fraction (>= 1/count) dwarfs the division's ~2e-16 error — so the "
    "SQL oracle replays seeds, refinement, codes and ADC CTE-for-CTE "
    "(the PQ analog of IVF's probe-all twin). Codes = integer-exact "
    "squared-L2 argmin with lowest-id ties, ADC = broadcast (8x8 "
    "integer table per subspace) lookups + exact integer sum. Every dot product of 1e6-scaled ints stays below 2^53, so "
    "DuckDB's double-typed list_dot_product computes them EXACTLY — no "
    "float ever reaches an ordering. Vectors shuffle once per subspace "
    "rank (partitioned by subspace, never a single-partition window); "
    "code rows are the only other exchange (partial-agg argmin); top-k "
    "is TakeOrderedAndProject.",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_adc_topk

    e = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(e, "vec_id", "embedding", query_vec_id=0, k=25)


@register(
    "stat_spearman_rank_corr",
    """
    WITH c AS (
        SELECT c.c_nationkey AS nation, c.c_custkey,
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
               count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey, c.c_acctbal
    ),
    r AS (
        SELECT nation, c_custkey,
               2 * rank() OVER (PARTITION BY nation ORDER BY bal)
                 + count(*) OVER (PARTITION BY nation, bal) - 1 AS rx2,
               2 * rank() OVER (PARTITION BY nation ORDER BY n_orders)
                 + count(*) OVER (PARTITION BY nation, n_orders) - 1 AS ry2
        FROM c
    ),
    s AS (
        SELECT nation, count(*) AS n,
               sum(CAST(rx2 AS HUGEINT)) AS sx,
               sum(CAST(ry2 AS HUGEINT)) AS sy,
               sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
               sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
               sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy
        FROM r GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) * 10000 + 0.5)
               / 10000.0 AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation per nation (account balance vs order "
    "count) — the RANK-based robust sibling of corr_per_group's Pearson: "
    "monotone association, insensitive to outliers and to any monotone "
    "rescaling of either variable. Ties are handled exactly via "
    "DOUBLED average ranks (2*avg_rank = 2*rank + tie_count - 1, an "
    "INTEGER — the halves introduced by midranks never materialize as "
    "floats), then Pearson over the doubled ranks from exact integer "
    "sufficient statistics (decimal/HUGEINT sums), one identical double "
    "formula + floor-parity rounding at 4 dp on both engines. Scale "
    "shape: one customer-keyed outer join + count, rank windows "
    "partitioned BY NATION (never single-partition), one grouped "
    "moment aggregate — 25 output rows regardless of data size.",
)
def stat_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c = (
        cu.join(o, cu["c_custkey"] == o["o_custkey"], "left")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("long")
            .alias("bal"),
        )
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    rx2 = (
        2 * F.rank().over(Window.partitionBy("nation").orderBy("bal"))
        + F.count(F.lit(1)).over(Window.partitionBy("nation", "bal"))
        - 1
    ).cast("long")
    ry2 = (
        2 * F.rank().over(Window.partitionBy("nation").orderBy("n_orders"))
        + F.count(F.lit(1)).over(Window.partitionBy("nation", "n_orders"))
        - 1
    ).cast("long")
    r = c.select("nation", rx2.alias("rx2"), ry2.alias("ry2"))
    dec = "decimal(38,0)"
    s = r.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2").cast(dec) * F.col("rx2"))).alias("sxx"),
        F.sum((F.col("ry2").cast(dec) * F.col("ry2"))).alias("syy"),
        F.sum((F.col("rx2").cast(dec) * F.col("ry2"))).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "nation",
        F.col("n").cast("long").alias("n"),
        (
            F.floor(num / F.sqrt(varx * vary) * 10000 + F.lit(0.5)) / 10000.0
        ).alias("spearman_rho"),
    )


@register(
    "evt_burstiness_fano",
    """
    WITH h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(c AS HUGEINT)) AS sc,
               sum(CAST(c AS HUGEINT) * c) AS scc
        FROM h GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(sc AS BIGINT) AS n_events,
           CAST(1000 * (n * scc - sc * sc) // (n * sc) AS BIGINT)
               AS fano_milli
    FROM s
    """,
    doc="Burstiness per event type via the Fano factor (variance-to-mean "
    "ratio of hourly event counts over observed hours; ~1000 milli = "
    "Poisson-like arrivals, above = bursty, below = regular) — the "
    "dispersion diagnostic next to evt_autocovariance_lags' serial "
    "dependence. Exact integer arithmetic end-to-end: var/mean = "
    "(n*Sum(c^2) - Sum(c)^2) / (n*Sum(c)) in milli via true integer "
    "division on HUGEINT/decimal sums (counts are integers, so no "
    "float ever appears). Two grouped aggregates, both map-side "
    "combined; output is one row per event type.",
)
def evt_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    h = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("c"))
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast(dec)).alias("sc"),
        F.sum(F.col("c").cast(dec) * F.col("c")).alias("scc"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("sc").cast("long").alias("n_events"),
        F.expr(
            "CAST((1000 * (n * scc - sc * sc)"
            " - (1000 * (n * scc - sc * sc)) % (n * sc)) / (n * sc)"
            " AS BIGINT)"
        ).alias("fano_milli"),
    )


@register(
    "evt_position_attribution",
    """
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS rc
        FROM events
        WHERE event_type IN ('click', 'view', 'signup', 'purchase')
    ),
    carried AS (
        SELECT *,
               first_value(CASE WHEN is_p = 1 THEN us END IGNORE NULLS)
                   OVER w AS p_us,
               first_value(CASE WHEN is_p = 1 THEN event_id END IGNORE NULLS)
                   OVER w AS p_key
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY us, is_p, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    credited AS (
        SELECT user_id, event_id, event_type, us, p_key,
               count(*) OVER pw AS k,
               row_number() OVER (PARTITION BY p_key
                                  ORDER BY us, event_id) AS rn
        FROM carried
        WHERE is_p = 0 AND p_us IS NOT NULL
          AND p_us - us <= 604800000000
        WINDOW pw AS (PARTITION BY p_key)
    ),
    purch AS (SELECT event_id AS p_key, rc FROM t WHERE is_p = 1),
    weighted AS (
        SELECT c.event_type AS channel,
               CASE WHEN c.k = 1 THEN 10000
                    WHEN c.k = 2 THEN 5000
                    WHEN c.rn = 1 OR c.rn = c.k THEN 4000
                    ELSE 2000 // (c.k - 2) END AS w_bp,
               p.rc
        FROM credited c JOIN purch p USING (p_key)
    ),
    touch_credit AS (
        SELECT channel, count(*) AS n_touches,
               sum(rc * w_bp // 10000) AS credited_cents
        FROM weighted GROUP BY channel
    ),
    organic AS (
        SELECT 'organic' AS channel, count(*) AS n_touches,
               sum(rc) AS credited_cents
        FROM purch p
        WHERE NOT EXISTS (SELECT 1 FROM credited c WHERE c.p_key = p.p_key)
    )
    SELECT channel, CAST(n_touches AS BIGINT) AS n_touches,
           CAST(credited_cents AS BIGINT) AS credited_cents
    FROM (SELECT * FROM touch_credit UNION ALL
          SELECT * FROM organic WHERE n_touches > 0) u
    """,
    doc="Position-based (U-shaped) multi-touch attribution — the "
    "fractional-credit completion of evt_last_touch_attribution's "
    "winner-take-all: each touch credits the FIRST purchase following "
    "it within 7 days; within a purchase's touch sequence the first and "
    "last touch get 40% each and the middles split the remaining 20% "
    "(single touch 100%, two touches 50/50); purchases with no eligible "
    "touch fall to 'organic'. All credit arithmetic in integer basis "
    "points with true integer division (truncation toward the house is "
    "the documented convention), revenue in exact cents — "
    "hash-identical on both engines. Scale shape: ONE forward-carry "
    "window per user (min-over-following of the packed purchase key — "
    "the asof-forward idiom), one window per purchase sequence for "
    "position ranks, then grouped sums; the purchase key packs "
    "(us, event_id) into one long so the carry is a single column.",
)
def evt_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).alias("rc"),
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_p", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # first-in-frame-order non-null = the FIRST following purchase (the
    # frame order IS (us, is_p, event_id)); both carried columns come
    # from that same row — no packed key, no overflow-prone arithmetic
    carried = t.select(
        "*",
        F.first(F.when(F.col("is_p") == 1, F.col("us")), ignorenulls=True)
        .over(w_fwd)
        .alias("p_us"),
        F.first(
            F.when(F.col("is_p") == 1, F.col("event_id")), ignorenulls=True
        )
        .over(w_fwd)
        .alias("p_key"),
    )
    credited = (
        carried.filter(
            (F.col("is_p") == 0)
            & F.col("p_us").isNotNull()
            & (F.col("p_us") - F.col("us") <= 604_800_000_000)
        )
        .select(
            "event_type",
            "us",
            "event_id",
            "p_key",
            F.count(F.lit(1)).over(Window.partitionBy("p_key")).alias("k"),
            F.row_number()
            .over(Window.partitionBy("p_key").orderBy("us", "event_id"))
            .alias("rn"),
        )
    )
    purch = t.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("p_key"), "rc"
    )
    w_bp = (
        F.when(F.col("k") == 1, 10000)
        .when(F.col("k") == 2, 5000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), 4000)
        .otherwise(F.expr("2000 div (k - 2)"))
    )
    weighted = credited.join(purch, "p_key").select(
        F.col("event_type").alias("channel"),
        w_bp.alias("w_bp"),
        "rc",
    )
    touch_credit = weighted.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.expr("rc * w_bp div 10000")).alias("credited_cents"),
    )
    organic = (
        purch.join(credited.select("p_key"), "p_key", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("rc").alias("credited_cents"),
        )
        .select(
            F.lit("organic").alias("channel"), "n_touches", "credited_cents"
        )
        .filter(F.col("n_touches") > 0)
    )
    return touch_credit.unionByName(organic).select(
        "channel",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.col("credited_cents").cast("long").alias("credited_cents"),
    )


@register(
    "dq_drift_population",
    """
    WITH b AS (
        SELECT min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts)))
                   // 2 AS mid_us
        FROM events
    ),
    binned AS (
        SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
               CASE WHEN epoch_us(ts) < b.mid_us THEN 1 ELSE 0 END
                   AS is_first
        FROM events CROSS JOIN b
    ),
    per AS (
        SELECT bin,
               CAST(sum(is_first) AS HUGEINT) AS a,
               CAST(sum(1 - is_first) AS HUGEINT) AS bq
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(a) AS ta, sum(bq) AS tb FROM per),
    probs AS (
        SELECT p.bin, p.a, p.bq,
               1000000 * p.a // t.ta AS pm,
               1000000 * p.bq // t.tb AS qm
        FROM per p CROSS JOIN tot t
    ),
    terms AS (
        SELECT bin, a, bq,
               CASE WHEN pm + qm > 0
                    THEN (pm - qm) * (pm - qm) // (pm + qm)
                    ELSE 0 END AS drift_micro
        FROM probs
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(a AS BIGINT) AS n_first,
           CAST(bq AS BIGINT) AS n_second,
           CAST(drift_micro AS BIGINT) AS drift_micro
    FROM terms
    UNION ALL
    SELECT NULL, CAST(sum(a) AS BIGINT), CAST(sum(bq) AS BIGINT),
           CAST(sum(drift_micro) AS BIGINT)
    FROM terms
    """,
    doc="Population drift monitor between the first and second half of "
    "the observation window (split at the midpoint timestamp): per "
    "value-bin counts for both periods plus the TRIANGULAR "
    "DISCRIMINATION contribution sum((p-q)^2/(p+q)) in exact micro "
    "units — the rational drift divergence chosen over the industry PSI "
    "because PSI's ln() is not correctly rounded in either engine's "
    "libm while this statistic stays in EXACT integer arithmetic — "
    "probabilities fixed-pointed to micro first (so every operand stays "
    "bounded by 1e6 at ANY corpus size), then (p-q)^2 // (p+q) per bin "
    "— and the drift score hash-matches bit-for-bit; a NULL-bin total row "
    "aggregates the corpus-level score (0 = identical distributions, "
    "2e6 = disjoint). Scale shape: one map-side binning pass + one "
    "grouped count + a broadcast one-row totals join — bins are "
    "bounded, rows never re-shuffle.",
)
def dq_drift_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "value"
    )
    b = ev.agg(
        (
            F.min("us") + F.expr("(max(us) - min(us)) div 2")
        ).alias("mid_us")
    )
    dec = "decimal(38,0)"
    per = (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.floor(F.col("value") / 5.0).cast("long").alias("bin"),
            F.when(F.col("us") < F.col("mid_us"), 1).otherwise(0).alias("f"),
        )
        .groupBy("bin")
        .agg(
            F.sum("f").cast(dec).alias("a"),
            F.sum(1 - F.col("f")).cast(dec).alias("bq"),
        )
    )
    tot = per.agg(
        F.sum("a").cast(dec).alias("ta"), F.sum("bq").cast(dec).alias("tb")
    )
    # probabilities fixed-pointed to micro FIRST (identical floor on both
    # engines), so every later operand is bounded by 1e6 regardless of
    # corpus size — the cross-multiplied exact form (aB-bA)^2/(AB(aB+bA))
    # would exceed decimal(38) once counts pass ~1e12 rows
    probs = per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "a",
        "bq",
        F.expr("CAST(1000000 * a div ta AS BIGINT)").alias("pm"),
        F.expr("CAST(1000000 * bq div tb AS BIGINT)").alias("qm"),
    )
    terms = probs.select(
        "bin",
        "a",
        "bq",
        F.when(
            F.col("pm") + F.col("qm") > 0,
            F.expr("(pm - qm) * (pm - qm) div (pm + qm)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("drift_micro"),
    )
    per_bin = terms.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("a").cast("long").alias("n_first"),
        F.col("bq").cast("long").alias("n_second"),
        F.col("drift_micro").cast("long").alias("drift_micro"),
    )
    total = terms.agg(
        F.sum("a").cast("long").alias("n_first"),
        F.sum("bq").cast("long").alias("n_second"),
        F.sum("drift_micro").cast("long").alias("drift_micro"),
    ).select(
        F.lit(None).cast("long").alias("bin"),
        "n_first",
        "n_second",
        "drift_micro",
    )
    return per_bin.unionByName(total)


def _ppr_iter_sql(prev: str, out: str) -> str:
    """One unrolled personalized-PageRank iteration: sparse contribution
    join + FULL join against the seed restart vector (seeds regain their
    restart mass even with zero in-contributions; reached non-seeds get
    damped mass only)."""
    return f"""{out} AS (
        SELECT coalesce(c.node, sb.node) AS node,
               coalesce(sb.b, 0) + (85 * coalesce(c.s, 0)) // 100 AS r
        FROM (SELECT e.dst AS node, sum(p.r // e.outdeg) AS s
              FROM ed e JOIN {prev} p ON e.src = p.node
              GROUP BY e.dst) c
        FULL JOIN seed_base sb ON c.node = sb.node
    )"""


@register(
    "graph_pagerank_personalized",
    f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
    seeds AS (
        SELECT DISTINCT c.c_custkey * 2 AS node
        FROM customer c
        WHERE c.c_nationkey = 0
          AND EXISTS (SELECT 1 FROM deg d WHERE d.src = c.c_custkey * 2)
    ),
    ns AS (SELECT count(*) AS ns FROM seeds),
    seed_base AS (
        SELECT node, (15 * 1000000) // (100 * ns.ns) AS b
        FROM seeds CROSS JOIN ns
    ),
    r0 AS (SELECT node, 1000000 // ns.ns AS r FROM seeds CROSS JOIN ns),
    {_ppr_iter_sql("r0", "r1")},
    {_ppr_iter_sql("r1", "r2")},
    {_ppr_iter_sql("r2", "r3")}
    SELECT CAST(node % 2 AS INTEGER) AS is_supplier,
           CAST(node // 2 AS BIGINT) AS entity_id,
           CAST(r AS BIGINT) AS rank_micro
    FROM r3
    """,
    doc="Personalized PageRank (random walk with restart) over the "
    "trading graph, seeded on nation-0 customers — importance RELATIVE "
    "to a query set, the locality/recommendation scorer next to "
    "graph_pagerank_trading's global rank. Same float-free micro-unit "
    "contract (positive integer div only), with sparse-frontier "
    "semantics: mass starts on the seeds and a node owns a rank row "
    "only once the walk reaches it — early iterations stay "
    "frontier-sized at 100 TB instead of node-count-sized; seeds regain "
    "restart mass through a FULL join with the broadcast seed-base "
    "vector each round. 3 unrolled iterations replayed bit-exactly by "
    "the oracle (operators/graph.py:pagerank_personalized_integer).",
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_personalized_integer

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    r = pagerank_personalized_integer(edges, seeds, iters=3)
    return r.select(
        (F.col("node") % 2).cast("int").alias("is_supplier"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        F.col("rank_micro").cast("long").alias("rank_micro"),
    )


@register(
    "graph_degree_distribution",
    """
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT c * 2 AS node FROM pairs
            UNION ALL
            SELECT s * 2 + 1 AS node FROM pairs
        ) GROUP BY node
    ),
    pow2 AS (
        SELECT CAST(b AS INTEGER) AS bucket,
               CAST(2 ** b AS BIGINT) AS lo,
               CAST(2 ** (b + 1) AS BIGINT) AS hi
        FROM (SELECT unnest(generate_series(0, 40)) AS b) t
    )
    SELECT p.bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(deg.d) AS BIGINT) AS min_deg,
           CAST(max(deg.d) AS BIGINT) AS max_deg,
           CAST(sum(deg.d) AS BIGINT) AS degree_mass
    FROM deg JOIN pow2 p ON deg.d >= p.lo AND deg.d < p.hi
    GROUP BY p.bucket
    """,
    doc="Degree-distribution histogram of the trading graph in "
    "powers-of-two buckets — the power-law/skew diagnostic that sizes "
    "every other graph plan (hub mass tells you whether AQE skew "
    "splitting, degree-oriented triangle orientation, and salting are "
    "load-bearing). The log2 bucket comes from an exact integer range "
    "join against a broadcast 41-row powers-of-two table (2^b <= d < "
    "2^(b+1)) — no libm log2, whose value at exact powers is not "
    "guaranteed correctly rounded, so the bucket edges are "
    "hash-identical by construction. One distinct-pair build, one "
    "degree aggregate, one broadcast band join; output is <= 41 rows "
    "at any scale.",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = (
        pairs.select((F.col("c") * 2).alias("node"))
        .unionAll(pairs.select((F.col("s") * 2 + 1).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    pow2 = spark.range(41).select(
        F.col("id").cast("int").alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("lo"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(id + 1 AS INT))"
        ).alias("hi"),
    )
    return (
        deg.join(
            F.broadcast(pow2),
            (F.col("d") >= F.col("lo")) & (F.col("d") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").cast("long").alias("min_deg"),
            F.max("d").cast("long").alias("max_deg"),
            F.sum("d").cast("long").alias("degree_mass"),
        )
    )


@register(
    "graph_hits_integer",
    """
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    h0 AS (
        SELECT c, CAST(1000000 AS BIGINT) AS h
        FROM (SELECT DISTINCT c FROM pairs)
    ),
    a1r AS (
        SELECT p.s, CAST(sum(h0.h) AS BIGINT) AS raw
        FROM pairs p JOIN h0 ON p.c = h0.c GROUP BY p.s
    ),
    a1d AS (SELECT greatest(CAST(sum(raw) AS BIGINT) // 1000000, 1) AS d FROM a1r),
    a1 AS (SELECT s, CAST(raw // d AS BIGINT) AS a FROM a1r, a1d),
    h1r AS (
        SELECT p.c, CAST(sum(a1.a) AS BIGINT) AS raw
        FROM pairs p JOIN a1 ON p.s = a1.s GROUP BY p.c
    ),
    h1d AS (SELECT greatest(CAST(sum(raw) AS BIGINT) // 1000000, 1) AS d FROM h1r),
    h1 AS (SELECT c, CAST(raw // d AS BIGINT) AS h FROM h1r, h1d),
    a2r AS (
        SELECT p.s, CAST(sum(h1.h) AS BIGINT) AS raw
        FROM pairs p JOIN h1 ON p.c = h1.c GROUP BY p.s
    ),
    a2d AS (SELECT greatest(CAST(sum(raw) AS BIGINT) // 1000000, 1) AS d FROM a2r),
    a2 AS (SELECT s, CAST(raw // d AS BIGINT) AS a FROM a2r, a2d),
    h2r AS (
        SELECT p.c, CAST(sum(a2.a) AS BIGINT) AS raw
        FROM pairs p JOIN a2 ON p.s = a2.s GROUP BY p.c
    ),
    h2d AS (SELECT greatest(CAST(sum(raw) AS BIGINT) // 1000000, 1) AS d FROM h2r),
    h2 AS (SELECT c, CAST(raw // d AS BIGINT) AS h FROM h2r, h2d)
    SELECT CAST(0 AS INTEGER) AS is_supplier, CAST(c AS BIGINT) AS entity_id,
           h AS score_micro
    FROM h2
    UNION ALL
    SELECT CAST(1 AS INTEGER), CAST(s AS BIGINT), a FROM a2
    """,
    doc="Deterministic integer HITS (Kleinberg 1999) over the directed "
    "customer->supplier purchase graph: hubs (customers) accumulate the "
    "authority mass of suppliers they buy from, authorities the hub mass "
    "of their buyers, each side renormalized to ~1e6 total per round via "
    "score div greatest(sum div 1e6, 1) — dividing by the PRE-scaled "
    "scalar keeps every intermediate below 2^63 at billion-node scale "
    "where a *1e6-first form would overflow. Two unrolled rounds, "
    "positive-int div only, so the oracle replays hub and authority "
    "vectors bit-exactly (the link-analysis sibling of "
    "graph_pagerank_trading; operators/graph.py:hits_integer). Each "
    "round: two shuffle joins of the pair relation against node-sized "
    "score vectors + two grouped sums + two 1-row broadcast scalars.",
)
def graph_hits_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits_integer

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return hits_integer(pairs, iters=2)


@register(
    "evt_markov_stationary",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    tc AS (
        SELECT prev, event_type AS cur, count(*) AS c
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    ),
    rs AS (SELECT prev, CAST(sum(c) AS BIGINT) AS rs FROM tc GROUP BY prev),
    types AS (SELECT DISTINCT event_type AS t FROM events),
    k AS (SELECT count(*) AS k FROM types),
    p0 AS (SELECT t AS state, CAST(1000000 // k.k AS BIGINT) AS pi FROM types, k),
    p1 AS (
        SELECT tc.cur AS state, CAST(sum((p0.pi * tc.c) // rs.rs) AS BIGINT) AS pi
        FROM p0 JOIN tc ON p0.state = tc.prev JOIN rs ON rs.prev = tc.prev
        GROUP BY tc.cur
    ),
    p2 AS (
        SELECT tc.cur AS state, CAST(sum((p1.pi * tc.c) // rs.rs) AS BIGINT) AS pi
        FROM p1 JOIN tc ON p1.state = tc.prev JOIN rs ON rs.prev = tc.prev
        GROUP BY tc.cur
    ),
    p3 AS (
        SELECT tc.cur AS state, CAST(sum((p2.pi * tc.c) // rs.rs) AS BIGINT) AS pi
        FROM p2 JOIN tc ON p2.state = tc.prev JOIN rs ON rs.prev = tc.prev
        GROUP BY tc.cur
    )
    SELECT state AS event_type, pi AS pi_micro FROM p3
    """,
    doc="Stationary distribution of the per-user event-type Markov chain "
    "by three unrolled integer power iterations: transition counts come "
    "from one lag window per user (the only data-sized shuffle — the "
    "chain itself is k x k = 25 cells), pi0 is uniform micro-units, and "
    "each step is pi'_j = sum_i (pi_i * c_ij) div rowsum_i — positive-int "
    "div, so the oracle replays all three steps bit-exactly (floor mass "
    "leak is part of the defined semantics, identical on both engines). "
    "The behavioral-model sibling of evt_transition_matrix: where that "
    "query reports the one-step matrix, this one converges toward the "
    "long-run occupancy a session simulator or mixing-time audit needs.",
)
def evt_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
        .alias("prev"),
    )
    tc = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rs = tc.groupBy("prev").agg(F.sum("c").cast("long").alias("rs"))
    tcr = F.broadcast(tc.join(rs, "prev"))
    types = ev.select(F.col("event_type").alias("state")).distinct()
    kk = types.agg(F.count(F.lit(1)).alias("k"))
    pi = types.crossJoin(F.broadcast(kk)).select(
        "state", F.expr("1000000 div k").cast("long").alias("pi")
    )
    for _ in range(3):
        pi = (
            pi.join(tcr, pi["state"] == tcr["prev"])
            .select(
                F.col("cur").alias("state"),
                F.expr("(pi * c) div rs").alias("contrib"),
            )
            .groupBy("state")
            .agg(F.sum("contrib").cast("long").alias("pi"))
        )
    return pi.select(F.col("state").alias("event_type"), F.col("pi").alias("pi_micro"))


@register(
    "stat_welch_ttest",
    """
    WITH cents AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS s1,
               CAST(sum(cents * cents) AS BIGINT) AS s2
        FROM cents GROUP BY event_type
    ),
    w AS (
        SELECT a.n AS n_click, b.n AS n_view,
               (a.s1 * 1.0 / a.n) AS m1, (b.s1 * 1.0 / b.n) AS m2,
               (a.s2 - a.s1 * 1.0 / a.n * a.s1) / (a.n - 1) AS v1,
               (b.s2 - b.s1 * 1.0 / b.n * b.s1) / (b.n - 1) AS v2
        FROM (SELECT * FROM g WHERE event_type = 'click') a,
             (SELECT * FROM g WHERE event_type = 'view') b
    )
    SELECT n_click, n_view,
           CAST(floor((m1 - m2) / sqrt(v1 / n_click + v2 / n_view) * 1000000
                      + 0.5) AS BIGINT) AS t_micro,
           CAST(floor(
               ((v1 / n_click + v2 / n_view) * (v1 / n_click + v2 / n_view))
               / ((v1 / n_click) * (v1 / n_click) / (n_click - 1)
                  + (v2 / n_view) * (v2 / n_view) / (n_view - 1)) * 1000
               + 0.5) AS BIGINT) AS df_milli
    FROM w
    """,
    doc="Welch's unequal-variance t-test (click vs view event values) "
    "completing the hypothesis-testing family (ANOVA / chi2 / KS / "
    "Mann-Whitney / Spearman): values are exact integer cents "
    "(round(value*100)), per-group n / sum / sum-of-squares are exact "
    "integer sufficient statistics from ONE partial-aggregated pass "
    "(the 100 TB shape — two grouped sums, no second scan), and the t "
    "statistic + Welch-Satterthwaite df are computed with the IDENTICAL "
    "double expression tree on both engines, then fixed-pointed "
    "(floor(x*1e6+0.5) / floor(x*1e3+0.5)) so no rounding-mode "
    "difference can leak into the hash.",
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    g = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("s2"),
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_click"),
        F.col("s1").alias("a1"),
        F.col("s2").alias("a2"),
    )
    b = g.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_view"),
        F.col("s1").alias("b1"),
        F.col("s2").alias("b2"),
    )
    w = a.crossJoin(F.broadcast(b)).select(
        "n_click",
        "n_view",
        (F.col("a1") * 1.0 / F.col("n_click")).alias("m1"),
        (F.col("b1") * 1.0 / F.col("n_view")).alias("m2"),
        (
            (F.col("a2") - F.col("a1") * 1.0 / F.col("n_click") * F.col("a1"))
            / (F.col("n_click") - 1)
        ).alias("v1"),
        (
            (F.col("b2") - F.col("b1") * 1.0 / F.col("n_view") * F.col("b1"))
            / (F.col("n_view") - 1)
        ).alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n_click")
    se2_2 = F.col("v2") / F.col("n_view")
    return w.select(
        "n_click",
        "n_view",
        F.floor((F.col("m1") - F.col("m2")) / F.sqrt(se2_1 + se2_2) * 1_000_000 + 0.5)
        .cast("long")
        .alias("t_micro"),
        F.floor(
            ((se2_1 + se2_2) * (se2_1 + se2_2))
            / (
                se2_1 * se2_1 / (F.col("n_click") - 1)
                + se2_2 * se2_2 / (F.col("n_view") - 1)
            )
            * 1000
            + 0.5
        )
        .cast("long")
        .alias("df_milli"),
    )


@register(
    "sim_mmr_diversified_topk",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                   AS a
        FROM embeddings
    ),
    q AS (SELECT a FROM v WHERE vec_id = 0),
    rel AS (
        SELECT v.vec_id, CAST(list_dot_product(v.a, q.a) AS BIGINT) AS rel, v.a
        FROM v, q WHERE v.vec_id <> 0
    ),
    pool AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 25),
    s1 AS (
        SELECT vec_id, a, CAST(7 * rel AS BIGINT) AS score
        FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    ),
    c2 AS (
        SELECT p.vec_id, p.a, p.rel,
               max(CAST(list_dot_product(p.a, s.a) AS BIGINT)) AS ms
        FROM pool p, s1 s
        WHERE p.vec_id NOT IN (SELECT vec_id FROM s1)
        GROUP BY p.vec_id, p.a, p.rel
    ),
    s2 AS (
        SELECT vec_id, a, CAST(7 * rel - 3 * ms AS BIGINT) AS score
        FROM c2 ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel2 AS (SELECT vec_id, a FROM s1 UNION ALL SELECT vec_id, a FROM s2),
    c3 AS (
        SELECT p.vec_id, p.a, p.rel,
               max(CAST(list_dot_product(p.a, s.a) AS BIGINT)) AS ms
        FROM pool p, sel2 s
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sel2)
        GROUP BY p.vec_id, p.a, p.rel
    ),
    s3 AS (
        SELECT vec_id, a, CAST(7 * rel - 3 * ms AS BIGINT) AS score
        FROM c3 ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel3 AS (SELECT vec_id, a FROM sel2 UNION ALL SELECT vec_id, a FROM s3),
    c4 AS (
        SELECT p.vec_id, p.a, p.rel,
               max(CAST(list_dot_product(p.a, s.a) AS BIGINT)) AS ms
        FROM pool p, sel3 s
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sel3)
        GROUP BY p.vec_id, p.a, p.rel
    ),
    s4 AS (
        SELECT vec_id, a, CAST(7 * rel - 3 * ms AS BIGINT) AS score
        FROM c4 ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel4 AS (SELECT vec_id, a FROM sel3 UNION ALL SELECT vec_id, a FROM s4),
    c5 AS (
        SELECT p.vec_id, p.a, p.rel,
               max(CAST(list_dot_product(p.a, s.a) AS BIGINT)) AS ms
        FROM pool p, sel4 s
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sel4)
        GROUP BY p.vec_id, p.a, p.rel
    ),
    s5 AS (
        SELECT vec_id, a, CAST(7 * rel - 3 * ms AS BIGINT) AS score
        FROM c5 ORDER BY score DESC, vec_id LIMIT 1
    )
    SELECT CAST(1 AS INTEGER) AS pick, vec_id, score AS mmr_score FROM s1
    UNION ALL SELECT 2, vec_id, score FROM s2
    UNION ALL SELECT 3, vec_id, score FROM s3
    UNION ALL SELECT 4, vec_id, score FROM s4
    UNION ALL SELECT 5, vec_id, score FROM s5
    """,
    doc="Maximal Marginal Relevance diversified retrieval (Carbonell & "
    "Goldstein 1998): greedy top-5 from the relevance top-25 pool "
    "maximizing 7*rel - 3*max_sim_to_selected (lambda=0.7 as an exact "
    "integer split) — the dedup-aware retrieval a training pipeline uses "
    "to keep near-identical passages out of one context window. "
    "Integer-exact: 1e6-scaled fixed-point vectors, integer dot products "
    "below 2^53 (DuckDB's double list_dot_product replays them exactly), "
    "ties to the lowest vec_id; the oracle unrolls all five greedy steps "
    "as CTEs. Distributed stage = relevance scoring + TakeOrdered pool "
    "over the corpus; the greedy re-rank is five limit-1 driver steps "
    "over the KB-sized checkpointed pool (the BPE bounded-driver-state "
    "class) because MMR is sequential in k by definition "
    "(operators/similarity.py:mmr_diversified_topk).",
)
def sim_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_diversified_topk

    e = _t(spark, sf_dir, "embeddings")
    return mmr_diversified_topk(e, "vec_id", "embedding", query_vec_id=0, k=5)
