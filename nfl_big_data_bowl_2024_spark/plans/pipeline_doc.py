"""Document-set curation queries (doc_*): sampling, packing, splits,
mixing, selection and budget allocation over the documents table.

Split out of plans/pipeline_txt.py in round 10 (the r8 split target of
no file over ~2,500 LoC; pipeline_txt had grown to 2,797). Original
docstrings, oracle SQL and reference citations moved verbatim; shared
helpers stay in pipeline_common.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.prefix import banded_running_sum
from ..sources.readers import read_testdata_table as _t
from .pipeline_common import (
    _content_fingerprint,
    _dsir_doc_weights,
    _n_ws_tokens,
)
from .registry import register


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
    "shape: vocab is O(unique tokens) and attaches back onto the token "
    "stream size-aware (AQE broadcast while it fits, keyed shuffle when "
    "a 100 TB raw vocab does not); the only corpus-sized exchanges are "
    "the term groupBy and the doc_id groupBy.",
)
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_doc_weights(spark, sf_dir)


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
    "doc_gopher_quality_filter",
    """
    WITH t AS (
        SELECT doc_id, source,
               string_split(text, ' ') AS toks,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
    ),
    flags AS (
        SELECT source,
               CASE WHEN len(toks) >= 25 THEN 0 ELSE 1 END AS f_wc,
               CASE WHEN n_chars * 1000 // len(toks) BETWEEN 4800 AND 5800
                    THEN 0 ELSE 1 END AS f_mwl,
               CASE WHEN len(list_filter(toks,
                         x -> x IN ('the','and','of','to','a','in','is',
                                    'that'))) >= 2
                    THEN 0 ELSE 1 END AS f_stop,
               CASE WHEN len(list_filter(toks,
                         x -> regexp_full_match(x, '[a-z]+'))) * 1000
                         // len(toks) >= 800
                    THEN 0 ELSE 1 END AS f_alpha
        FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(f_wc) AS BIGINT)     AS fail_word_count,
           CAST(sum(f_mwl) AS BIGINT)    AS fail_mean_word_len,
           CAST(sum(f_stop) AS BIGINT)   AS fail_stopwords,
           CAST(sum(f_alpha) AS BIGINT)  AS fail_alpha_ratio,
           CAST(sum(CASE WHEN f_wc + f_mwl + f_stop + f_alpha = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST((2000 * sum(CASE WHEN f_wc + f_mwl + f_stop + f_alpha = 0
                            THEN 1 ELSE 0 END) + count(*))
                // (2 * count(*)) AS BIGINT) AS pass_milli
    FROM flags GROUP BY source
    """,
    doc="Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1, "
    "public — the pre-classifier heuristic gate every large-corpus "
    "pipeline runs first): per document, four deterministic rules — "
    "word count >= 25, mean word length within [4.8, 5.8] (milli "
    "units, thresholds fitted to this corpus's observed band the way "
    "Gopher's [3, 10] fits web text), >= 2 stopword occurrences from "
    "the fixed 8-word list, and >= 80% purely-alphabetic tokens — "
    "rolled up per source as per-rule failure counts, the all-rules "
    "pass count, and the half-up pass rate. The per-rule breakdown is "
    "the operational payload: it tells a curation team WHICH rule "
    "gates a source (complementing ml_quality_classifier_train's "
    "learned scorer with the auditable rule panel). Entirely map-side "
    "single-scan (tokenize once, four integer flags via higher-order "
    "array functions — no explode, no shuffle of token rows) + one "
    "tiny per-source fold: the flat 100 TB shape. Engine parity: "
    "whitespace tokens (the hapax/ttr tokenizer), integer milli "
    "ratios, and rlike '^[a-z]+$' == regexp_full_match('[a-z]+').",
)
def doc_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = ["the", "and", "of", "to", "a", "in", "is", "that"]
    f_wc = F.when(F.size(toks) >= 25, 0).otherwise(1)
    mwl = F.expr(
        "CAST(n_chars AS BIGINT) * 1000 div size(split(text, ' '))"
    )
    f_mwl = F.when(mwl.between(4800, 5800), 0).otherwise(1)
    f_stop = F.when(
        F.size(F.filter(toks, lambda x: x.isin(stop))) >= 2, 0
    ).otherwise(1)
    f_alpha = F.when(
        F.expr(
            "size(filter(split(text, ' '), x -> x rlike '^[a-z]+$'))"
            " * 1000 div size(split(text, ' '))"
        )
        >= 800,
        0,
    ).otherwise(1)
    flags = d.select(
        "source",
        f_wc.alias("f_wc"),
        f_mwl.alias("f_mwl"),
        f_stop.alias("f_stop"),
        f_alpha.alias("f_alpha"),
    )
    passed = (
        F.col("f_wc") + F.col("f_mwl") + F.col("f_stop") + F.col("f_alpha")
        == 0
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("f_wc").cast("long").alias("fail_word_count"),
        F.sum("f_mwl").cast("long").alias("fail_mean_word_len"),
        F.sum("f_stop").cast("long").alias("fail_stopwords"),
        F.sum("f_alpha").cast("long").alias("fail_alpha_ratio"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("long").alias("n_pass"),
        F.expr(
            "CAST((2000 * sum(CASE WHEN f_wc + f_mwl + f_stop + f_alpha = 0"
            " THEN 1 ELSE 0 END) + count(*)) div (2 * count(*)) AS BIGINT)"
        ).alias("pass_milli"),
    )
