"""Data-quality audit queries (dq_*): profiling, expectations,
leakage/integrity audits, drift, checksums and skew reports.

Split out of plans/pipeline_stats.py in round 10 (the r8 split target
of no file over ~2,500 LoC; pipeline_stats had grown to 2,578).
Original docstrings, oracle SQL and reference citations moved
verbatim; shared helpers stay in pipeline_common.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_testdata_table as _t
from .pipeline_common import _BENFORD_MICRO, _content_fingerprint
from ..localrel import local_df as _local
from .registry import register


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
    return _local(
        _t(spark, sf_dir, "region").sparkSession,
        rows,
        "fk_edge: string, n_child: long, n_orphans: long, n_childless: long",
    )


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
    exp_tbl = _local(
        spark, sorted(_BENFORD_MICRO.items()), "digit long, p_micro long"
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


@register(
    "dq_sequential_gap_audit",
    """
    WITH a AS (
        SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
               CAST(min(event_id) AS BIGINT) AS id_min,
               CAST(max(event_id) AS BIGINT) AS id_max
        FROM events
        UNION ALL
        SELECT 'orders', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT o_orderkey) AS BIGINT),
               CAST(min(o_orderkey) AS BIGINT),
               CAST(max(o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT c_custkey) AS BIGINT),
               CAST(min(c_custkey) AS BIGINT),
               CAST(max(c_custkey) AS BIGINT)
        FROM customer
    )
    SELECT tbl, n_rows, n_distinct, id_min, id_max,
           CAST(n_rows - n_distinct AS BIGINT)            AS n_duplicates,
           CAST(id_max - id_min + 1 - n_distinct AS BIGINT) AS n_gaps
    FROM a
    """,
    doc="Surrogate-key continuity audit across three fact/dim tables: "
    "row count vs exact distinct, id range, duplicate count (n - "
    "distinct) and gap count (range - distinct) — the CDC-ingestion "
    "health check that catches dropped partitions (gaps) and double-"
    "applied batches (duplicates) before they poison joins, "
    "complementing dq_referential_integrity (cross-table) with the "
    "within-key-space invariant. Each branch is one exact "
    "count-distinct over the key (a single exchange with map-side "
    "partials; at 100 TB the documented relaxation is the HLL sketch "
    "of agg_hll_shard_union when +-2% suffices), and the three "
    "branches union into one bounded 3-row report.",
)
def dq_sequential_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def branch(tbl: str, key: str) -> DataFrame:
        t = _t(spark, sf_dir, tbl)
        return t.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(key).cast("long").alias("n_distinct"),
            F.min(key).cast("long").alias("id_min"),
            F.max(key).cast("long").alias("id_max"),
        )

    a = (
        branch("events", "event_id")
        .unionByName(branch("orders", "o_orderkey"))
        .unionByName(branch("customer", "c_custkey"))
    )
    return a.select(
        "tbl",
        "n_rows",
        "n_distinct",
        "id_min",
        "id_max",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("n_duplicates"),
        (F.col("id_max") - F.col("id_min") + 1 - F.col("n_distinct"))
        .cast("long")
        .alias("n_gaps"),
    )


