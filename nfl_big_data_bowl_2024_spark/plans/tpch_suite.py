"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q15/Q16/Q20), adapted to the
driver testdata schema.

The testdata has no ``partsupp`` table, so the five queries that join it in
canonical TPC-H (Q2/Q9/Q11/Q16/Q20) are re-keyed onto ``lineitem``'s
(l_partkey, l_suppkey) pairs — the *plan shapes* (correlated scalar-aggregate
decorrelation, scalar-subquery thresholds, NOT IN anti-joins, semi-join
promotion chains, multi-role dimension joins) are preserved exactly; only the
fact table feeding them differs.

Cross-engine determinism follows the repo cookbook, upgraded in round 7 to
SCALED-INTEGER money sums: the revenue addend l_extendedprice*(1-l_discount)
is exactly 4dp (2dp x 2dp), so each row contributes an exact ten-thousandths
integer and sums accumulate in DECIMAL(38,0)/HUGEINT with no float anywhere.
The previous DECIMAL(24,10)-cast pattern was correct until a group's
scale-10 integer crossed 2^53 (~ sums above 9e5): DuckDB then converts
decimal->double by int128->double THEN /1e10 (two roundings) while Spark's
BigDecimal.doubleValue rounds once, and at an exact half-cent boundary the
1-ulp gap flips floor(x*100+0.5) — tpch_q9's nation x year sums (~2.3e8,
probability ~1/100 per group of a trailing-"50" boundary) hit it 3 times in
175 groups at sf1. Final 2dp rounding is now (S + 50) div 100 in exact
integer arithmetic; ratios (Q8) use the (2k*num + den) div (2*den) form.
Equality comparisons (Q15's max-revenue match) happen on the exact integer
sums, never on rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_testdata_table as _t
from .registry import register

_DEC = "decimal(38,0)"


def _rev() -> F.Column:
    """Revenue addend as an EXACT scaled integer (1e-4 units): the 4dp
    product recovered by floor(x*1e4 + 0.5) — the double's ulp error is
    ~1e-7 at these magnitudes, far inside the 0.5 recovery margin — then
    widened to decimal(38,0) so sums never overflow or round."""
    return (
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .cast(_DEC)
    )


def _round2(c: F.Column) -> F.Column:
    """Exact 2dp money from a decimal(38,0) sum of 1e-4-scaled addends:
    (S + 50) / 100 is an exact-2dp decimal quotient (Spark represents it
    exactly at result scale 6), floor gives integer cents, and the final
    /100.0 is one correctly-rounded double op both engines share."""
    return F.floor((c + F.lit(50)) / 100).cast("long") / 100.0


@register(
    "tpch_q2_top_supplier_per_nation",
    """
    WITH mx AS (
        SELECT s_nationkey, max(s_acctbal) AS max_bal
        FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN mx     ON s.s_nationkey = mx.s_nationkey AND s.s_acctbal = mx.max_bal
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    """,
    doc="TPC-H Q2 shape: correlated scalar-MIN subquery decorrelated into a "
    "grouped aggregate + equality re-join (here argmax supplier balance per "
    "nation; canonical Q2's min ps_supplycost needs partsupp). max() of raw "
    "doubles is order-independent, so the equality join is cross-engine "
    "exact. Both aggregate and re-join shuffle on s_nationkey — one "
    "exchange, reused; nation/region dims broadcast.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    mx = s.groupBy(F.col("s_nationkey").alias("mx_nationkey")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    eur = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
               F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        s.join(
            mx,
            (F.col("s_nationkey") == F.col("mx_nationkey"))
            & (F.col("s_acctbal") == F.col("max_bal")),
        )
        .join(F.broadcast(eur), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", "s_acctbal")
    )


@register(
    "tpch_q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST((sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) + 50) // 100
                AS BIGINT) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: the nation-pair volume-shipping query. The same dimension "
    "(nation) joins twice under different roles (supplier side, customer "
    "side); the disjunctive pair predicate evaluates after both joins. All "
    "four dims broadcast, so lineitem (the 100 TB fact) is never shuffled — "
    "the only exchange is the final small groupBy.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.withColumnsRenamed({"n_nationkey": "n1_key", "n_name": "supp_nation"})
    n2 = n.withColumnsRenamed({"n_nationkey": "n2_key", "n_name": "cust_nation"})
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _round2(F.sum(_rev())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q8_market_share",
    """
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                          * 10000 + 0.5) AS BIGINT) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST((2000000 * sum(CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume ELSE 0 END)
                 + sum(volume)) // (2 * sum(volume)) AS BIGINT) / 1000000.0
               AS mkt_share,
           count(*) AS n_items
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8: national market share — conditional share-of-total over a "
    "seven-table star join. Numerator and denominator come out of ONE "
    "aggregate (conditional sum), not two scans. Exact scaled-integer sums; "
    "the 6dp share is (2k*num + den) div (2*den) — half-up rounding done "
    "entirely in integer arithmetic, so no float ratio ever exists to "
    "diverge. Six broadcast dims; zero fact-table shuffles before the "
    "final groupBy.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    asia_nations = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
               F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"),
              "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast(_DEC)
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            nat.alias("nat"),
            F.sum("volume").alias("den"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "o_year",
            (
                F.expr("CAST((2000000 * nat + den) div (2 * den) AS BIGINT)")
                / 1000000.0
            ).alias("mkt_share"),
            "n_items",
        )
    )


@register(
    "tpch_q9_nation_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST((sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) + 50) // 100
                AS BIGINT) / 100.0 AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-type profit by nation and year (profit term "
    "reduced to revenue — ps_supplycost needs partsupp). Substring LIKE on "
    "p_name prunes parts before the fact join; dims broadcast; one shuffle "
    "total (the 50-group aggregate).",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_round2(F.sum(_rev())).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    """
    WITH val AS (
        SELECT l.l_partkey,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey IN (0, 1, 2)
        GROUP BY l.l_partkey
    )
    SELECT l_partkey,
           CAST(v AS BIGINT) / 100.0 AS part_value
    FROM val
    WHERE v * 1000 > (SELECT sum(v) FROM val)
    """,
    doc="TPC-H Q11 shape: groups whose aggregate exceeds a fraction of the "
    "global total (scalar-aggregate subquery threshold). The per-part "
    "aggregate is materialized ONCE (eager localCheckpoint — the same "
    "idiom as the MinHash signature index) and both consumers read the "
    "checkpoint blocks: the grand total is a distributed scalar aggregate "
    "over it, broadcast back as one row. A naive re-aggregate form would "
    "plan the fact scan+aggregate twice (no DataFrame CSE); a global-"
    "window form would sort the whole |parts|-row aggregate on a single "
    "task — the shape that breaks when |parts| reaches 10^10. The "
    "fraction comparison runs on exact decimals scaled by an integer "
    "(v*1000 > total == v > 0.1% of total), sidestepping double-division "
    "nondeterminism.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1, 2)
    ).select("s_suppkey")
    from ..operators.scalars import checkpoint_with_scalar

    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "long"
    ).cast(_DEC)
    val, total = checkpoint_with_scalar(
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("v")),
        F.sum("v").alias("total"),
    )
    return (
        val.crossJoin(total)
        .filter(F.col("v") * 1000 > F.col("total"))
        .select(
            "l_partkey", (F.col("v").cast("long") / 100.0).alias("part_value")
        )
    )


@register(
    "tpch_q15_top_revenue_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount)
                              * 10000 + 0.5) AS BIGINT)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST((r.total_rev + 50) // 100 AS BIGINT) / 100.0 AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — the canonical "
    "view-reused-twice query. The view is materialized once (eager "
    "localCheckpoint of the ~|suppliers|-row aggregate) and reused by "
    "both consumers: the global max is a distributed scalar aggregate "
    "over the checkpoint, broadcast back as one row — the fact scans "
    "once AND no relation ever funnels through a single task (the "
    "naive re-aggregate form reads lineitem twice — no DataFrame "
    "subtree CSE — and a global-window form sorts all suppliers on one "
    "task). Equality compares the EXACT decimal sums "
    "(order-independent), never rounded doubles — ties all surface, no "
    "nondeterministic winner.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    from ..operators.scalars import checkpoint_with_scalar

    rev, mx = checkpoint_with_scalar(
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev")),
        F.max("total_rev").alias("max_rev"),
    )
    return (
        rev.crossJoin(mx)
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", _round2(F.col("total_rev")).alias("total_rev"))
    )


@register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: supplier counts per part attribute triple with a "
    "NOT IN exclusion subquery (canonical Q16 counts over partsupp; here "
    "over lineitem's observed pairs). NOT IN plans as a broadcast left_anti "
    "— safe because s_suppkey is non-nullable, so NOT IN's three-valued "
    "NULL trap can't fire. count(DISTINCT) expands to a two-level "
    "aggregate; both levels hash on the same grouping keys.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
               "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_promotion_suppliers",
    """
    WITH qty AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS q
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qty WHERE q > 50)
      AND s.s_nationkey IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    doc="TPC-H Q20 shape: the nested semi-join promotion chain — suppliers "
    "having moved >50 units of any 'red' part in 1996, restricted to one "
    "region's nations (canonical availqty/partsupp threshold re-keyed to "
    "shipped quantity). Both IN subqueries plan as semi-joins; the "
    "inner aggregate shrinks lineitem to (supp, part) pairs before any "
    "join against supplier. l_quantity is integral so sum(q)>50 is exact.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2).select(
        "n_nationkey"
    )
    movers = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"),
               "left_semi")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
