"""Heavy hitters: Misra-Gries candidate sketch + exact verify pass.

The exact "terms above a frequency threshold" answer normally needs a full
groupBy over the token stream — at 100 TB that shuffles a vocabulary of
billions of mostly-rare terms just to throw them away. The classic 2-pass
alternative keeps the shuffle proportional to the ANSWER, not the vocab:

  pass 1  per-partition Misra-Gries summaries (k counters, O(k) memory,
          never spills) -> a bounded candidate relation. MG guarantees any
          term with global count > N/k survives in at least one partition:
          if x were pruned everywhere, each partition bounds its local
          count by N_p/k, and those sum to N/k.
  pass 2  broadcast the candidate terms back onto the token stream and
          count them EXACTLY; apply the threshold. Only candidate tokens
          enter the (tiny) exchange.

Choosing k strictly above 1/theta makes the final output EXACT (a strict
superset of candidates is exactly counted and filtered) — which is why the
registered query can carry a plain GROUP BY/HAVING DuckDB oracle even
though a sketch sits in the middle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter candidates.

    Returns a bounded relation ``(<col>, lb)`` — the output keeps the
    input column's name — with at most ``k`` rows per input partition;
    ``lb`` is the MG counter (a lower bound on the partition-local count,
    undercounting by at most N_p/k). Batches are folded in vectorized:
    each Arrow batch's exact value_counts is merged into the running
    summary, then the summary is pruned back to ``k`` counters by
    subtracting the (k+1)-th largest value (the standard MG merge, which
    preserves the error bound).
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for term, n in pdf[col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(n)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), "lb": list(counters.values())}
            )

    return df.select(col).mapInPandas(mg, schema=f"{col} string, lb long")


# Count-Min sketch: fixed hash-family parameters shared with the SQL oracle.
# h_d(k) = ((A[d]*k + B[d]) mod P) mod width — universal hashing over a
# Mersenne prime, integer-only, so Spark and DuckDB compute identical
# buckets for identical keys (CMS counters are additive sums, insensitive
# to partitioning/merge order, which is what makes the sketch estimate
# DETERMINISTIC and therefore hash-checkable cross-engine).
CMS_P = 8191
CMS_A = [3079, 4093, 5351, 6151]
CMS_B = [1531, 2389, 3271, 4447]


def count_min_counters(df, key: str, width: int = 64, depth: int = 4):
    """Build the d x w Count-Min counter table for an integer key column.

    Returns (d, bucket, cnt) with at most depth*width rows. One narrow
    explode (depth rows per input) feeding a grouped count whose key space
    is the FIXED d x w grid — map-side partial aggregation collapses each
    task's contribution to <= d*w rows, so the exchange moves O(d*w) per
    task regardless of input size. That is the CMS contract at 100 TB: the
    stream is summarized into constant-size mergeable state without ever
    shuffling the raw key column (contrast the exact groupBy, which
    shuffles every distinct key).
    """
    from pyspark.sql import functions as F

    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (
                    (F.lit(CMS_A[d]) * F.col(key) + F.lit(CMS_B[d])) % CMS_P % width
                )
                .cast("int")
                .alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select("r.d", "r.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_estimate(keys_df, counters, key: str, width: int = 64, depth: int = 4):
    """Point-estimate each key against the counter table: min over the d
    rows of the counter each hash lands in. The counter table is bounded
    (d*w rows) and broadcast, so estimating N keys is a map-only broadcast
    join — no shuffle of the probe side."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    probes = keys_df.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        (
                            (F.lit(CMS_A[d]) * F.col(key) + F.lit(CMS_B[d]))
                            % CMS_P
                            % width
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("r"),
    ).select(key, "r.d", "r.bucket")
    return (
        probes.join(broadcast(counters), ["d", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_n"))
    )


def cms_join_size_estimate(r_df, s_df, key: str, width: int = 64, depth: int = 4):
    """Equi-join cardinality estimation via the Count-Min inner product
    (Cormode & Muthukrishnan 2005, §4.3; same estimator family as AMS F2):
    |R JOIN S on key| = sum_k fR(k) * fS(k), estimated per depth row as
    sum_b cntR[d,b] * cntS[d,b] and taking the MIN over rows. Collisions
    only ADD mass, so the estimate is a guaranteed OVERestimate — the safe
    direction for an optimizer deciding whether a join is broadcast-able.

    The scale contract is the CMS one: each input collapses to a d x w
    counter grid via map-side partials (no raw-key shuffle), and the
    inner product itself is a d*w-row join — O(1) work regardless of
    input size. Returns a single-row DataFrame (d rows reduced to min).
    """
    from pyspark.sql import functions as F

    cr = count_min_counters(r_df, key, width, depth)
    cs = count_min_counters(s_df, key, width, depth).select(
        "d", "bucket", F.col("cnt").alias("cnt_s")
    )
    per_depth = (
        cr.join(cs, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt_s")).cast("long").alias("ip"))
    )
    return per_depth.agg(F.min("ip").cast("long").alias("cms_join_size"))
