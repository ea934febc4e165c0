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
