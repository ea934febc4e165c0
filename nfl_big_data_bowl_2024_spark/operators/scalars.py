"""Grand-total attachment — the one-scan, no-single-partition shape for
"attach a scalar computed over a relation back onto that relation"."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Session conf selecting the materialization primitive (see
# checkpoint_with_scalar): "local" (default) or "reliable".
CHECKPOINT_MODE_CONF = "spark.graft.scalarCheckpointMode"


def checkpoint_with_scalar(
    df: DataFrame, *aggs, mode: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Materialize ``df`` once and return ``(cp, scalar)`` where ``scalar``
    is a broadcast 1-row aggregate of the given expressions over the
    checkpoint.

    Both consumers — the scalar aggregate and whatever cross-joins it
    back — read the checkpoint blocks, so the subtree below ``df`` is
    planned exactly once (Catalyst does not CSE DataFrame subtrees) AND
    the total is a distributed partial aggregate broadcast back as one
    row, never an unpartitioned window sorting the whole relation on a
    single task. Used by TPC-H Q11/Q15 and the unigram-LM normalizer;
    plan-audited in tests/test_plan_audit.py.

    Fault-tolerance trade-off, and the ``mode`` flag:

    - ``"local"`` (default): ``localCheckpoint`` truncates lineage and
      stores blocks only on executors. Fastest (no FS round-trip), but on
      a real multi-executor cluster an executor loss makes every
      downstream stage fail UNRECOVERABLY — there is no lineage left to
      recompute from. Right for the single-JVM harness and short
      interactive queries.
    - ``"reliable"``: ``DataFrame.checkpoint`` writes the blocks to the
      cluster checkpoint directory (HDFS / object storage — the caller
      must have called ``spark.sparkContext.setCheckpointDir``). Same
      plan shape, one extra write+read of the materialized relation, and
      the 100 TB-scale behavior: blocks survive executor loss, stages
      recompute from the checkpoint files.

    ``mode=None`` reads the session conf ``spark.graft.scalarCheckpointMode``
    (default ``"local"``), so a production deployment flips every
    grand-total query to reliable checkpoints with one session setting and
    zero query changes.
    """
    if mode is None:
        mode = df.sparkSession.conf.get(CHECKPOINT_MODE_CONF, "local")
    if mode == "reliable":
        cp = df.checkpoint(eager=True)
    elif mode == "local":
        cp = df.localCheckpoint(eager=True)
    else:
        raise ValueError(
            f"{CHECKPOINT_MODE_CONF}={mode!r}: expected 'local' or 'reliable'"
        )
    return cp, F.broadcast(cp.agg(*aggs))


def checkpoint_observed(df: DataFrame, *aggs):
    """Eagerly checkpoint ``df`` and return ``(cp, metrics)`` where
    ``metrics`` is the dict of the given aggregate expressions computed
    DURING the checkpoint job as observed metrics (``Dataset.observe``).

    This folds the ubiquitous "materialize, then run a scalar probe over
    the materialized blocks" two-job shape into ONE job: the fixpoint
    loops' convergence counts (connected_components, kcore_peel, BFS/
    Bellman-Ford frontiers) and the exchange-sizing aggregates (LSH
    verify width, Jaccard pair count) all need a driver-side scalar of
    the relation they just materialized, and the separate count/agg job
    costs a scheduler round-trip at sf0.1 and a full re-scan of the
    checkpointed blocks at scale. Observed metrics are computed by the
    SAME tasks that materialize the checkpoint, so the probe is free.

    Constraints inherited from ``observe``: aggregates must not contain
    DISTINCT and must be deterministic. An aggregate over zero rows
    follows SQL semantics (``sum`` -> None; callers coalesce).

    Deliberately LOCAL-only (no ``CHECKPOINT_MODE_CONF`` switch, unlike
    checkpoint_with_scalar): a reliable ``Dataset.checkpoint`` forces the
    plan with one job and then RE-COMPUTES the RDD in the checkpoint-file
    write pass (Spark recomputes unpersisted RDDs there), so the observed
    accumulator metrics would double-count. The fixpoint loops this
    serves always used localCheckpoint, so nothing changes for them; a
    production deployment that needs reliable checkpoints in these loops
    keeps the separate-count shape instead.
    """
    from pyspark.sql import Observation

    obs = Observation()
    cp = df.observe(obs, *aggs).localCheckpoint(eager=True)
    return cp, obs.get


def checkpoint_counted(df: DataFrame, cond=None):
    """``checkpoint_observed`` specialized to one row count: returns
    ``(cp, n)`` where ``n`` counts the checkpointed rows satisfying
    ``cond`` (all rows when None). The convergence-probe shape of every
    fixpoint loop in operators/graph.py."""
    metric = (
        F.count(F.lit(1))
        if cond is None
        else F.sum(F.when(cond, 1).otherwise(0))
    )
    cp, m = checkpoint_observed(df, metric.alias("n"))
    n = m["n"]
    return cp, int(n) if n is not None else 0
