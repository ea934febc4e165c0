"""Grand-total attachment — the one-scan, no-single-partition shape for
"attach a scalar computed over a relation back onto that relation"."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checkpoint_with_scalar(df: DataFrame, *aggs) -> tuple[DataFrame, DataFrame]:
    """Materialize ``df`` once (eager localCheckpoint) and return
    ``(cp, scalar)`` where ``scalar`` is a broadcast 1-row aggregate of
    the given expressions over the checkpoint.

    Both consumers — the scalar aggregate and whatever cross-joins it
    back — read the checkpoint blocks, so the subtree below ``df`` is
    planned exactly once (Catalyst does not CSE DataFrame subtrees) AND
    the total is a distributed partial aggregate broadcast back as one
    row, never an unpartitioned window sorting the whole relation on a
    single task. Used by TPC-H Q11/Q15 and the unigram-LM normalizer;
    plan-audited in tests/test_plan_audit.py.

    Fault-tolerance trade-off: ``localCheckpoint`` truncates lineage and
    stores the blocks only on executors, so on a multi-executor cluster
    an executor loss makes downstream stages fail unrecoverably instead
    of recomputing.  That is acceptable in this repo's single-JVM test
    harness and for short interactive queries; the production-scale
    variant is a reliable ``checkpoint()`` (after
    ``spark.sparkContext.setCheckpointDir`` on HDFS/object storage) or
    ``persist(StorageLevel.MEMORY_AND_DISK_2)`` — same plan shape, blocks
    survive executor loss.
    """
    cp = df.localCheckpoint(eager=True)
    return cp, F.broadcast(cp.agg(*aggs))
