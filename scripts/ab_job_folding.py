"""Interleaved A/B runner for the r14 job-folding changes (observed-metric
convergence counts + known-count persists).

Usage: python scripts/ab_job_folding.py <repo_path> <tag> <reps> [sf_dir] [q ...]

Runs the given queries (default: the benched paths the change touches)
min-of-<reps> in ONE session, printing per-rep wall clock AND the number of
Spark jobs each rep launched (statusTracker delta) — the structural evidence
for a change whose whole point is fewer driver jobs; terminal explain()
plans are unchanged (the CollectMetrics node sits below the checkpoints and
never appears in a consumer plan). Probes recorded before/after (box-noise
protocol). The caller alternates processes over a baseline worktree and
HEAD (module code cannot be swapped inside one process): base,head,head,base.
"""
import sys
import time

REPO = sys.argv[1]
TAG = sys.argv[2]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
SF = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

sys.path.insert(0, REPO)

from nfl_big_data_bowl_2024_spark.session import get_spark  # noqa: E402
from nfl_big_data_bowl_2024_spark.plans import all_queries  # noqa: E402
from bench import calibration_probes_multi  # noqa: E402

QUERIES = sys.argv[5:] or [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_cluster_representative",
    "graph_pagerank_trading",
    "graph_label_propagation",
    "graph_kcore_peel",
]


def clear_memo():
    from nfl_big_data_bowl_2024_spark.plans import pipeline_common as pc

    pc._CC_LABELS_CACHE.clear()


def n_jobs(sc):
    return len(sc.statusTracker().getJobIdsForGroup(None))


def main():
    spark = get_spark(f"ab-jobfold-{TAG}")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    reg = all_queries()
    reg["tpch_q1_pricing_summary"].fn(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"probes_before {TAG} {calibration_probes_multi(spark)}", flush=True)
    samples = {q: [] for q in QUERIES}
    jobs = {q: [] for q in QUERIES}
    for rep in range(REPS):
        for q in QUERIES:
            clear_memo()
            sc.setJobDescription(f"{TAG} {q} rep{rep}")
            j0 = n_jobs(sc)
            t0 = time.time()
            reg[q].fn(spark, SF).write.format("noop").mode("overwrite").save()
            samples[q].append(round(time.time() - t0, 3))
            jobs[q].append(n_jobs(sc) - j0)
        print(f"rep{rep} done", flush=True)
    print(f"probes_after {TAG} {calibration_probes_multi(spark)}", flush=True)
    for q in QUERIES:
        print(
            f"RESULT {TAG} {q}: min={min(samples[q])} all={samples[q]}"
            f" jobs={jobs[q]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
