"""Distributed k-means (Lloyd) over an embedding column.

This is the trainer for the IVF index in ``operators/similarity.py``: IVF
*search* assumes a small driver-held centroid table; this module is the
100 TB-shaped way to BUILD that table.

Shape per Lloyd iteration (the only shape that survives a 100x scale-up):

  assignment   map-side only. The k centroids are a driver-held model
               (k x dim doubles, a few KB) embedded into the plan as a
               literal array; argmin is an ``array_sort`` over k
               (distance, cid) structs — no shuffle, no join, no UDF.
  update       ``posexplode`` -> hash aggregate keyed on (cid, dim).
               Catalyst's partial aggregation reduces map-side, so the
               exchange carries O(k x dim x partitions) partial rows, not
               O(n x dim). The k x dim result is collected to the driver —
               the same bounded-model pattern as ``ivf_assign``.

Cross-engine determinism (so a DuckDB oracle can replay the iteration
exactly): distances are rounded half-up to 9 dp BEFORE the argmin (ties
then break on cid, so near-ties become exact ties with a deterministic
winner instead of float-noise coin flips), and refined centroids are
rounded half-up to 6 dp before the next assignment round, which pins the
iteration-2 inputs bit-identical across engines. float32 embeddings are
cast to double up front (exact).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _round_col(c, ndigits: int):
    # Half-up rounding, identical on Spark and DuckDB (their native round()
    # functions disagree on .5 boundaries — repo-wide convention).
    scale = 10**ndigits
    return F.floor(c * scale + 0.5) / scale


def _euclid(vec_col, centroid: list[float]):
    """Rounded Euclidean distance from an array<double> column to a Python
    centroid, as a sequential left fold (same accumulation order as the
    oracle's list_distance)."""
    lit_arr = F.array(*[F.lit(float(v)) for v in centroid])
    sq = F.aggregate(
        F.zip_with(vec_col, lit_arr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return _round_col(F.sqrt(sq), 9)


def assign_to_centroids(
    df: DataFrame, centroids: dict[int, list[float]], vec_col: str = "e"
) -> DataFrame:
    """Map-only hard assignment: adds ``cluster_id`` and rounded ``d``.

    ``array_sort`` over (d, cid) structs orders by distance then cid, so
    the argmin is deterministic under ties.
    """
    best = F.array_sort(
        F.array(
            *[
                F.struct(
                    _euclid(F.col(vec_col), cent).alias("d"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cent in sorted(centroids.items())
            ]
        )
    )[0]
    return df.withColumn("cluster_id", best["cid"]).withColumn("d", best["d"])


def assign_to_centroids_vectorized(
    df: DataFrame, centroids: dict[int, list[float]], vec_col: str = "e"
) -> DataFrame:
    """BLAS twin of ``assign_to_centroids`` for LARGE k: same 9-dp rounded
    Euclidean distances, same tie rule (argmin returns the FIRST minimum,
    i.e. the lowest cid), computed as one matmul per Arrow batch via the
    |x-c|^2 = |x|^2 + |c|^2 - 2x.c expansion.

    The HOF form interprets k (distance, cid) struct lambdas PER ROW, so
    its cost is k interpreted evaluations x n — fine for a k=8 gate query,
    linear-in-n-AND-k at SemDeDup scale (k ~ n/1000 makes assignment
    quadratic overall). Here the inner loop is one n x k BLAS product.
    The expansion reorders the floating-point sum vs the fold, so raw
    BLAS distances can differ in the last ulps pre-rounding. To make the
    twin PROVABLY identical (not just empirically on the gate corpus),
    every centroid whose approximate distance lies within 1e-5 of the
    row's approximate minimum — a band >10000x the expansion's worst
    error (~3e-7 near zero where d_err ~ sqrt(d2_err), far less elsewhere) — is recomputed
    with the exact difference formula in the fold's own left-to-right
    accumulation order, and BOTH the
    winner and its reported distance are taken from those exact values
    (rounded-tie -> lowest cid, same as the fold's first-minimum rule).
    A centroid outside the band cannot win or tie under the fold path,
    so the output is bit-identical by construction; the extra exact work
    is ~one centroid per row (1/k of the matmul). Asserted against the
    HOF path in tests/test_clustering.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cids = np.array(sorted(centroids), dtype=np.int64)
    C = np.stack([np.asarray(centroids[int(c)], dtype=np.float64) for c in cids])
    c_sq = (C * C).sum(axis=1)

    # no type hints: PEP 563 string annotations break pyspark's signature
    # parser (same caveat as similarity.py's band_sigs)
    @pandas_udf("struct<cluster_id: int, d: double>")
    def _assign(embs):
        m = np.stack(embs.to_numpy())
        d2 = (m * m).sum(axis=1)[:, None] + c_sq[None, :] - 2.0 * (m @ C.T)
        np.maximum(d2, 0.0, out=d2)  # expansion can go ~-1e-13 on exact hits
        d_approx = np.sqrt(d2)
        # exact recompute of the winner band (see docstring): every
        # centroid within 1e-5 of the row minimum gets the fold-identical
        # difference formula; winner + distance come from exact values only
        dmin = d_approx.min(axis=1)
        rows_idx, cand_idx = np.nonzero(d_approx <= (dmin + 1e-5)[:, None])
        diffs = m[rows_idx] - C[cand_idx]
        # accumulate dims SEQUENTIALLY (vectorized across candidates) —
        # numpy's .sum() is pairwise, the fold path is a left fold, and
        # "provably identical" requires the identical op order
        sq = np.zeros(len(rows_idx), dtype=np.float64)
        for t in range(diffs.shape[1]):
            sq += diffs[:, t] * diffs[:, t]
        d_exact = np.floor(np.sqrt(sq) * 1e9 + 0.5) / 1e9
        # per row: min exact distance, ties -> lowest cid. rows_idx is
        # row-major sorted, cand_idx ascending within a row, so a stable
        # lexsort on (row, d) keeps the lowest cid first among ties.
        order = np.lexsort((cand_idx, d_exact, rows_idx))
        _, first = np.unique(rows_idx[order], return_index=True)
        pick = order[first]
        return pd.DataFrame(
            {"cluster_id": cids[cand_idx[pick]].astype(np.int32), "d": d_exact[pick]}
        )

    out = df.withColumn("_a", _assign(F.col(vec_col)))
    return (
        out.withColumn("cluster_id", F.col("_a.cluster_id"))
        .withColumn("d", F.col("_a.d"))
        .drop("_a")
    )


def refine_centroids(
    assigned: DataFrame, vec_col: str = "e"
) -> dict[int, list[float]]:
    """Lloyd update: element-wise mean per cluster via posexplode + one
    hash aggregate (map-side partials), rounded to 6 dp; collects the
    k x dim model rows to the driver (bounded by k x dim, NOT by n)."""
    rows = (
        assigned.select("cluster_id", F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("cluster_id", "pos")
        .agg(_round_col(F.avg("v"), 6).alias("cv"))
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(r["cluster_id"], {})[r["pos"]] = r["cv"]
    return {
        cid: [by_pos[p] for p in sorted(by_pos)] for cid, by_pos in cents.items()
    }


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "e",
    vectorized: bool = False,
    keep_vec: bool = False,
) -> DataFrame:
    """Run ``iters`` assignment rounds of Lloyd's algorithm (so
    ``iters - 1`` centroid refinements) and return the final assignment
    DataFrame: (id_col, cluster_id, d).

    Seeds are the ``k`` rows with the lowest ids (deterministic across
    engines, unlike k-means++ sampling). A cluster that loses all members
    simply drops out of the model — the next round assigns against the
    survivors, matching the oracle's inner-join semantics.

    r13: the (id, vector) projection is eagerly localCheckpointed up
    front — the seed fetch, every refine aggregate and every assignment
    pass previously re-ran the scan + per-element double cast (iters + 2
    passes over the source); they now all read the one materialized
    projection, whose blocks are released when the returned assignment's
    lineage is collected (the kernel holds no other state bigger than
    k x dim).
    """
    assign = assign_to_centroids_vectorized if vectorized else assign_to_centroids
    proj = emb.select(id_col, vec_col).localCheckpoint(eager=True)
    seeds = proj.orderBy(id_col).limit(k).collect()
    centroids = {i: [float(v) for v in r[vec_col]] for i, r in enumerate(seeds)}
    assigned = assign(proj, centroids, vec_col)
    for _ in range(iters - 1):
        centroids = refine_centroids(assigned, vec_col)
        assigned = assign(proj, centroids, vec_col)
    cols = [id_col, "cluster_id", "d"] + ([vec_col] if keep_vec else [])
    return assigned.select(*cols)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    query_id: str = "query_id",
    neighbor_id: str = "neighbor_id",
    vec_col: str = "e",
    bound: int = 10_000,
) -> DataFrame:
    """k-NN JOIN: for every query vector, its top-k corpus neighbors by
    cosine (rounded half-up to 6 dp; ties break on neighbor id).

    Shape (the one that scales): the query set is collected once into a
    driver-held matrix (guarded by ``bound`` — queries are the small side
    by contract, the same bounded-model pattern as ``ivf_assign``) and
    broadcast to the Python workers; ONE ``mapInPandas`` pass over the
    corpus scores each Arrow batch against ALL queries with a single BLAS
    matmul and emits only the per-batch top-k rows per query. The final
    top-k is a window over the O(partitions x |Q| x k) candidate table —
    never over the raw |Q| x |C| pair table (the earlier pair-join
    formulation scaled at exponent ~1.25 and paid an interpreted-HOF dot
    per pair; this shape measured 15.8 s -> ~1 s at the 10x point).

    Per-batch tie-break exactness: candidates are selected by the integer
    composite key round(cos * 1e6) * 1e10 + (1e10 - 1 - id), so the batch
    top-k uses EXACTLY the global (cosine DESC, id ASC) order — any global
    winner is necessarily a batch winner. Requires non-negative ids
    < 1e10 (asserted).
    """
    import numpy as np

    qrows = queries.select(query_id, vec_col).collect()
    if len(qrows) > bound:
        raise ValueError(
            f"knn_join query side has {len(qrows)} rows > bound={bound}; "
            "the query set must be the driver-holdable small side "
            "(raise bound explicitly if that is really intended)"
        )
    qids = np.array([r[query_id] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    n_q = len(qids)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[neighbor_id].to_numpy(dtype=np.int64)
            assert ids.min() >= 0 and ids.max() < 10_000_000_000
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = np.floor(mat @ qm.T * 1e6 + 0.5)  # (batch, n_q) int-valued
            key = sims.astype(np.int64) * 10_000_000_000 + (
                9_999_999_999 - ids[:, None]
            )
            m = min(k, len(ids))
            sel = np.argpartition(-key, m - 1, axis=0)[:m]  # (m, n_q)
            yield pd.DataFrame(
                {
                    query_id: np.broadcast_to(qids, (m, n_q)).ravel(),
                    neighbor_id: ids[sel].ravel(),
                    "cosine": (
                        sims[sel, np.arange(n_q)] / 1e6
                    ).ravel(),
                }
            )

    cand = corpus.select(neighbor_id, vec_col).mapInPandas(
        score, f"{query_id} long, {neighbor_id} long, cosine double"
    )
    w_final = Window.partitionBy(query_id).orderBy(F.desc("cosine"), neighbor_id)
    return (
        cand.withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= k)
    )


def logreg_train_gd(
    feat: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 2,
) -> list[float]:
    """Full-batch gradient-descent logistic regression trainer.

    Returns ``[w0, w1, ..., wd]`` (bias first) after ``iters`` rounds.
    Each round is ONE distributed aggregate over ``feat`` — the gradient
    is d+1 averaged doubles, so the per-round driver traffic is a single
    row no matter the corpus size (the same bounded driver-index contract
    as ``kmeans_lloyd``'s centroids). The caller should pass a
    materialized (checkpointed) feature relation: iterative training
    re-reads it every round.

    Determinism across engines: weights are rounded to 9 dp after every
    update, so an oracle replaying the same schedule sees bit-identical
    weights each round; the first round needs no exp() at all (w=0 gives
    p=0.5 exactly), and later rounds' libm exp() differences (~1 ulp)
    vanish under the averaging + rounding.
    """
    w = [0.0] * (1 + len(feature_cols))
    for it in range(iters):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col(label_col)
        aggs = [F.avg(err).alias("g0")] + [
            F.avg(err * F.col(c)).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        if it == 0:
            # NULL hygiene, folded into the first round's aggregate (no
            # extra pass): avg() silently DROPS NULL rows, so scattered
            # NULLs in one feature would shrink that gradient component's
            # averaging set and skew the weights without any error.
            aggs.append(F.count(F.lit(1)).alias("_n"))
            aggs += [
                F.count(F.col(c)).alias(f"_n{j}")
                for j, c in enumerate([label_col, *feature_cols])
            ]
        row = feat.agg(*aggs).first()
        g = [row[f"g{j}"] for j in range(1 + len(feature_cols))]
        if it == 0:
            n = row["_n"]
            for j, c in enumerate([label_col, *feature_cols]):
                if row[f"_n{j}"] != n:
                    raise ValueError(
                        f"logreg_train_gd: column {c!r} has "
                        f"{n - row[f'_n{j}']} NULL row(s) out of {n} — "
                        "avg() would silently drop them and skew that "
                        "gradient component; pass a NULL-free relation"
                    )
        if any(gj is None for gj in g):
            raise ValueError(
                "logreg_train_gd: empty feature relation or all-NULL "
                "feature/label column (avg returned NULL)"
            )
        w = [
            math.floor((wj - lr * gj) * 1e9 + 0.5) / 1e9
            for wj, gj in zip(w, list(g))
        ]
    return w


def power_iteration_top_direction(
    e: DataFrame, vec_col: str = "e", iters: int = 2
) -> list[float]:
    """Top direction of the corpus's uncentered second-moment (Gram)
    matrix by distributed power iteration.

    The Gram matrix is ONE corpus pass — a BLAS X^T.X per Arrow batch
    emitting d^2 partials (the outer-product explode would be d^2 JVM
    rows per vector), summed to a bounded d^2-row relation that lands
    driver-side under the same bounded-index contract as the k-means
    centroids. Iteration then runs on the driver with 9-dp rounding per
    round (Gram entries rounded 6 dp first), so an oracle can replay the
    schedule bit-identically; the start vector 1/sqrt(d) is exactly
    representable for power-of-two d.

    Convergence is the standard (lambda_2/lambda_1)^iters rate: it needs
    a spectral gap. Isotropic corpora (no dominant direction) keep the
    output deterministic but meaningless — see the planted-spike test
    for the convergent regime.
    """
    import numpy as np

    def gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            C = X.T @ X
            d = C.shape[0]
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {
                    "i": (ii.ravel() + 1).astype("int32"),
                    "j": (jj.ravel() + 1).astype("int32"),
                    "c": C.ravel(),
                }
            )

    crows = (
        e.select(vec_col)
        .mapInPandas(gram, "i int, j int, c double")
        .groupBy("i", "j")
        .agg(F.sum("c").alias("c"))
        .select("i", "j", (F.floor(F.col("c") * 1e6 + 0.5) / 1e6).alias("c"))
        .collect()  # d^2 rows: bounded driver-held index
    )
    if not crows:
        raise ValueError(
            "power_iteration_top_direction: empty corpus (no vectors)"
        )
    d = max(r["i"] for r in crows)
    M = np.zeros((d, d))
    for r in crows:
        M[r["i"] - 1, r["j"] - 1] = r["c"]
    v = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(iters):
        w = M @ v
        nrm = math.sqrt(float((w * w).sum()))
        if nrm == 0.0:
            raise ValueError(
                "power_iteration_top_direction: zero Gram matrix (all "
                "vectors zero, or the iterate landed in its null space)"
            )
        v = np.array([math.floor(x / nrm * 1e9 + 0.5) / 1e9 for x in w])
    return [float(x) for x in v]


def semantic_dedup(
    emb: DataFrame,
    tau: float,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "e",
    vectorized_assign: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication"):
    cluster the embedding space, then search for near-duplicate pairs ONLY
    within each cluster — the move that turns the quadratic all-pairs
    cosine into sum(|cluster|^2), bounded at corpus scale by growing k
    with n (cluster size stays ~constant, so pair volume is ~n x s and
    the cluster-keyed self-join parallelizes across k keys; this repo's
    local run uses k=8 over 500 vectors, a 100 TB run would use
    k ~ n/1000).

    Verdict rule (deterministic variant of the paper's keep-one): a vector
    is dropped iff a LOWER-id member of its cluster has cosine >= ``tau``
    with it; ``dup_of`` records the lowest such id. The paper keeps the
    member farthest from the centroid — id order is used here so both
    engines agree without a float ranking.

    Plan shape: kmeans_lloyd assignment (map-only vs broadcast centroids;
    ``vectorized_assign=True`` switches to the BLAS twin — REQUIRED once k
    grows with n, the HOF argmin interprets k struct lambdas per row) ->
    eager checkpoint of the (id, cluster, vector) relation (it feeds the
    pair stage AND the verdict join; Catalyst does not CSE DataFrame
    subtrees — the connected-components lesson) -> per-cluster
    ``applyInPandas`` dup-pair extraction: ONE normalized gram matrix per
    cluster, so each vector crosses the Arrow boundary once per CLUSTER
    (a pair-table self-join moves every vector once per PAIR — n x s x d
    doubles vs n x d). Cluster size is bounded by construction (k ~ n/s),
    which also bounds the per-group matrix. Cosine is half-up floored to
    6 dp before the threshold on BOTH engines; margin-tested in
    tests/test_dedup_similarity.py.
    """
    import numpy as np
    import pandas as pd

    # keep_vec: the assignment already carries each row's vector, so the
    # old join back against a SECOND scan of the source (plus its id-keyed
    # exchange) is gone (r13)
    assigned = kmeans_lloyd(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        vectorized=vectorized_assign, keep_vec=True,
    )
    m = assigned.select(id_col, "cluster_id", vec_col).localCheckpoint(
        eager=True
    )

    def _dup_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf[vec_col].to_numpy())[order]
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = np.floor((nm @ nm.T) * 1e6 + 0.5) / 1e6
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= tau
        return pd.DataFrame(
            {"ia": ids[iu[keep]].astype(np.int64),
             "ib": ids[ju[keep]].astype(np.int64)}
        )

    dup = m.groupBy("cluster_id").applyInPandas(_dup_pairs, "ia long, ib long")
    dropped = dup.groupBy(F.col("ib").alias(id_col)).agg(
        F.min("ia").alias("dup_of")
    )
    return (
        m.select(id_col, "cluster_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.when(F.col("dup_of").isNotNull(), "dropped_semantic")
            .otherwise("kept")
            .alias("verdict"),
            "dup_of",
        )
    )
