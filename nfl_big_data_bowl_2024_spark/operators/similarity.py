"""Similarity search over an embedding column (array<float>).

Dot products and norms run JVM-side via zip_with/aggregate in DOUBLE precision
(arrays are cast up front so results are bit-identical to a double-precision
oracle accumulating in the same element order).

  brute_force_topk    exact baseline: broadcast the query vector, score every
                      row, global top-k with deterministic tie-break.
  lsh_bucketed_pairs  scale path: sign-random-projection signatures bucket the
                      vectors; the candidate join is per-bucket instead of the
                      quadratic cross join; exact cosine re-ranks candidates.

At 100 TB the brute-force path is only for one-off queries (single broadcast +
one pass + a tree-reduced top-k); the LSH path is the ANN-index equivalent
(signatures are precomputable and bucketed joins co-locate candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localrel import local_df as _local_rel
from .scalars import checkpoint_counted


def dot_col(a, b) -> Column:
    """Sequential left-to-right double dot product of two array columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_col(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_col(a, b) / (F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b)))


def pair_cosine_udf():
    """Vectorized cosine over two array<double> columns (one numpy einsum
    per Arrow batch). HOF lambdas are interpreted PER ELEMENT, so
    ``cosine_col`` costs ~3*dim lambda evals per row — fine against one
    broadcast query vector, but the measured bottleneck on pair tables
    (millions of rows): this form is the documented vectorized-UDF
    exception used by the LSH re-rank and the bounded all-pairs dedup."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_cosine(ea, eb):
        ma = np.stack(ea.to_numpy())
        mb = np.stack(eb.to_numpy())
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.sqrt(
            np.einsum("ij,ij->i", ma, ma) * np.einsum("ij,ij->i", mb, mb)
        )
        return pd.Series(num / den)

    return _pair_cosine


def all_pairs_cosine(
    df: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    bound: int = 100_000,
) -> DataFrame:
    """Exact all-pairs cosine >= ``min_cosine`` over a BOUNDED vector set,
    as a blocked matrix product: the full (normalized) matrix is collected
    once (guarded by ``bound`` — the caller must have already capped the
    relation; this is the exact/audit path, sim_lsh/ivf are the scale
    paths) and broadcast, then ONE ``mapInPandas`` pass computes each Arrow
    batch's (batch x n) cosine block with a single BLAS matmul.

    Why not a join: the pair-level formulations move every vector across
    the executor/Python boundary once PER PAIR — n^2/2 x 2 x dim doubles
    of Arrow traffic (measured ~5 s for n=2000, dim=64 even with the
    einsum kernel; a broadcast-nested-loop + HOF cosine on a single-file
    scan was 65 s single-task). Here each vector crosses once per BLOCK:
    n x dim in, matches out."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    rows = df.select(id_col, vec_col).collect()
    if len(rows) > bound:
        raise ValueError(
            f"all_pairs_cosine is the bounded exact path: got {len(rows)} "
            f"vectors > bound={bound}; use lsh_bucketed_pairs / ivf_topk"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = sc.broadcast((ids, mn))

    def gen(batches):
        bids, bmat = bc.value
        for pdf in batches:
            a = np.stack(pdf[vec_col].to_numpy())
            an = a / np.linalg.norm(a, axis=1, keepdims=True)
            aids = pdf[id_col].to_numpy()
            c = an @ bmat.T
            mask = (c >= min_cosine) & (aids[:, None] < bids[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vid_a": aids[ii],
                    "vid_b": bids[jj],
                    "cosine": np.round(c[ii, jj], 4),
                }
            )

    spread = df.repartition(sc.defaultParallelism, F.col(id_col))
    return spread.mapInPandas(gen, "vid_a long, vid_b long, cosine double")


def brute_force_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every vector against the vector with id
    ``query_vec_id``. Cosine is rounded to 4dp BEFORE ranking so the ordering
    (and thus the returned set) is stable across engines; ties break on id."""
    v = df.select(
        id_col, "label", F.col(vec_col).cast("array<double>").alias("emb")
    )
    q = v.filter(F.col(id_col) == query_vec_id).select(F.col("emb").alias("qv"))
    scored = (
        v.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(cosine_col("emb", "qv"), 4).alias("cosine"),
        )
    )
    # orderBy+limit plans as TakeOrderedAndProject: each partition keeps its
    # local top-k, the driver merges k*partitions rows — no single-partition
    # global window, so this survives a 100x scale-up.
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: deterministic seeding + Lloyd refinement.

    Returns (centroids ndarray (n_centroids, dim), assigned DataFrame with a
    ``cluster`` column). Seeds are the ``n_centroids`` smallest-id vectors
    (deterministic — a production index would k-means++ on a sample);
    each refinement pass is one distributed assign (vectorized Arrow UDF,
    one matmul per batch) + one per-cluster mean (applyInPandas over at most
    n_centroids groups). The index is tiny by construction and lives on the
    driver / in closures — the 100 TB shape, where only assignments scale.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    v = df.select(id_col, F.col(vec_col).cast("array<double>").alias("emb"))
    sc = df.sparkSession.sparkContext
    v = v.repartition(sc.defaultParallelism, F.col(id_col))

    seeds = v.orderBy(id_col).limit(n_centroids).collect()
    centroids = np.stack([np.array(r["emb"]) for r in seeds])
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def _assigner(cents):
        @pandas_udf("int")
        def assign(embs):
            m = np.stack(embs.to_numpy())
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

        return assign

    assigned = v.withColumn("cluster", _assigner(centroids)("emb"))
    for _ in range(refine_iters):
        means = (
            assigned.groupBy("cluster")
            .applyInPandas(
                lambda pdf: pd.DataFrame(
                    {
                        "cluster": [int(pdf["cluster"].iloc[0])],
                        "centroid": [np.mean(np.stack(pdf["emb"].to_numpy()), axis=0).tolist()],
                    }
                ),
                schema="cluster int, centroid array<double>",
            )
            .collect()
        )
        for r in means:
            c = np.array(r["centroid"])
            centroids[r["cluster"]] = c / np.linalg.norm(c)
        assigned = v.withColumn("cluster", _assigner(centroids)("emb"))
    return centroids, assigned


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 25,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the query's ``nprobe`` nearest centroids,
    brute-force only within those inverted lists. With nprobe=n_centroids the
    result is EXACTLY brute_force_topk (asserted in tests); smaller nprobe
    trades recall for a 1/(n_centroids/nprobe) scan fraction — the standard
    ANN knob. Same output schema as brute_force_topk."""
    import numpy as np

    centroids, assigned = ivf_assign(df, n_centroids, 1, id_col, vec_col)
    q_emb = np.array(
        df.filter(F.col(id_col) == query_vec_id).select(vec_col).first()[0],
        dtype=np.float64,
    )
    qn = q_emb / np.linalg.norm(q_emb)
    probes = np.argsort(-(centroids @ qn))[:nprobe].tolist()

    labels = df.select(id_col, "label")
    cand = (
        assigned.filter(F.col("cluster").isin(probes))
        .filter(F.col(id_col) != query_vec_id)
        .join(labels, id_col)
    )
    q_arr = F.array(*[F.lit(float(x)) for x in q_emb])
    scored = cand.select(
        id_col, "label",
        F.round(cosine_col("emb", q_arr), 4).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _deterministic_plane(bit: int, dim: int) -> list[float]:
    """Pseudo-random hyperplane components from a fixed LCG — reproducible
    across sessions with no RNG state (Date/random are banned in this repo's
    workflow scripts and unnecessary here)."""
    vals = []
    x = bit * 2654435761 % (2**32)
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append(x / float(2**30) - 1.0)
    return vals


def lsh_bucketed_pairs(
    df: DataFrame,
    bands: int = 16,
    bits_per_band: int | str = 8,
    min_cosine: float = 0.7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH near-neighbor pairs with OR-amplification.

    Each band packs ``bits_per_band`` sign bits (bit = sign(<emb, plane>))
    into one small signature; two vectors are CANDIDATES if ANY band matches
    (OR over bands, AND within a band — same banding scheme as the MinHash
    path, operators/dedup.py:77-119). Candidates are de-duplicated, re-ranked
    by exact cosine, and filtered at ``min_cosine``.

    Operating point (b=16 bands, r=8 bits): with p = 1 - arccos(c)/pi per
    bit, pair recall 1 - (1 - p^r)^b is ~0.80 at cosine 0.7, ~0.995 at 0.9,
    ~1.0 for true near-duplicates (c >= 0.99) — while candidate volume per
    band drops by 2^r, i.e. ~n^2/256 per band instead of n^2/16 at the old
    (8, 4) point (measured 2x end-to-end on 2k vectors; the gap widens with
    n). At 100 TB the per-band bucket join replaces the quadratic cross
    join; hot buckets split via AQE skew-join.

    ``bits_per_band="auto"`` sizes r to the corpus so per-bucket occupancy
    stays ~constant (r = clamp(8..16, log2(n/16))): with FIXED buckets, a
    10x corpus means ~100x within-bucket pairs (measured scaling exponent
    1.08 at sf0.1->sf1, the only superlinear query in the suite); with auto
    bits the pair volume stays near-linear in n. The trade is deliberate:
    recall at the NEAR-DUP end (cosine >= 0.95) stays >= 0.99 across the
    auto range, while mid-similarity recall (0.7) degrades with r — at
    scale, threshold-0.7 search is ivf_topk's job, and dedup is this one's.

    Auto sizing needs n, but a dedicated ``df.count()`` is a full extra
    source scan BEFORE any real work (measured +22% on the sf0.1 headline).
    Instead, auto mode computes signatures at the MAX auto width (16 bits)
    in the one UDF pass that runs anyway, takes n from the eager
    checkpoint's materialized row count (a near-free job over cached
    blocks, n_rows/bands), and then MASKS each band signature down to the
    chosen r low bits JVM-side — bit j is sign(<emb, plane_{b*16+j}>), so
    the low-r mask IS an r-bit banding (over the fixed plane family
    indexed at stride 16). One source scan total, and the corpus-sizing
    job costs blocks-already-in-memory instead of a second pass.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    auto = bits_per_band == "auto"
    sig_bits = 16 if auto else int(bits_per_band)

    # All bands*sig_bits plane projections happen in ONE BLAS matmul per
    # Arrow batch: (batch x dim) @ (dim x n_planes) -> sign bits -> packed
    # band signatures. The JVM-expression alternative (aggregate/zip_with per
    # plane) is interpreted per array element — ~dim * n_planes lambda
    # evaluations per row — and measured ~50x slower; this is the documented
    # "vectorized Pandas UDF over mapInPandas when built-ins genuinely can't
    # express it efficiently" case.
    n_planes = bands * sig_bits
    planes = np.array(
        [_deterministic_plane(j, dim) for j in range(n_planes)], dtype=np.float64
    ).T  # (dim, n_planes)

    @pandas_udf("array<int>")
    def band_sigs(embs):  # scalar pandas UDF; no hints (PEP 563 strings break pyspark's parser)
        m = np.stack(embs.to_numpy())  # (n, dim)
        bits = (m @ planes) > 0  # (n, n_planes)
        sigs = np.zeros((m.shape[0], bands), dtype=np.int32)
        for b in range(bands):
            for r in range(sig_bits):
                sigs[:, b] |= bits[:, b * sig_bits + r].astype(np.int32) << r
        return pd.Series(list(sigs))

    sc = df.sparkSession.sparkContext
    v = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("emb"))
        .repartition(sc.defaultParallelism, F.col(id_col))
    )
    # Candidate generation runs over (id, band) rows ONLY — embeddings are
    # attached after the distinct, so the (potentially large) candidate-pair
    # shuffle moves two longs per row, not two dim-sized arrays.
    #
    # The banded table is eagerly checkpointed BEFORE the self-join: both
    # join branches would otherwise re-derive the projection-UDF subtree as
    # two CONCURRENT stages — double the UDF work, and the two stages
    # contend for the same Python worker pool (measured as multi-second
    # jitter at small SF). The checkpoint is tiny: n x bands rows of
    # (id, band_id, band_sig) — three fixed-width values per row.
    banded, n_banded = checkpoint_counted(
        v.select(
            id_col,
            F.posexplode(band_sigs("emb")).alias("band_id", "band_sig"),
        )
    )
    # Corpus size observed on the checkpoint job itself (posexplode emits
    # exactly `bands` rows per vector) — no second source scan, and since
    # r14 no separate count job over the cached blocks either.
    n_vectors = n_banded // bands
    if auto:
        bits_per_band = min(
            16, max(8, math.ceil(math.log2(max(n_vectors, 16) / 16)))
        )
        if bits_per_band < sig_bits:
            banded = banded.withColumn(
                "band_sig",
                F.col("band_sig").bitwiseAND(F.lit((1 << bits_per_band) - 1)),
            )
    a = banded.select(F.col(id_col).alias("vid_a"), "band_id", "band_sig")
    b = banded.select(F.col(id_col).alias("vid_b"), "band_id", "band_sig")
    # Explicit-count repartition on the dedup keys: candidate pairs are
    # byte-tiny but CPU-heavy downstream, and AQE's size-based coalescing
    # would funnel millions of pairs into 1-2 partitions. distinct() then
    # reuses this partitioning (no extra exchange). Eager checkpoint: the
    # pair ids (two longs per row) materialize here, so the re-rank below
    # reads these blocks and never re-runs the band join.
    candidates = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("vid_a") < F.col("vid_b"))
        .select("vid_a", "vid_b")
        .repartition(sc.defaultParallelism, "vid_a", "vid_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Exact cosine re-rank, vectorized: candidate volume is ~n x occupancy
    # (millions at scale), and a per-element HOF dot product is interpreted
    # — 64 lambda evals per pair dominated the query (measured 23 s of a
    # 39 s run at the generated sf10). One numpy einsum per Arrow batch
    # computes every pair's cosine instead (~3 s). Norms fold into the
    # same kernel; the pair rows are re-spread first because they are
    # byte-tiny but CPU-heavy, and AQE's size-based coalescing would
    # funnel them into 1-2 tasks.
    pair_cosine = pair_cosine_udf()

    # Attaching dim-sized arrays to MILLIONS of pair rows through two
    # shuffle joins moves pairs x ~0.5 KB x 2 of exchange — measured as the
    # actual re-rank bottleneck at the generated sf10 (the cosine math is
    # ~3 s once vectorized). While the embedding table is the genuinely
    # small side (~0.5 KB x n), BROADCAST it and keep the pair rows where
    # they are. The bound is in BYTES (n x (dim doubles + overhead)), not
    # vectors: a broadcast collect counts against
    # spark.driver.maxResultSize, and 2M x 64-dim rows is ~1.1 GiB — over
    # the 1 GiB default (the same byte-blind-bound class that killed the
    # sf10 MinHash verify, operators/dedup.py). Past the cap the attach
    # is HINTED to sort-merge, because Catalyst's ArrayType size estimate
    # (~one element per row) would otherwise let the static planner
    # broadcast the full array table on its own.
    vn = df.select(id_col, F.col(vec_col).cast("array<double>").alias("emb"))
    if n_vectors * (dim * 8 + 48) <= 256 * 1024 * 1024:
        vn = F.broadcast(vn)
    else:
        vn = vn.hint("merge")
    ea = vn.select(F.col(id_col).alias("vid_a"), F.col("emb").alias("emb_a"))
    eb = vn.select(F.col(id_col).alias("vid_b"), F.col("emb").alias("emb_b"))
    return (
        candidates.repartition(sc.defaultParallelism, "vid_a", "vid_b")
        .join(ea, "vid_a")
        .join(eb, "vid_b")
        .select(
            "vid_a",
            "vid_b",
            F.round(pair_cosine("emb_a", "emb_b"), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def arrow_sq_norms(df, id_col: str, vec_col: str, keep: list[str]):
    """Exact integer squared norms via ``mapInArrow`` — the RecordBatch-level
    custom-compute modality (lower-level than mapInPandas: no pandas
    conversion, zero-copy Arrow buffers straight into numpy).

    Each component is quantized to micro-units with the engine's half-up
    idiom (``floor(x*1e6 + 0.5)`` as int64) and the squared norm accumulates
    in EXACT integer arithmetic via a cumulative-sum/offset-difference over
    the list array's flattened values buffer — one vectorized pass per
    batch, no per-row Python, and a result that is bit-identical across
    partitionings, engines, and summation orders (the float formulation
    would differ from DuckDB at ~1e-16 and round unstably). Map-only: the
    plan is a single MapInArrow node over the scan.
    """
    import numpy as np
    import pyarrow as pa

    out_schema = ", ".join(
        [f"{id_col} bigint"]
        + [f"{k} bigint" for k in keep]
        + ["sum_sq bigint"]
    )

    def kernel(batches):
        for b in batches:
            col = b.column(vec_col)
            vals = np.asarray(col.values, dtype="float64")
            offs = np.asarray(col.offsets, dtype="int64")
            q = np.floor(vals * 1_000_000 + 0.5).astype("int64")
            sq = q * q
            cums = np.concatenate([[0], np.cumsum(sq)])
            sums = cums[offs[1:]] - cums[offs[:-1]]
            # passthrough columns cast to the declared int64 (e.g. an
            # int32 label) — the Arrow vector type must match the schema
            cols = {id_col: b.column(id_col).cast(pa.int64())}
            for k in keep:
                cols[k] = b.column(k).cast(pa.int64())
            cols["sum_sq"] = pa.array(sums, type=pa.int64())
            yield pa.record_batch(cols)

    return df.select(id_col, *keep, vec_col).mapInArrow(kernel, out_schema)


def _collect_codebook(cent: DataFrame) -> dict[int, list[tuple[int, list[int]]]]:
    """Materialize a PQ codebook DataFrame (sub, cid, cv) to the driver.

    Bounded by contract: m x n_cent rows of sub_w longs (16x16x4 = 8 KiB
    at the registered operating point) — the same bounded-model-collect
    class as the k-means centroid collects in operators/clustering.py.
    Returned as {sub: [(cid, cv), ...] sorted by cid} so downstream argmin
    tie-breaks to the LOWEST centroid id exactly like min(struct(d, cid)).
    """
    by_sub: dict[int, list[tuple[int, list[int]]]] = {}
    for r in cent.select("sub", "cid", "cv").collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cid"]), [int(v) for v in r["cv"]])
        )
    for v in by_sub.values():
        v.sort()
    return by_sub


def _pq_assign_arrow(
    subs: DataFrame,
    id_col: str,
    sub_w: int,
    codebook: dict[int, list[tuple[int, list[int]]]],
) -> DataFrame:
    """PQ code assignment as a ``mapInArrow`` kernel — the production path
    (round-8 verdict item 3: the interpreted HOF form spent 93 s on the
    one-shot sf10 index build; per-element Catalyst lambdas evaluate
    3 x sub_w x n_cent interpreted ops per row).

    One numpy matmul per Arrow batch computes every (row, centroid)
    squared-L2 in EXACT int64 (components are 1e6-scaled ints: products
    <= ~1e14, sums far below 2^63) and ``argmin`` over the cid-sorted
    centroid matrix reproduces the HOF/SQL ``min(struct(dist, cid))``
    tie-break bit-for-bit — the ||sv||^2 term is constant per row and
    drops out of the argmin, everything else is the same integer. The
    HOF form stays available as the oracle twin (``assign_mode="hof"``)
    with code-set equality asserted in tests. Map-only: the plan is a
    single MapInArrow over the subvector rows; the codebook ships in the
    task closure (KB-sized by contract).
    """
    import numpy as np
    import pyarrow as pa

    tables = {
        s: (
            np.array([c for c, _ in v], dtype=np.int64),
            np.array([cv for _, cv in v], dtype=np.int64),
        )
        for s, v in codebook.items()
    }
    out_schema = f"{id_col} bigint, sub int, sv array<bigint>, cid int"

    def kernel(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            sub_np = b.column("sub").to_numpy(zero_copy_only=False)
            sv = b.column("sv")
            vals = np.asarray(sv.values, dtype="int64")
            offs = np.asarray(sv.offsets, dtype="int64")
            if not ((offs[1:] - offs[:-1]) == sub_w).all():
                raise ValueError("ragged PQ subvector; dim must be m*sub_w")
            # gather through offsets (handles sliced batches where the
            # values buffer does not start at offset 0)
            x = vals[offs[:-1, None] + np.arange(sub_w)[None, :]]
            cids = np.empty(n, dtype=np.int32)
            for s in np.unique(sub_np):
                cid_arr, cv = tables[int(s)]
                mask = sub_np == s
                d = -2 * (x[mask] @ cv.T) + (cv * cv).sum(axis=1)[None, :]
                cids[mask] = cid_arr[np.argmin(d, axis=1)]
            yield pa.record_batch(
                {
                    id_col: b.column(id_col).cast(pa.int64()),
                    "sub": b.column("sub").cast(pa.int32()),
                    "sv": sv.cast(pa.list_(pa.int64())),
                    "cid": pa.array(cids, type=pa.int32()),
                }
            )

    return subs.select(id_col, "sub", "sv").mapInArrow(kernel, out_schema)


def pq_adc_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_id: int = 0,
    k: int = 25,
    m: int = 16,
    n_cent: int = 16,
    dim: int = 64,
    lloyd_iters: int = 2,
    assign_mode: str = "arrow",
) -> DataFrame:
    """Product-quantization ANN at the oracle-checkable operating point:
    Jegou et al. 2011's PQ with asymmetric distance computation (ADC),
    trained by a FIXED, UNROLLED number of integer-arithmetic Lloyd
    rounds from order-statistic seeds, so the whole structure — seeds,
    refinement, codes, ADC — replays bit-exactly as SQL CTEs (the PQ
    analog of sim_ivf_probeall_topk's probe-all twin).

    Structure: vectors are fixed-pointed to integers (floor(x*1e6+0.5),
    exact on both engines), split into ``m`` subspaces of dim/m
    components; seed centroids are the vectors at ranks
    (i+1)*n/(n_cent+1) of the (subspace-norm, id) order;
    ``lloyd_iters`` refinement rounds reassign (exact integer squared-
    L2, ties to the lowest centroid id) and re-center on the
    component-wise INTEGER mean floor(sum/count); every vector encodes
    against the final codebook; the query's ADC table (n_cent x m
    integer distances) is broadcast and the approximate distance is the
    exact integer SUM of table lookups. All arithmetic is
    integer-valued end-to-end (dot products of 1e6-scaled ints stay
    below 2^53, so even a double-typed engine computes them exactly) —
    no float enters any ordering.

    Scale shape: one narrow shuffle ranks each subspace (partitioned BY
    SUBSPACE — never a single-partition window); assignment is the
    PRODUCTION ``mapInArrow`` kernel (``assign_mode="arrow"``, default):
    the KB-sized codebook is collected per Lloyd round (bounded-model
    collect, flattening the iteration lineage) and one numpy int64
    matmul per batch computes every squared-L2 — map-only, no join, no
    interpreted per-element lambdas. ``assign_mode="hof"`` keeps the
    pure-Catalyst broadcast-join + min(struct) argmin as the oracle twin
    (bit-identical: same integers, same lowest-cid ties; equality
    asserted in tests/test_dedup_similarity.py). ADC is a broadcast
    lookup + integer sum; the top-k is TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    sub_w = dim // m
    ints = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * 1_000_000 + 0.5).cast("long"),
        ).alias("a"),
    )
    subs = ints.select(
        id_col,
        "a",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        id_col,
        "sub",
        F.expr(f"slice(a, sub * {sub_w} + 1, {sub_w})").alias("sv"),
    )

    def idot(a: str, b: str):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    ranked = subs.select(
        id_col,
        "sub",
        "sv",
        F.row_number()
        .over(
            Window.partitionBy("sub").orderBy(
                idot("sv", "sv").asc(), F.col(id_col).asc()
            )
        )
        .alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("sub")).alias("n"),
    )
    cent = (
        ranked.select("sub", "sv", "rk", "n")
        .join(
            F.broadcast(
                ranked.sparkSession.range(n_cent).select(
                    F.col("id").cast("int").alias("cid")
                )
            ),
            F.expr(f"rk = ((cid + 1) * n) div {n_cent + 1}"),
        )
        .select("sub", "cid", F.col("sv").alias("cv"))
    )
    dist = (
        idot("sv", "sv")
        - 2 * idot("sv", "cv")
        + idot("cv", "cv")
    )

    def assign_hof(centroids: DataFrame) -> DataFrame:
        return (
            subs.join(F.broadcast(centroids), "sub")
            .select(
                id_col,
                "sub",
                "sv",
                F.struct(
                    dist.alias("d"), F.col("cid").alias("cid")
                ).alias("dc"),
            )
            .groupBy(id_col, "sub", "sv")
            .agg(F.min("dc").alias("best"))
            .select(id_col, "sub", "sv", F.col("best.cid").alias("cid"))
        )

    spark = df.sparkSession

    def rebuild_cent(codebook) -> DataFrame:
        # flatten the per-round lineage: the collected codebook becomes a
        # fresh local relation (m x n_cent rows), so round i+1's plan does
        # not re-run round i's assignment
        rows = [
            (s, cid, cv) for s, v in codebook.items() for cid, cv in v
        ]
        return _local_rel(
            spark, rows, "sub int, cid int, cv array<bigint>"
        )

    def assign(centroids: DataFrame) -> DataFrame:
        if assign_mode == "hof":
            return assign_hof(centroids)
        return _pq_assign_arrow(
            subs, id_col, sub_w, _collect_codebook(centroids)
        )

    # Lloyd refinement with INTEGER centroids, unrolled a fixed number of
    # rounds so a SQL oracle replays it CTE-for-CTE: the new centroid is
    # floor(component_sum / count) per component. The floor is computed
    # in double — exact here, because the sums are 1e6-scaled ints below
    # 2^53 and a non-integer quotient's fractional part is >= 1/count,
    # orders of magnitude above the division's ~2e-16 relative error, so
    # the floor can never land on the wrong side of an integer. (A
    # truncating integer `div` would disagree with SQL floor division on
    # negative sums, which embedding components produce freely.)
    for _ in range(lloyd_iters):
        asg = assign(cent)
        cent = asg.groupBy("sub", "cid").agg(
            F.array(
                *[
                    F.floor(
                        F.sum(F.element_at("sv", i + 1)) * 1.0
                        / F.count(F.lit(1))
                    ).cast("long")
                    for i in range(sub_w)
                ]
            ).alias("cv")
        )
    if assign_mode != "hof":
        # one bounded collect serves both the final assignment kernel and
        # the ADC table below (cent becomes a flat local relation)
        final_cb = _collect_codebook(cent)
        cent = rebuild_cent(final_cb)
        codes = _pq_assign_arrow(subs, id_col, sub_w, final_cb).select(
            id_col, "sub", "cid"
        )
    else:
        codes = assign(cent).select(id_col, "sub", "cid")
    qsub = subs.filter(F.col(id_col) == query_vec_id).select(
        "sub", F.col("sv").alias("qv")
    )
    qdist = (
        idot("qv", "qv")
        - 2 * idot("qv", "cv")
        + idot("cv", "cv")
    )
    dt = (
        cent.join(F.broadcast(qsub), "sub")
        .select("sub", "cid", qdist.cast("long").alias("qd"))
    )
    return (
        codes.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(dt), ["sub", "cid"])
        .groupBy(id_col)
        .agg(F.sum("qd").cast("long").alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )


def mmr_diversified_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_id: int = 0,
    pool_k: int = 25,
    k: int = 5,
    lambda_num: int = 7,
    lambda_den_minus: int = 3,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversified
    retrieval: greedily pick ``k`` results maximizing
    ``7*relevance - 3*max_similarity_to_already_selected`` (lambda = 0.7
    as an exact integer 7/3 split) — the de-dup-aware retrieval shape a
    training-data pipeline uses to avoid filling a context window with
    near-identical passages.

    Integer-exact end-to-end: vectors fixed-pointed to 1e6-scaled longs
    (the PQ idiom), relevance and pairwise similarity are integer dot
    products (<= 64 * (1e6-scale)^2 ~ 1.6e15, below 2^53, so DuckDB's
    double-typed list_dot_product replays them exactly), ties break to
    the lowest vec_id. The SQL oracle unrolls the k greedy steps as CTEs.

    Scale shape: the DISTRIBUTED stage is relevance scoring + top-``pool_k``
    (TakeOrderedAndProject over the corpus, the only pass that touches all
    n vectors); the greedy re-rank runs over the bounded pool via ``k``
    limit-1 driver steps (the BPE-train bounded-driver-state class: one
    (id, score) row to the driver per step, pool stays a 25-row broadcast
    relation). MMR is inherently sequential in k — the greedy argmax
    depends on every prior pick — so k tiny jobs over a KB-sized pool IS
    the distributed formulation; only pool selection scales with data.
    """
    spark = df.sparkSession
    ints = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * 1_000_000 + 0.5).cast("long"),
        ).alias("a"),
    )

    def idot(a: str, b: str):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    q = F.broadcast(
        ints.filter(F.col(id_col) == query_vec_id).select(
            F.col("a").alias("qa")
        )
    )
    pool = (
        ints.filter(F.col(id_col) != query_vec_id)
        .crossJoin(q)
        .select(id_col, idot("a", "qa").alias("rel"), "a")
        .orderBy(F.col("rel").desc(), F.col(id_col).asc())
        .limit(pool_k)
        .localCheckpoint(eager=True)  # one corpus pass; greedy reuses it
    )
    picks: list[tuple[int, int, int]] = []
    sel_ids: list[int] = []
    for step in range(1, k + 1):
        if not sel_ids:
            cand = pool.select(
                id_col, (F.lit(lambda_num) * F.col("rel")).alias("score")
            )
        else:
            sel_vecs = F.broadcast(
                pool.filter(F.col(id_col).isin(sel_ids)).select(
                    F.col("a").alias("sa")
                )
            )
            cand = (
                pool.filter(~F.col(id_col).isin(sel_ids))
                .crossJoin(sel_vecs)
                .groupBy(id_col, "rel")
                .agg(F.max(idot("a", "sa")).alias("ms"))
                .select(
                    id_col,
                    (
                        F.lit(lambda_num) * F.col("rel")
                        - F.lit(lambda_den_minus) * F.col("ms")
                    ).alias("score"),
                )
            )
        w = cand.orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        ).first()
        picks.append((step, int(w[id_col]), int(w["score"])))
        sel_ids.append(int(w[id_col]))
    return _local_rel(
        spark, picks, f"pick int, {id_col} long, mmr_score long"
    )
