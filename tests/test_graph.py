"""Connected-components operator: known topologies + pure-Python union-find
cross-check on random graphs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nfl_big_data_bowl_2024_spark.operators.graph import connected_components


def _components(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    rows = connected_components(edges).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_cycle_and_isolated_pair(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple rounds), cycle 10-11-12-10,
    # pair 20-21, self-loop 30.
    got = _components(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21), (30, 30)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30,
    }


def test_long_chain_converges(spark):
    # Diameter 29: exercises the multi-round propagation + early stop.
    got = _components(spark, [(i, i + 1) for i in range(30)])
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    edge_list = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]

    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent[find(a)] = find(b)
    nodes = {v for e in edge_list for v in e}
    # Canonical label = min node id in the component.
    roots = {}
    for v in sorted(nodes):
        roots.setdefault(find(v), v)
    expect = {v: roots[find(v)] for v in nodes}

    got = _components(spark, edge_list)
    assert got == expect


def test_property_random_graphs_match_union_find(spark):
    """Hypothesis: on arbitrary small graphs (self-loops, duplicate edges,
    disconnected nodes) the distributed CC labels equal union-find's
    min-id-per-component. Spark-session-bound, so examples are batched into
    one deadline-free run."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge_st = st.tuples(
        st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=25)
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(edge_st, min_size=1, max_size=30))
    def check(edge_list):
        parent = list(range(26))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            parent[find(a)] = find(b)
        nodes = {v for e in edge_list for v in e}
        roots = {}
        for v in sorted(nodes):
            roots.setdefault(find(v), v)
        expect = {v: roots[find(v)] for v in nodes}
        assert _components(spark, edge_list) == expect

    check()


def test_pagerank_integer_matches_hand_replay(spark):
    """pagerank_integer on a 3-node star (A<->B, A<->C): every iteration is
    integer-exact, so the expected ranks are computed by a 5-line Python
    replay of the defined arithmetic — any deviation (float creep, wrong
    div semantics, missed damping) breaks equality."""
    from nfl_big_data_bowl_2024_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(0, 2), (2, 0), (0, 4), (4, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(edges, iters=3).collect()
    }

    deg = {0: 2, 2: 1, 4: 1}
    r = {n: 1_000_000 // 3 for n in deg}
    base = 15 * 1_000_000 // (100 * 3)
    for _ in range(3):
        contrib = {0: r[2] // deg[2] + r[4] // deg[4], 2: r[0] // deg[0], 4: r[0] // deg[0]}
        r = {n: base + (85 * contrib[n]) // 100 for n in deg}
    assert got == r
    # the hub holds more mass than the leaves, and leaves tie exactly
    assert got[0] > got[2] == got[4]


def test_triangle_counts_known_topologies(spark):
    from nfl_big_data_bowl_2024_spark.operators.graph import triangle_counts

    # K4 on 1-4 (every node in C(3,2)=3 triangles), square 10-13 (none),
    # star at 20 (none), triangle 30-32 with pendant 33, plus a duplicate
    # and a reversed edge to exercise canonicalization.
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (10, 11), (11, 12), (12, 13), (13, 10),
            (20, 21), (20, 22), (20, 23), (20, 24),
            (30, 31), (31, 32), (32, 30), (32, 33),
            (2, 1), (30, 31),  # reversed + duplicate
        ],
        "src: long, dst: long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 30: 1, 31: 1, 32: 1}


def test_triangle_counts_bruteforce_random(spark):
    import itertools
    import random

    from nfl_big_data_bowl_2024_spark.operators.graph import triangle_counts

    rng = random.Random(11)
    edge_list = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(25), rng.randrange(25)) for _ in range(80)
        )
        if a != b
    }
    adj = set(edge_list)
    expect: dict[int, int] = {}
    for x, y, z in itertools.combinations(range(25), 3):
        if (x, y) in adj and (x, z) in adj and (y, z) in adj:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    edges = spark.createDataFrame(sorted(edge_list), "src: long, dst: long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == expect


def _hops(spark, edge_list, seed_nodes, max_hops=3):
    from nfl_big_data_bowl_2024_spark.operators.graph import bfs_min_hops

    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    seeds = spark.createDataFrame([(s,) for s in seed_nodes], "node: long")
    rows = bfs_min_hops(edges, seeds, max_hops=max_hops).collect()
    return {r["node"]: r["hops"] for r in rows}


def test_bfs_known_topology(spark):
    # Directed chain 1->2->3->4->5, branch 2->10, back-edge 4->1,
    # unreachable island 20->21.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10), (4, 1), (20, 21)]
    got = _hops(spark, edges, [1], max_hops=3)
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}


def test_bfs_multi_source_takes_minimum(spark):
    # Two seeds converging: node 3 is 2 hops from seed 1 but 1 hop from
    # seed 9; min wins. Seed nodes themselves stay at 0 even when reached
    # again via the cycle.
    edges = [(1, 2), (2, 3), (9, 3), (3, 1)]
    got = _hops(spark, edges, [1, 9], max_hops=4)
    assert got == {1: 0, 9: 0, 2: 1, 3: 1}


def test_bfs_early_stop_on_empty_frontier(spark):
    # Exhausts reachability in 1 hop; the loop must stop rather than
    # spin to max_hops.
    got = _hops(spark, [(1, 2)], [1], max_hops=25)
    assert got == {1: 0, 2: 1}


def test_bfs_matches_python_bfs_on_random_graph(spark):
    import collections
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    seeds = [0, 1]
    adj = collections.defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for k in range(1, 4):
        nxt = set()
        for u in frontier:
            nxt |= adj[u]
        nxt -= dist.keys()
        for v in nxt:
            dist[v] = k
        frontier = list(nxt)
    assert _hops(spark, edges, seeds, max_hops=3) == dist


def _core(spark, edge_list, k, rounds=3):
    from nfl_big_data_bowl_2024_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    sym = edges.union(edges.selectExpr("dst as src", "src as dst"))
    return {r["node"]: r["deg"] for r in kcore_peel(sym, k=k, rounds=rounds).collect()}


def test_kcore_triangle_with_pendant(spark):
    # Triangle 1-2-3 plus pendant 3-4: the 2-core is the triangle; node 4
    # (degree 1) peels in round 1 and node 3's degree drops to 2.
    got = _core(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_fully_peels(spark):
    # A chain has no 2-core: endpoints peel first, then the chain unravels
    # inward one round per layer — 3 rounds clear a 6-node chain.
    got = _core(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], k=2)
    assert got == {}


def test_kcore_fixed_rounds_is_superset_of_fixpoint(spark):
    # A 10-node chain needs 5 peel rounds to empty; at rounds=3 the defined
    # semantics keep the inner 4 nodes (a SUPERSET of the true empty
    # 2-core), each reporting degree from the surviving edge set.
    edges = [(i, i + 1) for i in range(1, 10)]
    got = _core(spark, edges, k=2, rounds=3)
    assert set(got) == {4, 5, 6, 7}
    got5 = _core(spark, edges, k=2, rounds=5)
    assert got5 == {}


def test_label_propagation_mode_hand_graph(spark):
    """Two 3-cliques joined by one bridge edge: after 2 synchronous
    mode rounds every member of each triangle carries its clique's
    minimum id; the deterministic tie rule (count desc, label asc) is
    what the hand-computation exercises."""
    from nfl_big_data_bowl_2024_spark.operators.graph import (
        label_propagation_mode,
    )

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    und = tri1 + tri2 + bridge
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation_mode(edges, iters=2).collect()
    }
    # Round 1: all neighbor counts are 1, so the tie rule gives every
    # node its min neighbor label: {1:2, 2:1, 3:1, 10:3, 11:10, 12:10}.
    # Round 2 (hand-traced over those labels):
    #   1: nbrs {2->1, 3->1}            -> 1 (count 2)
    #   2: nbrs {1->2, 3->1}   tie      -> 1 (lowest label)
    #   3: nbrs {1->2, 2->1, 10->3} tie -> 1
    #   10: nbrs {3->1, 11->10, 12->10} -> 10 (count 2)
    #   11: nbrs {10->3, 12->10}  tie   -> 3
    #   12: nbrs {10->3, 11->10}  tie   -> 3
    assert set(got) == {1, 2, 3, 10, 11, 12}
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[10] == 10 and got[11] == 3 and got[12] == 3


def test_label_propagation_isolated_node_keeps_self_label(spark):
    from nfl_big_data_bowl_2024_spark.operators.graph import (
        label_propagation_mode,
    )

    # node 7 only EMITS (no in-edges): it must survive with its own label
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (7, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation_mode(edges, iters=2).collect()
    }
    assert got[7] == 7


def test_memory_discipline_helpers(spark):
    """_edges_on_disk must persist DISK_ONLY (never pinning the in-memory
    storage pool) and report the exact count; _exchange_width must stay
    at defaultParallelism for small inputs and scale ~1M rows/task."""
    from pyspark.storagelevel import StorageLevel

    from nfl_big_data_bowl_2024_spark.operators.graph import (
        _edges_on_disk,
        _exchange_width,
    )

    e, n = _edges_on_disk(
        spark.range(1000).selectExpr("id AS src", "id + 1 AS dst")
    )
    try:
        assert n == 1000
        assert e.storageLevel == StorageLevel.DISK_ONLY
    finally:
        e.unpersist()
    sc = spark.sparkContext
    assert _exchange_width(sc, 1_000) == sc.defaultParallelism
    assert _exchange_width(sc, 250_000_000) == 251


def test_bellman_ford_bounded_on_known_graph(spark):
    """Hand-checkable weighted graph: the bounded Bellman-Ford must return
    min path cost over <= rounds edges, including the case where a longer
    (more edges) path is cheaper and a node beyond the round budget keeps
    the best within-budget cost."""
    from pyspark.sql import functions as F

    from nfl_big_data_bowl_2024_spark.operators.graph import bellman_ford_bounded

    #   0 -5-> 1 -1-> 2 -1-> 3
    #   0 ----------10-----> 3        (direct but expensive)
    #   3 -1-> 4
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 3, 10), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))

    got3 = {
        r["node"]: r["cost"]
        for r in bellman_ford_bounded(edges, seeds, rounds=3).collect()
    }
    # within 3 edges: 0->1->2->3 costs 7 (beats direct 10); 4 needs 4 edges
    # via the cheap path, so its best <=3-edge cost is 10+1=11
    assert got3 == {0: 0, 1: 5, 2: 6, 3: 7, 4: 11}

    got4 = {
        r["node"]: r["cost"]
        for r in bellman_ford_bounded(edges, seeds, rounds=4).collect()
    }
    assert got4[4] == 8  # cheap path reaches 4 within the 4-edge budget


def test_ppr_hand_replay_and_broadcast_seed_plan(spark):
    """Personalized PageRank: (a) exact integer hand-replay on a small
    graph, (b) the round-8 verdict item-4 plan fix — every seed-restart
    join in one iteration's pre-checkpoint plan must broadcast the seed
    side (the old FULL OUTER broadcast hint was unsupported: Spark logged
    a HintErrorLogger WARN and sort-merged both sides, shuffling the
    frontier-sized contrib relation every round)."""
    from nfl_big_data_bowl_2024_spark.operators.graph import (
        _ppr_step,
        pagerank_personalized_integer,
    )

    random.seed(9)
    edge_list = list(
        {(random.randrange(30), random.randrange(30)) for _ in range(120)}
    )
    edge_list = [(a, b) for a, b in edge_list if a != b]
    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "node: long")

    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_personalized_integer(
            edges, seeds, iters=3, damping_pct=85
        ).collect()
    }

    # pure-python integer replay (positive values: // == SQL div)
    outdeg: dict[int, int] = {}
    for a, _ in edge_list:
        outdeg[a] = outdeg.get(a, 0) + 1
    seed_ids = [s for s in (1, 2, 3) if s in outdeg]
    n_seeds = len(seed_ids)
    base = (100 - 85) * 1_000_000 // (100 * n_seeds)
    r = {s: 1_000_000 // n_seeds for s in seed_ids}
    for _ in range(3):
        contrib: dict[int, int] = {}
        for a, b in edge_list:
            if a in r:
                contrib[b] = contrib.get(b, 0) + r[a] // outdeg[a]
        nxt = {}
        for node, s in contrib.items():
            nxt[node] = (base if node in seed_ids else 0) + (85 * s) // 100
        for s in seed_ids:
            if s not in contrib:
                nxt[s] = base
        r = nxt
    assert got == r

    # plan audit on the pre-checkpoint step: seed joins broadcast, and no
    # sort-merge join anywhere (the old full-outer fallback)
    from pyspark.sql.functions import broadcast as _b

    ed = edges.join(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    )
    seed_base = seeds.select("node", F.lit(base).cast("long").alias("b"))
    rv = seeds.select(
        "node", F.lit(1_000_000 // 3).cast("long").alias("r")
    )
    step = _ppr_step(ed, rv, seed_base, width=4, damping_pct=85)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
