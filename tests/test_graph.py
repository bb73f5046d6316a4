"""Known-answer tests for the graph family (copurchase_edges,
degrees, triangle_count, pagerank) on tiny hand-built graphs; the
sf0.01 value-check against DuckDB runs in tests/test_contract_extras.py."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    graph as G,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, weight int"
    )


def test_copurchase_edges_ladder(spark):
    li = spark.createDataFrame(
        [
            # order 1: parts 10, 20, 30 (part 10 twice → distinct collapses)
            (1, 10), (1, 10), (1, 20), (1, 30),
            # order 2: parts 10, 20
            (2, 10), (2, 20),
        ],
        "l_orderkey long, l_partkey long",
    )
    got = {(r.src, r.dst): r.weight for r in G.copurchase_edges(li).collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
    # min_weight prunes; the per-order cap bounds the pair blowup
    assert {(r.src, r.dst) for r in G.copurchase_edges(li, min_weight=2).collect()} == {(10, 20)}
    capped = G.copurchase_edges(li, max_items_per_order=2).collect()
    # cap=2 keeps items (10,20) per order → only that pair survives
    assert {(r.src, r.dst): r.weight for r in capped} == {(10, 20): 2}


def test_degree_and_histogram(spark):
    # path 1-2-3 plus isolated edge 4-5
    e = _edges(spark, [(1, 2), (2, 3), (4, 5)])
    deg = {r.node: r.degree for r in G.node_degrees(e).collect()}
    assert deg == {1: 1, 2: 2, 3: 1, 4: 1, 5: 1}
    hist = {r.degree: r.n_nodes for r in G.degree_histogram(e).collect()}
    assert hist == {1: 4, 2: 1}


def test_triangle_count_exact(spark):
    # K4 has 4 triangles; appending a pendant edge adds none
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert G.triangle_count(_edges(spark, k4)).collect()[0].n_triangles == 4
    assert (
        G.triangle_count(_edges(spark, k4 + [(4, 9)])).collect()[0].n_triangles == 4
    )
    assert G.triangle_count(_edges(spark, [(1, 2), (2, 3)])).collect()[0].n_triangles == 0


def _ref_pagerank(pairs, iters, d=0.85):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(r[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1 - d) / n + d * s
        r = nxt
    return r


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_reference(spark, iters):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)]
    got = {r.node: r.rank for r in G.pagerank(_edges(spark, pairs), iters=iters).collect()}
    want = _ref_pagerank(pairs, iters)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_regular_graph(spark):
    # triangle (2-regular): uniform ranks are a fixed point
    got = {r.node: r.rank for r in
           G.pagerank(_edges(spark, [(1, 2), (2, 3), (1, 3)]), iters=4).collect()}
    for v in (1, 2, 3):
        assert abs(got[v] - 1.0 / 3) < 1e-12


def test_pagerank_empty(spark):
    e = spark.createDataFrame([], "src long, dst long, weight int")
    assert G.pagerank(e).count() == 0


def _ref_pagerank_directed(pairs, iters, d=0.85):
    # dangling-mass formulation: sinks' rank is spread uniformly
    nodes = sorted({v for e in pairs for v in e})
    out = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dang / n for v in nodes}
        for u, dsts in out.items():
            for b in dsts:
                nxt[b] += d * r[u] / len(dsts)
        r = nxt
    return r


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_directed_sinks_and_dangling_mass(spark, iters):
    # node 4 is a pure sink (only in-edges): it must appear in the
    # output, and its mass must be redistributed, so ranks sum to 1
    pairs = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)]
    got = {r.node: r.rank for r in
           G.pagerank(_edges(spark, pairs), iters=iters, directed=True).collect()}
    want = _ref_pagerank_directed(pairs, iters)
    assert set(got) == {1, 2, 3, 4}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_count_degree_orientation_parity(spark):
    # same counts under id- and degree-orientation, including a hub
    # (star+rim) shape where the orders differ materially
    cases = [
        [(1, 2), (2, 3), (1, 3)],                       # one triangle
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)],       # two triangles
        # hub 1 connected to 2..6, rim edges close some triangles
        [(1, i) for i in range(2, 7)] + [(2, 3), (4, 5), (5, 6)],
    ]
    for pairs in cases:
        a = G.triangle_count(_edges(spark, pairs)).collect()[0].n_triangles
        b = G.triangle_count(_edges(spark, pairs), orient="degree").collect()[0].n_triangles
        assert a == b, pairs


def test_association_rules_hand_computed(spark):
    # orders: {10,20} x2, {10,30} x1, {10} alone x1 -> N=4 orders
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30), (4, 10)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r.src, r.dst): r for r in
           G.association_rules(li, min_weight=1).collect()}
    r = got[(10, 20)]
    assert r.n_co == 2
    assert r.support == pytest.approx(2 / 4)
    assert r.confidence == pytest.approx(2 / 4)   # 10 appears in 4 orders
    assert r.lift == pytest.approx((2 / 4) * 4 / 2)  # P(20)=2/4
    r2 = got[(20, 10)]
    assert r2.confidence == pytest.approx(1.0)    # every 20-order has 10
    assert r2.lift == pytest.approx(1.0)          # P(10)=1
    # min_weight prunes both directions
    assert (30, 10) in got and (10, 30) in got
    assert all(k in got for k in [(10, 20), (20, 10), (10, 30), (30, 10)])
    assert len(got) == 4


def test_connected_components_two_islands(spark):
    # island {1,2,3}, island {7,9}, isolated-by-edge {4,5}
    e = _edges(spark, [(1, 2), (2, 3), (7, 9), (4, 5)])
    got = {r.node: r.component for r in G.connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 4: 4, 5: 4}


def test_pagerank_weighted_follows_heavy_edges(spark):
    # star: hub 1 with heavy edge to 2, light to 3 -> rank(2) > rank(3);
    # unweighted treats them equally
    e = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1)], "src long, dst long, weight int"
    )
    got = {r.node: r.rank for r in
           G.pagerank(e, iters=4, weight_col="weight").collect()}
    assert got[2] > got[3]
    assert abs(sum(got.values()) - 1.0) < 1e-9
    flat = {r.node: r.rank for r in G.pagerank(e, iters=4).collect()}
    assert flat[2] == pytest.approx(flat[3])
    # python reference for one weighted iteration on the triangle
    e2 = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 1), (1, 3, 1)], "src long, dst long, weight int"
    )
    got2 = {r.node: r.rank for r in
            G.pagerank(e2, iters=1, weight_col="weight").collect()}
    # symmetrized weighted degrees: W1=4, W2=4, W3=2; r0=1/3
    d = 0.85
    base = (1 - d) / 3
    r1 = base + d * ((1 / 3) * (3 / 4) + (1 / 3) * (1 / 2))
    r2 = base + d * ((1 / 3) * (3 / 4) + (1 / 3) * (1 / 2))
    r3 = base + d * ((1 / 3) * (1 / 4) + (1 / 3) * (1 / 4))
    assert got2[1] == pytest.approx(r1, abs=1e-12)
    assert got2[2] == pytest.approx(r2, abs=1e-12)
    assert got2[3] == pytest.approx(r3, abs=1e-12)


def test_pagerank_weighted_zero_and_null_weights_stay_in_system(spark):
    # r8 ADVICE fix: a node whose out-edge weights are all 0/null used
    # to get __deg = 0 -> rank*w/0 = NULL and its mass silently left
    # the system. Such edges now spread no mass and their endpoints
    # fall into the dangling path: ranks stay finite and sum to 1.
    e = spark.createDataFrame(
        [(1, 2, 5), (3, 4, 0), (5, 6, None)],
        "src long, dst long, weight int",
    )
    got = {r.node: r.rank for r in
           G.pagerank(e, iters=3, weight_col="weight").collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert all(v is not None and v > 0 for v in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # zero/null-weight pairs are symmetric under symmetrization
    assert got[3] == pytest.approx(got[4])
    assert got[5] == pytest.approx(got[6])


def test_pagerank_directed_cycle_skips_dangling_branch(spark):
    # every node in a directed cycle has out-degree 1 -> the upfront
    # deg-vs-nodes count proves no dangling nodes and the per-iteration
    # dangling aggregate is skipped; uniform ranks are the fixed point
    got = {r.node: r.rank for r in
           G.pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]),
                      iters=5, directed=True).collect()}
    for v in (1, 2, 3):
        assert abs(got[v] - 1.0 / 3) < 1e-12


# ---------------------------------------------------------------------------
# label propagation communities
# ---------------------------------------------------------------------------


def _lpa_py(edge_list, iters):
    """Pure-python replica: sync rounds, most-frequent neighbor label,
    ties -> smallest label."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for s, d in edge_list:
        nbrs[s].append(d)
        nbrs[d].append(s)
    lab = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(lab[x] for x in ns)
            top = max(c.values())
            new[n] = min(l for l, k in c.items() if k == top)
        lab = new
    return lab


def test_label_propagation_matches_python_replica(spark):
    import random

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    rng = random.Random(5)
    es = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)})
    edges = spark.createDataFrame(es, "src long, dst long")
    for iters in (1, 3, 4):
        got = {r.node: r.label
               for r in G.label_propagation(edges, iters=iters).collect()}
        assert got == _lpa_py(es, iters), f"iters={iters}"


def test_label_propagation_keeps_bridged_cliques_apart(spark):
    # two 5-cliques joined by ONE bridge edge: connected components
    # would merge them; LPA must give each clique its own label
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    es = a + b + [(4, 10)]  # canonical src<dst
    edges = spark.createDataFrame(es, "src long, dst long")
    got = {r.node: r.label for r in G.label_propagation(edges, iters=4).collect()}
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 15)} == {10}


def test_shortest_paths_matches_dijkstra(spark):
    import heapq
    import random

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    rng = random.Random(9)
    es = sorted({tuple(sorted(rng.sample(range(30), 2))) for _ in range(70)})
    ws = [rng.randint(1, 5) for _ in es]
    edges = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(es, ws)], "src long, dst long, weight long"
    )
    # full Dijkstra reference (cost 1/w)
    adj = {}
    for (s, d), w in zip(es, ws):
        adj.setdefault(s, []).append((d, 1.0 / w))
        adj.setdefault(d, []).append((s, 1.0 / w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    got = {r.node: r.dist
           for r in G.shortest_paths(edges, 0, iters=30, weight_col="weight").collect()}
    assert set(got) == set(dist)
    for n, d in dist.items():
        assert abs(got[n] - d) < 1e-9, (n, got[n], d)


def test_shortest_paths_hop_limit_is_exact_prefix(spark):
    # iters=k gives exact distances among <=k-hop paths: on a path
    # graph only the first k nodes past the source are reached
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    got = {r.node: r.dist for r in G.shortest_paths(edges, 0, iters=3).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_personalized_pagerank_matches_python_replica(spark):
    import random
    from collections import defaultdict

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    rng = random.Random(2)
    es = sorted({tuple(sorted(rng.sample(range(25), 2))) for _ in range(60)})
    ws = [rng.randint(1, 4) for _ in es]
    edges = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(es, ws)], "src long, dst long, weight long"
    )
    seeds = [0, 5]
    got = {r.node: r.score
           for r in G.personalized_pagerank(edges, seeds, iters=4,
                                            weight_col="weight").collect()}
    adj = defaultdict(list)
    deg = defaultdict(float)
    for (s, d), w in zip(es, ws):
        adj[s].append((d, float(w)))
        adj[d].append((s, float(w)))
        deg[s] += w
        deg[d] += w
    r = {s: 0.5 for s in seeds}
    for _ in range(4):
        new = defaultdict(float)
        for u, ru in r.items():
            for v, w in adj[u]:
                new[v] += ru * w / deg[u]
        r = {v: (0.5 * 0.15 if v in seeds else 0.0) + 0.85 * c
             for v, c in new.items()}
        for s in seeds:
            if s not in r:
                r[s] = 0.5 * 0.15
    assert set(got) == set(r)
    for n, v in r.items():
        assert abs(got[n] - v) < 1e-9, (n, got[n], v)


def test_personalized_pagerank_frontier_stays_local(spark):
    # two disconnected components: walks seeded in one never assign
    # mass to the other (the frontier-sized-frames claim, observably)
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    a = [(0, 1), (1, 2), (0, 2)]
    b = [(10, 11), (11, 12)]
    edges = spark.createDataFrame(a + b, "src long, dst long")
    got = {r.node for r in G.personalized_pagerank(edges, [0], iters=5).collect()}
    assert got == {0, 1, 2}


def test_kcore_triangle_with_tail(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph import kcore

    # triangle 1-2-3 plus pendant chain 3-4-5: 2-core = the triangle
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1), (4, 5, 1)],
        "src long, dst long, weight long",
    )
    out = {r.node: r.core_deg for r in kcore(edges, k=2, iters=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # 3-core of the same graph is empty
    assert kcore(edges, k=3, iters=4).count() == 0


def test_kcore_cascade_peel(spark):
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.graph import kcore

    # long chain: peeling cascades from both ends, everything dies
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(1, 7)], "src long, dst long, weight long"
    )
    assert kcore(edges, k=2, iters=6).count() == 0
    # two 4-cliques sharing one bridge: both survive as 3-cores
    cl = [(a, b, 1) for base in (10, 20) for a in range(base, base + 4)
          for b in range(a + 1, base + 4)]
    edges2 = spark.createDataFrame(cl + [(13, 20, 1)], "src long, dst long, weight long")
    out = {r.node: r.core_deg for r in kcore(edges2, k=3, iters=4).collect()}
    assert len(out) == 8
    # bridge endpoints keep the bridge edge (both ends are in-core): deg 4
    assert out[13] == 4 and out[20] == 4
    assert all(v == 3 for n, v in out.items() if n not in (13, 20))


def test_shortest_paths_drops_zero_and_null_weight_edges(spark):
    """r9 verdict sharp edge: 1/0 = Infinity and 1/NULL = NULL cost
    silently swallowed relaxations — such edges are now dropped, so a
    zero-weight bridge does NOT connect its endpoints."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
        graph as G,
    )

    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 0), (2, 3, None), (0, 4, 1)],
        "src long, dst long, weight long",
    )
    got = {r.node: r.dist
           for r in G.shortest_paths(edges, 0, iters=6, weight_col="weight").collect()}
    # nodes 2 and 3 are only reachable through the 0-weight / NULL edges
    assert set(got) == {0, 1, 4}
    assert got[1] == 0.5 and got[4] == 1.0
