"""Randomized differential tests for operators/graph.py: the Spark
implementations must EXACTLY equal pure-Python reference implementations
on seeded random graphs (the integer algebra makes exact equality a fair
demand — any partitioning/order sensitivity would show up as drift)."""

from __future__ import annotations

import random

import pytest

from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
    pagerank_integer,
    triangle_census,
)


def _random_symmetric_graph(seed: int, n: int, p: float) -> dict[int, list[int]]:
    rng = random.Random(seed)
    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < p:
                adj[a].add(b)
                adj[b].add(a)
    # graph ops take vertices with >= 1 edge (no dangling by construction)
    return {v: sorted(ns) for v, ns in adj.items() if ns}


def _to_df(spark, adj):
    return spark.createDataFrame(
        [(v, ns) for v, ns in adj.items()], "src long, dsts array<long>"
    )


def _pagerank_reference(adj, n_iter, scale=10**12):
    """Line-for-line integer reference: same div/damping algebra."""
    nodes = sorted(adj)
    base = scale // len(nodes)
    pr = {v: base for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0 for v in nodes}
        for v, ns in adj.items():
            c = pr[v] // len(ns)
            for w in ns:
                incoming[w] += c
        pr = {v: (15 * base + 85 * incoming[v]) // 100 for v in nodes}
    return pr


def _triangle_reference(adj):
    nodes = sorted(adj)
    deg = {v: len(ns) for v, ns in adj.items()}
    n_edges = sum(deg.values()) // 2
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    sets = {v: set(ns) for v, ns in adj.items()}
    for a in nodes:
        for b in sets[a]:
            if b <= a:
                continue
            tri += len([c for c in sets[a] & sets[b] if c > b])
    return len(nodes), n_edges, n_wedges, tri


@pytest.mark.parametrize("seed,n,p", [(1, 25, 0.15), (2, 40, 0.08), (3, 30, 0.4)])
def test_pagerank_equals_pure_python_reference(spark, seed, n, p):
    adj = _random_symmetric_graph(seed, n, p)
    got = {
        r["node"]: r["pr"]
        for r in pagerank_integer(_to_df(spark, adj), n_iter=4).collect()
    }
    assert got == _pagerank_reference(adj, 4)


@pytest.mark.parametrize("seed,n,p", [(11, 25, 0.2), (12, 35, 0.1), (13, 20, 0.5)])
def test_triangle_census_equals_brute_force(spark, seed, n, p):
    adj = _random_symmetric_graph(seed, n, p)
    row = triangle_census(_to_df(spark, adj)).collect()[0]
    nodes, edges, wedges, tri = _triangle_reference(adj)
    assert (
        row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]
    ) == (nodes, edges, wedges, tri)


def _k_core_reference(adj, k):
    """Sequential peeling reference."""
    sets = {v: set(ns) for v, ns in adj.items()}
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in sets.items() if len(ns) < k]:
            for w in sets[v]:
                sets[w].discard(v)
            del sets[v]
            changed = True
    return {v: len(ns) for v, ns in sets.items()}


def test_k_core_hand_checked_shapes(spark):
    """K4 + pendant: the 3-core is exactly K4 (pendant peels, its
    neighbor keeps degree 3). A chain peels to nothing at k=2; a cycle
    IS its own 2-core. Peeling must CASCADE: in a chain, removing the
    endpoints exposes new endpoints round after round."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import k_core

    k4p = {1: [2, 3, 4], 2: [1, 3, 4], 3: [1, 2, 4], 4: [1, 2, 3, 5], 5: [4]}
    got = {r["node"]: r["core_degree"] for r in k_core(_to_df(spark, k4p), 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    chain = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3]}
    assert k_core(_to_df(spark, chain), 2).count() == 0

    cycle = {i: [(i - 1) % 6, (i + 1) % 6] for i in range(6)}
    got = {r["node"]: r["core_degree"] for r in k_core(_to_df(spark, cycle), 2).collect()}
    assert got == {i: 2 for i in range(6)}


@pytest.mark.parametrize("seed,n,p,k", [(31, 30, 0.15, 3), (32, 40, 0.1, 2), (33, 25, 0.3, 4)])
def test_k_core_equals_sequential_peeling(spark, seed, n, p, k):
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import k_core

    adj = _random_symmetric_graph(seed, n, p)
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(_to_df(spark, adj), k).collect()
    }
    assert got == _k_core_reference(adj, k)


def _ppr_reference(adj, seeds, n_iter, scale=10**12):
    """Line-for-line integer reference of the sparse personalized update."""
    seed_base = scale // len(seeds)
    pr = {v: seed_base for v in seeds}
    for _ in range(n_iter):
        incoming = {}
        for v, mass in pr.items():
            if v not in adj:
                continue
            c = mass // len(adj[v])
            for w in adj[v]:
                incoming[w] = incoming.get(w, 0) + c
        new = {}
        for v in set(incoming) | set(seeds):
            num = (15 * seed_base if v in seeds else 0) + 85 * incoming.get(v, 0)
            if num // 100 > 0:
                new[v] = num // 100
        pr = new
    return pr


def test_personalized_pagerank_localizes_mass_on_a_path(spark):
    """On a long path with the seed at one end, mass must stay within the
    seed's n_iter-hop neighborhood (sparse frontier contract) and decay
    with distance."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        personalized_pagerank,
    )

    path = {i: [j for j in (i - 1, i + 1) if 0 <= j <= 19] for i in range(20)}
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(_to_df(spark, path), seeds, n_iter=3).collect()
    }
    assert max(got) <= 3  # 3 rounds reach at most 3 hops
    assert sum(got.values()) <= 10**12  # never creates mass
    assert got == _ppr_reference(path, {0}, 3)

    # dominance intuition needs a graph where mass RETURNS to the seed
    # (on a path it travels outward as a wave): a star re-concentrates
    # every round, so the center must outrank every leaf
    star = {0: list(range(1, 11)), **{i: [0] for i in range(1, 11)}}
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(_to_df(spark, star), seeds, n_iter=4).collect()
    }
    assert all(got[0] > v for k, v in got.items() if k != 0)
    assert got == _ppr_reference(star, {0}, 4)


@pytest.mark.parametrize(
    "seed,n,p,seed_nodes", [(41, 30, 0.12, {0, 5}), (42, 25, 0.25, {3}), (43, 40, 0.08, {1, 2, 7})]
)
def test_personalized_pagerank_equals_pure_python_reference(
    spark, seed, n, p, seed_nodes
):
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        personalized_pagerank,
    )

    adj = _random_symmetric_graph(seed, n, p)
    seed_nodes = {s for s in seed_nodes if s in adj} or {min(adj)}
    seeds = spark.createDataFrame([(s,) for s in sorted(seed_nodes)], "node long")
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(_to_df(spark, adj), seeds, n_iter=4).collect()
    }
    assert got == _ppr_reference(adj, seed_nodes, 4)


def test_personalized_pagerank_rejects_empty_seeds(spark):
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        personalized_pagerank,
    )

    adj = _to_df(spark, {1: [2], 2: [1]})
    with pytest.raises(ValueError, match="seed set is empty"):
        personalized_pagerank(adj, spark.createDataFrame([], "node long"))
