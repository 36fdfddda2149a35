"""Connected components / dedup clusters (operators/components.py):
convergence past one hop, multiple components, singletons, and
equivalence with a Python union-find."""

from __future__ import annotations

import pytest

from netcdf_olap_spark.operators.components import connected_components, dedup_clusters


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def test_chain_needs_multiple_rounds(spark):
    """A 6-node path graph: the far end is 5 hops from the min label —
    exercises the iteration loop, not just one propagation."""
    edges = [(i, i + 1) for i in range(10, 15)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == {i: 10 for i in range(10, 16)}


def test_multiple_components_and_unordered_edges(spark):
    edges = [(5, 3), (3, 9), (20, 21), (40, 2), (2, 40)]
    nodes = {5, 3, 9, 20, 21, 40, 2}
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == _uf_components(edges, nodes)
    assert got[9] == 3 and got[21] == 20 and got[40] == 2


def test_dedup_clusters_with_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    all_ids = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    got = {r.doc_id: (r.keeper_id, r.is_keeper) for r in dedup_clusters(pairs, all_ids).collect()}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),   # singleton keeps itself
        5: (5, True),
    }


def test_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(100))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.comp for r in connected_components(df).collect()}
    want = _uf_components(edges, {n for e in edges for n in e})
    assert got == want
