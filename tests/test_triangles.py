"""Triangle counting (operators/triangles.py) vs brute force: fuzz over
random graphs, hub graphs (the orientation's reason to exist), dirty
inputs (direction, multi-edges, self-loops), and degree==id orientation
equivalence."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from ironbeam_spark.operators.triangles import canonical_edges, triangle_count


def _brute(edges: set[tuple[int, int]]) -> int:
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({v for e in es for v in e})
    return sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def _count(spark, rows, orient):
    df = spark.createDataFrame(rows, "src long, dst long")
    return triangle_count(df, orient=orient).collect()[0].n_triangles


@pytest.mark.parametrize("seed,n,m", [(0, 12, 30), (1, 20, 60), (2, 8, 28)])
def test_fuzz_vs_brute_force(spark, seed, n, m):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    want = _brute(edges)
    rows = list(edges)
    assert _count(spark, rows, "degree") == want
    assert _count(spark, rows, "id") == want


def test_hub_graph_exact(spark):
    # star hub (the last-reducer shape) + one triangle hanging off it:
    # hub-leaf edges close no triangles; (hub, 1, 2) is the only one
    rows = [(0, i) for i in range(1, 40)] + [(1, 2)]
    assert _count(spark, rows, "degree") == 1
    assert _count(spark, rows, "id") == 1


def test_dirty_inputs_canonicalized(spark):
    # duplicates, both directions, self-loops: one triangle exactly once
    rows = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (1, 2)]
    df = spark.createDataFrame(rows, "src long, dst long")
    assert canonical_edges(df, "src", "dst").count() == 3
    assert _count(spark, rows, "degree") == 1


def test_triangle_free_and_validation(spark):
    # bipartite graphs have no odd cycles, hence zero triangles
    rows = [(a, 100 + b) for a in range(5) for b in range(5)]
    assert _count(spark, rows, "degree") == 0
    df = spark.createDataFrame(rows, "src long, dst long")
    with pytest.raises(ValueError, match="orient"):
        triangle_count(df, orient="nope")


def _brute_per_node(edges: set[tuple[int, int]]):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({v for e in es for v in e})
    tri = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: sum(1 for e in es if v in e) for v in nodes}
    return {
        v: (deg[v], tri[v], tri[v] / (deg[v] * (deg[v] - 1) / 2) if deg[v] >= 2 else 0.0)
        for v in nodes
    }


@pytest.mark.parametrize("seed", [0, 3])
def test_node_clustering_vs_brute(spark, seed):
    from ironbeam_spark.operators.triangles import node_clustering

    rng = random.Random(seed)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randrange(14), rng.randrange(14)
        if a != b:
            edges.add((a, b))
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {
        r.node: (r.degree, r.n_triangles, r.coeff)
        for r in node_clustering(df).collect()
    }
    want = _brute_per_node(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v][:2] == want[v][:2], v
        assert abs(got[v][2] - want[v][2]) < 1e-12, v


def test_node_clustering_k4_is_all_ones(spark):
    from ironbeam_spark.operators.triangles import node_clustering

    rows = [(a, b) for a, b in combinations(range(4), 2)]
    df = spark.createDataFrame(rows, "src long, dst long")
    for r in node_clustering(df).collect():
        assert (r.degree, r.n_triangles, r.coeff) == (3, 3, 1.0)
