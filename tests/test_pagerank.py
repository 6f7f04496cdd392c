"""Integer fixed-point PageRank (operators/pagerank.py) vs brute force."""

from __future__ import annotations

import random

from ironbeam_spark.operators.pagerank import pagerank

SCALE = 10**12


def _ref(edge_list, iters, symmetrize=False):
    edges = set(edge_list)
    if symmetrize:
        edges |= {(b, a) for a, b in edges}
    nodes = sorted({n for e in edges for n in e})
    out: dict[int, list[int]] = {n: [] for n in nodes}
    for a, b in edges:
        out[a].append(b)
    n = len(nodes)
    init = SCALE // n
    base = 15 * init // 100
    r = {v: init for v in nodes}
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for u in nodes:
            if out[u]:
                c = r[u] // len(out[u])
                for v in out[u]:
                    acc[v] += c
        r = {v: base + 85 * acc[v] // 100 for v in nodes}
    return r


def _run(spark, edge_list, iters, symmetrize=False):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = pagerank(df, "src", "dst", iterations=iters, symmetrize=symmetrize)
    return {r["node"]: r["rank"] for r in got.collect()}


def test_star_graph_hub_wins(spark):
    edges = [(i, 0) for i in range(1, 6)]  # spokes -> hub
    got = _run(spark, edges, 3, symmetrize=True)
    assert got == _ref(edges, 3, symmetrize=True)
    assert got[0] == max(got.values())


def test_dangling_node_leaks_directed(spark):
    # 1 -> 2, 2 has no out-edges: 2's inflow arrives, 2 emits nothing
    edges = [(1, 2)]
    got = _run(spark, edges, 2)
    assert got == _ref(edges, 2)
    assert got[1] < got[2]


def test_zero_iterations_is_uniform(spark):
    got = _run(spark, [(1, 2), (2, 3)], 0)
    assert set(got.values()) == {SCALE // 3}


def test_duplicate_edges_collapse(spark):
    once = _run(spark, [(1, 2), (2, 1)], 4)
    dup = _run(spark, [(1, 2), (1, 2), (2, 1)], 4)
    assert once == dup


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    edges = list(
        {
            (rng.randrange(15), rng.randrange(15))
            for _ in range(60)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    for sym in (False, True):
        assert _run(spark, edges, 4, sym) == _ref(edges, 4, sym)


def test_null_endpoint_edges_dropped_symmetrized(spark):
    """least/greatest ignore NULLs — the canonical-pair dedup must DROP a
    malformed (NULL, v) edge rather than fabricate a (v, v) self-loop."""
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", iterations=2, symmetrize=True).collect()
    }
    # node 3 gained no self-loop: only {1, 2} remain connected
    assert set(got) == {1, 2}
    assert got == _ref([(1, 2)], 2, symmetrize=True)


def test_null_endpoint_edges_dropped_directed(spark):
    """The DIRECTED path shares the symmetrized path's malformed-edge
    policy: a (NULL, v) / (v, NULL) edge is dropped, never surfaced as a
    NULL node row with base rank (the r8-advice inconsistency)."""
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", iterations=2).collect()
    }
    assert None not in got
    assert set(got) == {1, 2}
    assert got == _ref([(1, 2)], 2)
