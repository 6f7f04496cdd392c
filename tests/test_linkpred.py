"""Common-neighbor link prediction (operators/linkpred.py) vs brute force."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from ironbeam_spark.operators.linkpred import common_neighbors_join


def _brute(edges: set[tuple[int, int]], min_common: int):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbr: dict[int, set[int]] = {}
    for a, b in es:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    out = {}
    for n1, n2 in combinations(sorted(nbr), 2):
        shared = nbr[n1] & nbr[n2]
        c = len(shared)
        if c >= min_common:
            d1, d2 = len(nbr[n1]), len(nbr[n2])
            ra = sum(1_000_000 // len(nbr[v]) for v in shared)
            out[(n1, n2)] = (c, d1, d2, c / (d1 + d2 - c), ra)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(list(edges), "src long, dst long")
    return {
        (r.node1, r.node2): (
            r.common,
            r.degree1,
            r.degree2,
            r.jaccard,
            r.ra_micro,
        )
        for r in common_neighbors_join(df, **kw).collect()
    }


@pytest.mark.parametrize("seed,min_common", [(0, 1), (1, 2), (2, 3)])
def test_fuzz_vs_brute_force(spark, seed, min_common):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < 45:
        a, b = rng.randrange(15), rng.randrange(15)
        if a != b:
            edges.add((a, b))
    got = _run(spark, edges, min_common=min_common)
    want = _brute(edges, min_common)
    assert set(got) == set(want)
    for k, (c, d1, d2, j, ra) in want.items():
        gc, gd1, gd2, gj, gra = got[k]
        assert (gc, gd1, gd2, gra) == (c, d1, d2, ra), k
        assert abs(gj - j) < 1e-12, k


def test_direct_edge_does_not_count_as_common(spark):
    # path 1-2-3 plus edge 1-3: common(1,3) = {2} only, though 1-3 linked
    got = _run(spark, {(1, 2), (2, 3), (1, 3)}, min_common=1)
    assert got[(1, 3)][0] == 1
    # 1 and 2 share neighbor 3; 2 and 3 share neighbor 1
    assert got[(1, 2)][0] == 1 and got[(2, 3)][0] == 1


def test_hub_guard_raises_midjob(spark):
    edges = [(0, i) for i in range(1, 12)]  # hub 0 with degree 11
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(Exception, match="max_degree"):
        common_neighbors_join(df, max_degree=10).collect()
    ok = common_neighbors_join(df, max_degree=11, min_common=1)
    assert ok.count() == 55  # C(11,2) leaf pairs all share the hub
    with pytest.raises(ValueError, match="min_common"):
        common_neighbors_join(df, min_common=0)
