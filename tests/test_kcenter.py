"""Greedy k-center selection (operators/kcenter.py) vs a pure-numpy
reference of the same greedy, plus the structural invariants."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ironbeam_spark.operators.kcenter import kcenter_select


def _numpy_greedy(ids, X, k):
    sel = [int(ids[np.argmin(ids)])]
    out = [(0, sel[0], None)]
    idx = {int(i): n for n, i in enumerate(ids)}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    mind = None
    for r in range(1, k):
        c = Xn[idx[sel[-1]]]
        d = 1.0 - Xn @ c
        mind = d if mind is None else np.minimum(mind, d)
        best, bd = None, None
        for n, i in enumerate(ids):
            if int(i) in sel:
                continue
            if bd is None or mind[n] > bd or (mind[n] == bd and int(i) < best):
                best, bd = int(i), float(mind[n])
        sel.append(best)
        out.append((r, best, bd))
    return out


def test_matches_numpy_greedy(spark):
    rng = random.Random(4)
    n, d, k = 80, 6, 7
    data = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    got = [
        (r.sel_rank, r.vec_id, r.dist)
        for r in kcenter_select(df, k=k).collect()
    ]
    X = np.array([v for _, v in data])
    want = _numpy_greedy(list(range(n)), X, k)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gd), (_, _, wd) in zip(got[1:], want[1:]):
        assert abs(gd - wd) < 1e-12


def test_coverage_radius_non_increasing_and_deterministic(spark):
    rng = random.Random(9)
    data = [
        (i, [rng.uniform(-1, 1) for _ in range(5)]) for i in range(40)
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    a = kcenter_select(df, k=6).collect()
    b = kcenter_select(df, k=6).collect()
    assert [(r.sel_rank, r.vec_id) for r in a] == [
        (r.sel_rank, r.vec_id) for r in b
    ]
    dists = [r.dist for r in a[1:]]
    assert dists == sorted(dists, reverse=True)  # greedy radius shrinks


def test_k_exceeding_corpus_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = kcenter_select(df, k=10).collect()
    assert [r.vec_id for r in out] == [1, 2]  # stops at corpus size
    with pytest.raises(ValueError, match="k must"):
        kcenter_select(df, k=0)
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(df.limit(0), k=2)
