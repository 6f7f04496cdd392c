"""Seeded contrastive negative sampling (operators/sampling.contrastive_negatives)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

from ironbeam_spark.operators.sampling import contrastive_negatives


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _pool(ids, seed, size):
    """Python model of the shared pool: ids by md5('{seed}|{id}') priority."""
    return sorted(ids, key=lambda i: (hashlib.md5(f"{seed}|{i}".encode()).hexdigest(), i))[:size]


def test_matches_python_model(spark):
    ids = list(range(40))
    pairs = [(1, 2), (3, 7), (1, 9)]
    out = contrastive_negatives(
        _docs(spark, 40), _pairs(spark, pairs), "doc_id", k=4, seed=11, pool_margin=6
    ).collect()
    pool = _pool(ids, 11, 4 + 1 + 6)
    partners = {}
    for a, b in pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)
    got = {(r["anchor"], r["positive"]): r["negatives"] for r in out}
    assert set(got) == set(pairs)
    for (a, p), negs in got.items():
        want = [c for c in pool if c != a and c not in partners[a]][:4]
        assert negs == want, (a, p)


def test_margin_exhaustion_yields_fewer_negatives(spark):
    # anchor 0 is paired with every pool member: pool_margin=0, k=2 ->
    # pool size 3; all pool ids excluded or equal to the anchor
    ids = list(range(10))
    pool = _pool(ids, 5, 3)
    pairs = [(0, b) for b in pool if b != 0]
    if 0 not in pool:
        pairs = pairs[:2]  # keep exactly the pool excluded
    out = contrastive_negatives(
        _docs(spark, 10), _pairs(spark, pairs), "doc_id", k=2, seed=5, pool_margin=0
    ).collect()
    for r in out:
        assert len(r["negatives"]) < 2
        assert r["anchor"] not in r["negatives"]


def test_negatives_never_contain_anchor_positive_or_partner(spark):
    pairs = [(1, 2), (2, 5), (1, 5)]
    out = contrastive_negatives(
        _docs(spark, 30), _pairs(spark, pairs), "doc_id", k=8, seed=3
    ).collect()
    partners = {1: {2, 5}, 2: {1, 5}, 5: {2, 1}}
    for r in out:
        assert r["anchor"] not in r["negatives"]
        assert r["positive"] not in r["negatives"]
        assert not (set(r["negatives"]) & partners[r["anchor"]])


def test_null_ids_never_enter_the_pool(spark):
    """Pinned NULL-id policy: a NULL id must not win a pool slot (it could
    never be emitted — c != anchor is NULL — so it would silently shrink
    the usable pool)."""
    docs = spark.createDataFrame([(i,) for i in range(6)] + [(None,)], "doc_id long")
    out = contrastive_negatives(
        docs, _pairs(spark, [(1, 2)]), "doc_id", k=5, seed=3, pool_margin=1
    ).collect()
    (row,) = out
    # pool size 7 covers all 6 non-null ids; excluding anchor+positive
    # leaves exactly 4 usable negatives — a NULL pool slot would make it 3
    assert len(row["negatives"]) == 4
    assert None not in row["negatives"]


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        contrastive_negatives(_docs(spark, 5), _pairs(spark, [(1, 2)]), "doc_id", k=0)


def test_pool_size_sanity_cap(spark):
    # the pool is an array LITERAL in every task's plan, not a broadcast —
    # a runaway pool_margin must fail loudly before the driver collect
    with pytest.raises(ValueError, match="sanity cap"):
        contrastive_negatives(
            _docs(spark, 5),
            _pairs(spark, [(1, 2)]),
            "doc_id",
            k=5,
            pool_margin=100_000,
        )
