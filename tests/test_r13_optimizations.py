"""Focused equivalence tests for the round-13 optimization internals.

Same contract as test_r12_optimizations.py: every optimization that
changed an operator's internals gets a direct identity pin here, so a
future edit that breaks the equivalence argument fails with a readable
name instead of as an oracle diff.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _labels(df):
    rows = [(r.node, r.component) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


# -- dedup_components: driver-side local solve is bit-identical -------------


def _pairs_df(spark, pairs, ddl="id_a bigint, id_b bigint"):
    return spark.createDataFrame(pairs, ddl)


_GRAPHS = [
    # chain: 1-2-3-4-5 plus an isolated pair
    [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
    # star + self-loop + duplicate pair (non-canonical order too)
    [(7, 3), (7, 9), (7, 12), (3, 3), (9, 7), (7, 9)],
    # two components sharing no nodes, reversed ids
    [(100, 2), (2, 50), (60, 61)],
]


@pytest.mark.parametrize("pairs", _GRAPHS)
def test_dedup_components_local_solve_matches_loop(spark, pairs):
    from ironbeam_spark.operators.dedup import dedup_components

    df = _pairs_df(spark, pairs)
    local = dedup_components(df, local_solve_max_edges=10_000)
    loop = dedup_components(df, local_solve_max_edges=0)
    assert _labels(local) == _labels(loop)


def test_dedup_components_local_solve_matches_loop_string_ids(spark):
    from ironbeam_spark.operators.dedup import dedup_components

    pairs = [("aa", "ab"), ("ab", "b"), ("zz", "a'\\q"), ("é", "zz")]
    df = _pairs_df(spark, pairs, "id_a string, id_b string")
    local = dedup_components(df, local_solve_max_edges=10_000)
    loop = dedup_components(df, local_solve_max_edges=0)
    assert _labels(local) == _labels(loop)


def test_dedup_components_local_solve_random_graph(spark):
    import random

    from ironbeam_spark.operators.dedup import dedup_components

    rng = random.Random(13)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(300)
    ]
    df = _pairs_df(spark, pairs)
    local = dedup_components(df, local_solve_max_edges=10_000)
    loop = dedup_components(df, local_solve_max_edges=0)
    assert _labels(local) == _labels(loop)


def test_dedup_components_falls_back_above_bound(spark):
    """A bound smaller than the edge count must take the distributed loop
    (and still produce the same labels)."""
    from ironbeam_spark.operators.dedup import dedup_components

    pairs = [(i, i + 1) for i in range(50)]
    df = _pairs_df(spark, pairs)
    small_bound = dedup_components(df, local_solve_max_edges=5)
    loop = dedup_components(df, local_solve_max_edges=0)
    assert _labels(small_bound) == _labels(loop)
    # the fallback plan is the iterative one, not a literal
    assert "inline([[" not in small_bound._jdf.queryExecution().optimizedPlan().toString()


def test_dedup_components_local_solve_null_endpoint_falls_back(spark):
    """NULL endpoints void the local-solve precondition: the probe must
    fall through to the loop, whose behavior is unchanged."""
    from ironbeam_spark.operators.dedup import dedup_components

    df = _pairs_df(spark, [(1, 2), (None, 3), (2, 4)])
    out = dedup_components(df, local_solve_max_edges=10_000)
    loop = dedup_components(df, local_solve_max_edges=0)
    assert _labels(out) == _labels(loop)


def test_dedup_components_local_solve_plan_is_pure_jvm_literal(spark):
    """The local-solve result is a LocalTableScan after constant folding —
    no Python nodes, nothing persisted, no shuffle: consumers broadcast it."""
    from ironbeam_spark.operators.dedup import dedup_components

    df = _pairs_df(spark, [(1, 2), (2, 3)])
    out = dedup_components(df, local_solve_max_edges=10_000)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # folded literal: Generate inline([...]) over a 1-row Range — no scan,
    # no join, no aggregate survives in the optimized plan
    assert "inline([[" in plan or "LocalRelation" in plan
    for bad in ("Python", "InMemoryRelation", "Exchange", "Join", "Aggregate"):
        assert bad not in plan
    assert out.storageLevel.useMemory is False
    assert _labels(out) == [(1, 1), (2, 1), (3, 1)]


def test_dedup_components_local_solve_conf_knob(spark):
    """ironbeam.components.local_solve_max_edges=0 disables the short
    circuit when the parameter is not passed."""
    from ironbeam_spark.operators.dedup import dedup_components

    df = _pairs_df(spark, [(1, 2), (2, 3)])
    spark.conf.set("ironbeam.components.local_solve_max_edges", "0")
    try:
        out = dedup_components(df)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "inline([[" not in plan
    finally:
        spark.conf.unset("ironbeam.components.local_solve_max_edges")
    on = dedup_components(df)
    plan_on = on._jdf.queryExecution().optimizedPlan().toString()
    assert "inline([[" in plan_on or "LocalRelation" in plan_on
    assert _labels(out) == _labels(on)


def test_dedup_components_local_solve_empty_pairs(spark):
    from ironbeam_spark.operators.dedup import dedup_components

    df = _pairs_df(spark, [], "id_a bigint, id_b bigint")
    out = dedup_components(df, local_solve_max_edges=10_000)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "component"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
    ]
