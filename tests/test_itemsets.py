"""A-priori frequent pairs (operators/itemsets.py) vs brute force."""

from __future__ import annotations

import random
from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.utils import PythonException  # noqa: F401

from ironbeam_spark.operators.itemsets import frequent_item_pairs, frequent_items


def _brute(baskets: dict[int, set[int]], min_support: int):
    """Reference: direct pair counting over basket item sets."""
    c1: Counter = Counter()
    c2: Counter = Counter()
    for items in baskets.values():
        for i in items:
            c1[i] += 1
        for a, b in combinations(sorted(items), 2):
            c2[(a, b)] += 1
    items = {(i, n) for i, n in c1.items() if n >= min_support}
    pairs = {(a, b, n) for (a, b), n in c2.items() if n >= min_support}
    return items, pairs


def _df(spark, baskets: dict[int, set[int]], dup_rows: bool = False):
    rows = [(b, i) for b, items in baskets.items() for i in items]
    if dup_rows:  # multiplicity within a basket must NOT inflate support
        rows += rows[::2]
    return spark.createDataFrame(rows, "basket long, item long")


@pytest.mark.parametrize("seed,min_support", [(0, 2), (1, 3), (2, 1)])
def test_fuzz_vs_brute_force(spark, seed, min_support):
    rng = random.Random(seed)
    baskets = {
        b: {rng.randrange(12) for _ in range(rng.randrange(1, 7))}
        for b in range(40)
    }
    want_items, want_pairs = _brute(baskets, min_support)
    df = _df(spark, baskets, dup_rows=(seed == 0))
    got_items = {
        (r.item, r.support)
        for r in frequent_items(df, "basket", "item", min_support).collect()
    }
    got_pairs = {
        (r.item1, r.item2, r.support)
        for r in frequent_item_pairs(df, "basket", "item", min_support).collect()
    }
    assert got_items == want_items
    assert got_pairs == want_pairs


def test_pruning_is_lossless(spark):
    """Downward-closure pruning must not change the result vs counting all
    pairs directly (monotonicity: both members of a frequent pair are
    frequent items)."""
    rng = random.Random(7)
    baskets = {
        b: {rng.randrange(8) for _ in range(rng.randrange(1, 6))}
        for b in range(60)
    }
    df = _df(spark, baskets)
    for ms in (2, 4):
        _, want = _brute(baskets, ms)
        got = {
            (r.item1, r.item2, r.support)
            for r in frequent_item_pairs(df, "basket", "item", ms).collect()
        }
        assert got == want


def test_basket_guard(spark):
    baskets = {1: {1, 2, 3, 4, 5}, 2: {1, 2}}
    df = _df(spark, baskets)
    ok = frequent_item_pairs(df, "basket", "item", 1, max_basket_items=5)
    assert ok.count() == 10  # C(5,2); basket 2's (1,2) merges into support 2
    bad = frequent_item_pairs(df, "basket", "item", 1, max_basket_items=4)
    with pytest.raises(Exception, match="max_basket_items"):
        bad.collect()


@pytest.mark.parametrize("seed,min_support", [(0, 2), (1, 3), (2, 1)])
def test_unpruned_path_matches_brute_force(spark, seed, min_support):
    """prune=False (array-expansion plan) must be result-identical to the
    pruned A-priori plan and to brute force — the pair-support filter alone
    implies downward closure."""
    rng = random.Random(seed)
    baskets = {
        b: {rng.randrange(12) for _ in range(rng.randrange(1, 7))}
        for b in range(40)
    }
    _, want_pairs = _brute(baskets, min_support)
    df = _df(spark, baskets, dup_rows=(seed == 0))
    got = {
        (r.item1, r.item2, r.support)
        for r in frequent_item_pairs(
            df, "basket", "item", min_support, prune=False
        ).collect()
    }
    assert got == want_pairs


def test_basket_guard_unpruned(spark):
    baskets = {1: {1, 2, 3, 4, 5}, 2: {1, 2}}
    df = _df(spark, baskets)
    ok = frequent_item_pairs(df, "basket", "item", 1, max_basket_items=5, prune=False)
    assert ok.count() == 10
    bad = frequent_item_pairs(df, "basket", "item", 1, max_basket_items=4, prune=False)
    with pytest.raises(Exception, match="max_basket_items"):
        bad.collect()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASKET_ROWS = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 9)), min_size=0, max_size=60
)


@given(rows=_BASKET_ROWS, min_support=st.integers(1, 4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prune_paths_equivalent_property(spark, rows, min_support):
    """Property: the pruned A-priori plan and the unpruned array-expansion
    plan are result-identical on arbitrary basket multisets (duplicate
    (basket, item) rows included), both matching brute force."""
    baskets: dict[int, set[int]] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    _, want = _brute(baskets, min_support)
    df = spark.createDataFrame(
        rows + rows[::3] or [(0, 0)], "basket long, item long"
    )
    if not rows:
        df = df.limit(0)
    got_pruned = {
        (r.item1, r.item2, r.support)
        for r in frequent_item_pairs(df, "basket", "item", min_support).collect()
    }
    got_unpruned = {
        (r.item1, r.item2, r.support)
        for r in frequent_item_pairs(
            df, "basket", "item", min_support, prune=False
        ).collect()
    }
    assert got_pruned == want
    assert got_unpruned == want


def test_min_support_validation(spark):
    df = _df(spark, {1: {1}})
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_pairs(df, "basket", "item", 0)
