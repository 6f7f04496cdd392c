"""ED-Join edit-distance similarity join (operators/editdist.py) vs a
pure-Python Levenshtein DP over all pairs — the fuzz proves the q-gram
count/prefix/length filters are LOSSLESS (no missed pair), not just that
surviving candidates verify correctly."""

from __future__ import annotations

import random

import pytest

from ironbeam_spark.operators.editdist import edit_distance_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(strings: dict[int, str], d: int):
    ids = sorted(strings)
    return {
        (i, j, _lev(strings[i], strings[j]))
        for k, i in enumerate(ids)
        for j in ids[k + 1 :]
        if _lev(strings[i], strings[j]) <= d
    }


def _run(spark, strings: dict[int, str], d: int, q: int = 2):
    df = spark.createDataFrame(list(strings.items()), "id long, s string")
    out = edit_distance_join(df, "id", "s", d, q=q)
    return {(r.id1, r.id2, r.dist) for r in out.collect()}


@pytest.mark.parametrize("seed,d,q", [(0, 2, 2), (1, 1, 2), (2, 2, 3), (3, 1, 3)])
def test_fuzz_filters_are_lossless(spark, seed, d, q):
    rng = random.Random(seed)
    min_len = q * (d + 1)
    strings = {
        i: "".join(rng.choice("ab") for _ in range(rng.randrange(min_len, min_len + 7)))
        for i in range(50)
    }
    assert _run(spark, strings, d, q) == _brute(strings, d)


def test_duplicates_and_near_misses(spark):
    strings = {
        1: "abcdef",
        2: "abcdef",   # dist 0
        3: "abcdeg",   # dist 1 to 1/2
        4: "abXdeY",   # dist 2 to 1/2
        5: "zzzzzz",   # unrelated
        6: "abcfed",   # transposition = 2 substitutions in Levenshtein
    }
    got = _run(spark, strings, 2)
    assert (1, 2, 0) in got and (1, 3, 1) in got and (1, 4, 2) in got
    assert (1, 6, 2) in got and (2, 3, 1) in got
    assert not any(5 in (a, b) for a, b, _ in got)
    assert got == _brute(strings, 2)


def test_shifted_prefix_pair_found(spark):
    # insertion at the front shifts every gram position — the join must
    # still find it (tokens are matched by occurrence, not position)
    strings = {1: "abcdefgh", 2: "xabcdefgh", 3: "abcdefghx"}
    got = _run(spark, strings, 1)
    assert got == _brute(strings, 1) and (1, 2, 1) in got and (1, 3, 1) in got


def test_hot_common_prefix_stays_filtered(spark):
    # all strings share a long constant prefix (the hot-gram trap): rare
    # digit-tail grams must drive candidates, and results stay exact
    strings = {i: f"Customer#{i:09d}" for i in range(1, 120)}
    d = 2
    got = _run(spark, strings, d)
    assert got == _brute(strings, d)
    assert (1, 2, 1) in got  # ...001 vs ...002


def test_short_string_precondition_raises(spark):
    df = spark.createDataFrame([(1, "abcde"), (2, "abcdef")], "id long, s string")
    with pytest.raises(Exception, match="prefix filter unsound"):
        edit_distance_join(df, "id", "s", 2, q=2).collect()
    with pytest.raises(ValueError):
        edit_distance_join(df, "id", "s", 0)
