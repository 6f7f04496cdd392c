"""Positional phrase search (operators/phrase.py) vs brute force."""

from __future__ import annotations

import random

import pytest

from ironbeam_spark.operators.phrase import phrase_search, positional_index


def _ref(docs, phrase):
    k = len(phrase)
    out = set()
    for i, text in docs:
        ws = [w for w in text.lower().split(" ") if w]
        for p in range(len(ws) - k + 1):
            if ws[p : p + k] == list(phrase):
                out.add((i, p))
    return out


def _run(spark, docs, phrase):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = positional_index(df, "doc_id", "text")
    return {
        (r["doc"], r["start_pos"])
        for r in phrase_search(idx, phrase).collect()
    }


def test_basic_and_overlapping(spark):
    docs = [
        (1, "a b a b a"),        # 'a b a' at 0 AND 2 (overlapping)
        (2, "b a b"),
        (3, "a b"),              # too short for the trigram
    ]
    assert _run(spark, docs, ["a", "b", "a"]) == {(1, 0), (1, 2)}
    assert _run(spark, docs, ["a", "b"]) == {(1, 0), (1, 2), (2, 1), (3, 0)}


def test_case_insensitive_single_term(spark):
    docs = [(1, "Alpha beta ALPHA")]
    assert _run(spark, docs, ["alpha"]) == {(1, 0), (1, 2)}


def test_repeated_term_phrase(spark):
    docs = [(1, "x x x y x x")]
    assert _run(spark, docs, ["x", "x"]) == _ref(docs, ("x", "x"))
    assert _run(spark, docs, ["x", "x", "x"]) == {(1, 0)}


def test_empty_phrase_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(positional_index(df, "doc_id", "text"), [])


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    vocab = ["a", "b", "c"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(50)
    ]
    for phrase in (["a"], ["a", "b"], ["c", "a", "b"], ["b", "b"]):
        assert _run(spark, docs, phrase) == _ref(docs, tuple(phrase)), phrase
