"""Line-level keep-first dedup (operators/line_dedup.py) vs brute force."""

from __future__ import annotations

import random

from ironbeam_spark.operators.line_dedup import (
    line_dedup_keep_first,
    line_occurrences,
)


def _ref(docs, min_chars):
    """docs: list[(id, text)] -> {id: (n_lines, n_removed, clean)} —
    keep-first in (id, pos) order, lines < min_chars exempt."""
    seen = set()
    out = {}
    for i, text in sorted(docs):
        lines = text.split("\n")
        kept = []
        for ln in lines:
            if len(ln) < min_chars:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[i] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    return out


def _run(spark, docs, min_chars=1):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = line_dedup_keep_first(df, "doc_id", "text", min_chars=min_chars)
    return {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in got.collect()
    }


def test_keep_first_across_docs(spark):
    docs = [
        (1, "alpha\nboiler\nbeta"),
        (2, "boiler\ngamma\nboiler"),   # both copies lose to doc 1
        (3, "gamma\nalpha"),
    ]
    assert _run(spark, docs) == {
        1: (3, 0, "alpha\nboiler\nbeta"),
        2: (3, 2, "gamma"),
        3: (2, 2, ""),
    }


def test_short_lines_exempt_and_empty_kept(spark):
    docs = [(1, "x\n\nlong line here"), (2, "x\n\nlong line here")]
    got = _run(spark, docs, min_chars=2)
    # 'x' (len 1) and '' are exempt everywhere; the long line dedups
    assert got[1] == (3, 0, "x\n\nlong line here")
    assert got[2] == (3, 1, "x\n")


def test_empty_doc_keeps_row(spark):
    got = _run(spark, [(1, ""), (2, "a")])
    assert got[1] == (1, 0, "")  # split('') -> [''] — one exempt empty line
    assert got[2] == (1, 0, "a")


def test_occurrences_positions(spark):
    df = spark.createDataFrame([(5, "a\nb\na")], "doc_id long, text string")
    rows = sorted(
        (r["pos"], r["line"])
        for r in line_occurrences(df, "doc_id", "text").collect()
    )
    assert rows == [(0, "a"), (1, "b"), (2, "a")]


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    vocab = ["aa", "bb", "cc", "d", ""]
    docs = [
        (
            i,
            "\n".join(
                rng.choice(vocab) for _ in range(rng.randrange(1, 12))
            ),
        )
        for i in range(40)
    ]
    for mc in (1, 2):
        assert _run(spark, docs, mc) == _ref(docs, mc)


def test_regex_metachar_separator_is_literal(spark):
    # '|' is a regex metachar: an unquoted F.split would explode every
    # character; the \Q..\E quoting must split literally (round-6 review)
    df = spark.createDataFrame(
        [(1, "aa|bb|aa"), (2, "bb|cc")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in line_dedup_keep_first(
            df, "doc_id", "text", sep="|"
        ).collect()
    }
    assert got == {1: (3, 1, "aa|bb"), 2: (2, 1, "cc")}


def test_out_of_bounds_id_raises(spark):
    import pytest
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [(-3, "aa\naa")], "doc_id long, text string"
    )
    with pytest.raises(PySparkException, match="packed_occurrence"):
        line_dedup_keep_first(df, "doc_id", "text").collect()
