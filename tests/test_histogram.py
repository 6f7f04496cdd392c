"""Exact equi-width histogram (operators/histogram.py)."""

from __future__ import annotations

import random

import pytest

from ironbeam_spark.operators.histogram import equi_width_histogram


def _ref(values, n, lo, hi):
    counts = [0] * n
    span = hi - lo
    for v in values:
        if span <= 0:
            b = 0
        else:
            b = max(0, min(n - 1, (v - lo) * n // span))
        counts[b] += 1
    edges = [
        (lo + i * span // n, lo + (i + 1) * span // n) for i in range(n)
    ]
    return [(i, e[0], e[1], c) for i, (e, c) in enumerate(zip(edges, counts))]


def _run(spark, cents_vals, n, lo=None, hi=None):
    df = spark.createDataFrame(
        [(v / 100.0,) for v in cents_vals] + [(None,)], "x double"
    )
    got = equi_width_histogram(df, "x", n, lo=lo, hi=hi)
    return [
        (r["bucket"], r["lo_cents"], r["hi_cents"], r["n"])
        for r in got.collect()
    ]


def test_fuzz_default_bounds(spark):
    rng = random.Random(606)
    vals = [rng.randrange(-5000, 20000) for _ in range(500)]
    got = _run(spark, vals, 12)
    assert got == _ref(vals, 12, min(vals), max(vals))
    assert sum(r[3] for r in got) == 500  # NULL excluded, all else binned


def test_explicit_bounds_clamp_outliers(spark):
    vals = [-100, 0, 500, 999, 1000, 5000]
    got = _run(spark, vals, 10, lo=0, hi=1000)
    assert got == _ref(vals, 10, 0, 1000)
    assert got[0][3] == 2     # -100 clamps in; 0 at lower edge
    assert got[9][3] == 3     # 999 interior? no: bucket 9 holds [900,1000]
    # top edge inclusive, overflow clamps to the last bin


def test_empty_buckets_present(spark):
    got = _run(spark, [0, 1000], 5, lo=0, hi=1000)
    assert len(got) == 5
    assert [r[3] for r in got] == [1, 0, 0, 0, 1]


def test_degenerate_span(spark):
    got = _run(spark, [700, 700, 700], 4)
    assert [r[3] for r in got] == [3, 0, 0, 0]


def test_rejects_bad_buckets(spark):
    df = None
    with pytest.raises(ValueError):
        equi_width_histogram(df, "x", 0)
