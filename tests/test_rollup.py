"""Rollup cascade (operators/rollup.py) vs brute force and direct."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ironbeam_spark.operators.rollup import rollup_cascade, time_bucket_agg


def _df(spark, rows):
    # int64 ts contract: nanoseconds
    return spark.createDataFrame(rows, "key long, ts long, v long").withColumn(
        "ts", F.col("ts") * 1000
    )


def _collect(level):
    return {
        (r["key"], r["bucket_start_us"]): (r["n"], r["sum"], r["min"], r["max"])
        for r in level.collect()
    }


def _ref(rows, bucket):
    out = {}
    for k, t, v in rows:
        b = t - (t % bucket)
        n, s, lo, hi = out.get((k, b), (0, 0, None, None))
        out[(k, b)] = (
            n + 1,
            s + v,
            v if lo is None else min(lo, v),
            v if hi is None else max(hi, v),
        )
    return out


def test_cascade_equals_direct_every_level(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(4), rng.randrange(100_000), rng.randrange(-50, 500))
        for _ in range(800)
    ]
    df = _df(spark, rows)
    levels = [100, 1000, 10_000]
    cascade = rollup_cascade(df, "ts", ["key"], "v", levels)
    for bucket, level in zip(levels, cascade):
        assert _collect(level) == _ref(rows, bucket), bucket
        # ...and each equals the direct level-0 aggregation at that width
        assert _collect(
            time_bucket_agg(df, "ts", bucket, ["key"], "v")
        ) == _ref(rows, bucket), bucket


def test_non_multiple_levels_rejected(spark):
    df = _df(spark, [(1, 0, 1)])
    with pytest.raises(ValueError):
        rollup_cascade(df, "ts", ["key"], "v", [100, 250])
    with pytest.raises(ValueError):
        rollup_cascade(df, "ts", ["key"], "v", [])


def test_negative_values_min_max(spark):
    rows = [(1, 5, -7), (1, 8, 3), (1, 1500, -1)]
    df = _df(spark, rows)
    fine, coarse = rollup_cascade(df, "ts", ["key"], "v", [1000, 2000])
    got = _collect(coarse)
    assert got == {(1, 0): (3, -5, -7, 3)}


def test_merge_equals_full_even_with_late_rows(spark):
    """No append-only precondition: monoid stats absorb late rows exactly."""
    from ironbeam_spark.operators.rollup import rollup_merge

    rng = random.Random(606)
    rows = [
        (rng.randrange(4), rng.randrange(50_000), rng.randrange(0, 300))
        for _ in range(500)
    ]
    full = _ref(rows, 1000)
    # split NOT by time: the "delta" contains rows older than the snapshot
    for frac in (0, 137, 400, 500):
        older, newer = rows[:frac], rows[frac:]
        snap = time_bucket_agg(_df(spark, older), "ts", 1000, ["key"], "v")
        merged = rollup_merge(
            snap, _df(spark, newer), "ts", ["key"], "v", 1000
        )
        assert _collect(merged) == full, frac


def test_pre_epoch_buckets_floor(spark):
    # Python's % floors, so _ref has floor semantics built in; the operator
    # must match on pre-epoch timestamps (pmod fix — round-6 review): a
    # row at -5s belongs to bucket [-10s, 0s), never [0s, 10s)
    rows = [(1, -5_000_000, 3), (1, 5_000_000, 4), (2, -10_000_000, 7)]
    got = _collect(time_bucket_agg(_df(spark, rows), "ts", 10_000_000, ["key"], "v"))
    assert got == _ref(rows, 10_000_000)
    assert (1, -10_000_000) in got and (2, -10_000_000) in got
