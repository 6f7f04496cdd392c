"""EWMA + rolling z-score (operators/smoothing.py) vs brute force."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ironbeam_spark.operators.smoothing import ewma_per_key, rolling_zscore

SCHEMA = "key long, ts long, seq long, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts") * 1000  # int64 ts contract: nanoseconds
    )


def _ref_ewma(rows, a):
    out = {}
    state: dict[int, float] = {}
    for k, t, s, x in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        prev = state.get(k)
        cur = x if prev is None else a * x + (1.0 - a) * prev
        state[k] = cur
        out[(k, t, s)] = cur
    return out


def test_ewma_exact(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(6), rng.randrange(50), i, round(rng.uniform(0, 50), 2))
        for i in range(300)
    ]
    got = {
        (r["key"], r["_us"], r["seq"]): r["ewma"]
        for r in ewma_per_key(
            _df(spark, rows), ["key"], "ts", "value", 0.25,
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert got == _ref_ewma(rows, 0.25)  # bit-exact, not approx


def test_ewma_alpha_one_is_identity(spark):
    rows = [(1, 1, 0, 3.5), (1, 2, 1, 7.25)]
    got = sorted(
        r["ewma"]
        for r in ewma_per_key(
            _df(spark, rows), ["key"], "ts", "value", 1.0,
            tiebreak_cols=["seq"],
        ).collect()
    )
    assert got == [3.5, 7.25]


def test_ewma_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        ewma_per_key(_df(spark, [(1, 1, 0, 1.0)]), ["key"], "ts", "value", 0.0)


def _ref_z(rows, window, scale):
    by_key: dict[int, list] = {}
    for k, t, s, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(k, []).append((t, s, v))
    out = {}
    for k, seq in by_key.items():
        xs = [int(round(v * scale)) for _, _, v in seq]
        for i, (t, s, v) in enumerate(seq):
            lo = max(0, i - (window - 1))
            frame = xs[lo : i + 1]
            n = len(frame)
            sx, sxx = sum(frame), sum(x * x for x in frame)
            vn = n * sxx - sx * sx
            if n >= window and vn > 0:
                z = float(n * xs[i] - sx) / (
                    float(n) * math.sqrt(float(vn) / float(n * (n - 1)))
                )
            else:
                z = None
            out[(k, t, s)] = z
    return out


def test_zscore_exact(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(4), rng.randrange(100), i, round(rng.uniform(0, 20), 2))
        for i in range(250)
    ]
    got = {
        (r["key"], r["_us"], r["seq"]): r["z"]
        for r in rolling_zscore(
            _df(spark, rows), ["key"], "ts", "value", window=10,
            tiebreak_cols=["seq"],
        ).collect()
    }
    assert got == _ref_z(rows, 10, 100)


def test_zscore_flat_window_is_null(spark):
    rows = [(1, t, t, 5.0) for t in range(12)]
    zs = [
        r["z"]
        for r in rolling_zscore(
            _df(spark, rows), ["key"], "ts", "value", window=10,
            tiebreak_cols=["seq"],
        ).collect()
    ]
    assert zs == [None] * 12  # zero variance -> NULL, never NaN/div-by-zero


def test_zscore_null_value_withholds_window(spark):
    # a NULL value must not corrupt stats: count(x) keeps (n, sx, sxx)
    # consistent and the n >= window gate withholds z for touched windows
    rows = [
        (1, t, t, float(v))
        for t, v in zip(range(1, 6), (10, 20, 30, 40, 50))
    ]
    df = _df(spark, rows)
    df_null = df.withColumn(
        "value", F.when(F.col("ts") == 3000, F.lit(None)).otherwise(F.col("value"))
    )
    out = rolling_zscore(df_null, ["key"], "ts", "value", window=3)
    zs = {r["_us"]: r["z"] for r in out.collect()}
    # windows covering the NULL row (us=3) have only 2 values -> z NULL;
    # the first full clean window is rows {4,5,6...} — here none, so all
    # windows touching us=3 are withheld
    assert zs[3] is None and zs[4] is None and zs[5] is None
