"""Cohort retention (operators/retention.py) vs a brute-force reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ironbeam_spark.operators.retention import cohort_retention, retention_rates


def _ref(events, period_us):
    """events: list[(user, ts_us)] -> {(cohort, offset): n_users}."""
    per_user = {}
    for u, t in events:
        per_user.setdefault(u, set()).add(t // period_us)
    cells = {}
    for u, periods in per_user.items():
        cohort = min(periods)
        for p in periods:
            cells.setdefault((cohort, p - cohort), set()).add(u)
    return {k: len(v) for k, v in cells.items()}


def _run(spark, events, period_us):
    df = spark.createDataFrame(events, "user_id long, ts long").withColumn(
        "ts", F.col("ts") * 1000  # int64 ts contract: nanoseconds
    )
    return cohort_retention(df, "user_id", "ts", period_us=period_us)


def test_basic_matrix(spark):
    events = [
        (1, 0), (1, 105), (1, 210),   # cohort 0, active periods 0,1,2
        (2, 5), (2, 220),             # cohort 0, periods 0 and 2
        (3, 150),                     # cohort 1 only
        (3, 160),                     # same period — counted once
    ]
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in _run(spark, events, 100).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_rates_join(spark):
    events = [(1, 0), (2, 10), (1, 110)]
    rates = retention_rates(_run(spark, events, 100))
    rows = {r["period_offset"]: r for r in rates.collect()}
    assert rows[0]["cohort_size"] == 2 and rows[0]["retention"] == 1.0
    assert rows[1]["n_users"] == 1 and rows[1]["retention"] == 0.5


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    events = [
        (rng.randrange(20), rng.randrange(1000)) for _ in range(400)
    ]
    want = _ref(events, 77)
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in _run(spark, events, 77).collect()
    }
    assert got == want


def test_pre_epoch_periods_floor(spark):
    # a pre-epoch event must land in period -1, not share period 0 with
    # early post-epoch activity (floor-div fix — round-6 review)
    from pyspark.sql import functions as F

    from ironbeam_spark.operators.retention import cohort_retention

    ev = spark.createDataFrame(
        [(1, -1), (1, 5), (2, 5)], "user_id long, us long"
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"))
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev, "user_id", "ts", period_us=10).collect()
    }
    assert got == {(-1, 0): 1, (-1, 1): 1, (0, 0): 1}
