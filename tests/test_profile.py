"""Single-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import datetime

import pytest

from ironbeam_spark.operators.profile import profile_table


def _rows(df):
    return {
        (r["col_name"], r["metric"]): (
            r["value_long"],
            r["value_double"],
            r["value_str"],
        )
        for r in df.collect()
    }


def test_typed_slots_and_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, 2.5, "b", datetime.datetime(2024, 1, 1, 0, 0, 0), [1]),
            (2, None, "a", None, []),
            (2, 0.5, None, datetime.datetime(2024, 1, 2, 0, 0, 0), None),
        ],
        "i long, d double, s string, t timestamp, arr array<int>",
    )
    got = _rows(profile_table(df))
    assert got[("*", "count")] == (3, None, None)
    assert got[("i", "n_null")] == (0, None, None)
    assert got[("i", "n_distinct")] == (2, None, None)
    assert got[("i", "min")] == (1, None, None)
    assert got[("i", "max")] == (2, None, None)
    assert got[("d", "n_null")] == (1, None, None)
    assert got[("d", "min")] == (None, 0.5, None)
    assert got[("d", "max")] == (None, 2.5, None)
    assert got[("s", "min")] == (None, None, "a")
    assert got[("s", "max")] == (None, None, "b")
    # timestamps land in value_long as epoch micros
    assert got[("t", "min")] == (1_704_067_200_000_000, None, None)
    assert got[("t", "n_null")] == (1, None, None)
    # complex column: null count only
    assert got[("arr", "n_null")] == (1, None, None)
    assert ("arr", "n_distinct") not in got
    assert ("arr", "min") not in got


def test_distinct_modes(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    exact = _rows(profile_table(df, distinct="exact"))
    assert exact[("k", "n_distinct")][0] == 7
    approx = _rows(profile_table(df, distinct="approx"))
    assert 5 <= approx[("k", "n_distinct")][0] <= 9  # sketch, small rel err
    none = _rows(profile_table(df, distinct="none"))
    assert ("k", "n_distinct") not in none
    with pytest.raises(ValueError):
        profile_table(df, distinct="bogus")


def test_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    got = _rows(profile_table(df, cols=["b"]))
    assert ("a", "n_null") not in got
    assert got[("b", "max")] == (None, None, "x")


def test_single_aggregation_job(spark):
    # the whole profile must be ONE aggregate over the scan (plus the
    # explode of its single row) — no per-column subplans
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_empty_table_null_counts_are_zero(spark):
    # sum over zero rows is NULL; count(when) must report 0 (round-6 review)
    df = spark.createDataFrame([], "a long, b string")
    rows = profile_table(df).collect()
    nulls = {r["col_name"]: r["value_long"] for r in rows if r["metric"] == "n_null"}
    assert nulls == {"a": 0, "b": 0}
