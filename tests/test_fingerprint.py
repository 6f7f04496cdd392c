"""Dataset fingerprint + table diff (operators/fingerprint.py)."""

from __future__ import annotations

import pytest

from ironbeam_spark.operators.fingerprint import (
    dataset_fingerprint,
    table_diff,
)

SCHEMA = "k long, s string, flag boolean"
ROWS = [(1, "a", True), (2, "b", False), (3, None, True), (4, "d", None)]


def _fp(spark, rows, parts=None):
    df = spark.createDataFrame(rows, SCHEMA)
    if parts:
        df = df.repartition(parts)
    r = dataset_fingerprint(df, ["k", "s", "flag"]).collect()[0]
    return r["n_rows"], r["fingerprint"]


def test_order_and_partition_invariance(spark):
    base = _fp(spark, ROWS)
    assert _fp(spark, list(reversed(ROWS))) == base
    assert _fp(spark, ROWS, parts=7) == base


def test_sensitive_to_any_change(spark):
    base = _fp(spark, ROWS)
    assert _fp(spark, ROWS + [(5, "e", True)]) != base           # added row
    assert _fp(spark, [(1, "a", False)] + ROWS[1:]) != base      # flipped bool
    assert _fp(spark, [(1, "A", True)] + ROWS[1:]) != base       # case change
    # NULL vs empty string must differ (sentinel encoding)
    assert _fp(spark, [(3, "", True)]) != _fp(spark, [(3, None, True)])


def test_rejects_float_columns(spark):
    df = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(TypeError):
        dataset_fingerprint(df, ["x"])


def test_diff_classifies_all_statuses(spark):
    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "Y"), (4, "w")], "k long, v string"
    )
    got = {
        r["k"]: r["status"]
        for r in table_diff(a, b, ["k"], ["v"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_equal_tables_have_equal_fingerprints_and_empty_diff(spark):
    a = spark.createDataFrame(ROWS, SCHEMA)
    b = spark.createDataFrame(list(reversed(ROWS)), SCHEMA).repartition(3)
    fa = dataset_fingerprint(a, ["k", "s", "flag"]).collect()[0]
    fb = dataset_fingerprint(b, ["k", "s", "flag"]).collect()[0]
    assert (fa["n_rows"], fa["fingerprint"]) == (fb["n_rows"], fb["fingerprint"])
    d = table_diff(a, b, ["k"], ["s", "flag"])
    assert d.where(d.status != "unchanged").count() == 0
