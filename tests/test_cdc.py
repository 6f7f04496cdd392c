"""CDC apply/merge (operators/cdc.py): brute-force parity, tombstones,
resurrection, and the split-merge == full-apply invariant."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ironbeam_spark.operators.cdc import apply_changes, merge_changes

SCHEMA = "key long, ts long, seq long, op string, val string"


def _df(spark, rows):
    # int64 ts contract: nanoseconds -> _us = ts // 1000
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts") * 1000
    )


def _ref(rows):
    """rows: (key, ts_us, seq, op, val) -> {key: (val, us)} after apply."""
    latest = {}
    for k, t, s, op, v in rows:
        cur = latest.get(k)
        if cur is None or (t, s) > cur[0]:
            latest[k] = ((t, s), op, v)
    return {
        k: (v, ts_seq[0])
        for k, (ts_seq, op, v) in latest.items()
        if op != "D"
    }


def _snap(df):
    return {
        r["key"]: (r["val"], r["_us"]) for r in df.collect()
    }


def test_apply_latest_wins_and_tombstones(spark):
    rows = [
        (1, 10, 0, "U", "a"), (1, 20, 1, "U", "b"),
        (2, 10, 0, "U", "x"), (2, 30, 1, "D", None),   # deleted
        (3, 10, 0, "D", None), (3, 15, 1, "U", "back"),  # resurrected
        (4, 5, 0, "U", "t1"), (4, 5, 1, "U", "t2"),    # seq tiebreak
    ]
    got = _snap(
        apply_changes(
            _df(spark, rows), ["key"], "ts",
            op_col="op", tiebreak_cols=["seq"],
        )
    )
    assert got == {1: ("b", 20), 3: ("back", 15), 4: ("t2", 5)}


def test_merge_equals_full_apply_on_time_split(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(12), rng.randrange(100), i,
         rng.choice(["U", "U", "U", "D"]), rng.choice(["p", "q", "r"]))
        for i in range(400)
    ]
    full = _snap(
        apply_changes(
            _df(spark, rows), ["key"], "ts",
            op_col="op", tiebreak_cols=["seq"],
        )
    )
    assert full == _ref(rows)
    for cutoff in (0, 50, 100):
        older = [r for r in rows if r[1] < cutoff]
        newer = [r for r in rows if r[1] >= cutoff]
        snap = apply_changes(
            _df(spark, older), ["key"], "ts",
            op_col="op", tiebreak_cols=["seq"],
        )
        merged = merge_changes(
            snap, _df(spark, newer), ["key"], ts_col="ts",
            op_col="op", tiebreak_cols=["seq"],
        )
        assert _snap(merged) == full, f"cutoff={cutoff}"


def test_merge_change_beats_snapshot_even_if_older_ts(spark):
    # generation precedence: a late-arriving change with a SMALLER ts still
    # overrides the snapshot row for its key
    snap = apply_changes(
        _df(spark, [(1, 100, 0, "U", "new")]), ["key"], "ts",
        op_col="op", tiebreak_cols=["seq"],
    )
    merged = merge_changes(
        snap, _df(spark, [(1, 50, 1, "U", "late")]), ["key"], ts_col="ts",
        op_col="op", tiebreak_cols=["seq"],
    )
    assert _snap(merged) == {1: ("late", 50)}


def test_merge_without_op_col_is_pure_upsert(spark):
    snap = apply_changes(_df(spark, [(1, 10, 0, "U", "a")]), ["key"], "ts",
                         op_col="op", tiebreak_cols=["seq"])
    changes = _df(spark, [(1, 20, 1, "U", "b"), (2, 5, 2, "U", "c")]).drop("op")
    merged = merge_changes(snap, changes, ["key"], ts_col="ts",
                           tiebreak_cols=["seq"])
    assert _snap(merged) == {1: ("b", 20), 2: ("c", 5)}
