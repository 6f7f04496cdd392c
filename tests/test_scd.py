"""SCD2 history (operators/scd.py): brute-force parity, null transitions,
as-of snapshots, and the one-shuffle plan claim."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ironbeam_spark.operators.scd import scd2_as_of, scd2_history


def _ref(rows):
    """rows: list[(key, ts_us, seq, attr)] -> list of version dicts."""
    out = []
    for k in sorted({r[0] for r in rows}):
        mine = sorted([r for r in rows if r[0] == k], key=lambda r: (r[1], r[2]))
        versions = []
        prev = object()
        for _, t, _, a in mine:
            if a != prev if prev is not object() else True:
                if prev is object() or a != prev:
                    versions.append([t, None, a])
            prev = a
        for i in range(len(versions) - 1):
            versions[i][1] = versions[i + 1][0]
        for i, (vf, vt, a) in enumerate(versions):
            out.append(
                {"key": k, "version": i + 1, "attr": a,
                 "valid_from_us": vf, "valid_to_us": vt,
                 "is_current": vt is None}
            )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, ts long, seq long, attr string"
    ).withColumn("ts", F.col("ts") * 1000)  # int64 ts contract: nanoseconds
    return scd2_history(df, ["key"], "ts", ["attr"], tiebreak_cols=["seq"])


def test_collapse_and_validity(spark):
    rows = [
        (1, 10, 0, "a"), (1, 20, 1, "a"),   # no transition
        (1, 30, 2, "b"), (1, 40, 3, "a"),   # back-and-forth => 3 versions
        (2, 5, 0, "x"),
    ]
    got = sorted(
        ([r["key"], r["version"], r["attr"], r["valid_from_us"],
          r["valid_to_us"], r["is_current"]] for r in _run(spark, rows).collect())
    )
    assert got == [
        [1, 1, "a", 10, 30, False],
        [1, 2, "b", 30, 40, False],
        [1, 3, "a", 40, None, True],
        [2, 1, "x", 5, None, True],
    ]


def test_null_transitions_are_null_safe(spark):
    rows = [
        (7, 10, 0, None), (7, 20, 1, None),  # NULL -> NULL: no transition
        (7, 30, 2, "v"), (7, 40, 3, None),   # value <-> NULL: transitions
    ]
    vs = sorted(
        (r["version"], r["attr"]) for r in _run(spark, rows).collect()
    )
    assert vs == [(1, None), (2, "v"), (3, None)]


def test_as_of_snapshot(spark):
    rows = [(1, 10, 0, "a"), (1, 30, 1, "b"), (2, 50, 0, "z")]
    hist = _run(spark, rows)
    snap = {r["key"]: r["attr"] for r in scd2_as_of(hist, 30).collect()}
    assert snap == {1: "b"}  # key 2 not yet born at t=30
    snap2 = {r["key"]: r["attr"] for r in scd2_as_of(hist, 29).collect()}
    assert snap2 == {1: "a"}


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    rows = [
        (rng.randrange(8), rng.randrange(200), i, rng.choice(["a", "b", "c"]))
        for i in range(300)
    ]
    got = sorted(
        ([r["key"], r["version"], r["attr"], r["valid_from_us"],
          r["valid_to_us"], r["is_current"]] for r in _run(spark, rows).collect())
    )
    want = sorted(
        ([r["key"], r["version"], r["attr"], r["valid_from_us"],
          r["valid_to_us"], r["is_current"]] for r in _ref(rows))
    )
    assert got == want


def test_single_shuffle_plan(spark):
    rows = [(1, 10, 0, "a"), (1, 30, 1, "b")]
    df = spark.createDataFrame(
        rows, "key long, ts long, seq long, attr string"
    ).withColumn("ts", F.col("ts") * 1000)
    plan = (
        scd2_history(df, ["key"], "ts", ["attr"], tiebreak_cols=["seq"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_merge_equals_full_rebuild_on_time_split(spark):
    """scd2_merge(scd2_history(older), newer) == scd2_history(all) when the
    batches are time-split (the append-only contract)."""
    rng = random.Random(606)
    rows = [
        (rng.randrange(8), rng.randrange(200), i, rng.choice(["a", "b", "c"]))
        for i in range(300)
    ]

    def hist_set(df):
        return {
            (r["key"], r["version"], r["attr"], r["valid_from_us"],
             r["valid_to_us"], r["is_current"])
            for r in df.collect()
        }

    from ironbeam_spark.operators.scd import scd2_merge

    full = hist_set(_run(spark, rows))
    for cutoff in (0, 50, 120, 250):
        older = [r for r in rows if r[1] < cutoff]
        newer = [r for r in rows if r[1] >= cutoff]
        hist = _run(spark, older)
        merged = scd2_merge(
            hist,
            spark.createDataFrame(
                newer or [], "key long, ts long, seq long, attr string"
            ).withColumn("ts", F.col("ts") * 1000),
            ["key"], "ts", ["attr"], tiebreak_cols=["seq"],
        )
        assert hist_set(merged) == full, f"cutoff={cutoff}"


def test_merge_touches_only_batch_keys(spark):
    """Untouched keys pass through without a window pass (plan-shape: the
    stored rows appear verbatim, same version numbering)."""
    from ironbeam_spark.operators.scd import scd2_merge

    older = [(1, 10, 0, "a"), (1, 20, 1, "b"), (2, 10, 0, "x")]
    newer = [(1, 30, 2, "c")]
    hist = _run(spark, older)
    merged = scd2_merge(
        hist,
        spark.createDataFrame(newer, "key long, ts long, seq long, attr string")
        .withColumn("ts", F.col("ts") * 1000),
        ["key"], "ts", ["attr"], tiebreak_cols=["seq"],
    )
    got = sorted(
        (r["key"], r["version"], r["attr"], r["valid_to_us"])
        for r in merged.collect()
    )
    assert got == [
        (1, 1, "a", 20), (1, 2, "b", 30), (1, 3, "c", None),
        (2, 1, "x", None),
    ]
