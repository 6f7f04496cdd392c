"""First-touch funnel (operators/funnel.py) vs a brute-force reference:
t1 = min ts(step1), t_k = earliest step_k event in [t_{k-1}, t_{k-1}+gap];
abandons propagate NULLs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ironbeam_spark.operators.funnel import funnel_counts, funnel_steps

STEPS = ["view", "click", "purchase"]


def _ref(events, gap):
    """events: list[(user, ts_us, type)] -> {user: [t1, t2, t3] with Nones}."""
    out = {}
    for u in {e[0] for e in events}:
        mine = [(t, ty) for (uu, t, ty) in events if uu == u]
        times = []
        prev = None
        for i, step in enumerate(STEPS):
            cands = [
                t for (t, ty) in mine
                if ty == step
                and (i == 0 or (prev is not None and prev <= t <= prev + gap))
            ]
            cur = min(cands) if cands and (i == 0 or prev is not None) else None
            times.append(cur)
            prev = cur
        if times[0] is not None:
            out[u] = times
    return out


def _run(spark, events, gap):
    df = spark.createDataFrame(
        [(u, t, ty) for (u, t, ty) in events], "user_id long, ts long, ignore string"
    ).withColumnRenamed("ignore", "event_type")
    # ts as int64 NANOseconds (to_epoch_us int64 contract is ns div 1000)
    df = df.withColumn("ts", F.col("ts") * 1000)
    out = funnel_steps(
        df, "user_id", "ts",
        [(s, F.col("event_type") == s) for s in STEPS],
        max_gap_us=gap,
    )
    return out


def test_basic_and_abandons(spark):
    gap = 100
    events = [
        (1, 10, "view"), (1, 50, "click"), (1, 120, "purchase"),   # full funnel
        (2, 10, "view"), (2, 200, "click"),                        # click too late
        (3, 10, "click"), (3, 20, "purchase"),                     # never viewed
        (4, 10, "view"),                                           # view only
        (5, 30, "purchase"), (5, 40, "view"), (5, 45, "click"),    # order matters
    ]
    rows = {r["user_id"]: r for r in _run(spark, events, gap).collect()}
    assert rows[1]["depth"] == 3 and rows[1]["purchase_us"] == 120
    assert rows[2]["depth"] == 1 and rows[2]["click_us"] is None
    assert 3 not in rows  # no step-1 completion, no row
    assert rows[4]["depth"] == 1
    # user 5's purchase precedes the view -> depth 2 only
    assert rows[5]["depth"] == 2 and rows[5]["purchase_us"] is None


def test_first_touch_picks_earliest_chain(spark):
    gap = 1000
    events = [
        (9, 10, "view"), (9, 5, "click"),   # click BEFORE first view: not counted
        (9, 30, "click"), (9, 70, "click"), # earliest satisfying click = 30
        (9, 60, "purchase"),                # purchase >= t2(30) -> counts
    ]
    r = _run(spark, events, gap).collect()[0]
    assert (r["view_us"], r["click_us"], r["purchase_us"], r["depth"]) == (
        10, 30, 60, 3,
    )


def test_fuzz_against_reference(spark):
    rng = random.Random(606)
    events = [
        (rng.randrange(12), rng.randrange(500), rng.choice(STEPS + ["noise"]))
        for _ in range(300)
    ]
    gap = 80
    want = _ref(events, gap)
    got = {
        r["user_id"]: [r["view_us"], r["click_us"], r["purchase_us"]]
        for r in _run(spark, events, gap).collect()
    }
    assert got == want


def test_funnel_counts(spark):
    gap = 100
    events = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        (2, 0, "view"), (2, 10, "click"),
        (3, 0, "view"),
    ]
    per_user = _run(spark, events, gap)
    rows = {r["step"]: r for r in funnel_counts(per_user, STEPS).collect()}
    assert [rows[s]["n_users"] for s in STEPS] == [3, 2, 1]
    assert [rows[s]["step_idx"] for s in STEPS] == [1, 2, 3]
