"""Sequential funnel analysis over event streams (first-touch semantics).

The product-analytics staple the reference's windowing family stops short
of (its closest surfaces are tumbling windows and the as-of join,
reference src/operators/windowing.rs) and a natural fit for the events
table: for each user, walk an ordered list of step predicates and find the
EARLIEST completion of each step that follows the previous step's
completion — ``t1 = min ts(step1)``, ``t_k = min ts(step_k) >= t_{k-1}``
(optionally within ``max_gap`` of it).  First-touch is the
industry-default funnel definition and — unlike "any satisfying
subsequence" — is expressible as a chain of per-user MIN aggregates, each
one map-side combinable.

Plan shape: one filtered aggregate per step plus a per-user equi-join
between consecutive steps — k steps = k linear passes over the (already
type-filtered) event subsets, every shuffle keyed on the user id.  No
windows over the raw stream, no per-user event sorting, no state that
grows with events-per-user: the reduction happens inside the aggregates.
At 100 TB of events this is k narrow shuffles of (user, min_ts) pairs —
the raw stream itself is never reshuffled.  Timestamps are compared in
epoch microseconds (exact int64), so a SQL oracle can mirror the chain
with zero float tolerance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "funnel_counts"]


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    max_gap_us: int | None = None,
) -> DataFrame:
    """Per-user funnel completion times.

    ``steps``: ordered ``(name, predicate)`` pairs.  Returns one row per
    user who completed at least step 1, with columns ``<name>_us``
    (epoch-micros completion time, NULL once the funnel is abandoned) and
    ``depth`` (number of completed steps).  ``max_gap_us`` bounds the gap
    between CONSECUTIVE completions (a user who converts later than the
    gap is an abandon at that step, matching the funnel-window semantics
    of the usual analytics engines)."""
    if len(steps) < 1:
        raise ValueError("funnel_steps: need at least one step")
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError("funnel_steps: step names must be unique")

    from ironbeam_spark.operators.windowing import to_epoch_us

    us = to_epoch_us(events, ts_col)
    name0, pred0 = steps[0]
    cur = (
        events.where(pred0)
        .groupBy(user_col)
        .agg(F.min(us).alias(f"{name0}_us"))
    )
    prev_col = f"{name0}_us"
    for name, pred in steps[1:]:
        nxt = events.where(pred).select(F.col(user_col), us.alias("_ts"))
        cond = F.col("_ts") >= F.col(prev_col)
        if max_gap_us is not None:
            cond = cond & (F.col("_ts") <= F.col(prev_col) + F.lit(max_gap_us))
        # left join keeps abandons; min over the satisfying events is the
        # step's first-touch completion (NULL when none satisfies)
        cur = (
            cur.join(nxt, on=user_col, how="left")
            .withColumn("_ok", F.when(cond, F.col("_ts")))
            .groupBy(user_col, *[f"{n}_us" for n in names if f"{n}_us" in cur.columns])
            .agg(F.min("_ok").alias(f"{name}_us"))
        )
        prev_col = f"{name}_us"

    depth = sum(
        (F.col(f"{n}_us").isNotNull()).cast("long") for n in names
    )
    return cur.withColumn("depth", depth)


def funnel_counts(per_user: DataFrame, step_names: Sequence[str]) -> DataFrame:
    """Collapse :func:`funnel_steps` output to the classic funnel table:
    ``(step, step_idx, n_users)`` — users whose depth reaches each step."""
    aggs = [
        # coalesce: sum over ZERO rows is NULL — an empty funnel must
        # report 0 users per step, not NULL
        F.coalesce(
            F.sum((F.col("depth") >= i + 1).cast("long")), F.lit(0)
        ).alias(n)
        for i, n in enumerate(step_names)
    ]
    wide = per_user.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("step"),
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.col(n).alias("n_users"),
            )
            for i, n in enumerate(step_names)
        ]
    )
    return wide.select(F.explode(pairs).alias("_s")).select(
        "_s.step", "_s.step_idx", "_s.n_users"
    )
