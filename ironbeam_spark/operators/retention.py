"""Cohort retention analysis over event streams.

The second product-analytics staple next to funnels (operators/funnel.py),
absent from the reference's windowing family (its closest surface is the
tumbling window, reference src/window.rs): bucket each user into the cohort
of their FIRST activity period, then count, for every (cohort, period
offset) cell, the distinct users active in that period.  The classic
triangular retention matrix.

Plan shape — two aggregates and one broadcast-sized join:

1. ``first`` — per-user min activity period: one combinable MIN aggregate
   over the (user, period) projection, map-side-combined before the single
   user-keyed shuffle.
2. activity grid — distinct (user, period) pairs: same shuffle key, so AQE
   reuses the exchange when both sides derive from one scan.
3. join activity to ``first`` on user (per-user table ≪ events — at 100 TB
   of events the user dimension is what fits in a broadcast or a bucketed
   join) and aggregate ``count(distinct user)`` per (cohort, offset).

Periods are exact integer arithmetic on epoch-micros (``us div
period_us``), so a SQL oracle matches bit-for-bit; no session or calendar
logic that could round differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "retention_rates"]

DAY_US = 24 * 3600 * 1_000_000


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_us: int = DAY_US,
) -> DataFrame:
    """Triangular retention matrix ``(cohort_period, period_offset,
    n_users)``.

    ``cohort_period`` = the user's first activity period (epoch-micros
    FLOOR-divided by ``period_us``, exact int64 — truncation would
    mislabel pre-epoch periods); ``period_offset`` = activity period minus
    cohort period (0 = the cohort's own period, so ``n_users`` at offset 0
    is the cohort size).  Distinct users per cell — a user active twice in
    a period counts once."""
    from ironbeam_spark.operators.windowing import to_epoch_us

    act = events.select(
        F.col(user_col).alias("user"),
        (to_epoch_us(events, ts_col)).alias("_us"),
    ).select(
        "user",
        # floor division, exact in int64: div alone truncates toward zero,
        # mislabeling pre-epoch periods; subtracting the positive mod
        # first makes the dividend exactly divisible (same floor semantics
        # as windowing.tumble_start)
        F.expr(
            f"(_us - pmod(_us, {int(period_us)})) div {int(period_us)}"
        ).alias("period"),
    ).distinct()
    first = act.groupBy("user").agg(F.min("period").alias("cohort_period"))
    return (
        act.join(first, on="user")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct("user").alias("n_users"))
    )


def retention_rates(matrix: DataFrame) -> DataFrame:
    """Attach the cohort size and the retention ratio to each cell.

    The ratio is emitted as the exact rational pair plus ONE IEEE division
    (``n_users / cohort_size``), bit-exact cross-engine (SCALE.md)."""
    size = matrix.where(F.col("period_offset") == 0).select(
        "cohort_period", F.col("n_users").alias("cohort_size")
    )
    return matrix.join(size, on="cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_users",
        "cohort_size",
        (
            F.col("n_users").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )
