"""Time-bucket rollup cascades (hypertable-style continuous aggregates).

The TimescaleDB/druid pattern — public systems: raw events aggregate into
minute buckets, minutes into hours, hours into days, and each level is
maintained FROM THE PREVIOUS one, never from raw.  At 100 TB the win is
exactly that: the day-level refresh reads 24 hour-rows per key instead of
a day of raw events, and a backfill touches one coarse partition.  The
algebra that makes the cascade sound is re-aggregatability: only
decomposable aggregates (count/sum/min/max — monoid combines) may ride
the cascade; mean is DERIVED at read time (``sum/count``), never stored,
or the cascade would silently average averages.  (``avg`` is therefore
rejected here, not miscomputed.)

Exactness: bucketing is exact integer epoch-micros division (the tumble
arithmetic of ``operators/windowing``); sums ride scaled int64 — a
float sum would re-associate differently per level and the cascade
invariant ``rollup(rollup(raw)) == rollup(raw)`` could not hash-match,
which is precisely what the registry oracle checks.

Plan shape: each level is ONE map-side-combinable groupBy on
``(keys, bucket)``; the level-N shuffle is bounded by the level-(N-1)
row count, which shrinks geometrically with the bucket ratio.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_bucket_agg", "rollup_cascade", "rollup_merge"]

def time_bucket_agg(
    df: DataFrame,
    ts_col: str,
    bucket_us: int,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Level-0 aggregation of raw rows into ``bucket_us`` buckets:
    ``keys..., bucket_us_start, n, sum, min, max`` (value must already be
    exact int64 — scale money to cents first)."""
    from ironbeam_spark.operators.windowing import to_epoch_us

    us = to_epoch_us(df, ts_col)
    # pmod, not %: Spark's % follows the dividend sign, so a plain
    # us - us%b would assign a pre-epoch row to a bucket whose
    # [start, start+size) range does not contain it — FLOOR semantics,
    # same as operators/windowing.tumble_start
    bucket = (us - F.pmod(us, F.lit(bucket_us))).alias("bucket_start_us")
    return (
        df.select(*key_cols, bucket, F.col(value_col).alias("_v"))
        .groupBy(*key_cols, "bucket_start_us")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_v").cast("long").alias("sum"),
            F.min("_v").alias("min"),
            F.max("_v").alias("max"),
        )
    )


def _coarsen(
    level: DataFrame, key_cols: Sequence[str], bucket_us: int
) -> DataFrame:
    """One cascade step: re-aggregate a finer level into coarser buckets
    using only the monoid combines."""
    bucket = (
        F.col("bucket_start_us")
        - F.pmod(F.col("bucket_start_us"), F.lit(bucket_us))
    ).alias("bucket_start_us")  # pmod: floor semantics (see _level0)
    return (
        level.select(*key_cols, bucket, "n", "sum", "min", "max")
        .groupBy(*key_cols, "bucket_start_us")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum").cast("long").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    bucket_us_levels: Sequence[int],
) -> list[DataFrame]:
    """The full cascade, finest first.  Each coarser level derives from
    the previous level, never from raw — ``levels[i+1]`` must be an
    integer multiple of ``levels[i]`` (checked: a non-aligned coarse
    bucket would split a fine bucket and the cascade would be wrong, not
    just slow)."""
    levels = list(bucket_us_levels)
    if not levels:
        raise ValueError("rollup_cascade: need at least one level")
    for a, b in zip(levels, levels[1:]):
        if b % a != 0:
            raise ValueError(
                f"rollup_cascade: level {b} is not a multiple of {a}"
            )
    out = [time_bucket_agg(df, ts_col, levels[0], key_cols, value_col)]
    for bucket_us in levels[1:]:
        out.append(_coarsen(out[-1], key_cols, bucket_us))
    return out


def rollup_merge(
    existing: DataFrame,
    delta: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Incrementally fold a batch of raw rows into one stored rollup
    level: ``rollup_merge(time_bucket_agg(older), newer) ==
    time_bucket_agg(older ∪ newer)`` — unconditionally, because every
    stored statistic is a monoid (count/sum/min/max combine associatively
    and commutatively), so unlike the SCD2 merge there is NO append-only
    precondition: late rows land in their (old) bucket and combine
    exactly.

    This is the refresh loop of a continuous aggregate: the delta
    aggregates down to |its buckets| rows first (map-side combinable),
    then ONE groupBy over ``|existing| + |delta buckets|`` re-combines —
    at 100 TB the stored level never re-reads raw history, and an idle
    bucket costs one pass-through row."""
    fresh = time_bucket_agg(delta, ts_col, bucket_us, key_cols, value_col)
    return (
        existing.unionByName(fresh)
        .groupBy(*key_cols, "bucket_start_us")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum").cast("long").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )
