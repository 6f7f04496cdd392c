"""Event-time windowing (reference §2.7, ``src/window.rs``,
``src/helpers/tumbling.rs``, ``src/helpers/windowed_combine.rs``).

The reference supports **tumbling windows only**: ``Window::tumble(ts, size,
offset)`` with window start ``offset + floor((ts-offset)/size)*size``,
closed-open ``[start, end)`` (``src/window.rs:85-96``).  We reproduce those
exact boundary semantics with integer epoch-millis arithmetic (bit-exact,
oracle-comparable, and cheaper than the struct-typed ``F.window`` — a single
codegen'd expression, no struct allocation per row).

Beyond the reference we add sliding and session windows (free in Spark,
required by any real event pipeline) — marked as extensions.

Precondition inherited from the reference: ``offset <= min(ts)`` (the Rust
code would underflow on ``ts < offset``, ``src/window.rs:88``); here negative
relative times still floor correctly, so we are strictly more permissive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "to_epoch_ms",
    "to_epoch_us",
    "to_event_time",
    "tumble_start",
    "key_by_window",
    "combine_per_window",
    "combine_per_key_and_window",
    "slide_windows",
    "session_window_agg",
]


def to_epoch_ms(df: DataFrame, ts_col: str) -> Column:
    """Epoch-millis view of an event-time column, dtype-aware.

    Accepts TIMESTAMP (``unix_millis``) or int64 nanoseconds (the ``events``
    table read under ``nanosAsLong`` — floor ``div`` in pure int64, since
    1.7e18 ns exceeds double's 2^53 exact range).
    """
    dt = df.schema[ts_col].dataType.simpleString()
    if dt in ("bigint", "int"):
        return F.expr(f"`{ts_col}` div 1000000")
    return F.unix_millis(F.col(ts_col))


def to_epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Epoch-micros view of an event-time column, dtype-aware.

    Same contract as :func:`to_epoch_ms` at microsecond resolution: int64
    columns are nanoseconds (``div 1000``), TIMESTAMP columns go through
    ``unix_micros`` (Spark timestamps are micro-resolution, so this is
    lossless and bit-exact with DuckDB's ``epoch_us``)."""
    dt = df.schema[ts_col].dataType.simpleString()
    if dt in ("bigint", "int"):
        return F.expr(f"`{ts_col}` div 1000")
    return F.unix_micros(F.col(ts_col))


def to_event_time(df: DataFrame, ts_col: str) -> Column:
    """TIMESTAMP view of an event-time column, dtype-aware (for streaming
    watermarks / ``F.window``).  int64 columns are nanoseconds and truncate
    to millis (the historical ``nanosAsLong`` read); TIMESTAMP columns pass
    through untouched."""
    dt = df.schema[ts_col].dataType.simpleString()
    if dt in ("bigint", "int"):
        return F.timestamp_millis(F.expr(f"`{ts_col}` div 1000000"))
    return F.col(ts_col)


def tumble_start(df: DataFrame, ts_col: str, size_ms: int, offset_ms: int = 0) -> Column:
    """Window start in epoch millis: ``offset + floor((ts-offset)/size)*size``
    (reference ``Window::tumble``, ``src/window.rs:85-96``).  Floor semantics
    hold for pre-offset timestamps too.

    start = offset + floor(rel/size)*size == ts - (rel mod size), computed in
    pure int64 (no FP division → no ulp edge cases, stays in codegen).
    """
    ts = to_epoch_ms(df, ts_col)
    rel = ts - F.lit(offset_ms)
    mod = ((rel % F.lit(size_ms)) + F.lit(size_ms)) % F.lit(size_ms)
    return (ts - mod).alias("window_start")


def key_by_window(
    df: DataFrame, ts_col: str, size_ms: int, offset_ms: int = 0
) -> DataFrame:
    """Attach a ``window_start`` key column (reference ``key_by_window``,
    ``src/helpers/tumbling.rs:83``)."""
    return df.withColumn("window_start", tumble_start(df, ts_col, size_ms, offset_ms))


def combine_per_window(
    df: DataFrame, ts_col: str, size_ms: int, *aggs: Column, offset_ms: int = 0
) -> DataFrame:
    """Windowed global aggregate (reference ``combine_per_window``,
    ``src/helpers/windowed_combine.rs:114``).  One hash shuffle on the window
    key; Spark plans partial aggregation map-side."""
    return key_by_window(df, ts_col, size_ms, offset_ms).groupBy("window_start").agg(*aggs)


def combine_per_key_and_window(
    df: DataFrame,
    ts_col: str,
    size_ms: int,
    keys: list[str],
    *aggs: Column,
    offset_ms: int = 0,
) -> DataFrame:
    """Keyed windowed aggregate (reference ``combine_per_key_and_window``,
    ``src/helpers/windowed_combine.rs:355``)."""
    return (
        key_by_window(df, ts_col, size_ms, offset_ms)
        .groupBy(*keys, "window_start")
        .agg(*aggs)
    )


def slide_windows(
    df: DataFrame, ts_col: str, size_ms: int, slide_ms: int, offset_ms: int = 0
) -> DataFrame:
    """EXTENSION (not in the reference — SURVEY §2.7 verifies tumbling only):
    sliding windows via explode of the ``size/slide`` covering window starts.
    Row amplification factor is exactly ``size/slide`` — keep small at scale."""
    if size_ms % slide_ms != 0:
        raise ValueError("size_ms must be a multiple of slide_ms")
    n = size_ms // slide_ms
    ts = to_epoch_ms(df, ts_col)
    rel = ts - F.lit(offset_ms)
    mod = ((rel % F.lit(slide_ms)) + F.lit(slide_ms)) % F.lit(slide_ms)
    first = ts - mod - F.lit(size_ms - slide_ms)  # earliest covering start, int64

    starts = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)), lambda i: first + i * F.lit(slide_ms)
    )
    out = df.withColumn("_tms", ts).withColumn("window_start", F.explode(starts))
    # windows that start after ts are impossible; guard for exactness
    return out.filter(
        (F.col("_tms") >= F.col("window_start"))
        & (F.col("_tms") < F.col("window_start") + F.lit(size_ms))
    ).drop("_tms")


def session_window_agg(
    df: DataFrame, ts_col: str, gap_ms: int, keys: list[str], *aggs: Column
) -> DataFrame:
    """EXTENSION: gap-based session windows, batch flavor.

    Classic gaps-and-islands: a session boundary is a gap > ``gap_ms`` from
    the previous event of the same key; session id = running count of
    boundaries.  One shuffle (window partitionBy) + one aggregation — scales
    as long as a single key's events fit a partition (same constraint as
    Spark's own ``session_window``).
    """
    from pyspark.sql import Window as W

    ts = to_epoch_ms(df, ts_col)
    w = W.partitionBy(*keys).orderBy(ts)
    boundary = (
        (ts - F.lag(ts).over(w)).isNull() | ((ts - F.lag(ts).over(w)) > F.lit(gap_ms))
    ).cast("long")
    sdf = df.withColumn("_boundary", boundary).withColumn(
        "session_id", F.sum("_boundary").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sdf.groupBy(*keys, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            *aggs,
        )
        .drop("session_id")
    )
