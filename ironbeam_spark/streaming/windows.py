"""Structured Streaming variants of the windowed operators (SURVEY §2.7).

The reference is batch-only — streaming (watermarks, triggers, late data) is
explicitly out of its scope (reference ``FEATURE_PARITY_PLAN.md:6-11``).  We
expose the same tumbling/sliding aggregations over unbounded input because
the DataFrame code is shared: ``F.window`` group-aggregations work identically
in batch and streaming when designed DataFrame-first.

Design notes for scale:
- Watermarks bound state: without one, a streaming windowed agg keeps every
  window forever.  ``delay`` is the late-data allowance.
- ``session_window`` is Spark's native gap-session operator (the batch
  analogue in operators/windowing.py is gaps-and-islands).
- Output mode "append" only emits closed windows (watermark passed) —
  the semantics a downstream consumer of finalized aggregates wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_agg",
]


def _win_lit(ms: int) -> str:
    return f"{ms} milliseconds"


def stream_tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size_ms: int,
    keys: list[str],
    *aggs: Column,
    watermark_ms: int = 0,
) -> DataFrame:
    """Tumbling-window aggregate usable on batch or streaming input.

    Matches the reference's ``Window::tumble`` bucket boundaries for
    offset=0 (``src/window.rs:85-96``); emits ``window_start`` epoch millis.
    """
    wdf = df
    if df.isStreaming and watermark_ms > 0:
        wdf = df.withWatermark(ts_col, _win_lit(watermark_ms))
    win = F.window(F.col(ts_col), _win_lit(size_ms))
    return (
        wdf.groupBy(*keys, win)
        .agg(*aggs)
        .withColumn("window_start", F.unix_millis(F.col("window.start")))
        .drop("window")
    )


def stream_sliding_agg(
    df: DataFrame,
    ts_col: str,
    size_ms: int,
    slide_ms: int,
    keys: list[str],
    *aggs: Column,
    watermark_ms: int = 0,
) -> DataFrame:
    wdf = df
    if df.isStreaming and watermark_ms > 0:
        wdf = df.withWatermark(ts_col, _win_lit(watermark_ms))
    win = F.window(F.col(ts_col), _win_lit(size_ms), _win_lit(slide_ms))
    return (
        wdf.groupBy(*keys, win)
        .agg(*aggs)
        .withColumn("window_start", F.unix_millis(F.col("window.start")))
        .drop("window")
    )


def stream_session_agg(
    df: DataFrame,
    ts_col: str,
    gap_ms: int,
    keys: list[str],
    *aggs: Column,
    watermark_ms: int = 0,
) -> DataFrame:
    wdf = df
    if df.isStreaming and watermark_ms > 0:
        wdf = df.withWatermark(ts_col, _win_lit(watermark_ms))
    win = F.session_window(F.col(ts_col), _win_lit(gap_ms))
    return (
        wdf.groupBy(*keys, win)
        .agg(*aggs)
        .withColumn("session_start", F.unix_millis(F.col("session_window.start")))
        .withColumn("session_end", F.unix_millis(F.col("session_window.end")))
        .drop("session_window")
    )
