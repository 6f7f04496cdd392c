"""Stream-stream joins with event-time bounds (north-star extension — the
reference is batch-only, ``FEATURE_PARITY_PLAN.md:6-11``).

Spark executes a stream-stream join by buffering both sides in the state
store; an unbounded join would buffer forever.  The two levers that make it
viable at scale, both mandatory here:

- **watermarks on both sides** bound how late input can arrive;
- **a time-range join condition** bounds how long a buffered row can still
  match, letting the state store evict.

State size is then O(input rate × window span) per key — the same math as a
windowed aggregation — and the join itself is hash-partitioned on the equi
keys like any batch join.  Batch equivalence under ``Trigger.AvailableNow``
is asserted in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    watermark_ms: int = 0,
) -> DataFrame:
    """Join rows of the same key where ``right_ts`` lies in
    ``[left_ts + lower_ms, left_ts + upper_ms)`` (both TIMESTAMP columns).

    Works identically on batch DataFrames (no watermark applied) and on
    streaming ones (both sides watermarked, state evictable).  Column names
    of ``left``/``right`` must be disjoint apart from ``on``.
    """
    l_df, r_df = left, right
    if left.isStreaming and watermark_ms > 0:
        l_df = left.withWatermark(left_ts, f"{watermark_ms} milliseconds")
    if right.isStreaming and watermark_ms > 0:
        r_df = right.withWatermark(right_ts, f"{watermark_ms} milliseconds")
    cond = None
    for k in on:
        c = l_df[k] == r_df[k]
        cond = c if cond is None else (cond & c)
    lo = r_df[right_ts] >= l_df[left_ts] + F.expr(f"INTERVAL {lower_ms} MILLISECONDS")
    hi = r_df[right_ts] < l_df[left_ts] + F.expr(f"INTERVAL {upper_ms} MILLISECONDS")
    joined = l_df.join(r_df, cond & lo & hi)
    # drop the duplicate key columns from the right side
    for k in on:
        joined = joined.drop(r_df[k])
    return joined
