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
    how: str = "inner",
) -> DataFrame:
    """Join rows of the same key where ``right_ts`` lies in
    ``[left_ts + lower_ms, left_ts + upper_ms)`` (both TIMESTAMP columns).

    Works identically on batch DataFrames (no watermark applied) and on
    streaming ones (both sides watermarked, state evictable).  Column names
    of ``left``/``right`` must be disjoint apart from ``on``.

    ``how="left_outer"`` keeps unmatched left rows (right columns null).
    Streaming caveat, inherent to watermark semantics: a null-extended row
    only emits once the watermark passes ``left_ts + upper_ms``, so left
    rows near the end of a bounded stream never get their outer output —
    consumers comparing against batch must restrict to
    ``left_ts < max_event_time - (watermark + upper)`` on BOTH sides (the
    registry query and tests do exactly that).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("stream_interval_join: how must be inner|left_outer")
    l_df, r_df = left, right
    if left.isStreaming and watermark_ms > 0:
        l_df = left.withWatermark(left_ts, f"{watermark_ms} milliseconds")
    if right.isStreaming and watermark_ms > 0:
        r_df = right.withWatermark(right_ts, f"{watermark_ms} milliseconds")
    # explicit aliases: both sides often derive from the SAME source (a
    # self-join on one stream), where dataframe-reference disambiguation
    # (l_df[k] vs r_df[k]) resolves both to one attribute — an outer join
    # then silently keeps the null right-side key instead of the left's
    l_a, r_a = l_df.alias("__ij_l"), r_df.alias("__ij_r")

    def _lcol(c: str):  # backtick-quote: column names containing '.' or
        return F.col("__ij_l.`" + c.replace("`", "``") + "`")

    def _rcol(c: str):  # '(' (e.g. upstream 'sum(value)') must not parse
        return F.col("__ij_r.`" + c.replace("`", "``") + "`")  # as paths

    cond = None
    for k in on:
        c = _lcol(k) == _rcol(k)
        cond = c if cond is None else (cond & c)
    lo = _rcol(right_ts) >= _lcol(left_ts) + F.expr(
        f"INTERVAL {lower_ms} MILLISECONDS"
    )
    hi = _rcol(right_ts) < _lcol(left_ts) + F.expr(
        f"INTERVAL {upper_ms} MILLISECONDS"
    )
    joined = l_a.join(r_a, cond & lo & hi, how)
    # keys always come from the LEFT side (never null under left_outer);
    # right side contributes only its non-key columns
    out = [_lcol(c).alias(c) for c in l_df.columns] + [
        _rcol(c).alias(c) for c in r_df.columns if c not in set(on)
    ]
    return joined.select(*out)
