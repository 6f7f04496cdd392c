"""Streaming deduplication (Structured Streaming state-store dedup).

The batch-side dedup family (``operators/dedup.py``) answers "which rows
are duplicates in this corpus"; this module answers the ingestion-time
variant: "drop records already seen on the stream" — the shape a training-
data pipeline uses to keep an append-only corpus exact-dup-free as shards
arrive.

Two state-retention contracts, mirroring Spark's own API split:

- :func:`stream_distinct` — exact, unbounded state: every key ever seen is
  remembered (RocksDB-backed state store scales this beyond executor
  memory; still O(distinct keys) storage).  Use when the key universe is
  bounded (content hashes of a curated corpus).
- :func:`stream_dedup_within_watermark` — bounded state: duplicates are
  only suppressed while their event time is above the watermark; state for
  older keys is dropped.  This is the 100 TB-safe contract — state size is
  O(keys per watermark window) — at the cost of re-admitting a duplicate
  that recurs after the window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["stream_distinct", "stream_dedup_within_watermark"]


def stream_distinct(sdf: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact streaming distinct on ``cols`` (unbounded state store).

    Emits each distinct key combination once (append semantics).  Selecting
    the key columns first keeps BOTH the state store and the output
    deterministic: full-row dedup would keep the arbitrary first-arriving
    row per key, which no batch oracle can reproduce."""
    return sdf.select(*cols).dropDuplicates(list(cols))


def stream_dedup_within_watermark(
    sdf: DataFrame,
    keys: Sequence[str],
    event_time_col: str,
    watermark: str,
) -> DataFrame:
    """Watermark-bounded streaming dedup: a duplicate arriving while its
    first occurrence's event time is still above the watermark is dropped;
    state older than the watermark is evicted (Spark's
    ``dropDuplicatesWithinWatermark``).  Keeps ALL columns of the first
    occurrence — callers needing deterministic replay should dedup on a
    content key and project it, as :func:`stream_distinct` does."""
    return sdf.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
