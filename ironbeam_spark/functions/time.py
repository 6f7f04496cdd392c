"""Timezone-independent timestamp helpers.

The test tables store naive (NTZ) timestamps; we read them as TIMESTAMP whose
instant equals the naive value interpreted as UTC (see
:func:`ironbeam_spark.sources.io.read_table`).  Literals built with
``F.lit(str).cast("timestamp")`` would be parsed in the *session* timezone —
wrong under any non-UTC session.  ``ts_lit`` builds the instant from epoch
millis instead: timezone-independent AND still a foldable literal, so the
comparison is pushed down to the parquet scan (row-group min/max skipping),
unlike wrapping the column side in ``unix_millis``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["ts_lit", "epoch_ms"]


def epoch_ms(iso: str) -> int:
    """Epoch millis of a naive ISO date/datetime interpreted as UTC."""
    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def ts_lit(iso: str) -> Column:
    """A TIMESTAMP literal at the UTC instant of ``iso`` (pushdown-friendly)."""
    return F.timestamp_millis(F.lit(epoch_ms(iso)))
