"""Stream-static enrichment join — the most common production streaming
shape: an unbounded fact stream joined against a bounded dimension
(user → account, doc → source metadata, item → catalog row).

No reference analogue (the reference is batch-only); sibling of the
stream-stream joins in ``streaming/joins.py``.  Spark's semantics make
this the CHEAP streaming join: the static side is planned per micro-batch
(a broadcast hash join when small — no state store, no watermark
required), so enrichment adds zero streaming state.  Contrast
stream-stream joins, which buffer both sides in the state store until the
watermark passes.

Contract notes (the production trip-wires, encoded here):

- ``how`` is restricted to ``inner``/``left_outer`` — Spark disallows
  right/full outer with the stream on the left, and a LEFT join is the
  enrichment default (an unmatched fact row must survive with null
  dimension columns, not vanish).
- The static side is re-read every micro-batch: a dimension UPDATE becomes
  visible to later batches (slowly-changing enrichment).  If the job needs
  a frozen dimension, persist or snapshot it first — documented rather
  than hidden.
- ``F.broadcast`` is applied to the static side by default; at dimension
  sizes beyond broadcast reach, pass ``broadcast_static=False`` and AQE
  plans a shuffled join per micro-batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_static_enrich"]


def stream_static_enrich(
    stream_df: DataFrame,
    static_df: DataFrame,
    on: Sequence[str] | str,
    how: str = "left_outer",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a streaming DataFrame with a static dimension on equi-key(s)
    ``on``.  Returns a streaming DataFrame (append-safe: no state store
    is involved, so any downstream sink mode remains available)."""
    if not stream_df.isStreaming:
        raise ValueError("stream_static_enrich: stream_df must be streaming")
    if static_df.isStreaming:
        raise ValueError(
            "stream_static_enrich: static_df must be batch "
            "(use streaming/joins.py for stream-stream)"
        )
    if how not in ("inner", "left_outer", "left"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer' for a stream-left join, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    dim = F.broadcast(static_df) if broadcast_static else static_df
    return stream_df.join(dim, on=keys, how=how)
