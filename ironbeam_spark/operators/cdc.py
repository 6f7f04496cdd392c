"""CDC changelog application: changelog → current snapshot, and the
incremental MERGE of an existing snapshot with a new batch of changes.

The warehouse-maintenance counterpart of ``operators/scd.py`` (which keeps
the full type-2 history; this keeps only the current generation): given an
append-only changelog of ``(key, ts, op, attributes...)`` rows — the shape
every CDC feed (Debezium-style) and every MERGE INTO upsert batch arrives
in — produce the table as of "now": the latest row per key, with keys whose
latest operation is a delete absent entirely.  Nearest reference surface is
``Latest`` per key (reference src/helpers/keyed.rs), which has no delete
semantics and no snapshot+delta form.

Plan shape: ONE shuffle keyed on the entity key, whichever entry point is
used.  ``apply_changes`` is a single ``row_number`` window (descending
``ts, tiebreak``) + top-1 filter; ``merge_changes`` unions the snapshot
under the same window with a generation column so any change beats the
snapshot row for its key.  No joins, no per-key collect; per-key state at
execution time is the sort run, which Tungsten spills.  At 100 TB of
changelog this is exactly one repartition — and in the steady-state
incremental regime, one repartition of ``|snapshot| + |delta|``, never of
history.

Semantics pinned for cross-engine exactness:

- "latest" = max ``(ts, tiebreak_cols...)`` lexicographically, descending
  ``row_number`` — deterministic, no "whichever arrived last";
- delete ops (``op_col`` value in ``delete_ops``) tombstone the key: the
  key vanishes from the snapshot but a later upsert resurrects it;
- the snapshot side of ``merge_changes`` carries no op column and loses to
  ANY change for the same key (generation precedence), which makes
  ``merge_changes(apply_changes(older), newer) == apply_changes(all)``
  whenever the batches are time-split — the invariant the tests pin;
- timestamps are exact epoch-micros int64 (``to_epoch_us`` contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["apply_changes", "merge_changes"]


def _latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_desc: Sequence,
) -> DataFrame:
    w = W.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order_desc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Changelog → current snapshot: latest row per key in ``(ts,
    tiebreak)`` order; keys whose latest op is in ``delete_ops`` are
    dropped.  Output keeps every changelog column except ``op_col``, with
    ``ts_col`` replaced by exact-micros ``_us``."""
    if not key_cols:
        raise ValueError("apply_changes: need key_cols")
    from ironbeam_spark.operators.windowing import to_epoch_us

    staged = changes.withColumn("_us", to_epoch_us(changes, ts_col)).drop(
        ts_col
    )
    order = [F.col("_us").desc()] + [
        F.col(c).desc() for c in tiebreak_cols
    ]
    latest = _latest_per_key(staged, key_cols, order)
    if op_col is not None:
        latest = latest.where(_not_deleted(op_col, delete_ops)).drop(op_col)
    return latest


def _not_deleted(op_col: str, delete_ops: Sequence[str]):
    """Keep-filter that FAILS on a NULL op instead of silently treating it
    as a delete: ``~isin(...)`` is NULL for NULL input and WHERE NULL
    drops the row — a malformed changelog entry would erase its key."""
    return F.when(
        F.col(op_col).isNull(),
        F.raise_error(F.lit("cdc: NULL op value in changelog (malformed feed)")),
    ).otherwise(~F.col(op_col).isin(list(delete_ops)))


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "_us",
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental MERGE: fold a batch of changes into an existing
    snapshot (as produced by :func:`apply_changes`, so its time column is
    already ``_us``).  Any change for a key beats the snapshot row;
    within the batch, latest-by-``(ts, tiebreak)`` wins; a winning delete
    removes the key.  Returns the new snapshot, same schema."""
    if not key_cols:
        raise ValueError("merge_changes: need key_cols")
    from ironbeam_spark.operators.windowing import to_epoch_us

    if ts_col == "_us":
        # already exact micros (the apply_changes output convention) —
        # to_epoch_us would treat the int64 as nanoseconds and divide again
        staged = changes
    else:
        staged = changes.withColumn(
            "_us", to_epoch_us(changes, ts_col)
        ).drop(ts_col)
    if op_col is None:
        op_col = "_op"
        staged = staged.withColumn(op_col, F.lit("U"))
    base = snapshot.withColumn(op_col, F.lit("U")).withColumn(
        "_gen", F.lit(0)
    )
    delta = staged.withColumn("_gen", F.lit(1))
    # snapshot rows carry no meaningful tiebreak vs each other (unique
    # keys), so generation leads the order and ts/tiebreak settle the batch
    order = (
        [F.col("_gen").desc(), F.col("_us").desc()]
        + [F.col(c).desc() for c in tiebreak_cols]
    )
    merged = _latest_per_key(
        delta.unionByName(base, allowMissingColumns=True),
        key_cols,
        order,
    )
    return merged.where(_not_deleted(op_col, delete_ops)).drop(op_col, "_gen")
