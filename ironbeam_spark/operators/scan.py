"""Distributed global prefix sums (scans) over a total order.

The naive Spark spelling — ``sum().over(Window.orderBy(...))`` with no
``partitionBy`` — plans a SINGLE task holding the entire dataset (Spark
even warns).  At 100 TB that is not slow, it is impossible.  This module
implements the classic two-pass parallel scan instead:

1. ``repartitionByRange`` + ``sortWithinPartitions`` puts each task on a
   contiguous, ordered slice of the total order.  Only the columns the
   scan needs — ``order_cols`` + ``value_col`` — enter the shuffle; any
   payload columns rejoin at the end (see 5).
2. The slice id is STAMPED INTO THE DATA (a JVM-side
   ``spark_partition_id()`` projection — no Python round trip) and the
   stamped NARROW frame is eagerly ``localCheckpoint``-ed.  From that
   point the (row -> slice) assignment is frozen data, not a property of
   a particular job's physical partitioning — any later recompute replays
   from the checkpoint blocks, so no pass can ever observe a re-sampled
   RangePartitioner pairing offsets with different row ranges.
   (``spark_partition_id`` is nondeterminism-flagged, so Catalyst cannot
   push it below the range exchange; it is evaluated once, during the
   checkpoint's materialization job, and is frozen thereafter.)
3. Per-slice totals come from a plain ``groupBy("pid")`` (one row per
   slice); the exclusive prefix over that tiny frame is a single-partition
   window (bounded: #partitions rows, same driver-size class as k-means
   centers), and the offsets reach the data through a **broadcast join on
   the stamped ``pid``** — never a closure-captured dict (at 10^5-10^6
   slices that dict would ship with every task) and never
   ``TaskContext.partitionId()`` (which is a per-job accident, not data).
4. The final pass is a shuffle-free Arrow-batched cumulative sum per
   slice plus the joined offset.  ``sortWithinPartitions`` after the
   broadcast join removes any reliance on join order preservation — it is
   an in-partition sort, no exchange.
5. If the input carries payload columns beyond the order + value, they
   are NOT dragged through the range shuffle or the checkpoint — at
   100 TB a full-row checkpoint is the difference between a cheap
   metadata pass and writing the dataset twice.  The scan runs on the
   narrow projection and the result joins back on ``order_cols``, which
   must then uniquely key rows (asserted for free inside the per-slice
   totals pass; prefix sums are partition-invariant, so the join-back
   needs no slice bookkeeping).

Cost: ONE narrow range shuffle + one narrow checkpoint materialization +
two streaming passes over the checkpointed slices (+ one key-partitioned
join when payload columns rejoin).  The scan pass is ``mapInArrow``
(vectorized, no Python-per-row).  Result values are
partition-count-invariant AND recompute-invariant: prefix sums don't
depend on where the slice boundaries fall, and the boundaries themselves
are frozen by the checkpoint.

On a cluster with executor loss, ``localCheckpoint`` blocks can be lost —
Spark then FAILS the job loudly (it cannot silently recompute past a
local checkpoint), which is the correct failure mode here: wrong-but-
quiet answers were exactly the bug this design removes.  For long-running
production jobs prefer a reliable ``checkpoint()`` directory via
``ironbeam_spark.operators.checkpoint``.

No reference counterpart (north-star extension; the reference has no
global-order operators at all) — this is infrastructure for token-stream
operations like cross-document sequence packing.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["global_running_sum"]

# checkpointed intermediates awaiting caller release (same contract as
# operators.dedup._PERSISTED_SHINGLE_TABLES; dropping the reference lets
# Spark's ContextCleaner reclaim the checkpoint blocks)
_PERSISTED_SCAN_TABLES: list[DataFrame] = []


def release_scan_caches() -> int:
    n = len(_PERSISTED_SCAN_TABLES)
    while _PERSISTED_SCAN_TABLES:
        _PERSISTED_SCAN_TABLES.pop().unpersist()
    return n


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Append ``out_col`` = inclusive prefix sum of ``value_col`` (int64)
    under the total order ``order_cols``.  Two-pass parallel scan — see the
    module docstring for why this is never a global single-partition window
    and why the slice assignment is stamped + checkpointed.

    Ties in ``order_cols`` get an arbitrary but fixed relative order within
    their slice; make the order total (include a unique key) when exact
    per-row attribution matters.  When ``df`` carries payload columns
    beyond ``order_cols`` + ``value_col``, the scan runs on the narrow
    projection and joins back on ``order_cols`` — which must then uniquely
    key rows (checked, at no extra pass, from the per-slice totals job)."""
    dt = df.schema[value_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        # float accumulation would make results depend on partition
        # boundaries (addition isn't associative in FP) — the exactness
        # contract only holds for integral values
        raise TypeError(
            f"global_running_sum requires an integral value column, got {dt}"
        )
    if "__scan_pid" in df.columns or "__scan_off" in df.columns:
        raise ValueError("input must not contain __scan_pid/__scan_off columns")

    # Only the scan's working set enters the shuffle + checkpoint; payload
    # columns rejoin at the end (module docstring, item 5).
    payload_cols = [c for c in df.columns if c not in {*order_cols, value_col}]
    # dict.fromkeys: value_col may itself be an order column (a cumulative
    # sum ordered by the summed column) — a plain [*order_cols, value_col]
    # select would emit the column twice and every later reference to it
    # would be ambiguous
    narrow = df.select(*dict.fromkeys([*order_cols, value_col]))

    parted = narrow.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)

    # Eager local checkpoint: materializes the stamped slices and truncates
    # lineage, so every downstream job reads the SAME (row, pid) pairs even
    # under cache eviction / recompute — the recompute path replays from
    # checkpoint blocks, never from a re-sampled range shuffle.  The stamp
    # itself is a JVM-side projection (spark_partition_id is evaluated in
    # the checkpoint's materialization job, after the range exchange, and
    # its nondeterminism flag keeps Catalyst from pushing it below); the
    # first Python round trip of the old mapInArrow stamp is gone.
    stamped = parted.withColumn(
        "__scan_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    _PERSISTED_SCAN_TABLES.append(stamped)

    # Exclusive prefix offsets over the per-slice totals.  groupBy yields
    # ONE row per slice (bounded by #partitions — the same driver-size
    # class as k-means centers), and because it reads the frozen checkpoint
    # the collected totals are recompute-invariant.  The tiny exclusive
    # prefix is computed driver-side and returns to the data as a
    # broadcast-joined DataFrame — never a closure or a global Window.
    # The same pass carries the join-back uniqueness check when payload
    # columns exist (equal order keys always share a range slice, so a
    # per-slice distinct count is a global uniqueness proof).
    aggs = [F.sum(F.col(value_col).cast("long")).alias("__scan_total")]
    if payload_cols:
        null_key = F.lit(False)
        for c in order_cols:
            null_key = null_key | F.col(c).isNull()
        aggs += [
            F.count(F.lit(1)).alias("__scan_n"),
            F.count_distinct(F.struct(*order_cols)).alias("__scan_nd"),
            F.count_if(null_key).alias("__scan_nullkeys"),
        ]
    per_slice = stamped.groupBy("__scan_pid").agg(*aggs).collect()
    if payload_cols and any(r["__scan_n"] != r["__scan_nd"] for r in per_slice):
        raise ValueError(
            "global_running_sum: order_cols must uniquely key rows when the "
            "input has payload columns (the narrow scan result joins back on "
            f"order_cols={list(order_cols)}); add a tiebreaker column or "
            "project the input down to order + value columns"
        )
    if payload_cols and any(r["__scan_nullkeys"] for r in per_slice):
        # the rejoin below is a plain equi-join and NULL keys never match
        # themselves — such rows would be SILENTLY DROPPED from the output
        raise ValueError(
            "global_running_sum: order_cols contain NULLs and the input has "
            "payload columns (the narrow scan result joins back on "
            f"order_cols={list(order_cols)}, where NULL keys never match); "
            "filter or coalesce the NULL keys first"
        )
    acc = 0
    off_rows = []
    for r in sorted(per_slice, key=lambda r: r["__scan_pid"]):
        off_rows.append((r["__scan_pid"], acc))
        acc += r["__scan_total"] or 0
    offsets = df.sparkSession.createDataFrame(
        off_rows or [(0, 0)], "__scan_pid int, __scan_off long"
    )

    # Broadcast join keeps the stream side's physical partitioning (all
    # rows of a slice stay co-located); the in-partition re-sort removes
    # any assumption about join output order.
    joined = stamped.join(F.broadcast(offsets), "__scan_pid").sortWithinPartitions(
        *order_cols
    )

    out_schema = StructType(
        [*parted.schema.fields, StructField(out_col, LongType(), False)]
    )
    in_cols = [f.name for f in parted.schema.fields]

    def scan(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        run = None  # initialized from the joined offset column
        for b in batches:
            if len(b) == 0:
                continue
            if run is None:
                run = b.column("__scan_off")[0].as_py()
            cum = pc.add(
                pc.cumulative_sum(pc.cast(b.column(value_col), pa.int64())),
                run,
            )
            if len(cum):
                run = cum[-1].as_py()
            yield b.select(in_cols).append_column(out_col, cum)

    scanned = joined.mapInArrow(scan, out_schema)
    if not payload_cols:
        return scanned
    # Rejoin the payload: prefix sums are partition-invariant, so the
    # narrow result carries everything the wide rows need and the join
    # is a plain key equi-join (order_cols uniqueness asserted above) —
    # Catalyst/AQE picks broadcast vs shuffle by the narrow side's size.
    return df.join(
        scanned.select(*order_cols, out_col), on=list(order_cols)
    )
