"""Distributed global prefix sums (scans) over a total order.

The naive Spark spelling — ``sum().over(Window.orderBy(...))`` with no
``partitionBy`` — plans a SINGLE task holding the entire dataset (Spark
even warns).  At 100 TB that is not slow, it is impossible.  This module
implements the classic two-pass parallel scan instead:

1. ``repartitionByRange`` + ``sortWithinPartitions`` puts each task on a
   contiguous, ordered slice of the total order.
2. A tiny first pass computes one ``(partition, total)`` row per task;
   exclusive prefix offsets over those (one row per partition — driver-side
   by design, like k-means centers) are closed over by the second pass.
3. The second pass is a shuffle-free Arrow-batched cumulative sum per
   partition plus the broadcast offset.

Cost: ONE range shuffle + two streaming passes over the persisted slices.
Both passes are ``mapInArrow`` (vectorized, no Python-per-row) — the
"genuinely per-partition imperative logic" tier of the custom-operator
ladder.  Result values are partition-count-invariant: prefix sums don't
depend on where the slice boundaries fall, so oracles stay exact.

No reference counterpart (north-star extension; the reference has no
global-order operators at all) — this is infrastructure for token-stream
operations like cross-document sequence packing.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel

__all__ = ["global_running_sum"]

# persisted range-partitioned inputs awaiting caller release (same contract
# as operators.dedup._PERSISTED_SHINGLE_TABLES)
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
    module docstring for why this is never a global single-partition window.

    Ties in ``order_cols`` get an arbitrary but fixed relative order within
    their slice; make the order total (include a unique key) when exact
    per-row attribution matters."""
    dt = df.schema[value_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        # float accumulation would make results depend on partition
        # boundaries (addition isn't associative in FP) — the exactness
        # contract only holds for integral values
        raise TypeError(
            f"global_running_sum requires an integral value column, got {dt}"
        )
    parted = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PERSISTED_SCAN_TABLES.append(parted)

    def totals(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t = 0
        for b in batches:
            s = pc.sum(b.column(value_col)).as_py()
            t += int(s or 0)
        yield pa.RecordBatch.from_pylist(
            [{"pid": pid, "total": t}],
            schema=pa.schema([("pid", pa.int32()), ("total", pa.int64())]),
        )

    per_part = {
        r.pid: r.total
        for r in parted.mapInArrow(totals, "pid int, total long").collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(per_part):
        offsets[pid] = acc
        acc += per_part[pid]

    out_schema = StructType(
        [*parted.schema.fields, StructField(out_col, LongType(), False)]
    )

    def scan(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        run = offsets.get(TaskContext.get().partitionId(), 0)
        for b in batches:
            cum = pc.add(
                pc.cumulative_sum(pc.cast(b.column(value_col), pa.int64())),
                run,
            )
            if len(cum):
                run = cum[-1].as_py()
            yield b.append_column(out_col, cum)

    return parted.mapInArrow(scan, out_schema)
