"""Small-file compaction for parquet datasets.

The operational pass every long-lived 100 TB table needs (the
"small-files problem": streaming sinks, per-trigger commits and
fine-grained partitioning leave datasets as millions of KB-scale files,
and at 1000 executors the scan's task-scheduling + footer-reading overhead
dwarfs the I/O).  The reference has no storage-maintenance surface; this
is the OPTIMIZE/compact primitive of modern table formats, expressed
directly over a parquet directory.

Design:

- :func:`compaction_plan` — driver-side METADATA pass only (file listing,
  sizes): picks the files under ``small_bytes`` and first-fit-packs them
  into bins of ``target_bytes``.  No data is read; at 100 TB the listing
  is the usual object-store inventory call.
- :func:`compact_parquet` — executes the plan: reads ONLY the small files
  (large files are never rewritten — compaction cost is proportional to
  the small tail, not the table), writes one output file per bin via
  ``repartition(n_bins)``, commits two-phase: new files land under a
  hidden temp name inside the directory, then originals are removed and
  temp files renamed in (the same hidden-temp + ``os.rename`` discipline
  as the shard sink in ``sources/compression``).  Readers see the old
  file set or the new one per file, and every row exactly once after
  completion; there is no table-format transaction log here, so the
  documented contract is "safe against crash before the swap, eventually
  consistent during it".

Row-level content is preserved exactly (same rows, arbitrary order) —
``q_compaction`` pins that with a content-aggregate oracle.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession

__all__ = ["compaction_plan", "compact_parquet"]


def compaction_plan(
    path: str,
    target_bytes: int = 128 << 20,
    small_bytes: int | None = None,
) -> list[list[str]]:
    """Bins of small-file paths to merge (each bin → one output file).

    ``small_bytes`` defaults to ``target_bytes // 2``: files at least half
    the target are already "big enough" and are left untouched.  Bins are
    first-fit in descending size order — deterministic, and within 2× of
    optimal bin count (classic FFD bound)."""
    if small_bytes is None:
        small_bytes = target_bytes // 2
    files = sorted(
        (
            (e.path, e.stat().st_size)
            for e in os.scandir(path)
            if e.is_file()
            and e.name.endswith(".parquet")
            and not e.name.startswith((".", "_"))
        ),
        key=lambda t: (-t[1], t[0]),
    )
    small = [(p, sz) for p, sz in files if sz < small_bytes]
    bins: list[list] = []  # [paths, packed_size]
    for p, sz in small:
        for b in bins:
            if b[1] + sz <= target_bytes:
                b[0].append(p)
                b[1] += sz
                break
        else:
            bins.append([[p], sz])
    # merging a bin of one file is pure I/O churn — leave singletons alone
    return [b[0] for b in bins if len(b[0]) > 1]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    small_bytes: int | None = None,
) -> dict:
    """Compact ``path`` in place; returns
    ``{"files_before", "files_after", "rewritten", "bins"}``."""

    def _count() -> int:
        return sum(
            1
            for e in os.scandir(path)
            if e.is_file()
            and e.name.endswith(".parquet")
            and not e.name.startswith((".", "_"))
        )

    before = _count()
    bins = compaction_plan(path, target_bytes, small_bytes)
    rewritten = 0
    for bin_paths in bins:
        tmp = os.path.join(path, f".compact-{uuid.uuid4().hex}")
        # one bin -> one file: the bin was packed to target_bytes.
        # mergeSchema: small files often have DRIFTING schemas (a streaming
        # sink that added a column mid-stream is exactly the small-file
        # producer this targets); single-footer inference could silently
        # drop the new column from the merged file before the originals
        # are unlinked — permanent data loss reported as success
        merged = (
            spark.read.option("mergeSchema", "true").parquet(*bin_paths)
        )
        merged.coalesce(1).write.parquet(tmp)
        new_parts = [
            os.path.join(tmp, f)
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        ]
        # swap: remove originals, rename the merged file in.  Crash before
        # any unlink leaves the original set intact (temp dirs are hidden
        # from readers by the dot-prefix convention both Spark and DuckDB
        # honor); crash mid-swap is the documented eventual-consistency
        # window of a log-less table.
        for p in bin_paths:
            os.unlink(p)
        for i, np_ in enumerate(new_parts):
            os.rename(
                np_,
                os.path.join(
                    path, f"compact-{uuid.uuid4().hex}-{i:05d}.parquet"
                ),
            )
        for leftover in os.listdir(tmp):
            os.unlink(os.path.join(tmp, leftover))
        os.rmdir(tmp)
        rewritten += len(bin_paths)
    return {
        "files_before": before,
        "files_after": _count(),
        "rewritten": rewritten,
        "bins": len(bins),
    }
