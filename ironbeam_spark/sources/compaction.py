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
  ``repartition(n_bins)``, and swaps with a per-bin JOURNAL so a crash
  mid-swap can never lose rows: the merged parts land complete under a
  hidden temp dir, a journal file records (originals to remove, hidden →
  final renames), and only then are originals unlinked and parts renamed
  in.  A crash BEFORE the journal leaves the original set intact (hidden
  temp is garbage, swept next run); a crash AFTER the journal rolls
  FORWARD on the next run (the journal replay unlinks any surviving
  originals and completes the renames).  Readers during the window see
  the old set or a partially-swapped set; rows are never permanently
  lost once the merged data is durable — the log-less equivalent of a
  table-format commit log, at per-bin granularity.

Row-level content is preserved exactly (same rows, arbitrary order) —
``q_compaction`` pins that with a content-aggregate oracle.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

__all__ = ["compaction_plan", "compact_parquet"]

_JOURNAL_PREFIX = ".compact-journal-"


def _recover_swaps(path: str) -> None:
    """Roll forward any swap interrupted by a crash, then sweep orphaned
    temp dirs.  Idempotent; called before planning so the plan never sees
    a half-swapped state."""
    for e in list(os.scandir(path)):
        if not (e.name.startswith(_JOURNAL_PREFIX) and e.name.endswith(".json")):
            continue
        with open(e.path) as fh:
            j = json.load(fh)
        # the journal exists only if the merged parts were fully written,
        # so completing the swap is always safe: unlink surviving
        # originals, finish the renames (both idempotent)
        for name in j["remove"]:
            p = os.path.join(path, name)
            if os.path.exists(p):
                os.unlink(p)
        for tmp_rel, final_name in j["add"]:
            src = os.path.join(path, tmp_rel)
            if os.path.exists(src):
                os.rename(src, os.path.join(path, final_name))
        tmp_dir = os.path.join(path, j["tmp_dir"])
        if os.path.isdir(tmp_dir):
            for leftover in os.listdir(tmp_dir):
                os.unlink(os.path.join(tmp_dir, leftover))
            os.rmdir(tmp_dir)
        os.unlink(e.path)
    # temp dirs with no journal = crash before commit point: originals are
    # intact, the partial merge is garbage
    for e in list(os.scandir(path)):
        if e.is_dir() and e.name.startswith(".compact-"):
            for leftover in os.listdir(e.path):
                os.unlink(os.path.join(e.path, leftover))
            os.rmdir(e.path)


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

    _recover_swaps(path)
    before = _count()
    bins = compaction_plan(path, target_bytes, small_bytes)
    rewritten = 0
    for bin_paths in bins:
        token = uuid.uuid4().hex
        tmp = os.path.join(path, f".compact-{token}")
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
        new_parts = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        # commit point: the journal records the whole swap BEFORE any
        # unlink, so a crash at any later instant rolls forward on the
        # next run (_recover_swaps) — rows are never permanently lost.
        # The journal itself lands via write-temp + atomic rename, so a
        # partial journal is impossible.
        adds = [
            [
                os.path.join(f".compact-{token}", f),
                f"compact-{token}-{i:05d}.parquet",
            ]
            for i, f in enumerate(new_parts)
        ]
        journal = os.path.join(path, f"{_JOURNAL_PREFIX}{token}.json")
        with open(journal + ".tmp", "w") as fh:
            json.dump(
                {
                    "remove": [os.path.basename(p) for p in bin_paths],
                    "add": adds,
                    "tmp_dir": f".compact-{token}",
                },
                fh,
            )
        os.rename(journal + ".tmp", journal)
        for p in bin_paths:
            os.unlink(p)
        for tmp_rel, final_name in adds:
            os.rename(
                os.path.join(path, tmp_rel), os.path.join(path, final_name)
            )
        for leftover in os.listdir(tmp):
            os.unlink(os.path.join(tmp, leftover))
        os.rmdir(tmp)
        os.unlink(journal)
        rewritten += len(bin_paths)
    return {
        "files_before": before,
        "files_after": _count(),
        "rewritten": rewritten,
        "bins": len(bins),
    }
