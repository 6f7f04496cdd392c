"""Data-layout writers: how 100 TB of parquet should land on disk.

Partition-pruning (hive directories, sources/io.py) answers equality
predicates on low-cardinality columns.  For range predicates on
high-cardinality columns (timestamps, ids) the lever is *file layout*:
``repartitionByRange`` gives every output file a disjoint slice of the sort
key and ``sortWithinPartitions`` orders rows inside each file, so parquet
min/max statistics let readers skip whole files and row groups.  A time-range
query over a year of data then touches only the files whose range intersects
the predicate — the difference between scanning 100 TB and scanning 300 GB.

The reference has no layout control at all (single-process writer,
``src/helpers/parquet.rs``); this is pure Spark-side value-add.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["write_range_sorted", "file_column_ranges"]


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet where each file owns a disjoint range of
    ``sort_cols`` and rows are sorted within every file.

    ``repartitionByRange`` samples the sort key to pick balanced split points
    (a full shuffle — this is a write-time investment repaid on every read);
    ``sortWithinPartitions`` is a spillable per-partition sort, no extra
    shuffle.  ``num_files`` defaults to the session's shuffle parallelism.
    """
    cols = list(sort_cols)
    if num_files is not None:
        parted = df.repartitionByRange(num_files, *cols)
    else:
        parted = df.repartitionByRange(*cols)
    parted.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def file_column_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (min, max) of ``column`` from parquet footer statistics —
    exactly the metadata a reader consults to skip files.  Used by tests to
    assert :func:`write_range_sorted` produced disjoint ranges."""
    import glob
    import os

    import pyarrow.parquet as pq

    out: list[tuple[str, object, object]] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(column)
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((os.path.basename(f), lo, hi))
    return out
