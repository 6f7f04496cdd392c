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


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 6
) -> "tuple[DataFrame, str]":
    """Append a Morton (Z-order) key column interleaving the rank-buckets of
    ``cols`` and return ``(df_with_key, key_col_name)``.

    Each column is quantile-bucketed into ``2**bits`` ranks via
    ``percentile_approx`` boundaries (one small aggregate; only the 2^bits-1
    split points reach the driver — same scale story as
    ``repartitionByRange``'s sampling), then the rank bits are interleaved in
    pure codegen: bit j of column c lands at position ``j*len(cols)+c``.
    Rows close in z-value are close in EVERY dimension, so files covering
    contiguous z-ranges get tight min/max footer stats on all ``cols`` at
    once — multi-column file skipping where a plain sort only serves its
    leading column.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bound_rows = df.agg(
        *[
            F.percentile_approx(c, F.array(*[F.lit(p) for p in probs]), F.lit(10000)).alias(c)
            for c in cols
        ]
    ).collect()[0]

    def bucket_of(c: str) -> "F.Column":
        bounds = F.array(*[F.lit(float(b)) for b in bound_rows[c]])
        v = F.col(c).cast("double")
        # rank = #boundaries <= value: a fold over the literal boundary array
        return F.aggregate(
            bounds,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(v >= b, 1).otherwise(0).cast("long"),
        )

    z = F.lit(0).cast("long")
    width = len(cols)
    for c_idx, c in enumerate(cols):
        b = bucket_of(c)
        for j in range(bits):
            z = z + (
                F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (j * width + c_idx)).cast("long")
            )
    key = "_zorder"
    return df.withColumn(key, z), key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 6,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on ``cols``: range-partition and sort by the
    Morton key, so every file owns a contiguous z-range — a rectangle-ish
    region of the multi-column space — and range predicates on ANY of the
    ``cols`` skip most files via footer stats.  One full shuffle at write
    time (the same investment as :func:`write_range_sorted`), repaid on
    every multi-dimension read."""
    keyed, key = zorder_key(df, cols, bits)
    parted = (
        keyed.repartitionByRange(num_files, key)
        if num_files is not None
        else keyed.repartitionByRange(key)
    )
    parted.sortWithinPartitions(key).drop(key).write.mode(mode).parquet(path)
