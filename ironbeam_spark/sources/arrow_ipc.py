"""Arrow IPC file (Feather V2) source/sink — the ML-loader interchange format.

No reference counterpart (the reference's format list stops at
csv/jsonl/parquet/avro/msgpack, ``src/helpers/mod.rs``); this is north-star
sources work: Arrow IPC files are the storage layer of the dominant
training-data loaders (HuggingFace ``datasets`` memory-maps exactly this
format) and the cheapest possible interchange with any Arrow-native engine
(DuckDB, Polars, Ray Data) — a 100 TB corpus prepared here can be
memory-mapped by a PyTorch dataloader with zero parse cost.

Spark-first shape, and the *fastest* codec path in the repo: both
directions stay in Arrow end-to-end via ``mapInArrow`` — the write side
streams each partition's record batches straight into a
``pyarrow.ipc.new_file`` writer (no pandas, no Python-object rows; the
only per-row work is pyarrow's own buffer copy), and the read side
memory-maps nothing but yields each file's batches directly as the
operator's output batches, cast once per batch to the session's expected
Arrow schema (timezone/width normalization).  Contrast ``sources/avro.py``
/ ``sources/msgpack.py``, whose codecs necessarily walk Python values.

Scale: one self-contained shard per partition, written via hidden-temp +
atomic ``os.rename`` (the same task-commit contract as
``sources/compression.write_text_shards`` — concurrent speculative
attempts each rename a complete payload); readers enumerate shards with
``binaryFile`` (globs, multi-dir), so both sides are
embarrassingly parallel with zero shuffle.  A shard is one IPC *file*
(footer + per-batch offsets), so a future split-capable reader can seek
individual batches without parsing the whole shard.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_arrow_ipc_py", "write_arrow_ipc_py"]


def write_arrow_ipc_py(
    df: Any,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> int:
    """Partition-parallel Arrow IPC sink: one Feather-V2 shard per non-empty
    partition (``part-NNNNN.arrow``), atomic rename commit.  Returns rows
    written.  ``compression`` is an IPC buffer codec (``"zstd"``/``"lz4"``)
    or None; mode semantics follow DataFrameWriter (see
    :func:`sources.avro.write_avro_py`)."""
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    from ironbeam_spark.collection import PCollection

    modes = {"overwrite", "append", "error", "errorifexists", "ignore"}
    if mode not in modes:
        raise ValueError(
            f"write_arrow_ipc mode must be one of {sorted(modes)}, got {mode!r}"
        )
    d = df.df if isinstance(df, PCollection) else df
    # resolved ONCE on the driver: every shard carries the identical schema
    # (timestamps as tz-aware UTC micros), so readers never reconcile
    # per-shard drift
    arrow_schema = to_arrow_schema(d.schema)
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if f.endswith(".arrow")]
    if mode == "overwrite":
        # also sweep crashed-attempt temp files so they can't accumulate
        for f in existing + [
            f for f in os.listdir(path) if f.endswith(".arrow.tmp")
        ]:
            os.remove(os.path.join(path, f))
    elif mode in ("error", "errorifexists") and existing:
        raise FileExistsError(f"arrow shards already exist at {path} (mode={mode})")
    elif mode == "ignore" and existing:
        return 0
    token = f"-{uuid.uuid4().hex[:8]}" if mode == "append" else ""

    def write_partition(batches: Iterator) -> Iterator:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        opts = (
            ipc.IpcWriteOptions(compression=compression) if compression else None
        )
        n = 0
        writer = None
        # per-ATTEMPT temp name (same task-commit contract as
        # compression._commit_shard): racing speculative attempts write
        # separate files and each rename a COMPLETE payload over the same
        # final name — a pid-only temp would interleave their writes
        tmp = os.path.join(
            path, f".part-{pid:05d}{token}-{_uuid.uuid4().hex[:8]}.arrow.tmp"
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if writer is None:
                # lazy open: empty partitions write NO shard (matching the
                # avro/msgpack sinks), so skew never yields footer-only files
                writer = ipc.new_file(tmp, arrow_schema, options=opts)
            # cast: Spark hands batches in its own arrow types (e.g. session
            # tz); normalize to the driver-resolved schema before writing
            writer.write_batch(
                pa.Table.from_batches([batch]).cast(arrow_schema).to_batches()[0]
                if batch.schema != arrow_schema
                else batch
            )
            n += batch.num_rows
        if writer is not None:
            writer.close()
            # atomic commit: concurrent speculative attempts each rename a
            # COMPLETE payload over the same final name
            os.rename(tmp, os.path.join(path, f"part-{pid:05d}{token}.arrow"))
        yield pa.RecordBatch.from_pylist(
            [{"n": n}], schema=pa.schema([("n", pa.int64())])
        )

    counts = d.mapInArrow(write_partition, "n long")
    written = counts.agg(F.sum("n")).collect()[0][0]
    return int(written or 0)


def read_arrow_ipc_py(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read Arrow IPC file(s) (glob ok) executor-side: ``binaryFile``
    enumerates shards, each file's record batches are yielded directly
    through ``mapInArrow`` (no pandas materialization), cast once per batch
    to the session's expected Arrow schema.  Pass ``schema`` to
    project/order columns (required when the directory is empty)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

    struct_schema = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    listing = spark.read.format("binaryFile").load(path)
    files = listing.select("content")
    if struct_schema is None:
        # schema inference must NOT ship a whole shard to the driver (a
        # self-contained per-partition shard can be GBs): collect only the
        # PATH (binaryFile prunes the content column), then read just the
        # file footer.  Local paths open directly with pyarrow; for remote
        # filesystems pass `schema` explicitly.
        first = listing.select("path").limit(1).collect()
        if not first:
            raise ValueError("cannot infer arrow-ipc schema from an empty directory")
        p = first[0].path
        if p.startswith("file:"):
            p = p[len("file:") :]
        if "://" in p:
            raise ValueError(
                f"cannot infer arrow-ipc schema from remote path {p!r} "
                "without shipping a shard to the driver — pass schema="
            )
        with pa.OSFile(p, "rb") as fh:
            struct_schema = from_arrow_schema(ipc.open_file(fh).schema)
    names = [f.name for f in struct_schema.fields]
    target = to_arrow_schema(struct_schema)

    def decode(batches: Iterator) -> Iterator:
        for fb in batches:
            # binaryFile delivers one row per file; iterate the content cells
            for blob in fb.column(0):
                reader = ipc.open_file(pa.BufferReader(blob.as_py()))
                for i in range(reader.num_record_batches):
                    b = reader.get_batch(i)
                    # select-then-cast: tolerate shards with extra/reordered
                    # columns; cast normalizes tz/width to the session schema
                    t = pa.Table.from_batches([b]).select(names)
                    yield from t.cast(target).to_batches()

    return files.mapInArrow(decode, struct_schema)
