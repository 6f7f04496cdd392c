"""Custom source integration (reference ``from_custom_source``,
``src/helpers/custom_source.rs``: user supplies a shard-lister + per-shard
reader; the runner schedules one task per shard).

Spark's native superset is the Python DataSource API (pyspark 4,
``pyspark.sql.datasource``): a ``DataSource`` declares partitions (the
reference's shards) and a per-partition ``read`` — after registration it
composes with the full reader surface (``spark.read.format(name)``,
schema, options, predicate pushdown hooks), which is strictly more than the
reference's trait offers.  :func:`from_custom_source` is the thin parity
shim; :class:`MsgpackDataSource` is a real proof — the msgpack codec from
:mod:`ironbeam_spark.sources.msgpack` exposed as a first-class format, one
input partition per shard file, so ``spark.read.format("msgpack")`` and
``df.write.format("msgpack")`` both work.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = ["from_custom_source", "register_msgpack_format", "MsgpackDataSource"]


def from_custom_source(
    spark: SparkSession,
    source_cls: type[DataSource],
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Register ``source_cls`` and read it — the reference's
    ``from_custom_source`` contract (shards → per-shard iterator) mapped to
    the DataSource API (``partitions()`` → ``read(partition)``).  Idempotent
    re-registration; ``options`` go to the source's constructor."""
    spark.dataSource.register(source_cls)
    reader = spark.read.format(source_cls.name())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class _MsgpackReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("msgpack source requires a path")
        self.names = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        # one task per shard file — msgpack has no intra-file split points,
        # so files are the parallelism unit (reference shards by record
        # count for the same reason, src/io/msgpack.rs:57-70)
        path = self.path
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".msgpack")
            )
        else:
            files = sorted(_glob.glob(path)) or [path]
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from ironbeam_spark.sources.msgpack import unpackb_stream

        with open(partition.value, "rb") as fh:
            data = fh.read()
        for rec in unpackb_stream(data, int64_strict=True):
            if isinstance(rec, dict):
                yield tuple(rec.get(n) for n in self.names)
            else:
                yield tuple(rec)


class _MsgpackCommit(WriterCommitMessage):
    pass


class _MsgpackWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("msgpack sink requires a path")
        self.names = [f.name for f in schema.fields]
        # runs driver-side, before any task: honor SaveMode here.
        # overwrite clears prior shards (a rewrite with fewer partitions must
        # not leave stale part files to be silently mixed into later reads);
        # append uniquifies names so same-numbered shards never clobber.
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".msgpack"):
                    os.remove(os.path.join(self.path, f))
            self.token = ""
        else:
            import uuid

            self.token = f"-{uuid.uuid4().hex[:8]}"

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        import io as _io

        from pyspark import TaskContext

        from ironbeam_spark.sources.msgpack import pack_into

        pid = TaskContext.get().partitionId()
        buf = _io.BytesIO()
        n = 0
        for row in iterator:
            pack_into(buf, list(row))
            n += 1
        if n:
            shard = f"part-{pid:05d}{self.token}.msgpack"
            with open(os.path.join(self.path, shard), "wb") as fh:
                fh.write(buf.getvalue())
        return _MsgpackCommit()


class MsgpackDataSource(DataSource):
    """``spark.read.format("msgpack")`` / ``df.write.format("msgpack")``.

    Read requires an explicit ``.schema(...)`` (msgpack records carry no
    schema, exactly like the reference's serde-typed reads).  Shards are
    byte-concatenable, array- or map-encoded records both decode.
    """

    @classmethod
    def name(cls) -> str:
        return "msgpack"

    def schema(self):
        raise ValueError(
            "msgpack is schemaless: pass an explicit .schema(...) to the reader"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _MsgpackReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _MsgpackWriter(self.options, schema, overwrite)


def register_msgpack_format(spark: SparkSession) -> None:
    """Make ``format("msgpack")`` available on this session (idempotent)."""
    spark.dataSource.register(MsgpackDataSource)
