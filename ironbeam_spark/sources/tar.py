"""WebDataset-style TAR shard source/sink (north-star extension — no
reference analogue; the reference's nearest surface is the opaque-payload
custom source, ``src/helpers/stdlib.rs:160``).

The de-facto standard layout for large-scale multimodal training corpora
(the public WebDataset convention): a dataset is thousands of ``.tar``
shards; each sample is a group of adjacent members sharing a basename —
``000123.txt``, ``000123.json``, ``000123.jpg`` — and the extension names
the field.  Sequential tar reads turn object storage into a streaming
medium; the shard is the unit of parallelism.

Spark mapping:

- **one shard = one task** (tar is not splittable, exactly like gzip text;
  the WebDataset contract is "make many shards", and thousands of shards
  at 100 TB give the scheduler all the parallelism it needs);
- ``read_tar_members`` is ``binaryFile`` → Arrow-batched ``mapInPandas``
  over the stdlib ``tarfile`` walk — members stream out as
  ``(shard, sample, field, payload)`` rows, schema-first like every other
  source here;
- ``webdataset_samples`` regroups members into one row per sample with a
  ``field → payload`` map (sorted entries, so downstream hashing is
  deterministic);
- ``write_tar_shards`` emits one ``part-NNNNN.tar`` per partition with the
  hidden-temp + atomic-rename commit of ``sources/compression._shard_sink``
  (task death / speculative duplicates can never leave a torn shard under
  a final name).
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_tar_shards", "read_tar_members", "webdataset_samples"]


def write_tar_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    field_cols: list[str],
    mode: str = "overwrite",
) -> int:
    """Write one WebDataset tar shard per partition: every row becomes
    ``{key}.{field}`` members, one per column in ``field_cols`` (binary or
    string; strings are UTF-8 encoded).  Returns the number of shards
    written (empty partitions write nothing)."""
    import uuid

    if mode not in ("overwrite", "append", "error", "errorifexists", "ignore"):
        raise ValueError(f"bad mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if f.endswith(".tar")]
    if mode == "overwrite":
        for f in existing + [
            f for f in os.listdir(path)
            if f.startswith(".") and ".inprogress-" in f
        ]:
            os.remove(os.path.join(path, f))
    elif mode in ("error", "errorifexists") and existing:
        raise FileExistsError(f"tar shards already exist at {path}")
    elif mode == "ignore" and existing:
        return 0
    token = f"-{uuid.uuid4().hex[:8]}" if mode == "append" else ""
    out_dir = path
    cols = [key_col, *field_cols]

    def write_partition(batches: Iterator) -> Iterator:
        import tarfile
        import uuid as _uuid

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        safe = [f"_c{i}" for i in range(len(cols))]
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for pdf in batches:
                for vals in zip(*(pdf[c] for c in safe)):
                    key, fields = str(vals[0]), vals[1:]
                    for field, v in zip(field_cols, fields):
                        if v is None:
                            continue
                        payload = (
                            v.encode("utf-8") if isinstance(v, str) else bytes(v)
                        )
                        info = tarfile.TarInfo(name=f"{key}.{field}")
                        info.size = len(payload)
                        info.mtime = 0  # fixed: shard bytes are reproducible
                        tf.addfile(info, io.BytesIO(payload))
                        n += 1
        if n:
            final = os.path.join(out_dir, f"part-{pid:05d}{token}.tar")
            tmp = os.path.join(
                out_dir,
                f".part-{pid:05d}{token}.inprogress-{_uuid.uuid4().hex[:8]}",
            )
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.rename(tmp, final)
        yield pd.DataFrame({"written": [1 if n else 0]})

    # backtick-quote so dotted field names (e.g. 'seg.json') resolve as
    # literal column names, not nested struct paths — and ALIAS them to
    # positional placeholders, because PySpark's mapInPandas re-resolves
    # every input column by name (df[col]) and would parse the dot as a
    # struct path again
    def _q(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    selected = df.select(
        *[_q(c).alias(f"_c{i}") for i, c in enumerate(cols)]
    )
    counts = selected.mapInPandas(write_partition, "written long").collect()
    return sum(r.written for r in counts)


def read_tar_members(spark: SparkSession, path: str) -> DataFrame:
    """Stream every member of every ``.tar`` shard under ``path`` as
    ``(shard string, sample string, field string, payload binary)`` —
    ``sample``/``field`` split the member name at its FIRST dot (the
    WebDataset convention: ``sample.field.ext`` keeps multi-dot fields
    intact).  Corrupt archives raise ``ValueError`` (wrap with a
    dead-letter pattern upstream if shards may be damaged)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def walk(batches: Iterator) -> Iterator:
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            payload = tf.extractfile(m).read()
                            name = m.name.rsplit("/", 1)[-1]
                            sample, _, field = name.partition(".")
                            rows.append((shard, sample, field, payload))
                except tarfile.TarError as e:
                    raise ValueError(f"tar: corrupt shard {shard}: {e}") from e
            yield pd.DataFrame(
                rows, columns=["shard", "sample", "field", "payload"]
            )

    return files.mapInPandas(
        walk, "shard string, sample string, field string, payload binary"
    )


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Regroup member rows into one row per sample:
    ``(sample string, fields map<string, binary>)`` with map entries sorted
    by field name (deterministic downstream hashing).  One hash shuffle on
    the sample key."""
    return (
        members.groupBy("sample")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("field", "payload")))
            ).alias("fields")
        )
    )
