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
    from ironbeam_spark.sources.compression import _commit_shard, _prepare_shard_dir

    token = _prepare_shard_dir(path, mode, (".tar",))
    if token is None:
        return 0
    out_dir = path
    cols = [key_col, *field_cols]

    def write_partition(batches: Iterator) -> Iterator:
        import tarfile

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
                    # '.' would corrupt the first-dot sample/field split on
                    # read-back (sample 'v1.2' comes back as 'v1'); '/'
                    # would read back as a path component.  Fail loudly at
                    # write time — silent regrouping is the worse outcome.
                    if "." in key or "/" in key:
                        raise ValueError(
                            f"tar sample key {key!r} must not contain '.' or '/'"
                        )
                    for field, v in zip(field_cols, fields):
                        if v is None:
                            continue
                        if isinstance(v, str):
                            payload = v.encode("utf-8")
                        elif isinstance(v, (bytes, bytearray, memoryview)):
                            payload = bytes(v)
                        else:
                            # bytes(np.int64(5)) is FIVE ZERO BYTES — an
                            # unchecked cast would silently destroy data
                            raise ValueError(
                                f"field {field!r} must be string or binary, "
                                f"got {type(v).__name__}"
                            )
                        info = tarfile.TarInfo(name=f"{key}.{field}")
                        info.size = len(payload)
                        info.mtime = 0  # fixed: shard bytes are reproducible
                        tf.addfile(info, io.BytesIO(payload))
                        n += 1
        if n:
            _commit_shard(out_dir, f"part-{pid:05d}{token}.tar", buf.getvalue())
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
    intact).  A member name WITHOUT a dot maps to ``field = ''`` — the
    documented convention for bare-named members in external tars (they
    group under their name with an empty field key rather than being
    silently dropped; filter ``field = ''`` upstream to exclude them).
    A name appearing more than once WITHIN a shard keeps the LAST
    occurrence — GNU/POSIX append (``tar -r``) semantics, matching what
    ``tar -x`` would leave on disk.  Corrupt archives raise ``ValueError``
    (wrap with a dead-letter pattern upstream if shards may be damaged)."""
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
            # one yielded frame PER SHARD: peak executor memory stays at a
            # single shard's members even when binaryFile packs many whole
            # shards into one Arrow batch
            for shard, blob in zip(pdf["path"], pdf["content"]):
                # keyed dict => within-shard LAST occurrence wins (tar
                # append semantics); dict preserves insertion order so
                # first-seen member order is otherwise kept
                rows: dict[tuple[str, str], bytes] = {}
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            payload = tf.extractfile(m).read()
                            name = m.name.rsplit("/", 1)[-1]
                            sample, _, field = name.partition(".")
                            rows[(sample, field)] = payload
                except tarfile.TarError as e:
                    raise ValueError(f"tar: corrupt shard {shard}: {e}") from e
                yield pd.DataFrame(
                    [(shard, s, f, p) for (s, f), p in rows.items()],
                    columns=["shard", "sample", "field", "payload"],
                )

    return files.mapInPandas(
        walk, "shard string, sample string, field string, payload binary"
    )


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Regroup member rows into one row per sample:
    ``(sample string, fields map<string, binary>)`` with map entries sorted
    by field name (deterministic downstream hashing).

    A sample carried by SEVERAL shards (a re-written dataset, overlapping
    shard globs) resolves to ONE whole-shard winner: the lexicographically
    smallest shard path containing the sample supplies ALL of its fields.
    The previous per-field ``min(payload)`` dedup could stitch a row from
    different generations (txt from copy 1, json from copy 2 — round-6
    ADVICE); whole-sample winners can't mix, and match the WebDataset
    contract that a sample lives entirely inside one shard.  Within a
    shard, :func:`read_tar_members` has already applied last-wins, so
    ``map_from_entries`` (Spark's ``mapKeyDedupPolicy=EXCEPTION`` default)
    sees unique keys.

    Cost shape: the winner is decided on (sample, shard) rows WITHOUT
    payloads — one combinable min aggregate — and only the winning copy's
    payload bytes enter the regroup shuffle (a losing multi-MB copy never
    crosses the wire; collecting all copies and filtering in the group
    was the round-6 review's finding).  Per-group memory is exactly one
    sample's members."""
    winners = members.groupBy("sample").agg(F.min("shard").alias("shard"))
    kept = members.join(winners, on=["sample", "shard"], how="left_semi")
    agg = kept.groupBy("sample").agg(
        F.collect_list(F.struct("field", "payload")).alias("_m")
    )
    return agg.select(
        "sample", F.map_from_entries(F.sort_array(F.col("_m"))).alias("fields")
    )
