"""WARC (ISO/IEC 28500) source/sink — the container format every
Common-Crawl-scale web pipeline ingests (north-star web-corpus I/O; no
reference counterpart).  Dependency-free: the format is a handful of
CRLF-framed headers plus Content-Length payload framing, small enough
that hand-rolling beats stubbing (same policy as the msgpack/avro/
safetensors codecs in this package).

Spark-first shape:

- **read**: ``spark.read.format("binaryFile")`` enumerates the files
  (glob patterns work natively), then an Arrow-batched ``mapInArrow``
  parses each file's records.  Parallelism is per-file — WARC has no
  sync markers, and record-level splitting needs an external offset
  index (Common Crawl ships CDX indexes for exactly this; out of scope
  here) — so at 100 TB the layout answer is "many ~1 GiB shards", which
  is what the parallel writer produces and what Common Crawl itself
  does (segments of ~1 GiB ``.warc.gz`` files).
- **write**: one shard per partition (``part-NNNNN.warc[.gz]``),
  response records with mandatory ``WARC-Record-ID`` / ``WARC-Date`` /
  ``Content-Length`` headers plus ``WARC-Target-URI``.  With
  ``compress=True`` each RECORD is its own gzip member (the Common
  Crawl layout: multi-member concatenation keeps record-level random
  access possible via byte offsets); the reader decompresses
  multi-member streams transparently.

Record IDs are deterministic (``uuid5`` over target URI + date), so
round-trips are reproducible and partition-invariant.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_warc",
    "read_warc_streaming",
    "write_warc",
    "warc_record_bytes",
    "parse_warc_records",
]

WARC_VERSION = b"WARC/1.0"
DEFAULT_WARC_DATE = "2026-01-01T00:00:00Z"

#: read_warc output schema (DDL)
WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload binary"
)


def warc_record_bytes(
    uri: str,
    payload: bytes,
    *,
    date: str = DEFAULT_WARC_DATE,
    warc_type: str = "response",
    content_type: str = "text/plain",
) -> bytes:
    """One ISO 28500 record: version line, named headers, empty line,
    ``Content-Length`` bytes of block, two CRLFs."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{uri}|{date}")
    header = (
        WARC_VERSION + b"\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return header + payload + b"\r\n\r\n"


def parse_warc_records(blob: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Iterate ``(headers, payload)`` over a (decompressed) WARC stream.

    Header names are folded to lowercase; framing is by the mandatory
    ``Content-Length`` (payloads may contain anything, including CRLF
    pairs and nested WARC text).  Malformed framing raises ``ValueError``
    — fail-fast, same contract as the other codec sources (callers
    wanting dead-letter semantics wrap with ``try_map``).
    """
    pos, n = 0, len(blob)
    while pos < n:
        while blob.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = blob[pos:hdr_end].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0]!r}")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            name, _, value = line.partition(":")
            fields[name.strip().lower()] = value.strip()
        if "content-length" not in fields:
            raise ValueError("WARC record missing mandatory Content-Length")
        clen = int(fields["content-length"])
        start = hdr_end + 4
        payload = blob[start : start + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        pos = start + clen
        yield fields, payload


def _maybe_gunzip(name: str, blob: bytes) -> bytes:
    if not name.endswith(".gz"):
        return blob
    # GzipFile reads CONCATENATED members to exhaustion — required for the
    # Common Crawl per-record-member layout
    with gzip.GzipFile(fileobj=io.BytesIO(blob)) as fh:
        return fh.read()


def _decode_warc_files(files: DataFrame) -> DataFrame:
    """Arrow-batched record decode over a (path, content) file frame —
    shared by the batch and streaming readers (the map is stateless, so
    the same transformation applies to a streaming binaryFile scan).

    ``mapInArrow`` building typed Arrow arrays directly, not ``mapInPandas``:
    the record fields never need a pandas frame, and the pandas path pays an
    O(rows) object-block construction plus a pandas→Arrow conversion per
    batch on top of the same per-record parse.  Measured on the sf0.1 crawl
    corpus (alternating-order medians, noop sink): 1.08×/1.05×/1.21× in
    Arrow's favor at 32/8/1 decode tasks — the win grows with rows per task,
    so at production split sizes (a ~1 GiB .warc.gz shard is ~10⁴-10⁵
    records) the pandas overhead is pure waste.  Output is bit-identical
    (`exceptAll` symmetric diff 0 both ways at 5,000 records)."""
    import pyarrow as pa

    files = files.select("path", "content")
    out_schema = pa.schema(
        [
            ("record_id", pa.string()),
            ("warc_type", pa.string()),
            ("target_uri", pa.string()),
            ("warc_date", pa.string()),
            ("content_type", pa.string()),
            ("content_length", pa.int64()),
            ("payload", pa.binary()),
        ]
    )

    def decode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            names, blobs = batch.column(0), batch.column(1)
            rid, wty, uri, dat, cty, cln, pay = [], [], [], [], [], [], []
            for i in range(batch.num_rows):
                blob = _maybe_gunzip(names[i].as_py(), blobs[i].as_py())
                for fields, payload in parse_warc_records(blob):
                    rid.append(fields.get("warc-record-id"))
                    wty.append(fields.get("warc-type"))
                    uri.append(fields.get("warc-target-uri"))
                    dat.append(fields.get("warc-date"))
                    cty.append(fields.get("content-type"))
                    cln.append(len(payload))
                    pay.append(payload)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rid, pa.string()),
                    pa.array(wty, pa.string()),
                    pa.array(uri, pa.string()),
                    pa.array(dat, pa.string()),
                    pa.array(cty, pa.string()),
                    pa.array(cln, pa.int64()),
                    pa.array(pay, pa.binary()),
                ],
                schema=out_schema,
            )

    return files.mapInArrow(decode, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) (glob ok; ``.gz`` names decompressed, multi-member
    streams included) into rows of :data:`WARC_SCHEMA`."""
    return _decode_warc_files(spark.read.format("binaryFile").load(path))


#: binaryFile's fixed schema — the streaming source requires it explicitly
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_streaming(spark: SparkSession, path: str) -> DataFrame:
    """Streaming WARC reader: a ``binaryFile`` file-source stream (new
    shards are discovered per micro-batch — the continuous-ingestion
    shape for a crawl landing directory) through the same Arrow-batched
    record decode as :func:`read_warc`.  Per-file parallelism, exactly
    like batch; pair with ``Trigger.AvailableNow`` for batch-equivalent
    runs (pytest-asserted)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
    )
    return _decode_warc_files(files)


def write_warc(
    df: Any,
    path: str,
    *,
    uri_col: str,
    payload_col: str,
    date_col: str | None = None,
    content_type: str = "text/plain",
    warc_type: str = "response",
    compress: bool = False,
    mode: str = "overwrite",
) -> int:
    """Partition-parallel WARC sink: each partition writes one
    ``part-NNNNN.warc`` (or ``.warc.gz`` with per-record gzip members
    when ``compress=True`` — the Common Crawl layout).

    ``payload_col`` may be string (UTF-8 encoded) or binary.
    ``warc_type="conversion"`` writes Common-Crawl-WET-style extracted-
    text records (same framing; only the WARC-Type header differs).
    ``mode`` follows DataFrameWriter semantics (same contract as
    write_msgpack).  Returns the number of records written.
    """
    from pyspark.sql import functions as F

    from ironbeam_spark.collection import PCollection

    modes = {"overwrite", "append", "error", "errorifexists", "ignore"}
    if mode not in modes:
        raise ValueError(f"write_warc mode must be one of {sorted(modes)}, got {mode!r}")

    d = df.df if isinstance(df, PCollection) else df
    suffix = ".warc.gz" if compress else ".warc"
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if f.endswith((".warc", ".warc.gz"))]
    if mode == "overwrite":
        for f in existing:
            os.remove(os.path.join(path, f))
    elif mode in ("error", "errorifexists") and existing:
        raise FileExistsError(f"WARC shards already exist at {path} (mode={mode})")
    elif mode == "ignore" and existing:
        return 0
    token = f"-{uuid.uuid4().hex[:8]}" if mode == "append" else ""

    uri_c, pay_c, date_c = uri_col, payload_col, date_col

    def write_partition(batches: Iterator) -> Iterator:
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        for batch in batches:
            for rec in batch.to_pylist():
                payload = rec[pay_c]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                record = warc_record_bytes(
                    str(rec[uri_c]),
                    bytes(payload),
                    date=str(rec[date_c]) if date_c else DEFAULT_WARC_DATE,
                    warc_type=warc_type,
                    content_type=content_type,
                )
                # mtime=0 pins the gzip header — shard bytes stay
                # deterministic for a given partition's rows
                buf.write(gzip.compress(record, mtime=0) if compress else record)
                n += 1
        if n:
            with open(os.path.join(path, f"part-{pid:05d}{token}{suffix}"), "wb") as fh:
                fh.write(buf.getvalue())
        yield pa.RecordBatch.from_pylist([{"n": n}], schema=pa.schema([("n", pa.int64())]))

    counts = d.mapInArrow(write_partition, "n long")
    written = counts.agg(F.sum("n")).collect()[0][0]
    return int(written or 0)
