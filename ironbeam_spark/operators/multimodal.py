"""Multimodal column conventions + operators (north-star extension —
BASELINE.json; no analogue in the reference, whose closest surface is opaque
payload sources, ``src/helpers/stdlib.rs:160``).

Convention: a modality column is an opaque ``binary`` payload plus a typed
metadata struct built here (``byte_len``, ``sha256``, ``modality``,
``content_type``).  Real decode libraries (PIL/librosa/ffmpeg) are NOT in
this container, so decode is split into:

- **plumbing (real, tested)**: schema, Arrow batch shape, ``mapInPandas``
  signature, partitioning — identical to what a real decoder needs;
- **codec (stubbed)**: ``decode_image``/``decode_audio`` raise
  ``NotImplementedError`` with the integration point documented;
  ``fake_decode_features`` is the deterministic stand-in the test suite and
  oracle use (pure byte arithmetic, reproducible anywhere).

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage); the
metadata projection is pure codegen; nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "as_blob",
    "blob_metadata",
    "decode_image",
    "decode_audio",
    "fake_decode_features",
]


def as_blob(col: Column | str) -> Column:
    """UTF-8 bytes of a column — the test tables carry no real media, so text
    bytes stand in as the opaque payload; the pipeline shape is unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    return F.encode(c, "UTF-8")


def blob_metadata(blob: Column, modality: str, content_type: str) -> Column:
    """Typed metadata struct for an opaque payload column.  Pure codegen
    (length + sha2), no Python."""
    return F.struct(
        F.octet_length(blob).cast("long").alias("byte_len"),
        F.sha2(blob, 256).alias("sha256"),
        F.lit(modality).alias("modality"),
        F.lit(content_type).alias("content_type"),
    )


def decode_image(df: DataFrame, blob_col: str):  # pragma: no cover - stub
    """STUB — image decode (resize / pixel stats / EXIF).

    Integration point: a ``mapInPandas`` function whose batch loop opens each
    payload with PIL (``Image.open(io.BytesIO(b))``), emits
    ``width/height/mode`` + a feature vector; partitioning and schema
    handling are exactly :func:`fake_decode_features`.  PIL is not available
    in this environment."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the codec into the "
        "fake_decode_features mapInPandas skeleton"
    )


def decode_audio(df: DataFrame, blob_col: str):  # pragma: no cover - stub
    """STUB — audio decode / frame-sample (librosa/ffmpeg not available)."""
    raise NotImplementedError(
        "audio decode requires librosa/ffmpeg; wire the codec into the "
        "fake_decode_features mapInPandas skeleton"
    )


def fake_decode_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Deterministic stand-in decoder with the real plumbing: Arrow-batched
    ``mapInPandas``, binary in → fixed-schema features out.

    Features are pure byte arithmetic (no codec): payload length, first/last
    byte, and a little-endian u32 of the first 4 bytes — reproducible in any
    engine, so the SQL oracle can verify the full pipeline."""

    def decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            blobs = pdf[blob_col]
            out = pdf[[id_col]].copy()
            out["byte_len"] = blobs.map(len).astype("int64")
            out["first_byte"] = blobs.map(lambda b: b[0] if len(b) else -1).astype("int64")
            out["last_byte"] = blobs.map(lambda b: b[-1] if len(b) else -1).astype("int64")
            out["head_u32"] = blobs.map(
                lambda b: int.from_bytes(b[:4], "little") if len(b) >= 4 else -1
            ).astype("int64")
            yield out

    schema = (
        f"{id_col} long, byte_len long, first_byte long, last_byte long, head_u32 long"
    )
    return df.select(id_col, blob_col).mapInPandas(decode, schema)
