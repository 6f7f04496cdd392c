"""safetensors codec (sources/safetensors.py): byte-level interop against
an INDEPENDENT reference implementation of the published spec (header
length + JSON + contiguous data region), exact float32 roundtrip, shard
atomicity conventions, fail-fast raggedness/null/corruption handling."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from ironbeam_spark.sources.safetensors import (
    read_safetensors_py,
    write_safetensors_py,
)


# --- independent reference codec (written from the spec, not the module) ---
def ref_write(path: str, tensors: dict[str, np.ndarray]) -> None:
    dt = {"<i8": "I64", "<f4": "F32", "<f8": "F64"}
    header, blobs, off = {}, [], 0
    for name, arr in tensors.items():
        b = np.ascontiguousarray(arr).tobytes()
        header[name] = {
            "dtype": dt[arr.dtype.str],
            "shape": list(arr.shape),
            "data_offsets": [off, off + len(b)],
        }
        blobs.append(b)
        off += len(b)
    hj = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(hj)) + hj + b"".join(blobs))


def ref_read(path: str) -> dict[str, np.ndarray]:
    dt = {"I64": "<i8", "F32": "<f4", "F64": "<f8"}
    raw = open(path, "rb").read()
    (hlen,) = struct.unpack_from("<Q", raw, 0)
    header = json.loads(raw[8 : 8 + hlen])
    data = raw[8 + hlen :]
    out = {}
    for name, t in header.items():
        lo, hi = t["data_offsets"]
        out[name] = np.frombuffer(data[lo:hi], dtype=dt[t["dtype"]]).reshape(
            t["shape"]
        )
    return out


def _vec_df(spark, rows, dim=4):
    rng = np.random.default_rng(5)
    data = [
        (i, [float(np.float32(x)) for x in rng.normal(size=dim)])
        for i in range(rows)
    ]
    return data, spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_spark_write_reference_read(spark, tmp_path):
    data, df = _vec_df(spark, 37)
    path = str(tmp_path / "st")
    n = write_safetensors_py(df.repartition(3), path, mode="overwrite")
    assert n == 37
    shards = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    assert 1 <= len(shards) <= 3 and not any(f.startswith(".") for f in shards)
    got = {}
    for f in shards:
        t = ref_read(os.path.join(path, f))
        assert t["embeddings"].dtype.str == "<f4"
        assert t["embeddings"].shape == (len(t["ids"]), 4)
        for i, row in zip(t["ids"], t["embeddings"]):
            got[int(i)] = [float(x) for x in row]
    want = {i: [float(np.float32(x)) for x in v] for i, v in data}
    assert got == want  # float32 bits exact end-to-end


def test_reference_write_spark_read(spark, tmp_path):
    path = str(tmp_path / "ext")
    os.makedirs(path)
    ids = np.array([7, 8, 9], dtype="<i8")
    emb = np.array([[1.5, -2.25], [0.0, 4.0], [3.125, 8.5]], dtype="<f4")
    ref_write(os.path.join(path, "part-00000.safetensors"), {"ids": ids, "embeddings": emb})
    rows = {r.vec_id: r.embedding for r in read_safetensors_py(spark, path).collect()}
    assert rows == {7: [1.5, -2.25], 8: [0.0, 4.0], 9: [3.125, 8.5]}


def test_roundtrip_float64_and_empty_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "vec_id long, embedding array<double>"
    ).repartition(8)  # most partitions empty -> no footer-only shards
    path = str(tmp_path / "f64")
    assert write_safetensors_py(df, path, dtype="float64") == 2
    shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    assert 1 <= len(shards) <= 2
    back = read_safetensors_py(spark, path, dtype="float64")
    assert {(r.vec_id, tuple(r.embedding)) for r in back.collect()} == {
        (1, (0.1, 0.2)),
        (2, (0.3, 0.4)),
    }


def test_mode_semantics(spark, tmp_path):
    _, df = _vec_df(spark, 5)
    path = str(tmp_path / "modes")
    write_safetensors_py(df, path)
    with pytest.raises(FileExistsError):
        write_safetensors_py(df, path, mode="error")
    assert write_safetensors_py(df, path, mode="ignore") == 0
    assert write_safetensors_py(df, path, mode="append") == 5
    assert read_safetensors_py(spark, path).count() == 10
    assert write_safetensors_py(df, path, mode="overwrite") == 5
    assert read_safetensors_py(spark, path).count() == 5


def test_ragged_and_null_vectors_fail_fast(spark, tmp_path):
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    ).coalesce(1)
    with pytest.raises(Exception, match="ragged"):
        write_safetensors_py(ragged, str(tmp_path / "r"))
    withnull = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<float>"
    ).coalesce(1)
    with pytest.raises(Exception, match="null"):
        write_safetensors_py(withnull, str(tmp_path / "n"))


def test_corrupt_inputs_raise_valueerror(spark, tmp_path):
    path = str(tmp_path / "bad")
    os.makedirs(path)
    cases = {
        "trunc.safetensors": b"\x05\x00",  # shorter than the length field
        "badlen.safetensors": struct.pack("<Q", 1 << 40) + b"{}",
        "badjson.safetensors": struct.pack("<Q", 2) + b"{!",
    }
    # offsets beyond the data region
    hj = json.dumps(
        {"ids": {"dtype": "I64", "shape": [4], "data_offsets": [0, 32]},
         "embeddings": {"dtype": "F32", "shape": [4, 1], "data_offsets": [32, 48]}},
        separators=(",", ":"),
    ).encode()
    cases["badoff.safetensors"] = struct.pack("<Q", len(hj)) + hj + b"\0" * 8
    for name, blob in cases.items():
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(blob)
        with pytest.raises(Exception, match="safetensors"):
            read_safetensors_py(
                spark, os.path.join(path, name)
            ).collect()
