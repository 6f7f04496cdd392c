"""MPEG audio frame probing (operators/mpeg.py).

The walk is self-verifying — each frame's computed length must land
exactly on the next sync word — so these tests pin the length formulas
and bitrate/samplerate tables through full synth -> probe round trips
across the version x layer matrix, then the dead-letter contract.
"""

from __future__ import annotations

import pytest

from ironbeam_spark.operators.mpeg import (
    _BITRATE_KBPS,
    _SAMPLE_RATES,
    probe_mpeg_bytes,
    synthesize_mpeg_stream,
)


@pytest.mark.parametrize("version", ["1", "2", "2.5"])
@pytest.mark.parametrize("layer", [1, 2, 3])
def test_roundtrip_all_versions_layers(version, layer):
    for sidx in range(3):
        for bidx in (1, 7, 14):
            b = synthesize_mpeg_stream(
                version, layer, (bidx,), sidx, n_frames=9, channels=1
            )
            d = probe_mpeg_bytes(b)
            hz = _SAMPLE_RATES[version][sidx]
            group = "1" if version == "1" else "2"
            kbps = _BITRATE_KBPS[(group, layer)][bidx - 1]
            spf = 384 if layer == 1 else (
                1152 if layer == 2 or version == "1" else 576
            )
            assert d["fmt"] == f"mp{layer}"
            assert d["version"] == version
            assert d["sample_rate"] == hz
            assert d["channels"] == 1
            assert d["frames"] == 9
            assert d["kbps_min"] == d["kbps_max"] == kbps
            assert d["vbr"] is False
            num = 1000 * 9 * spf
            assert d["duration_ms"] == (2 * num + hz) // (2 * hz)


def test_padding_crc_id3_and_vbr():
    # 44.1 kHz with padding every 3rd frame (the CBR reality), CRC frames,
    # an ID3v2 prefix and an ID3v1 trailer, VBR across three indices
    b = synthesize_mpeg_stream(
        "1", 3, (5, 9, 14), 0, n_frames=25, channels=2,
        padding_every=3, crc=True, id3v2_size=73, id3v1=True,
    )
    d = probe_mpeg_bytes(b)
    assert d["frames"] == 25
    assert d["channels"] == 2
    assert d["vbr"] is True
    assert (d["kbps_min"], d["kbps_max"]) == (64, 320)
    assert d["duration_ms"] == round(1000 * 25 * 1152 / 44100)


def test_id3v2_footer_flag():
    b = synthesize_mpeg_stream("2", 3, (4,), 1, n_frames=3)
    # hand-build a tag with the footer flag: content 20 bytes + 10 footer
    tag = b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, 20]) + bytes(30)
    assert probe_mpeg_bytes(tag + b)["frames"] == 3


def test_dead_letter_contract():
    with pytest.raises(ValueError, match="sync"):
        probe_mpeg_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="no frame data"):
        probe_mpeg_bytes(b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 1]) + b"\x00")
    good = synthesize_mpeg_stream("1", 3, (9,), 0, n_frames=4)
    with pytest.raises(ValueError, match="truncated"):
        probe_mpeg_bytes(good[:-10])
    # mid-stream samplerate change = parameter drift, not silent averaging
    other = synthesize_mpeg_stream("1", 3, (9,), 1, n_frames=1)
    with pytest.raises(ValueError, match="parameters change"):
        probe_mpeg_bytes(good + other)
    # free-format bitrate (index 0) is honestly unsupported
    free = bytearray(synthesize_mpeg_stream("1", 3, (9,), 0, n_frames=1))
    free[2] &= 0x0F  # clear the bitrate index nibble
    with pytest.raises(ValueError, match="free-format"):
        probe_mpeg_bytes(bytes(free))


def test_fuzz_value_error_only():
    """Truncation at every byte + random corruption must raise ValueError
    or return a dict — never any other exception type."""
    import random

    rng = random.Random(7)
    b = synthesize_mpeg_stream(
        "1", 3, (5, 9), 0, n_frames=6, padding_every=2, id3v2_size=11
    )
    for cut in range(len(b)):
        try:
            probe_mpeg_bytes(b[:cut])
        except ValueError:
            pass
    for _ in range(4000):
        pos = rng.randrange(len(b))
        bb = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
        try:
            probe_mpeg_bytes(bb)
        except ValueError:
            pass


def test_probe_dataframe_dead_letter(spark):
    from ironbeam_spark.operators.mpeg import probe_mpeg_audio

    rows = [
        (1, synthesize_mpeg_stream("1", 3, (9,), 0, n_frames=8)),
        (2, b"not audio at all"),
        (3, synthesize_mpeg_stream("2", 2, (3, 8), 2, n_frames=5, channels=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in probe_mpeg_audio(df, "doc_id", "payload").collect()}
    assert out[1].fmt == "mp3" and out[1].frames == 8 and out[1].error is None
    assert out[2].fmt is None and "sync" in out[2].error
    assert out[3].fmt == "mp2" and out[3].vbr and out[3].sample_rate == 16000
