"""Pure-Python baseline JPEG codec (operators/jpeg.py).

The exactness tier mirrors the suite oracle: constant 8x8 tiles with flat
quant tables round-trip to the closed-form floor(x+0.5) YCbCr chain.  The
tolerance tier pins the flat-table error bound (|err| <= 4: color-convert
rounding plus ±0.5/coefficient quantizer rounding) that makes the codec
usable as a near-lossless carrier; the fuzz tier pins the ValueError-only
dead-letter contract.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ironbeam_spark.operators.jpeg import (
    _ZIGZAG,
    _AC_CODES,
    _DC_CODES,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _chain(r, g, b):
    """The documented closed-form pixel contract: RGB -> clamped/rounded
    YCbCr -> clamped/rounded RGB, floor(x+0.5) everywhere (this is the
    arithmetic the q_jpeg_decode SQL oracle mirrors)."""

    def fl(v):
        return min(255, max(0, math.floor(v + 0.5)))

    y = fl(0.299 * r + 0.587 * g + 0.114 * b)
    cb = fl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = fl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    return (
        fl(y + 1.402 * (cr - 128)),
        fl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        fl(y + 1.772 * (cb - 128)),
    )


def test_zigzag_is_the_spec_sequence():
    # the first two anti-diagonal runs of T.81 Figure A.6 — a transcription
    # error in either codec direction would cancel out; pin the real order
    assert _ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(_ZIGZAG) == list(range(64))


def test_huffman_tables_are_valid_prefix_codes():
    for codes in (_DC_CODES, _AC_CODES):
        seen = {(ln, c) for c, ln in codes.values()}
        assert len(seen) == len(codes)
        # no code may be a prefix of another, and no all-ones code
        for c, ln in codes.values():
            assert c != (1 << ln) - 1, "all-ones code is reserved"
            for c2, ln2 in codes.values():
                if ln2 > ln:
                    assert (c2 >> (ln2 - ln)) != c or (c2, ln2) == (c, ln)


def test_constant_tiles_decode_to_exact_chain():
    w, h = 24, 16
    tiles = {}
    rgb = bytearray(w * h * 3)
    for ty in range(h // 8):
        for tx in range(w // 8):
            color = ((ty * 3 + tx) * 41 % 256, (tx * 97 + 13) % 256, (ty * 57 + 201) % 256)
            tiles[(ty, tx)] = color
            for yy in range(8):
                for xx in range(8):
                    p = ((ty * 8 + yy) * w + tx * 8 + xx) * 3
                    rgb[p : p + 3] = bytes(color)
    px = decode_jpeg_pixels(encode_jpeg(w, h, bytes(rgb)))
    for (ty, tx), color in tiles.items():
        want = _chain(*color)
        blk = px[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8]
        assert np.all(blk.reshape(-1, 3) == np.array(want, dtype=np.uint8)), (
            ty, tx, color, want,
        )


@pytest.mark.parametrize("w,h", [(13, 9), (1, 1), (8, 8), (31, 2), (2, 31), (16, 24)])
def test_flat_roundtrip_error_bound(w, h):
    """Flat tables: losses are YCbCr round-trip rounding (±1/channel) plus
    ±0.5 per DCT coefficient from quantizer rounding — |err| <= 4 even on
    mod-256 wrap edges (the worst case for the coefficient term); also
    exercises edge padding on non-multiple-of-8 sizes."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    px = np.stack(
        [(xx * 3 + yy * 2) % 256, (xx + yy * 5) % 256, (xx * 7 + yy * 11) % 256],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(w, h, px.tobytes()))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_420_constant_macroblocks_near_exact():
    w, h = 32, 16
    px = np.zeros((h, w, 3), np.uint8)
    px[:, :16] = (40, 90, 200)
    px[:, 16:] = (200, 13, 77)
    out = decode_jpeg_pixels(encode_jpeg(w, h, px.tobytes(), subsampling="420"))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
    # and odd sizes survive the 16-alignment padding
    w, h = 19, 11
    px = np.full((h, w, 3), 120, np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(w, h, px.tobytes(), subsampling="420"))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - 120).max() <= 2


def test_std50_smooth_image_reasonable():
    """Annex-K tables on a smooth gradient: lossy but bounded — sanity that
    quantization, ZRL/EOB runs, and DC prediction interact correctly."""
    w, h = 40, 24
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    px = np.stack([xx * 4 % 256, yy * 6 % 256, (xx + yy) * 3 % 256], axis=-1).astype(
        np.uint8
    )
    out = decode_jpeg_pixels(encode_jpeg(w, h, px.tobytes(), quant="std50"))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 20


def test_unsupported_sof_and_garbage_rejected():
    # arithmetic coding (SOF9): unsupported SOF must raise, not misparse
    sof9 = b"\xff\xd8" + b"\xff\xc9" + (17).to_bytes(2, "big") + bytes(15)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg_pixels(sof9)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xe0JFIF")  # truncated
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg at all")


def test_decoder_handles_16bit_quant_tables():
    """Pq=1 DQT (16-bit quantizers) parse correctly: re-encode a flat file
    and rewrite its 8-bit DQT segments as 16-bit with the same values —
    the decode must be identical."""
    w = h = 8
    rgb = bytes([77, 150, 33]) * (w * h)
    b = encode_jpeg(w, h, rgb)
    out = bytearray()
    i = 0
    while i < len(b):
        if b[i] == 0xFF and b[i + 1] == 0xDB:
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            tid = b[i + 4]
            vals = b[i + 5 : i + 5 + 64]
            body = bytes([0x10 | tid]) + b"".join(
                v.to_bytes(2, "big") for v in vals
            )
            out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
            i += 2 + seglen
        else:
            out.append(b[i])
            i += 1
    got = decode_jpeg_pixels(bytes(out))
    want = decode_jpeg_pixels(b)
    assert np.array_equal(got, want)


def test_truncation_and_bitflip_fuzz_raise_only_valueerror():
    """Dead-letter guarantee at the codec boundary: truncating a valid
    JPEG at EVERY byte position, and random single-byte corruption, must
    raise ValueError and nothing else (an IndexError from a torn scan
    would escape decode_image's error-column catch and kill the job)."""
    import random

    rng = random.Random(11)
    rgb = bytes((i * 7) % 256 for i in range(16 * 16 * 3))
    variants = [
        encode_jpeg(16, 16, rgb),
        encode_jpeg(16, 16, rgb, subsampling="420"),
        encode_jpeg(16, 16, rgb, quant="std50"),
    ]
    for b in variants:
        for cut in range(2, len(b)):
            try:
                decode_jpeg_pixels(b[:cut])
            except ValueError:
                pass
        for _ in range(2000):
            pos = rng.randrange(len(b))
            bb = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
            try:
                decode_jpeg_pixels(bb)
            except ValueError:
                pass


def test_dimension_bomb_rejected():
    """A tiny header declaring a 65535x65535 frame must raise ValueError
    (MAX_IMAGE_PIXELS guard), never attempt a 12 GiB allocation."""
    sof = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + bytes([8])
        + (65535).to_bytes(2, "big")
        + (65535).to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_jpeg_pixels(sof)


# ------------------------------------------------- progressive (Annex G)


def _test_image(w: int, h: int, kind: str) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    if kind == "grad":
        px = np.stack([xx * 4 % 256, yy * 6 % 256, (xx + yy) * 3 % 256], axis=-1)
    elif kind == "const":
        px = np.full((h, w, 3), (77, 150, 33), dtype=int)
    elif kind == "sparse":  # long zero runs -> ZRLs and EOB runs
        px = np.full((h, w, 3), 128, dtype=int)
        px[::7, ::5, 0] = 255
        px[3::11, 2::9, 2] = 0
    else:  # deterministic noise: dense AC spectra
        s = xx * 7919 + yy * 104729 + 12345
        px = np.stack([(s * 31) % 256, (s * 17) % 256, (s * 13) % 256], axis=-1)
    return px.astype(np.uint8)


@pytest.mark.parametrize("kind", ["grad", "const", "sparse", "noise"])
@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("successive", [True, False])
def test_progressive_equals_baseline(kind, sub, successive):
    """The cross-codec invariant: a progressive encode of the same pixels
    decodes to EXACTLY the baseline decode — both entropy layers carry the
    same quantized coefficients, so any Annex G bug (spectral bands,
    successive approximation, EOB runs, correction bits) breaks equality
    bit-for-bit.  17x13 forces partial MCUs; std50 forces wide AC spectra
    with real quantizers."""
    from ironbeam_spark.operators.jpeg import encode_jpeg_progressive

    for w, h in [(17, 13), (24, 16)]:
        rgb = _test_image(w, h, kind).tobytes()
        for quant in ["flat", "std50"]:
            base = decode_jpeg_pixels(encode_jpeg(w, h, rgb, sub, quant))
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive(
                    w, h, rgb, sub, quant, successive=successive
                )
            )
            assert np.array_equal(base, prog), (w, h, quant)


def test_progressive_restart_markers():
    """DRI + RSTn inside every progressive scan (DC predictor and EOB-run
    reset at each interval) still decodes to the baseline output."""
    from ironbeam_spark.operators.jpeg import encode_jpeg_progressive

    w, h = 40, 24
    rgb = _test_image(w, h, "noise").tobytes()
    base = decode_jpeg_pixels(encode_jpeg(w, h, rgb))
    for ri in (1, 3):
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(w, h, rgb, restart_interval=ri)
        )
        assert np.array_equal(base, prog)


def test_progressive_eob_runs_span_blocks():
    """A mostly-flat image makes whole AC scans one long EOB run (>> 1
    block); the banded EOBn extension-bit path must reproduce it."""
    from ironbeam_spark.operators.jpeg import encode_jpeg_progressive

    w = h = 64  # 64 blocks per component, nearly all AC-empty
    px = np.full((h, w, 3), 200, dtype=np.uint8)
    px[30, 30] = (0, 0, 0)  # one busy block so the run has to break once
    base = decode_jpeg_pixels(encode_jpeg(w, h, px.tobytes()))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(w, h, px.tobytes()))
    assert np.array_equal(base, prog)


def test_progressive_fuzz_value_error_only():
    """Truncation + byte corruption over a progressive file must raise
    ValueError and nothing else (the dead-letter contract, same tier as
    the sequential fuzz)."""
    import random

    from ironbeam_spark.operators.jpeg import encode_jpeg_progressive

    rng = random.Random(13)
    rgb = bytes((i * 7) % 256 for i in range(16 * 16 * 3))
    b = encode_jpeg_progressive(16, 16, rgb, restart_interval=2)
    for cut in range(2, len(b)):
        try:
            decode_jpeg_pixels(b[:cut])
        except ValueError:
            pass
    for _ in range(3000):
        pos = rng.randrange(len(b))
        bb = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
        try:
            decode_jpeg_pixels(bb)
        except ValueError:
            pass
