"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec).

Completes the real-codec image family (BMP/PPM/PNG/GIF in
``operators/multimodal.py``) with the one format a real 100 TB multimodal
pipeline cannot avoid.  No reference analogue (the reference ships no image
codecs at all; its nearest surface is the opaque-payload custom source,
``src/helpers/stdlib.rs:160``) — this is north-star multimodal
infrastructure, same tier as the PNG/GIF decoders.

Decoder (``decode_jpeg_pixels``): baseline + extended-sequential DCT
(SOF0/SOF1), 8-bit samples, 1- or 3-component scans, sampling factors
1-2 in each axis (4:4:4, 4:2:2, 4:4:0, 4:2:0), multiple DQT/DHT segments,
16-bit quantizers (Pq=1), restart intervals (DRI/RSTn with DC-predictor
reset), nearest-neighbor chroma upsampling, vectorized numpy IDCT.
Progressive (SOF2), arithmetic coding, hierarchical, and 12-bit modes
raise ``ValueError`` — the dead-letter column routes them, exactly like
every other unsupported format.

Encoder (``encode_jpeg``): baseline sequential, 4:4:4 or 4:2:0, with a
deliberate twist: instead of the spec's example Huffman tables (Annex K is
*informative*, not required), it emits SELF-DEFINED canonical fixed-length
tables in its DHT segments — every DC size symbol at 4 bits, every valid
AC (run, size) symbol at 9 bits.  Any prefix code carried by DHT is legal
JPEG; fixed-length tables cost compression (irrelevant for test corpora)
and buy two things: zero risk of a mistranscribed 162-entry constant, and
an encoder whose entropy layer shares no table data with the decoder's —
the decoder must honestly parse DHT to read our own files.

Exactness contract (what the suite oracle leans on): with the all-ones
("flat") quantization tables, a block that is CONSTANT in a channel
round-trips bit-exactly — its FDCT has a single DC coefficient 8·(s−128)
(integral), AC terms vanish, and the IDCT reproduces s to within 1e-12
before the final floor(x+0.5).  The RGB↔YCbCr conversions use floor(x+0.5)
rounding on exactly-specified double arithmetic, so an external SQL engine
can mirror the whole pixel chain closed-form (see ``q_jpeg_decode``).
For NON-constant blocks flat tables are near-lossless, not lossless:
quantizer rounding contributes ±0.5 per coefficient on top of the ±1
color-convert rounding (|err| <= 4 observed worst-case on wrap edges,
pinned in ``tests/test_jpeg.py``).
"""

from __future__ import annotations

import struct

__all__ = ["encode_jpeg", "decode_jpeg_pixels"]

# zig-zag scan order: index = zigzag position, value = row-major position.
# Generated from the definition (anti-diagonal walk), not transcribed.
def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):  # anti-diagonals of an 8x8 grid
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]  # constant row+col = s, walking up
        if s % 2 == 1:
            diag.reverse()  # odd diagonals run top-right -> bottom-left
        order.extend(r * 8 + c for r, c in diag)
    return order


_ZIGZAG = _zigzag_order()


def _dct_matrix():
    """Orthonormal 8-point DCT-II basis M; FDCT = M @ B @ M.T, IDCT = M.T @ C @ M."""
    import numpy as np

    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    M[0] /= np.sqrt(2.0)
    return M


def _clamp8(a):
    import numpy as np

    return np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(px):
    """JFIF full-range forward transform, floor(x+0.5) rounding — mirrored
    term-for-term by the q_jpeg_decode SQL oracle; do not reassociate."""
    r = px[:, :, 0].astype("float64")
    g = px[:, :, 1].astype("float64")
    b = px[:, :, 2].astype("float64")
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _clamp8(y), _clamp8(cb), _clamp8(cr)


def _ycbcr_to_rgb(y, cb, cr):
    """JFIF inverse transform, floor(x+0.5) — the oracle mirrors this too."""
    import numpy as np

    y = y.astype("float64")
    cb = cb.astype("float64") - 128.0
    cr = cr.astype("float64") - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([_clamp8(r), _clamp8(g), _clamp8(b)], axis=-1)


# --------------------------------------------------------------- encoder

# Fixed canonical Huffman tables (module docstring): DC sizes 0-11 at 4
# bits each; all 162 baseline AC symbols at 9 bits each.  BITS[i] = number
# of codes of length i+1; HUFFVAL = symbols in canonical order.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 8 + [len(_AC_SYMBOLS)] + [0] * 7


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

# Quantization tables.  "flat" = all ones (the exactness mode).  "std50" =
# the spec's example luminance/chrominance tables (Annex K.1, quality 50) —
# informative, widely published; used for realistic-compression tests only.
_STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_STD_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # entropy-stream byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, amplitude bits): negatives in ones'-complement per the spec."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_blocks(plane, qtable, writer, prev_dc: int) -> int:
    """FDCT + quantize + Huffman-code every 8x8 block of an edge-padded
    plane (row-major MCU order is the caller's responsibility: it passes
    blocks by slicing)."""
    import numpy as np

    M = _dct_matrix()
    h, w = plane.shape
    q = np.asarray(qtable, dtype="float64").reshape(8, 8)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype("float64") - 128.0
            coef = M @ blk @ M.T
            quant = np.rint(coef / q).astype(np.int64)
            zz = quant.reshape(-1)[_ZIGZAG]
            dc = int(zz[0])
            size, amp = _mag_bits(dc - prev_dc)
            code, ln = _DC_CODES[size]
            writer.put(code, ln)
            if size:
                writer.put(amp, size)
            prev_dc = dc
            run = 0
            last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_CODES[0xF0]  # ZRL
                    writer.put(code, ln)
                    run -= 16
                size, amp = _mag_bits(v)
                code, ln = _AC_CODES[(run << 4) | size]
                writer.put(code, ln)
                writer.put(amp, size)
                run = 0
            if last_nz < 63:
                code, ln = _AC_CODES[0x00]  # EOB
                writer.put(code, ln)
    return prev_dc


def _pad_to(plane, mult: int):
    import numpy as np

    h, w = plane.shape
    H = -(-h // mult) * mult
    W = -(-w // mult) * mult
    if (H, W) == (h, w):
        return plane
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _dht_segment(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "444",
    quant: str = "flat",
) -> bytes:
    """Encode raw RGB24 to a baseline JFIF JPEG.

    ``subsampling``: '444' (the oracle/exactness mode) or '420'.
    ``quant``: 'flat' (all-ones tables — constant blocks round-trip
    bit-exactly) or 'std50' (the spec's example tables)."""
    import numpy as np

    if len(rgb) != width * height * 3:
        raise ValueError("encode_jpeg: rgb length != width*height*3")
    if subsampling not in ("444", "420"):
        raise ValueError("encode_jpeg: subsampling must be '444' or '420'")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    y, cb, cr = _rgb_to_ycbcr(px)

    if quant == "flat":
        qy = qc = [1] * 64
    elif quant == "std50":
        qy, qc = _STD_LUMA_Q, _STD_CHROMA_Q
    else:
        raise ValueError("encode_jpeg: quant must be 'flat' or 'std50'")

    if subsampling == "444":
        hv_y, mcu = (1, 1), 8
        planes = [_pad_to(y, 8), _pad_to(cb, 8), _pad_to(cr, 8)]
    else:
        hv_y, mcu = (2, 2), 16
        yp = _pad_to(y, 16)
        # chroma: mean of each 2x2, floor(x+0.5) — deterministic ints
        def down(p):
            p = _pad_to(p, 2).astype("float64")
            m = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            return _clamp8(m)

        planes = [yp, _pad_to(down(cb), 8), _pad_to(down(cr), 8)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: table 0 (luma), table 1 (chroma), 8-bit precision, zigzag order
    for tid, q in ((0, qy), (1, qc)):
        zz = bytes(q[_ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    # SOF0: baseline, 3 components
    comp = bytes(
        [1, (hv_y[0] << 4) | hv_y[1], 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += b"\xff\xc0" + struct.pack(">H", 8 + 9) + bytes([8]) + struct.pack(
        ">HH", height, width
    ) + bytes([3]) + comp
    # DHT: DC/AC tables 0 used by all components (self-defined canonical)
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(0x10, _AC_BITS, _AC_SYMBOLS)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 6) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )

    w = _BitWriter()
    if subsampling == "444":
        # interleaved MCU = one block per component
        H, W = planes[0].shape
        prev = [0, 0, 0]
        for by in range(0, H, 8):
            for bx in range(0, W, 8):
                for ci, plane in enumerate(planes):
                    prev[ci] = _encode_blocks(
                        plane[by : by + 8, bx : bx + 8], [qy, qc, qc][ci], w, prev[ci]
                    )
    else:
        # MCU = 2x2 luma blocks + 1 cb + 1 cr
        H, W = planes[0].shape
        prev = [0, 0, 0]
        for by in range(0, H, 16):
            for bx in range(0, W, 16):
                for sy in (0, 8):
                    for sx in (0, 8):
                        prev[0] = _encode_blocks(
                            planes[0][by + sy : by + sy + 8, bx + sx : bx + sx + 8],
                            qy, w, prev[0],
                        )
                cy, cx = by // 2, bx // 2
                prev[1] = _encode_blocks(
                    planes[1][cy : cy + 8, cx : cx + 8], qc, w, prev[1]
                )
                prev[2] = _encode_blocks(
                    planes[2][cy : cy + 8, cx : cx + 8], qc, w, prev[2]
                )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError("jpeg: marker inside entropy data (truncated scan?)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current (byte-aligned) position."""
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _build_huff(bits: list[int], symbols: list[int]):
    """DHT -> {(length, code): symbol} with a max-length fast path list."""
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Undo ones'-complement magnitude coding."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(b: bytes):
    """Parse a baseline/extended-sequential JPEG to an H×W×3 uint8 RGB
    ndarray.  Raises ``ValueError`` — and ONLY ``ValueError`` — on
    progressive/arithmetic/12-bit/unsupported-sampling/corrupt/truncated
    payloads: the dead-letter catch upstream (``decode_image``) handles
    exactly that type, so an ``IndexError`` leaking from a truncated scan
    would kill a whole job for one bad file (fuzz-pinned in
    ``tests/test_jpeg.py``)."""
    try:
        return _decode_jpeg_pixels(b)
    except (IndexError, struct.error) as e:
        raise ValueError(f"jpeg: corrupt or truncated payload ({e})") from e


def _decode_jpeg_pixels(b: bytes):
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(b)

    while pos < n:
        if b[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = list(struct.unpack_from(">64H", seg, i))
                    i += 128
                else:
                    raise ValueError("jpeg: bad DQT precision")
                q = np.zeros(64, dtype="float64")
                for zz_i, natural in enumerate(_ZIGZAG):
                    q[natural] = vals[zz_i]
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                symbols = list(seg[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _build_huff(bits, symbols)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            fh, fw = struct.unpack_from(">HH", seg, 1)
            # decompression-bomb guard (same constant as PNG/GIF): a
            # 12-byte SOF can declare 65535x65535 = a 12 GiB pixel plane;
            # MemoryError would escape the dead-letter ValueError catch
            from ironbeam_spark.operators.multimodal import MAX_IMAGE_PIXELS

            if fw * fh > MAX_IMAGE_PIXELS:
                raise ValueError(f"jpeg: {fw}x{fh} exceeds MAX_IMAGE_PIXELS")
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": fw, "h": fh, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline/extended-sequential Huffman (SOF0/SOF1) "
                f"supported, got SOF marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                matches = [c for c in frame["comps"] if c["id"] == cs]
                if not matches:
                    raise ValueError(f"jpeg: scan references unknown component {cs}")
                scan.append((matches[0], tt >> 4, tt & 0x0F))
            pos += seglen
            pixels = _decode_scan(
                b, pos, frame, scan, qtables, htables, restart_interval
            )
            return pixels
        pos += seglen
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(b, pos, frame, scan, qtables, htables, restart_interval):
    import numpy as np

    fw, fh = frame["w"], frame["h"]
    if fw == 0 or fh == 0:
        raise ValueError("jpeg: zero dimension")
    comps = [s[0] for s in scan]
    if len(comps) not in (1, 3):
        raise ValueError("jpeg: only 1- or 3-component scans supported")
    if len(comps) != len(frame["comps"]):
        # a sequential file split into per-component scans would otherwise
        # decode only its first scan and silently return grayscale
        raise ValueError("jpeg: non-interleaved multi-scan files unsupported")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not all(
        1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in frame["comps"]
    ):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)

    # per-component coefficient planes (padded to whole MCUs)
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype="float64"))

    reader = _BitReader(b, pos)
    M = _dct_matrix()
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                reader.skip_restart()
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("jpeg: missing Huffman table")
                q = qtables.get(c["tq"])
                if q is None:
                    raise ValueError("jpeg: missing quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            zz = _decode_block(reader, dc_tab, ac_tab)
                        except _RestartMarker as e:
                            raise ValueError(
                                "jpeg: unexpected restart marker"
                            ) from e
                        pred[ci] += zz[0]
                        zz[0] = pred[ci]
                        coef = np.zeros(64, dtype="float64")
                        coef[_ZIGZAG] = zz
                        blk = M.T @ (coef.reshape(8, 8) * q) @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    # round + clamp each component plane, upsample to full resolution
    full = []
    for c, p in zip(comps, planes):
        samp = _clamp8(p)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            samp = np.repeat(np.repeat(samp, ry, axis=0), rx, axis=1)
        full.append(samp[:fh, :fw])

    if len(full) == 1:
        g = full[0]
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_block(reader, dc_tab, ac_tab):
    import numpy as np

    zz = np.zeros(64, dtype="int64")
    size = _huff_decode(reader, dc_tab)
    if size > 11:
        raise ValueError("jpeg: bad DC size")
    zz[0] = _extend(reader.bits(size), size) if size else 0
    i = 1
    while i < 64:
        sym = _huff_decode(reader, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i > 63 or size == 0 or size > 10:
            raise ValueError("jpeg: bad AC symbol")
        zz[i] = _extend(reader.bits(size), size)
        i += 1
    return zz
