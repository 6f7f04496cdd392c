"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec).

Completes the real-codec image family (BMP/PPM/PNG/GIF in
``operators/multimodal.py``) with the one format a real 100 TB multimodal
pipeline cannot avoid.  No reference analogue (the reference ships no image
codecs at all; its nearest surface is the opaque-payload custom source,
``src/helpers/stdlib.rs:160``) — this is north-star multimodal
infrastructure, same tier as the PNG/GIF decoders.

Decoder (``decode_jpeg_pixels``): baseline + extended-sequential DCT
(SOF0/SOF1) AND progressive DCT (SOF2, Huffman), 8-bit samples, 1- or
3-component frames, sampling factors 1-2 in each axis (4:4:4, 4:2:2,
4:4:0, 4:2:0), multiple DQT/DHT segments, 16-bit quantizers (Pq=1),
restart intervals (DRI/RSTn with DC-predictor/EOB-run reset),
nearest-neighbor chroma upsampling, vectorized numpy IDCT.  Progressive
support is the full T.81 Annex G Huffman procedure: spectral selection
(per-band scans, non-interleaved AC), successive approximation (DC
first/refine via point transform, AC first/refine with EOB-run coding
and correction bits, §G.1.2.3), coefficients accumulated across scans
and transformed once at EOI.  Arithmetic coding, hierarchical, and
12-bit modes raise ``ValueError`` — the dead-letter column routes them,
exactly like every other unsupported format.

Encoder (``encode_jpeg`` baseline, ``encode_jpeg_progressive``
progressive): 4:4:4 or 4:2:0, with a deliberate twist: instead of the
spec's example Huffman tables (Annex K is *informative*, not required),
both emit SELF-DEFINED canonical fixed-length tables in their DHT
segments — every DC size symbol at 4 bits, every valid AC (run, size)
symbol at 9 bits (the progressive table adds the EOBn run-length symbols
Annex G defines).  Any prefix code carried by DHT is legal JPEG;
fixed-length tables cost compression (irrelevant for test corpora) and
buy two things: zero risk of a mistranscribed 162-entry constant, and an
encoder whose entropy layer shares no table data with the decoder's —
the decoder must honestly parse DHT to read our own files.  The
progressive encoder emits a real successive-approximation script (DC
first Al=1 interleaved, DC refine, per-component AC first Al=1, AC
refine) or a spectral-selection-only script, with optional restart
markers; fixtures therefore exercise every Annex G decode path, and the
cross-codec invariant ``decode(progressive(px)) == decode(baseline(px))``
pins both entropy layers to the same quantized coefficients.

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

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg_pixels"]

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
# progressive AC alphabet: Annex G adds the EOBn run-length symbols
# (r << 4 | 0 for r = 1..14; r = 0 is the plain EOB already in the
# baseline set, r = 15 is ZRL) — still comfortably inside 512 9-bit codes
_AC_SYMBOLS_PROG = sorted(_AC_SYMBOLS + [(r << 4) for r in range(1, 15)])
_AC_BITS_PROG = [0] * 8 + [len(_AC_SYMBOLS_PROG)] + [0] * 7


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
_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_SYMBOLS_PROG)

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

    def restart(self, n: int) -> None:
        """Byte-align (1-bit padding) and emit an RSTn marker — appended
        raw, NEVER through ``put`` (marker bytes must not be stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


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


def _encoder_setup(width, height, rgb, subsampling, quant, who):
    """Shared front half of both encoders: validate, color-convert,
    subsample/pad, pick quant tables.  Returns ``(planes, qy, qc, hv_y)``
    — identical planes for identical inputs, which is what makes the
    progressive-vs-baseline decode-equality invariant exact."""
    import numpy as np

    if len(rgb) != width * height * 3:
        raise ValueError(f"{who}: rgb length != width*height*3")
    if subsampling not in ("444", "420"):
        raise ValueError(f"{who}: subsampling must be '444' or '420'")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    y, cb, cr = _rgb_to_ycbcr(px)

    if quant == "flat":
        qy = qc = [1] * 64
    elif quant == "std50":
        qy, qc = _STD_LUMA_Q, _STD_CHROMA_Q
    else:
        raise ValueError(f"{who}: quant must be 'flat' or 'std50'")

    if subsampling == "444":
        hv_y = (1, 1)
        planes = [_pad_to(y, 8), _pad_to(cb, 8), _pad_to(cr, 8)]
    else:
        hv_y = (2, 2)
        yp = _pad_to(y, 16)
        # chroma: mean of each 2x2, floor(x+0.5) — deterministic ints
        def down(p):
            p = _pad_to(p, 2).astype("float64")
            m = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            return _clamp8(m)

        planes = [yp, _pad_to(down(cb), 8), _pad_to(down(cr), 8)]
    return planes, qy, qc, hv_y


def _frame_header(width, height, qy, qc, hv_y, sof_marker: bytes) -> bytes:
    """SOI + JFIF APP0 + DQT pair + SOF segment (marker selects
    baseline ``\\xff\\xc0`` vs progressive ``\\xff\\xc2``)."""
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: table 0 (luma), table 1 (chroma), 8-bit precision, zigzag order
    for tid, q in ((0, qy), (1, qc)):
        zz = bytes(q[_ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    comp = bytes(
        [1, (hv_y[0] << 4) | hv_y[1], 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += sof_marker + struct.pack(">H", 8 + 9) + bytes([8]) + struct.pack(
        ">HH", height, width
    ) + bytes([3]) + comp
    return bytes(out)


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
    planes, qy, qc, hv_y = _encoder_setup(
        width, height, rgb, subsampling, quant, "encode_jpeg"
    )

    out = bytearray()
    out += _frame_header(width, height, qy, qc, hv_y, b"\xff\xc0")
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


# ------------------------------------------ progressive encoder (Annex G)


def _quantized_blocks(plane, qtable):
    """FDCT + quantize every 8x8 block of an edge-padded plane → int64
    array ``(bh, bw, 64)`` in ZIGZAG order.  Same arithmetic as the
    baseline ``_encode_blocks`` (orthonormal DCT, ``np.rint``), batched —
    both encoders therefore emit the same quantized coefficients and the
    cross-codec decode-equality invariant is exact."""
    import numpy as np

    M = _dct_matrix()
    h, w = plane.shape
    q = np.asarray(qtable, dtype="float64").reshape(8, 8)
    blocks = (
        plane.astype("float64").reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        - 128.0
    )
    quant = np.rint((M @ blocks @ M.T) / q).astype(np.int64)
    return quant.reshape(h // 8, w // 8, 64)[:, :, _ZIGZAG]


def _sos_header(comp_specs, ss, se, ah, al) -> bytes:
    body = bytes([len(comp_specs)])
    for cid, tt in comp_specs:
        body += bytes([cid, tt])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


class _EobState:
    """EOB-run + buffered-correction-bit bookkeeping for progressive AC
    scans (the BE/BR split of G.1.2.3): ``eob_bits`` belong to completed
    EOB-run blocks and flush WITH the EOBn symbol; ``cur_bits`` belong to
    the current block since its last emitted symbol and flush AFTER each
    symbol — the exact order the decoder consumes them in."""

    def __init__(self, writer, codes):
        self.w = writer
        self.codes = codes
        self.eobrun = 0
        self.eob_bits: list[int] = []
        self.cur_bits: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.codes[r << 4]
            self.w.put(code, ln)
            if r:
                self.w.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.eob_bits:
            self.w.put(bit, 1)
        self.eob_bits = []

    def flush_cur(self) -> None:
        for bit in self.cur_bits:
            self.w.put(bit, 1)
        self.cur_bits = []

    def end_block(self, pending: bool) -> None:
        """Trailing zeros and/or correction bits fold into an EOB."""
        if pending:
            self.eobrun += 1
            self.eob_bits += self.cur_bits
            self.cur_bits = []
            if self.eobrun == 0x7FFF:  # EOBn extension caps at 14 bits
                self.flush_eob()


def _prog_ac_first_block(st: "_EobState", tvals) -> None:
    """One block of an AC first scan: baseline run/size coding with EOBn
    instead of per-block EOB."""
    last = -1
    for i, t in enumerate(tvals):
        if t:
            last = i
    if last < 0:
        st.end_block(True)
        return
    st.flush_eob()
    run = 0
    for t in tvals[: last + 1]:
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = st.codes[0xF0]
            st.w.put(code, ln)
            run -= 16
        size, amp = _mag_bits(t)
        code, ln = st.codes[(run << 4) | size]
        st.w.put(code, ln)
        st.w.put(amp, size)
        run = 0
    st.end_block(last < len(tvals) - 1)  # trailing zeros fold into an EOB


def _prog_ac_refine_block(st: "_EobState", band, al: int) -> None:
    """One block of an AC refinement scan (G.1.2.3 encode): correction
    bits for history-nonzero coefficients, run-coded ±1 for newly
    significant ones, ZRLs emitted eagerly only while a newly-significant
    coefficient is still ahead."""
    tvals = [(abs(v) >> al) for v in band]
    eobpos = -1
    for i, t in enumerate(tvals):
        if t == 1:
            eobpos = i
    r = 0
    for i, t in enumerate(tvals):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eobpos:
            st.flush_eob()
            code, ln = st.codes[0xF0]
            st.w.put(code, ln)
            r -= 16
            st.flush_cur()
        if t > 1:  # history-significant: next magnitude bit only
            st.cur_bits.append(t & 1)
            continue
        # newly significant (history zero, shifted magnitude exactly 1)
        st.flush_eob()
        code, ln = st.codes[(r << 4) | 1]
        st.w.put(code, ln)
        st.w.put(1 if band[i] > 0 else 0, 1)
        st.flush_cur()
        r = 0
    st.end_block(r > 0 or bool(st.cur_bits))


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "444",
    quant: str = "flat",
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode raw RGB24 to a progressive (SOF2) JFIF JPEG.

    ``successive=True`` emits the full successive-approximation script —
    DC first (Al=1, interleaved), DC refine, per-component AC first
    (Al=1), per-component AC refine — exercising every Annex G decode
    path; ``False`` emits the minimal spectral-selection script (DC, then
    per-component AC 1-63 at full precision).  ``restart_interval`` > 0
    adds a DRI segment and RSTn markers every that many MCUs/blocks in
    every scan.  Decoded output is IDENTICAL to ``encode_jpeg`` of the
    same arguments — both quantize the same coefficients; only the
    entropy layout differs."""
    planes, qy, qc, hv_y = _encoder_setup(
        width, height, rgb, subsampling, quant, "encode_jpeg_progressive"
    )
    hv = [hv_y, (1, 1), (1, 1)]
    qts = [qy, qc, qc]
    coefs = [_quantized_blocks(p, q) for p, q in zip(planes, qts)]
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    # non-interleaved per-component grids (what AC scans cover; may be
    # smaller than the interleaved padding the coef arrays carry)
    grids = []
    for ci, (h, v) in enumerate(hv):
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        grids.append((-(-cw // 8), -(-ch // 8)))

    out = bytearray()
    out += _frame_header(width, height, qy, qc, hv_y, b"\xff\xc2")
    out += _dht_segment(0x00, _DC_BITS, _DC_SYMBOLS)
    out += _dht_segment(0x10, _AC_BITS_PROG, _AC_SYMBOLS_PROG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_passes = [(0, 1), (1, 0)] if successive else [(0, 0)]
    ac_passes = [(0, 1), (1, 0)] if successive else [(0, 0)]

    for ah, al in dc_passes:
        w = _BitWriter()
        _prog_dc_scan_encode(w, coefs, hv, ah, al, restart_interval)
        out += _sos_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, ah, al)
        out += w.flush()

    for ah, al in ac_passes:
        for ci in range(3):
            w = _BitWriter()
            st = _EobState(w, _AC_CODES_PROG)
            bw, bh = grids[ci]
            arr = coefs[ci]
            blk, rst = 0, 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        st.flush_eob()
                        w.restart(rst)
                        rst = (rst + 1) & 7
                    blk += 1
                    band = [int(x) for x in arr[by, bx, 1:64]]
                    if ah == 0:
                        tv = [
                            (v >> al) if v >= 0 else -((-v) >> al) for v in band
                        ]
                        _prog_ac_first_block(st, tv)
                    else:
                        _prog_ac_refine_block(st, band, al)
            st.flush_eob()
            out += _sos_header([(ci + 1, 0x00)], 1, 63, ah, al)
            out += w.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _prog_dc_scan_encode(w, coefs, hv, ah, al, ri):
    """Interleaved DC scan in MCU order (matches the decoder's walk)."""
    mcus_y = coefs[0].shape[0] // hv[0][1]
    mcus_x = coefs[0].shape[1] // hv[0][0]
    preds = [0, 0, 0]
    mcu, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu and mcu % ri == 0:
                w.restart(rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            mcu += 1
            for ci, arr in enumerate(coefs):
                h, v = hv[ci]
                for by in range(v):
                    for bx in range(h):
                        dc = int(arr[my * v + by, mx * h + bx, 0])
                        if ah == 0:
                            d = (dc >> al) - preds[ci]
                            preds[ci] = dc >> al
                            size, amp = _mag_bits(d)
                            code, ln = _DC_CODES[size]
                            w.put(code, ln)
                            if size:
                                w.put(amp, size)
                        else:
                            w.put((dc >> al) & 1, 1)


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
    """Parse a sequential (SOF0/SOF1) or progressive (SOF2) JPEG to an
    H×W×3 uint8 RGB ndarray.  Raises ``ValueError`` — and ONLY
    ``ValueError`` — on
    arithmetic/12-bit/lossless/unsupported-sampling/corrupt/truncated
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
    prog_state = None  # per-component coefficient planes, SOF2 only
    n = len(b)

    while pos < n:
        if b[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI — progressive transforms + emits here
            if prog_state is not None:
                return _finish_progressive(frame, prog_state, qtables)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
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
            frame = {"w": fw, "h": fh, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only Huffman sequential/progressive DCT (SOF0/SOF1/"
                f"SOF2) supported, got SOF marker 0x{marker:02x}"
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
                idx = [i for i, c in enumerate(frame["comps"]) if c["id"] == cs]
                if not idx:
                    raise ValueError(f"jpeg: scan references unknown component {cs}")
                scan.append((idx[0], tt >> 4, tt & 0x0F))
            if not frame["progressive"]:
                pos += seglen
                seq_scan = [
                    (frame["comps"][ci], td, ta) for ci, td, ta in scan
                ]
                return _decode_scan(
                    b, pos, frame, seq_scan, qtables, htables, restart_interval
                )
            # progressive: accumulate this scan's band/bits into the
            # coefficient planes, then continue the marker loop (next
            # scan / DHT / EOI)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if prog_state is None:
                prog_state = _init_progressive(frame)
            pos = _decode_progressive_scan(
                b, pos + seglen, frame, scan, prog_state, htables,
                restart_interval, ss, se, ah, al,
            )
            continue
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

    return _planes_to_pixels(frame, comps, planes)


def _planes_to_pixels(frame, comps, planes):
    """Round + clamp each component plane, nearest-neighbor upsample to
    full resolution, crop the MCU padding, color-convert."""
    import numpy as np

    fw, fh = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
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


# ------------------------------------------ progressive decode (Annex G)


def _next_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos``: skips stuffed
    ``FF00`` pairs, ``FF`` fill bytes, and stray RSTn markers — the
    byte-aligned gap between a progressive scan's last entropy bit and the
    following segment."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] != 0xFF:
            pos += 1
        else:
            nxt = b[pos + 1]
            if nxt == 0x00:
                pos += 2
            elif nxt == 0xFF:
                pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                pos += 2
            else:
                return pos
    raise ValueError("jpeg: truncated progressive stream (no next marker)")


def _comp_block_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid of one component: ``(bw, bh)`` =
    ceil(ceil(dim * sampling / max_sampling) / 8) per T.81 A.2.2."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _init_progressive(frame):
    """One int64 coefficient plane per frame component, ZIGZAG-indexed,
    padded to whole interleaved MCUs (the superset of every scan's
    geometry); scans accumulate into it, EOI transforms it."""
    import numpy as np

    if frame["w"] == 0 or frame["h"] == 0:
        raise ValueError("jpeg: zero dimension")
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in frame["comps"]):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")
    if len(frame["comps"]) not in (1, 3):
        raise ValueError("jpeg: only 1- or 3-component frames supported")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]


def _decode_progressive_scan(
    b, pos, frame, scan, state, htables, ri, ss, se, ah, al
):
    """Decode ONE progressive scan into the coefficient planes; returns
    the byte offset of the next marker.  DC scans (Ss=0) may be
    interleaved; AC scans are single-component per G.1.1.1.1."""
    reader = _BitReader(b, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan requires Se = 0")
        _prog_dc_scan(reader, frame, scan, state, htables, ri, ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("jpeg: progressive AC scans must be non-interleaved")
        if not ss <= se <= 63:
            raise ValueError("jpeg: bad spectral selection")
        _prog_ac_scan(reader, frame, scan[0], state, htables, ri, ss, se, ah, al)
    return _next_marker(b, reader.pos)


def _restart(reader) -> None:
    reader.align_to_marker()
    reader.skip_restart()


def _prog_dc_scan(reader, frame, scan, state, htables, ri, ah, al):
    comps = frame["comps"]
    preds = [0] * len(scan)

    def unit(si, ci, by, bx):
        arr = state[ci]
        if ah == 0:  # first pass: diff-coded point-transformed DC
            tab = htables.get((0, scan[si][1]))
            if tab is None:
                raise ValueError("jpeg: missing Huffman table")
            size = _huff_decode(reader, tab)
            if size > 11:
                raise ValueError("jpeg: bad DC size")
            preds[si] += _extend(reader.bits(size), size) if size else 0
            arr[by, bx, 0] = preds[si] << al
        else:  # refinement: one raw bit per block, no Huffman table
            arr[by, bx, 0] = int(arr[by, bx, 0]) | (reader.bits(1) << al)

    try:
        if len(scan) > 1:  # interleaved MCU order
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-frame["w"] // (8 * hmax))
            mcus_y = -(-frame["h"] // (8 * vmax))
            mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and mcu and mcu % ri == 0:
                        _restart(reader)
                        preds = [0] * len(scan)
                    mcu += 1
                    for si, (ci, _td, _ta) in enumerate(scan):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit(si, ci, my * c["v"] + by, mx * c["h"] + bx)
        else:  # single component: its own block raster
            ci = scan[0][0]
            bw, bh = _comp_block_grid(frame, comps[ci])
            blk = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri and blk and blk % ri == 0:
                        _restart(reader)
                        preds = [0]
                    blk += 1
                    unit(0, ci, by, bx)
    except _RestartMarker as e:
        raise ValueError("jpeg: unexpected restart marker") from e


def _prog_ac_scan(reader, frame, scan_comp, state, htables, ri, ss, se, ah, al):
    ci, _td, ta = scan_comp
    ac_tab = htables.get((1, ta))
    if ac_tab is None:
        raise ValueError("jpeg: missing Huffman table")
    arr = state[ci]
    bw, bh = _comp_block_grid(frame, frame["comps"][ci])
    eobrun = 0
    p1 = 1 << al
    blk = 0
    try:
        for by in range(bh):
            for bx in range(bw):
                if ri and blk and blk % ri == 0:
                    _restart(reader)
                    eobrun = 0
                blk += 1
                if ah == 0:  # first pass for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _huff_decode(reader, ac_tab)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zero coefficients
                                k += 16
                                continue
                            # EOBn: run covers this block + (run-1) more
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += r
                        if k > se or s > 10:
                            raise ValueError("jpeg: bad AC symbol")
                        arr[by, bx, k] = _extend(reader.bits(s), s) << al
                        k += 1
                else:  # refinement pass (G.1.2.3)
                    eobrun = _refine_ac_block(
                        reader, ac_tab, arr[by, bx], ss, se, p1, eobrun
                    )
    except _RestartMarker as e:
        raise ValueError("jpeg: unexpected restart marker") from e


def _refine_ac_block(reader, ac_tab, blkv, ss, se, p1, eobrun) -> int:
    """Refine one block's band in place (T.81 figure G.7 semantics):
    already-nonzero coefficients consume correction bits, newly-nonzero
    ones arrive as run-coded ±p1, EOB runs cover correction-only blocks.
    Returns the remaining EOB run."""

    def correct(k):
        # one correction bit per nonzero-history coefficient: if set,
        # add p1 toward the sign unless that magnitude bit already is
        cur = int(blkv[k])
        if reader.bits(1) and not (abs(cur) & p1):
            blkv[k] = cur + p1 if cur > 0 else cur - p1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if reader.bits(1) else -p1
            else:
                raise ValueError("jpeg: bad AC refinement symbol")
            while k <= se:
                if int(blkv[k]) != 0:
                    correct(k)
                elif r == 0:
                    break
                else:
                    r -= 1
                k += 1
            if val and k <= se:
                blkv[k] = val
            k += 1
    if eobrun:
        # EOB covers the remainder of this block: corrections only
        while k <= se:
            if int(blkv[k]) != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, state, qtables):
    """Dequantize + IDCT every accumulated coefficient block (vectorized
    over the whole plane), then the shared clamp/upsample/convert tail."""
    import numpy as np

    M = _dct_matrix()
    comps = frame["comps"]
    planes = []
    for c, zz in zip(comps, state):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("jpeg: missing quant table")
        bh, bw = zz.shape[0], zz.shape[1]
        nat = np.zeros((bh, bw, 64), dtype="float64")
        nat[:, :, _ZIGZAG] = zz.astype("float64")
        blk = M.T @ (nat.reshape(bh, bw, 8, 8) * q) @ M + 128.0
        planes.append(blk.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_pixels(frame, comps, planes)


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
