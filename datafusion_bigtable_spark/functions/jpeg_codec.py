"""Baseline + progressive JPEG codec — pure Python/numpy, no PIL.

Closes the media gate: baseline sequential JPEG (SOF0, Huffman, 8-bit)
ENCODES and DECODES natively here — 4:4:4, grayscale, and subsampled
MCU-interleaved layouts with any {1,2,4} sampling factors (4:2:0,
4:2:2, 4:1:1, 4:4:0, mixed) — and, since r8, PROGRESSIVE JPEG (SOF2,
spec G): spectral selection, successive approximation (DC and AC first
+ refinement scans, EOB runs with correction bits), both directions.
The progressive decoder reconstructs the SAME quantized coefficients a
baseline scan of the image carries, so `decode(progressive(img)) ==
decode(baseline(img))` BIT-EXACTLY — the cross-profile identity
tests/test_jpeg_codec.py pins.  Restart intervals (DRI + RSTn markers,
byte-aligned predictor/EOB-run resets) encode and decode in both
profiles.  What stays gated (decode returns None): arithmetic coding,
non-power-of-two sampling factors, and 12-bit precision.

Everything is spec constants + linear algebra:

- FDCT/IDCT: the orthonormal 8×8 DCT-II basis as one numpy matrix M;
  FDCT(B) = M·B·Mᵀ, IDCT(C) = Mᵀ·C·M — exact to float64 round-off.
- Quantization: ITU T.81 Annex K example tables (the de-facto "quality
  50" tables every codec ships).
- Entropy coding: canonical Huffman from the Annex K example tables —
  DC coded as category+diff bits, AC as (run, size) with ZRL/EOB,
  0xFF byte-stuffing in the entropy stream.

Verification strategy (tests/test_jpeg_codec.py): each lossy stage is
bounded analytically and each lossless stage round-trips EXACTLY —
bitstream I/O, Huffman symbol round-trip, zigzag, and the
coefficient→bitstream→coefficient path must be bit-identical; the full
encode→decode path must stay within the quantization-error bound
(≤ ceil(q/2)·basis-gain per coefficient).  Encoder and decoder share no
state beyond the public tables, so a shared-bug round-trip is ruled out
by the hand-computed DCT/quant vectors.
"""

from __future__ import annotations

import struct

import numpy as np

# Decode-side allocation guard: planes are float64, so a declared h×w×3
# costs ~24·h·w bytes before any entropy data is read.  64 MPix (~1.5 GB
# of planes) is far beyond any fixture yet bounds a poison SOF claiming
# 65535×65535 (≈100 GB) to a refusal instead of an executor OOM.
MAX_DECODE_PIXELS = 64 * 1024 * 1024

# --- spec constants (ITU T.81 Annex K) -------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K example Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: row k = c(k)·cos((2x+1)kπ/16)/2."""
    M = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(0.125) if k == 0 else 0.5
        M[k] = c * np.cos((2 * np.arange(8) + 1) * k * np.pi / 16)
    return M


_DCT_M = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


# --- canonical Huffman -----------------------------------------------------


def _build_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) via the canonical construction (spec C.2)."""
    bits, vals = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(spec) -> dict[tuple[int, int], int]:
    """(code, length) → symbol, the inverse mapping for the bit reader."""
    return {cl: sym for sym, cl in _build_codes(spec).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # entropy-stream stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def restart_marker(self, idx: int) -> None:
        """Byte-align (1-padding) and emit RSTn — markers sit OUTSIDE the
        entropy coding, so no stuffing byte follows them."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt != 0x00:
                    # a real marker: stop feeding, leave pos ON the marker
                    # so skip_restart() can consume an RSTn and resume
                    break
                self.pos += 2  # stuffed FF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def skip_restart(self) -> bool:
        """Byte-align (discard pad bits) and consume an RSTn marker at the
        current position — the reader half of restart-interval support."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:
            # missing bits decode as zeros (truncated stream)
            self.acc <<= length - self.n
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((code, length))
            if sym is not None:
                return sym
        return None


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _encode_magnitude(v: int) -> tuple[int, int]:
    """(bits, length) of v's 1's-complement magnitude code (spec F.1.2.1)."""
    s = _category(v)
    return (v if v >= 0 else v + (1 << s) - 1, s)


def _extend(bits: int, s: int) -> int:
    """Inverse of _encode_magnitude (spec F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _encode_block(w: _BitWriter, coefs: np.ndarray, prev_dc: int, dc_codes, ac_codes) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    bits, s = _encode_magnitude(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    w.write(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        bits, s = _encode_magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _decode_block(r: _BitReader, prev_dc: int, dc_table, ac_table) -> tuple[np.ndarray, int] | None:
    zz = np.zeros(64, dtype=np.int32)
    s = r.read_symbol(dc_table)
    if s is None:
        return None
    dc = prev_dc + _extend(r.read(s), s)
    zz[0] = dc
    i = 1
    while i < 64:
        sym = r.read_symbol(ac_table)
        if sym is None:
            return None
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0xF
        i += run
        if i >= 64 or size == 0:
            return None
        zz[i] = _extend(r.read(size), size)
        i += 1
    out = np.zeros(64, dtype=np.int32)
    out[ZIGZAG] = zz
    return out.reshape(8, 8), dc


# --- color ------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- container --------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc_th: int, spec) -> bytes:
    bits, vals = spec
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def _pad_plane(c: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a component plane to (ph, pw)."""
    h, w = c.shape
    p = np.zeros((ph, pw))
    p[:h, :w] = c
    if ph > h:
        p[h:, :w] = c[-1:, :]
    if pw > w:
        p[:, w:] = p[:, w - 1 : w]
    return p


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average a component plane by integer factors (edge-padded)."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    eh, ew = -(-h // fv) * fv, -(-w // fh) * fh
    p = _pad_plane(plane, eh, ew)
    return p.reshape(eh // fv, fv, ew // fh, fh).mean(axis=(1, 3))


def build_jpeg_rgb(
    pixels: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    samps: list[tuple[int, int]] | None = None,
) -> bytes:
    """Spec-valid baseline sequential JPEG with the Annex K tables.
    ``subsample=False`` → 4:4:4; ``subsample=True`` → 4:2:0 (2×2 luma
    sampling, box-averaged chroma) — the MCU-interleaved layout real-world
    encoders emit.  ``restart_interval`` > 0 emits a DRI segment and an
    RSTn every that-many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature real encoders turn on.  ``samps`` overrides
    the (luma, cb, cr) sampling factors with any {1,2,4} combination
    (e.g. ``[(4,1),(1,1),(1,1)]`` = 4:1:1, ``[(1,2),(1,1),(1,1)]`` =
    vertical 4:4:0) — chroma box-averages by the factor ratio.  All
    profiles are what ``decode_jpeg_pixels`` decodes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    gray = px.ndim == 2 or px.shape[2] == 1
    if gray:
        planes = [px.reshape(h, w).astype(np.float64) - 128.0]
        quants = [QUANT_LUMA]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px[:, :, :3])
        y, cb, cr = (ycc[..., i] - 128.0 for i in range(3))
        if samps is None:
            samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        for hi, vi in samps:
            if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                raise ValueError(f"sampling factors must be in {{1,2,4}}, got {samps}")
        smax_h = max(x[0] for x in samps)
        smax_v = max(x[1] for x in samps)
        planes = [
            _box_downsample(pl, smax_h // hi, smax_v // vi)
            for pl, (hi, vi) in zip([y, cb, cr], samps)
        ]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_plane(p, mcuy * 8 * vi, mcux * 8 * hi)
        for p, (hi, vi) in zip(planes, samps)
    ]

    n = len(planes)
    dc_specs = [DC_LUMA_SPEC] + [DC_CHROMA_SPEC] * (n - 1)
    ac_specs = [AC_LUMA_SPEC] + [AC_CHROMA_SPEC] * (n - 1)
    dc_codes = [_build_codes(s) for s in dc_specs]
    ac_codes = [_build_codes(s) for s in ac_specs]

    wtr = _BitWriter()
    prev_dc = [0] * n
    mcu_no = 0
    ridx = 0
    # MCU-interleaved block order (spec A.2.3): per MCU, each component
    # contributes Vi×Hi blocks in raster order
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                wtr.restart_marker(ridx)
                ridx = (ridx + 1) % 8
                prev_dc = [0] * n
            mcu_no += 1
            for ci, plane in enumerate(padded):
                hi, vi = samps[ci]
                for v in range(vi):
                    for u in range(hi):
                        by, bx = my * vi + v, mx * hi + u
                        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                        coefs = np.round(fdct2(block) / quants[ci]).astype(np.int32)
                        prev_dc[ci] = _encode_block(
                            wtr, coefs, prev_dc[ci], dc_codes[ci], ac_codes[ci]
                        )
    entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    if n > 1:
        out += _seg(0xDB, bytes([1]) + bytes(QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([n])
    for ci in range(n):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0x00, DC_LUMA_SPEC))
    out += _seg(0xC4, _dht_payload(0x10, AC_LUMA_SPEC))
    if n > 1:
        out += _seg(0xC4, _dht_payload(0x01, DC_CHROMA_SPEC))
        out += _seg(0xC4, _dht_payload(0x11, AC_CHROMA_SPEC))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n])
    for ci in range(n):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_pixels(b: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB from a baseline sequential (SOF0/1) or
    PROGRESSIVE (SOF2) JPEG — 4:4:4, grayscale, or subsampled with any
    {1,2,4} sampling factors (4:2:0/4:2:2/4:1:1/4:4:0/...), spectral-
    selection + successive-approximation scan scripts and restart
    intervals included.  Returns None outside that profile (12-bit,
    arithmetic, non-power-of-two sampling) — refused rather than
    shipped untested; see module doc.
    Malformed containers (e.g. the header-only bench fixtures) also
    return None, never raise."""
    try:
        return _decode_jpeg(b)
    except (ValueError, IndexError, struct.error, MemoryError):
        return None


def _decode_jpeg(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    progressive = False
    prog_state: dict | None = None
    prog_scans = 0
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            if progressive and prog_scans:
                return _prog_reconstruct(prog_state, h, w, comps, quant, hmax, vmax)
            return None  # no scan seen
        if 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        payload = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(payload):
                pq_tq = payload[j]
                if pq_tq >> 4 != 0:
                    return None  # 16-bit tables: out of profile
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(payload, np.uint8, 64, j + 1)
                quant[pq_tq & 0xF] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(payload):
                tc_th = payload[j]
                bits = list(payload[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(payload[j + 17 : j + 17 + nvals])
                table = _build_decoder((bits, vals))
                if tc_th >> 4 == 0:
                    dc_tables[tc_th & 0xF] = table
                else:
                    ac_tables[tc_th & 0xF] = table
                j += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / progressive SOF
            if payload[0] != 8:
                return None
            h, w = struct.unpack(">HH", payload[1:5])
            if h == 0 or w == 0 or h * w > MAX_DECODE_PIXELS:
                # A poison SOF can declare up to 65535×65535×3 ≈ 100+ GB of
                # planes before a single entropy byte exists; refuse rather
                # than let the allocation OOM the executor.
                return None
            n = payload[5]
            comps = []
            for c in range(n):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    return None  # non-power-of-two sampling: out of profile
                comps.append((cid, samp, tq))
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] >> 4 for c in comps)
                vmax = max(c[1] & 0xF for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                prog_state = {
                    "coef": [
                        np.zeros(
                            (mcuy * (c[1] & 0xF), mcux * (c[1] >> 4), 64),
                            dtype=np.int32,
                        )
                        for c in comps
                    ],
                    "dc": dc_tables,
                }
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # lossless/arithmetic/12-bit friends: out of profile
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if h is None or not comps:
                return None
            ns = payload[0]
            scan = []
            comp_idx = []
            for c in range(ns):
                cs, tables = payload[1 + 2 * c : 3 + 2 * c]
                ci = next((k for k, x in enumerate(comps) if x[0] == cs), None)
                if ci is None:
                    return None
                comp = comps[ci]
                hi, vi = comp[1] >> 4, comp[1] & 0xF
                scan.append((comp[2], tables >> 4, tables & 0xF, hi, vi))
                comp_idx.append(ci)
            if not progressive:
                data = b[i + 2 + seglen :]
                return _decode_scan(
                    data, h, w, scan, quant, dc_tables, ac_tables, restart_interval
                )
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            end = _entropy_end(b, i + 2 + seglen)
            r = _BitReader(b[i + 2 + seglen : end])
            if ss == 0:  # DC scan (Se must be 0)
                if se != 0:
                    return None
                pscan = [
                    (comp_idx[si], scan[si][1], scan[si][2], scan[si][3], scan[si][4])
                    for si in range(ns)
                ]
                if not _decode_prog_dc_scan(
                    r, pscan, prog_state, mcuy, mcux, h, w, hmax, vmax, ah, al,
                    restart_interval,
                ):
                    return None
            else:  # AC scan: single component, non-interleaved
                if ns != 1 or se > 63 or ss > se:
                    return None
                ci = comp_idx[0]
                _tq, _td, ta, hi, vi = scan[0]
                if ta not in ac_tables:
                    return None
                bh, bw = _comp_block_dims(h, w, hi, vi, hmax, vmax)
                blocks = (
                    prog_state["coef"][ci][by][bx]
                    for by in range(bh)
                    for bx in range(bw)
                )
                ok = (
                    _decode_prog_ac_first(
                        r, blocks, ac_tables[ta], ss, se, al, restart_interval
                    )
                    if ah == 0
                    else _decode_prog_ac_refine(
                        r, blocks, ac_tables[ta], ss, se, al, restart_interval
                    )
                )
                if not ok:
                    return None
            prog_scans += 1
            i = end
            continue
        i += 2 + seglen
    if progressive and prog_scans:
        return _prog_reconstruct(prog_state, h, w, comps, quant, hmax, vmax)
    return None


def _decode_scan(data, h, w, scan, quant, dc_tables, ac_tables, restart_interval=0):
    """General MCU-interleaved scan walk (spec A.2.3): per MCU each
    component contributes Vi×Hi blocks in raster order; subsampled
    components decode into smaller planes and upsample by pixel
    replication afterwards.  A nonzero ``restart_interval`` expects an
    RSTn every that-many MCUs (byte-aligned, DC predictors reset)."""
    r = _BitReader(data)
    n = len(scan)
    hmax = max(s[3] for s in scan)
    vmax = max(s[4] for s in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for (_, _, _, hi, vi) in scan
    ]
    prev_dc = [0] * n
    mcu_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                if not r.skip_restart():
                    return None
                prev_dc = [0] * n
            mcu_no += 1
            for ci, (tq, td, ta, hi, vi) in enumerate(scan):
                if tq not in quant or td not in dc_tables or ta not in ac_tables:
                    return None
                for v in range(vi):
                    for u in range(hi):
                        got = _decode_block(r, prev_dc[ci], dc_tables[td], ac_tables[ta])
                        if got is None:
                            return None
                        coefs, prev_dc[ci] = got
                        block = idct2(coefs * quant[tq]) + 128.0
                        by, bx = my * vi + v, mx * hi + u
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    # upsample subsampled components to full resolution (replication)
    for ci, (_, _, _, hi, vi) in enumerate(scan):
        if hi != hmax or vi != vmax:
            planes[ci] = np.repeat(
                np.repeat(planes[ci], vmax // vi, axis=0), hmax // hi, axis=1
            )
    if n == 1:
        y = np.clip(planes[0][:h, :w].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if n != 3:
        return None
    ycc = np.stack([p[:h, :w] for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)


# --- progressive (SOF2, spec G) ---------------------------------------------
#
# A progressive frame carries the SAME quantized coefficients as a
# baseline frame, split across scans by spectral band (Ss..Se) and bit
# precision (Ah/Al).  DC scans may interleave all components in MCU
# order; AC scans are single-component in the component's own block
# raster.  First scans (Ah=0) Huffman-code values at precision Al;
# refinement scans (Ah=Al+1) append one magnitude bit per already-coded
# coefficient and introduce new ±1<<Al coefficients, with EOB runs
# carrying the buffered correction bits.
#
# The Annex K AC tables lack the EOBn (r>0) symbols progressive streams
# use, so the encoder ships its own flat table: every symbol an AC
# progressive scan can emit at code length 8 (176 < 255 codes, all-ones
# reserved per C.2) — also exercising the decoder against non-Annex-K
# DHTs.

PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]            # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)


def _entropy_end(b: bytes, i: int) -> int:
    """Index of the first real marker (non-stuffed, non-RST 0xFF) at or
    after ``i`` — where a scan's entropy data ends."""
    while i + 1 < len(b):
        if b[i] == 0xFF and b[i + 1] != 0x00:
            if 0xD0 <= b[i + 1] <= 0xD7:
                i += 2  # restart marker inside entropy: skip it (DRI streams decode since r8)
                continue
            return i
        i += 1
    return len(b)


def _comp_block_dims(h, w, hi, vi, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved block grid of a component (spec A.1.1 ceil dims)."""
    ch = -(-(h * vi) // vmax)
    cw = -(-(w * hi) // hmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_dc_scan(
    r, scan, state, mcuy, mcux, h, w, hmax, vmax, ah, al, restart_interval=0
):
    preds = [0] * len(scan)
    mcu_no = 0

    def boundary():
        nonlocal preds
        if restart_interval and mcu_no and mcu_no % restart_interval == 0:
            if not r.skip_restart():
                return False
            preds = [0] * len(scan)
        return True

    if len(scan) > 1:  # interleaved, MCU order over the padded grid
        for my in range(mcuy):
            for mx in range(mcux):
                if not boundary():
                    return False
                mcu_no += 1
                for si, (ci, td, _ta, hi, vi) in enumerate(scan):
                    for v in range(vi):
                        for u in range(hi):
                            zz = state["coef"][ci][my * vi + v][mx * hi + u]
                            if not _dc_one(r, zz, state, td, preds, si, ah, al):
                                return False
        return True
    ci, td, _ta, hi, vi = scan[0]
    bh, bw = _comp_block_dims(h, w, hi, vi, hmax, vmax)
    for by in range(bh):
        for bx in range(bw):
            if not boundary():
                return False
            mcu_no += 1
            if not _dc_one(r, state["coef"][ci][by][bx], state, td, preds, 0, ah, al):
                return False
    return True


def _dc_one(r, zz, state, td, preds, si, ah, al) -> bool:
    if ah == 0:
        s = r.read_symbol(state["dc"].get(td, {}))
        if s is None:
            return False
        preds[si] += _extend(r.read(s), s)
        zz[0] = preds[si] << al
    else:
        zz[0] |= r.read(1) << al
    return True


def _decode_prog_ac_first(r, blocks, ac_table, ss, se, al, restart_interval=0) -> bool:
    eobrun = 0
    for bi, zz in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            if not r.skip_restart():
                return False
            eobrun = 0
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = r.read_symbol(ac_table)
            if sym is None:
                return False
            run, s = sym >> 4, sym & 0xF
            if s == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << run) - 1 + (r.read(run) if run else 0)
                break
            k += run
            if k > se:
                return False
            zz[k] = _extend(r.read(s), s) << al
            k += 1
    return True


def _decode_prog_ac_refine(r, blocks, ac_table, ss, se, al, restart_interval=0) -> bool:
    bit = 1 << al
    eobrun = 0
    for bi, zz in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            if not r.skip_restart():
                return False
            eobrun = 0
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = r.read_symbol(ac_table)
                if sym is None:
                    return False
                run, s = sym >> 4, sym & 0xF
                if s == 0:
                    if run < 15:
                        eobrun = (1 << run) + (r.read(run) if run else 0)
                        break
                    newval = 0  # ZRL: skip 16 still-zero coefficients
                else:
                    if s != 1:
                        return False
                    newval = bit if r.read(1) else -bit
                while k <= se:
                    if zz[k] != 0:
                        if r.read(1) and not (zz[k] & bit):
                            zz[k] += bit if zz[k] > 0 else -bit
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    if r.read(1) and not (zz[k] & bit):
                        zz[k] += bit if zz[k] > 0 else -bit
                k += 1
            eobrun -= 1
    return True


def _prog_reconstruct(state, h, w, comps, quant, hmax, vmax):
    planes = []
    M = _dct_matrix()
    for ci, (_cid, samp, tq) in enumerate(comps):
        hi, vi = samp >> 4, samp & 0xF
        if tq not in quant:
            return None
        zz = state["coef"][ci]  # (bh, bw, 64) int32, zigzag order
        bh, bw = zz.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[..., ZIGZAG] = zz
        coefs = nat.reshape(bh, bw, 8, 8) * quant[tq][None, None]
        blocks = np.einsum("ij,myjk,kl->myil", M.T, coefs, M) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        return None
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


# --- progressive encoder -----------------------------------------------------


def _quantized_coef_grids(pixels: np.ndarray, subsample: bool):
    """(h, w, samps, tqs, grids): per component an (bh, bw, 64) int32
    ZIGZAG-order quantized coefficient grid over the MCU-padded plane —
    the shared substance both JPEG profiles entropy-code."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    gray = px.ndim == 2 or px.shape[2] == 1
    if gray:
        planes = [px.reshape(h, w).astype(np.float64) - 128.0]
        quants = [QUANT_LUMA]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px[:, :, :3])
        y, cb, cr = (ycc[..., i] - 128.0 for i in range(3))
        if subsample:
            eh, ew = (h + 1) & ~1, (w + 1) & ~1
            cbp, crp = _pad_plane(cb, eh, ew), _pad_plane(cr, eh, ew)
            cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    M = _dct_matrix()
    for p, (hi, vi), q in zip(planes, samps, quants):
        bh, bw = mcuy * vi, mcux * hi
        padded = _pad_plane(p, bh * 8, bw * 8)
        blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,myjk,kl->myil", M, blocks, M.T)
        qz = np.round(coefs / q[None, None]).astype(np.int32).reshape(bh, bw, 64)
        grids.append(qz[..., ZIGZAG])
    tqs = [0] + [1] * (len(planes) - 1) if not gray else [0]
    return h, w, samps, tqs, grids


class _AcProgWriter:
    """EOB-run + correction-bit bookkeeping for one AC scan (spec G.1.2)."""

    def __init__(self, w: _BitWriter, codes):
        self.w = w
        self.codes = codes
        self.eobrun = 0
        self.eob_bits: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun == 0:
            return
        rbits = self.eobrun.bit_length() - 1
        code, ln = self.codes[rbits << 4]
        self.w.write(code, ln)
        if rbits:
            self.w.write(self.eobrun - (1 << rbits), rbits)
        for b in self.eob_bits:
            self.w.write(b, 1)
        self.eobrun = 0
        self.eob_bits = []

    def add_eob(self, correction_bits: list[int]) -> None:
        self.eobrun += 1
        self.eob_bits.extend(correction_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _encode_ac_first_block(aw: _AcProgWriter, zz, ss, se, al) -> None:
    t = [
        (1 if v > 0 else -1) * (abs(int(v)) >> al) if v else 0
        for v in zz[ss : se + 1]
    ]
    if not any(t):
        aw.add_eob([])
        return
    aw.flush_eob()
    run = 0
    last_nz = max(i for i, v in enumerate(t) if v)
    for i, v in enumerate(t):
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = aw.codes[0xF0]
            aw.w.write(code, ln)
            run -= 16
        bits, s = _encode_magnitude(v)
        code, ln = aw.codes[(run << 4) | s]
        aw.w.write(code, ln)
        aw.w.write(bits, s)
        run = 0
    if last_nz < len(t) - 1:
        aw.add_eob([])


def _encode_ac_refine_block(aw: _AcProgWriter, zz, ss, se, al) -> None:
    """Emission mirrors the decoder's walk EXACTLY: a coefficient that
    was significant in an earlier scan contributes one correction bit at
    the moment the decoder's run walk PASSES it, so each ZRL/(r,1)
    symbol carries precisely the correction bits inside its own span —
    not a block-global buffer (the desync a naive encoder produces when
    >16 zeros and history coefficients interleave)."""
    # events over Ss..Se: ("h", bit) for history-significant coefficients,
    # ("z", signbit_or_None) for still-zero and newly-significant ones
    # (newly-significant positions count as zeros in the decoder's run
    # walk — they are zero in the block until the symbol places them)
    events: list[tuple[str, int | None]] = []
    news: list[int] = []  # event indices of newly-significant coefficients
    for v in zz[ss : se + 1]:
        mag = abs(int(v))
        if (mag >> (al + 1)) != 0:
            events.append(("h", (mag >> al) & 1))
        elif (mag >> al) == 0:
            events.append(("z", None))
        else:  # newly significant: |v| >> al == 1
            news.append(len(events))
            events.append(("z", 1 if v > 0 else 0))
    cursor = 0

    def walk(run: int) -> list[int]:
        # the decoder's inner loop: collect history bits, consume `run`
        # zero-ish positions, stop AT the next zero-ish one
        nonlocal cursor
        bits = []
        while cursor < len(events):
            kind, payload = events[cursor]
            if kind == "h":
                bits.append(payload)
            else:
                if run == 0:
                    break
                run -= 1
            cursor += 1
        return bits

    for target in news:
        r = sum(
            1 for j in range(cursor, target) if events[j][0] == "z"
        )
        while r > 15:
            aw.flush_eob()
            code, ln = aw.codes[0xF0]
            aw.w.write(code, ln)
            for b in walk(15):
                aw.w.write(b, 1)
            cursor += 1  # decoder skips the 16th zero via k += 1
            r -= 16
        aw.flush_eob()
        bits = walk(r)  # cursor lands on `target`
        code, ln = aw.codes[(r << 4) | 1]
        aw.w.write(code, ln)
        aw.w.write(events[target][1], 1)
        for b in bits:
            aw.w.write(b, 1)
        cursor += 1
    if cursor < len(events):
        # decoder needs an EOB(run) covering this block's tail; its walk
        # consumes the remaining history correction bits
        aw.add_eob([p for k, p in events[cursor:] if k == "h"])


def build_jpeg_rgb_progressive(
    pixels: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Spec-valid PROGRESSIVE JPEG (SOF2) of the same quantized
    coefficients ``build_jpeg_rgb`` codes, split across a 2-precision
    scan script (DC first Al=1 → per-component AC first Al=1 → DC
    refinement → per-component AC refinement), so a correct decoder
    reproduces the baseline decode bit-for-bit."""
    h, w, samps, tqs, grids = _quantized_coef_grids(pixels, subsample)
    n = len(grids)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcuy, mcux = grids[0].shape[0] // samps[0][1], grids[0].shape[1] // samps[0][0]

    dc_specs = [DC_LUMA_SPEC] + [DC_CHROMA_SPEC] * (n - 1)
    dc_codes = [_build_codes(s) for s in dc_specs]
    ac_codes = _build_codes(PROG_AC_SPEC)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(QUANT_LUMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    if n > 1:
        out += _seg(0xDB, bytes([1]) + bytes(QUANT_CHROMA.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([n])
    for ci in range(n):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, tqs[ci]])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_payload(0x00, DC_LUMA_SPEC))
    if n > 1:
        out += _seg(0xC4, _dht_payload(0x01, DC_CHROMA_SPEC))
    out += _seg(0xC4, _dht_payload(0x10, PROG_AC_SPEC))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def sos(comps_tables, ss, se, ah, al):
        p = bytes([len(comps_tables)])
        for cid, tdta in comps_tables:
            p += bytes([cid, tdta])
        return _seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, all components interleaved, Al=1
    wtr = _BitWriter()
    preds = [0] * n
    mcu_no = 0
    ridx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                wtr.restart_marker(ridx)
                ridx = (ridx + 1) % 8
                preds = [0] * n
            mcu_no += 1
            for ci in range(n):
                hi, vi = samps[ci]
                for v in range(vi):
                    for u in range(hi):
                        val = int(grids[ci][my * vi + v, mx * hi + u, 0]) >> 1
                        bits, s = _encode_magnitude(val - preds[ci])
                        code, ln = dc_codes[ci][s]
                        wtr.write(code, ln)
                        wtr.write(bits, s)
                        preds[ci] = val
    out += sos([(ci + 1, (0 if ci == 0 else 1) << 4) for ci in range(n)], 0, 0, 0, 1)
    out += wtr.flush()

    # scans 2..n+1: AC first per component, Al=1
    for ci in range(n):
        hi, vi = samps[ci]
        bh, bw = _comp_block_dims(h, w, hi, vi, hmax, vmax)
        wtr = _BitWriter()
        aw = _AcProgWriter(wtr, ac_codes)
        bi = 0
        ridx = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and bi and bi % restart_interval == 0:
                    aw.flush_eob()
                    wtr.restart_marker(ridx)
                    ridx = (ridx + 1) % 8
                bi += 1
                _encode_ac_first_block(aw, grids[ci][by, bx], 1, 63, 1)
        aw.flush_eob()
        out += sos([(ci + 1, 0x10)], 1, 63, 0, 1)
        out += wtr.flush()

    # scan n+2: DC refinement (one bit per block, MCU-interleaved)
    wtr = _BitWriter()
    mcu_no = 0
    ridx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                wtr.restart_marker(ridx)
                ridx = (ridx + 1) % 8
            mcu_no += 1
            for ci in range(n):
                hi, vi = samps[ci]
                for v in range(vi):
                    for u in range(hi):
                        wtr.write(int(grids[ci][my * vi + v, mx * hi + u, 0]) & 1, 1)
    out += sos([(ci + 1, 0x00) for ci in range(n)], 0, 0, 1, 0)
    out += wtr.flush()

    # scans n+3..2n+2: AC refinement per component
    for ci in range(n):
        hi, vi = samps[ci]
        bh, bw = _comp_block_dims(h, w, hi, vi, hmax, vmax)
        wtr = _BitWriter()
        aw = _AcProgWriter(wtr, ac_codes)
        bi = 0
        ridx = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and bi and bi % restart_interval == 0:
                    aw.flush_eob()
                    wtr.restart_marker(ridx)
                    ridx = (ridx + 1) % 8
                bi += 1
                _encode_ac_refine_block(aw, grids[ci][by, bx], 1, 63, 0)
        aw.flush_eob()
        out += sos([(ci + 1, 0x10)], 1, 63, 1, 0)
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)
