"""Pure-Python media container codecs — dependency-free.

Two tiers, mirroring what a 100 TB curation pipeline actually does:

**Header tier** (all containers): container METADATA — the part the
pipeline filters on before ever decoding pixels — lives in fixed,
documented header layouts that plain Python parses fine:

- PNG:  8-byte signature + IHDR chunk (width/height big-endian at 16/20).
- JPEG: marker segments; SOF0/1/2 carries height/width big-endian.
- WAV:  RIFF/WAVE + ``fmt `` chunk (channels/sample-rate little-endian).
- BMP:  BITMAPFILEHEADER + BITMAPINFOHEADER (width/height LE at 18/22).
- PPM:  ``P6`` ASCII header (width height maxval).
- GIF:  GIF87a/89a logical screen descriptor (width/height LE at 6/8).

**Pixel tier** (uncompressed containers only): BMP, PPM and WAV PCM store
their samples raw, so numpy decodes REAL pixels/samples with no PIL or
ffmpeg — ``decode_pixels`` returns an (h, w, 3) uint8 array,
``decode_wav_samples`` an (n, channels) int16 array, and
``resample_nearest`` is a real nearest-neighbor image resampler.
Baseline JPEG (incl. 4:2:0/4:2:2) decodes natively too (functions/jpeg_codec.py),
as do single-frame GIFs (real LZW, ``decode_gif_pixels``);
Progressive JPEG, restart intervals, and all {1,2,4} sampling factors
decode natively too since r8; only out-of-profile JPEG (arithmetic
coding, non-power-of-two sampling, 12-bit) stays behind the honest
``NotImplementedError`` gate in functions/multimodal.py.

``build_*`` constructs real, spec-valid containers so synthetic corpora
exercise the genuine parse/decode path; ``parse_media`` sniffs by magic.
"""

from __future__ import annotations

import struct

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Allocation guard shared by the pixel decoders: declared dimensions are
# attacker-controlled (PNG IHDR is 32-bit, GIF 16-bit) and arrive before
# any pixel data, so cap the pixel count a decoder will materialize.
# Matches jpeg_codec.MAX_DECODE_PIXELS.
MAX_DECODE_PIXELS = 64 * 1024 * 1024


# --- builders (deterministic; body bytes are caller-supplied) -------------


def build_png(width: int, height: int, body: bytes = b"") -> bytes:
    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])  # 8-bit RGB
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    return PNG_SIG + chunk + body


def build_jpeg(width: int, height: int, body: bytes = b"") -> bytes:
    # SOI + minimal APP0/JFIF + SOF0 with the dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_payload = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof0 + body


def build_wav(sample_rate: int, channels: int, body: bytes = b"") -> bytes:
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def build_bmp(width: int, height: int, pixels: np.ndarray | bytes) -> bytes:
    """Real uncompressed 24-bit BMP.  ``pixels`` is (h, w, 3) RGB top-down;
    the file stores BGR bottom-up with rows padded to 4 bytes — exactly the
    layout decode_bmp_pixels undoes."""
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    row_len = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_len), dtype=np.uint8)
    rows[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)  # flip rows, RGB→BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return header + info + data


def build_ppm(width: int, height: int, pixels: np.ndarray | bytes) -> bytes:
    """Binary PPM (P6): ASCII header then raw RGB, exactly w·h·3 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, 3)
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


def build_pcm_sine(sample_rate: int, channels: int, n: int, freq: float = 440.0) -> bytes:
    """Deterministic 16-bit PCM body: per-channel sine at freq·(c+1)."""
    t = np.arange(n, dtype=np.float64) / sample_rate
    chans = [np.sin(2 * np.pi * freq * (c + 1) * t) for c in range(channels)]
    interleaved = np.stack(chans, axis=1) * 32000
    return interleaved.astype("<i2").tobytes()


# --- parsers ---------------------------------------------------------------


def parse_png(b: bytes) -> dict | None:
    if len(b) < 24 or not b.startswith(PNG_SIG) or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return {"mime": "image/png", "width": w, "height": h}


def parse_jpeg(b: bytes) -> dict | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if 0xD0 <= marker <= 0xD9:  # standalone markers
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        # SOFn (C0-CF except C4 DHT, C8 JPG, CC DAC) carries dimensions
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return {"mime": "image/jpeg", "width": w, "height": h}
        i += 2 + seg_len
    return None


def parse_wav(b: bytes) -> dict | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 8 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            return {"mime": "audio/wav", "channels": channels, "sample_rate": rate}
        i += 8 + clen + (clen % 2)
    return None


def parse_bmp(b: bytes) -> dict | None:
    if len(b) < 54 or b[:2] != b"BM":
        return None
    width, height = struct.unpack("<ii", b[18:26])
    return {"mime": "image/bmp", "width": width, "height": abs(height)}


def _ppm_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, maxval, data_offset) of a P6 header, or None."""
    if not b.startswith(b"P6"):
        return None
    fields, i = [], 2
    while len(fields) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(b) and b[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        fields.append(int(b[i:j]))
        i = j
    if len(fields) < 3 or i >= len(b):
        return None
    return fields[0], fields[1], fields[2], i + 1  # single whitespace after maxval


def parse_ppm(b: bytes) -> dict | None:
    hdr = _ppm_header(b)
    if hdr is None:
        return None
    w, h, _, _ = hdr
    return {"mime": "image/x-portable-pixmap", "width": w, "height": h}


def parse_media(b: bytes) -> dict:
    """Sniff-by-magic header parse; unknown containers come back as
    octet-stream with no typed metadata."""
    for parser in (parse_png, parse_jpeg, parse_wav, parse_bmp, parse_ppm, parse_gif):
        meta = parser(b)
        if meta is not None:
            return meta
    return {"mime": "application/octet-stream"}


# --- pixel/sample decoders (uncompressed containers; pure numpy) -----------


def decode_bmp_pixels(b: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB top-down from an uncompressed 24-bit BMP."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", b[10:14])[0]
    width, height = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None  # only the uncompressed 24-bit profile decodes here
    top_down = height < 0
    h = abs(height)
    row_len = (width * 3 + 3) & ~3
    need = data_off + row_len * h
    if len(b) < need:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=row_len * h, offset=data_off)
    rows = rows.reshape(h, row_len)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm_pixels(b: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB from a binary P6 PPM (maxval ≤ 255)."""
    hdr = _ppm_header(b)
    if hdr is None:
        return None
    w, h, maxval, off = hdr
    if maxval > 255 or len(b) < off + w * h * 3:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3).copy()


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png_filter_line(cur: np.ndarray, prev: np.ndarray, ft: int, ch: int) -> np.ndarray:
    """Forward PNG filter of one scanline (encoder side), spec §6."""
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.zeros_like(c)
    left[ch:] = c[:-ch]
    ul = np.zeros_like(p)
    ul[ch:] = p[:-ch]
    if ft == 0:
        out = c
    elif ft == 1:
        out = c - left
    elif ft == 2:
        out = c - p
    elif ft == 3:
        out = c - (left + p) // 2
    elif ft == 4:
        pa, pb, pc = np.abs(p - ul), np.abs(left - ul), np.abs(left + p - 2 * ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul))
        out = c - pred
    else:
        raise ValueError(f"bad PNG filter {ft}")
    return (out % 256).astype(np.uint8)


def build_png_rgb(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """A REAL, spec-valid 8-bit RGB PNG: IHDR + zlib IDAT + IEND with
    correct CRCs (unlike ``build_png``, which is the header-only metadata
    fixture).  ``filters`` picks the per-row filter type (default all 0) —
    tests use it to exercise every unfilter path of the decoder."""
    import zlib

    h, w = pixels.shape[:2]
    px = np.ascontiguousarray(pixels[:, :, :3], dtype=np.uint8).reshape(h, w * 3)
    filters = filters if filters is not None else [0] * h
    prev = np.zeros(w * 3, dtype=np.uint8)
    lines = []
    for y in range(h):
        ft = filters[y % len(filters)]
        lines.append(bytes([ft]) + _png_filter_line(px[y], prev, ft, 3).tobytes())
        prev = px[y]
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])  # 8-bit RGB, no interlace
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(b: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB from an 8-bit PNG — REAL decode, stdlib only:
    chunk walk → zlib inflate (the stdlib has PNG's exact codec) → per-row
    unfilter (all five spec filters, numpy; Sub is a cumsum, Average/Paeth
    run the spec recurrence per pixel).  Supported profile: bit depth 8,
    color type 0 (gray, replicated to RGB), 2 (RGB) or 6 (RGBA, alpha
    dropped), no interlace — the overwhelmingly common case.  Anything
    else returns None (JPEG's DCT+Huffman remains the genuinely
    PIL-gated residue).  Malformed/truncated containers return None,
    never raise — a poison payload must not kill the Arrow batch (a
    declared chunk length past the buffer end would otherwise surface as
    struct.error on the IHDR unpack)."""
    try:
        return _decode_png(b)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_png(b: bytes) -> np.ndarray | None:
    import zlib

    if len(b) < 33 or not b.startswith(PNG_SIG):
        return None
    w = h = None
    channels = 0
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        payload = b[i + 8 : i + 8 + clen]
        if tag == b"IHDR":
            if clen < 13:
                return None
            w, h = struct.unpack(">II", payload[:8])
            depth, ctype, comp, filt, interlace = payload[8:13]
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
            channels = {0: 1, 2: 3, 6: 4}.get(ctype, 0)
            if channels == 0:
                return None
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + clen
    if not w or not h or not idat:
        return None
    if w * h > MAX_DECODE_PIXELS:
        return None
    stride = w * channels
    need = h * (stride + 1)
    # Bounded inflate: dims are known from IHDR, so never expand a
    # zip-bomb IDAT past the raster size it claims to fill (+1 byte to
    # detect overlong streams without materializing them).
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), need + 1)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: running sum per channel lane
            cur = np.cumsum(line.reshape(w, channels), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: spec recurrence, per pixel
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                up = prev[x]
                ul = prev[x - channels] if x >= channels else 0
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[x] = (line[x] + pred) % 256
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def decode_pixels(b: bytes) -> np.ndarray | None:
    """Dispatch: real pixels for every natively-decodable profile — BMP,
    PPM, 8-bit PNG (stdlib zlib) and baseline + progressive JPEG
    incl. 4:2:0/4:2:2 subsampling (functions/jpeg_codec.py: full Huffman
    + IDCT pipeline, r6; SOF2 successive approximation r8).  None for
    out-of-profile JPEGs (arithmetic / non-pow2 sampling / 12-bit —
    jpeg_codec module doc) and non-images."""
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if b[:2] == b"P6":
        return decode_ppm_pixels(b)
    if b.startswith(PNG_SIG):
        return decode_png_pixels(b)
    if b[:2] == b"\xff\xd8":
        from datafusion_bigtable_spark.functions.jpeg_codec import decode_jpeg_pixels

        return decode_jpeg_pixels(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(b)
    return None


def decode_wav_samples(b: bytes) -> tuple[np.ndarray, int] | None:
    """((n, channels) int16 array, sample_rate) from a 16-bit PCM WAV."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            fmt_code, channels, rate = struct.unpack("<HHI", b[i + 8 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
            if fmt_code != 1:
                return None  # PCM only
        elif cid == b"data":
            data = b[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen % 2)
    if data is None or channels in (None, 0) or bits != 16:
        return None
    n = len(data) // (2 * channels)
    if n == 0:
        return np.zeros((0, channels), dtype=np.int16), rate
    arr = np.frombuffer(data, dtype="<i2", count=n * channels).reshape(n, channels)
    return arr.copy(), rate


def resample_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real nearest-neighbor resample: output pixel (y, x) takes the source
    pixel at the center of its back-projected footprint (the standard
    half-pixel-center mapping, matching PIL's NEAREST)."""
    sh, sw = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1)
    return arr[ys][:, xs]


def audio_spectral_features(samples: np.ndarray, rate: int) -> dict:
    """Real spectral features of a PCM clip (numpy rFFT — the DSP tier a
    training pipeline filters audio on before an encoder): RMS level,
    spectral centroid/rolloff(85%)/bandwidth in Hz, and zero-crossing
    rate.  Multi-channel input is mixed down first.  Deterministic: for a
    pure sine at f the centroid lands on f's bin (pinned in tests against
    the analytic value)."""
    if samples.ndim == 2:
        x = samples.astype(np.float64).mean(axis=1)
    else:
        x = samples.astype(np.float64)
    n = x.size
    if n == 0:
        return {
            "rms": 0.0, "zcr": 0.0,
            "spectral_centroid_hz": 0.0,
            "spectral_rolloff_hz": 0.0,
            "spectral_bandwidth_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = mag * mag
    total = power.sum()
    if total <= 0:
        return {
            "rms": rms, "zcr": zcr,
            "spectral_centroid_hz": 0.0,
            "spectral_rolloff_hz": 0.0,
            "spectral_bandwidth_hz": 0.0,
        }
    centroid = float((freqs * power).sum() / total)
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    return {
        "rms": rms, "zcr": zcr,
        "spectral_centroid_hz": centroid,
        "spectral_rolloff_hz": rolloff,
        "spectral_bandwidth_hz": bandwidth,
    }


# --- GIF (LZW) -------------------------------------------------------------


def build_gif_rgb(pixels: np.ndarray) -> bytes:
    """Spec-valid GIF89a, single frame, global palette (≤256 distinct
    colors required — GIF is palette-indexed), real LZW compression with
    variable-width codes, clear/EOI, and 255-byte sub-blocks."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs ≤256 colors, got {len(colors)}")
    # palette size = next power of two ≥ max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])  # GCT flag+sizes
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # image descriptor

    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code + 1
    table = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    codes.append((clear, width))
    seq: tuple = ()
    for idx in inv.tolist():
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        codes.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096:
            codes.append((clear, width))
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (idx,)
    if seq:
        codes.append((table[seq], width))
    codes.append((eoi, width))

    # LSB-first bit packing
    acc = n = 0
    data = bytearray()
    for code, cw in codes:
        acc |= code << n
        n += cw
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)

    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def parse_gif(b: bytes) -> dict | None:
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return {"mime": "image/gif", "width": w, "height": h}


def decode_gif_pixels(b: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB from a single-frame, non-interlaced GIF with a
    global color table — real LZW decode (variable-width codes, clear/EOI,
    table growth to 4096).  Interlaced or local-palette frames return
    None; malformed input returns None, never raises."""
    try:
        return _decode_gif(b)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_gif(b: bytes) -> np.ndarray | None:
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    if not flags & 0x80:
        return None  # no global color table
    gct_n = 2 << (flags & 0x07)
    i = 13
    pal = np.frombuffer(b, np.uint8, gct_n * 3, i).reshape(gct_n, 3)
    i += gct_n * 3
    # skip extension blocks to the first image descriptor
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:
            break
        else:
            return None
    ix, iy, iw, ih = struct.unpack("<HHHH", b[i + 1 : i + 9])
    iflags = b[i + 9]
    if iflags & 0xC0:  # local palette or interlace: out of profile
        return None
    if iw == 0 or ih == 0 or iw * ih > MAX_DECODE_PIXELS:
        return None
    i += 10
    min_code = b[i]
    i += 1
    data = bytearray()
    while i < len(b) and b[i] != 0:
        ln = b[i]
        data += b[i + 1 : i + 1 + ln]
        i += 1 + ln

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = n = pos = 0
    table: list[bytes] = [bytes([c]) for c in range(1 << min_code)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code():
        nonlocal acc, n, pos
        while n < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        return code

    while True:
        code = read_code()
        if code is None or code == eoi:
            break
        if code == clear:
            table = [bytes([c]) for c in range(1 << min_code)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if len(out) >= iw * ih:
            break  # raster full — ignore trailing codes, never out-grow it
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < iw * ih:
        return None
    idx = np.frombuffer(bytes(out[: iw * ih]), np.uint8)
    if idx.max(initial=0) >= len(pal):
        return None
    return pal[idx].reshape(ih, iw, 3).copy()
