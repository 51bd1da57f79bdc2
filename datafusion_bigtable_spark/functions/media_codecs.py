"""Pure-Python media container codecs — header-level, dependency-free.

PIL/ffmpeg are not in this container, so full pixel/sample decode stays
gated (functions/multimodal.py).  But container METADATA — the part a
100 TB curation pipeline filters on before ever decoding pixels — lives in
fixed, documented header layouts that plain Python parses fine:

- PNG:  8-byte signature + IHDR chunk (width/height big-endian at 16/20).
- JPEG: marker segments; SOF0/1/2 carries height/width big-endian.
- WAV:  RIFF/WAVE + ``fmt `` chunk (channels/sample-rate little-endian).

``build_*`` constructs real minimal containers (valid signatures + header
chunks, arbitrary body bytes) so synthetic corpora exercise the REAL
parse path; ``parse_media`` sniffs by magic and extracts metadata.
"""

from __future__ import annotations

import struct

PNG_SIG = b"\x89PNG\r\n\x1a\n"


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


def parse_media(b: bytes) -> dict:
    """Sniff-by-magic header parse; unknown containers come back as
    octet-stream with no typed metadata."""
    for parser in (parse_png, parse_jpeg, parse_wav):
        meta = parser(b)
        if meta is not None:
            return meta
    return {"mime": "application/octet-stream"}
