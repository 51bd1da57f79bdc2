"""Pins for the pure-numpy media codec tier (functions/media_codecs.py):
container round-trips, decode exactness, resample math, and the honest
gates for what genuinely cannot decode without PIL/ffmpeg.

Reference parity note: the reference engine has no media tier at all —
this is the SURVEY §7 training-data extension; the contract under test is
our own (real decode for uncompressed profiles, loud NotImplementedError
for compressed ones).
"""

import math

import numpy as np
import pytest

from datafusion_bigtable_spark.functions import media_codecs as mc


def _px(n=144, base=0):
    return (np.arange(n, dtype=np.int64) + base).astype(np.uint8)


class TestRoundTrips:
    def test_bmp_pixel_round_trip(self):
        px = _px().reshape(6, 8, 3)
        b = mc.build_bmp(8, 6, px)
        assert mc.parse_media(b) == {"mime": "image/bmp", "width": 8, "height": 6}
        assert (mc.decode_bmp_pixels(b) == px).all()
        assert (mc.decode_pixels(b) == px).all()

    def test_bmp_row_padding(self):
        # width 3 → 9-byte rows pad to 12; decode must strip the pad.
        px = _px(3 * 3 * 3).reshape(3, 3, 3)
        b = mc.build_bmp(3, 3, px)
        assert (mc.decode_bmp_pixels(b) == px).all()

    def test_ppm_pixel_round_trip(self):
        px = _px().reshape(6, 8, 3)
        p = mc.build_ppm(8, 6, px)
        assert mc.parse_ppm(p) == {
            "mime": "image/x-portable-pixmap",
            "width": 8,
            "height": 6,
        }
        assert (mc.decode_ppm_pixels(p) == px).all()

    def test_ppm_comment_header(self):
        px = _px(12).reshape(2, 2, 3)
        raw = mc.build_ppm(2, 2, px)
        commented = b"P6\n# made by a test\n2 2\n255\n" + raw.split(b"255\n", 1)[1]
        assert (mc.decode_ppm_pixels(commented) == px).all()

    def test_wav_pcm_round_trip(self):
        body = mc.build_pcm_sine(16000, 2, 256)
        w = mc.build_wav(16000, 2, body)
        samples, rate = mc.decode_wav_samples(w)
        assert rate == 16000 and samples.shape == (256, 2)
        assert (samples == np.frombuffer(body, dtype="<i2").reshape(256, 2)).all()

    def test_truncated_containers_refuse(self):
        px = _px().reshape(6, 8, 3)
        assert mc.decode_bmp_pixels(mc.build_bmp(8, 6, px)[:-10]) is None
        assert mc.decode_ppm_pixels(mc.build_ppm(8, 6, px)[:-10]) is None

    def test_compressed_containers_return_none(self):
        # PNG/JPEG carry compressed pixels — decode_pixels must not guess.
        assert mc.decode_pixels(mc.build_png(8, 6, b"x" * 20)) is None
        assert mc.decode_pixels(mc.build_jpeg(8, 6, b"x" * 20)) is None


class TestStatsGrid:
    """The consecutive-integer fixture discipline: numpy statistics land
    exactly on the closed forms the SQL oracle computes."""

    def test_pixel_mean_std_closed_form(self):
        for base in (8, 57, 107):
            d = mc.decode_bmp_pixels(mc.build_bmp(8, 6, _px(base=base))).astype(np.float64)
            assert d.mean() == base + 143 / 2
            assert d.std() == math.sqrt((144**2 - 1) / 12)

    def test_pcm_mean_std_closed_form(self):
        samples = (np.arange(100, dtype=np.int64) - 37).astype("<i2")
        w = mc.build_wav(8000, 1, samples.tobytes())
        arr, _ = mc.decode_wav_samples(w)
        arr = arr.astype(np.float64)
        assert arr.mean() == -37 + 99 / 2
        assert arr.std() == math.sqrt((100**2 - 1) / 12)


class TestResample:
    def test_identity(self):
        px = _px().reshape(6, 8, 3)
        assert (mc.resample_nearest(px, 8, 6) == px).all()

    def test_half_pixel_center_mapping(self):
        # 2× downscale: output (y, x) back-projects to source center
        # ((y+.5)·sh/h, (x+.5)·sw/w) — the PIL-NEAREST convention.
        px = _px().reshape(6, 8, 3)
        out = mc.resample_nearest(px, 4, 3)
        assert out.shape == (3, 4, 3)
        for y in range(3):
            for x in range(4):
                sy = min(int((y + 0.5) * 6 / 3), 5)
                sx = min(int((x + 0.5) * 8 / 4), 7)
                assert (out[y, x] == px[sy, sx]).all()

    def test_upscale_replicates(self):
        px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # 1×2
        out = mc.resample_nearest(px, 4, 2)
        assert out.shape == (2, 4, 3)
        assert (out[:, :2] == px[0, 0]).all() and (out[:, 2:] == px[0, 1]).all()


class TestSparkOps:
    def test_full_mode_real_stats(self, spark, sf_dir):
        from datafusion_bigtable_spark.functions.multimodal import (
            extract_features,
            synthesize_decodable_assets,
        )
        from datafusion_bigtable_spark.queries import load

        docs = load(spark, sf_dir, "documents").limit(30)
        rows = extract_features(synthesize_decodable_assets(docs), mode="full").collect()
        assert rows
        for r in rows:
            i = r.asset_id
            if i % 3 < 2:
                base = (i * 7) % 100 + 8
                assert r.content_mean == base + 71.5
                assert r.content_std == pytest.approx(math.sqrt(20735 / 12), abs=0)
                assert (r.width, r.height) == (8, 6)
            else:
                base = (i * 11) % 500 - 250
                assert r.content_mean == base + 49.5
                assert r.channels == 1

    def test_resize_full_mode_real_pixels(self, spark, sf_dir):
        from datafusion_bigtable_spark.functions.multimodal import (
            resize_images,
            synthesize_decodable_assets,
        )
        from datafusion_bigtable_spark.queries import load

        docs = load(spark, sf_dir, "documents").filter("doc_id % 3 < 2").limit(10)
        assets = synthesize_decodable_assets(docs)
        rows = resize_images(assets, width=4, height=3, mode="full").collect()
        assert rows
        for r in rows:
            assert len(r.resized) == 4 * 3 * 3
            base = (r.asset_id * 7) % 100 + 8
            src = (np.arange(144, dtype=np.int64) + base).astype(np.uint8).reshape(6, 8, 3)
            expect = mc.resample_nearest(src, 4, 3)
            assert r.resized == expect.tobytes()

    def test_resize_mode_validated_eagerly(self, spark, sf_dir):
        from datafusion_bigtable_spark.functions.multimodal import resize_images
        from datafusion_bigtable_spark.queries import load

        docs = load(spark, sf_dir, "documents").limit(1)
        with pytest.raises(ValueError, match="unknown mode"):
            resize_images(docs.selectExpr("doc_id AS asset_id", "'x' AS mime", "encode(text, 'UTF-8') AS payload"), mode="pil")

    def test_ppm_stream_framing(self, spark, sf_dir):
        from datafusion_bigtable_spark.functions.multimodal import (
            sample_frames,
            synthesize_video_assets,
        )
        from datafusion_bigtable_spark.queries import load

        docs = load(spark, sf_dir, "documents").limit(20)
        frames = sample_frames(
            synthesize_video_assets(docs), mode="ppm", frame_stride=2, max_frames=3
        ).collect()
        assert frames
        for r in frames:
            assert r.frame_idx % 2 == 0
            px = mc.decode_ppm_pixels(bytes(r.frame))
            assert px is not None and px.shape == (4, 4, 3)
            color = (r.asset_id * 31 + r.frame_idx * 17) % 256
            assert (px == color).all()


# --- r6: real PNG codec (stdlib zlib + numpy unfilter) ---------------------


def _rand_px(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_round_trip_filter0():
    from datafusion_bigtable_spark.functions.media_codecs import build_png_rgb, decode_png_pixels

    px = _rand_px(13, 7, 1)
    assert np.array_equal(decode_png_pixels(build_png_rgb(px)), px)


def test_png_round_trip_every_filter():
    """Each spec filter (Sub/Up/Average/Paeth) must invert exactly —
    the encoder writes a chosen filter per row, the decoder unfilters."""
    from datafusion_bigtable_spark.functions.media_codecs import build_png_rgb, decode_png_pixels

    px = _rand_px(10, 9, 2)
    for ft in (1, 2, 3, 4):
        got = decode_png_pixels(build_png_rgb(px, filters=[ft]))
        assert np.array_equal(got, px), f"filter {ft} did not invert"
    # mixed filters down the image
    got = decode_png_pixels(build_png_rgb(px, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, px)


def test_png_paeth_known_values():
    """Hand-computed Paeth case so encoder and decoder can't share a bug:
    row0 = [10, 20], row1 raw = [30, 40] (1 channel equivalent via gray
    replicated — use RGB with constant channels)."""
    from datafusion_bigtable_spark.functions.media_codecs import decode_png_pixels, PNG_SIG, _png_chunk
    import struct, zlib

    # 2x2 RGB, rows: (10,10,10),(20,20,20) / (30,30,30),(40,40,40)
    # Row 0 Paeth: prev=0 row → predictors: x0 left=0,up=0,ul=0 → pred 0;
    #   x1 left=10, up=0, ul=0 → pa=|0-0|=0? spec: pa=|up-ul|=0, pb=|left-ul|=10, pc=|left+up-2ul|=10 → pred=up=0? pa<=pb and pa<=pc → pred=left? NO:
    #   spec order: if pa<=pb and pa<=pc: pred=left (pa is |p-c| where p.. careful) — delegate: encode row0 filter 0.
    # Row 1 Paeth filtered: x0: left=0, up=10, ul=0 → pa=|10-0|=10,pb=0,pc=10 → pred=up=10 → out=30-10=20
    #   x1: left=30, up=20, ul=10 → pa=|20-10|=10, pb=|30-10|=20, pc=|30+20-20|=30 → pred=left=30 → out=40-30=10
    raw = bytes([0]) + bytes([10,10,10,20,20,20]) + bytes([4]) + bytes([20,20,20,10,10,10])
    ihdr = struct.pack(">II", 2, 2) + bytes([8, 2, 0, 0, 0])
    png = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    got = decode_png_pixels(png)
    want = np.array([[[10,10,10],[20,20,20]],[[30,30,30],[40,40,40]]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_png_grayscale_and_rgba_profiles():
    from datafusion_bigtable_spark.functions.media_codecs import decode_png_pixels, PNG_SIG, _png_chunk
    import struct, zlib

    # grayscale 1x3: values 5, 6, 7 → replicated RGB
    raw = bytes([0, 5, 6, 7])
    ihdr = struct.pack(">II", 3, 1) + bytes([8, 0, 0, 0, 0])
    png = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    got = decode_png_pixels(png)
    assert got.shape == (1, 3, 3) and list(got[0, :, 0]) == [5, 6, 7]
    assert np.array_equal(got[:, :, 0], got[:, :, 2])

    # RGBA 1x2: alpha dropped
    raw = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
    ihdr = struct.pack(">II", 2, 1) + bytes([8, 6, 0, 0, 0])
    png = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    got = decode_png_pixels(png)
    assert got.shape == (1, 2, 3)
    assert list(got[0, 0]) == [1, 2, 3] and list(got[0, 1]) == [4, 5, 6]


def test_png_header_only_fixture_rejected():
    """The metadata fixture (build_png: junk body, no valid IDAT) must NOT
    pretend to decode — None keeps full-mode honest for it."""
    from datafusion_bigtable_spark.functions.media_codecs import build_png, decode_png_pixels

    assert decode_png_pixels(build_png(16, 16, b"not real idat")) is None


def test_png_full_mode_feature_extract(spark):
    """End to end through the Spark surface: a REAL PNG payload must now
    emit genuine content_mean/std in mode='full' (this was the PIL-gated
    gap until r6) and resize through the same dispatch."""
    from datafusion_bigtable_spark.functions.media_codecs import build_png_rgb
    from datafusion_bigtable_spark.functions.multimodal import extract_features, resize_images

    px = _rand_px(24, 16, 3)
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(build_png_rgb(px, filters=[0, 1, 2, 3, 4])))],
        "asset_id long, mime string, payload binary",
    )
    row = extract_features(df, mode="full").collect()[0]
    assert row.width == 16 and row.height == 24
    assert abs(row.content_mean - float(px.mean())) < 1e-9
    assert abs(row.content_std - float(px.std())) < 1e-9

    r = resize_images(df, width=8, height=8, mode="full").collect()[0]
    assert r.src_width == 16 and r.src_height == 24 and len(r.resized) == 8 * 8 * 3


# --- r6: audio spectral features (numpy rFFT) -----------------------------


def test_spectral_features_pure_sine_analytic():
    """A pure sine at f has all its power in f's bin: centroid == rolloff
    == f (to bin resolution), bandwidth ≈ 0, RMS = A/√2, ZCR = 2f/rate."""
    from datafusion_bigtable_spark.functions.media_codecs import (
        audio_spectral_features,
        build_pcm_sine,
        build_wav,
        decode_wav_samples,
    )

    rate, f, n = 8000, 440.0, 8000  # 1 s → 1 Hz bins, 440 exactly on-bin
    body = build_pcm_sine(rate, 1, n, freq=f)
    samples, got_rate = decode_wav_samples(build_wav(rate, 1, body))
    assert got_rate == rate
    feats = audio_spectral_features(samples, rate)
    assert abs(feats["spectral_centroid_hz"] - f) < 1.0
    assert abs(feats["spectral_rolloff_hz"] - f) < 1.0
    assert feats["spectral_bandwidth_hz"] < 5.0
    assert abs(feats["rms"] - 32000 / np.sqrt(2)) / (32000 / np.sqrt(2)) < 0.01
    assert abs(feats["zcr"] - 2 * f / rate) < 0.01


def test_spectral_features_two_tone_centroid_between():
    """Equal-power tones at f1 and f2 → centroid at the midpoint."""
    from datafusion_bigtable_spark.functions.media_codecs import audio_spectral_features

    rate, n = 8000, 8000
    t = np.arange(n) / rate
    x = (np.sin(2 * np.pi * 400 * t) + np.sin(2 * np.pi * 1200 * t)) * 10000
    feats = audio_spectral_features(x.astype("<i2"), rate)
    assert abs(feats["spectral_centroid_hz"] - 800.0) < 5.0
    assert 390 < feats["spectral_rolloff_hz"] <= 1210
    # bandwidth ≈ |f2-f1|/2 = 400 for equal-power two-tone
    assert abs(feats["spectral_bandwidth_hz"] - 400.0) < 10.0


def test_spectral_features_empty_and_silence():
    from datafusion_bigtable_spark.functions.media_codecs import audio_spectral_features

    z = audio_spectral_features(np.zeros((0,), dtype=np.int16), 8000)
    assert z["rms"] == 0.0 and z["spectral_centroid_hz"] == 0.0
    s = audio_spectral_features(np.zeros((100, 2), dtype=np.int16), 8000)
    assert s["rms"] == 0.0 and s["spectral_centroid_hz"] == 0.0


# --- r6: property-based codec hardening ------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        filt=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    )
    def test_png_round_trip_property(w, h, seed, filt):
        """Any size × any filter schedule × any pixels: PNG must round-trip
        EXACTLY (the whole pipeline is lossless)."""
        from datafusion_bigtable_spark.functions.media_codecs import (
            build_png_rgb,
            decode_png_pixels,
        )

        px = _rand_px(h, w, seed % 2**16)
        assert np.array_equal(decode_png_pixels(build_png_rgb(px, filters=filt)), px)

    @settings(max_examples=10, deadline=None)
    @given(w=st.integers(1, 20), h=st.integers(1, 20), v=st.integers(0, 255), sub=st.booleans())
    def test_jpeg_constant_image_property(w, h, v, sub):
        """Constant images: only the DC coefficient survives, so round-trip
        error is bounded by the DC quantization step regardless of size,
        value, or subsampling."""
        from datafusion_bigtable_spark.functions.jpeg_codec import (
            build_jpeg_rgb,
            decode_jpeg_pixels,
        )

        px = np.full((h, w, 3), v, dtype=np.uint8)
        got = decode_jpeg_pixels(build_jpeg_rgb(px, subsample=sub))
        assert got.shape == (h, w, 3)
        assert int(np.abs(got.astype(int) - v).max()) <= 3


def test_decoder_fuzz_never_crashes():
    """Poison-payload robustness: at 100 TB some payloads WILL be
    corrupt, and a decoder that raises an uncaught error or hangs kills
    the whole Arrow batch.  Mutated/truncated containers must decode to
    an array or None — nothing else."""
    from datafusion_bigtable_spark.functions.jpeg_codec import build_jpeg_rgb
    from datafusion_bigtable_spark.functions.media_codecs import (
        build_bmp,
        build_png_rgb,
        build_ppm,
        build_wav,
        build_pcm_sine,
        decode_pixels,
        decode_wav_samples,
        parse_media,
    )

    rng = np.random.RandomState(7)
    px = _rand_px(12, 9, 11)
    seeds = [
        build_png_rgb(px, filters=[0, 1, 2, 3, 4]),
        build_jpeg_rgb(px),
        build_jpeg_rgb(px, subsample=True),
        build_bmp(9, 12, px),
        build_ppm(9, 12, px),
        build_wav(8000, 1, build_pcm_sine(8000, 1, 256)),
    ]
    from datafusion_bigtable_spark.functions.media_codecs import build_gif_rgb

    gif_pal = _rand_px(4, 4, 13).reshape(16, 3)
    seeds.append(build_gif_rgb(gif_pal[np.random.RandomState(14).randint(0, 16, (12, 9))]))
    for seed in seeds:
        for _ in range(40):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 6)):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            if rng.rand() < 0.3:
                b = b[: rng.randint(0, len(b))]
            payload = bytes(b)
            out = decode_pixels(payload)
            assert out is None or isinstance(out, np.ndarray)
            wav = decode_wav_samples(payload)
            assert wav is None or isinstance(wav[0], np.ndarray)
            assert isinstance(parse_media(payload), dict)


def test_png_truncated_chunk_length_returns_none():
    """A declared chunk length pointing past the buffer must return None,
    not raise — the exact poison shape random fuzz rarely hits."""
    from datafusion_bigtable_spark.functions.media_codecs import (
        PNG_SIG,
        decode_png_pixels,
    )
    import struct

    evil = PNG_SIG + struct.pack(">I", 1000) + b"IHDR" + b"\x00" * 4  # len >> data
    assert decode_png_pixels(evil) is None


# --- r6: GIF (LZW) codec ---------------------------------------------------


def test_gif_round_trip_exact():
    """GIF is lossless for palette-limited images: full LZW round-trip
    (variable code widths, clear/EOI, sub-blocks) must be bit-exact."""
    from datafusion_bigtable_spark.functions.media_codecs import (
        build_gif_rgb,
        decode_gif_pixels,
        parse_media,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 16, (23, 17))]
    g = build_gif_rgb(px)
    assert np.array_equal(decode_gif_pixels(g), px)
    assert parse_media(g) == {"mime": "image/gif", "width": 17, "height": 23}
    # 2-color and 256-color edges; enough data to force code-width growth
    bw = np.zeros((40, 40, 3), np.uint8)
    bw[::2] = 255
    assert np.array_equal(decode_gif_pixels(build_gif_rgb(bw)), bw)
    pal256 = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    big = pal256[rng.randint(0, 256, (64, 64))]
    assert np.array_equal(decode_gif_pixels(build_gif_rgb(big)), big)


def test_gif_too_many_colors_rejected():
    from datafusion_bigtable_spark.functions.media_codecs import build_gif_rgb
    import pytest as _pt

    rng = np.random.RandomState(10)
    with _pt.raises(ValueError, match="256 colors"):
        build_gif_rgb(rng.randint(0, 256, (32, 32, 3), dtype=np.uint8))


def test_gif_interlaced_refused():
    from datafusion_bigtable_spark.functions.media_codecs import (
        build_gif_rgb,
        decode_gif_pixels,
    )

    px = np.zeros((8, 8, 3), np.uint8)
    g = bytearray(build_gif_rgb(px))
    i = g.find(b"\x2c")  # image descriptor
    g[i + 9] |= 0x40  # set interlace flag
    assert decode_gif_pixels(bytes(g)) is None


def test_gif_through_spark_full_mode(spark):
    from datafusion_bigtable_spark.functions.media_codecs import build_gif_rgb
    from datafusion_bigtable_spark.functions.multimodal import extract_features

    px = np.full((12, 10, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image/gif", bytearray(build_gif_rgb(px)))],
        "asset_id long, mime string, payload binary",
    )
    row = extract_features(df, mode="full").collect()[0]
    assert row.mime == "image/gif" and row.width == 10 and row.height == 12
    assert row.content_mean == 77.0 and row.content_std == 0.0


# --- r7: allocation guards on attacker-controlled dimensions ---------------


def test_png_zip_bomb_idat_bounded():
    """r6 ADVICE: IDAT inflation is now bounded by the IHDR-declared raster
    size — a small IDAT that would inflate to ~512 MB must not expand past
    the 8×8 raster it claims to fill (the decode itself still succeeds on
    the prefix, matching the old overlong-stream tolerance)."""
    import struct
    import zlib

    from datafusion_bigtable_spark.functions.media_codecs import (
        PNG_SIG,
        _png_chunk,
        decode_png_pixels,
    )

    bomb = zlib.compress(b"\x00" * (512 * 1024 * 1024), 9)  # ~512 KB compressed
    ihdr = struct.pack(">II", 8, 8) + bytes([8, 2, 0, 0, 0])
    evil = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png_pixels(evil)
    assert out is not None and out.shape == (8, 8, 3) and not out.any()


def test_png_giant_declared_dims_refused():
    """A 4-billion-pixel IHDR must be refused before any allocation."""
    import struct

    from datafusion_bigtable_spark.functions.media_codecs import (
        PNG_SIG,
        _png_chunk,
        decode_png_pixels,
    )

    ihdr = struct.pack(">II", 65535, 65535) + bytes([8, 2, 0, 0, 0])
    evil = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", b"x") + _png_chunk(b"IEND", b"")
    assert decode_png_pixels(evil) is None


def _gif_descriptor_offset(b: bytes) -> int:
    """Walk header + global color table + extensions to the 0x2C image
    descriptor (a bare .index would false-hit 0x2C palette bytes)."""
    gct_n = 2 << (b[10] & 0x07)
    i = 13 + gct_n * 3
    while b[i] == 0x21:
        i += 2
        while b[i] != 0:
            i += 1 + b[i]
        i += 1
    assert b[i] == 0x2C
    return i


def test_gif_lzw_output_capped_at_raster():
    """r6 ADVICE: LZW decode stops at iw*ih bytes — a descriptor patched
    down to 4×4 over a 64×64 image's LZW stream decodes the 4×4 prefix
    instead of materializing the full 4096-byte raster."""
    import struct

    import numpy as np

    from datafusion_bigtable_spark.functions.media_codecs import (
        build_gif_rgb,
        decode_gif_pixels,
    )

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    rng = np.random.RandomState(7)
    full = build_gif_rgb(pal[rng.randint(0, 16, (64, 64))])
    i = _gif_descriptor_offset(full)
    evil = bytearray(full)
    evil[i + 5 : i + 9] = struct.pack("<HH", 4, 4)
    out = decode_gif_pixels(bytes(evil))
    assert out is not None and out.shape == (4, 4, 3)


def test_gif_giant_declared_dims_refused():
    import struct

    import numpy as np

    from datafusion_bigtable_spark.functions.media_codecs import (
        build_gif_rgb,
        decode_gif_pixels,
    )

    pal = np.zeros((2, 3), dtype=np.uint8)
    full = build_gif_rgb(pal[np.zeros((4, 4), dtype=np.int64)])
    i = _gif_descriptor_offset(full)
    evil = bytearray(full)
    evil[i + 5 : i + 9] = struct.pack("<HH", 65535, 65535)
    assert decode_gif_pixels(bytes(evil)) is None
