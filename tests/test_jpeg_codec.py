"""functions/jpeg_codec.py — layered verification without PIL.

Every LOSSLESS stage round-trips exactly (bit I/O, canonical Huffman,
zigzag, coefficient↔bitstream); the LOSSY stages (quantization) are
bounded analytically; the DCT is checked against hand-computed vectors
so encoder and decoder cannot share a transform bug.
"""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_bigtable_spark.functions import jpeg_codec as J


def test_dct_hand_computed_vectors():
    # constant block: only DC survives; orthonormal DCT-II DC = 8·v/8 = v·8·(1/√64)…
    # concretely: fdct2(v·ones) = v·8·(√0.125·√0.125·8) = v·8? verify numerically
    v = 100.0
    c = J.fdct2(np.full((8, 8), v))
    assert abs(c[0, 0] - v * 8.0) < 1e-9  # DC gain of the orthonormal basis
    assert np.abs(c).sum() - abs(c[0, 0]) < 1e-9  # every AC is zero
    # orthonormality: IDCT(FDCT(x)) == x to round-off
    rng = np.random.RandomState(0)
    x = rng.uniform(-128, 127, (8, 8))
    assert np.abs(J.idct2(J.fdct2(x)) - x).max() < 1e-9
    # Parseval: energy preserved
    assert abs((J.fdct2(x) ** 2).sum() - (x**2).sum()) < 1e-6


def test_bit_writer_reader_round_trip():
    rng = np.random.RandomState(1)
    fields = [(int(rng.randint(0, 1 << l)), int(l)) for l in rng.randint(1, 17, 200)]
    w = J._BitWriter()
    for v, l in fields:
        w.write(v, l)
    data = w.flush()
    r = J._BitReader(data)
    for v, l in fields:
        assert r.read(l) == v


def test_bit_stuffing_round_trip():
    # all-ones stretches force 0xFF bytes → stuffed 0x00s must be invisible
    w = J._BitWriter()
    for _ in range(10):
        w.write(0xFFFF, 16)
    data = w.flush()
    assert b"\xff\x00" in data
    r = J._BitReader(data)
    for _ in range(10):
        assert r.read(16) == 0xFFFF


def test_magnitude_code_round_trip():
    for v in list(range(-255, 256)) + [1023, -1023, 2047, -2047]:
        bits, s = J._encode_magnitude(v)
        assert J._extend(bits, s) == v, v


def test_huffman_coefficient_block_round_trip():
    """coefficients → entropy bits → coefficients must be EXACT for
    arbitrary sparse blocks, including ZRL (>15 zero runs) and EOB."""
    rng = np.random.RandomState(2)
    dc_codes = J._build_codes(J.DC_LUMA_SPEC)
    ac_codes = J._build_codes(J.AC_LUMA_SPEC)
    dc_table = J._build_decoder(J.DC_LUMA_SPEC)
    ac_table = J._build_decoder(J.AC_LUMA_SPEC)
    blocks = []
    for _ in range(50):
        blk = np.zeros(64, dtype=np.int32)
        for _ in range(rng.randint(0, 12)):
            blk[rng.randint(0, 64)] = rng.randint(-200, 201)
        blocks.append(blk.reshape(8, 8))
    blocks.append(np.zeros((8, 8), dtype=np.int32))  # pure-EOB block
    zrl = np.zeros(64, dtype=np.int32)
    zrl[0], zrl[40] = 5, -3  # 39-zero run → two ZRLs + coded coeff
    blocks.append(zrl.reshape(8, 8))

    w = J._BitWriter()
    prev = 0
    for blk in blocks:
        prev = J._encode_block(w, blk, prev, dc_codes, ac_codes)
    r = J._BitReader(w.flush())
    prev = 0
    for blk in blocks:
        got, prev = J._decode_block(r, prev, dc_table, ac_table)
        assert np.array_equal(got, blk)


def test_jpeg_round_trip_error_bound():
    """decode(encode(px)) must stay within the quantization-error bound.
    For a CONSTANT image only the DC coefficient is nonzero: error ≤
    q_dc/2 · (1/8) per pixel (+1 for color round-trip rounding)."""
    for v in (0, 17, 128, 200, 255):
        px = np.full((24, 24, 3), v, dtype=np.uint8)
        got = J.decode_jpeg_pixels(J.build_jpeg_rgb(px))
        assert got.shape == (24, 24, 3)
        assert int(np.abs(got.astype(int) - int(v)).max()) <= 3, v


def test_jpeg_round_trip_smooth_image():
    """Smooth gradients concentrate energy in low-frequency coefficients
    (small quant steps) — round-trip error stays small."""
    y, x = np.mgrid[0:40, 0:32]
    px = np.stack(
        [
            (x * 255 / 31).astype(np.uint8),
            (y * 255 / 39).astype(np.uint8),
            ((x + y) * 255 / 70).astype(np.uint8),
        ],
        axis=-1,
    )
    got = J.decode_jpeg_pixels(J.build_jpeg_rgb(px))
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.mean() < 4 and err.max() <= 40  # chroma quant is coarse


def test_jpeg_non_multiple_of_8_crops_exactly():
    px = np.full((13, 11, 3), 90, dtype=np.uint8)
    got = J.decode_jpeg_pixels(J.build_jpeg_rgb(px))
    assert got.shape == (13, 11, 3)
    assert int(np.abs(got.astype(int) - 90).max()) <= 3


def test_jpeg_grayscale_profile():
    g = np.linspace(0, 255, 16 * 16).reshape(16, 16).astype(np.uint8)
    got = J.decode_jpeg_pixels(J.build_jpeg_rgb(g))
    assert got.shape == (16, 16, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    assert np.abs(got[:, :, 0].astype(int) - g.astype(int)).mean() < 4


def test_jpeg_out_of_profile_rejected():
    px = np.full((8, 8, 3), 50, dtype=np.uint8)
    b = bytearray(J.build_jpeg_rgb(px))
    # flip SOF0 → SOF2 (progressive): must refuse, not misdecode
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert J.decode_jpeg_pixels(bytes(b)) is None
    # the header-only bench fixture (no scan) must also refuse
    from datafusion_bigtable_spark.functions.media_codecs import build_jpeg

    assert J.decode_jpeg_pixels(build_jpeg(16, 16, b"junk")) is None


def test_jpeg_full_mode_feature_extract(spark):
    """End to end through the Spark surface: a real baseline JPEG payload
    emits content stats in mode='full' within the codec's quantization
    error bound, and resizes through the same dispatch."""
    from datafusion_bigtable_spark.functions.multimodal import extract_features, resize_images

    px = np.full((24, 16, 3), 130, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(J.build_jpeg_rgb(px)))],
        "asset_id long, mime string, payload binary",
    )
    row = extract_features(df, mode="full").collect()[0]
    assert row.width == 16 and row.height == 24
    assert abs(row.content_mean - 130.0) <= 3 and row.content_std <= 3

    r = resize_images(df, width=8, height=8, mode="full").collect()[0]
    assert len(r.resized) == 8 * 8 * 3


def test_jpeg_420_round_trip():
    """4:2:0 (the real-world default): MCU-interleaved 2x2 luma + box-
    averaged chroma must round-trip within the quantization + subsampling
    bound; luma (not subsampled) stays as tight as 4:4:4."""
    for hw in ((32, 32), (24, 16), (13, 11), (16, 24)):
        px = np.full((*hw, 3), 120, dtype=np.uint8)
        got = J.decode_jpeg_pixels(J.build_jpeg_rgb(px, subsample=True))
        assert got.shape == (*hw, 3)
        assert int(np.abs(got.astype(int) - 120).max()) <= 3, hw

    y, x = np.mgrid[0:32, 0:24]
    px = np.stack(
        [
            (x * 255 / 23).astype(np.uint8),
            (y * 255 / 31).astype(np.uint8),
            np.full((32, 24), 60, np.uint8),
        ],
        axis=-1,
    )
    got = J.decode_jpeg_pixels(J.build_jpeg_rgb(px, subsample=True))
    err = np.abs(got.astype(int) - px.astype(int))
    # chroma carries the gradient at half resolution → tolerance includes
    # the replication-upsample step (±1 chroma pixel of gradient)
    assert err.mean() < 6 and err.max() <= 60


def test_jpeg_420_vs_444_consistency():
    """Both profiles must agree on a chroma-flat image (subsampling loses
    nothing when chroma is constant)."""
    rng = np.random.RandomState(5)
    luma = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    px = np.stack([luma, luma, luma], axis=-1)  # gray content → flat chroma
    a = J.decode_jpeg_pixels(J.build_jpeg_rgb(px, subsample=False)).astype(int)
    b = J.decode_jpeg_pixels(J.build_jpeg_rgb(px, subsample=True)).astype(int)
    assert np.abs(a - b).max() <= 2


def test_jpeg_poison_sof_dims_refused():
    """r6 ADVICE: a ~200-byte JPEG declaring 65535×65535 in SOF0 used to
    allocate ~100 GB of float64 planes before any entropy data existed.
    Now the SOF parse refuses dimensions above MAX_DECODE_PIXELS (and
    decode_jpeg_pixels additionally catches MemoryError)."""
    import struct

    import numpy as np

    from datafusion_bigtable_spark.functions.jpeg_codec import (
        build_jpeg_rgb,
        decode_jpeg_pixels,
    )

    good = build_jpeg_rgb(np.zeros((8, 8, 3), dtype=np.uint8))
    i = good.index(b"\xff\xc0")
    evil = bytearray(good)
    evil[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)  # h, w after precision
    assert decode_jpeg_pixels(bytes(evil)) is None
    assert decode_jpeg_pixels(good) is not None  # sanity: patch site was right


# --- progressive (SOF2) ------------------------------------------------------

from datafusion_bigtable_spark.functions.jpeg_codec import (  # noqa: E402
    build_jpeg_rgb,
    build_jpeg_rgb_progressive,
    decode_jpeg_pixels,
)


def _structured_image(h=41, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = (yy * 5) % 256
    img[..., 1] = (xx * 3) % 256
    img[..., 2] = 128
    img[5 : h // 3, 5 : w // 2] = 200  # flat region -> EOB runs
    rng = np.random.default_rng(3)
    ph, pw = h - h // 2, w - w // 2
    img[h // 2 :, w // 2 :] = rng.integers(0, 256, (ph, pw, 3), dtype=np.uint8)
    return img


def test_progressive_equals_baseline_bit_exact():
    """The cross-profile identity: a progressive stream carries the SAME
    quantized coefficients as a baseline stream of the image, so the two
    decodes must agree bit-for-bit — 4:4:4, 4:2:0, and grayscale."""
    img = _structured_image()
    for sub in (False, True):
        base = decode_jpeg_pixels(build_jpeg_rgb(img, subsample=sub))
        prog = decode_jpeg_pixels(build_jpeg_rgb_progressive(img, subsample=sub))
        assert prog is not None
        assert np.array_equal(base, prog), f"subsample={sub}"
    g = (np.mgrid[0:30, 0:30][0] * 7 % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(build_jpeg_rgb(g)),
        decode_jpeg_pixels(build_jpeg_rgb_progressive(g)),
    )


def test_progressive_bit_exact_random_sizes():
    rng = np.random.default_rng(17)
    for _ in range(8):
        h, w = rng.integers(1, 70, 2)
        img = rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        for sub in (False, True):
            base = decode_jpeg_pixels(build_jpeg_rgb(img, subsample=sub))
            prog = decode_jpeg_pixels(build_jpeg_rgb_progressive(img, subsample=sub))
            assert prog is not None and np.array_equal(base, prog), (h, w, sub)


def test_progressive_eob_run_and_sparse_spans():
    """Long EOB runs (flat 257x129 -> hundreds of all-zero AC blocks in
    one EOBn) and isolated spikes (ZRL chains through interleaved
    correction bits — the exact desync case the positional-walk encoder
    exists for) must both survive."""
    flat = np.full((257, 129, 3), 10, dtype=np.uint8)
    rng = np.random.default_rng(11)
    sparse = np.where(rng.random((80, 80, 3)) < 0.01, 255, 0).astype(np.uint8)
    for img in (flat, sparse):
        base = decode_jpeg_pixels(build_jpeg_rgb(img))
        prog = decode_jpeg_pixels(build_jpeg_rgb_progressive(img))
        assert prog is not None and np.array_equal(base, prog)


def test_progressive_ac_refine_positional_bits():
    """Unit-level pin of the refinement walk: history coefficients
    separated by >16 zeros force multiple ZRLs whose correction bits
    must interleave positionally (the case that desyncs a block-global
    bit buffer)."""
    from datafusion_bigtable_spark.functions.jpeg_codec import (
        PROG_AC_SPEC,
        _AcProgWriter,
        _BitReader,
        _BitWriter,
        _build_codes,
        _build_decoder,
        _decode_prog_ac_first,
        _decode_prog_ac_refine,
        _encode_ac_first_block,
        _encode_ac_refine_block,
    )

    zz = np.zeros(64, dtype=np.int64)
    for pos, v in {1: 6, 18: 40, 25: -27, 29: -15, 30: -13, 43: 11, 49: 19, 59: 1}.items():
        zz[pos] = v
    codes = _build_codes(PROG_AC_SPEC)
    table = _build_decoder(PROG_AC_SPEC)
    w1 = _BitWriter()
    aw1 = _AcProgWriter(w1, codes)
    _encode_ac_first_block(aw1, zz, 1, 63, 1)
    aw1.flush_eob()
    w2 = _BitWriter()
    aw2 = _AcProgWriter(w2, codes)
    _encode_ac_refine_block(aw2, zz, 1, 63, 0)
    aw2.flush_eob()
    got = [np.zeros(64, dtype=np.int64)]
    assert _decode_prog_ac_first(_BitReader(w1.flush()), iter(got), table, 1, 63, 1)
    assert _decode_prog_ac_refine(_BitReader(w2.flush()), iter(got), table, 1, 63, 0)
    assert np.array_equal(zz[1:], got[0][1:])


def test_progressive_truncation_and_fuzz_never_crash():
    img = _structured_image(32, 48)
    pb = build_jpeg_rgb_progressive(img)
    for cut in range(2, len(pb), 97):
        decode_jpeg_pixels(pb[:cut])  # partial or None, never an exception
    rng = np.random.default_rng(5)
    for _ in range(100):
        blob = bytes(rng.integers(0, 256, int(rng.integers(4, 300))))
        decode_jpeg_pixels(b"\xff\xd8" + blob)


def test_restart_intervals_both_profiles_bit_exact():
    """DRI/RSTn support: restart markers every 1..17 MCUs (byte-aligned,
    DC predictors and EOB runs reset) must reproduce the unrestarted
    decode bit-for-bit in BOTH profiles — interval 1 maximizes marker
    density, the off-aligned intervals exercise the mid-row resets."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    for sub in (False, True):
        want = decode_jpeg_pixels(build_jpeg_rgb(img, subsample=sub))
        for ri in (1, 3, 17):
            got_b = decode_jpeg_pixels(
                build_jpeg_rgb(img, subsample=sub, restart_interval=ri)
            )
            got_p = decode_jpeg_pixels(
                build_jpeg_rgb_progressive(img, subsample=sub, restart_interval=ri)
            )
            assert got_b is not None and np.array_equal(got_b, want), (ri, sub)
            assert got_p is not None and np.array_equal(got_p, want), (ri, sub)


def test_restart_marker_missing_fails_closed():
    """A DRI header whose stream lacks the promised RSTn must return
    None (decode refuses), never silently misalign."""
    img = np.full((24, 24, 3), 99, dtype=np.uint8)
    b = bytearray(build_jpeg_rgb(img, restart_interval=1))
    # strip every RST marker from the entropy stream (FF D0-D7)
    out = bytearray()
    i = 0
    while i < len(b):
        if b[i] == 0xFF and i + 1 < len(b) and 0xD0 <= b[i + 1] <= 0xD7:
            i += 2
            continue
        out.append(b[i])
        i += 1
    assert decode_jpeg_pixels(bytes(out)) is None


def test_sampling_factors_1_2_4():
    """{1,2,4} sampling layouts (4:1:1, vertical 4:4:0, 4x4, mixed):
    a flat image decodes exactly under every layout, and a constant-
    chroma image must decode BIT-IDENTICAL to its 4:4:4 encoding — the
    luma path is untouched by chroma sampling, and box-average +
    replication of constant chroma is the identity."""
    layouts = [
        [(4, 1), (1, 1), (1, 1)],  # 4:1:1
        [(1, 2), (1, 1), (1, 1)],  # 4:4:0 (vertical)
        [(4, 4), (1, 1), (1, 1)],
        [(4, 2), (2, 1), (1, 1)],  # mixed ratios
    ]
    flat = np.full((37, 51, 3), 99, dtype=np.uint8)
    ref = decode_jpeg_pixels(build_jpeg_rgb(flat))
    rng = np.random.default_rng(4)
    lum = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    gray_rgb = np.stack([lum, lum, lum], axis=2)  # cb = cr = 128 constant
    want = decode_jpeg_pixels(build_jpeg_rgb(gray_rgb))
    for sm in layouts:
        got = decode_jpeg_pixels(build_jpeg_rgb(flat, samps=sm))
        assert got is not None and np.array_equal(got, ref), sm
        got = decode_jpeg_pixels(build_jpeg_rgb(gray_rgb, samps=sm))
        assert got is not None and np.array_equal(got, want), sm
    with pytest.raises(ValueError):
        build_jpeg_rgb(flat, samps=[(3, 1), (1, 1), (1, 1)])
