"""Baseline JPEG codec tests (mie_spark/operators/jpeg.py).

Evidence strategy — there is no independent JPEG decoder in this
container, so correctness rests on three legs:
1. REAL-WORLD DECODE: fixtures produced by independent encoders
   (CPython's own test-suite JPEGs, vendored under tests/fixtures/) —
   a baseline 4:2:0 color file and a grayscale file. Decoding these
   exercises foreign Huffman tables, subsampling, and framing our own
   encoder did not write, which breaks encoder/decoder
   self-consistency circularity.
2. ROUND TRIP: our encoder's output decoded back within
   quality-appropriate tolerance across qualities, subsamplings,
   restart intervals, and degenerate shapes.
3. PILLOW CROSS-CHECK (importorskip): where Pillow exists, its decode
   of our encoder's bytes must agree with ours.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from mie_spark.operators.jpeg import (
    _build_decode_table,
    jpeg_from_array,
    parse_jpeg,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


# ---------------------------------------------------------------- fixtures
def test_decode_real_world_baseline_420():
    """CPython's test_email python.jpg: baseline SOF0, 16x16, YCbCr
    4:2:0, written by a real production encoder."""
    raw = (FIXTURES / "baseline_420.jpg").read_bytes()
    w, h, img = parse_jpeg(raw)
    assert (w, h) == (16, 16)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8
    # the fixture is the Python logo: non-trivial content, full range
    assert img.min() < 32 and img.max() > 223
    # regression pin: any change to the entropy / DCT / upsample /
    # color path shows up here first
    import hashlib

    assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == "7ee70c76b4f78c9a"


def test_decode_real_world_grayscale():
    """IPython's 2x2.jpg: baseline single-component grayscale."""
    raw = (FIXTURES / "gray_2x2.jpg").read_bytes()
    w, h, img = parse_jpeg(raw)
    assert (w, h) == (2, 2)
    assert img.shape == (2, 2, 1)
    # the fixture is a uniform mid-gray swatch
    assert int(img.max()) - int(img.min()) <= 2


def test_decode_matches_header_sniffer():
    from mie_spark.operators.multimodal import sniff_image_meta

    raw = (FIXTURES / "baseline_420.jpg").read_bytes()
    media, sw, sh = sniff_image_meta(raw)
    w, h, _ = parse_jpeg(raw)
    assert media == "image/jpeg" and (sw, sh) == (w, h)


def test_decode_real_world_progressive():
    """A real progressive (SOF2) photo from an independent encoder:
    720x477 YCbCr 4:2:2, ten spectral/approximation scans. The
    spectral-selection + successive-approximation + EOB-run paths all
    execute; the output must be a coherent photo (full tonal range,
    photo-like gradient statistics), pinned by digest."""
    raw = (FIXTURES / "progressive_422.jpg").read_bytes()
    w, h, img = parse_jpeg(raw)
    assert (w, h) == (720, 477)
    assert img.shape == (477, 720, 3)
    assert img.min() == 0 and img.max() == 255
    # a misdecoded scan produces salt-and-pepper noise: mean |dx| of a
    # real photo stays far below the ~85 of uniform noise
    gx = np.abs(np.diff(img[:, :, 0].astype(int), axis=1)).mean()
    assert gx < 30, gx
    import hashlib

    assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == "5158c38d6e8df942"


def test_truncated_progressive_raises():
    raw = (FIXTURES / "progressive_truncated.jpg").read_bytes()
    with pytest.raises(ValueError, match="truncated"):
        parse_jpeg(raw)


def test_garbage_raises():
    with pytest.raises(ValueError):
        parse_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        parse_jpeg(b"\xff\xd8\xff\xee\x00\x04ab")  # APP segment, then EOF


def test_arithmetic_coding_raises_loudly():
    # SOF9 (extended sequential, arithmetic): unsupported coding process
    sof9 = (
        b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    )
    with pytest.raises(ValueError, match="coding process"):
        parse_jpeg(sof9)


# ---------------------------------------------------------------- round trip
def _smooth(h, w):
    """A smooth (no mod-wrap discontinuity) RGB test card — JPEG's
    happy case, so tolerances can be tight."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 200) // max(w - 1, 1)
    g = (yy * 200) // max(h - 1, 1)
    b = ((xx + yy) * 180) // max(h + w - 2, 1) + 40
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize(
    ("quality", "sub", "ri", "tol_max", "tol_mean"),
    [
        (95, "444", 0, 8, 2.0),
        (85, "444", 0, 12, 3.0),
        (85, "420", 0, 24, 4.0),
        (70, "420", 4, 32, 6.0),
    ],
)
def test_round_trip_smooth(quality, sub, ri, tol_max, tol_mean):
    src = _smooth(40, 56)
    enc = jpeg_from_array(src, quality=quality, subsampling=sub, restart_interval=ri)
    w, h, dec = parse_jpeg(enc)
    assert (w, h) == (56, 40)
    err = np.abs(dec.astype(int) - src.astype(int))
    assert err.max() <= tol_max, err.max()
    assert err.mean() <= tol_mean, err.mean()


def test_round_trip_solid_color_near_exact():
    src = np.full((16, 24, 3), [200, 30, 90], np.uint8)
    for sub in ("444", "420"):
        _, _, dec = parse_jpeg(jpeg_from_array(src, quality=95, subsampling=sub))
        assert np.abs(dec.astype(int) - src.astype(int)).max() <= 2, sub


def test_round_trip_grayscale():
    yy, xx = np.mgrid[0:32, 0:32]
    src = ((xx * 4 + yy * 3) & 0x7F).astype(np.uint8) + 64
    _, _, dec = parse_jpeg(jpeg_from_array(src, quality=92))
    assert dec.shape == (32, 32, 1)
    assert np.abs(dec[:, :, 0].astype(int) - src.astype(int)).mean() <= 3.0


def test_round_trip_non_multiple_of_mcu():
    """Sizes that don't tile the 8x8 (444) or 16x16 (420) MCU grid:
    the encoder edge-pads, the decoder crops — dims must survive."""
    for h, w in ((1, 1), (1, 37), (23, 1), (17, 31), (9, 15)):
        src = _smooth(h, w)
        for sub in ("444", "420"):
            enc = jpeg_from_array(src, quality=90, subsampling=sub)
            dw, dh, dec = parse_jpeg(enc)
            assert (dw, dh) == (w, h), (h, w, sub)
            assert dec.shape == (h, w, 3)
            err = np.abs(dec.astype(int) - src.astype(int))
            assert err.mean() <= 12.0, (h, w, sub, err.mean())


def test_restart_interval_stream_structure():
    """restart_interval writes DRI and byte-aligned RSTn markers the
    decoder must resynchronize on; results match the no-restart form."""
    src = _smooth(48, 48)
    plain = parse_jpeg(jpeg_from_array(src, quality=88))[2]
    with_rst = jpeg_from_array(src, quality=88, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    rst = parse_jpeg(with_rst)[2]
    assert np.array_equal(plain, rst)


def test_huffman_tables_are_canonical():
    """The Annex-K tables must build valid prefix-free canonical codes
    covering every symbol the encoder can emit (DC categories 0-11,
    AC (run,size) with size 1-10, plus ZRL and EOB)."""
    from mie_spark.operators.jpeg import (
        _AC_CHROMA_BITS,
        _AC_CHROMA_VALS,
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _DC_CHROMA_BITS,
        _DC_CHROMA_VALS,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
    )

    for bits, vals in (
        (_DC_LUMA_BITS, _DC_LUMA_VALS),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ):
        t = _build_decode_table(bits, vals)
        assert sorted(t.values()) == list(range(12))
    for bits, vals in (
        (_AC_LUMA_BITS, _AC_LUMA_VALS),
        (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        t = _build_decode_table(bits, vals)
        syms = set(t.values())
        assert len(syms) == len(vals) == 162
        assert 0x00 in syms and 0xF0 in syms
        for run in range(16):
            for size in range(1, 11):
                assert (run << 4) | size in syms


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        jpeg_from_array(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        jpeg_from_array(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        jpeg_from_array(np.zeros((4, 4), np.uint8), subsampling="422")


def test_pillow_cross_check():
    """Where Pillow exists, its decode of our bytes must agree with
    ours (small tolerance: IDCT implementations legitimately differ by
    a count or two)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    src = _smooth(33, 47)
    for sub in ("444", "420"):
        enc = jpeg_from_array(src, quality=90, subsampling=sub)
        with Image.open(io.BytesIO(enc)) as im:
            theirs = np.asarray(im.convert("RGB"))
        _, _, ours = parse_jpeg(enc)
        assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 3, sub


# ---------------------------------------------------------------- spark side
def test_resize_images_auto_handles_jpeg(spark):
    """codec='auto' with a mixed PNG + JPEG batch: the JPEG payload
    decodes through the stdlib baseline decoder and comes back as a
    PNG at the target size with nearest-neighbor-gathered pixels."""
    from mie_spark.operators.multimodal import (
        parse_png,
        png_from_array,
        resize_images,
    )

    src = _smooth(24, 20)
    df = spark.createDataFrame(
        [
            (1, bytearray(jpeg_from_array(src, quality=95))),
            (2, bytearray(png_from_array(src))),
        ],
        ["asset_id", "payload"],
    )
    rows = {r["asset_id"]: r for r in resize_images(df, 5, 6, codec="auto").collect()}
    assert set(rows) == {1, 2}
    ys = (np.arange(6) * 24) // 6
    xs = (np.arange(5) * 20) // 5
    for aid in (1, 2):
        w, h, back = parse_png(bytes(rows[aid]["payload"]))
        assert (w, h) == (5, 6)
    # the PNG row is lossless, so it must equal the gather exactly
    _, _, png_back = parse_png(bytes(rows[2]["payload"]))
    assert np.array_equal(png_back, src[ys][:, xs])
    # the JPEG row is lossy: bounded error against the same gather
    _, _, jpg_back = parse_png(bytes(rows[1]["payload"]))
    assert np.abs(jpg_back.astype(int) - src[ys][:, xs].astype(int)).max() <= 12
