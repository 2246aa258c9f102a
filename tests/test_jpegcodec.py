"""Baseline JPEG codec (functions/jpegcodec.py) — the stbi_load JPEG
role (main_cli.cpp:157, stb_image.h:427) expressed as a from-scratch
T.81 baseline implementation."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions.imagecodec import _luma, decode_image
from mediaduplicatefinder_spark.functions.jpegcodec import (
    K_LUMA_Q,
    decode_jpeg,
    encode_jpeg,
    jpeg_header_meta,
    scaled_quant_table,
)


def _closed_form(v: np.ndarray, q00: int) -> np.ndarray:
    """Decoded value of a constant-v 8x8 block (module docstring)."""
    s = v.astype(np.int64) - 128
    k = np.sign(8 * s) * np.floor(np.abs(8 * s) / q00 + 0.5 + 1e-9)
    return np.clip(
        np.floor(k * q00 / 8.0 + 128 + 0.5 + 1e-6), 0, 255
    ).astype(np.int64)


@pytest.mark.parametrize("quality", [5, 25, 50, 75, 85, 95, 100])
@pytest.mark.parametrize("fmt", ["gray", "rgb444", "rgb420"])
def test_constant_block_closed_form(quality, fmt):
    # block-constant images decode to an exact closed form: every AC
    # coefficient quantizes to zero, DC follows the quantizer formula;
    # achromatic RGB keeps chroma at exactly 128 -> same closed form
    q00 = int(scaled_quant_table(K_LUMA_Q, quality)[0, 0])
    v = (7919 + 31 * np.arange(3)[:, None] + 5 * np.arange(4)[None, :]) % 256
    img = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint8)
    if fmt == "gray":
        data = encode_jpeg(img, quality)
    else:
        rgb = np.stack([img] * 3, axis=-1)
        data = encode_jpeg(rgb, quality, "444" if fmt == "rgb444" else "420")
    got = decode_jpeg(data)
    expected = np.repeat(np.repeat(_closed_form(v, q00), 8, 0), 8, 1)
    assert got is not None
    assert np.array_equal(got.astype(np.int64), expected)


def test_gradient_near_lossless_high_quality():
    img = (np.add.outer(np.arange(24), np.arange(40)) * 2 % 256).astype(
        np.uint8
    )
    got = decode_jpeg(encode_jpeg(img, 95))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_noise_bounded_error_q100():
    # q100 quant tables are all ones: error is pure DCT round-trip
    # rounding, bounded by a couple of grey levels even on noise
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (17, 31)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, 100))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_non_multiple_of_8_and_mcu_crop():
    # odd sizes exercise edge-replicate padding + crop on decode, for
    # both the 8-pixel (gray/444) and 16-pixel (420) grids
    rng = np.random.RandomState(11)
    for shape, fmt, sub in [
        ((9, 15), "gray", None),
        ((17, 23, 3), "rgb", "444"),
        ((17, 23, 3), "rgb", "420"),
        ((1, 1), "gray", None),
        ((8, 1), "gray", None),
    ]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        data = (
            encode_jpeg(img, 90)
            if fmt == "gray"
            else encode_jpeg(img, 90, sub)
        )
        got = decode_jpeg(data)
        assert got is not None and got.shape == shape[:2], (shape, sub)


def test_restart_intervals_do_not_change_pixels():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, 90))
    for ri in (1, 2, 3, 5, 7):
        got = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
        assert np.array_equal(got, plain), ri
    rgb = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(rgb, 80, "420"))
    b = decode_jpeg(encode_jpeg(rgb, 80, "420", restart_interval=2))
    assert np.array_equal(a, b)


def test_achromatic_rgb_matches_stb_luma():
    # constant-colour RGB: decoded gray equals the stb luma of the
    # decoded RGB, and for grey input equals the input value at q>=95
    rgb = np.full((16, 16, 3), 173, np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, 95, "420"))
    assert int(got[0, 0]) == int(_luma(rgb.astype(np.int64))[0, 0]) == 173


def test_header_meta_and_dispatch():
    img = np.zeros((12, 34), np.uint8)
    data = encode_jpeg(img, 85)
    assert jpeg_header_meta(data) == (34, 12, 1)
    rgb = np.zeros((5, 6, 3), np.uint8)
    assert jpeg_header_meta(encode_jpeg(rgb, 85, "420")) == (6, 5, 3)
    # imagecodec dispatcher routes by signature
    assert np.array_equal(decode_image(data), decode_jpeg(data))


def test_determinism():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    assert encode_jpeg(img, 77, "420") == encode_jpeg(img, 77, "420")
    a = decode_jpeg(encode_jpeg(img, 77, "420"))
    b = decode_jpeg(encode_jpeg(img, 77, "420"))
    assert np.array_equal(a, b)


def test_tolerance_rejects():
    img = np.zeros((16, 16), np.uint8)
    data = encode_jpeg(img, 85)
    assert decode_jpeg(b"junk") is None
    assert decode_jpeg(data[:40]) is None  # truncated mid-header
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # empty
    # a baseline stream relabeled SOF2 carries an ILLEGAL progressive
    # scan header (Ss=0 with Se=63) -> reject, not a crash
    i = data.index(b"\xff\xc0")
    prog = data[:i] + b"\xff\xc2" + data[i + 2 :]
    assert decode_jpeg(prog) is None
    # 12-bit precision reject
    j = data.index(b"\xff\xc0") + 4
    twelve = data[:j] + bytes([12]) + data[j + 1 :]
    assert decode_jpeg(twelve) is None


def test_jpeg_in_media_path(spark):
    """Mixed JPEG/PNG/BMP rows through decode_media_meta and
    media_dup_pairs — the VERDICT round-3 'done =' criterion."""
    from mediaduplicatefinder_spark.functions.imagecodec import (
        encode_bmp,
        encode_png,
    )
    from mediaduplicatefinder_spark.operators.multimodal import (
        decode_media_meta,
        media_dup_pairs,
        media_pixel_hashes,
    )

    rng = np.random.RandomState(13)
    base = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    near = base.copy()
    near[0, 0] ^= 1
    far = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    rgb = rng.randint(0, 256, (16, 20, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(base, 100))),  # JPEG of base
        (2, bytearray(encode_png(near, 2))),  # PNG of near-identical
        (3, bytearray(encode_jpeg(far, 90, restart_interval=3))),
        (4, bytearray(encode_jpeg(rgb, 85, "420"))),
        (5, bytearray(encode_bmp(rgb))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    meta = {r.media_id: r for r in decode_media_meta(df).collect()}
    assert meta[1].kind == "image" and (meta[1].width, meta[1].height) == (32, 32)
    assert meta[4].kind == "image" and (meta[4].width, meta[4].height) == (20, 16)
    assert all(meta[i].valid for i in (1, 2, 3, 4, 5))

    hashes = {r.media_id: r for r in media_pixel_hashes(df).collect()}
    assert all(hashes[i].hash_valid for i in (1, 2, 3, 4, 5))

    # q100 JPEG of base vs PNG of near: pixels differ by <=2 grey
    # levels -> perceptual hashes land within the dup threshold; the
    # unrelated image does not pair with either
    pairs = {(r.media_a, r.media_b) for r in media_dup_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # JPEG(420) and BMP of the same RGB frame pair up too
    assert (4, 5) in pairs


# --------------------------------------------- progressive (SOF2, r4)


@pytest.mark.parametrize("quality", [30, 60, 85, 95])
@pytest.mark.parametrize(
    "shape,fmt",
    [((16, 24), "gray"), ((17, 23), "gray"), ((16, 16), "444"),
     ((23, 31), "444"), ((32, 24), "420"), ((19, 21), "420")],
)
def test_progressive_equals_baseline(shape, fmt, quality):
    # the successive-approximation pair (Al=1 -> 0) reconstructs every
    # coefficient exactly, so progressive decode == baseline decode of
    # the SAME image bit-for-bit
    from mediaduplicatefinder_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(sum(shape) + quality)
    if fmt == "gray":
        img = rng.randint(0, 256, shape).astype(np.uint8)
        sub = "444"
    else:
        img = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        sub = fmt
    base = decode_jpeg(encode_jpeg(img, quality, sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality, sub))
    assert prog is not None
    assert np.array_equal(base, prog)


def test_progressive_eobrun_heavy():
    # a constant image quantizes to all-zero AC in every block: the AC
    # first scans are one long EOB run (EOBn with r > 0), and the
    # refinement scans are EOB runs with zero correction bits
    from mediaduplicatefinder_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    img = np.full((64, 80), 200, np.uint8)  # 80 blocks -> EOB6 coding
    got = decode_jpeg(encode_jpeg_progressive(img, 85))
    q00 = int(scaled_quant_table(K_LUMA_Q, 85)[0, 0])
    exp = _closed_form(np.full((64, 80), 200), q00)
    assert np.array_equal(got.astype(np.int64), exp)


def test_progressive_closed_form_all_fmts():
    from mediaduplicatefinder_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    v = np.array([[0, 31, 93], [200, 255, 128]], dtype=np.int64)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint8)
    q00 = int(scaled_quant_table(K_LUMA_Q, 75)[0, 0])
    exp = np.repeat(np.repeat(_closed_form(v, q00), 8, 0), 8, 1)
    for sub in ("444", "420"):
        rgb = np.stack([img] * 3, axis=-1)
        got = decode_jpeg(encode_jpeg_progressive(rgb, 75, sub))
        assert np.array_equal(got.astype(np.int64), exp), sub
    got = decode_jpeg(encode_jpeg_progressive(img, 75))
    assert np.array_equal(got.astype(np.int64), exp)


def test_progressive_header_meta_and_truncation():
    from mediaduplicatefinder_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    data = encode_jpeg_progressive(img, 80, "420")
    assert jpeg_header_meta(data) == (40, 24, 3)
    assert decode_image(data) is not None  # dispatch covers SOF2
    # truncation inside a later scan -> tolerance None, never a crash
    assert decode_jpeg(data[: int(len(data) * 0.7)]) is None


# ------------------------------------- 4:2:2 / 4:4:0 sampling (r4)


@pytest.mark.parametrize("sub", ["422", "440"])
def test_anisotropic_sampling_closed_form(sub):
    # the decoder's h!=v upsampling paths, exercised via the encoder's
    # box-averaged chroma layouts; achromatic block-constant images hit
    # the same DC closed form as 444/420
    v = np.array([[10, 200, 77], [99, 31, 128]], dtype=np.int64)
    img = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    q00 = int(scaled_quant_table(K_LUMA_Q, 80)[0, 0])
    exp = np.repeat(np.repeat(_closed_form(v, q00), 8, 0), 8, 1)
    got = decode_jpeg(encode_jpeg(rgb, 80, sub))
    assert np.array_equal(got.astype(np.int64), exp)


@pytest.mark.parametrize("sub", ["422", "440"])
@pytest.mark.parametrize("shape", [(16, 16), (17, 23), (9, 30)])
def test_anisotropic_progressive_equals_baseline(sub, shape):
    from mediaduplicatefinder_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(sum(shape))
    rgb = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(rgb, 80, sub))
    prog = decode_jpeg(encode_jpeg_progressive(rgb, 80, sub))
    assert prog is not None and np.array_equal(base, prog)


def test_anisotropic_mcu_shapes():
    # 422 MCUs are 16x8, 440 are 8x16: odd sizes force partial MCUs in
    # exactly one dimension each
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (15, 17, 3)).astype(np.uint8)
    for sub in ("422", "440"):
        got = decode_jpeg(encode_jpeg(rgb, 90, sub))
        assert got is not None and got.shape == (15, 17)
