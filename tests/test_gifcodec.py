"""GIF/LZW codec (functions/gifcodec.py) + paletted PNG (round 4):
the last stbi image formats, now decoding for real."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions.gifcodec import (
    _interlace_rows,
    _luma_rgb,
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    encode_gif,
    gif_header_meta,
)
from mediaduplicatefinder_spark.functions.imagecodec import (
    _luma,
    decode_image,
    decode_png,
    encode_png_palette,
)

PAL = np.stack(
    [
        (3 * np.arange(256) + 7) % 256,
        (5 * np.arange(256) + 11) % 256,
        (7 * np.arange(256) + 13) % 256,
    ],
    axis=-1,
).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (13, 29), (40, 17)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(shape, interlace):
    rng = np.random.RandomState(sum(shape))
    idx = rng.randint(0, 256, shape).astype(np.uint8)
    data = encode_gif(idx, PAL, interlace=interlace)
    got = decode_gif(data)
    assert got is not None
    assert np.array_equal(got, _luma_rgb(PAL[idx]))
    assert gif_header_meta(data) == (shape[1], shape[0])


def test_gif_lzw_dict_cap_and_kwkwk():
    # tiled runs push the dictionary to 4096 (deferred clear); the
    # constant image hits the KwKwK (code == next_code) case repeatedly
    idx = np.tile(np.arange(8, dtype=np.uint8), 4096).reshape(128, 256)
    assert np.array_equal(
        decode_gif(encode_gif(idx, PAL)), _luma_rgb(PAL[idx])
    )
    const = np.zeros((50, 73), np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(const, PAL, interlace=True)),
        _luma_rgb(PAL[const]),
    )


def test_gif_lzw_primitive_roundtrip():
    rng = np.random.RandomState(5)
    for n in (1, 7, 100, 5000):
        seq = rng.randint(0, 16, n).astype(np.uint8)
        comp = _lzw_compress(seq, 4)
        out = _lzw_decompress(comp, 4, n)
        assert out is not None and np.array_equal(
            np.frombuffer(out, np.uint8), seq
        )


def test_gif_extensions_and_87a():
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_gif(idx, PAL))
    # splice a graphics-control extension before the image descriptor
    i = data.index(0x2C, 13 + 768)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(data[:i]) + gce + bytes(data[i:])
    assert np.array_equal(decode_gif(patched), _luma_rgb(PAL[idx]))
    # GIF87a magic parses identically
    assert np.array_equal(
        decode_gif(b"GIF87a" + bytes(data[6:])), _luma_rgb(PAL[idx])
    )


def test_gif_tolerance():
    idx = np.zeros((4, 4), np.uint8)
    data = encode_gif(idx, PAL)
    assert decode_gif(b"not a gif") is None
    assert decode_gif(data[:20]) is None  # truncated in color table
    assert decode_gif(b"GIF89a" + data[6:12]) is None  # no image block
    # trailer before any image descriptor
    assert decode_gif(data[:13] + PAL.tobytes() + b"\x3b") is None


def test_interlace_rows_is_permutation():
    for h in (1, 2, 7, 8, 33):
        order = _interlace_rows(h)
        assert sorted(order.tolist()) == list(range(h))


@pytest.mark.parametrize("fc", [0, 1, 2, 3, 4, "mixed"])
def test_palette_png_roundtrip(fc):
    rng = np.random.RandomState(17)
    idx = rng.randint(0, 256, (19, 23)).astype(np.uint8)
    got = decode_png(encode_png_palette(idx, PAL, fc))
    assert got is not None
    assert np.array_equal(got, _luma(PAL[idx].astype(np.int64)))


def test_palette_png_small_palette_and_reject():
    small = PAL[:5]
    idx = np.random.RandomState(3).randint(0, 5, (6, 9)).astype(np.uint8)
    got = decode_png(encode_png_palette(idx, small))
    assert np.array_equal(got, _luma(small[idx].astype(np.int64)))
    # out-of-range index vs palette -> tolerance None (corrupt stream)
    data = encode_png_palette(idx, small)
    with pytest.raises(ValueError):
        encode_png_palette(np.full((2, 2), 9, np.uint8), small)


def test_gif_and_palette_in_media_path(spark):
    from mediaduplicatefinder_spark.operators.multimodal import (
        decode_media_meta,
        media_dup_pairs,
        media_pixel_hashes,
    )

    rng = np.random.RandomState(23)
    base = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    near = base.copy()
    near[0, 0] = (near[0, 0] + 1) % 256
    rows = [
        (1, bytearray(encode_gif(base, PAL))),
        (2, bytearray(encode_png_palette(near, PAL, "mixed"))),
        (3, bytearray(encode_gif(rng.randint(0, 256, (32, 32)).astype(np.uint8), PAL, True))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r.media_id: r for r in decode_media_meta(df).collect()}
    assert all(meta[i].valid and meta[i].kind == "image" for i in (1, 2, 3))
    assert (meta[1].width, meta[1].height) == (32, 32)
    hashes = {r.media_id: r for r in media_pixel_hashes(df).collect()}
    assert all(hashes[i].hash_valid for i in (1, 2, 3))
    # GIF of base and palette-PNG of the near-identical grid pair up
    pairs = {(r.media_a, r.media_b) for r in media_dup_pairs(df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
