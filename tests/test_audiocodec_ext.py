"""Extended WAV codec coverage (G.711 mu-law/A-law, IMA ADPCM,
float64) — closes the "compressed/float audio" tolerance branch the
way tests/test_imagecodec.py closed the image one. The G.711 tables
are pinned to the ITU/libsndfile values; the block-vectorized ADPCM
decoder is checked against a scalar per-sample reference."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions import audiocodec as ac


# ------------------------------------------------------------- G.711


def test_g711_tables_pinned_to_itu_vectors():
    # libsndfile / Sun ulaw2linear, alaw2linear spot values
    assert ac.MULAW_DEC[0x00] == -32124
    assert ac.MULAW_DEC[0x80] == 32124
    assert ac.MULAW_DEC[0xFF] == 0  # positive zero
    assert ac.MULAW_DEC[0x7F] == 0  # negative zero (mu-law has two)
    assert ac.ALAW_DEC[0x00] == -5504
    assert ac.ALAW_DEC[0xAA] == 32256
    assert ac.ALAW_DEC[0x2A] == -32256
    assert ac.ALAW_DEC[0x55] == -8
    assert ac.ALAW_DEC[0xD5] == 8
    # mu-law is odd-symmetric: complementing the sign bit negates
    u = np.arange(256)
    assert np.array_equal(
        ac.MULAW_DEC[u].astype(int), -ac.MULAW_DEC[u ^ 0x80].astype(int)
    )
    assert np.array_equal(
        ac.ALAW_DEC[u].astype(int), -ac.ALAW_DEC[u ^ 0x80].astype(int)
    )


def test_g711_encode_is_inverse_on_codebook():
    # every decodable level must encode back to a code with the same
    # decode (mu-law's two zeros make code-level bijectivity impossible)
    for tab, enc in ((ac.MULAW_DEC, ac.mulaw_encode),
                     (ac.ALAW_DEC, ac.alaw_encode)):
        dec = tab[np.arange(256)].astype(np.int16)
        assert np.array_equal(tab[enc(dec)], dec)


def test_g711_encode_quantizes_to_nearest():
    for tab, enc in ((ac.MULAW_DEC, ac.mulaw_encode),
                     (ac.ALAW_DEC, ac.alaw_encode)):
        x = np.linspace(-32768, 32767, 1001).astype(np.int16)
        got = tab[enc(x)].astype(np.int64)
        # nearest level: no other code decodes closer
        levels = np.sort(tab.astype(np.int64))
        pos = np.searchsorted(levels, x.astype(np.int64))
        pos = np.clip(pos, 1, 255)
        best = np.minimum(
            np.abs(levels[pos - 1] - x), np.abs(levels[pos] - x)
        )
        assert np.array_equal(np.abs(got - x), best)


def test_g711_wav_roundtrip_stereo_and_meta():
    codes = np.arange(512, dtype=np.uint8).reshape(-1, 2)
    for law, fmt_code, tab in (("mu", 7, ac.MULAW_DEC),
                               ("a", 6, ac.ALAW_DEC)):
        data = ac.encode_wav_g711(codes, law, 8000)
        (got_fmt,) = struct.unpack("<H", data[20:22])
        assert got_fmt == fmt_code
        rate, ch, got = ac.decode_wav(data)
        assert (rate, ch) == (8000, 2)
        assert np.array_equal(got, tab[codes])
        assert ac.wav_header_meta(data) == (8000, 2, 256)


# --------------------------------------------------------- IMA ADPCM


def _ima_ref(pred, idx, nibs):
    out = [pred]
    for d in nibs:
        d = int(d)
        step = int(ac.IMA_STEPS[idx])
        diff = step >> 3
        if d & 4:
            diff += step
        if d & 2:
            diff += step >> 1
        if d & 1:
            diff += step >> 2
        pred = pred - diff if d & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(ac.IMA_INDEX_DELTA[d])))
        out.append(pred)
    return out


def test_ima_decode_matches_scalar_reference():
    rng = np.random.RandomState(7)
    for _ in range(25):
        n = 2 * int(rng.randint(1, 60))
        nibs = rng.randint(0, 16, n).astype(np.uint8)
        pred0 = int(rng.randint(-32768, 32768))
        idx0 = int(rng.randint(0, 89))
        data = ac.encode_wav_ima(pred0, idx0, nibs, 11025)
        rate, ch, got = ac.decode_wav(data)
        assert (rate, ch) == (11025, 1)
        assert got.ravel().astype(int).tolist() == _ima_ref(
            pred0, idx0, nibs
        )
        assert ac.wav_header_meta(data) == (11025, 1, n + 1)


def test_ima_multi_block_decode_is_block_parallel():
    """Several independent blocks concatenated in one data chunk decode
    exactly as per-block scalar references — the vectorized-across-
    blocks state machine must not leak state between blocks."""
    rng = np.random.RandomState(11)
    n_nib = 16
    blocks = []
    expected = []
    for _ in range(5):
        nibs = rng.randint(0, 16, n_nib).astype(np.uint8)
        pred0 = int(rng.randint(-5000, 5000))
        idx0 = int(rng.randint(0, 89))
        one = ac.encode_wav_ima(pred0, idx0, nibs, 8000)
        # grab just this block's data-chunk body
        off = one.index(b"data") + 8
        blocks.append(one[off : off + 4 + n_nib // 2])
        expected.extend(_ima_ref(pred0, idx0, nibs))
    body = b"".join(blocks)
    block_align = 4 + n_nib // 2
    spb = 1 + n_nib
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, 8000, 8000 * block_align // spb,
        block_align, 4, 2, spb,
    )
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rate, ch, got = ac.decode_wav(data)
    assert (rate, ch) == (8000, 1)
    assert got.ravel().astype(int).tolist() == expected
    assert ac.wav_header_meta(data) == (8000, 1, 5 * spb)


def test_ima_encode_tracks_smooth_signal():
    t = np.arange(401)
    sig = (2000 * np.sin(t / 15)).astype(np.int16)
    pred0, idx0, nibs = ac.ima_adpcm_encode(sig, idx0=20)
    assert pred0 == int(sig[0]) and len(nibs) == 400
    got = ac.decode_wav(ac.encode_wav_ima(pred0, idx0, nibs, 16000))
    err = np.abs(got[2].ravel().astype(int) - sig.astype(int))
    # greedy nearest-decode quantization: bounded reconstruction error
    assert err.max() < 200


def test_ima_rejects_odd_nibble_count_and_bad_blocks():
    with pytest.raises(ValueError):
        ac.encode_wav_ima(0, 0, np.array([1, 2, 3], dtype=np.uint8))
    # block_align smaller than the channel headers -> tolerance None
    fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 4000, 2, 4, 2, 5)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4)
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    assert ac.decode_wav(data) is None


# ------------------------------------------------------------ float64


def test_float64_wav_roundtrip():
    x = np.array([-1.5, -1.0, -0.5, 0.0, 0.25, 0.999, 1.5])
    data = ac.encode_wav(x.reshape(-1, 1), 22050, 64)
    rate, ch, got = ac.decode_wav(data)
    assert (rate, ch) == (22050, 1)
    expected = np.clip(np.floor(x * 32768.0 + 0.5), -32768, 32767)
    assert np.array_equal(got.ravel().astype(int), expected.astype(int))
    assert ac.wav_header_meta(data) == (22050, 1, 7)


def test_unknown_compressed_format_stays_tolerant():
    # MPEG-layer-3-in-WAV (format 0x55) must still return None
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 8)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 2)
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    assert ac.decode_wav(data) is None
    assert ac.wav_header_meta(data) is None
