"""Pure-stdlib WAV/PCM audio codec — extends the real S9 decode path
(functions/imagecodec.py closed it for images) to the audio modality.

The reference's audio channel never decodes samples (P9 is a
name-similarity rule, main_cli.cpp:318-323), but the engine's
multimodal surface (E8-E10) carries audio payloads, and RIFF/WAVE PCM
is fully expressible with ``struct`` — so the decode stub is real code
here too: chunk walk (RIFF header, fmt / data chunks in any order,
unknown chunks skipped per spec), PCM 8-bit unsigned / 16-bit /
24-bit signed LE, IEEE float32 (format 3), and WAVE_FORMAT_EXTENSIBLE
(0xFFFE — the SubFormat code at fmt offset 24 is the real format),
mono or interleaved stereo; everything lands on the int16 lattice
with the libsndfile conventions ((v-128)<<8 for 8-bit, v>>8 for
24-bit, clip(floor(f*32768+0.5)) for float). Compressed formats
(MP3/AAC) return None — the per-file tolerance the image path uses.

``encode_wav`` is the minimal writer datagen and the round-trip oracle
query use.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """samples: (n,) mono or (n, ch) interleaved int16/uint8 ndarray."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    audio_fmt = 1
    if bits == 16:
        body = arr.astype("<i2").tobytes()
    elif bits == 8:
        body = arr.astype(np.uint8).tobytes()
    elif bits == 24:
        # int32 input holding 24-bit values; 3-byte LE packing
        i32 = arr.astype("<i4").tobytes()
        body = b"".join(
            i32[k : k + 3] for k in range(0, len(i32), 4)
        )
    elif bits == 32:
        # IEEE float32 (WAVE format 3)
        audio_fmt = 3
        body = arr.astype("<f4").tobytes()
    else:
        raise ValueError("bits must be 8, 16, 24, or 32 (float)")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, ch, sample_rate, sample_rate * block, block, bits
    )
    # RIFF chunks are word-aligned: an odd-length data chunk (8-bit mono,
    # odd sample count) carries a pad byte that is NOT counted in the
    # chunk size but IS counted in the RIFF size.
    pad = b"\x00" if len(body) % 2 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body) + len(pad))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
        + pad
    )


def decode_wav(data: bytes):
    """WAV bytes -> (sample_rate, n_channels, samples (n, ch) int16) or
    None for non-PCM / malformed input. 8-bit unsigned is rescaled to
    the int16 lattice ((v - 128) << 8), the libsndfile convention."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + clen]
        if len(chunk) != clen:
            return None
        if cid == b"fmt ":
            if clen < 16:
                return None
            fmt = struct.unpack("<HHIIHH", chunk[:16])
            if fmt[0] == 0xFFFE and clen >= 26:
                # WAVE_FORMAT_EXTENSIBLE: the SubFormat GUID's first
                # two bytes carry the real format code
                (sub,) = struct.unpack("<H", chunk[24:26])
                fmt = (sub, *fmt[1:])
        elif cid == b"data":
            body = chunk
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        return None
    audio_fmt, ch, rate, _bps, _block, bits = fmt
    if ch < 1:
        return None
    if audio_fmt == 3:  # IEEE float
        if bits != 32:
            return None
        arr = np.frombuffer(body[: len(body) - len(body) % (4 * ch)], "<f4")
        # libsndfile-style float -> int16: clip(floor(f*32768 + 0.5))
        samples = (
            np.clip(np.floor(arr.astype(np.float64) * 32768.0 + 0.5),
                    -32768, 32767)
            .astype(np.int16)
            .reshape(-1, ch)
        )
    elif audio_fmt != 1:  # compressed formats: per-file tolerance
        return None
    elif bits == 16:
        arr = np.frombuffer(body[: len(body) - len(body) % (2 * ch)], "<i2")
        samples = arr.reshape(-1, ch).astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(body[: len(body) - len(body) % ch], np.uint8)
        samples = ((arr.astype(np.int16) - 128) << 8).reshape(-1, ch)
    elif bits == 24:
        usable = len(body) - len(body) % (3 * ch)
        b3 = np.frombuffer(body[:usable], np.uint8).reshape(-1, 3)
        i32 = (
            b3[:, 0].astype(np.int32)
            | (b3[:, 1].astype(np.int32) << 8)
            | (b3[:, 2].astype(np.int32) << 16)
        )
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        samples = (i32 >> 8).astype(np.int16).reshape(-1, ch)  # high 16
    else:
        return None
    return rate, ch, samples


def wav_header_meta(data: bytes):
    """(sample_rate, n_channels, n_samples) from the chunk headers only
    — no sample materialization (PNG's png_header_meta twin)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + clen > len(data):
            return None
        if cid == b"fmt " and clen >= 16:
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
            if fmt[0] == 0xFFFE and clen >= 26:
                (sub,) = struct.unpack("<H", data[pos + 32 : pos + 34])
                fmt = (sub, *fmt[1:])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_len is None:
        return None
    audio_fmt, ch, rate, _bps, _block, bits = fmt
    if ch < 1:
        return None
    if audio_fmt == 3:
        if bits != 32:
            return None
    elif audio_fmt != 1 or bits not in (8, 16, 24):
        return None
    return rate, ch, data_len // (ch * bits // 8)
