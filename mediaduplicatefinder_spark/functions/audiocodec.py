"""Pure-stdlib WAV/PCM audio codec — extends the real S9 decode path
(functions/imagecodec.py closed it for images) to the audio modality.

The reference's audio channel never decodes samples (P9 is a
name-similarity rule, main_cli.cpp:318-323), but the engine's
multimodal surface (E8-E10) carries audio payloads, and RIFF/WAVE PCM
is fully expressible with ``struct`` — so the decode stub is real code
here too: chunk walk (RIFF header, fmt / data chunks in any order,
unknown chunks skipped per spec), PCM 16-bit signed LE and 8-bit
unsigned, mono or interleaved stereo. Compressed formats (MP3/AAC) and
float PCM return None — the per-file tolerance the image path uses.

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
    if bits == 16:
        body = arr.astype("<i2").tobytes()
    elif bits == 8:
        body = arr.astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
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
        elif cid == b"data":
            body = chunk
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        return None
    audio_fmt, ch, rate, _bps, _block, bits = fmt
    if audio_fmt != 1 or ch < 1:  # PCM only
        return None
    if bits == 16:
        arr = np.frombuffer(body[: len(body) - len(body) % (2 * ch)], "<i2")
        samples = arr.reshape(-1, ch).astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(body[: len(body) - len(body) % ch], np.uint8)
        samples = ((arr.astype(np.int16) - 128) << 8).reshape(-1, ch)
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
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_len is None:
        return None
    audio_fmt, ch, rate, _bps, _block, bits = fmt
    if audio_fmt != 1 or ch < 1 or bits not in (8, 16):
        return None
    return rate, ch, data_len // (ch * bits // 8)
