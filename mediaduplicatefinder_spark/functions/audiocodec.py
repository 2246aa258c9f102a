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
24-bit, clip(floor(f*32768+0.5)) for float).

Beyond linear PCM the telephony / RIFF-native compressed encodings
decode for real too (closing VERDICT r3's "compressed/float audio"
tolerance branch the way the JPEG work closed the image one):

- G.711 mu-law (format 7) and A-law (format 6) — the Sun
  ulaw2linear/alaw2linear segment expansions, scaled to int16 exactly
  as libsndfile's tables (mu-law ±32124, A-law ±32256);
- IMA/DVI ADPCM (format 17) — per-block 4-byte channel headers
  (predictor sample + step index), 4-bit nibbles through the standard
  step/index tables; the block state machine is vectorized ACROSS
  blocks (the sequential dependency is only within a block), so decode
  cost is O(samples_per_block) numpy steps regardless of clip length;
- IEEE float64 (format 3, 64-bit) alongside float32.

Container formats that embed non-RIFF codecs (MP3/AAC) still return
None — the per-file tolerance the image path uses.

``encode_wav`` / ``encode_wav_g711`` / ``encode_wav_ima`` are the
minimal writers datagen and the round-trip oracle queries use;
``mulaw_encode``/``alaw_encode``/``ima_adpcm_encode`` give the linear
-> code direction so tests can prove encode -> decode inversion.
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
    elif bits == 64:
        # IEEE float64 (WAVE format 3, 64-bit)
        audio_fmt = 3
        body = arr.astype("<f8").tobytes()
    else:
        raise ValueError("bits must be 8, 16, 24, 32, or 64 (float)")
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


# ------------------------------------------------------------- G.711
# Sun ulaw2linear: u' = ~u; t = ((u'&0xF)<<3 + 0x84) << ((u'>>4)&7);
# int16 = (u'&0x80) ? 0x84-t : t-0x84 — with BIAS 0x84 the result is
# already 16-bit scaled (code 0x00 -> -32124, the libsndfile table).
# Sun alaw2linear: a' = a^0x55; seg = (a'>>4)&7; m = a'&0xF;
# t = seg==0 ? m<<4|8 : (m<<4|0x108) << max(seg-1,0);
# int16 = (a'&0x80) ? t : -t (libsndfile ±32256). Both closed forms are
# mirrored verbatim in the wav_ext_roundtrip SQL oracle.


def _build_g711_tables():
    u = np.arange(256, dtype=np.int64)
    uc = 255 - u  # ~u & 0xFF
    t = (((uc & 0x0F) << 3) + 0x84) << ((uc >> 4) & 7)
    mu = np.where(uc & 0x80, 0x84 - t, t - 0x84)

    ax = u ^ 0x55
    seg = (ax >> 4) & 7
    m = ax & 0x0F
    t = np.where(
        seg == 0,
        (m << 4) + 8,
        ((m << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    al = np.where(ax & 0x80, t, -t)
    return mu.astype(np.int16), al.astype(np.int16)


MULAW_DEC, ALAW_DEC = _build_g711_tables()


def _g711_encode(samples: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Linear int16 -> code bytes by nearest-decoded-value search (the
    tables are only 256 entries; argmin over the sorted decode table is
    exact nearest-quantization, which is what the segment-search
    encoders implement)."""
    order = np.argsort(table.astype(np.int64), kind="mergesort")
    dec = table.astype(np.int64)[order]
    x = np.asarray(samples, dtype=np.int64).ravel()
    pos = np.searchsorted(dec, x)
    pos = np.clip(pos, 1, len(dec) - 1)
    left = dec[pos - 1]
    right = dec[pos]
    pick = np.where(x - left <= right - x, pos - 1, pos)
    return order[pick].astype(np.uint8).reshape(np.asarray(samples).shape)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    return _g711_encode(samples, MULAW_DEC)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    return _g711_encode(samples, ALAW_DEC)


def encode_wav_g711(
    codes: np.ndarray, law: str = "mu", sample_rate: int = 8000
) -> bytes:
    """Raw G.711 code bytes (n,) or (n, ch) -> WAV (format 7 mu / 6 A)."""
    arr = np.asarray(codes, dtype=np.uint8)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    audio_fmt = 7 if law == "mu" else 6
    body = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHHH", audio_fmt, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
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


# --------------------------------------------------------- IMA ADPCM

IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
IMA_INDEX_DELTA = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)


def _ima_step(pred, idx, nib):
    """One IMA ADPCM decode step, vectorized over an array of parallel
    block states: pred/idx/nib are same-shaped int64 arrays."""
    step = IMA_STEPS[idx]
    diff = (
        (step >> 3)
        + np.where(nib & 4, step, 0)
        + np.where(nib & 2, step >> 1, 0)
        + np.where(nib & 1, step >> 2, 0)
    )
    pred = np.clip(
        pred + np.where(nib & 8, -diff, diff), -32768, 32767
    )
    idx = np.clip(idx + IMA_INDEX_DELTA[nib], 0, 88)
    return pred, idx


def ima_adpcm_encode(samples: np.ndarray, idx0: int = 0):
    """Mono int16 samples -> (pred0, idx0, nibbles). Greedy standard
    encoder: sample 0 becomes the block-header predictor; each later
    sample picks the nibble whose decode lands nearest (the reference
    IMA encoder's quantization, expressed as argmin over the 16
    candidate decodes — exact at this block size)."""
    x = np.asarray(samples, dtype=np.int64).ravel()
    if len(x) == 0:
        raise ValueError("need at least the header sample")
    pred = np.array([x[0]], dtype=np.int64)
    idx = np.array([int(idx0)], dtype=np.int64)
    nibs = np.empty(len(x) - 1, dtype=np.uint8)
    cand = np.arange(16, dtype=np.int64)
    for i in range(1, len(x)):
        p, _ = _ima_step(
            np.repeat(pred, 16), np.repeat(idx, 16), cand
        )
        best = int(np.argmin(np.abs(p - x[i])))
        nibs[i - 1] = best
        pred, idx = _ima_step(pred, idx, np.array([best], dtype=np.int64))
    return int(x[0]), int(idx0), nibs


def encode_wav_ima(
    pred0: int,
    idx0: int,
    nibbles: np.ndarray,
    sample_rate: int = 8000,
) -> bytes:
    """Mono IMA ADPCM WAV (format 17), single block: 4-byte header
    (int16 predictor, uint8 step index, reserved 0) + packed nibbles
    (low nibble first per spec). len(nibbles) must be even (nibbles
    pack two per byte; the spec pads blocks to whole bytes)."""
    nibs = np.asarray(nibbles, dtype=np.uint8)
    if len(nibs) % 2:
        raise ValueError("nibble count must be even")
    packed = (nibs[0::2] | (nibs[1::2] << 4)).tobytes()
    block_align = 4 + len(packed)
    spb = 1 + len(nibs)
    body = struct.pack("<hBB", pred0, idx0, 0) + packed
    fmt = struct.pack(
        "<HHIIHHHH",
        17, 1, sample_rate,
        sample_rate * block_align // max(spb, 1),
        block_align, 4, 2, spb,
    )
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


def _decode_ima(body: bytes, ch: int, block_align: int, spb: int):
    """IMA ADPCM data chunk -> (n, ch) int16. The within-block sample
    recursion is sequential, but blocks are independent — so the state
    machine runs vectorized ACROSS all blocks at once (numpy loop length
    = samples per block, not total samples)."""
    if block_align < 4 * ch or ch < 1:
        return None
    n_blocks = len(body) // block_align
    if n_blocks == 0:
        return None
    raw = np.frombuffer(
        body[: n_blocks * block_align], np.uint8
    ).reshape(n_blocks, block_align)
    # per-channel 4-byte headers
    heads = raw[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred = (
        heads[:, :, 0].astype(np.int64)
        | (heads[:, :, 1].astype(np.int64) << 8)
    )
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(heads[:, :, 2].astype(np.int64), 0, 88)
    data = raw[:, 4 * ch:]
    # nibble stream per block/channel: mono is simply low-then-high per
    # byte; stereo interleaves 4-byte words per channel.
    lo = data & 0x0F
    hi = data >> 4
    nib_bytes = np.stack([lo, hi], axis=-1).reshape(n_blocks, -1)
    per_blk = nib_bytes.shape[1]
    if ch == 1:
        nibs = nib_bytes[:, None, :]  # (blocks, 1, nibbles)
    else:
        words = nib_bytes.reshape(n_blocks, -1, ch, 8)
        nibs = words.transpose(0, 2, 1, 3).reshape(n_blocks, ch, -1)
        per_blk = nibs.shape[2]
    n_nib = min(per_blk, max(spb - 1, 0)) if spb else per_blk
    out = np.empty((n_blocks, ch, n_nib + 1), dtype=np.int64)
    out[:, :, 0] = pred
    for s in range(n_nib):
        pred, idx = _ima_step(pred, idx, nibs[:, :, s].astype(np.int64))
        out[:, :, s + 1] = pred
    # (blocks, ch, samples) -> (blocks*samples, ch)
    return (
        out.transpose(0, 2, 1).reshape(-1, ch).astype(np.int16)
    )


def decode_wav(data: bytes):
    """WAV bytes -> (sample_rate, n_channels, samples (n, ch) int16) or
    None for non-PCM / malformed input. 8-bit unsigned is rescaled to
    the int16 lattice ((v - 128) << 8), the libsndfile convention."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    fmt_raw = b""
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
            fmt_raw = chunk
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
    audio_fmt, ch, rate, _bps, block, bits = fmt
    if ch < 1:
        return None
    if audio_fmt == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(
                body[: len(body) - len(body) % (4 * ch)], "<f4"
            ).astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(
                body[: len(body) - len(body) % (8 * ch)], "<f8"
            )
        else:
            return None
        # libsndfile-style float -> int16: clip(floor(f*32768 + 0.5))
        samples = (
            np.clip(np.floor(arr * 32768.0 + 0.5), -32768, 32767)
            .astype(np.int16)
            .reshape(-1, ch)
        )
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law
        if bits != 8:
            return None
        arr = np.frombuffer(body[: len(body) - len(body) % ch], np.uint8)
        table = MULAW_DEC if audio_fmt == 7 else ALAW_DEC
        samples = table[arr].reshape(-1, ch)
    elif audio_fmt == 17:  # IMA/DVI ADPCM
        if bits != 4:
            return None
        spb = (
            struct.unpack("<H", fmt_raw[18:20])[0]
            if len(fmt_raw) >= 20
            else 0
        )
        samples = _decode_ima(body, ch, block, spb)
        if samples is None:
            return None
    elif audio_fmt != 1:  # other compressed formats: per-file tolerance
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
    spb = 0
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
            if clen >= 20:
                (spb,) = struct.unpack("<H", data[pos + 26 : pos + 28])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_len is None:
        return None
    audio_fmt, ch, rate, _bps, block, bits = fmt
    if ch < 1:
        return None
    if audio_fmt == 17:
        # ADPCM: whole blocks of wSamplesPerBlock samples each
        if bits != 4 or block < 4 * ch or spb < 1:
            return None
        return rate, ch, (data_len // block) * spb
    if audio_fmt == 3:
        if bits not in (32, 64):
            return None
    elif audio_fmt in (6, 7):
        if bits != 8:
            return None
    elif audio_fmt != 1 or bits not in (8, 16, 24):
        return None
    return rate, ch, data_len // (ch * bits // 8)
