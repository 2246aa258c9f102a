"""Pure-stdlib GIF codec (GIF87a/89a, LZW) — extends the real-decode
path (functions/imagecodec.py) to the last stbi image format the
sandbox can express (main_cli.cpp:157 loads GIF via stb_image;
stb_image.h:427).

Coverage:

- decode: first frame of a GIF87a/89a stream — logical screen
  descriptor, global and local color tables, extension blocks (skipped
  by their sub-block chains), variable-width LSB-first LZW with CLEAR /
  EOI handling and the deferred-clear (full-dictionary) case, and
  four-pass interlace reordering.  Output is (h, w) uint8 gray via
  palette -> RGB -> stb's integer luma ((77 r + 150 g + 29 b) >> 8,
  stb_image.h:1748) — the same collapse every other decoder here uses.
  Animated streams decode to their FIRST image (the stbi_load
  contract); malformed input returns None (per-file tolerance,
  main_cli.cpp:438-477).
- encode: one frame, global palette, optional interlace — used by
  datagen, pytest roundtrips, and the ``palette_roundtrip`` oracle
  (GIF is lossless over indexed pixels, so the oracle replays the
  palette-luma closed form exactly, the E43 pattern).
"""

from __future__ import annotations

import struct

import numpy as np


def _luma_rgb(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


# ---------------------------------------------------------------- LZW


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width (LSB-first), CLEAR resets
    the dictionary, EOI terminates; dictionary caps at 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for v in indices.reshape(-1):
        sym = bytes([int(v)])
        cand = prev + sym
        if cand in table:
            prev = cand
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = sym
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int):
    """Inverse of _lzw_compress; returns a list of palette indices or
    None on malformed codes.  Stops at EOI or when n_expected pixels
    have been produced (tolerant of missing EOI, like stb)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n:
                return bytes(out) if out else None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                return None
            entry = table[code]
        elif code < len(table) and (table[code] or code < clear):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


# ------------------------------------------------------------- encode


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """indices (h, w) uint8 + palette (256, 3) uint8 -> GIF89a bytes."""
    h, w = indices.shape
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    px = indices
    if interlace:
        order = _interlace_rows(h)
        px = indices[order]
    # image descriptor
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    min_code = 8
    out.append(min_code)
    lzw = _lzw_compress(px, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _interlace_rows(h: int) -> np.ndarray:
    """GIF interlace pass order: rows 0,8,16... then 4,12..., 2,6...,
    1,3,5... — the order rows are STORED in the stream."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    ).astype(np.int64)


# ------------------------------------------------------------- decode


def gif_header_meta(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the logical screen descriptor, or None."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (w, h)


def decode_gif(data: bytes) -> np.ndarray | None:
    """First frame -> (h, w) uint8 gray, or None (tolerance)."""
    try:
        return _decode_gif(data)
    except Exception:
        return None


def _decode_gif(data: bytes) -> np.ndarray | None:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(data) < 13:
        return None
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        if gct.shape[0] != n:
            return None
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer before any image
            return None
        if b0 == 0x21:  # extension: label + sub-block chain
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:  # not an image descriptor
            return None
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None or w == 0 or h == 0:
            return None
        min_code = data[pos]
        pos += 1
        if not (2 <= min_code <= 8):
            return None
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decompress(bytes(lzw), min_code, w * h)
        if idx is None or len(idx) < w * h:
            return None
        grid = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: invert the pass ordering
            order = _interlace_rows(h)
            out = np.empty_like(grid)
            out[order] = grid
            grid = out
        if int(grid.max()) >= pal.shape[0]:
            return None
        rgb = pal[grid]
        return _luma_rgb(rgb)
    return None
