"""Pure-stdlib baseline JPEG codec — closes the last effort-bound
format gap behind the real-decode path (operators/multimodal.py).

The reference loads images with ``stbi_load(path, &w, &h, &c, 1)``
(main_cli.cpp:157); stb_image's JPEG support (stb_image.h:427) covers
baseline sequential JFIF. Real crawl image payloads are overwhelmingly
JPEG, so PNG/BMP-only decode (functions/imagecodec.py) left the most
common container behind the documented tolerance raise. This module
implements the baseline-sequential subset of ITU-T T.81 (the public
JPEG spec) from scratch: Annex K quantization + Huffman tables, Annex C
canonical code construction, Annex F sequential decoding, and an
orthonormal separable 8x8 DCT/IDCT via a single precomputed basis
matrix (batched einsum over all blocks — the per-block work is numpy,
only the entropy decode is a Python loop over symbols).

Coverage:

- decode: baseline sequential (SOF0/1) AND progressive (SOF2, round 4
  — T.81 Annex G huffman: multi-scan accumulation, spectral selection,
  successive approximation with DC/AC first + refinement passes,
  EOB-run coding, interleaved and non-interleaved scans), 8-bit, 1 or
  3 components, sampling factors h,v in {1,2} (4:4:4 / 4:2:2 / 4:4:0 /
  4:2:0), restart intervals (DRI/RSTn), byte stuffing, APPn/COM skip.
  Arithmetic coding, 12-bit, lossless/hierarchical, and >2 sampling
  factors return None — the same per-file tolerance branch as the
  PNG/BMP edge formats (main_cli.cpp:438-477).
- encode: baseline grayscale or YCbCr at ALL four layouts the decoder
  covers (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 — chroma box-averaged by the
  luma sampling factors), quality-scaled Annex K tables (the IJG
  ``jpeg_quality_scaling`` formula, public libjpeg semantics), used by
  datagen, pytest roundtrips, and the ``jpeg_roundtrip`` oracle query; plus ``encode_jpeg_progressive``
  (fixed SOF2 scan script, libjpeg-style refinement-bit bookkeeping)
  whose successive-approximation pair reconstructs every coefficient
  exactly — progressive encode->decode == baseline encode->decode
  bit-for-bit, the invariant the tests pin.

Determinism / oracle contract: JPEG is lossy, so the SQL oracle cannot
replay an arbitrary decode — but for an image that is CONSTANT on each
8x8 block, every AC coefficient is zero and the decoded block value is
the closed form

    k = round_half_away(8*(v-128) / q00)        (DC quantization)
    d = clamp(floor(k*q00/8 + 128 + 0.5), 0, 255)

with q00 the quality-scaled DC quant value. Both roundings carry a tiny
(+1e-9 / +1e-6) tie margin, applied identically here and in the SQL
twin, so IEEE float noise from the matrix DCT (~1e-12) can never flip a
floor() against the closed form. The margins only affect values within
1e-6 of a rounding boundary — far below visual or hash significance —
and make the decode bit-deterministic across platforms.

Gray collapse for 3-component images matches the PNG path: YCbCr ->
RGB (floor(x+0.5), clamp), then stb_image's integer luma
``(77 r + 150 g + 29 b) >> 8`` (stb_image.h:1748) via imagecodec._luma.
"""

from __future__ import annotations

import struct

import numpy as np

# quantization ties: see module docstring — identical margins in the
# SQL oracle keep floor() decisions bit-stable against float noise
_Q_TIE = 1e-9
_PIX_TIE = 1e-6

# ITU-T T.81 Annex K.1 — example luminance/chrominance quantization
# tables (row-major, natural order)
K_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
K_CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 — typical Huffman tables: (BITS[1..16], HUFFVAL)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    # fmt: off
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    # fmt: on
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    # fmt: off
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    # fmt: on
)

# zigzag scan order (T.81 fig. 5): _ZIGZAG[i] = natural index of the
# i-th zigzag position
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)  # fmt: skip

# orthonormal DCT-II basis: _C[k, n] = s_k * cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def quality_scale(quality: int) -> int:
    """IJG jpeg_quality_scaling: quality 1..100 -> table scale %."""
    quality = min(100, max(1, int(quality)))
    return 5000 // quality if quality < 50 else 200 - quality * 2


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG table scaling: t = clamp((base*scale + 50) // 100, 1, 255)."""
    scale = quality_scale(quality)
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _round_half_away_margin(x: np.ndarray) -> np.ndarray:
    """Quantizer rounding: sign(x) * floor(|x| + 0.5 + tie margin)."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5 + _Q_TIE)).astype(np.int64)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients (orthonormal)."""
    return np.einsum("kr,nrc,lc->nkl", _C, blocks, _C, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients -> (n, 8, 8) spatial (orthonormal)."""
    return np.einsum("rk,nkl,cl->nrc", _C.T, coefs, _C.T, optimize=True)


# ------------------------------------------------------------- huffman


class _HuffTable:
    """Canonical Huffman table per T.81 Annex C (build) / F.2.2 (decode):
    mincode/maxcode/valptr arrays indexed by code length."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(bits) != 16 or sum(bits) != len(huffval):
            raise ValueError("malformed huffman spec")
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1
        # encoder view: symbol -> (code, length)
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[huffval[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers
    (leaving ``self.marker`` set), pads with 1-bits past the end."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            code = (code << 1) | self.read_bit()
            length += 1
            if length > 16:
                raise ValueError("bad huffman code")
        return table.huffval[table.valptr[length] + code - table.mincode[length]]

    def restart(self) -> None:
        """Byte-align and swallow an RSTn marker (F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.marker = None
                return
            p += 1
        raise ValueError("missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    """Bit category of a signed value (0 for 0)."""
    return int(abs(v)).bit_length()


# Progressive AC table: the Annex K tables lack the EOBn symbols
# (0x10..0xE0) progressive EOB-run coding needs, so progressive scans
# use this flat canonical table — every (r, s) symbol for s 0..10 at
# code length 9 (176 symbols, max code 175 < 511: spec-legal, no
# all-ones code).  Not rate-optimal; correctness-only, same as the
# fixed Annex K choice for baseline.
_PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for s in range(11) for r in range(16)],
)


# ------------------------------------------------------------- encoder


def _to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range YCbCr, floor(x+0.5) clamp per channel."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    clamp = lambda x: np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
    return clamp(y), clamp(cb), clamp(cr)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


# encoder sampling layouts: subsampling name -> luma (h, v) factors
_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}


def _comps_for(gray: bool, subsampling: str) -> list[tuple[int, int, int, int]]:
    """(id, h, v, qtab) per component for the encoder layouts."""
    if gray:
        return [(1, 1, 1, 0)]
    if subsampling not in _SUBSAMPLING:
        raise ValueError("subsampling must be one of 444/422/440/420")
    yh, yv = _SUBSAMPLING[subsampling]
    return [(1, yh, yv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]


def _encoder_planes(
    img: np.ndarray, gray: bool, subsampling: str, hmax: int, vmax: int
) -> list[np.ndarray]:
    """Y/Cb/Cr planes for the chosen layout: luma padded to the MCU
    grid, chroma box-averaged by the luma factors (floor(x+0.5))."""
    if gray:
        return [img]
    y, cb, cr = _to_ycbcr(img)
    if subsampling == "444":
        return [y, cb, cr]
    yp = _pad_edge(y, 8 * vmax, 8 * hmax)

    def sub(p: np.ndarray) -> np.ndarray:
        pf = _pad_edge(p, 8 * vmax, 8 * hmax).astype(np.float64)
        acc = np.zeros((pf.shape[0] // vmax, pf.shape[1] // hmax))
        for i in range(vmax):
            for j in range(hmax):
                acc += pf[i::vmax, j::hmax]
        return np.clip(
            np.floor(acc / (vmax * hmax) + 0.5), 0, 255
        ).astype(np.uint8)

    return [yp, sub(cb), sub(cr)]


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) uint8 -> (n_blocks, 64) zigzagged quantized coefficients."""
    blocks = _plane_blocks(plane).astype(np.float64) - 128.0
    coefs = _fdct_blocks(blocks)
    q = _round_half_away_margin(coefs / qtab[None, :, :])
    return q.reshape(-1, 64)[:, _ZZ]


def _encode_block(
    bw: _BitWriter, zz: np.ndarray, pred: int, dc_tab: _HuffTable, ac_tab: _HuffTable
) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_tab.codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab.codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = _category(v)
        c, l = ac_tab.codes[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        c, l = ac_tab.codes[0x00]  # EOB
        bw.write(c, l)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder. ``img`` is (h, w) gray uint8 or (h, w, 3)
    RGB uint8; ``subsampling`` '444' or '420' (3-component only);
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    lq = scaled_quant_table(K_LUMA_Q, quality)
    cq = scaled_quant_table(K_CHROMA_Q, quality)
    dc_l, ac_l = _HuffTable(*K_DC_LUMA), _HuffTable(*K_AC_LUMA)
    dc_c, ac_c = _HuffTable(*K_DC_CHROMA), _HuffTable(*K_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"  # id, version 1.1, units 0
        + struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    )

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">HB", 67, tid)
            + bytes(int(x) for x in tab.reshape(64)[_ZZ])
        )

    out += dqt(0, lq)
    if not gray:
        out += dqt(1, cq)

    comps = _comps_for(gray, subsampling)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tclass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, K_DC_LUMA) + dht(1, 0, K_AC_LUMA)
    if not gray:
        out += dht(0, 1, K_DC_CHROMA) + dht(1, 1, K_AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # SOS
    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        sos += struct.pack(">BB", cid, (tq << 4) | tq)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = _encoder_planes(img, gray, subsampling, hmax, vmax)

    # per component: pad to its 8-multiple, quantize all blocks. The 420
    # Y plane was already padded to the 16-pixel MCU grid above, and the
    # subsampled chroma halves land on 8-multiples by construction, so a
    # plain pad-to-8 covers every layout.
    comp_zz = []
    comp_bw = []  # blocks-per-row
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        padded = _pad_edge(plane, 8, 8)
        zz = _quantize_plane(padded, lq if tq == 0 else cq)
        comp_zz.append(zz)
        comp_bw.append(padded.shape[1] // 8)

    bw = _BitWriter()
    preds = [0] * len(comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        row = my * cv + by
                        col = mx * ch + bx
                        idx = row * comp_bw[ci] + col
                        preds[ci] = _encode_block(
                            bw,
                            comp_zz[ci][idx],
                            preds[ci],
                            dc_l if tq == 0 else dc_c,
                            ac_l if tq == 0 else ac_c,
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Progressive (SOF2) JFIF encoder — T.81 Annex G, huffman coding.

    Fixed scan script, chosen to exercise every progressive decode
    path: interleaved DC first scan at Al=1, per-component AC first
    scans split into two spectral bands (1-5, 6-63) at Al=1 (EOB-run
    coded), a DC refinement scan, then per-component full-band AC
    refinement scans to Al=0 (correction bits + newly-significant
    insertion).  The successive-approximation pair (Al=1 -> 0)
    reconstructs every coefficient EXACTLY, so a progressive
    encode->decode equals the baseline encode->decode of the same
    image bit-for-bit — the roundtrip invariant the tests and the
    oracle query pin."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    lq = scaled_quant_table(K_LUMA_Q, quality)
    cq = scaled_quant_table(K_CHROMA_Q, quality)
    dc_l, dc_c = _HuffTable(*K_DC_LUMA), _HuffTable(*K_DC_CHROMA)
    ac_p = _HuffTable(*_PROG_AC_SPEC)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">HB", 67, tid)
            + bytes(int(x) for x in tab.reshape(64)[_ZZ])
        )

    out += dqt(0, lq)
    if not gray:
        out += dqt(1, cq)

    comps = _comps_for(gray, subsampling)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def dht(tclass: int, tid: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, K_DC_LUMA) + dht(1, 0, _PROG_AC_SPEC)
    if not gray:
        out += dht(0, 1, K_DC_CHROMA)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = _encoder_planes(img, gray, subsampling, hmax, vmax)

    comp_zz = []
    comp_bw = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        padded = _pad_edge(plane, 8, 8)
        comp_zz.append(_quantize_plane(padded, lq if tq == 0 else cq))
        comp_bw.append(padded.shape[1] // 8)

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def sos_header(sel: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(sel)])
        for cid, td, ta in sel:
            body += struct.pack(">BB", cid, (td << 4) | ta)
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # ---- scan 1: interleaved DC first, Al=1 (point transform = >> 1)
    out += sos_header([(c[0], 0 if c[3] == 0 else 1, 0) for c in comps], 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct = dc_l if tq == 0 else dc_c
                for by in range(cv):
                    for bx in range(ch):
                        idx = (my * cv + by) * comp_bw[ci] + (mx * ch + bx)
                        dc = int(comp_zz[ci][idx][0]) >> 1  # floor shift
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = _category(diff)
                        c, l = dct.codes[t]
                        bw.write(c, l)
                        if t:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
    bw.flush()
    out += bw.out

    def comp_scan_blocks(ci):
        """Non-interleaved block index iterator (A.2.2 grid)."""
        _, ch, cv, _ = comps[ci]
        bw_s = -(-(-(-w * ch // hmax)) // 8)
        bh_s = -(-(-(-h * cv // vmax)) // 8)
        for row in range(bh_s):
            for col in range(bw_s):
                yield row * comp_bw[ci] + col

    # ---- AC first scans: two spectral bands per component, Al=1
    for ci in range(len(comps)):
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([(comps[ci][0], 0, 0)], ss, se, 0, 1)
            bw = _BitWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    c, l = ac_p.codes[r << 4]
                    bw.write(c, l)
                    if r:
                        bw.write(eobrun - (1 << r), r)
                    eobrun = 0

            for idx in comp_scan_blocks(ci):
                band = comp_zz[ci][idx][ss : se + 1]
                # point transform: truncate |c| (G.1.2.2)
                tvals = [
                    (int(v) >> 1) if v >= 0 else -((-int(v)) >> 1)
                    for v in band
                ]
                if not any(tvals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                last_nz = max(i for i, v in enumerate(tvals) if v)
                for i, v in enumerate(tvals):
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        c, l = ac_p.codes[0xF0]
                        bw.write(c, l)
                        r -= 16
                    s = _category(v)
                    c, l = ac_p.codes[(r << 4) | s]
                    bw.write(c, l)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                    if i == last_nz:
                        break
                if last_nz < len(tvals) - 1:
                    eobrun += 1
            flush_eob()
            bw.flush()
            out += bw.out

    # ---- DC refinement scan: one appended bit per block, Al=0
    out += sos_header([(c[0], 0, 0) for c in comps], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        idx = (my * cv + by) * comp_bw[ci] + (mx * ch + bx)
                        bw.write(int(comp_zz[ci][idx][0]) & 1, 1)
    bw.flush()
    out += bw.out

    # ---- AC refinement scans: full band 1-63, Ah=1 -> Al=0.
    # Correction-bit bookkeeping follows libjpeg's encode_mcu_AC_refine
    # two-segment buffer: ``be_bits`` are correction bits belonging to
    # pending EOB-run blocks (emitted right after the EOBn symbol);
    # ``br_bits`` are the current block's bits since the last emitted
    # symbol (emitted right after the NEXT symbol — that is the order
    # the decoder's advance loop consumes them in).  ZRLs are emitted
    # at each 16-zero-history window boundary, and only while a
    # newly-significant coefficient remains in the block (otherwise the
    # tail folds into the EOB run).
    for ci in range(len(comps)):
        out += sos_header([(comps[ci][0], 0, 0)], 1, 63, 1, 0)
        bw = _BitWriter()
        eobrun = 0
        be_bits: list[int] = []
        br_bits: list[int] = []

        def emit_br():
            for b in br_bits:
                bw.write(b, 1)
            br_bits.clear()

        def flush_eob_r():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                c, l = ac_p.codes[r << 4]
                bw.write(c, l)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0
                for b in be_bits:
                    bw.write(b, 1)
                be_bits.clear()

        for idx in comp_scan_blocks(ci):
            band = [int(v) for v in comp_zz[ci][idx][1:64]]
            eobpos = max(
                (i for i, v in enumerate(band) if abs(v) == 1), default=-1
            )
            r = 0
            for i, v in enumerate(band):
                a = abs(v)  # t = |c| >> Al with Al = 0
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eobpos:
                    flush_eob_r()
                    c, l = ac_p.codes[0xF0]
                    bw.write(c, l)
                    emit_br()
                    r -= 16
                if a > 1:  # history coefficient: buffer its bit
                    br_bits.append(a & 1)
                    continue
                # newly significant (|c| == 1)
                flush_eob_r()
                c, l = ac_p.codes[(r << 4) | 1]
                bw.write(c, l)
                bw.write(1 if v > 0 else 0, 1)
                emit_br()
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                be_bits.extend(br_bits)
                br_bits.clear()
                if eobrun == 0x7FFF:
                    flush_eob_r()
        flush_eob_r()
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder


def jpeg_header_meta(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_components) from SOF0/SOF2, or None."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            if pos + 10 > len(data):
                return None
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return (w, h, data[pos + 9])
        if marker == 0xD9 or marker == 0xDA:
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + seglen
    return None


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Baseline-sequential JPEG -> (h, w) uint8 grayscale, or None for
    malformed / uncovered variants (per-file tolerance)."""
    try:
        return _decode_jpeg(data)
    except Exception:
        return None


def _decode_jpeg(data: bytes) -> np.ndarray | None:
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, ch, cv, tq)])
    progressive = False
    restart_interval = 0
    state: _ScanState | None = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            return None
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: uncovered
                vals = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = vals
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                return None
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * i]))
            if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
                return None
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # arithmetic / lossless / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            if state is None:
                state = _ScanState(frame)
            pos = _scan_entropy(
                data,
                pos + seglen,
                seg,
                state,
                htabs,
                restart_interval,
                progressive,
            )
            continue  # pos already points at the next marker
        pos += seglen
    if state is None or not state.any_scan:
        return None
    return _finish(state, qtabs)


class _ScanState:
    """Accumulated coefficient state across the scans of one frame —
    one sequential scan for SOF0, many spectral/approximation scans for
    SOF2 (T.81 Annex G)."""

    def __init__(self, frame):
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.comp_dims = []
        self.comp_coefs = []
        for cid, ch, cv, tq in comps:
            brows = self.mcus_y * cv
            bcols = self.mcus_x * ch
            self.comp_dims.append((brows, bcols))
            self.comp_coefs.append(
                np.zeros((brows * bcols, 64), dtype=np.int64)
            )
        self.any_scan = False


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next non-RST, non-stuffed marker at/after p."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("no trailing marker after scan")


def _scan_entropy(
    data, scan_start, sos, state: _ScanState, htabs, restart_interval,
    progressive,
) -> int:
    """Decode ONE entropy-coded scan into ``state``; returns the
    position of the marker that follows the scan."""
    h, w, comps = state.frame
    ns = sos[0]
    sel = []  # (ci, dc_table_id, ac_table_id)
    cid_index = {c[0]: i for i, c in enumerate(comps)}
    for i in range(ns):
        cs = sos[1 + 2 * i]
        tt = sos[2 + 2 * i]
        if cs not in cid_index:
            raise ValueError("scan selects unknown component")
        sel.append((cid_index[cs], tt >> 4, tt & 0xF))
    ss, se = sos[1 + 2 * ns], sos[2 + 2 * ns]
    ahal = sos[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if not progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("bad sequential scan header")
    else:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral range")

    br = _BitReader(data, scan_start)
    preds = [0] * len(comps)
    eob = [0]  # EOB run, shared across the scan's blocks (G.1.2.2)

    def one_block(ci, td, ta, storage_idx):
        coefs = state.comp_coefs[ci][storage_idx]
        if not progressive:
            zz = _decode_block(br, htabs[(0, td)], htabs[(1, ta)], preds, ci)
            coefs[:] = zz
        elif ss == 0 and ah == 0:  # DC first (G.1.2.1)
            t = br.decode_symbol(htabs[(0, td)])
            diff = _extend(br.receive(t), t) if t else 0
            preds[ci] += diff
            coefs[0] = preds[ci] << al
        elif ss == 0:  # DC refinement: one appended bit
            if br.read_bit():
                coefs[0] += 1 << al
        elif ah == 0:  # AC first (G.1.2.2)
            _ac_first(br, htabs[(1, ta)], coefs, ss, se, al, eob)
        else:  # AC refinement (G.1.2.3)
            _ac_refine(br, htabs[(1, ta)], coefs, ss, se, al, eob)

    if ns > 1:
        # interleaved: MCU order over the frame grid
        mcu_count = 0
        for my in range(state.mcus_y):
            for mx in range(state.mcus_x):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    br.restart()
                    preds = [0] * len(comps)
                    eob[0] = 0
                for ci, td, ta in sel:
                    _, ch, cv, _ = comps[ci]
                    bcols = state.comp_dims[ci][1]
                    for by in range(cv):
                        for bx in range(ch):
                            one_block(
                                ci,
                                td,
                                ta,
                                (my * cv + by) * bcols + (mx * ch + bx),
                            )
                mcu_count += 1
    else:
        # non-interleaved: the component's own block grid (A.2.2)
        ci, td, ta = sel[0]
        _, ch, cv, _ = comps[ci]
        comp_w = -(-w * ch // state.hmax)
        comp_h = -(-h * cv // state.vmax)
        bw_s = -(-comp_w // 8)
        bh_s = -(-comp_h // 8)
        bcols = state.comp_dims[ci][1]
        blk = 0
        for row in range(bh_s):
            for col in range(bw_s):
                if restart_interval and blk and blk % restart_interval == 0:
                    br.restart()
                    preds = [0] * len(comps)
                    eob[0] = 0
                one_block(ci, td, ta, row * bcols + col)
                blk += 1

    state.any_scan = True
    return _next_marker(data, br.pos)


def _ac_first(br, ac_tab, coefs, ss, se, al, eob):
    """Progressive AC, Ah=0: spectral band with EOB-run coding."""
    if eob[0]:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+extra blocks ending here
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coefs[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, ac_tab, coefs, ss, se, al, eob):
    """Progressive AC, Ah>0: correction bits + newly-significant
    coefficients (T.81 G.1.2.3; structured like stb_image's
    stbi__jpeg_decode_block_prog_ac refinement branch)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if br.read_bit() and not (coefs[k] & p1):
            coefs[k] += p1 if coefs[k] > 0 else m1

    if eob[0]:
        eob[0] -= 1
        for k in range(ss, se + 1):
            if coefs[k]:
                correct(k)
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if r < 15:
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.receive(r)
                # run correction bits to the band end, then the EOB run
                # covers SUBSEQUENT blocks
                while k <= se:
                    if coefs[k]:
                        correct(k)
                    k += 1
                return
            # r == 15: skip 16 zero-HISTORY coefficients
        else:
            if s != 1:
                raise ValueError("bad refinement magnitude")
            newval = p1 if br.read_bit() else m1
        while k <= se:
            if coefs[k]:
                correct(k)
            else:
                if r == 0:
                    if newval:
                        coefs[k] = newval
                    k += 1
                    break
                r -= 1
            k += 1


def _finish(state: _ScanState, qtabs) -> np.ndarray:
    """Dequantize + IDCT + upsample + color-collapse the accumulated
    coefficients."""
    h, w, comps = state.frame
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        q = qtabs[tq].reshape(64)
        nat = np.zeros_like(state.comp_coefs[ci])
        nat[:, _ZZ] = state.comp_coefs[ci] * q[None, _ZZ]
        spatial = _idct_blocks(nat.reshape(-1, 8, 8).astype(np.float64))
        pix = np.clip(
            np.floor(spatial + 128.0 + 0.5 + _PIX_TIE), 0, 255
        ).astype(np.uint8)
        brows, bcols = state.comp_dims[ci]
        plane = (
            pix.reshape(brows, bcols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(brows * 8, bcols * 8)
        )
        # upsample to full resolution by replication, crop to (h, w)
        if ch != state.hmax or cv != state.vmax:
            plane = np.repeat(
                np.repeat(plane, state.vmax // cv, 0), state.hmax // ch, 1
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    # YCbCr -> RGB (BT.601 full range), floor(x+0.5) clamp, then the
    # stb integer luma used everywhere else in the gray pipeline
    from mediaduplicatefinder_spark.functions.imagecodec import _luma

    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    clamp = lambda x: np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
    rgb = np.stack(
        [
            clamp(y + 1.402 * cr),
            clamp(y - 0.344136286 * cb - 0.714136286 * cr),
            clamp(y + 1.772 * cb),
        ],
        axis=-1,
    )
    return _luma(rgb)


def _decode_block(br: _BitReader, dc_tab, ac_tab, preds, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = br.decode_symbol(dc_tab)
    diff = _extend(br.receive(t), t) if t else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    return zz
