"""Stdlib-only PNG and WAV codecs — de-stubbing two of the four real
media formats in :mod:`..operators.multimodal` (VERDICT r2 item 4).

Like :mod:`.pdfcodec` (the precedent), this environment ships no media
libraries and the build contract forbids installing any, so the two
formats whose specs are fully servable by ``zlib`` + ``struct`` are
implemented from scratch:

* **PNG** (ISO 15948): reader handles 8-bit greyscale (color type 0),
  RGB (2), grey+alpha (4) and RGBA (6), all five scanline filters
  (None/Sub/Up/Average/Paeth), non-interlaced.  Palette (3), 16-bit
  depth, and Adam7 interlace raise loudly — the quarantine contract,
  same as pdfcodec's font gates.  Writer emits filter-0 rows, one
  zlib-9 IDAT: deterministic bytes for identical pixels.
* **WAV** (RIFF/WAVE): reader handles PCM 16-bit mono ``fmt ``/``data``
  chunks (skipping LIST/fact/etc.); anything else (float, ADPCM,
  multi-channel, 8/24-bit) raises.  Writer emits the canonical 44-byte
  header + LE samples: deterministic.

* **MP4** (ISO-BMFF, ISO 14496-12): the *container* is parsed for real —
  box tree walk, ``moov/trak/mdia`` hierarchy, and the full sample-table
  machinery (``stts`` timing, ``stsc`` chunk map, ``stsz`` sizes,
  ``stco``/``co64`` offsets) resolving every sample to its absolute byte
  range, exactly how a real demuxer locates frames.  The *sample
  payloads* use an uncompressed greyscale sample entry (fourcc
  ``rawg``, a standard VisualSampleEntry): entropy-coded codecs
  (``avc1``/``hev1``/…) raise loudly — H.264 entropy decode is not
  honestly implementable here, and a wrong decoder is worse than a loud
  stub.  JPEG is served by :func:`make_jpeg`/:func:`read_jpeg` below.

All lossless round-trips (``make_png``→``read_png``,
``make_wav``→``read_wav``, ``make_mp4``→``read_mp4``) are bit-exact for
supported inputs, so downstream feature stats are SQL-oracle-replayable
from the synthesis parameters alone.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def make_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (c in {1: grey, 2: grey+a,
    3: RGB, 4: RGBA}); filter 0 scanlines, single zlib-9 IDAT —
    deterministic for identical input."""
    if pixels.dtype != np.uint8:
        raise ValueError("make_png expects uint8 pixels")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count: {c}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(np.int32)
        pos += stride
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            recon = (line + prior) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                ul = int(prior[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(left, int(prior[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
        out[y] = recon.astype(np.uint8)
    return out


def read_png(b: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8.  Raises on palette/16-bit/interlaced
    images (quarantine contract) and on structural corruption."""
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type} (palette?)")
    if interlace:
        raise ValueError("PNG: Adam7 interlace not supported")
    if not idat:
        raise ValueError("PNG: no IDAT data")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * c)
    if len(raw) != expected:
        raise ValueError(f"PNG: decompressed size {len(raw)} != expected {expected}")
    return _unfilter(raw, width, height, c).reshape(height, width, c)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def make_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> canonical PCM WAV bytes (44-byte header +
    LE data); deterministic."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ---------------------------------------------------------------------------
# JPEG (ITU T.81 baseline sequential, 4:4:4)
# ---------------------------------------------------------------------------
# Public-spec constants: zigzag scan order, Annex K quantization tables, and
# Annex K "typical" Huffman tables (T.81 §K.1, §K.3).

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits[1..16], values) per Annex K.
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# Orthonormal 8-point DCT-II basis: forward coeffs = C @ block @ C.T.
_DCT_C = np.array([
    [(np.sqrt(1 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula): 1..100 -> table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, values) -> {symbol: (code, length)} per T.81 §C.2 canonical codes."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(bits, values) -> {(length, code): symbol}."""
    return {(l, c): s for s, (c, l) in _huff_encode_table(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter,
    coefs: np.ndarray,
    dc_pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    zz = coefs.reshape(-1)[_ZIGZAG].astype(np.int64)
    diff = int(zz[0]) - dc_pred
    s = _category(diff)
    bw.write(*dc_tab[s])
    if s:
        bw.write(int(diff) if diff > 0 else int(diff) + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_tab[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        bw.write(*ac_tab[(run << 4) | s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.write(*ac_tab[0x00])  # EOB
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (h, w) to 8-multiples by edge replication, return (blocks, bh, bw)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    H, W = padded.shape
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks, H // 8, W // 8


def make_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """(h, w) / (h, w, 1) greyscale or (h, w, 3) RGB uint8 -> baseline
    JFIF bytes (SOF0, 4:4:4, Annex K tables scaled by ``quality``).
    Deterministic: same pixels + quality -> same bytes."""
    if pixels.dtype != np.uint8:
        raise ValueError("make_jpeg expects uint8 pixels")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count: {c}")
    if not h or not w:
        raise ValueError("empty image")

    px = pixels.astype(np.float64)
    if c == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[:, :, 0]]

    qts = [_scaled_qt(_QT_LUM, quality)] + ([_scaled_qt(_QT_CHR, quality)] if c == 3 else [])
    dc_tabs = [_huff_encode_table(*_HUFF_DC_LUM)] + (
        [_huff_encode_table(*_HUFF_DC_CHR)] if c == 3 else []
    )
    ac_tabs = [_huff_encode_table(*_HUFF_AC_LUM)] + (
        [_huff_encode_table(*_HUFF_AC_CHR)] if c == 3 else []
    )

    # Quantized coefficient blocks per component (4:4:4 -> same grid).
    comp_blocks = []
    for ci, plane in enumerate(planes):
        blocks, bh, bw_ = _plane_blocks(plane)
        shifted = blocks - 128.0
        coefs = np.einsum("kn,ijnm,lm->ijkl", _DCT_C, shifted, _DCT_C)
        q = qts[min(ci, 1)]
        comp_blocks.append(np.round(coefs / q).astype(np.int64))

    bw2 = _BitWriter()
    preds = [0] * c
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(c):
                ti = min(ci, 1)
                preds[ci] = _encode_block(
                    bw2, comp_blocks[ci][by, bx], preds[ci], dc_tabs[ti], ac_tabs[ti]
                )
    bw2.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for ti, qt in enumerate(qts):
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([ti]) + zz)  # DQT, 8-bit precision
    comp_spec = b"".join(
        bytes([ci + 1, 0x11, min(ci, 1)]) for ci in range(c)  # id, 1x1 sampling, qt id
    )
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, c) + comp_spec)  # SOF0
    huff_defs = [(0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM)]
    if c == 3:
        huff_defs += [(0x01, _HUFF_DC_CHR), (0x11, _HUFF_AC_CHR)]
    for tc_th, (bits, values) in huff_defs:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(values))  # DHT
    scan_spec = b"".join(
        bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)]) for ci in range(c)
    )
    out += seg(0xFFDA, bytes([c]) + scan_spec + b"\x00\x3f\x00")  # SOS
    out += bw2.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs FF 00, stops at
    markers, and handles RSTn restarts (T.81 §B.2.1, §E.2.4)."""

    def __init__(self, b: bytes, pos: int) -> None:
        self.b = b
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.restart_hit = False

    def _fill(self) -> None:
        while self._n < 24:
            if self.pos >= len(self.b):
                raise ValueError("JPEG: truncated entropy stream")
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn inside _fill: defer to sync()
                    return
                else:  # a real marker (EOI etc.) ends the scan
                    return
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | byte
            self._n += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self._n < n:
            raise ValueError("JPEG: truncated entropy stream")
        v = (self._acc >> (self._n - n)) & ((1 << n) - 1)
        self._n -= n
        self._acc &= (1 << self._n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, dropping partial bits."""
        self._acc = 0
        self._n = 0
        while self.pos + 1 < len(self.b):
            if self.b[self.pos] == 0xFF and 0xD0 <= self.b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def read_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, c) uint8 (c in {1, 3}).

    Supports SOF0 8-bit 4:4:4 with restart intervals.  Progressive
    (SOF2), arithmetic coding, 12-bit, and subsampled chroma raise
    loudly — the quarantine contract."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt_id)
    restart_interval = 0
    scan_pos = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)

    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq:
                    raise NotImplementedError("JPEG: 16-bit quant tables not supported")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                (ac_tables if tc else dc_tables)[th] = _huff_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError(f"JPEG: {precision}-bit precision not supported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "JPEG: subsampled chroma not supported (4:4:4 only)"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: only baseline sequential (SOF0) supported, got SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, cmp_ in enumerate(comps) if cmp_[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0xF))
            scan_pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len

    if h is None or scan_pos is None:
        raise ValueError("JPEG: missing SOF0/SOS")
    nc = len(comps)

    br = _BitReader(b, scan_pos)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(nc)]
    preds = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                preds = [0] * nc
            for idx, dc_id, ac_id in scan_comps:
                s = br.huff(dc_tables[dc_id])
                diff = _extend(br.bits(s), s) if s else 0
                preds[idx] += diff
                zz = np.zeros(64)
                zz[0] = preds[idx]
                k = 1
                while k < 64:
                    sym = br.huff(ac_tables[ac_id])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("JPEG: AC coefficient index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coefs = np.zeros(64)
                coefs[_ZIGZAG] = zz
                block = coefs.reshape(8, 8) * qts[comps[idx][2]]
                pix = _DCT_C.T @ block @ _DCT_C + 128.0
                planes[idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
            mcu += 1

    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        out = planes[0][:, :, None]
    elif nc == 3:
        y, cb, cr = planes
        out = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    else:
        raise NotImplementedError(f"JPEG: {nc}-component images not supported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF
# ---------------------------------------------------------------------------

_RAW_VIDEO_FOURCC = b"rawg"  # uncompressed 8-bit greyscale, one sample = one frame


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def make_mp4(frames: np.ndarray, fps: int = 24) -> bytes:
    """(f, h, w) uint8 greyscale frames -> ISO-BMFF bytes.

    Real box structure throughout: ``ftyp`` + ``mdat`` (one sample per
    frame, back to back) + ``moov`` with a single ``vide`` track whose
    sample tables (stts/stsc/stsz/stco) describe the mdat layout the
    standard way.  Sample entry is the uncompressed ``rawg``
    VisualSampleEntry, so the round-trip is bit-exact.
    """
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("make_mp4 expects (f, h, w) uint8 frames")
    f, h, w = frames.shape
    if not f:
        raise ValueError("make_mp4 needs at least one frame")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2")
    samples = [frames[i].tobytes() for i in range(f)]
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    # First sample starts right after ftyp + mdat header (offsets in stco are
    # absolute file offsets).
    chunk_offset = len(ftyp) + 8

    timescale = fps  # 1 tick per frame: stts delta = 1, pts_i = i / fps
    duration = f

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)   # ctime, mtime, scale, dur
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10  # rate, volume, rsvd
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)  # matrix
        + b"\x00" * 24                                     # pre_defined
        + struct.pack(">I", 2),                            # next_track_id
    )
    tkhd = _full_box(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)        # ctime, mtime, id, rsvd, dur
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)   # rsvd, layer, group, volume
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),            # 16.16 fixed width/height
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"raw greyscale\x00",
    )
    # VisualSampleEntry (ISO 14496-12 §12.1.3): 6 reserved + data_ref_index,
    # then pre_defined/reserved, width/height, dpi, frame_count, compressor
    # name, depth, pre_defined.
    sample_entry = _box(
        _RAW_VIDEO_FOURCC,
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 8, -1),
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, f, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, f, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, f) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        btype = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"MP4: malformed box {btype!r} at {pos}")
        yield btype, body, pos + size
        pos += size


def _find_box(b: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    for btype, body, bend in _walk_boxes(b, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return body, bend
            return _find_box(b, body, bend, *path[1:])
    raise ValueError(f"MP4: missing box {b'/'.join(path).decode()}")


def read_mp4(b: bytes) -> tuple[np.ndarray, int]:
    """ISO-BMFF bytes -> ((f, h, w) uint8 frames, fps).

    Full demuxer walk: finds the ``vide`` track, resolves every sample's
    absolute byte range via stsc x stsz x stco/co64, and checks stts
    timing.  Compressed sample entries (avc1/hev1/...) raise — the
    quarantine contract, same as pdfcodec's font gates.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp")
    moov_s, moov_e = _find_box(b, 0, len(b), b"moov")

    # Find the video track: trak whose mdia/hdlr handler_type == 'vide'.
    stbl_range = mdhd_range = None
    for btype, body, bend in _walk_boxes(b, moov_s, moov_e):
        if btype != b"trak":
            continue
        try:
            mdia_s, mdia_e = _find_box(b, body, bend, b"mdia")
            hdlr_s, _ = _find_box(b, mdia_s, mdia_e, b"hdlr")
        except ValueError:
            continue
        if b[hdlr_s + 8 : hdlr_s + 12] == b"vide":
            stbl_range = _find_box(b, mdia_s, mdia_e, b"minf", b"stbl")
            mdhd_range = _find_box(b, mdia_s, mdia_e, b"mdhd")
            break
    if stbl_range is None:
        raise ValueError("MP4: no video track")
    stbl_s, stbl_e = stbl_range

    # mdhd: timescale (v0 at +12, v1 at +20).
    mdhd_s, _ = mdhd_range
    version = b[mdhd_s]
    (timescale,) = struct.unpack(
        ">I", b[mdhd_s + (20 if version == 1 else 12) :][:4]
    )

    # stsd: gate on the sample-entry fourcc, read frame geometry.
    stsd_s, stsd_e = _find_box(b, stbl_s, stbl_e, b"stsd")
    entry_type, entry_s, _ = next(_walk_boxes(b, stsd_s + 8, stsd_e))
    if entry_type != _RAW_VIDEO_FOURCC:
        raise NotImplementedError(
            f"MP4: compressed codec {entry_type.decode(errors='replace')!r} is "
            "stubbed; only the uncompressed 'rawg' sample entry decodes here"
        )
    w, h = struct.unpack(">HH", b[entry_s + 24 : entry_s + 28])

    # Sample tables.
    stts_s, _ = _find_box(b, stbl_s, stbl_e, b"stts")
    (n_stts,) = struct.unpack(">I", b[stts_s + 4 : stts_s + 8])
    deltas: list[int] = []
    for i in range(n_stts):
        cnt, delta = struct.unpack(">II", b[stts_s + 8 + 8 * i : stts_s + 16 + 8 * i])
        deltas.extend([delta] * cnt)

    stsz_s, _ = _find_box(b, stbl_s, stbl_e, b"stsz")
    uniform, n_samples = struct.unpack(">II", b[stsz_s + 4 : stsz_s + 12])
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(
            struct.unpack(f">{n_samples}I", b[stsz_s + 12 : stsz_s + 12 + 4 * n_samples])
        )

    stsc_s, _ = _find_box(b, stbl_s, stbl_e, b"stsc")
    (n_stsc,) = struct.unpack(">I", b[stsc_s + 4 : stsc_s + 8])
    stsc_rows = [
        struct.unpack(">III", b[stsc_s + 8 + 12 * i : stsc_s + 20 + 12 * i])
        for i in range(n_stsc)
    ]

    try:
        stco_s, _ = _find_box(b, stbl_s, stbl_e, b"stco")
        (n_chunks,) = struct.unpack(">I", b[stco_s + 4 : stco_s + 8])
        offsets = list(
            struct.unpack(f">{n_chunks}I", b[stco_s + 8 : stco_s + 8 + 4 * n_chunks])
        )
    except ValueError:
        co64_s, _ = _find_box(b, stbl_s, stbl_e, b"co64")
        (n_chunks,) = struct.unpack(">I", b[co64_s + 4 : co64_s + 8])
        offsets = list(
            struct.unpack(f">{n_chunks}Q", b[co64_s + 8 : co64_s + 8 + 8 * n_chunks])
        )

    # stsc run-length -> samples per chunk, then walk chunks accumulating
    # sizes to absolute per-sample offsets.
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(stsc_rows):
        last = stsc_rows[i + 1][0] - 1 if i + 1 < len(stsc_rows) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    frames = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            size = sizes[si]
            if size != w * h:
                raise ValueError(
                    f"MP4: sample {si} size {size} != frame geometry {w}x{h}"
                )
            frames.append(
                np.frombuffer(b[pos : pos + size], dtype=np.uint8).reshape(h, w)
            )
            pos += size
            si += 1
    if si != n_samples:
        raise ValueError(f"MP4: resolved {si} of {n_samples} samples")
    if len(deltas) != n_samples or any(d != deltas[0] for d in deltas):
        raise ValueError("MP4: non-uniform stts timing not supported")
    fps = timescale // deltas[0] if deltas and deltas[0] else timescale
    return np.stack(frames), fps


def read_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int64 samples, sample_rate).  PCM 16-bit mono only;
    float/ADPCM/stereo/other depths raise (quarantine contract)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"WAV: unsupported audio format {audio_format} (PCM only)")
    if channels != 1:
        raise ValueError(f"WAV: unsupported channel count {channels} (mono only)")
    if bits != 16:
        raise ValueError(f"WAV: unsupported bit depth {bits} (16-bit only)")
    return np.frombuffer(data, dtype="<i2").astype(np.int64), rate
