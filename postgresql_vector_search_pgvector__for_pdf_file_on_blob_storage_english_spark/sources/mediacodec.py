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

JPEG and MP4 stay stubbed: entropy-coded DCT and the ISO-BMFF codec zoo
are not honestly implementable here, and a wrong decoder is worse than
a loud stub.

Both round-trips (``make_png``→``read_png``, ``make_wav``→``read_wav``)
are bit-exact for supported inputs, so downstream feature stats are
SQL-oracle-replayable from the synthesis parameters alone.
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
