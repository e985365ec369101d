"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Design for 100 TB of media (per the training-data-pipeline contract):

* media travels as a ``binary`` column next to narrow typed metadata —
  filters and joins run on the metadata (codegen, pushdown-able) and
  the blob crosses into Python only inside the Arrow batch of a decode
  stage, only for rows that survive pruning;
* every decode stage is ``mapInPandas`` (whole-batch amortization), and
  drops the blob from its output schema as early as possible — features
  and thumbnails shuffle, raw media never does;
* **all four real formats decode for real** via the vendored stdlib
  codec (:mod:`..sources.mediacodec`): PNG (all five scanline filters),
  baseline JPEG (T.81 SOF0, Annex K tables, restart markers), PCM16
  WAV, and ISO-BMFF MP4 (full box/sample-table demux over uncompressed
  sample entries).  Unsupported sub-formats (palette/16-bit/interlaced
  PNG, progressive/subsampled JPEG, float/stereo WAV, entropy-coded MP4
  codecs like avc1) raise loudly for quarantine.  The deterministic RAW
  container below keeps the plumbing (schema, batching, UDF signatures,
  partitioning) testable either way, and its pixel/sample arithmetic is
  replayable in SQL for the oracle gate; JPEG, being lossy, is gated by
  a round-trip error *bound* instead (:func:`image_jpeg_roundtrip_check`).

RAW container formats (big-endian lengths, one header + payload):

    IMG1 | width u32 | height u32 | channels u8 | pixels u8[w*h*c]
    AUD1 | sample_rate u32 | n_samples u32 | samples i16[n] (BE)
    VID1 | n_frames u16 | width u32 | height u32 | frames u8[f*w*h]
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.mediacodec import (  # noqa: E402
    make_jpeg,
    make_mp4,
    make_png,
    make_wav,
    read_jpeg,
    read_mp4,
    read_png,
    read_wav,
)

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"IMG1", b"AUD1", b"VID1"
# All four real formats (PNG, JPEG, WAV, MP4) now decode via
# ..sources.mediacodec; unsupported *features* inside each format
# (progressive JPEG, palette PNG, compressed MP4 codecs, float WAV)
# raise loudly from the codec itself — the quarantine contract.


# ---- encoders (pure, deterministic; test/fixture side) --------------------

def encode_image(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> IMG1 bytes."""
    h, w, c = pixels.shape
    return IMG_MAGIC + struct.pack(">IIB", w, h, c) + pixels.tobytes()


def decode_image(b: bytes) -> np.ndarray:
    """IMG1, PNG, or baseline JPEG bytes -> (h, w, c) uint8."""
    if b[:4] == b"\x89PNG":
        return read_png(b)
    if b[:2] == b"\xff\xd8":
        return read_jpeg(b)
    if b[:4] != IMG_MAGIC:
        raise ValueError("not an IMG1 payload")
    w, h, c = struct.unpack(">IIB", b[4:13])
    return np.frombuffer(b[13 : 13 + w * h * c], dtype=np.uint8).reshape(h, w, c)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> AUD1 bytes."""
    return AUD_MAGIC + struct.pack(">II", sample_rate, len(samples)) + samples.astype(">i2").tobytes()


def decode_audio(b: bytes) -> tuple[np.ndarray, int]:
    """AUD1 or PCM16 WAV bytes -> (int64 samples, rate)."""
    if b[:4] == b"RIFF":
        return read_wav(b)
    if b[:4] != AUD_MAGIC:
        raise ValueError("not an AUD1 payload")
    rate, n = struct.unpack(">II", b[4:12])
    return np.frombuffer(b[12 : 12 + 2 * n], dtype=">i2").astype(np.int64), rate


def encode_video(frames: np.ndarray) -> bytes:
    """(f, h, w) uint8 grayscale frames -> VID1 bytes."""
    f, h, w = frames.shape
    return VID_MAGIC + struct.pack(">HII", f, w, h) + frames.tobytes()


def decode_video(b: bytes) -> np.ndarray:
    """VID1 or ISO-BMFF (raw-sample) MP4 bytes -> (f, h, w) uint8 frames;
    compressed MP4 codecs stay a loud stub inside read_mp4."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        frames, _fps = read_mp4(b)
        return frames
    if b[:4] != VID_MAGIC:
        raise ValueError("not a VID1 payload")
    f, w, h = struct.unpack(">HII", b[4:14])
    return np.frombuffer(b[14 : 14 + f * w * h], dtype=np.uint8).reshape(f, h, w)


# ---- decode / feature stages (mapInPandas over Arrow batches) -------------

IMAGE_FEATURES_FIELDS = (
    "width int, height int, channels int, "
    "mean_brightness double, std_brightness double, n_pixels long"
)


def image_features(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Decode + per-image stats; the blob does not survive this stage."""
    import pandas as pd

    schema = T.StructType.fromDDL(f"{id_col} long, {IMAGE_FEATURES_FIELDS}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_image(bytes(blob))
                h, w, c = px.shape
                flat = px.reshape(-1).astype(np.float64)
                rows.append((mid, w, h, c, float(flat.mean()), float(flat.std()), int(flat.size)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def image_resize(
    df: DataFrame, out_w: int, out_h: int, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Nearest-neighbor resample, re-encoded as IMG1 (thumbnailing stage).

    src index = floor(dst * src_dim / out_dim) — pure integer math, so
    downstream stats are oracle-replayable.
    """
    import pandas as pd

    schema = T.StructType.fromDDL(f"{id_col} long, content binary, width int, height int")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_image(bytes(blob))
                h, w, _c = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                rows.append((mid, encode_image(px[np.ix_(ys, xs)]), out_w, out_h))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def audio_features(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    import pandas as pd

    schema = T.StructType.fromDDL(
        f"{id_col} long, sample_rate int, n_samples long, duration_s double, "
        "rms double, zero_crossings long"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                s, rate = decode_audio(bytes(blob))
                sf = s.astype(np.float64)
                zc = int(np.sum((s[:-1] >= 0) != (s[1:] >= 0))) if len(s) > 1 else 0
                rows.append(
                    (mid, rate, len(s), len(s) / rate,
                     float(np.sqrt(np.mean(sf * sf))) if len(s) else 0.0, zc)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def image_jpeg_roundtrip_check(
    df: DataFrame,
    quality: int = 100,
    tol: int = 5,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode -> re-encode as baseline JPEG -> decode -> compare.

    JPEG is lossy, so per-pixel stats are not SQL-replayable the way the
    PNG/WAV/MP4 paths are; the oracle-able contract is the *bound*:
    geometry survives exactly and every pixel lands within ``tol`` of
    the source at the given quality (q=100 scales the Annex K tables to
    all-ones, leaving only DCT/color-transform rounding).  The default
    ``tol=5`` covers the analytic worst case: +-0.5 per-coefficient
    quantization rounding propagated through the IDCT basis (~4) plus
    RGB<->YCbCr rounding (~1); tol=3 was empirical for the LCG fixtures
    and could flake if fixture geometry changes.
    """
    import pandas as pd

    schema = T.StructType.fromDDL(
        f"{id_col} long, width int, height int, channels int, jpeg_ok boolean"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_image(bytes(blob))
                out = read_jpeg(make_jpeg(px, quality=quality))
                h, w, c = px.shape
                err = int(np.abs(out.astype(np.int64) - px.astype(np.int64)).max())
                rows.append((mid, w, h, c, bool(out.shape == px.shape and err <= tol)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def video_frame_sample(
    df: DataFrame, every: int = 2, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Every ``every``-th frame -> one row per sampled frame with its
    IMG1 thumbnail payload (1 channel) + per-frame mean — a flatMap:
    one media row fans out to n_frames/every rows."""
    import pandas as pd

    schema = T.StructType.fromDDL(
        f"{id_col} long, frame_index int, width int, height int, frame_mean double"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                frames = decode_video(bytes(blob))
                for i in range(0, frames.shape[0], every):
                    fr = frames[i]
                    rows.append((mid, i, fr.shape[1], fr.shape[0], float(fr.astype(np.float64).mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def video_scene_cuts(
    df: DataFrame,
    threshold_ppm: int = 335_000,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Scene-cut detection — the shot-boundary primitive of every video
    curation pipeline (sample per shot, not per frame): integer
    sum-of-absolute-differences between consecutive frames, a cut where
    the delta exceeds ``threshold_ppm`` parts-per-million of the
    maximum possible frame difference (``n_px * 255``).

    One row per consecutive frame pair ``(media_id, frame_index,
    delta, n_px, is_cut)`` with ``frame_index`` the LATER frame.  All
    integer arithmetic (the cut test cross-multiplies instead of
    dividing), so the table hash-compares across engines.

    Scale shape: one decode per media row inside an Arrow batch, rows
    out bounded by total frames; no shuffle at all — downstream
    aggregation (cuts per video, shot lengths) is the caller's
    partial-agg groupBy on the id."""
    import pandas as pd

    schema = T.StructType.fromDDL(
        f"{id_col} long, frame_index int, delta long, n_px int, is_cut boolean"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                frames = decode_video(bytes(blob)).astype(np.int64)
                n_px = int(frames.shape[1] * frames.shape[2])
                for k in range(1, frames.shape[0]):
                    delta = int(np.abs(frames[k] - frames[k - 1]).sum())
                    cut = delta * 1_000_000 > threshold_ppm * n_px * 255
                    rows.append((mid, k, delta, n_px, bool(cut)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


# ---- deterministic fixture synthesis (LCG pixels/samples; SQL-replayable) -

A_PIX, B_PIX = 2654435761, 40503        # pixel i of doc d: (d*A + i*B) % 256
A_AUD, B_AUD = 48271, 16807             # sample i: ((d*A + i*B) % 65536) - 32768


def synth_image_pixels(doc_id: int, w: int, h: int, c: int = 3) -> np.ndarray:
    i = np.arange(w * h * c, dtype=np.int64)
    return (((doc_id * A_PIX) + i * B_PIX) % 256).astype(np.uint8).reshape(h, w, c)


def synth_audio_samples(doc_id: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return ((((doc_id * A_AUD) + i * B_AUD) % 65536) - 32768).astype(np.int16)


def synth_media_df(docs: DataFrame, kind: str = "image", container: str = "raw") -> DataFrame:
    """documents -> (media_id, kind, content, meta) with LCG payloads.

    Sizes derive from doc_id (width = 8 + id%9 etc.) so every engine—
    and the SQL oracle—can reconstruct them without seeing the bytes.

    ``container='real'`` wraps the same pixels/samples in PNG/WAV/MP4
    bytes so the decode stages exercise the vendored real codec while
    the oracle stays byte-independent.
    """
    if container not in ("raw", "real"):
        raise ValueError("container must be 'raw' or 'real'")
    import pandas as pd

    schema = T.StructType.fromDDL(
        "media_id long, kind string, content binary, "
        "meta struct<width:int, height:int, channels:int, sample_rate:int, "
        "n_samples:int, n_frames:int>"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if kind == "image":
                    w, h, c = 8 + d % 9, 8 + d % 7, 3
                    px = synth_image_pixels(d, w, h, c)
                    blob = make_png(px) if container == "real" else encode_image(px)
                    meta = (w, h, c, None, None, None)
                elif kind == "audio":
                    rate, n = 16000, 256 + (d % 128)
                    samples = synth_audio_samples(d, n)
                    blob = (
                        make_wav(samples, rate)
                        if container == "real"
                        else encode_audio(samples, rate)
                    )
                    meta = (None, None, None, rate, n, None)
                else:  # video
                    f, w, h = 4 + d % 5, 8 + d % 9, 8 + d % 7
                    frames = np.stack(
                        [synth_image_pixels(d + k, w, h, 1)[:, :, 0] for k in range(f)]
                    )
                    blob = make_mp4(frames) if container == "real" else encode_video(frames)
                    meta = (w, h, 1, None, None, f)
                rows.append((d, kind, blob, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return docs.select("doc_id").mapInPandas(run, schema)


def image_ahash(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Perceptual average-hash (aHash) per image — the classic
    image-dedup fingerprint: decode, sum channels to an integer
    luminance proxy, nearest-neighbor downsample to 8x8 (the
    ``image_resize`` index law), threshold each cell against the mean
    of the 64 cells, emit the 64 bits as a '0'/'1' string in row-major
    order.

    All-integer by construction: the threshold compare is
    ``cell * 64 > total`` (no division), so the hash is bit-identical
    across engines and the SQL oracle replays it from the synthesis
    arithmetic.  Identical images hash identically regardless of
    container (RAW vs PNG — the decode path is exercised, the hash is
    content-defined); near-identical images differ in few bits and are
    grouped/paired downstream exactly like SimHash fingerprints.
    """
    import pandas as pd

    schema = T.StructType.fromDDL(f"{id_col} long, ahash_bits string")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_image(bytes(blob)).astype(np.int64)
                h, w, _c = px.shape
                s3 = px.sum(axis=2)  # integer luminance proxy, 0..765
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                sample = s3[np.ix_(ys, xs)]
                total = int(sample.sum())
                bits = (sample.reshape(-1) * 64 > total)
                rows.append((mid, "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def audio_silence_runs(
    df: DataFrame,
    threshold: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Silence-run analysis — the primitive under silence trimming /
    voice-activity gating in audio corpus prep: maximal runs of
    consecutive samples with ``|s| < threshold``.

    Returns per media: ``n_samples, n_silent, n_runs, longest_run,
    longest_start`` (start index of the EARLIEST maximal-length run;
    zeros/NULL start when no sample is silent).

    Scale shape: runs are found with numpy edge-detection INSIDE the
    same Arrow batch that decoded the samples — the waveform never
    leaves the worker, nothing is exploded, and the operator's output
    is one row per media regardless of duration.
    """
    import pandas as pd

    schema = T.StructType.fromDDL(
        f"{id_col} long, n_samples long, n_silent long, n_runs long, "
        "longest_run long, longest_start long"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                s, _rate = decode_audio(bytes(blob))
                mask = np.abs(s.astype(np.int64)) < threshold
                n = len(s)
                if n == 0 or not mask.any():
                    rows.append((mid, n, 0, 0, 0, None))
                    continue
                edges = np.diff(mask.astype(np.int8))
                starts = np.flatnonzero(edges == 1) + 1
                ends = np.flatnonzero(edges == -1) + 1
                if mask[0]:
                    starts = np.concatenate(([0], starts))
                if mask[-1]:
                    ends = np.concatenate((ends, [n]))
                lens = ends - starts
                li = int(np.argmax(lens))  # first maximal run
                rows.append(
                    (mid, n, int(mask.sum()), len(lens),
                     int(lens[li]), int(starts[li]))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# pHash: DCT perceptual hash — the frequency-domain sibling of aHash
# above.  aHash thresholds raw cells (robust to exact re-encodes only);
# pHash thresholds LOW-FREQUENCY DCT coefficients, so global brightness
# shifts and high-frequency noise flip far fewer bits.  The DCT basis
# is quantized ONCE at import to integers (round(cos((2i+1)u*pi/16) *
# 2^14)); every coefficient is then an exact int64 sum of int products
# — bit-identical in any engine that consumes the same literal table,
# which is how the SQL oracle replays it.
# ---------------------------------------------------------------------------

import math as _math

PHASH_SCALE = 1 << 14
PHASH_T = tuple(
    tuple(int(round(_math.cos((2 * i + 1) * u * _math.pi / 16) * PHASH_SCALE))
          for i in range(8))
    for u in range(8)
)


def image_phash(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Per-image pHash bits: decode -> integer luminance -> 8x8
    nearest-neighbor grid (the aHash index law) -> exact integer 2-D
    DCT-II via the PHASH_T table -> keep the 15 low-frequency
    coefficients (u, v) in [0, 4)^2 minus DC -> threshold each against
    their LOWER MEDIAN (8th smallest of 15, an exact integer order
    statistic) -> 15-char '0'/'1' string in (u, v) row-major order.
    """
    import pandas as pd

    schema = T.StructType.fromDDL(f"{id_col} long, phash_bits string")
    tmat = np.array(PHASH_T, dtype=np.int64)  # [u][i]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_image(bytes(blob)).astype(np.int64)
                h, w, _c = px.shape
                s3 = px.sum(axis=2)
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                g = s3[np.ix_(ys, xs)]  # 8x8 int
                # C[u][v] = T[u] @ g @ T[v]^T — exact int64
                c = tmat @ g @ tmat.T
                low = [c[u][v] for u in range(4) for v in range(4)
                       if not (u == 0 and v == 0)]
                med = sorted(low)[(len(low) - 1) // 2]  # lower median of 15
                bits = "".join("1" if x > med else "0" for x in low)
                rows.append((mid, bits))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)
