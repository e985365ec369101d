# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
# Multimodal columns (operators/multimodal.py): binary media + typed
# metadata; decode/feature/resize/frame-sample via mapInPandas.  Fixture
# media is synthesized from `documents` doc_ids with LCG payloads, so
# the oracle reconstructs every pixel/sample arithmetically.
# ==========================================================================

from ..operators.multimodal import (  # noqa: E402
    A_AUD, A_PIX, B_AUD, B_PIX,
    audio_features, image_features, image_jpeg_roundtrip_check, image_resize,
    synth_media_df, video_frame_sample,
)

_DD_IMG_DIMS = """
dims AS (
  SELECT doc_id AS media_id,
         (8 + doc_id % 9)::INT AS w, (8 + doc_id % 7)::INT AS h, 3::INT AS c
  FROM documents
)
"""


def _mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="image")
    out = image_features(media)
    return out.select(
        "media_id", "width", "height", "channels",
        F.round("mean_brightness", 4).alias("mean_brightness"),
        F.round("std_brightness", 4).alias("std_brightness"),
        "n_pixels",
    )


_DD_MM_IMAGE = f"""
WITH {_DD_IMG_DIMS},
px AS (
  SELECT media_id, w, h, c, i.i,
         ((media_id * {A_PIX} + i.i * {B_PIX}) % 256)::DOUBLE AS p
  FROM dims, unnest(range(0, (w * h * c)::BIGINT)) AS i(i)
)
SELECT media_id, w AS width, h AS height, c AS channels,
       round(avg(p), 4) AS mean_brightness,
       round(sqrt(avg(p * p) - avg(p) * avg(p)), 4) AS std_brightness,
       count(*)::BIGINT AS n_pixels
FROM px GROUP BY media_id, w, h, c
"""

_register("mm_image_features", _mm_image_features, _DD_MM_IMAGE)


def _mm_image_features_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pixels, REAL PNG container: the decode stage runs the vendored
    stdlib PNG reader (sources/mediacodec.py) instead of the RAW header
    parse; the oracle is identical because it recomputes pixel stats from
    the LCG synthesis params, never the bytes."""
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="image", container="real")
    out = image_features(media)
    return out.select(
        "media_id", "width", "height", "channels",
        F.round("mean_brightness", 4).alias("mean_brightness"),
        F.round("std_brightness", 4).alias("std_brightness"),
        "n_pixels",
    )


_register("mm_image_features_png", _mm_image_features_png, _DD_MM_IMAGE)


_RESIZE_W, _RESIZE_H = 4, 4


def _mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="image")
    resized = image_resize(media, _RESIZE_W, _RESIZE_H)
    out = image_features(resized)
    return out.select(
        "media_id", "width", "height",
        F.round("mean_brightness", 4).alias("mean_brightness"),
        "n_pixels",
    )


# resized pixel (ty, tx, ch) = src pixel (floor(ty*h/H), floor(tx*w/W), ch);
# flat src index = ((y*w) + x)*c + ch
_DD_MM_RESIZE = f"""
WITH {_DD_IMG_DIMS},
tgt AS (
  SELECT media_id, w, h, c, ty.ty, tx.tx, ch.ch,
         ((((ty.ty * h) // {_RESIZE_H}) * w + ((tx.tx * w) // {_RESIZE_W})) * c + ch.ch) AS src_i
  FROM dims,
       unnest(range(0, {_RESIZE_H})) AS ty(ty),
       unnest(range(0, {_RESIZE_W})) AS tx(tx),
       unnest(range(0, 3)) AS ch(ch)
)
SELECT media_id, {_RESIZE_W} AS width, {_RESIZE_H} AS height,
       round(avg(((media_id * {A_PIX} + src_i * {B_PIX}) % 256)::DOUBLE), 4) AS mean_brightness,
       count(*)::BIGINT AS n_pixels
FROM tgt GROUP BY media_id
"""

_register("mm_image_resize_stats", _mm_image_resize, _DD_MM_RESIZE)


def _mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="audio")
    out = audio_features(media)
    return out.select(
        "media_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 4).alias("rms"),
        "zero_crossings",
    )


_DD_MM_AUDIO = f"""
WITH dims AS (
  SELECT doc_id AS media_id, 16000::INT AS rate, (256 + doc_id % 128)::INT AS n
  FROM documents
),
smp AS (
  SELECT media_id, rate, n, i.i,
         (((media_id * {A_AUD} + i.i * {B_AUD}) % 65536) - 32768)::DOUBLE AS s,
         (CASE WHEN i.i + 1 < n
               THEN (((media_id * {A_AUD} + (i.i + 1) * {B_AUD}) % 65536) - 32768)::DOUBLE
          END) AS s_next
  FROM dims, unnest(range(0, n::BIGINT)) AS i(i)
)
SELECT media_id, rate AS sample_rate, n::BIGINT AS n_samples,
       round(n::DOUBLE / rate, 6) AS duration_s,
       round(sqrt(avg(s * s)), 4) AS rms,
       (count(*) FILTER (s_next IS NOT NULL AND ((s >= 0) != (s_next >= 0))))::BIGINT
         AS zero_crossings
FROM smp GROUP BY media_id, rate, n
"""

_register("mm_audio_features", _mm_audio_features, _DD_MM_AUDIO)


def _mm_audio_features_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same samples, REAL WAV container (PCM16 RIFF decode via
    sources/mediacodec.py); oracle identical — see _mm_image_features_png."""
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="audio", container="real")
    out = audio_features(media)
    return out.select(
        "media_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 4).alias("rms"),
        "zero_crossings",
    )


_register("mm_audio_features_wav", _mm_audio_features_wav, _DD_MM_AUDIO)


def _mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="video")
    out = video_frame_sample(media, every=2)
    return out.select(
        "media_id", "frame_index", "width", "height",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


_DD_MM_VIDEO = f"""
WITH dims AS (
  SELECT doc_id AS media_id, (4 + doc_id % 5)::INT AS f,
         (8 + doc_id % 9)::INT AS w, (8 + doc_id % 7)::INT AS h
  FROM documents
),
frames AS (
  SELECT media_id, w, h, k.k::INT AS frame_index
  FROM dims, unnest(range(0, f::BIGINT)) AS k(k)
  WHERE k.k % 2 = 0
),
px AS (
  SELECT media_id, frame_index, w, h, i.i,
         (((media_id + frame_index) * {A_PIX} + i.i * {B_PIX}) % 256)::DOUBLE AS p
  FROM frames, unnest(range(0, (w * h)::BIGINT)) AS i(i)
)
SELECT media_id, frame_index, w AS width, h AS height, round(avg(p), 4) AS frame_mean
FROM px GROUP BY media_id, frame_index, w, h
"""

_register("mm_video_frame_sample", _mm_video_frames, _DD_MM_VIDEO)


def _mm_video_frames_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same frames, REAL ISO-BMFF container: the decode stage runs the
    vendored MP4 demuxer (sources/mediacodec.py box walk + stsc/stsz/stco
    sample resolution) instead of the VID1 header parse; oracle identical
    because it recomputes frame stats from the LCG synthesis params."""
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="video", container="real")
    out = video_frame_sample(media, every=2)
    return out.select(
        "media_id", "frame_index", "width", "height",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


_register("mm_video_frame_sample_mp4", _mm_video_frames_mp4, _DD_MM_VIDEO)


def _mm_image_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG encode->decode bound check over every synthetic
    image.  JPEG is lossy, so the SQL-replayable contract is the bound,
    not the pixels: geometry survives exactly and max |err| <= tol at
    q=100 (all-ones quant tables leave only DCT/color rounding).  The
    oracle asserts the dims and a literal TRUE — the row hash matches
    iff the vendored codec (sources/mediacodec.py make_jpeg/read_jpeg)
    honors the bound for every document."""
    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="image")
    return image_jpeg_roundtrip_check(media, quality=100, tol=5).select(
        "media_id", "width", "height", "channels", "jpeg_ok"
    )


_DD_MM_JPEG = f"""
WITH {_DD_IMG_DIMS}
SELECT media_id, w AS width, h AS height, c AS channels, TRUE AS jpeg_ok
FROM dims
"""

_register("mm_image_jpeg_roundtrip", _mm_image_jpeg_roundtrip, _DD_MM_JPEG)


# ==========================================================================


# ==========================================================================
# Perceptual image dedup (round 7) — aHash fingerprints through the
# REAL PNG decode path (operators/multimodal.py::image_ahash), grouped
# into duplicate clusters.  Duplicates are woven deterministically: the
# media content synthesizes from doc_id % 97, so every seed's ~5 docs
# carry byte-identical images while the decode still runs per row.  The
# oracle replays the hash from the LCG synthesis arithmetic — integer
# sums, floor-index downsampling, a division-free cell*64 > total
# threshold — never touching the bytes.
# ==========================================================================

_AHASH_MOD = 97


def _mm_image_ahash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import image_ahash

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.select((F.col("doc_id") % _AHASH_MOD).alias("doc_id")).distinct()
    media = synth_media_df(seeds, kind="image", container="real").select(
        F.col("media_id").alias("seed"), "content"
    )
    keyed = docs.select(
        "doc_id", (F.col("doc_id") % _AHASH_MOD).alias("seed")
    ).join(media, "seed")
    hashed = image_ahash(
        keyed.select(F.col("doc_id").alias("media_id"), "content")
    )
    return (
        hashed.groupBy("ahash_bits")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("media_id").alias("min_media_id"),
        )
        .filter(F.col("n_images") > 1)
        .orderBy("ahash_bits")
    )


_DD_MM_AHASH = f"""
WITH seeds AS (SELECT DISTINCT (doc_id % {_AHASH_MOD}) AS seed FROM documents),
dims AS (
  SELECT seed, (8 + seed % 9)::BIGINT AS w, (8 + seed % 7)::BIGINT AS h
  FROM seeds
),
cells AS (
  SELECT seed, ty.ty, tx.tx,
         (((ty.ty * h) // 8) * w + ((tx.tx * w) // 8)) * 3 AS base
  FROM dims, unnest(range(0, 8)) AS ty(ty), unnest(range(0, 8)) AS tx(tx)
),
lum AS (
  SELECT seed, ty, tx,
         ((seed * {A_PIX} + (base + 0) * {B_PIX}) % 256)
         + ((seed * {A_PIX} + (base + 1) * {B_PIX}) % 256)
         + ((seed * {A_PIX} + (base + 2) * {B_PIX}) % 256) AS v
  FROM cells
),
tot AS (SELECT seed, CAST(sum(v) AS BIGINT) AS total FROM lum GROUP BY seed),
bits AS (
  SELECT l.seed,
         string_agg(CASE WHEN l.v * 64 > t.total THEN '1' ELSE '0' END, ''
                    ORDER BY l.ty, l.tx) AS ahash_bits
  FROM lum l JOIN tot t USING (seed)
  GROUP BY l.seed
),
members AS (
  SELECT d.doc_id, b.ahash_bits
  FROM documents d JOIN bits b ON b.seed = d.doc_id % {_AHASH_MOD}
)
SELECT ahash_bits, count(*)::BIGINT AS n_images,
       min(doc_id) AS min_media_id
FROM members
GROUP BY ahash_bits
HAVING count(*) > 1
ORDER BY ahash_bits
"""

_register("mm_image_ahash_dupes", _mm_image_ahash_dupes, _DD_MM_AHASH)


def _mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary table over the synthetic videos (round 10): exact
    integer SAD between consecutive frames, cut threshold at 428000 ppm
    of the max frame delta — the MEDIAN of the LCG fixture's delta
    distribution (the per-pixel diff is 79 or 177 depending on the
    wrap, centering deltas near 428k ppm), so both cut and non-cut
    rows are exercised.  Oracle reconstructs every pixel pair
    from the synthesis arithmetic."""
    from ..operators.multimodal import video_scene_cuts

    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="video")
    return video_scene_cuts(media, threshold_ppm=428_000).orderBy(
        "media_id", "frame_index"
    )


_DD_MM_SCENECUT = f"""
WITH dims AS (
  SELECT doc_id AS media_id, (4 + doc_id % 5)::INT AS f,
         (8 + doc_id % 9)::INT AS w, (8 + doc_id % 7)::INT AS h
  FROM documents
),
pairs AS (
  SELECT media_id, w, h, k.k::INT AS frame_index
  FROM dims, unnest(range(1, f::BIGINT)) AS k(k)
),
px AS (
  SELECT media_id, frame_index, w, h,
         abs((((media_id + frame_index) * {A_PIX} + i.i * {B_PIX}) % 256)
             - (((media_id + frame_index - 1) * {A_PIX} + i.i * {B_PIX}) % 256)) AS d
  FROM pairs, unnest(range(0, (w * h)::BIGINT)) AS i(i)
)
SELECT media_id, frame_index, CAST(sum(d) AS BIGINT) AS delta,
       (w * h)::INT AS n_px,
       (sum(d) * 1000000 > 428000::BIGINT * (w * h) * 255) AS is_cut
FROM px GROUP BY media_id, frame_index, w, h
ORDER BY media_id, frame_index
"""

_register("mm_video_scene_cuts", _mm_video_scene_cuts, _DD_MM_SCENECUT)


# --------------------------------------------------------------------------
# Audio silence runs (round 10) — operators/multimodal.py::
# audio_silence_runs.  The primitive under silence trimming / VAD
# gating: maximal runs of consecutive |sample| < threshold, found with
# numpy edge detection INSIDE the decode batch (the waveform never
# leaves the worker; output is one row per media).  Oracle replays the
# LCG synthesis per sample and finds the same runs with the
# gaps-and-islands anchor — the SQL-side twin of the same analysis.
# --------------------------------------------------------------------------

_SIL_T = 8192  # |s| < 8192 -> "silent" (1/4 of the synthetic amplitude range)


def _mm_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_silence_runs

    media = synth_media_df(_t(spark, sf_dir, "documents"), kind="audio")
    return audio_silence_runs(media, _SIL_T).orderBy("media_id")


_DD_MM_SILENCE = f"""
WITH dims AS (
  SELECT doc_id AS media_id, (256 + doc_id % 128)::BIGINT AS n FROM documents
),
smp AS (
  SELECT media_id, n, i.i AS i,
         abs((((media_id * {A_AUD} + i.i * {B_AUD}) % 65536) - 32768)::BIGINT) AS a
  FROM dims, unnest(range(0, n)) AS i(i)
),
sil AS (SELECT media_id, n, i FROM smp WHERE a < {_SIL_T}),
runs AS (
  SELECT media_id, n, min(i) AS start_i, count(*)::BIGINT AS len
  FROM (
    SELECT media_id, n, i,
           i - row_number() OVER (PARTITION BY media_id ORDER BY i) AS anchor
    FROM sil
  ) GROUP BY media_id, n, anchor
),
per AS (
  SELECT media_id, max(n) AS n_samples, sum(len)::BIGINT AS n_silent,
         count(*)::BIGINT AS n_runs, max(len)::BIGINT AS longest_run
  FROM runs GROUP BY media_id
),
starts AS (
  SELECT p.media_id, min(r.start_i)::BIGINT AS longest_start
  FROM per p JOIN runs r ON p.media_id = r.media_id AND r.len = p.longest_run
  GROUP BY p.media_id
)
SELECT d.media_id, d.n AS n_samples,
       coalesce(p.n_silent, 0) AS n_silent,
       coalesce(p.n_runs, 0) AS n_runs,
       coalesce(p.longest_run, 0) AS longest_run,
       s.longest_start
FROM dims d
LEFT JOIN per p ON d.media_id = p.media_id
LEFT JOIN starts s ON d.media_id = s.media_id
ORDER BY d.media_id
"""

_register("mm_audio_silence_runs", _mm_audio_silence, _DD_MM_SILENCE)


# --------------------------------------------------------------------------
# pHash DCT dupes (round 10) — operators/multimodal.py::image_phash.
# The frequency-domain dedup fingerprint next to aHash: exact integer
# 2-D DCT over the 8x8 luminance grid with the SHARED quantized
# cosine table (PHASH_T — the oracle consumes the identical literal
# list), 15 low-frequency bits vs their lower median.  Same dup-group
# report shape as the aHash entry so the two fingerprints are
# side-by-side comparable.
# --------------------------------------------------------------------------


def _mm_image_phash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import image_phash

    docs = _t(spark, sf_dir, "documents")
    seeds = docs.select((F.col("doc_id") % _AHASH_MOD).alias("doc_id")).distinct()
    media = synth_media_df(seeds, kind="image", container="real").select(
        F.col("media_id").alias("seed"), "content"
    )
    keyed = docs.select(
        "doc_id", (F.col("doc_id") % _AHASH_MOD).alias("seed")
    ).join(media, "seed")
    hashed = image_phash(
        keyed.select(F.col("doc_id").alias("media_id"), "content")
    )
    return (
        hashed.groupBy("phash_bits")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("media_id").alias("min_media_id"),
        )
        .filter(F.col("n_images") > 1)
        .orderBy("phash_bits")
    )


def _dd_phash_sql() -> str:
    from ..operators.multimodal import PHASH_T

    flat = ", ".join(str(t) for row in PHASH_T for t in row)
    return f"""
WITH seeds AS (SELECT DISTINCT (doc_id % {_AHASH_MOD}) AS seed FROM documents),
dims AS (
  SELECT seed, (8 + seed % 9)::BIGINT AS w, (8 + seed % 7)::BIGINT AS h
  FROM seeds
),
cells AS (
  SELECT seed, ty.ty, tx.tx,
         (((ty.ty * h) // 8) * w + ((tx.tx * w) // 8)) * 3 AS base
  FROM dims, unnest(range(0, 8)) AS ty(ty), unnest(range(0, 8)) AS tx(tx)
),
lum AS (
  SELECT seed, ty, tx,
         ((seed * {A_PIX} + (base + 0) * {B_PIX}) % 256)
         + ((seed * {A_PIX} + (base + 1) * {B_PIX}) % 256)
         + ((seed * {A_PIX} + (base + 2) * {B_PIX}) % 256) AS v
  FROM cells
),
tmat AS (
  SELECT u.u, i.i, ([{flat}])[u.u * 8 + i.i + 1]::BIGINT AS t
  FROM unnest(range(0, 4)) AS u(u), unnest(range(0, 8)) AS i(i)
),
coef AS (
  SELECT l.seed, tu.u AS cu, tv.u AS cv,
         CAST(sum(l.v * tu.t * tv.t) AS BIGINT) AS c
  FROM lum l
  JOIN tmat tu ON tu.i = l.ty
  JOIN tmat tv ON tv.i = l.tx
  WHERE NOT (tu.u = 0 AND tv.u = 0)
  GROUP BY l.seed, tu.u, tv.u
),
med AS (SELECT seed, quantile_disc(c, 0.5) AS m FROM coef GROUP BY seed),
bits AS (
  SELECT coef.seed,
         string_agg(CASE WHEN c > m THEN '1' ELSE '0' END, ''
                    ORDER BY cu, cv) AS phash_bits
  FROM coef JOIN med USING (seed)
  GROUP BY coef.seed
),
members AS (
  SELECT d.doc_id, b.phash_bits
  FROM documents d JOIN bits b ON b.seed = d.doc_id % {_AHASH_MOD}
)
SELECT phash_bits, count(*)::BIGINT AS n_images,
       min(doc_id) AS min_media_id
FROM members
GROUP BY phash_bits
HAVING count(*) > 1
ORDER BY phash_bits
"""


_register("mm_image_phash_dupes", _mm_image_phash_dupes, _dd_phash_sql())
