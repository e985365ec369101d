"""Multimodal plumbing: RAW-container codecs, mapInPandas decode stages,
resize/frame-sample semantics, real-format stub gating."""

from __future__ import annotations

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    decode_video,
    encode_audio,
    encode_image,
    encode_video,
    image_features,
    image_resize,
    synth_audio_samples,
    synth_image_pixels,
    synth_media_df,
    video_frame_sample,
)


class TestCodecs:
    def test_image_roundtrip(self):
        px = synth_image_pixels(7, 5, 4, 3)
        assert px.shape == (4, 5, 3)
        out = decode_image(encode_image(px))
        assert np.array_equal(out, px)

    def test_audio_roundtrip(self):
        s = synth_audio_samples(3, 100)
        out, rate = decode_audio(encode_audio(s, 16000))
        assert rate == 16000
        assert np.array_equal(out, s.astype(np.int64))

    def test_video_roundtrip(self):
        frames = np.stack([synth_image_pixels(k, 6, 4, 1)[:, :, 0] for k in range(3)])
        out = decode_video(encode_video(frames))
        assert np.array_equal(out, frames)

    def test_unsupported_format_features_raise(self):
        # All four real formats decode now; unsupported *features* inside
        # each format still quarantine loudly from the codec itself.
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0data" + b"rest")  # truncated JPEG

    def test_png_wav_mp4_decode_for_real(self):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.sources.mediacodec import (
            make_mp4,
            make_png,
            make_wav,
        )

        px = synth_image_pixels(5, 6, 4, 3)
        assert np.array_equal(decode_image(make_png(px)), px)
        s = synth_audio_samples(5, 64)
        out, rate = decode_audio(make_wav(s, 16000))
        assert rate == 16000 and np.array_equal(out, s.astype(np.int64))
        frames = np.stack([synth_image_pixels(k, 6, 4, 1)[:, :, 0] for k in range(3)])
        assert np.array_equal(decode_video(make_mp4(frames)), frames)

    def test_wrong_container_rejected(self):
        with pytest.raises(ValueError):
            decode_audio(b"IMG1xxxxxxxxx")


class TestStages:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame([(i,) for i in range(10)], "doc_id long")

    def test_image_features(self, spark, docs):
        media = synth_media_df(docs, kind="image")
        out = {r["media_id"]: r for r in image_features(media).collect()}
        for d in range(10):
            px = synth_image_pixels(d, 8 + d % 9, 8 + d % 7, 3).reshape(-1).astype(np.float64)
            r = out[d]
            assert (r["width"], r["height"], r["channels"]) == (8 + d % 9, 8 + d % 7, 3)
            assert r["mean_brightness"] == pytest.approx(px.mean())
            assert r["std_brightness"] == pytest.approx(px.std())
            assert r["n_pixels"] == px.size

    def test_resize_nearest_neighbor(self, spark, docs):
        media = synth_media_df(docs, kind="image")
        out = {r["media_id"]: r for r in image_resize(media, 4, 4).collect()}
        d = 5
        px = synth_image_pixels(d, 8 + d % 9, 8 + d % 7, 3)
        h, w, _ = px.shape
        ys, xs = (np.arange(4) * h) // 4, (np.arange(4) * w) // 4
        expect = px[np.ix_(ys, xs)]
        got = decode_image(bytes(out[d]["content"]))
        assert np.array_equal(got, expect)

    def test_audio_features(self, spark, docs):
        media = synth_media_df(docs, kind="audio")
        out = {r["media_id"]: r for r in audio_features(media).collect()}
        d = 3
        s = synth_audio_samples(d, 256 + d % 128).astype(np.float64)
        r = out[d]
        assert r["n_samples"] == len(s)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(s * s))))
        assert r["duration_s"] == pytest.approx(len(s) / 16000)

    def test_video_frame_sample_fanout(self, spark, docs):
        media = synth_media_df(docs, kind="video")
        rows = video_frame_sample(media, every=2).collect()
        d = 4  # n_frames = 4 + 4%5 = 8 -> sampled frames 0,2,4,6
        idx = sorted(r["frame_index"] for r in rows if r["media_id"] == d)
        assert idx == [0, 2, 4, 6]
        r0 = next(r for r in rows if r["media_id"] == d and r["frame_index"] == 2)
        fr = synth_image_pixels(d + 2, 8 + d % 9, 8 + d % 7, 1)[:, :, 0].astype(np.float64)
        assert r0["frame_mean"] == pytest.approx(fr.mean())

    def test_blob_dropped_after_decode(self, spark, docs):
        media = synth_media_df(docs, kind="image")
        assert "content" not in image_features(media).columns

    def test_video_scene_cuts_matches_python(self, spark, docs):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            video_scene_cuts,
        )

        media = synth_media_df(docs, kind="video")
        got = {(r["media_id"], r["frame_index"]): r
               for r in video_scene_cuts(media, threshold_ppm=428_000).collect()}
        for d in range(10):
            f, w, h = 4 + d % 5, 8 + d % 9, 8 + d % 7
            frames = [synth_image_pixels(d + k, w, h, 1)[:, :, 0].astype(np.int64)
                      for k in range(f)]
            for k in range(1, f):
                delta = int(np.abs(frames[k] - frames[k - 1]).sum())
                r = got[(d, k)]
                assert r["delta"] == delta and r["n_px"] == w * h
                assert r["is_cut"] == (delta * 1_000_000 > 428_000 * w * h * 255)
        # one pair per consecutive-frame boundary, nothing else
        assert len(got) == sum((4 + d % 5) - 1 for d in range(10))

    def test_video_scene_cuts_container_independent(self, spark, docs):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            video_scene_cuts,
        )

        raw = video_scene_cuts(synth_media_df(docs, kind="video")).collect()
        mp4 = video_scene_cuts(
            synth_media_df(docs, kind="video", container="real")
        ).collect()
        assert sorted(map(tuple, raw)) == sorted(map(tuple, mp4))

    def test_video_scene_cuts_threshold_extremes(self, spark, docs):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            video_scene_cuts,
        )

        media = synth_media_df(docs, kind="video")
        all_cut = video_scene_cuts(media, threshold_ppm=0).collect()
        assert all(r["is_cut"] for r in all_cut)
        none_cut = video_scene_cuts(media, threshold_ppm=1_000_000).collect()
        assert not any(r["is_cut"] for r in none_cut)


class TestImageAhash:
    """Perceptual average-hash (r7): python reference parity, container
    independence, duplicate detection, bit-flip locality."""

    def _py_ahash(self, px):
        import numpy as np

        px = px.astype(np.int64)
        h, w, _ = px.shape
        s3 = px.sum(axis=2)
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        sample = s3[np.ix_(ys, xs)]
        total = int(sample.sum())
        return "".join(
            "1" if v * 64 > total else "0" for v in sample.reshape(-1)
        )

    def test_matches_python_reference(self, spark):
        import pandas as pd  # noqa: F401

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            encode_image,
            image_ahash,
            synth_image_pixels,
        )

        rows = []
        want = {}
        for mid in (0, 3, 17):
            px = synth_image_pixels(mid, 8 + mid % 9, 8 + mid % 7, 3)
            rows.append((mid, bytearray(encode_image(px))))
            want[mid] = self._py_ahash(px)
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {r["media_id"]: r["ahash_bits"] for r in image_ahash(df).collect()}
        assert got == want
        assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in got.values())

    def test_container_independent(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            encode_image,
            image_ahash,
            make_png,
            synth_image_pixels,
        )

        px = synth_image_pixels(5, 12, 10, 3)
        df = spark.createDataFrame(
            [(0, bytearray(encode_image(px))), (1, bytearray(make_png(px)))],
            "media_id long, content binary",
        )
        got = [r["ahash_bits"] for r in image_ahash(df).orderBy("media_id").collect()]
        assert got[0] == got[1]

    def test_identical_images_collide_distinct_differ(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            encode_image,
            image_ahash,
            synth_image_pixels,
        )

        a = synth_image_pixels(7, 10, 9, 3)
        b = synth_image_pixels(8, 10, 9, 3)
        df = spark.createDataFrame(
            [
                (0, bytearray(encode_image(a))),
                (1, bytearray(encode_image(a))),
                (2, bytearray(encode_image(b))),
            ],
            "media_id long, content binary",
        )
        got = {r["media_id"]: r["ahash_bits"] for r in image_ahash(df).collect()}
        assert got[0] == got[1]
        assert got[0] != got[2]


class TestAudioSilenceRuns:
    def _media(self, spark, samples):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            encode_audio,
        )

        blob = encode_audio(np.array(samples, dtype=np.int64), 16000)
        return spark.createDataFrame(
            [(1, bytearray(blob))], "media_id long, content binary"
        )

    def _run(self, spark, samples, t=100):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            audio_silence_runs,
        )

        return audio_silence_runs(self._media(spark, samples), t).collect()[0]

    def test_leading_and_trailing_runs(self, spark):
        # silent(3), loud(2), silent(1), loud(1), silent(2)
        r = self._run(spark, [0, 5, -50, 900, -900, 99, 500, 0, 0])
        assert (r.n_samples, r.n_silent, r.n_runs) == (9, 6, 3)
        assert r.longest_run == 3 and r.longest_start == 0

    def test_earliest_maximal_run_wins_ties(self, spark):
        # two runs of length 2: starts 1 and 4 -> report start 1
        r = self._run(spark, [500, 0, 0, 500, 0, 0, 500])
        assert r.longest_run == 2 and r.longest_start == 1 and r.n_runs == 2

    def test_no_silence(self, spark):
        r = self._run(spark, [500, -500, 900])
        assert (r.n_silent, r.n_runs, r.longest_run) == (0, 0, 0)
        assert r.longest_start is None

    def test_all_silent(self, spark):
        r = self._run(spark, [0, 1, -1, 2])
        assert (r.n_silent, r.n_runs, r.longest_run, r.longest_start) == (4, 1, 4, 0)


class TestImagePhash:
    def _img_df(self, spark, px):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            encode_image,
        )

        blob = encode_image(np.asarray(px, dtype=np.uint8))
        return spark.createDataFrame(
            [(1, bytearray(blob))], "media_id long, content binary"
        )

    def _grid(self, seed, h=8, w=8, c=3):
        import numpy as np

        rng = np.random.RandomState(seed)
        return rng.randint(0, 255, size=(h, w, c)).astype(np.uint8)

    def test_python_parity(self, spark):
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            PHASH_T,
            image_phash,
        )

        px = self._grid(7)
        got = image_phash(self._img_df(spark, px)).collect()[0].phash_bits
        t = np.array(PHASH_T, dtype=np.int64)
        g = px.astype(np.int64).sum(axis=2)
        c = t @ g @ t.T
        low = [c[u][v] for u in range(4) for v in range(4) if (u, v) != (0, 0)]
        med = sorted(low)[7]
        want = "".join("1" if x > med else "0" for x in low)
        assert got == want and len(got) == 15

    def test_brightness_shift_invariant(self, spark):
        # adding a constant to every pixel moves ONLY the DC
        # coefficient (the quantized basis rows still cancel exactly by
        # symmetry), and DC is excluded — pHash must not move
        import numpy as np

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            image_phash,
        )

        px = np.minimum(self._grid(11), 225)  # headroom: +30 never clips
        base = image_phash(self._img_df(spark, px)).collect()[0].phash_bits
        brighter = (px.astype(np.int64) + 30).astype(np.uint8)
        got = image_phash(self._img_df(spark, brighter)).collect()[0].phash_bits
        assert got == base

    def test_distinct_images_distinct_hashes(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            image_phash,
        )

        a = image_phash(self._img_df(spark, self._grid(1))).collect()[0].phash_bits
        b = image_phash(self._img_df(spark, self._grid(2))).collect()[0].phash_bits
        assert a != b
