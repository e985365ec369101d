"""Stdlib PNG/WAV/MP4 codec: round-trips, all five PNG scanline filters,
ISO-BMFF sample-table resolution, quarantine gates, and parity of the
real-container decode path with the RAW-container path through the Spark
feature stages."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.sources.mediacodec import (
    PNG_SIG,
    make_jpeg,
    make_mp4,
    make_png,
    make_wav,
    read_jpeg,
    read_mp4,
    read_png,
    read_wav,
)

RNG = np.random.default_rng(1234)


class TestPngRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1, 1), (7, 5, 1), (8, 8, 3), (5, 9, 4), (3, 4, 2)])
    def test_roundtrip_shapes(self, shape):
        px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(read_png(make_png(px)), px)

    def test_grayscale_2d_input(self):
        px = RNG.integers(0, 256, size=(6, 4), dtype=np.uint8)
        out = read_png(make_png(px))
        assert np.array_equal(out[:, :, 0], px) and out.shape == (6, 4, 1)

    def test_deterministic_bytes(self):
        px = RNG.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
        assert make_png(px) == make_png(px)


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter each scanline per the PNG spec (one filter type per
    row, cycling through ``filters``) and emit a valid PNG — an
    independent encoder used to prove the decoder's reconstruction."""
    h, w, c = px.shape
    bpp = c
    raw = bytearray()
    prior = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = line % 256
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - left) % 256
        elif f == 2:  # Up
            enc = (line - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - ((left + prior) >> 1)) % 256
        else:  # Paeth
            enc = np.zeros_like(line)
            for x in range(len(line)):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                cc = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (line[x] - pred) % 256
        raw += enc.astype(np.uint8).tobytes()
        prior = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9)) + chunk(b"IEND", b"")
    )


class TestPngFilters:
    @pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
    def test_single_filter_reconstruction(self, f):
        px = RNG.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
        assert np.array_equal(read_png(_png_with_filters(px, [f])), px)

    def test_mixed_filters_reconstruction(self):
        px = RNG.integers(0, 256, size=(16, 5, 3), dtype=np.uint8)
        assert np.array_equal(read_png(_png_with_filters(px, [0, 1, 2, 3, 4])), px)

    def test_multi_idat_concatenation(self):
        # IDAT data may be split across chunks arbitrarily (ISO 15948 §11.2.4)
        px = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        b = make_png(px)
        # split the single IDAT into two
        i = b.index(b"IDAT") - 4
        (length,) = struct.unpack(">I", b[i : i + 4])
        data = b[i + 8 : i + 8 + length]
        half = len(data) // 2

        def chunk(ctype, d):
            return (
                struct.pack(">I", len(d)) + ctype + d
                + struct.pack(">I", zlib.crc32(ctype + d) & 0xFFFFFFFF)
            )

        rebuilt = (
            b[:i] + chunk(b"IDAT", data[:half]) + chunk(b"IDAT", data[half:])
            + b[i + 12 + length:]
        )
        assert np.array_equal(read_png(rebuilt), px)


class TestPngGates:
    def test_palette_rejected(self):
        px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        b = bytearray(make_png(px))
        b[8 + 8 + 9] = 3  # IHDR color type byte -> palette
        with pytest.raises(ValueError, match="color type"):
            read_png(bytes(b))

    def test_sixteen_bit_rejected(self):
        px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        b = bytearray(make_png(px))
        b[8 + 8 + 8] = 16  # IHDR bit depth
        with pytest.raises(ValueError, match="bit depth"):
            read_png(bytes(b))

    def test_interlace_rejected(self):
        px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        b = bytearray(make_png(px))
        b[8 + 8 + 12] = 1  # IHDR interlace flag
        with pytest.raises(ValueError, match="interlace"):
            read_png(bytes(b))

    def test_not_a_png(self):
        with pytest.raises(ValueError, match="signature"):
            read_png(b"GIF89a....")


class TestWav:
    def test_roundtrip(self):
        s = RNG.integers(-32768, 32768, size=999, dtype=np.int16)
        out, rate = read_wav(make_wav(s, 22050))
        assert rate == 22050
        assert np.array_equal(out, s.astype(np.int64))

    def test_extra_chunks_skipped(self):
        s = np.array([1, -2, 3], dtype=np.int16)
        b = make_wav(s, 8000)
        # splice a LIST chunk (odd length -> tests word-alignment skip)
        info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        spliced = b[:12] + info + b[12:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        out, rate = read_wav(spliced)
        assert rate == 8000 and np.array_equal(out, s.astype(np.int64))

    def test_stereo_rejected(self):
        b = bytearray(make_wav(np.array([0, 1], dtype=np.int16), 8000))
        b[22] = 2  # channels field
        with pytest.raises(ValueError, match="channel"):
            read_wav(bytes(b))

    def test_float_format_rejected(self):
        b = bytearray(make_wav(np.array([0, 1], dtype=np.int16), 8000))
        b[20] = 3  # IEEE float format code
        with pytest.raises(ValueError, match="audio format"):
            read_wav(bytes(b))


class TestJpeg:
    @pytest.mark.parametrize("shape", [(8, 8, 3), (17, 23, 3), (3, 5, 3), (24, 24, 1)])
    def test_roundtrip_q100_bound(self, shape):
        px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        out = read_jpeg(make_jpeg(px, quality=100))
        assert out.shape == px.shape
        assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 3

    def test_greyscale_near_lossless(self):
        # single-component path has no color transform: q=100 error <= 1
        px = (np.fromfunction(lambda y, x: x * 3 + y * 2, (24, 24)) % 256).astype(np.uint8)
        out = read_jpeg(make_jpeg(px[:, :, None], quality=100))
        assert int(np.abs(out[:, :, 0].astype(int) - px.astype(int)).max()) <= 1

    def test_quality_monotone_size(self):
        px = RNG.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        sizes = [len(make_jpeg(px, quality=q)) for q in (25, 75, 100)]
        assert sizes == sorted(sizes)

    def test_deterministic_bytes(self):
        px = RNG.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
        assert make_jpeg(px) == make_jpeg(px)

    def test_restart_markers_decoded(self):
        # splice a DRI segment and RST markers into a single-block-row image
        # by re-encoding manually: simplest honest path — encode, then insert
        # DRI=1 and RSTn between MCU byte boundaries is invasive; instead
        # verify the decoder's restart logic on a stream built with two
        # identical scans separated by RST0 after re-aligning.  Build a 2-MCU
        # image, decode a hand-stitched variant with DRI=1 + RST0.
        px = np.concatenate(
            [np.full((8, 8, 1), 40, np.uint8), np.full((8, 8, 1), 200, np.uint8)], axis=1
        )
        base = make_jpeg(px, quality=100)
        half = make_jpeg(px[:, :8], quality=100)
        half2 = make_jpeg(px[:, 8:], quality=100)

        def entropy(b):
            i = b.index(b"\xff\xda")
            (ln,) = struct.unpack(">H", b[i + 2 : i + 4])
            return b[i + 2 + ln : -2]

        i = base.index(b"\xff\xda")
        dri = b"\xff\xdd\x00\x04\x00\x01"  # DRI, interval 1 MCU
        stitched = (
            base[:i] + dri + base[i : i + 2 + struct.unpack(">H", base[i + 2 : i + 4])[0]]
            + entropy(half) + b"\xff\xd0" + entropy(half2) + b"\xff\xd9"
        )
        out = read_jpeg(stitched)
        assert out.shape == (8, 16, 1)
        assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 1

    def test_progressive_rejected(self):
        px = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        b = bytearray(make_jpeg(px))
        i = bytes(b).index(b"\xff\xc0")
        b[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError, match="SOF"):
            read_jpeg(bytes(b))

    def test_subsampling_rejected(self):
        px = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        b = bytearray(make_jpeg(px))
        i = bytes(b).index(b"\xff\xc0")
        b[i + 11] = 0x22  # Y sampling factor -> 2x2 (4:2:0)
        with pytest.raises(NotImplementedError, match="subsampl"):
            read_jpeg(bytes(b))

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            read_jpeg(b"\x89PNG....")


class TestMp4:
    @pytest.mark.parametrize("shape", [(1, 1, 1), (3, 7, 5), (8, 9, 13)])
    def test_roundtrip_shapes(self, shape):
        frames = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        out, fps = read_mp4(make_mp4(frames, fps=24))
        assert fps == 24
        assert np.array_equal(out, frames)

    def test_deterministic_bytes(self):
        frames = RNG.integers(0, 256, size=(4, 6, 6), dtype=np.uint8)
        assert make_mp4(frames) == make_mp4(frames)

    def test_multi_chunk_stco_resolution(self):
        # Rebuild the single-chunk file as one chunk PER SAMPLE (n stsc/stco
        # entries, shuffled physical order) — proves the reader resolves
        # samples through the chunk map rather than assuming contiguity.
        frames = RNG.integers(0, 256, size=(3, 4, 5), dtype=np.uint8)
        fsz = 4 * 5
        b = make_mp4(frames, fps=10)
        moov_at = b.index(b"moov") - 4
        ftyp_len = b.index(b"mdat") - 4
        # new mdat: frames physically reversed
        payload = b"".join(frames[i].tobytes() for i in (2, 1, 0))
        mdat = struct.pack(">I", 8 + len(payload)) + b"mdat" + payload
        base = ftyp_len + 8
        offsets = [base + 2 * fsz, base + fsz, base]  # logical sample i -> its offset

        def full_box(btype, payload):
            return struct.pack(">I", 12 + len(payload)) + btype + b"\x00" * 4 + payload

        new_stsc = full_box(b"stsc", struct.pack(">I", 3)
                            + b"".join(struct.pack(">III", i + 1, 1, 1) for i in range(3)))
        new_stco = full_box(b"stco", struct.pack(">I", 3)
                            + b"".join(struct.pack(">I", o) for o in offsets))
        moov = b[moov_at:]
        old_stsc = moov.index(b"stsc") - 4  # box start = fourcc - 4
        old_stsc_len = struct.unpack(">I", moov[old_stsc:old_stsc + 4])[0]
        old_stco = moov.index(b"stco") - 4
        old_stco_len = struct.unpack(">I", moov[old_stco:old_stco + 4])[0]
        moov = (moov[:old_stsc] + new_stsc
                + moov[old_stsc + old_stsc_len:old_stco] + new_stco
                + moov[old_stco + old_stco_len:])

        def bump_sizes(buf, path_types, delta):
            # fix enclosing box sizes after the splice
            out = bytearray(buf)
            pos = 0
            for t in path_types:
                while out[pos + 4:pos + 8] != t:
                    pos += struct.unpack(">I", out[pos:pos + 4])[0]
                struct.pack_into(">I", out, pos, struct.unpack(">I", out[pos:pos + 4])[0] + delta)
                pos += 8
            return bytes(out)

        delta = len(new_stsc) + len(new_stco) - (old_stsc_len + old_stco_len)
        moov = bump_sizes(moov, [b"moov", b"trak", b"mdia", b"minf", b"stbl"], delta)
        out, fps = read_mp4(b[:ftyp_len] + mdat + moov)
        assert fps == 10
        assert np.array_equal(out, frames)

    def test_compressed_codec_rejected(self):
        frames = RNG.integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
        b = bytearray(make_mp4(frames))
        i = b.index(b"rawg")
        b[i:i + 4] = b"avc1"
        with pytest.raises(NotImplementedError, match="avc1"):
            read_mp4(bytes(b))

    def test_not_an_mp4(self):
        with pytest.raises(ValueError, match="ftyp"):
            read_mp4(b"\x00\x00\x00\x08free" + b"x" * 64)

    def test_size_geometry_mismatch_rejected(self):
        frames = RNG.integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
        b = bytearray(make_mp4(frames))
        i = b.index(b"stsz")  # fourcc; body at i+4: verflags, uniform, count, entries
        b[i + 16 : i + 20] = struct.pack(">I", 15)  # corrupt sample 0 size
        with pytest.raises(ValueError, match="size"):
            read_mp4(bytes(b))


class TestSparkRealContainerParity:
    def test_png_features_match_raw(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            image_features,
            synth_media_df,
        )

        docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        raw = image_features(synth_media_df(docs, "image", container="raw")).collect()
        png = image_features(synth_media_df(docs, "image", container="real")).collect()
        assert sorted(map(tuple, raw)) == sorted(map(tuple, png))

    def test_wav_features_match_raw(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            audio_features,
            synth_media_df,
        )

        docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        raw = audio_features(synth_media_df(docs, "audio", container="raw")).collect()
        wav = audio_features(synth_media_df(docs, "audio", container="real")).collect()
        assert sorted(map(tuple, raw)) == sorted(map(tuple, wav))

    def test_mp4_frames_match_raw(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            synth_media_df,
            video_frame_sample,
        )

        docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        raw = video_frame_sample(synth_media_df(docs, "video", container="raw")).collect()
        mp4 = video_frame_sample(synth_media_df(docs, "video", container="real")).collect()
        assert sorted(map(tuple, raw)) == sorted(map(tuple, mp4))

    def test_jpeg_decodes_through_decode_image(self):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.multimodal import (
            decode_image,
        )

        px = RNG.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
        out = decode_image(make_jpeg(px, quality=100))
        assert out.shape == px.shape
        assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 3
