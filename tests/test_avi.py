"""Layer tests for the MJPEG-in-AVI container codec (sources/avi.py) and
the frame_sample -> image pipeline e2e — round 6's closure of the last
engine stub (compressed video).  Inter-frame codecs stay NotImplemented
(ffmpeg genuinely absent); that split is pinned here too."""

import struct

import pytest

from pyspark.sql import functions as F

from geetiles_spark.operators import multimodal
from geetiles_spark.sources import avi, jpeg


def _mk_frames(n=4, hw=32, quality=50):
    return [
        avi.pattern_frame(f"t{i}", "patternmjpeg-2020", i, hw, hw)
        for i in range(n)
    ]


class TestContainer:
    def test_roundtrip_exact_frame_bytes(self):
        frames = [jpeg.encode_jpeg(f, quality=50) for f in _mk_frames()]
        data = avi.encode_avi_mjpeg(frames, 32, 32)
        clip = avi.parse_avi_mjpeg(data)
        assert (clip["width"], clip["height"], clip["n_frames"]) == (32, 32, 4)
        assert clip["frames"] == frames

    def test_odd_length_frames_are_word_padded(self):
        # RIFF chunks pad to even offsets; the pad byte must not leak into
        # the extracted frame bytes
        frames = [b"\xff\xd8" + b"x" * 31 + b"\xff\xd9", b"\xff\xd8\xff\xd9"]
        assert len(frames[0]) % 2 == 1
        clip = avi.parse_avi_mjpeg(avi.encode_avi_mjpeg(frames, 8, 8))
        assert clip["frames"] == frames

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="RIFF"):
            avi.parse_avi_mjpeg(b"RIFX" + b"\x00" * 64)
        with pytest.raises(ValueError, match="RIFF"):
            avi.parse_avi_mjpeg(b"RIFF\x08\x00\x00\x00WAVE1234")

    def test_truncation_rejected(self):
        frames = [jpeg.encode_jpeg(f, quality=50) for f in _mk_frames(2)]
        data = avi.encode_avi_mjpeg(frames, 32, 32)
        with pytest.raises(ValueError, match="truncated"):
            avi.parse_avi_mjpeg(data[: len(data) // 2])

    def test_frame_count_mismatch_rejected(self):
        frames = [jpeg.encode_jpeg(f, quality=50) for f in _mk_frames(3)]
        data = bytearray(avi.encode_avi_mjpeg(frames, 32, 32))
        i = data.find(b"avih")
        struct.pack_into("<I", data, i + 8 + 16, 7)  # dwTotalFrames=7
        with pytest.raises(ValueError, match="declares 7 frames"):
            avi.parse_avi_mjpeg(bytes(data))

    def test_missing_movi_rejected(self):
        body = b"AVI " + avi._list(
            b"hdrl", avi._chunk(b"avih", b"\x00" * 56)
        )
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="movi"):
            avi.parse_avi_mjpeg(data)

    def test_empty_clip_rejected(self):
        with pytest.raises(ValueError, match="empty"):
            avi.encode_avi_mjpeg([], 8, 8)


class TestDcExactness:
    def test_map_is_decoded_constant_blocks(self):
        # a multi-block pattern frame decodes to exactly dc_value_map of
        # its block values — the property the SQL oracle relies on
        m = avi.dc_value_map(50)
        fr = avi.pattern_frame("tileX", "patternmjpeg-2020", 3, 32, 32)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(fr, quality=50))
        blocks = dec.reshape(4, 8, 4, 8).transpose(0, 2, 1, 3).reshape(16, 64)
        assert (blocks == blocks[:, :1]).all()
        vs = fr.reshape(4, 8, 4, 8).transpose(0, 2, 1, 3).reshape(16, 64)[:, 0]
        assert blocks[:, 0].tolist() == [m[v] for v in vs]

    def test_map_nontrivial_at_q50(self):
        m = avi.dc_value_map(50)
        assert any(m[v] != v for v in range(256))  # quantization visible
        assert all(0 <= d <= 255 for d in m)

    def test_pattern_frame_requires_multiple_of_8(self):
        with pytest.raises(ValueError, match="multiple-of-8"):
            avi.pattern_frame("t", "d", 0, 30, 32)


class TestSparkE2E:
    def test_frame_sample_to_image_stats(self, spark, tiles_box):
        clips = avi.generate_mjpeg_clips(
            tiles_box.limit(3), n_frames=4, height=32, width=32, quality=50
        )
        frames = multimodal.frame_sample(clips, every_n=2, fmt="video/mjpeg-avi")
        rows = frames.collect()
        assert len(rows) == 3 * 2  # frames 0 and 2 per clip
        assert {r["frame_idx"] for r in rows} == {0, 2}
        stats = multimodal.image_stats(
            frames.withColumn("status", F.lit("ok")),
            fmt="jpeg",
        ).collect()
        assert len(stats) == 6
        for r in stats:
            assert 0 <= r["mean"] <= 255

    def test_metadata_mismatch_raises(self, spark, tiles_box):
        clips = avi.generate_mjpeg_clips(tiles_box.limit(1), n_frames=4)
        bad = clips.withColumn(
            "n_frames", F.lit(9))
        with pytest.raises(Exception, match="metadata"):
            multimodal.frame_sample(bad, 2, fmt="video/mjpeg-avi").collect()

    def test_interframe_codecs_still_not_implemented(self, spark, tiles_box):
        clips = avi.generate_mjpeg_clips(tiles_box.limit(1), n_frames=2)
        with pytest.raises(Exception, match="ffmpeg"):
            multimodal.frame_sample(clips, 1, fmt="video/h264").collect()
