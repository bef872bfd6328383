"""Baseline JPEG codec tests.

JPEG is lossy, so unlike PNG (byte-exact SQL oracle) verification is
structural + bounded-error: transform/entropy layers are checked exactly
in isolation (orthonormal DCT, canonical Huffman tables, magnitude
coding, hand-built bitstreams), the full codec via exactness on
DC-dominant content and PSNR bounds on structured content, and the Spark
plumbing via the multimodal ``fmt='jpeg'`` branch."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geetiles_spark.sources import jpeg


class TestBuildingBlocks:
    def test_dct_matrix_orthonormal(self):
        assert np.allclose(jpeg._C @ jpeg._C.T, np.eye(8), atol=1e-12)

    def test_zigzag_prefix_and_inverse(self):
        # the spec's first ten zigzag positions (row, col)
        expected = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                    (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
        assert [tuple(rc) for rc in jpeg._ZZ[:10]] == expected
        flat = np.arange(64)
        assert np.array_equal(flat[jpeg._ZZ_FLAT][jpeg._UNZZ], flat)

    def test_magnitude_coding_roundtrip(self):
        for v in [0, 1, -1, 2, -2, 127, -128, 1023, -1023, 2047, -2047]:
            size, bits = jpeg._magnitude(v)
            assert jpeg._extend(bits, size) == v
            assert size == (abs(v).bit_length() if v else 0)

    def test_canonical_tables_are_prefix_free(self):
        for codes in (jpeg._DC_CODES, jpeg._AC_CODES):
            as_bits = {
                format(c, f"0{ln}b") for c, ln in codes.values()
            }
            assert len(as_bits) == len(codes)
            for a in as_bits:
                for b in as_bits:
                    if a != b:
                        assert not b.startswith(a)

    def test_huffman_encode_decode_symmetry(self):
        # every symbol written by the writer is read back by the reader
        w = jpeg._BitWriter()
        syms = list(jpeg._AC_CODES)[::7]
        for s in syms:
            code, ln = jpeg._AC_CODES[s]
            w.write(code, ln)
        data = w.flush()
        lut = jpeg._decode_table(jpeg._AC_BITS, jpeg._AC_VALS)
        r = jpeg._BitReader(data)
        assert [jpeg._read_symbol(r, lut) for _ in syms] == syms

    def test_byte_stuffing(self):
        w = jpeg._BitWriter()
        w.write(0xFF, 8)
        w.write(0xFF, 8)
        data = w.flush()
        assert data == b"\xff\x00\xff\x00"
        r = jpeg._BitReader(data.replace(b"\xff\x00", b"\xff"))
        assert r.read_bits(16) == 0xFFFF


class TestCodec:
    def test_constant_image_within_one(self):
        for val in (0, 77, 128, 255):
            c = np.full((16, 24), val, dtype=np.uint8)
            d = jpeg.decode_jpeg(jpeg.encode_jpeg(c, quality=50))
            assert d.shape == c.shape
            assert np.abs(d.astype(int) - int(val)).max() <= 1

    def test_smooth_gradient_near_exact_q95(self):
        xx, yy = np.meshgrid(np.arange(32), np.arange(32))
        g = ((xx + yy) * 2).astype(np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 2

    def test_noise_psnr_bound_q95(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
        mse = np.mean((d.astype(float) - g.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 35

    def test_rgb_structured_psnr(self):
        xx, yy = np.meshgrid(np.arange(33), np.arange(31))
        img = np.stack(
            [(xx * 3 + yy * 2) % 256, (xx + yy * 4) % 256, (xx * 5) % 256],
            axis=2,
        ).astype(np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert d.shape == img.shape
        mse = np.mean((d.astype(float) - img.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 35

    def test_non_multiple_of_8_dims(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, size=(13, 19), dtype=np.uint8)
        assert jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90)).shape == (13, 19)

    def test_quality_monotonic(self):
        rng = np.random.default_rng(9)
        g = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
        errs = []
        for q in (30, 60, 95):
            d = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=q))
            errs.append(np.mean((d.astype(float) - g.astype(float)) ** 2))
        assert errs[0] >= errs[1] >= errs[2]

    def test_quality_100_flat_quant(self):
        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=100))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_420_roundtrip_structured(self):
        xx, yy = np.meshgrid(np.arange(33), np.arange(31))
        img = np.stack(
            [(xx * 3 + yy * 2) % 256, (xx + yy * 4) % 256, (xx * 5) % 256],
            axis=2,
        ).astype(np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsampling="420"))
        assert d.shape == img.shape
        mse = np.mean((d.astype(float) - img.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 33

    def test_420_constant_exact(self):
        c = np.full((20, 20, 3), 130, dtype=np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg(c, quality=80, subsampling="420"))
        assert np.abs(d.astype(int) - 130).max() <= 1

    def test_420_odd_dimensions(self):
        rng = np.random.default_rng(7)
        for shp in [(9, 9), (8, 16), (15, 7), (1, 1), (16, 17)]:
            a = rng.integers(0, 256, size=(*shp, 3), dtype=np.uint8)
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(a, 90, subsampling="420"))
            assert out.shape == a.shape

    def test_420_smaller_than_444_on_chroma_noise(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        assert len(jpeg.encode_jpeg(img, 85, "420")) < len(
            jpeg.encode_jpeg(img, 85, "444")
        )

    def test_errors(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg.decode_jpeg(b"\x89PNG" + b"\x00" * 32)
        g = np.zeros((8, 8), dtype=np.uint8)
        data = bytearray(jpeg.encode_jpeg(g))
        # flip SOF0 into progressive SOF2
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC2
        with pytest.raises(NotImplementedError, match="non-baseline"):
            jpeg.decode_jpeg(bytes(data))
        with pytest.raises(ValueError):
            jpeg.encode_jpeg(g.astype(np.int32))


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_decoder_error_contract_under_mutation(seed):
    """Byte flips / truncations decode or raise ValueError /
    NotImplementedError — struct/index internals never leak."""
    import random

    rng = random.Random(seed)
    base = bytearray(jpeg.encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8)))
    b = bytearray(base)
    if rng.random() < 0.5:
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    else:
        b = b[: rng.randrange(len(b))]
    try:
        jpeg.decode_jpeg(bytes(b))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_never_crashes_and_bounds_error(h, w, seed):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    d = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert d.shape == (h, w)
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 48  # q95 bound


class TestFrameSample:
    def _clips(self, spark, n_frames=7, h=4, w=5, bands=2):
        import pandas as pd

        rows = []
        for t in range(3):
            frames = np.arange(
                n_frames * h * w * bands, dtype=np.uint8
            ) + t
            rows.append(
                {
                    "tile_id": f"c{t}", "dataset": "vidtest",
                    "height": h, "width": w, "bands": bands,
                    "dtype": "uint8", "n_frames": n_frames,
                    "payload": frames.tobytes(),
                }
            )
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_raw_video_sampling(self, spark):
        from geetiles_spark.operators import multimodal

        out = multimodal.frame_sample(self._clips(spark), every_n=3).collect()
        # frames 0, 3, 6 per clip
        assert sorted((r.tile_id, r.frame_idx) for r in out) == [
            (f"c{t}", k) for t in range(3) for k in (0, 3, 6)
        ]
        fb = 4 * 5 * 2
        for r in out:
            exp = (np.arange(7 * fb, dtype=np.uint8) + int(r.tile_id[1]))[
                r.frame_idx * fb : (r.frame_idx + 1) * fb
            ]
            assert bytes(r.payload) == exp.tobytes()

    def test_sampled_frames_feed_image_stats(self, spark):
        """Output rows are single-image chip rows: the image kernel
        consumes them unchanged (status column added)."""
        from pyspark.sql import functions as F

        from geetiles_spark.operators import multimodal

        frames = multimodal.frame_sample(
            self._clips(spark), every_n=2
        ).withColumn("status", F.lit("ok"))
        stats = multimodal.image_stats(frames.withColumn(
            "tile_id", F.concat_ws("#", "tile_id", "frame_idx")
        ), fmt="raw").collect()
        assert len(stats) == 3 * 4  # frames 0,2,4,6

    def test_length_mismatch_raises(self, spark):
        import pandas as pd

        from geetiles_spark.operators import multimodal

        bad = spark.createDataFrame(pd.DataFrame([{
            "tile_id": "x", "dataset": "d", "height": 4, "width": 4,
            "bands": 1, "dtype": "uint8", "n_frames": 3,
            "payload": b"\x00" * 17,
        }]))
        with pytest.raises(Exception, match="payload"):
            multimodal.frame_sample(bad, every_n=1).collect()

    def test_compressed_container_raises(self, spark):
        from geetiles_spark.operators import multimodal

        with pytest.raises(Exception, match="ffmpeg"):
            multimodal.frame_sample(
                self._clips(spark), every_n=2, fmt="video/mp4"
            ).collect()


class TestSparkPlumbing:
    def test_image_stats_over_jpeg(self, spark, tiles_box):
        """fmt='jpeg' through the multimodal kernel: stats of the decoded
        chip must match stats of a local decode of the same payload."""
        import pandas as pd

        from geetiles_spark.operators import multimodal

        rng = np.random.default_rng(21)
        rows = []
        payloads = {}
        for i in range(6):
            xx, yy = np.meshgrid(np.arange(24), np.arange(24))
            arr = ((xx * (i + 2) + yy * 3) % 256).astype(np.uint8)
            p = jpeg.encode_jpeg(arr, quality=90)
            payloads[f"t{i}"] = p
            rows.append(
                {
                    "tile_id": f"t{i}", "dataset": "jpegtest", "height": 24,
                    "width": 24, "bands": 1, "dtype": "uint8",
                    "payload": p, "status": "ok",
                }
            )
        chips = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            r.tile_id: (r.mean, r.min, r.max)
            for r in multimodal.image_stats(chips, fmt="jpeg").collect()
        }
        assert len(got) == 6
        for tid, payload in payloads.items():
            local = jpeg.decode_jpeg(payload).astype(np.float64)
            assert got[tid] == (
                float(local.mean()), float(local.min()), float(local.max())
            )
