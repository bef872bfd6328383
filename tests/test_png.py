"""PNG codec tests: the compressed-image modality's real decode path.

Strategy mirrors the audio modality (sources/audio.py): golden per-filter
unfilter checks built from hand-constructed byte streams (decoder verified
independently of our encoder), encoder<->decoder round trips, an
externally-produced PNG, corruption/unsupported-feature behavior, a
hypothesis sweep, and the Spark-side stats pipeline against the closed-form
pattern."""

import base64
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geetiles_spark.sources import png


def _hand_png(h, w, ch, scanlines):
    """Build a PNG byte stream from explicit (filter_type, filtered_bytes)
    scanlines — no use of our encoder."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(bytes([f]) + bytes(row) for f, row in scanlines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )


class TestUnfilterGolden:
    """Each filter type against hand-computed reconstructions (PNG spec §9)."""

    def test_filter0_none(self):
        out = png.decode_png(_hand_png(2, 3, 1, [(0, [1, 2, 3]), (0, [4, 5, 6])]))
        assert out.tolist() == [[1, 2, 3], [4, 5, 6]]

    def test_filter1_sub(self):
        # recon[x] = filt[x] + recon[x-1]: [10, 10+5, 15+250 mod 256 = 9]
        out = png.decode_png(_hand_png(1, 3, 1, [(1, [10, 5, 250])]))
        assert out.tolist() == [[10, 15, 9]]

    def test_filter1_sub_respects_bpp(self):
        # RGB: left neighbor is 3 bytes back, lanes independent
        out = png.decode_png(_hand_png(1, 2, 3, [(1, [1, 2, 3, 10, 20, 30])]))
        assert out.reshape(-1).tolist() == [1, 2, 3, 11, 22, 33]

    def test_filter2_up(self):
        out = png.decode_png(
            _hand_png(2, 3, 1, [(0, [7, 8, 9]), (2, [1, 2, 250])])
        )
        assert out.tolist() == [[7, 8, 9], [8, 10, 3]]

    def test_filter3_average(self):
        # row0 recon = [100, 110]; row1: recon[0] = 6+(0+100)//2 = 56,
        # recon[1] = 10+(56+110)//2 = 93
        out = png.decode_png(
            _hand_png(2, 2, 1, [(0, [100, 110]), (3, [6, 10])])
        )
        assert out.tolist() == [[100, 110], [56, 93]]

    def test_filter4_paeth(self):
        # row0 = [50, 60]; row1: x=0 paeth(0,50,0)=50 -> 53;
        # x=1: a=53,b=60,c=50, p=63, pa=10,pb=3,pc=13 -> b=60 -> 64
        out = png.decode_png(
            _hand_png(2, 2, 1, [(0, [50, 60]), (4, [3, 4])])
        )
        assert out.tolist() == [[50, 60], [53, 64]]

    def test_mixed_filters_per_row(self):
        out = png.decode_png(
            _hand_png(3, 2, 1, [(0, [4, 8]), (2, [1, 1]), (1, [2, 3])])
        )
        assert out.tolist() == [[4, 8], [5, 9], [2, 5]]


class TestRoundTrip:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_all_channels_all_filters(self, ch, ft):
        rng = np.random.default_rng(ch * 10 + ft)
        a = rng.integers(0, 256, size=(11, 13, ch), dtype=np.uint8)
        out = png.decode_png(png.encode_png(a, filter_type=ft))
        assert np.array_equal(out, a[:, :, 0] if ch == 1 else a)

    def test_gray_2d_input(self):
        g = np.arange(35, dtype=np.uint8).reshape(5, 7)
        assert np.array_equal(png.decode_png(png.encode_png(g, filter_type=4)), g)

    def test_external_png_decodes(self):
        # widely-circulated 1x1 RGBA PNG produced by an external encoder
        b = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
            "+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg=="
        )
        out = png.decode_png(b)
        assert out.shape == (1, 1, 4)

    def test_multi_idat_streams_concatenate(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        data = png.encode_png(a, filter_type=0)
        # split the single IDAT into two chunks
        pos = 8
        chunks = []
        while pos + 12 <= len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            chunks.append((tag, body))
            pos += 12 + ln
        rebuilt = png.SIGNATURE
        for tag, body in chunks:
            if tag == b"IDAT":
                mid = len(body) // 2
                rebuilt += png._chunk(b"IDAT", body[:mid])
                rebuilt += png._chunk(b"IDAT", body[mid:])
            else:
                rebuilt += png._chunk(tag, body)
        assert np.array_equal(png.decode_png(rebuilt), a)


class TestErrors:
    def test_crc_corruption_raises(self):
        data = bytearray(png.encode_png(np.zeros((4, 4), dtype=np.uint8)))
        data[40] ^= 0xFF  # flip a byte inside IDAT body
        with pytest.raises(ValueError, match="CRC"):
            png.decode_png(bytes(data))

    def test_bad_signature_raises(self):
        with pytest.raises(ValueError, match="signature"):
            png.decode_png(b"JFIF" + b"\x00" * 64)

    def test_interlace_raises_notimplemented(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"\x00" * 6))
            + png._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="interlace"):
            png.decode_png(data)

    def test_16bit_raises_notimplemented(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + png._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="depth"):
            png.decode_png(data)

    def test_palette_raises_notimplemented(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + png._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="color type"):
            png.decode_png(data)

    def test_bad_length_raises(self):
        # valid stream but IHDR claims a bigger image than IDAT carries
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"\x00" * 5))
            + png._chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="length"):
            png.decode_png(data)

    def test_ancillary_chunks_skipped(self):
        a = np.full((2, 2), 9, dtype=np.uint8)
        data = png.encode_png(a)
        # inject a tEXt chunk between IHDR and IDAT
        ihdr_end = 8 + 12 + 13
        injected = (
            data[:ihdr_end]
            + png._chunk(b"tEXt", b"Comment\x00hello")
            + data[ihdr_end:]
        )
        assert np.array_equal(png.decode_png(injected), a)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_decoder_error_contract_under_mutation(seed):
    """Random byte flips and truncations of a valid stream must surface as
    ValueError/NotImplementedError (or decode) — zlib/struct internals
    never leak to callers."""
    import random

    rng = random.Random(seed)
    base = bytearray(png.encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8)))
    b = bytearray(base)
    if rng.random() < 0.5:
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    else:
        b = b[: rng.randrange(len(b))]
    try:
        png.decode_png(bytes(b))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    out = png.decode_png(png.encode_png(a, filter_type=ft))
    assert np.array_equal(out, a[:, :, 0] if ch == 1 else a)


class TestSparkPipeline:
    def test_fixture_covers_all_filter_types(self, spark, tiles_box):
        from geetiles_spark.sources.datasets import pattern_seed

        tids = [r.tile_id for r in tiles_box.select("tile_id").collect()]
        fts = {pattern_seed(t, "patternpng-2020") % 5 for t in tids}
        assert fts == {0, 1, 2, 3, 4}, f"fixture only exercises filters {fts}"

    def test_band_stats_over_png_matches_pattern(self, spark, tiles_box):
        from geetiles_spark.operators import multimodal

        chips = png.generate_png_chips(tiles_box, "patternpng-2020")
        got = {
            (r.tile_id, r.band): (r.sum_val, r.min_val, r.max_val, r.n_zero)
            for r in multimodal.band_stats(chips, fmt="png").collect()
        }
        tids = [r.tile_id for r in tiles_box.select("tile_id").collect()]
        assert len(got) == len(tids) * 3
        for t in tids:
            arr = png.pattern_pixels(t, "patternpng-2020", 24, 24, 3).astype(np.int64)
            for b in range(3):
                ab = arr[:, :, b]
                assert got[(t, b)] == (
                    int(ab.sum()),
                    int(ab.min()),
                    int(ab.max()),
                    int((ab == 0).sum()),
                )

    def test_image_stats_decodes_png_fmt(self, spark, tiles_box):
        """image_stats (the float-stats kernel) also takes fmt='png' — the
        decode branch is shared; needs the chip-schema columns present."""
        from geetiles_spark.operators import multimodal

        chips = png.generate_png_chips(tiles_box.limit(3), "patternpng-2020")
        out = multimodal.image_stats(chips, fmt="png").collect()
        assert len(out) == 3
        for r in out:
            t = png.pattern_pixels(r.tile_id, "patternpng-2020", 24, 24, 3)
            assert abs(r.mean - float(t.mean())) < 1e-9
