"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

Images here are decoded for real in all three formats: the engine's own
raw-chip format (C-order numpy bytes + height/width/bands/dtype columns —
see sources/chips.py) via ``np.frombuffer``, PNG streams via the
pure-stdlib codec in :mod:`..sources.png` (zlib inflate + scanline
unfilter, all five PNG filters), and baseline JPEG via the pure-numpy
codec in :mod:`..sources.jpeg` (marker parse, stream-declared Huffman
tables, dequant + orthonormal IDCT, JFIF color).  Video is real for raw
frame-packed clips AND for MJPEG-in-AVI (stdlib RIFF walk in
:mod:`..sources.avi` + the JPEG decoder — intra-frame codecs need no
ffmpeg).  Only INTER-frame codecs (H.264/VP9 motion compensation) remain
behind ``NotImplementedError`` — those genuinely need ffmpeg/pyav — with
the Spark-side plumbing (schema, batching, UDF signature, partitioning)
identical to the real branches.

All operators are ``mapInPandas`` stages: Arrow moves the binary batches,
numpy does the math, nothing is per-row Python beyond the ndarray reshape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import jpeg, png
from ..sources.chips import decode_payload

_SUPPORTED_FORMATS = {"raw", "png", "jpeg"}


def _decode(payload: bytes, fmt: str, dtype: str, h: int, w: int, bands: int) -> np.ndarray:
    if fmt in ("png", "jpeg"):
        arr = (
            png.decode_png(payload) if fmt == "png" else jpeg.decode_jpeg(payload)
        )
        got_bands = 1 if arr.ndim == 2 else arr.shape[2]
        if arr.shape[0] != h or arr.shape[1] != w or got_bands != bands:
            raise ValueError(
                f"{fmt} decoded to {arr.shape}, metadata says ({h},{w},{bands})"
            )
        return arr
    if fmt not in _SUPPORTED_FORMATS:
        # STUB: video decode needs ffmpeg/pyav (absent here).  In
        # production this branch calls the codec; the surrounding plumbing
        # (schema, batching, stats) is identical.
        raise NotImplementedError(f"codec '{fmt}' not available in this environment")
    return decode_payload(payload, dtype, h, w, bands)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("nonzero_frac", T.DoubleType()),
    ]
)


def image_stats(chips: DataFrame, fmt: str = "raw") -> DataFrame:
    """Feature extraction: per-chip intensity statistics (the shape of any
    embed/score stage — swap the kernel, keep the plumbing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.status != "ok":
                    continue
                arr = _decode(r.payload, fmt, r.dtype, r.height, r.width, r.bands)
                a = arr.astype(np.float64)
                rows.append(
                    {
                        "tile_id": r.tile_id,
                        "dataset": r.dataset,
                        "mean": float(a.mean()),
                        "std": float(a.std()),
                        "min": float(a.min()),
                        "max": float(a.max()),
                        "nonzero_frac": float((a != 0).mean()),
                    }
                )
            yield pd.DataFrame(rows)

    cols = ["tile_id", "dataset", "payload", "dtype", "height", "width", "bands", "status"]
    return chips.select(*cols).mapInPandas(run, IMAGE_STATS_SCHEMA)


BAND_STATS_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sum_val", T.LongType()),
        T.StructField("min_val", T.LongType()),
        T.StructField("max_val", T.LongType()),
        T.StructField("n_zero", T.LongType()),
    ]
)


def band_stats(chips: DataFrame, fmt: str = "raw") -> DataFrame:
    """Per-BAND exact-integer chip statistics (sum / min / max / zero-pixel
    count) — integer reductions so a SQL oracle can reproduce them without
    float accumulation-order concerns.  One row per (tile, band)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.status != "ok":
                    continue
                arr = _decode(r.payload, fmt, r.dtype, r.height, r.width, r.bands)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                a = arr.astype(np.int64)
                for b in range(a.shape[2]):
                    ab = a[:, :, b]
                    rows.append(
                        {
                            "tile_id": r.tile_id,
                            "dataset": r.dataset,
                            "band": b,
                            "sum_val": int(ab.sum()),
                            "min_val": int(ab.min()),
                            "max_val": int(ab.max()),
                            "n_zero": int((ab == 0).sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    cols = ["tile_id", "dataset", "payload", "dtype", "height", "width", "bands", "status"]
    return chips.select(*cols).mapInPandas(run, BAND_STATS_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def bilinear_resize_uint8(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Order-1 resize in EXACT integer arithmetic (half-pixel-center
    convention, edge clamp, round-half-up): source coordinate
    sy = ((2i+1)*h - out_h) / (2*out_h), weights kept as integer
    numerators over the denominator 2*out_h x 2*out_w — so a SQL oracle
    replays every output byte with the literally identical integer ops
    (float bilinear would diverge in the last ulp between engines)."""
    h, w = arr.shape[:2]
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    deny, denx = 2 * out_h, 2 * out_w

    def split(t: np.ndarray, den: int, n: int):
        t = np.maximum(t, 0)
        i0 = t // den
        f = t - i0 * den
        over = i0 >= n - 1
        i0 = np.where(over, n - 1, i0)
        f = np.where(over, 0, f)
        return i0, np.minimum(i0 + 1, n - 1), f

    y0, y1, fy = split(
        (2 * np.arange(out_h, dtype=np.int64) + 1) * h - out_h, deny, h
    )
    x0, x1, fx = split(
        (2 * np.arange(out_w, dtype=np.int64) + 1) * w - out_w, denx, w
    )
    a = arr.astype(np.int64)
    p00 = a[y0][:, x0]
    p01 = a[y0][:, x1]
    p10 = a[y1][:, x0]
    p11 = a[y1][:, x1]
    fyc = fy[:, None, None]
    fxc = fx[None, :, None]
    num = (deny - fyc) * ((denx - fxc) * p00 + fxc * p01) + fyc * (
        (denx - fxc) * p10 + fxc * p11
    )
    D = deny * denx
    out = ((num + D // 2) // D).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def resize_chips(
    chips: DataFrame,
    out_h: int,
    out_w: int,
    fmt: str = "raw",
    mode: str = "nearest",
) -> DataFrame:
    """Chip resize: ``mode='nearest'`` (order-0, the reference's mosaic
    resize mode, ``cmds.py:614`` ``resize(..., order=0)``, pure index
    sampling) or ``mode='bilinear'`` (order-1 in exact integer arithmetic
    — see :func:`bilinear_resize_uint8` — the DL-preprocessing resize,
    SQL-oracle-checkable byte for byte)."""
    if mode not in ("nearest", "bilinear"):
        raise ValueError(f"mode must be nearest|bilinear, got {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.status != "ok":
                    continue
                arr = _decode(r.payload, fmt, r.dtype, r.height, r.width, r.bands)
                if mode == "bilinear":
                    if arr.dtype != np.uint8:
                        # astype(uint8) would silently WRAP uint16/float32
                        # payloads (both exist in sources/datasets.py) and
                        # the row metadata would then lie about the payload
                        # itemsize — refuse instead of corrupting.
                        raise ValueError(
                            "bilinear resize supports uint8 chips only, got "
                            f"dtype={arr.dtype} for tile {r.tile_id}; "
                            "range/value-map to uint8 first"
                        )
                    out = bilinear_resize_uint8(arr, out_h, out_w)
                    out_dtype = "uint8"
                else:
                    yi = (np.arange(out_h) * r.height // out_h).astype(np.int64)
                    xi = (np.arange(out_w) * r.width // out_w).astype(np.int64)
                    out = arr[np.ix_(yi, xi)] if arr.ndim == 2 else arr[np.ix_(yi, xi)]
                    out_dtype = str(out.dtype)
                rows.append(
                    {
                        "tile_id": r.tile_id,
                        "dataset": r.dataset,
                        "height": out_h,
                        "width": out_w,
                        "bands": int(r.bands),
                        "dtype": out_dtype,
                        "payload": np.ascontiguousarray(out).tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    cols = ["tile_id", "dataset", "payload", "dtype", "height", "width", "bands", "status"]
    return chips.select(*cols).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def frame_sample(
    media: DataFrame, every_n: int, fmt: str = "video/raw"
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (frames 0, every_n, 2*every_n, ...), each a single-image payload the
    rest of the image pipeline (stats/resize/decode) consumes directly.

    REAL for ``video/raw`` — a clip is ``n_frames`` C-order raw frames
    concatenated, so slicing frame k is one ``np.frombuffer`` view at
    offset ``k * h * w * bands`` (times itemsize); no codec involved.

    REAL for ``video/mjpeg-avi`` (round 6, closing the last stub) —
    Motion-JPEG is intra-frame, so a sampled frame is just the ``00dc``
    chunk the stdlib RIFF walk (:func:`..sources.avi.parse_avi_mjpeg`)
    extracts; the emitted payload is that standalone baseline-JPEG
    stream, which the downstream image operators decode with
    ``fmt='jpeg'`` (the pure-numpy codec in :mod:`..sources.jpeg`).
    Note a container walk touches only the sampled chunk headers — no
    decode cost is paid for skipped frames, exactly the production
    keyframe-seek behavior.

    INTER-frame containers (mp4/h264/vp9/...) raise
    ``NotImplementedError``: motion-compensated codecs genuinely need
    ffmpeg/pyav (absent here); in production that branch seeks to the
    nearest keyframe and decodes forward inside the same Arrow batch,
    with identical output schema.

    ``media`` needs (tile_id, dataset, height, width, bands, dtype,
    n_frames, payload)."""
    if fmt not in ("video/raw", "video/mjpeg-avi"):
        def stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for _pdf in batches:
                raise NotImplementedError(
                    f"video container '{fmt}' requires pyav/ffmpeg (absent); "
                    "raw clips decode via fmt='video/raw', Motion-JPEG AVI "
                    "via fmt='video/mjpeg-avi'"
                )

        return media.mapInPandas(stub, FRAME_SCHEMA)

    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    if fmt == "video/mjpeg-avi":
        from ..sources.avi import parse_avi_mjpeg

        def run_avi(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    clip = parse_avi_mjpeg(r.payload)
                    if (
                        clip["width"] != int(r.width)
                        or clip["height"] != int(r.height)
                        or clip["n_frames"] != int(r.n_frames)
                    ):
                        raise ValueError(
                            f"clip {r.tile_id}: AVI header "
                            f"{clip['width']}x{clip['height']}x{clip['n_frames']} "
                            f"!= metadata {r.width}x{r.height}x{r.n_frames}"
                        )
                    for k in range(0, clip["n_frames"], every_n):
                        rows.append(
                            {
                                "tile_id": r.tile_id,
                                "dataset": r.dataset,
                                "frame_idx": k,
                                "height": int(r.height),
                                "width": int(r.width),
                                "bands": int(r.bands),
                                "dtype": str(r.dtype),
                                "payload": clip["frames"][k],
                            }
                        )
                if rows:
                    yield pd.DataFrame(rows)

        cols = [
            "tile_id", "dataset", "height", "width", "bands", "dtype",
            "n_frames", "payload",
        ]
        return media.select(*cols).mapInPandas(run_avi, FRAME_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frame_bytes = (
                    int(r.height) * int(r.width) * int(r.bands)
                    * np.dtype(r.dtype).itemsize
                )
                if len(r.payload) != int(r.n_frames) * frame_bytes:
                    raise ValueError(
                        f"clip {r.tile_id}: payload {len(r.payload)}B != "
                        f"{r.n_frames} frames x {frame_bytes}B"
                    )
                for k in range(0, int(r.n_frames), every_n):
                    rows.append(
                        {
                            "tile_id": r.tile_id,
                            "dataset": r.dataset,
                            "frame_idx": k,
                            "height": int(r.height),
                            "width": int(r.width),
                            "bands": int(r.bands),
                            "dtype": str(r.dtype),
                            "payload": bytes(
                                r.payload[k * frame_bytes : (k + 1) * frame_bytes]
                            ),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    cols = [
        "tile_id", "dataset", "height", "width", "bands", "dtype",
        "n_frames", "payload",
    ]
    return media.select(*cols).mapInPandas(run, FRAME_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "tile_id string, n_samples int, duration_sec double, rms double, "
    "peak int, zero_crossings int"
)


AUDIO_AUTOCORR_SCHEMA = "tile_id string, lag int, acorr long"


def audio_autocorr(audio: DataFrame, lags: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """Spectral-shape features as EXACT integers: raw autocorrelation
    ``sum(x[i] * x[i+L])`` of the int16 PCM samples at fixed lags — the
    periodicity signal an FFT would estimate, but in int64 arithmetic a
    SQL oracle reproduces bit-for-bit (float FFTs diverge in the last ulp
    between engines).  One row per (clip, lag)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.frombuffer(r.payload, dtype="<i2").astype(np.int64)
                # lag >= n yields NO row (not acorr=0): the SQL twin's
                # per-lag group is empty for such clips, and emitting a
                # zero here would diverge from the oracle on clips shorter
                # than the largest lag.
                for lag in lags:
                    if lag >= len(x):
                        continue
                    rows.append(
                        {
                            "tile_id": r.tile_id,
                            "lag": lag,
                            "acorr": int(np.sum(x[:-lag] * x[lag:])),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return audio.select("tile_id", "payload").mapInPandas(
        run, AUDIO_AUTOCORR_SCHEMA
    )


def audio_stats(audio: DataFrame) -> DataFrame:
    """REAL (non-stub) audio decode + reduce: raw PCM int16-LE payloads need
    no codec library — ``np.frombuffer`` per clip, then exact-integer
    reductions (sum of squares, peak, sign-change count) so the DuckDB twin
    (``oracle_sql.audio_stats_pattern_oracle_sql``) reproduces every value
    bit-for-bit — a payload mis-decode (endianness, width, offset) breaks
    the hash match.  rms = round(sqrt(sum_sq/n), 6) with the division done
    in float64 in both engines (identical IEEE order)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.frombuffer(r.payload, dtype="<i2").astype(np.int64)
                sum_sq = int(np.sum(x * x))
                n = len(x)
                pos = x >= 0
                rows.append(
                    {
                        "tile_id": r.tile_id,
                        "n_samples": n,
                        "duration_sec": round(n / r.sample_rate, 6),
                        "rms": float(np.round(np.sqrt(sum_sq / n), 6)),
                        "peak": int(np.abs(x).max()),
                        "zero_crossings": int(
                            np.count_nonzero(pos[:-1] != pos[1:])
                        ),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return audio.select(
        "tile_id", "sample_rate", "payload"
    ).mapInPandas(run, AUDIO_STATS_SCHEMA)


CONTENT_HASH_SCHEMA = "media_ref string, chash string, n_pixels int"


def chip_content_hash(chips: DataFrame, fmt: str = "raw") -> DataFrame:
    """Content address of each chip's DECODED pixels: md5 over the pixel
    values serialized as comma-joined decimal ints in (band, y, x) order —
    a canonical form a SQL twin reproduces exactly (DuckDB:
    ``md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY b, y, x))``), unlike
    a raw-byte hash whose NUL bytes SQL strings cannot carry.  One row per
    chip: ``(media_ref = dataset/tile_id, chash, n_pixels)``.

    This is the media half of multimodal dedup
    (:func:`..operators.dedup.multimodal_dedup`): two documents embedding
    byte-identical images hash together even when their media_refs differ,
    and a single mis-decoded byte anywhere breaks the value hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.status != "ok":
                    continue
                arr = _decode(r.payload, fmt, r.dtype, r.height, r.width, r.bands)
                if arr.ndim == 2:
                    flat = arr.astype(np.int64).ravel()
                else:
                    flat = arr.astype(np.int64).transpose(2, 0, 1).ravel()
                csv = ",".join(map(str, flat.tolist()))
                rows.append(
                    {
                        "media_ref": f"{r.dataset}/{r.tile_id}",
                        "chash": hashlib.md5(csv.encode()).hexdigest(),
                        "n_pixels": int(flat.size),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    cols = ["tile_id", "dataset", "payload", "dtype", "height", "width", "bands", "status"]
    return chips.select(*cols).mapInPandas(run, CONTENT_HASH_SCHEMA)


DHASH_SCHEMA = (
    "tile_id string, media_ref string, dhash string, h_hi long, h_lo long"
)


def image_dhash(chips: DataFrame, fmt: str = "raw") -> DataFrame:
    """Perceptual difference hash (dHash) per chip — the near-duplicate
    signature for IMAGES the way MinHash is for text: grayscale by
    exact-integer floor-mean over bands, resize to 8x9 with
    :func:`bilinear_resize_uint8` (the byte-exact integer resize a SQL
    twin replays), then 64 bits ``g[y, x+1] > g[y, x]`` row-major.  A
    re-encode / small perturbation moves few bits; distinct images land
    ~32 bits apart.

    Output: the 64-char '0'/'1' string (segment keys for the pigeonhole
    join) plus the hash split into two 32-bit halves ``(h_hi, h_lo)`` so
    the exact Hamming refine is ``bit_count(xor)`` on longs in BOTH
    engines — never 64 per-character comparisons in the hot join path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.status != "ok":
                    continue
                arr = _decode(r.payload, fmt, r.dtype, r.height, r.width, r.bands)
                if arr.ndim == 3:
                    gray = (
                        arr.astype(np.int64).sum(axis=2) // arr.shape[2]
                    ).astype(np.uint8)
                else:
                    gray = arr.astype(np.uint8)
                g = bilinear_resize_uint8(gray, 8, 9).astype(np.int64)
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8).ravel()
                bstr = "".join("1" if b else "0" for b in bits)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                rows.append(
                    {
                        "tile_id": r.tile_id,
                        "media_ref": f"{r.dataset}/{r.tile_id}",
                        "dhash": bstr,
                        "h_hi": int(val >> 32),
                        "h_lo": int(val & 0xFFFFFFFF),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    cols = ["tile_id", "dataset", "payload", "dtype", "height", "width", "bands", "status"]
    return chips.select(*cols).mapInPandas(run, DHASH_SCHEMA)


AUDIO_FP_SCHEMA = "tile_id string, dhash string, h_hi long, h_lo long"


def audio_fingerprint(audio: DataFrame, n_windows: int = 65) -> DataFrame:
    """Perceptual audio fingerprint — the waveform analog of
    :func:`image_dhash`, all exact-integer so a SQL twin re-derives every
    bit: the int16 PCM clip splits into ``n_windows`` ragged windows
    (sample i -> window ``(i * W) // n``, the same integer assignment in
    both engines), the envelope is the window's sum of |x|, and bit k is
    ``env[k+1] > env[k]`` — 64 bits of loudness CONTOUR, robust to small
    sample perturbations, ~32 bits apart for unrelated clips.  Output
    schema matches :data:`DHASH_SCHEMA` minus media_ref, so
    :func:`..operators.dedup.dhash_hamming_pairs` pairs audio unchanged —
    one near-dup join shape across text/image/audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = np.abs(np.frombuffer(r.payload, dtype="<i2").astype(np.int64))
                n = len(x)
                k = (np.arange(n, dtype=np.int64) * n_windows) // n
                env = np.bincount(k, weights=x, minlength=n_windows).astype(
                    np.int64
                )
                bits = (env[1:] > env[:-1]).astype(np.uint8)
                bstr = "".join("1" if b else "0" for b in bits)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                rows.append(
                    {
                        "tile_id": r.tile_id,
                        "dhash": bstr,
                        "h_hi": int(val >> 32),
                        "h_lo": int(val & 0xFFFFFFFF),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return audio.select("tile_id", "payload").mapInPandas(run, AUDIO_FP_SCHEMA)
