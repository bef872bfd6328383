"""MJPEG-in-AVI container codec (pure stdlib) + deterministic clip source.

Round 6 closes the engine's last stub: compressed video.  The claim that
video "genuinely needs ffmpeg" is only true for INTER-frame codecs
(H.264/VP9 motion compensation); Motion-JPEG is intra-frame — every frame
is a standalone baseline JPEG — and its AVI container is a trivial RIFF
chunk walk (Microsoft AVI RIFF File Reference, a public spec).  So
compressed video = this module's container walk + the existing pure-numpy
JPEG decoder (:mod:`.jpeg`), through the existing ``frame_sample`` →
``image_stats`` plumbing in :mod:`..operators.multimodal`.

Inter-frame codecs remain environment-limited: decoding them requires
ffmpeg/pyav (absent here) and ``frame_sample`` keeps raising
``NotImplementedError`` for those formats.  In production that branch
seeks to the nearest keyframe and decodes forward inside the same Arrow
batch with the identical output schema.

Reference analog: the chip decode path ``geetiles/partitions.py:441-445``
(the reference reads chips through rasterio; it has no video support at
all — this modality is part of the training-data-pipeline surface).

Verification strategy for a LOSSY codec: clips are generated so every
8x8 block of every frame is CONSTANT.  A constant block survives JPEG
bit-exactly in a data-independent way — its DCT has only the DC
coefficient, so decode(encode(v)) is a fixed 256-entry map
``v -> dc_value_map(quality)[v]`` obtained by round-tripping one frame
containing all 256 values through the real encoder+decoder.  The DuckDB
oracle embeds that map as literals (the semantic_dedup
deterministic-centroid trick) and re-derives every decoded pixel, so the
container walk, entropy decode, dequant, IDCT and rounding are ALL inside
the value hash.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .datasets import pattern_seed
from .jpeg import decode_jpeg, encode_jpeg

# ------------------------------------------------------------- container --


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + LE size + body, padded to a word boundary
    (the pad byte is NOT counted in the size)."""
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Minimal spec-valid AVI wrapping baseline-JPEG frames as one 'vids'
    stream (handler 'MJPG'): LIST hdrl (avih + LIST strl (strh + strf)),
    LIST movi of '00dc' chunks, and an idx1 index."""
    if not frames:
        raise ValueError("empty clip")
    maxb = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxb * fps,        # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        maxb,              # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0, 0, 0, 0,    # dwFlags, wPriority, wLanguage, dwInitialFrames
            1, fps,        # dwScale / dwRate = frame period
            0, len(frames),
            maxb, 0xFFFFFFFF, 0,  # buffer, quality, sample size
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    # idx1 offsets are relative to the start of the 'movi' fourcc
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) & 1)
    riff_body = b"AVI " + hdrl + _list(b"movi", movi_body) + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_size) for chunks in data[pos:end];
    ValueError on any truncation."""
    while pos + 8 <= end:
        fourcc = bytes(data[pos : pos + 4])
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"truncated {fourcc!r} chunk")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi_mjpeg(data: bytes) -> dict:
    """RIFF/AVI walk -> {'width','height','n_frames','frames': [jpeg
    bytes, ...]}.  Strict ValueError contract (same as the PNG/JPEG
    decoders): bad magic, truncated chunks, missing hdrl/avih/movi all
    raise ValueError; the JPEG payloads themselves are NOT decoded here
    (that's the image decoder's job downstream)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF payload")
    avih = None
    frames: list[bytes] = []
    saw_movi = False
    for fourcc, bpos, bsize in _walk(data, 12, 8 + riff_size):
        if fourcc != b"LIST":
            continue
        listtype = bytes(data[bpos : bpos + 4])
        if listtype == b"hdrl":
            for f2, p2, s2 in _walk(data, bpos + 4, bpos + bsize):
                if f2 == b"avih":
                    if s2 < 40:
                        raise ValueError("avih too short")
                    vals = struct.unpack("<10I", data[p2 : p2 + 40])
                    avih = {"n_frames": vals[4], "width": vals[8], "height": vals[9]}
        elif listtype == b"movi":
            saw_movi = True
            for f2, p2, s2 in _walk(data, bpos + 4, bpos + bsize):
                # '##dc' compressed / '##db' uncompressed video chunks
                if f2[2:4] in (b"dc", b"db") and f2[:2].isdigit():
                    frames.append(bytes(data[p2 : p2 + s2]))
    if avih is None:
        raise ValueError("missing hdrl/avih header")
    if not saw_movi:
        raise ValueError("missing movi list")
    if len(frames) != avih["n_frames"]:
        raise ValueError(
            f"avih declares {avih['n_frames']} frames, movi holds {len(frames)}"
        )
    return {**avih, "frames": frames}


# ------------------------------------------------- DC-exact clip source ---


def dc_value_map(quality: int) -> list[int]:
    """The 256-entry map v -> decoded pixel value for a CONSTANT 8x8 block
    at this quality, obtained by round-tripping ONE 128x128 frame holding
    all 256 values as constant blocks through the real encoder+decoder
    (so the batched-matmul DCT/IDCT float path is byte-identical to what
    any multi-block frame sees).  Data-independent — safe to embed as SQL
    literals, exactly like semantic_dedup's centroid literals."""
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    frame = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(frame, quality=quality))
    blocks = out.reshape(16, 8, 16, 8).transpose(0, 2, 1, 3).reshape(256, 64)
    if not (blocks == blocks[:, :1]).all():
        raise AssertionError("constant block did not survive DC-only roundtrip")
    return [int(b) for b in blocks[:, 0]]


def pattern_frame(
    tile_id: str, dataset: str, frame_idx: int, height: int, width: int
) -> np.ndarray:
    """Grayscale frame of CONSTANT 8x8 blocks: block b (row-major) of frame
    f has value ``(seed + 7919*(f*n_blocks + b)) % 256`` — the PNG pattern
    recipe lifted to (frame, block) granularity so the SQL oracle
    re-derives every block value, then maps it through
    :func:`dc_value_map`.  height/width must be multiples of 8."""
    if height % 8 or width % 8:
        raise ValueError("pattern frames need multiple-of-8 dims")
    nby, nbx = height // 8, width // 8
    s = pattern_seed(tile_id, dataset)
    b = np.arange(nby * nbx, dtype=np.int64)
    v = (s + 7919 * (frame_idx * nby * nbx + b)) % 256
    return np.kron(
        v.reshape(nby, nbx).astype(np.uint8), np.ones((8, 8), dtype=np.uint8)
    )


MEDIA_SCHEMA = (
    "tile_id string, dataset string, height int, width int, bands int, "
    "dtype string, n_frames int, payload binary"
)


def generate_mjpeg_clips(
    tiles: DataFrame,
    dataset: str = "patternmjpeg-2020",
    n_frames: int = 6,
    height: int = 32,
    width: int = 32,
    quality: int = 90,
) -> DataFrame:
    """One REAL MJPEG-AVI clip per tile: ``n_frames`` DC-exact pattern
    frames, each encoded with the pure-numpy baseline JPEG encoder and
    wrapped in the RIFF container above.  Arrow-batched ``mapInPandas``,
    deterministic and partition-independent (per-tile seed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tid in pdf["tile_id"]:
                frames = [
                    encode_jpeg(pattern_frame(tid, dataset, f, height, width), quality=quality)
                    for f in range(n_frames)
                ]
                rows.append(
                    {
                        "tile_id": tid,
                        "dataset": dataset,
                        "height": height,
                        "width": width,
                        "bands": 1,
                        "dtype": "uint8",
                        "n_frames": n_frames,
                        "payload": encode_avi_mjpeg(frames, width, height),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return tiles.select("tile_id").mapInPandas(gen, MEDIA_SCHEMA)
