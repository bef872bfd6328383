"""Pure numpy/stdlib baseline JPEG codec (encode + decode).

Round 5 companion to :mod:`.png`: the multimodal docstrings claimed DCT
codecs "genuinely need a library" — they don't.  Baseline sequential JPEG
(ITU-T T.81) is: level shift -> 8x8 orthonormal DCT (one matrix product)
-> quantization -> zigzag -> DC-differential + run-length/magnitude
Huffman coding inside CRC-less marker segments.  Everything is numpy +
``struct``; no libjpeg.

Design choices for a dependency-free, verifiable codec:

* the encoder emits CUSTOM canonical Huffman tables (fixed, Kraft-valid
  length assignments declared below) in its DHT segments rather than the
  T.81 Annex-K defaults — any conformant decoder reads the tables from
  the stream, ours included.  Compression is a little worse than tuned
  tables; correctness is unaffected.
* 8-bit baseline only, grayscale or YCbCr (JFIF matrices) at 4:4:4 or
  4:2:0 (the dominant real-world layout: Y carries 4 blocks per MCU,
  chroma box-averaged 2x2 on encode and sample-repeated on decode).
  Progressive scans, arithmetic coding, restart markers, and sampling
  factors beyond 2 raise ``NotImplementedError`` (scope, not stubs: the
  decode path for everything the encoder can produce is real).
* JPEG is LOSSY, so unlike PNG there is no closed-form SQL oracle for
  decoded pixels; verification is pytest: DCT/IDCT orthonormality,
  hand-built Huffman bitstreams, roundtrip PSNR bounds, DC-only
  exactness, and the multimodal plumbing (tests/test_jpeg.py).

Scale note: entropy decode is a per-symbol Python loop (inherent bit
serialism), amortized per chip inside Arrow batches; the DCT/dequant math
is vectorized over all blocks at once.

THROUGHPUT CONTRACT (measured, BENCH/BASELINE.md "codec throughput"):
~490 chips/s, 5.3 ms/chip, **6.0 decoded MB/s per core** on 64x64x3
chips (16-bit-window LUT Huffman + batched matmul IDCT).  The bound is
the per-symbol entropy loop — inherent to Huffman bit serialism in
Python.  A 100-TB capacity plan must budget cores against that per-core
figure, or swap ``decode_jpeg`` for a native codec (libjpeg-turbo:
~200x) inside the identical Arrow plumbing — the swap point is this
function alone; schema, batching and downstream kernels are unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables --

# quantization (T.81 Annex K example tables are public; quality scaling is
# the libjpeg convention).  These two base tables ARE the Annex K examples.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _zigzag_order() -> np.ndarray:
    """(64, 2) row/col indices in JPEG zigzag order (anti-diagonals,
    direction alternating)."""
    out = []
    for d in range(15):
        ks = [(i, d - i) for i in range(max(0, d - 7), min(8, d + 1))]
        if d % 2 == 0:
            ks = ks[::-1]
        out.extend(ks)
    return np.array(out)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # block.flat order -> zigzag order
_UNZZ = np.argsort(_ZZ_FLAT)

# orthonormal DCT-II matrix: block_dct = C @ X @ C.T equals T.81's FDCT
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# custom canonical Huffman tables: (lengths-per-symbol declared in a fixed
# priority order).  DC: 12 category symbols.  AC: EOB, short runs, ZRL,
# then every remaining (run, size).  Kraft sums < 1, max length 12 <= 16.
def _canonical(symbols: list[int], lengths: list[int]):
    """(bits[17], ordered values, {sym: (code, len)}) for a canonical code
    where ``symbols[i]`` has code length ``lengths[i]`` (lengths must be
    non-decreasing)."""
    bits = [0] * 17
    for ln in lengths:
        bits[ln] += 1
    codes = {}
    code = 0
    prev_len = lengths[0]
    for sym, ln in zip(symbols, lengths):
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return bits, list(symbols), codes


_DC_SYMBOLS = list(range(12))
_DC_LENGTHS = [2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]


def _ac_symbol_priority() -> list[int]:
    syms = [0x00]  # EOB first (shortest code)
    for size in range(1, 5):
        syms.append(size)  # run 0, small sizes
    syms.append(0xF0)  # ZRL
    for run in range(16):
        for size in range(1, 11):
            s = (run << 4) | size
            if s not in syms:
                syms.append(s)
    return syms


_AC_SYMBOLS = _ac_symbol_priority()
_AC_LENGTHS = (
    [3] + [4] * 4 + [6] + [7] * 8 + [8] * 16 + [9] * 32 + [10] * 64 + [11] * 36
)
assert len(_AC_LENGTHS) == len(_AC_SYMBOLS) == 162

_DC_BITS, _DC_VALS, _DC_CODES = _canonical(_DC_SYMBOLS, _DC_LENGTHS)
_AC_BITS, _AC_VALS, _AC_CODES = _canonical(_AC_SYMBOLS, _AC_LENGTHS)


# ------------------------------------------------------------- bit writer --


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, extra-bits) magnitude coding: negatives use the one's-
    complement convention of T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    """Inverse of :func:`_magnitude` (T.81 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------- encoder ---


def _encode_component(
    writer: _BitWriter, blocks_q: np.ndarray, pred: int
) -> int:
    """Huffman-encode quantized zigzagged blocks (n, 64); returns the new
    DC predictor."""
    for blk in blocks_q:
        dc = int(blk[0])
        size, extra = _magnitude(dc - pred)
        pred = dc
        code, ln = _DC_CODES[size]
        writer.write(code, ln)
        if size:
            writer.write(extra, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = _AC_CODES[0xF0]
                writer.write(code, ln)
                run -= 16
            size, extra = _magnitude(v)
            code, ln = _AC_CODES[(run << 4) | size]
            writer.write(code, ln)
            writer.write(extra, size)
            run = 0
        if last_nz < 63:
            code, ln = _AC_CODES[0x00]
            writer.write(code, ln)
    return pred


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(table.reshape(-1)[i]) for i in _ZZ_FLAT)
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _plane_blocks_mcu(plane: np.ndarray, hi: int, vi: int, mcux: int, mcuy: int):
    """Quantize-ready 8x8 blocks of one component plane in MCU-interleaved
    order: for each MCU (row-major), the component's vi x hi sub-blocks in
    raster order — the T.81 interleave the decoder walks."""
    H, W = mcuy * 8 * vi, mcux * 8 * hi
    ph, pw = plane.shape
    padded = np.pad(plane, ((0, H - ph), (0, W - pw)), mode="edge")
    b = (
        padded.reshape(mcuy, vi, 8, mcux, hi, 8)
        .transpose(0, 3, 1, 4, 2, 5)  # (mcuy, mcux, vi, hi, 8, 8)
        .reshape(-1, 8, 8)
    )
    return b


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    (custom canonical Huffman tables, JFIF color).  ``subsampling``:
    '444' (no chroma subsampling) or '420' (chroma box-averaged 2x2 — the
    dominant real-world layout; Y carries 4 blocks per MCU)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8, got {arr.dtype}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # 2x2 box average on an edge-padded even grid
            he, we = h + (h & 1), w + (w & 1)
            def down(p):
                pp = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
                return (
                    pp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
                )
            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + [qc] * (ncomp - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_BITS, _DC_VALS)
    out += _dht_segment(0x10, _AC_BITS, _AC_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    comp_blocks = []
    for plane, q, (hi, vi) in zip(planes, quants, samps):
        blocks = _plane_blocks_mcu(plane, hi, vi, mcux, mcuy) - 128.0
        coeffs = np.matmul(np.matmul(_C, blocks), _C.T)
        qz = np.round(coeffs / q).astype(np.int64)
        zz = qz.reshape(-1, 64)[:, _ZZ_FLAT]
        # baseline AC magnitudes must fit 10 bits (T.81 table F.2); only
        # reachable at quality 100 (flat q=1) on pathological blocks
        zz[:, 1:] = np.clip(zz[:, 1:], -1023, 1023)
        comp_blocks.append(zz)
    preds = [0] * ncomp
    for m in range(mcux * mcuy):
        for ci in range(ncomp):
            hi, vi = samps[ci]
            nblk = hi * vi
            preds[ci] = _encode_component(
                writer,
                comp_blocks[ci][m * nblk : (m + 1) * nblk],
                preds[ci],
            )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder ---


class _BitReader:
    """MSB-first reader over the (unstuffed) entropy bytes, with a 16-bit
    peek window for table-driven Huffman decode.  Reads past the end see
    1-padding (the encoder pads the final byte with 1s), so a final EOB
    whose bits straddle the last byte still decodes; truly over-running
    the stream surfaces as an invalid code."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # absolute bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte : byte + 3]
        v = int.from_bytes(chunk + b"\xff" * (3 - len(chunk)), "big")
        return (v >> (8 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.data) * 8:
            raise ValueError("entropy stream exhausted")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


_TABLE_CACHE: dict = {}


def _decode_table(bits: list[int], vals: list[int]):
    """Flat 2^16 lookup: table[window] = (symbol, code length) for every
    16-bit window beginning with each code — one array access per symbol
    instead of a bit-by-bit trie walk.  Memoized on the DHT payload:
    chips of one dataset share tables, so the build cost is paid once per
    worker, not per image."""
    key = (bytes(bits), bytes(vals))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    lut = [None] * (1 << 16)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut[lo:hi] = [(vals[k], ln)] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    _TABLE_CACHE[key] = lut
    return lut


def _read_symbol(reader: _BitReader, lut) -> int:
    entry = lut[reader.peek16()]
    if entry is None:
        raise ValueError("invalid Huffman code in entropy stream")
    reader.skip(entry[1])
    return entry[0]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (h, w) or (h, w, 3).

    Supports what a conformant baseline stream with 1x1 sampling carries:
    stream-declared Huffman + quant tables, interleaved MCUs, byte
    stuffing.  Error contract (fuzz-pinned in tests): ``ValueError`` on
    ANY corruption — struct/index internals never leak — and
    ``NotImplementedError`` for progressive / subsampled / arithmetic /
    restart-interval streams.
    """
    try:
        return _decode_jpeg_impl(data)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") from e


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    sof = None
    comps = []
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ_FLAT] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                quant[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = [0] + list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError(f"precision {prec}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} (1x1/2x2 supported)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(f"non-baseline SOF marker {marker:#x}")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            tabs = {}
            for si in range(ns):
                cs, td_ta = body[1 + 2 * si : 3 + 2 * si]
                tabs[cs] = (td_ta >> 4, td_ta & 0xF)
            scan = (pos, tabs)
            break
        # else: APPn/COM etc — skipped
    if sof is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, nc = sof
    pos, tabs = scan
    # entropy segment runs to EOI; strip stuffed zero bytes
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    entropy = data[pos:end].replace(b"\xff\x00", b"\xff")
    reader = _BitReader(entropy)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    # Bomb guard (ADVICE r5): the coefficient arrays below are sized from
    # HEADER-declared dimensions, so a tiny corrupt payload could demand
    # gigabytes before entropy decode ever validates a bit.  Every decoded
    # block consumes >= 2 entropy bits (a 1-bit DC code + a 1-bit EOB), so
    # total blocks can never exceed 4 * entropy bytes — reject anything
    # past that bound as ValueError instead of allocating it.
    total_blocks = nmcu * sum(c["h"] * c["v"] for c in comps)
    if h * w > 1 << 28 or total_blocks > 4 * len(entropy):
        raise ValueError(
            f"declared {w}x{h}/{total_blocks} blocks exceeds what "
            f"{len(entropy)} entropy bytes could encode"
        )
    # entropy pass: pure-int symbol loop filling per-component
    # (n_blocks, 64) zigzag arrays in MCU-interleave order; all math after
    # this point is vectorized over every block of a component at once
    comp_zz = [
        np.zeros((nmcu * c["h"] * c["v"], 64), dtype=np.int64) for c in comps
    ]
    luts = [
        (huff[(0, tabs[c["id"]][0])], huff[(1, tabs[c["id"]][1])])
        for c in comps
    ]
    preds = [0] * nc
    for m in range(nmcu):
        for ci in range(nc):
            dc_lut, ac_lut = luts[ci]
            nblk = comps[ci]["h"] * comps[ci]["v"]
            for bi in range(nblk):
                z = [0] * 64
                size = _read_symbol(reader, dc_lut)
                preds[ci] += _extend(reader.read_bits(size), size)
                z[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(reader, ac_lut)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    z[k] = _extend(reader.read_bits(size), size)
                    k += 1
                comp_zz[ci][m * nblk + bi] = z
    planes = []
    for ci in range(nc):
        hi, vi = comps[ci]["h"], comps[ci]["v"]
        nb = nmcu * hi * vi
        coeffs = np.zeros((nb, 64), dtype=np.float64)
        coeffs[:, _ZZ_FLAT] = comp_zz[ci]
        blocks = coeffs.reshape(nb, 8, 8) * quant[comps[ci]["tq"]]
        pix = np.matmul(np.matmul(_C.T, blocks), _C) + 128.0
        # (mcuy, mcux, vi, hi, 8, 8) -> component plane, then upsample to
        # full resolution by sample repetition and crop
        plane = (
            pix.reshape(mcuy, mcux, vi, hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vi * 8, mcux * hi * 8)
        )
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise NotImplementedError(f"{nc}-component scan")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
