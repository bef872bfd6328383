"""Content-hash identifier kernels, bit-exact with the reference.

Reproduces ``get_region_hash`` / ``get_regionlist_hash``
(``/root/reference/geetiles/utils.py:232-250``): the tile identifier is
``sha256(str(np.round(envelope_ring_coords, 5))) % 10**15`` rendered as a
13-char zero-padded hex string, where ``envelope_ring_coords`` is the closed
5-point envelope ring in GEOS order.  We call numpy's own array ``str()`` so
formatting matches byte-for-byte.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .geom import box_ring, ring_bounds


def region_hash_from_ring(ring: np.ndarray) -> str:
    """Identifier of a geometry = hash of its (rounded) envelope ring."""
    minx, miny, maxx, maxy = ring_bounds(np.asarray(ring, dtype=np.float64))
    env = box_ring(minx, miny, maxx, maxy)
    return _digest(str(env.round(5)))


def region_hash_from_bounds(minx: float, miny: float, maxx: float, maxy: float) -> str:
    env = box_ring(minx, miny, maxx, maxy)
    return _digest(str(env.round(5)))


def _digest(s: str) -> str:
    k = int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % 10**15
    return str(hex(k))[2:].zfill(13)


def regionlist_hash(identifiers: list[str]) -> str:
    """Dataset-level hash: space-join of per-tile hashes in row order, then
    the same digest recipe (``utils.py:242-250``)."""
    return _digest(" ".join(identifiers))


def regionlist_hash_stream(identifiers) -> str:
    """Incremental :func:`regionlist_hash` over any iterable — feeds the
    sha256 as ids stream past, so a 10^12-row id list never materializes
    (``grid.dataset_hash`` pipes ``toLocalIterator`` through this)."""
    h = hashlib.sha256()
    first = True
    for ident in identifiers:
        if not first:
            h.update(b" ")
        h.update(ident.encode("utf-8"))
        first = False
    k = int(h.hexdigest(), 16) % 10**15
    return str(hex(k))[2:].zfill(13)


def _fmt_value(v: float) -> tuple[str, str]:
    """(signed_int_part, frac_digits) of the shortest decimal repr of a
    double that is the result of ``np.round(x, 5)`` — matches numpy's
    dragon4 'unique' positional formatting for such values (trailing zeros
    stripped; ``6.0 -> ('6', '')`` which renders as ``6.``)."""
    neg = v < 0 or (v == 0 and np.signbit(v))
    n = int(round(abs(v) * 1e5))
    ip, fp = divmod(n, 100000)
    frac = f"{fp:05d}".rstrip("0")
    sign = "-" if neg else ""
    return sign + str(ip), frac


def format_rounded_array(arr2d: np.ndarray) -> str:
    """Bit-exact replica of ``str(np.ndarray)`` for a 2-D float64 array whose
    values are outputs of ``np.round(x, 5)`` with ``|x| < 1e8`` (numpy's
    positional-notation regime).  numpy's array2string pads every element to
    a common decimal-point alignment: int parts right-justified to the max
    signed-int width, fractions left-justified to the max fraction width.

    The real ``str()`` costs ~82 us per 5x2 array (dragon4 + printoptions
    machinery); this replica costs ~2 us — it is the hot inner step of tile
    identifier hashing.  Parity is pinned by the Luxembourg golden dataset
    hash test and a property test against ``str()``.
    """
    parts = [[_fmt_value(float(v)) for v in row] for row in arr2d]
    pad_int = max(len(ip) for row in parts for ip, _ in row)
    pad_frac = max(len(fr) for row in parts for _, fr in row)
    rows = []
    for row in parts:
        cells = [
            ip.rjust(pad_int) + "." + fr.ljust(pad_frac) for ip, fr in row
        ]
        rows.append("[" + " ".join(cells) + "]")
    return "[" + "\n ".join(rows) + "]"


def region_hash_batch(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> np.ndarray:
    """Batched identifier computation for Arrow/pandas UDFs.

    Uses :func:`format_rounded_array` (exact ``str()`` replica, ~40x faster)
    — only 4 distinct values per envelope need formatting.
    """
    minx = np.round(np.asarray(minx, dtype=np.float64), 5)
    miny = np.round(np.asarray(miny, dtype=np.float64), 5)
    maxx = np.round(np.asarray(maxx, dtype=np.float64), 5)
    maxy = np.round(np.asarray(maxy, dtype=np.float64), 5)
    n = len(minx)
    # numpy's array2string switches to scientific notation when max >= 1e8,
    # min_nonzero < 1e-4, or max/min > 1000 — fall back to the real str()
    # for those (tiles touching the prime meridian / equator)
    stacked = np.stack([minx, miny, maxx, maxy], axis=1)
    absv = np.abs(stacked)
    nz = np.where(absv == 0, np.nan, absv)
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = np.nanmax(np.where(np.isnan(nz), -np.inf, nz), axis=1)
        mn = np.nanmin(np.where(np.isnan(nz), np.inf, nz), axis=1)
        exp_fmt = (mx >= 1e8) | (mn < 1e-4) | (mx / mn > 1000.0)
    exp_fmt |= ~np.isfinite(mx)  # all-zero rows: let numpy decide
    out = np.empty(n, dtype=object)
    for i in range(n):
        if exp_fmt[i]:
            out[i] = region_hash_from_bounds(minx[i], miny[i], maxx[i], maxy[i])
            continue
        x0, y0 = _fmt_value(minx[i]), _fmt_value(miny[i])
        x1, y1 = _fmt_value(maxx[i]), _fmt_value(maxy[i])
        pad_int = max(len(p[0]) for p in (x0, y0, x1, y1))
        pad_frac = max(len(p[1]) for p in (x0, y0, x1, y1))

        def c(p):
            return p[0].rjust(pad_int) + "." + p[1].ljust(pad_frac)

        cx0, cy0, cx1, cy1 = c(x0), c(y0), c(x1), c(y1)
        s = (
            "[[" + cx0 + " " + cy0 + "]\n [" + cx1 + " " + cy0 + "]\n ["
            + cx1 + " " + cy1 + "]\n [" + cx0 + " " + cy1 + "]\n ["
            + cx0 + " " + cy0 + "]]"
        )
        out[i] = _digest(s)
    return out
