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


def region_hash_batch(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> np.ndarray:
    """Batched identifier computation for Arrow/pandas UDFs.

    The sha256 step is per-row by necessity (hash parity); the ring assembly
    and rounding are vectorized.
    """
    minx = np.asarray(minx, dtype=np.float64)
    n = len(minx)
    rings = np.empty((n, 5, 2), dtype=np.float64)
    rings[:, 0, 0] = minx
    rings[:, 0, 1] = miny
    rings[:, 1, 0] = maxx
    rings[:, 1, 1] = miny
    rings[:, 2, 0] = maxx
    rings[:, 2, 1] = maxy
    rings[:, 3, 0] = minx
    rings[:, 3, 1] = maxy
    rings[:, 4, 0] = minx
    rings[:, 4, 1] = miny
    rings = rings.round(5)
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = _digest(str(rings[i]))
    return out
