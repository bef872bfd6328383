"""True S2 cell ids — quadratic projection + Hilbert curve, vectorized numpy.

The north rule names "batched H3/S2 cell encoding" as a core operator.  The
engine's default cell index (:mod:`.cells`) is a flat equirectangular grid —
ideal for bbox coverings and SQL-checkable bit layouts, but its cells stretch
with latitude, so as a *partitioning key* at planetary scale it concentrates
polar data and its kNN ring bound needs a 1/cos(lat) stretch.  This module
implements the real thing from the published spec (the S2 geometry library's
cell-id scheme, s2geometry.io — public algorithm, re-implemented here in
vectorized numpy; no S2 library exists in this environment):

* 6 cube faces; gnomonic (u,v) per face; **quadratic** (u,v)->(s,t)
  reprojection (the library default) so cells have near-uniform sphere area;
* a 30-level quadtree per face, ordered by a face-local **Hilbert curve**
  (adjacent cells get adjacent ids — the locality property that makes the id
  a good range-partitioning / clustering key at 10^12 rows);
* 64-bit id = 3 face bits, 2*level Hilbert position bits, one trailing 1.

Ids are the S2 bit pattern reinterpreted as SIGNED int64 (Spark LongType):
faces 4-5 yield negative ids.  Equality joins / groupBys are unaffected;
range logic inside this module works on uint64 views.

Vectorization strategy: the Hilbert encode/decode processes i/j in 4-bit
chunks through precomputed 1024-entry lookup tables — 8 numpy fancy-indexing
steps per batch instead of a per-point Python loop, so a million points
encode in a few tens of ms inside an Arrow-batched pandas UDF.

Cross-encoder law (tested): any operator whose cell stage is a *candidate
generator* followed by an exact refine (kNN ring expansion, cell-join +
point-in-polygon refine) produces BIT-IDENTICAL results under this index and
under :mod:`.cells` — the index choice is a performance decision, never a
semantics decision.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_MAX_SIZE = 1 << MAX_LEVEL  # leaf cells per face edge
_SWAP = 1  # Hilbert orientation flags
_INVERT = 2

# Base Hilbert order: traversal position -> (i,j) sub-cell, per orientation,
# and the orientation adjustment each position applies to its children.
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order (i = bit1, j = bit0 of the entry)
    (0, 2, 3, 1),  # swapped
    (3, 2, 0, 1),  # inverted
    (3, 1, 0, 2),  # swapped + inverted
)
_POS_TO_ORIENT = (_SWAP, 0, 0, _SWAP | _INVERT)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """1024-entry tables mapping 4 quadtree levels at once.

    ``lookup_pos[(i4 << 6) | (j4 << 2) | orient] = (pos8 << 2) | orient'``
    ``lookup_ij[(pos8 << 2) | orient] = (i4 << 6) | (j4 << 2) | orient'``
    """
    ij_to_pos = [[0] * 4 for _ in range(4)]
    for o in range(4):
        for pos, ij in enumerate(_POS_TO_IJ[o]):
            ij_to_pos[o][ij] = pos
    lookup_pos = np.zeros(1 << 10, dtype=np.int64)
    lookup_ij = np.zeros(1 << 10, dtype=np.int64)
    for o0 in range(4):
        for i4 in range(16):
            for j4 in range(16):
                o = o0
                pos = 0
                for k in (3, 2, 1, 0):
                    ij = (((i4 >> k) & 1) << 1) | ((j4 >> k) & 1)
                    p = ij_to_pos[o][ij]
                    pos = (pos << 2) | p
                    o ^= _POS_TO_ORIENT[p]
                lookup_pos[(i4 << 6) | (j4 << 2) | o0] = (pos << 2) | o
                lookup_ij[(pos << 2) | o0] = (i4 << 6) | (j4 << 2) | o
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


# ---------------------------------------------------------------- projection


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, ...]:
    lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Largest-|component| face selection + per-face gnomonic (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    major = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    mval = np.choose(major, [x, y, z])
    face = np.where(mval >= 0, major, major + 3).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),      # +x
            (lambda: -x / y, lambda: z / y),     # +y
            (lambda: -x / z, lambda: -y / z),    # +z
            (lambda: z / x, lambda: y / x),      # -x
            (lambda: z / y, lambda: -x / y),     # -y
            (lambda: -y / z, lambda: -x / z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def face_uv_to_xyz(
    face: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    f = np.asarray(face, dtype=np.int64)
    x = np.select([f == i for i in range(6)], xs)
    y = np.select([f == i for i in range(6)], ys)
    z = np.select([f == i for i in range(6)], zs)
    return x, y, z


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic reprojection (library default): near-uniform cell areas."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both arms
        return np.where(
            u >= 0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0
    )


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(_MAX_SIZE * np.asarray(s, dtype=np.float64)), 0, _MAX_SIZE - 1
    ).astype(np.int64)


# -------------------------------------------------------------- Hilbert code


def leaf_from_face_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray
) -> np.ndarray:
    """Leaf (level-30) cell id from face + leaf grid coords. Vectorized:
    eight table lookups walk four quadtree levels each."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP
    for k in range(7, -1, -1):
        idx = (
            (((i >> (k * 4)) & 15) << 6) | (((j >> (k * 4)) & 15) << 2) | bits
        )
        val = _LOOKUP_POS[idx]
        n |= (val >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits = val & 3
    return ((n << np.uint64(1)) | np.uint64(1)).view(np.int64)


def to_face_ij(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`leaf_from_face_ij` for ids at ANY level — returns
    (face, i, j) where (i, j) are the leaf coords of the cell's min corner."""
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    face = (u >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    for k in range(7, -1, -1):
        nbits = 2 if k == 7 else 4
        chunk = ((u >> np.uint64(k * 8 + 1)) & np.uint64((1 << (2 * nbits)) - 1)).astype(
            np.int64
        )
        idx = (chunk << 2) | bits
        val = _LOOKUP_IJ[idx]
        i |= (val >> 6) << (k * 4)
        j |= ((val >> 2) & 15) << (k * 4)
        bits = val & 3
    return face, i, j


def lsb(cid: np.ndarray) -> np.ndarray:
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    return (u & (~u + np.uint64(1))).view(np.int64)


def level_of(cid: np.ndarray) -> np.ndarray:
    l = lsb(cid).view(np.uint64)
    # trailing-zeros via float64 exponent of the isolated bit (exact: lsb is
    # a power of two <= 2^60, well inside float64's integer range)
    tz = (np.log2(l.astype(np.float64)) + 0.5).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (caller guarantees level <= level_of(cid))."""
    u = np.asarray(cid, dtype=np.int64).view(np.uint64)
    new_lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return ((u & ~(new_lsb - np.uint64(1)) & ~new_lsb) | new_lsb).view(np.int64)


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Batched lon/lat -> S2 cell id at ``level`` (the north-rule encoder)."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    leaf = leaf_from_face_ij(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))
    return leaf if level >= MAX_LEVEL else parent(leaf, level)


def cell_center_lonlat(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    face, i, j = to_face_ij(cid)
    size = lsb(cid).view(np.uint64)  # lsb == size^2 in leaf units... see below
    # leaf span of a level-L cell along one axis = 2^(30-L); lsb = 2^(2*(30-L))
    span = np.sqrt(size.astype(np.float64)).astype(np.int64)
    si = (i & ~(span - 1)) * 2 + span  # center in half-leaf units (2^31 grid)
    tj = (j & ~(span - 1)) * 2 + span
    u = st_to_uv(si.astype(np.float64) / (2.0 * _MAX_SIZE))
    v = st_to_uv(tj.astype(np.float64) / (2.0 * _MAX_SIZE))
    x, y, z = face_uv_to_xyz(face, u, v)
    return (
        np.rad2deg(np.arctan2(y, x)),
        np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y))),
    )


# ---------------------------------------------------------------- neighbors


def _from_face_ij_wrap(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf id for (face, i, j) where i/j may be out of [0, 2^30) by up to
    one cell — wraps across the cube edge via the LINEAR uv extension (grid
    lines align exactly at face edges under the linear map, so the wrapped
    coordinate lands on the neighbor face's grid; spec behavior)."""
    i = np.clip(np.asarray(i, dtype=np.int64), -1, _MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, _MAX_SIZE)
    scale = 1.0 / _MAX_SIZE
    # clamp to 1 + DBL_EPSILON (spec): just enough overshoot to tip the
    # major-axis face selection, small enough (1e-16 << half-leaf 2^-31)
    # never to move an in-range coordinate across a cell boundary
    limit = 1.0 + np.finfo(np.float64).eps
    u = np.clip(scale * (2 * (i - _MAX_SIZE // 2) + 1), -limit, limit)
    v = np.clip(scale * (2 * (j - _MAX_SIZE // 2) + 1), -limit, limit)
    x, y, z = face_uv_to_xyz(np.asarray(face, dtype=np.int64), u, v)
    nface, nu, nv = xyz_to_face_uv(x, y, z)
    return leaf_from_face_ij(
        nface, st_to_ij(0.5 * (nu + 1.0)), st_to_ij(0.5 * (nv + 1.0))
    )


def edge_neighbors_batch(cids: np.ndarray, level: int) -> np.ndarray:
    """Edge-adjacent cells of N same-level cells, vectorized: returns a flat
    int64 array of <= 4N ids (face wraps included, duplicates possible)."""
    cids = np.asarray(cids, dtype=np.int64)
    face, i, j = to_face_ij(cids)
    size = 1 << (MAX_LEVEL - level)
    i &= ~(size - 1)
    j &= ~(size - 1)
    n = len(cids)
    f4 = np.tile(face, 4)
    ni = np.concatenate([i, i + size, i, i - size])
    nj = np.concatenate([j - size, j, j + size, j])
    inside = (ni >= 0) & (ni < _MAX_SIZE) & (nj >= 0) & (nj < _MAX_SIZE)
    leaf = np.empty(4 * n, dtype=np.int64)
    if inside.any():
        leaf[inside] = leaf_from_face_ij(f4[inside], ni[inside], nj[inside])
    if (~inside).any():
        leaf[~inside] = _from_face_ij_wrap(f4[~inside], ni[~inside], nj[~inside])
    return parent(leaf, level)


def edge_neighbors(cid: int) -> list[int]:
    """The 4 edge-adjacent cells at the SAME level (face wraps included)."""
    level = int(level_of(np.array([cid], dtype=np.int64))[0])
    return [int(c) for c in edge_neighbors_batch(np.array([cid]), level)]


def bfs_rings(cid: int, n_rings: int) -> list[np.ndarray]:
    """BFS layers over the edge+corner adjacency (edge neighbors of the cell
    and of its edge neighbors — handles cube corners, where a true diagonal
    neighbor may not exist, without special-casing).  layers[0] = [cid];
    layers 0..r jointly contain every cell within r king moves of ``cid``
    (the adjacency is a superset of king moves), which is the coverage
    property the kNN ring expansion needs.  A single BFS step can span up to
    TWO cells of distance — distance bounds must use 2r+1, see
    ``knn_join_cells(index='s2')``.  Vectorized per layer."""
    level = int(level_of(np.array([cid], dtype=np.int64))[0])
    layers = [np.array([cid], dtype=np.int64)]
    seen = np.array([cid], dtype=np.int64)
    for _ in range(n_rings):
        e1 = edge_neighbors_batch(layers[-1], level)
        ring = np.unique(np.concatenate([e1, edge_neighbors_batch(e1, level)]))
        nxt = ring[~np.isin(ring, seen)]
        if len(nxt) == 0:
            break
        seen = np.concatenate([seen, nxt])
        layers.append(nxt)
    return layers


def cover_bbox(
    minlon: float, minlat: float, maxlon: float, maxlat: float, level: int
) -> np.ndarray:
    """S2 cells at ``level`` covering a lon/lat bbox — a guaranteed SUPERSET
    of every cell containing a point of the bbox (the partition-pruning
    contract: pruning with this cover can drop only empty-for-this-AOI
    partitions, never a matching row).

    Method: encode a dense sample grid (step < min_width/sqrt(2), so every
    bbox point is closer than one cell's min width to a sample), then dilate
    by one king move.  Soundness: a great-circle segment shorter than the
    min cell width cannot fully traverse any intermediate cell, so the cell
    of any bbox point is within one king move of the cell of its nearest
    sample — and :func:`edge_neighbors_batch` applied twice is a superset of
    king adjacency.  No RegionCoverer needed for axis-aligned AOIs.
    """
    step_rad = min_width_rad(level) / 2.0
    step_lat = np.rad2deg(step_rad)
    # use the SMALLEST cos over the band so lon steps are dense enough there
    coslat = max(
        min(
            np.cos(np.deg2rad(np.clip(minlat, -89.9, 89.9))),
            np.cos(np.deg2rad(np.clip(maxlat, -89.9, 89.9))),
        ),
        1e-3,
    )
    step_lon = step_lat / coslat
    lons = np.arange(minlon, maxlon + step_lon, step_lon)
    lats = np.arange(minlat, maxlat + step_lat, step_lat)
    lons[-1] = maxlon
    lats[-1] = maxlat
    glon, glat = np.meshgrid(lons, lats)
    base = np.unique(cell_id(glon.ravel(), glat.ravel(), level))
    e1 = edge_neighbors_batch(base, level)
    return np.unique(
        np.concatenate([base, e1, edge_neighbors_batch(e1, level)])
    )


# Quadratic-projection metric constants (published): width/diag of a level-L
# cell in radians is deriv * 2^-L (min width lower-bounds any cell's extent;
# max diag upper-bounds it).  Used for the kNN safety-ring bound.
MIN_WIDTH_DERIV = 2.0 * np.sqrt(2.0) / 3.0  # 0.94280904...
MAX_DIAG_DERIV = 2.438654594434021


def min_width_rad(level: int) -> float:
    return MIN_WIDTH_DERIV / (1 << level)


def max_diag_rad(level: int) -> float:
    return MAX_DIAG_DERIV / (1 << level)
