"""Pure-numpy planar polygon primitives (WKB, area, clipping, predicates).

The reference relies on shapely for ``intersects`` / ``intersection.area``
(``/root/reference/geetiles/partitions.py:470-507``) and ``envelope.boundary``
(``utils.py:237``).  shapely is not available, so this module provides the
minimal exact planar kernel the engine needs, vectorized where it matters:

* polygons are numpy ``(N, 2)`` float64 rings, closed (first row == last row),
  exterior only (the reference never uses holes);
* WKB encode/decode (little-endian Polygon/MultiPolygon) for storing
  geometries as ``binary`` DataFrame columns;
* shoelace area, bounds, envelope ring in shapely's ring order
  (minx,miny)->(maxx,miny)->(maxx,maxy)->(minx,maxy)->close, which
  ``get_region_hash`` depends on byte-for-byte;
* Sutherland–Hodgman clipping of an arbitrary simple polygon against a
  *convex* polygon — exact for the engine's tile-x-foreign intersection areas
  because grid tiles are lon/lat boxes (``cmds.py:344-357``) and katana
  foreign tiles are convex quads (``partitions.py:513-567``);
* convex-convex ``intersects`` via separating axes (touching counts, matching
  shapely semantics at ``partitions.py:475,495``);
* vectorized box-vs-polygon intersects for AOI filtering (``cmds.py:366``).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


# ---------------------------------------------------------------- WKB ------


def ring_close(coords: np.ndarray) -> np.ndarray:
    """Ensure ring is closed (first == last)."""
    coords = np.asarray(coords, dtype=np.float64)
    if not np.array_equal(coords[0], coords[-1]):
        coords = np.vstack([coords, coords[:1]])
    return coords


def polygon_to_wkb(ring: np.ndarray) -> bytes:
    """Encode a single closed exterior ring as WKB Polygon (little-endian)."""
    ring = ring_close(ring)
    n = len(ring)
    head = struct.pack("<BII", 1, WKB_POLYGON, 1) + struct.pack("<I", n)
    return head + ring.astype("<f8").tobytes()


def wkb_to_polygon(wkb: bytes) -> np.ndarray:
    """Decode WKB Polygon -> closed (N,2) exterior ring (holes rejected)."""
    byte_order = wkb[0]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", wkb, 1)
    if gtype != WKB_POLYGON:
        raise ValueError(f"expected Polygon wkb, got type {gtype}")
    (nrings,) = struct.unpack_from("<I", wkb, 5)
    (npts,) = struct.unpack_from("<I", wkb, 9)
    ring = np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)
    return ring.copy()


def box_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Envelope ring in shapely's GEOS order (see ``get_region_hash`` parity)."""
    return np.array(
        [
            [minx, miny],
            [maxx, miny],
            [maxx, maxy],
            [minx, maxy],
            [minx, miny],
        ],
        dtype=np.float64,
    )


# ------------------------------------------------------------- measures ----


def ring_area(ring: np.ndarray) -> float:
    """Unsigned shoelace area of a closed ring."""
    x = ring[:-1, 0]
    y = ring[:-1, 1]
    x2 = ring[1:, 0]
    y2 = ring[1:, 1]
    return float(abs(np.sum(x * y2 - x2 * y)) * 0.5)


def ring_bounds(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


# ------------------------------------------------------------- clipping ----


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` ring by a *convex* ``clip`` ring.

    Returns a closed ring (possibly empty array of shape (0, 2)).
    """
    clip = ring_close(clip)[:-1]
    # make clip CCW so "inside" = left of each edge
    a = 0.0
    for i in range(len(clip)):
        j = (i + 1) % len(clip)
        a += clip[i, 0] * clip[j, 1] - clip[j, 0] * clip[i, 1]
    if a < 0:
        clip = clip[::-1]

    out = list(ring_close(np.asarray(subject, dtype=np.float64))[:-1])
    for i in range(len(clip)):
        if not out:
            break
        cx1, cy1 = clip[i]
        cx2, cy2 = clip[(i + 1) % len(clip)]
        ex, ey = cx2 - cx1, cy2 - cy1
        inp = out
        out = []
        prev = inp[-1]
        prev_in = ex * (prev[1] - cy1) - ey * (prev[0] - cx1) >= 0
        for cur in inp:
            cur_in = ex * (cur[1] - cy1) - ey * (cur[0] - cx1) >= 0
            if cur_in != prev_in:
                # intersection of segment prev->cur with clip edge line
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ey * (prev[0] - cx1) - ex * (prev[1] - cy1)) / denom
                    out.append(
                        np.array([prev[0] + t * dx, prev[1] + t * dy])
                    )
            if cur_in:
                out.append(np.asarray(cur, dtype=np.float64))
            prev, prev_in = cur, cur_in
    if len(out) < 3:
        return np.zeros((0, 2), dtype=np.float64)
    return ring_close(np.asarray(out, dtype=np.float64))


def intersection_area_convex(subject: np.ndarray, clip: np.ndarray) -> float:
    """Area of subject ∩ clip where ``clip`` is convex."""
    clipped = clip_polygon_convex(subject, clip)
    if len(clipped) == 0:
        return 0.0
    return ring_area(clipped)


# ------------------------------------------------------------ predicates ---


def convex_intersects(p: np.ndarray, q: np.ndarray) -> bool:
    """Separating-axis test for two convex rings; touching counts as True
    (shapely ``intersects`` semantics, ``partitions.py:475``)."""
    p = ring_close(p)[:-1]
    q = ring_close(q)[:-1]
    for poly in (p, q):
        edges = np.roll(poly, -1, axis=0) - poly
        # normals
        axes = np.stack([-edges[:, 1], edges[:, 0]], axis=1)
        for ax in axes:
            pr_p = p @ ax
            pr_q = q @ ax
            if pr_p.max() < pr_q.min() or pr_q.max() < pr_p.min():
                return False
    return True


def points_in_polygon(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-polygon for many points, one ring.

    Points exactly on an edge may land either side (reference fixtures avoid
    boundary-degenerate cases).
    """
    pts = np.asarray(pts, dtype=np.float64)
    ring = ring_close(ring)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    cond = (y1 <= py) != (y2 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / np.where(y2 == y1, np.inf, y2 - y1)
    crossings = np.sum(cond & (px < xint), axis=1)
    return (crossings % 2).astype(bool)


def _segments_intersect_boxes(
    ring: np.ndarray,
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
) -> np.ndarray:
    """For each box i, does any ring segment intersect the box boundary/area?

    Vectorized over boxes (N) x segments (E) via Liang-Barsky-style clipping
    of each segment against each box.
    """
    x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    dx = x2 - x1
    dy = y2 - y1
    minx = minx[:, None]
    miny = miny[:, None]
    maxx = maxx[:, None]
    maxy = maxy[:, None]

    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = np.zeros_like(x1 + minx)
        t1 = np.ones_like(t0)
        for p, q in (
            (-dx, x1 - minx),
            (dx, maxx - x1),
            (-dy, y1 - miny),
            (dy, maxy - y1),
        ):
            r = np.where(p != 0, q / np.where(p == 0, 1.0, p), np.inf)
            ent = np.where(p < 0, r, -np.inf)
            ext = np.where(p > 0, r, np.inf)
            t0 = np.maximum(t0, ent)
            t1 = np.minimum(t1, ext)
            # p == 0 and q < 0 => parallel and outside
            t0 = np.where((p == 0) & (q < 0), np.inf, t0)
        hit = t0 <= t1
    return hit.any(axis=1)


def boxes_intersect_polygon(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    ring: np.ndarray,
) -> np.ndarray:
    """Vectorized exact box-intersects-polygon (touching counts) for N boxes
    against one simple ring.  Used for the AOI filter of grid generation
    (``cmds.py:366``) without shapely.
    """
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    ring = ring_close(np.asarray(ring, dtype=np.float64))

    # 1. bbox prefilter
    rb = ring_bounds(ring)
    cand = ~((maxx < rb[0]) | (minx > rb[2]) | (maxy < rb[1]) | (miny > rb[3]))
    out = np.zeros(len(minx), dtype=bool)
    if not cand.any():
        return out
    idx = np.nonzero(cand)[0]
    bx0, by0, bx1, by1 = minx[idx], miny[idx], maxx[idx], maxy[idx]

    # 2. box center inside polygon
    centers = np.stack([(bx0 + bx1) / 2, (by0 + by1) / 2], axis=1)
    inside = points_in_polygon(centers, ring)

    # 3. any ring vertex inside box
    vx, vy = ring[:-1, 0], ring[:-1, 1]
    vert_in = (
        (vx[None, :] >= bx0[:, None])
        & (vx[None, :] <= bx1[:, None])
        & (vy[None, :] >= by0[:, None])
        & (vy[None, :] <= by1[:, None])
    ).any(axis=1)

    # 4. any ring segment crosses the box
    seg = _segments_intersect_boxes(ring, bx0, by0, bx1, by1)

    out[idx] = inside | vert_in | seg
    return out


def polygon_centroid_of_envelope_ring(ring: np.ndarray) -> tuple[float, float]:
    """Mean of the *closed* envelope ring coords — reproduces the reference's
    centroid-ish ``np.r_[i.envelope.boundary.coords].mean(axis=0)``
    (``partitions.py:322``), which counts the first corner twice."""
    minx, miny, maxx, maxy = ring_bounds(ring)
    env = box_ring(minx, miny, maxx, maxy)
    m = env.mean(axis=0)
    return float(m[0]), float(m[1])
