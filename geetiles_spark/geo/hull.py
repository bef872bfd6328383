"""F9: concave hull (alpha shape) in pure numpy.

Reference: ``utils.concave_hull`` (``/root/reference/geetiles/utils.py:45-69``)
= ``alphashape(coords, 1.0)``; used to derive an AOI from a geometry
collection when no region is given (``partitions.py:62-63``) and by the
split-and-rejoin ``get_boundary`` (``utils.py:72-92``).

alphashape's algorithm (public): Delaunay-triangulate the point set, keep
triangles whose circumradius < 1/alpha, union them, return the boundary.
The pieces here: a Bowyer–Watson incremental Delaunay (O(n^2), no scipy),
the circumradius filter, and boundary-edge chaining (edges used by exactly
one kept triangle, linked into the outer ring).
"""

from __future__ import annotations

import numpy as np

from . import geom


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer–Watson Delaunay triangulation: (T, 3) vertex-index triangles.

    O(n^2); robust enough for hull workloads (thousands of points on the
    driver / per partition).  Indices refer to ``points`` as given — callers
    must deduplicate first (``alpha_shape`` does).
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.zeros((0, 3), dtype=np.int64)

    # super-triangle enclosing everything
    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    c = (mn + mx) / 2
    d = max(mx[0] - mn[0], mx[1] - mn[1], 1e-12) * 100
    sup = np.array([[c[0] - d, c[1] - d], [c[0] + d, c[1] - d], [c[0], c[1] + d]])
    allp = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]

    def circum(tri):
        a, b, cc = allp[tri[0]], allp[tri[1]], allp[tri[2]]
        ab = b - a
        ac = cc - a
        d2 = 2 * (ab[0] * ac[1] - ab[1] * ac[0])
        if d2 == 0:
            return np.array([np.inf, np.inf]), np.inf
        ab2 = ab @ ab
        ac2 = ac @ ac
        ux = (ac[1] * ab2 - ab[1] * ac2) / d2
        uy = (ab[0] * ac2 - ac[0] * ab2) / d2
        ctr = a + np.array([ux, uy])
        r2 = ux * ux + uy * uy
        return ctr, r2

    centers = [circum(t) for t in tris]
    for pi in range(n):
        p = allp[pi]
        bad = []
        for ti, t in enumerate(tris):
            ctr, r2 = centers[ti]
            dp = p - ctr
            if dp @ dp < r2 * (1 + 1e-12):
                bad.append(ti)
        # boundary of the bad-triangle cavity = edges used once
        edge_count: dict[tuple[int, int], int] = {}
        for ti in bad:
            a, b, cc = tris[ti]
            for e in ((a, b), (b, cc), (cc, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        for ti in sorted(bad, reverse=True):
            tris.pop(ti)
            centers.pop(ti)
        for a, b in boundary:
            t = (a, b, pi)
            tris.append(t)
            centers.append(circum(t))
    out = [t for t in tris if max(t) < n]
    return np.array(out, dtype=np.int64) if out else np.zeros((0, 3), dtype=np.int64)


def alpha_shape(points: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Concave hull ring: Delaunay triangles with circumradius < 1/alpha,
    boundary edges chained into the largest closed ring.  Falls back to the
    convex hull (alpha -> 0 behaviour) when the filter disconnects
    everything — same degradation alphashape exhibits."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    tris = delaunay(pts)
    if len(tris) == 0:
        return geom.ring_close(pts) if len(pts) >= 3 else pts
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    la = np.linalg.norm(b - c, axis=1)
    lb = np.linalg.norm(a - c, axis=1)
    lc = np.linalg.norm(a - b, axis=1)
    s = (la + lb + lc) / 2
    area = np.sqrt(np.maximum(s * (s - la) * (s - lb) * (s - lc), 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        circum_r = np.where(area > 0, la * lb * lc / (4 * area), np.inf)
    keep = tris[circum_r < 1.0 / alpha] if alpha > 0 else tris
    if len(keep) == 0:
        keep = tris  # degenerate alpha: fall back to the full triangulation
    edge_count: dict[tuple[int, int], int] = {}
    for t in keep:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, cnt in edge_count.items() if cnt == 1]
    if not boundary:
        return geom.ring_close(pts[np.unique(keep)])
    # chain boundary edges into rings; keep the largest-area ring
    adj: dict[int, list[int]] = {}
    for x, y in boundary:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    unused = {tuple(sorted(e)) for e in boundary}
    rings = []
    while unused:
        start, nxt = next(iter(unused))
        ring = [start]
        cur, prev = nxt, start
        unused.discard((min(start, nxt), max(start, nxt)))
        while cur != start:
            ring.append(cur)
            cands = [
                v for v in adj[cur]
                if v != prev and (min(cur, v), max(cur, v)) in unused
            ]
            if not cands:
                break
            prev, cur = cur, cands[0]
            unused.discard((min(prev, cur), max(prev, cur)))
        rings.append(ring)
    best = max(rings, key=lambda r: geom.ring_area(geom.ring_close(pts[r])) if len(r) >= 3 else 0)
    return geom.ring_close(pts[best])


def concave_hull_points(rings: list[np.ndarray], alpha: float = 1.0) -> np.ndarray:
    """``utils.concave_hull`` shape: pool every boundary coordinate of the
    input rings, alpha-shape the pool."""
    coords = np.vstack([geom.ring_close(np.asarray(r, dtype=np.float64)) for r in rings])
    return alpha_shape(coords, alpha)
