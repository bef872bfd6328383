"""Property-based tests (hypothesis) for the pure-numpy geometry kernels —
the layer everything else (grid, joins, zonal, select) rests on.  These are
the invariants a GEOS-backed implementation would satisfy; the engine's
from-scratch kernels must satisfy them too on arbitrary inputs, not just the
fixture shapes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geetiles_spark.geo import geom

# finite, well-separated coordinates: keep conditioning sane (degrees-scale)
coord = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=64)


def _box(x0, y0, w, h):
    return geom.box_ring(x0, y0, x0 + w, y0 + h)


boxes = st.builds(
    _box,
    coord,
    coord,
    st.floats(min_value=0.01, max_value=30.0),
    st.floats(min_value=0.01, max_value=30.0),
)


@st.composite
def star_polygons(draw):
    """Random star-shaped polygon, GUARANTEED simple: vertex angles are
    cumulative gaps drawn from [0.9, 1.1] normalized to sweep exactly 2π, so
    every angular gap is < π (a gap > π lets the closing edge cut across the
    polygon — the non-simple inputs the first draft of this generator
    produced were polygons no engine input can be)."""
    n = draw(st.integers(min_value=3, max_value=12))
    cx = draw(coord)
    cy = draw(coord)
    gaps = np.asarray(
        draw(
            st.lists(
                st.floats(min_value=0.9, max_value=1.1), min_size=n, max_size=n
            )
        )
    )
    angles = np.cumsum(gaps) / gaps.sum() * 2 * np.pi
    radii = np.asarray(
        draw(
            st.lists(
                st.floats(min_value=0.1, max_value=10.0), min_size=n, max_size=n
            )
        )
    )
    ring = np.stack(
        [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1
    )
    return geom.ring_close(ring)


def _box_inter_area(a, b):
    """Exact axis-aligned box intersection area (independent arithmetic)."""
    ax0, ay0, ax1, ay1 = geom.ring_bounds(a)
    bx0, by0, bx1, by1 = geom.ring_bounds(b)
    return max(0.0, min(ax1, bx1) - max(ax0, bx0)) * max(
        0.0, min(ay1, by1) - max(ay0, by0)
    )


class TestIntersectionProperties:
    @settings(max_examples=60, deadline=None)
    @given(boxes, boxes)
    def test_box_box_matches_arithmetic(self, a, b):
        got = geom.polygon_intersection_area(a, b)
        assert got == np.float64(got)  # finite
        assert abs(got - _box_inter_area(a, b)) < 1e-9 * max(
            1.0, _box_inter_area(a, a)
        )

    @settings(max_examples=40, deadline=None)
    @given(star_polygons(), boxes)
    def test_symmetry_and_bounds(self, p, b):
        ab = geom.polygon_intersection_area(p, b)
        ba = geom.polygon_intersection_area(b, p)
        assert abs(ab - ba) < 1e-6 * max(1.0, geom.ring_area(p))
        assert -1e-9 <= ab <= min(geom.ring_area(p), geom.ring_area(b)) + 1e-6

    @settings(max_examples=40, deadline=None)
    @given(star_polygons())
    def test_triangulation_additivity(self, p):
        tris = geom.triangulate_ring(p)
        total = sum(geom.ring_area(t) for t in tris)
        assert abs(total - geom.ring_area(p)) < 1e-7 * max(1.0, geom.ring_area(p))

    @settings(max_examples=40, deadline=None)
    @given(star_polygons(), boxes)
    def test_clip_area_bounds(self, p, b):
        c = geom.clip_polygon_convex(p, b)
        if len(c) >= 4:
            a = geom.ring_area(c)
            # Sutherland–Hodgman against a convex clip never grows area
            # (p may be non-convex: the clip result can be degenerate but
            # its area is bounded by the box's)
            assert a <= geom.ring_area(b) + 1e-6


class TestHolesProperties:
    @settings(max_examples=60, deadline=None)
    @given(
        boxes,
        st.floats(min_value=0.1, max_value=0.4),
        st.floats(min_value=0.1, max_value=0.4),
        boxes,
    )
    def test_donut_area_matches_box_arithmetic(self, outer, fx, fy, aoi):
        x0, y0, x1, y1 = geom.ring_bounds(outer)
        w, h = x1 - x0, y1 - y0
        hole = geom.box_ring(
            x0 + fx * w, y0 + fy * h, x1 - fx * w, y1 - fy * h
        )
        parts = [(outer, [hole])]
        got = geom.parts_intersection_area(aoi, parts)
        exp = _box_inter_area(aoi, outer) - _box_inter_area(aoi, hole)
        assert abs(got - exp) < 1e-7 * max(1.0, w * h)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(boxes, min_size=1, max_size=4))
    def test_wkb_parts_roundtrip(self, outers):
        parts = [(o, []) for o in outers]
        rt = geom.wkb_to_parts(geom.parts_to_wkb(parts))
        assert len(rt) == len(parts)
        for (o1, h1), (o2, _) in zip(rt, parts):
            np.testing.assert_array_equal(o1, geom.ring_close(o2))
            assert h1 == []


class TestKatanaProperties:
    @settings(max_examples=15, deadline=None)
    @given(
        st.floats(min_value=1000.0, max_value=20000.0),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_pieces_cover_and_respect_threshold(self, threshold, seed):
        from geetiles_spark.operators.random_parts import katana

        ring = geom.box_ring(0.0, 0.0, 60000.0, 40000.0)  # planar meters
        rng = np.random.default_rng(seed)
        parts = katana(ring, threshold, rng, 0, 0.1)
        # area additivity: the split is a partition of the AOI
        total = sum(geom.ring_area(p) for p in parts)
        assert abs(total - geom.ring_area(ring)) < 1e-6 * geom.ring_area(ring)
        # every piece satisfies the stop rule
        for p in parts:
            x0, y0, x1, y1 = geom.ring_bounds(p)
            assert max(x1 - x0, y1 - y0) <= threshold + 1e-6


class TestClipAreasExactness:
    def test_two_pass_through_slit_disconnected(self):
        """ADVICE r3: a box crossed by exactly TWO pass-through segments (a
        U-polygon's inner notch walls) sees a disconnected intersection; the
        old guard counted each pass-through once (2 crossings -> not
        suspicious) and returned the bridged S-H area.  Pass-throughs must
        count as 2 crossings each."""
        # U-shape, legs pointing down; inner notch walls at x=1.0 and x=2.0
        ring = np.array(
            [
                [0.5, -1.0], [1.0, -1.0], [1.0, 2.0], [2.0, 2.0],
                [2.0, -1.0], [2.5, -1.0], [2.5, 3.0], [0.5, 3.0],
            ]
        )
        # box x in [0.9, 2.1], y in [0, 1]: only the two notch walls hit it,
        # both ends outside -> intersection is two strips, area 0.2
        got = geom.clip_areas_ring_boxes_exact(
            ring,
            np.array([0.9]), np.array([0.0]), np.array([2.1]), np.array([1.0]),
        )
        np.testing.assert_allclose(got, [0.2], atol=1e-9)
    @settings(max_examples=50, deadline=None)
    @given(star_polygons(), st.lists(boxes, min_size=1, max_size=6))
    def test_guarded_batch_matches_triangulated_truth(self, ring, bs):
        """clip_areas_ring_boxes_exact == Σ_tri |tri ∩ box| (convex∩convex
        ground truth) for concave subjects — including boxes whose
        intersection with the ring is disconnected (the S-H failure mode
        the crossing-count guard routes to the exact path)."""
        minx = np.array([geom.ring_bounds(b)[0] for b in bs])
        miny = np.array([geom.ring_bounds(b)[1] for b in bs])
        maxx = np.array([geom.ring_bounds(b)[2] for b in bs])
        maxy = np.array([geom.ring_bounds(b)[3] for b in bs])
        got = geom.clip_areas_ring_boxes_exact(ring, minx, miny, maxx, maxy)
        tris = geom.triangulate_ring(ring)
        scale = max(1.0, geom.ring_area(ring))
        for i, b in enumerate(bs):
            truth = sum(geom.intersection_area_convex(t, b) for t in tris)
            assert abs(got[i] - truth) < 1e-7 * scale
