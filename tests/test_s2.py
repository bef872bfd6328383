"""True S2 cell index (geo/s2.py): spec invariants + the cross-encoder law.

The S2 cell-id scheme is deterministic public math (quadratic projection +
face-local Hilbert curve); with no S2 library in this environment the tests
pin the spec's structural invariants — center round-trip at every level,
hierarchical containment, face assignment for the cardinal directions,
neighbor symmetry across cube-face edges — and the engine-level law that
matters: a candidate-generator + exact-refine operator (kNN) returns
BIT-IDENTICAL results under the S2 index and the flat grid index.
"""

from __future__ import annotations

import numpy as np
import pytest

from geetiles_spark.geo import s2
from geetiles_spark.operators import joins


def _sphere_points(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = np.rad2deg(np.arcsin(rng.uniform(-1.0, 1.0, n)))  # uniform on sphere
    return lon, lat


class TestCellId:
    @pytest.mark.parametrize("level", [0, 1, 4, 10, 16, 24, 30])
    def test_center_roundtrip(self, level):
        """Re-encoding a cell's center yields the same cell, every level."""
        lon, lat = _sphere_points(20000)
        cid = s2.cell_id(lon, lat, level)
        assert (s2.level_of(cid) == level).all()
        clon, clat = s2.cell_center_lonlat(cid)
        assert (s2.cell_id(clon, clat, level) == cid).all()

    def test_parent_containment(self):
        """cell_id at L == parent(leaf, L): the id is a true quadtree path."""
        lon, lat = _sphere_points(20000, seed=11)
        leaf = s2.cell_id(lon, lat, 30)
        for level in (0, 5, 12, 29):
            assert (s2.parent(leaf, level) == s2.cell_id(lon, lat, level)).all()

    def test_face_goldens(self):
        """Cardinal directions land on the spec's face numbering."""
        cases = [
            ((0.0, 0.0), 0),   # +x
            ((90.0, 0.0), 1),  # +y
            ((0.0, 90.0), 2),  # +z
            ((180.0, 0.0), 3),  # -x
            ((-90.0, 0.0), 4),  # -y
            ((0.0, -90.0), 5),  # -z
        ]
        for (lon, lat), face in cases:
            cid = np.asarray(
                s2.cell_id(np.array([lon]), np.array([lat]), 30)
            ).view(np.uint64)
            assert int(cid[0] >> np.uint64(61)) == face

    def test_id_bit_layout(self):
        """Trailing sentinel bit: lsb(level-L id) == 2^(2*(30-L))."""
        lon, lat = _sphere_points(100, seed=3)
        for level in (0, 7, 18, 30):
            cid = s2.cell_id(lon, lat, level)
            assert (s2.lsb(cid) == np.int64(1) << (2 * (30 - level))).all()

    def test_hilbert_locality(self):
        """Sorted-id neighbors along a geographic path are geographically
        close — the property that makes the id a clustering key."""
        lon = np.linspace(6.0, 6.5, 4000)
        lat = np.full(4000, 49.6)
        cid = np.unique(
            np.asarray(s2.cell_id(lon, lat, 14)).view(np.uint64)
        ).view(np.int64)
        clon, clat = s2.cell_center_lonlat(cid)
        # consecutive ids in sorted order: centers within a few cell widths
        step = np.hypot(np.diff(clon), np.diff(clat))
        cell_deg = np.rad2deg(s2.max_diag_rad(14))
        assert np.median(step) < 3 * cell_deg


class TestNeighbors:
    HARD_POINTS = [
        (6.1, 49.6),       # interior
        (0.0, 44.99),      # just below the face-0/face-2 edge
        (0.0, 45.01),      # just above it
        (179.99, 0.0),     # antimeridian (face 3 center is lon 180)
        (-179.99, 0.0),
        (1.0, 89.9),       # near north pole (face 2)
        (1.0, -89.9),      # near south pole (face 5)
        (45.0, 35.26),     # near a cube corner (3 faces meet)
    ]

    @pytest.mark.parametrize("level", [2, 8, 14])
    def test_edge_neighbor_symmetry(self, level):
        for lon, lat in self.HARD_POINTS:
            c = int(s2.cell_id(np.array([lon]), np.array([lat]), level)[0])
            nb = s2.edge_neighbors(c)
            assert len(set(nb)) == 4
            assert all(int(s2.level_of(np.array([n]))[0]) == level for n in nb)
            for n in nb:
                assert c in s2.edge_neighbors(n)

    def test_bfs_layers_disjoint_and_growing(self):
        c = int(s2.cell_id(np.array([6.1]), np.array([49.6]), 12)[0])
        layers = s2.bfs_rings(c, 6)
        seen: set[int] = set()
        for layer in layers:
            as_set = {int(x) for x in layer}
            assert not (as_set & seen)
            seen |= as_set
        # adjacency is a superset of king moves: layer sizes at least the
        # king-ring sizes 1, 8, 16, 24, ...
        sizes = [len(l) for l in layers]
        assert sizes[0] == 1 and sizes[1] >= 8
        for r in range(2, len(sizes)):
            assert sizes[r] >= 8 * r - 4  # generous floor away from corners

    def test_bfs_at_cube_corner_stays_connected(self):
        c = int(s2.cell_id(np.array([45.0]), np.array([35.26]), 8)[0])
        layers = s2.bfs_rings(c, 4)
        assert all(len(l) > 0 for l in layers)


class TestKnnCrossEncoder:
    def test_knn_s2_equals_flat_equals_brute(self, spark):
        """The engine law: index choice is performance-only.  Exercised at
        the pole, the antimeridian, and a cube corner — the three places a
        broken wrap would silently drop candidates."""
        queries = [
            ("q0", 6.04, 49.64),
            ("pole", 12.0, 89.2),
            ("anti", 179.95, -33.0),
            ("corner", 45.0, 35.26),
        ]
        pts = spark.range(6000).selectExpr(
            "id",
            "CAST(CASE WHEN id % 4 = 0 THEN 6.0 + (id % 997) / 5000.0 "
            "WHEN id % 4 = 1 THEN 11.0 + (id % 97) / 50.0 "
            "WHEN id % 4 = 2 THEN 179.5 + (id % 89) / 100.0 "
            "ELSE 44.5 + (id % 83) / 80.0 END AS double) AS lon",
            "CAST(CASE WHEN id % 4 = 0 THEN 49.6 + (id % 991) / 5000.0 "
            "WHEN id % 4 = 1 THEN 89.0 + (id % 61) / 200.0 "
            "WHEN id % 4 = 2 THEN -33.3 + (id % 53) / 90.0 "
            "ELSE 35.0 + (id % 47) / 90.0 END AS double) AS lat",
        )
        brute = joins.knn_join(pts, queries, k=7)
        flat = joins.knn_join_cells(pts, queries, k=7)
        s2knn = joins.knn_join_cells(pts, queries, k=7, index="s2")
        key = lambda r: (r["query_id"], round(r["dist_m"], 9), r["point_id"])
        b = sorted(map(key, brute.collect()))
        assert sorted(map(key, flat.collect())) == b
        assert sorted(map(key, s2knn.collect())) == b
        assert len(b) == 4 * 7
