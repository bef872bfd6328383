"""S2-clustered storage (operators/spatial_store.py): covering soundness,
pruning plan shape, and the results-identical-to-unpruned law."""

from __future__ import annotations

import os

import numpy as np
import pytest

from geetiles_spark.catalog import Catalog
from geetiles_spark.geo import s2
from geetiles_spark.operators import spatial_store as ss


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("s2cat"))
    cat = Catalog(root)
    pts = spark.range(40000).selectExpr(
        "id",
        "CAST(-10 + (abs(hash(id)) % 20000) / 1000.0 AS double) AS lon",
        "CAST(40 + (abs(hash(id*7+3)) % 15000) / 1000.0 AS double) AS lat",
    )
    ss.spatial_cluster_write(cat, "pts", pts, part_level=6, leaf_level=20)
    return cat, pts


class TestCoverBbox:
    BOXES = [
        (5.5, 49.0, 7.0, 50.2),     # interior
        (-1.0, 44.0, 1.5, 46.0),    # crosses the face-0/face-2 region edge
        (178.0, -2.0, 180.0, 2.0),  # antimeridian edge
        (43.0, 34.0, 47.0, 37.0),   # spans a cube corner
    ]

    @pytest.mark.parametrize("level", [6, 8, 10])
    def test_superset_law(self, level):
        """Every point inside the bbox maps to a cell in the cover — the
        property that makes pruning safe (it can only drop AOI-empty
        partitions)."""
        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 200000)
        lat = np.rad2deg(np.arcsin(rng.uniform(-1, 1, 200000)))
        for box in self.BOXES:
            assert ss.cover_superset_check(lon, lat, *box, level), (box, level)

    def test_cover_is_bounded(self):
        """The cover is a local neighborhood, not the planet."""
        cover = s2.cover_bbox(5.5, 49.0, 7.0, 50.2, 8)
        # bbox ~1.5 x 1.2 deg; level-8 cells >= 0.21 deg wide -> O(100)
        assert 10 < len(cover) < 400


class TestClusteredStore:
    AOI = (-2.0, 44.0, -0.5, 45.5)

    def test_commit_records_spec(self, store):
        cat, _ = store
        meta = cat.commit_meta("pts")
        assert meta["spatial_index"] == "s2"
        assert meta["part_level"] == 6
        assert meta["partition_by"] == ["s2_part"]

    def test_read_aoi_equals_unpruned(self, spark, store):
        cat, pts = store
        got = sorted(
            r["id"]
            for r in ss.read_aoi(cat, spark, "pts", *self.AOI)
            .select("id")
            .collect()
        )
        minlon, minlat, maxlon, maxlat = self.AOI
        want = sorted(
            r["id"]
            for r in pts.where(
                f"lon >= {minlon} AND lon <= {maxlon} "
                f"AND lat >= {minlat} AND lat <= {maxlat}"
            )
            .select("id")
            .collect()
        )
        assert got == want and len(got) > 0

    def test_partition_filters_reach_scan(self, spark, store):
        cat, _ = store
        aoi = ss.read_aoi(cat, spark, "pts", *self.AOI)
        plan = aoi._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "s2_part" in plan.split("PartitionFilters", 1)[1][:200]

    def test_directory_pruning_ratio(self, spark, store):
        """The cover touches a small fraction of the written partition
        dirs — the I/O win the partition spec exists for."""
        cat, _ = store
        snap_dir = cat.snapshot_path("pts")
        dirs = {
            int(d.split("=", 1)[1])
            for d in os.listdir(snap_dir)
            if d.startswith("s2_part=")
        }
        cover = {
            int(c) for c in s2.cover_bbox(*self.AOI, cat.commit_meta("pts")["part_level"])
        }
        touched = len(dirs & cover)
        assert touched > 0
        assert touched < len(dirs) / 3, (touched, len(dirs))

    def test_hilbert_sort_within_files(self, spark, store):
        """Rows inside each partition are sorted by the leaf id (row-group
        min/max stats stay tight)."""
        cat, _ = store
        df = cat.read(spark, "pts")
        one_part = df.groupBy("s2_part").count().orderBy("count", ascending=False).first()["s2_part"]
        leaves = [
            r["s2_leaf"]
            for r in df.where(f"s2_part = {one_part}").select("s2_leaf").collect()
        ]
        assert leaves == sorted(leaves)

    def test_part_is_parent_of_leaf(self, spark, store):
        cat, _ = store
        row = cat.read(spark, "pts").select("s2_part", "s2_leaf").first()
        assert int(
            s2.parent(np.array([row["s2_leaf"]]), 6)[0]
        ) == row["s2_part"]

    def test_rejects_unclustered_table(self, spark, store):
        cat, pts = store
        cat.write(pts.limit(10), "plain")
        with pytest.raises(ValueError, match="not S2-clustered"):
            ss.read_aoi(cat, spark, "plain", *self.AOI)


class TestPolygonAoi:
    def test_polygon_read_equals_unpruned_pip(self, spark, store):
        """read_aoi_polygon == plain PIP filter over the full table —
        pruning + bbox pre-filter change only the plan."""
        import numpy as np
        from geetiles_spark.geo import geom

        cat, pts = store
        # a non-convex AOI (arrowhead) inside the data window
        ring = np.array(
            [(-4.0, 43.0), (-1.0, 43.5), (-2.5, 45.0), (-1.0, 46.5),
             (-4.0, 47.0), (-3.0, 45.0)],
            dtype=np.float64,
        )
        got = sorted(
            r["id"]
            for r in ss.read_aoi_polygon(cat, spark, "pts", ring)
            .select("id")
            .collect()
        )
        rows = pts.select("id", "lon", "lat").collect()
        xy = np.array([(r["lon"], r["lat"]) for r in rows])
        inside = geom.points_in_polygon(xy, ring)
        want = sorted(rows[i]["id"] for i in np.nonzero(inside)[0])
        assert got == want and len(got) > 0

    def test_polygon_read_prunes_partitions(self, spark, store):
        import numpy as np

        cat, _ = store
        ring = np.array(
            [(-2.0, 44.0), (-0.5, 44.0), (-0.5, 45.5), (-2.0, 45.5)],
            dtype=np.float64,
        )
        plan = (
            ss.read_aoi_polygon(cat, spark, "pts", ring)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan
        assert "s2_part" in plan.split("PartitionFilters", 1)[1][:200]
