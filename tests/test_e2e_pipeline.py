"""SURVEY §5.3 end-to-end pipeline test through the command layer: grid ->
download -> lp.compute -> intersect -> lp.from_foreign -> split ->
zip.dataset, with the docs-table span-sequence invariant asserted around the
whole run, against the single-node oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geetiles_spark.catalog import Catalog
from geetiles_spark.geo import geom
from geetiles_spark.plans import commands as C
from geetiles_spark.sources import docs as docsrc

from . import oracle


@pytest.fixture(scope="module")
def e2e(spark, aoi_box, tmp_path_factory):
    cat = Catalog(str(tmp_path_factory.mktemp("e2e")))
    C.cmd_grid(spark, cat, aoi_box, 500, "box")
    C.cmd_random(spark, cat, aoi_box, 1500, "communes", seed=7)
    # docs table snapshot BEFORE the pipeline (span invariant reference)
    tiles = cat.read(spark, "tiles_box")
    docs = docsrc.generate_docs(tiles, ["esaworldcover-2020"]).cache()
    fp_before = {
        r["doc_id"]: r["span_fingerprint"]
        for r in docsrc.span_sequence_fingerprint(docs).collect()
    }
    # chips for both sets, label proportions, joins, splits, assembly
    C.cmd_download(spark, cat, "box", "esaworldcover-2020", shuffle=False)
    C.cmd_download(spark, cat, "box", "sentinel2-rgb-median-2020", shuffle=False)
    C.cmd_download(spark, cat, "communes", "esaworldcover-2020", shuffle=False)
    C.cmd_lp_compute(spark, cat, "box", "esaworldcover-2020")
    C.cmd_lp_compute(spark, cat, "communes", "esaworldcover-2020")
    C.cmd_intersect(spark, cat, "box", "communes")
    C.cmd_lp_from_foreign(spark, cat, "box", "communes", "esaworldcover-2020")
    C.cmd_split(spark, cat, "box", 8, 0.3, 0.5, 0.3, 0.2, foreign_name="communes")
    C.cmd_dataset(spark, cat, "box", "sentinel2-rgb-median-2020",
                  "esaworldcover-2020", foreign_name="communes")
    return cat, docs, fp_before


class TestEndToEnd:
    def test_tiles_table_has_all_columns(self, spark, e2e):
        cat, _, _ = e2e
        t = cat.read(spark, "tiles_box")
        for col in [
            "tile_id", "geometry_wkb", "area_km2",
            "esaworldcover-2020_proportions",
            "esaworldcover-2020_proportions_at_communes",
            "foreignid_communes", "split", "split_communes",
        ]:
            assert col in t.columns, col
        assert t.count() == 24

    def test_matches_oracle_end_to_end(self, spark, e2e):
        cat, _, _ = e2e
        t = cat.read(spark, "tiles_box")
        foreign = cat.read(spark, "tiles_communes")
        fl = [
            {
                "id": r["tile_id"],
                "ring": geom.wkb_to_polygon(bytes(r["geometry_wkb"])),
                "props": dict(r["esaworldcover-2020_proportions"] or {}),
            }
            for r in foreign.orderBy("row_idx").collect()
        ]
        rows = t.orderBy("row_idx").collect()
        for r in rows:
            ring = geom.wkb_to_polygon(bytes(r["geometry_wkb"]))
            exp_props, exp_id = oracle.oracle_foreign_props(ring, fl)
            assert r["foreignid_communes"] == (str(exp_id) if exp_id != -1 else "-1")
            got = dict(r["esaworldcover-2020_proportions_at_communes"])
            assert set(got) == set(str(k) for k in exp_props)
            for k in got:
                assert got[k] == pytest.approx(exp_props[k], abs=1e-9)
        # split matches oracle
        bounds = np.array(
            [[r["minx"], r["miny"], r["maxx"], r["maxy"]] for r in rows]
        )
        exp_split = oracle.oracle_split(bounds, 8, 0.3, 0.5, 0.3, 0.2)
        assert [r["split"] for r in rows] == exp_split

    def test_dataset_assembled(self, spark, e2e):
        cat, _, _ = e2e
        ds = cat.read(spark, "dataset_box_sentinel2-rgb-median-2020")
        assert ds.count() == 24
        r = ds.first()
        assert r["chip_bands"] == 3
        assert r["props_aschip"] is not None
        assert r["props_foreign"] is not None
        assert r["split"] in ("train", "test", "val")

    def test_span_sequence_equality_preserved(self, spark, e2e):
        _, docs, fp_before = e2e
        fp_after = {
            r["doc_id"]: r["span_fingerprint"]
            for r in docsrc.span_sequence_fingerprint(docs).collect()
        }
        assert fp_after == fp_before

    def test_resume_is_noop(self, spark, e2e):
        cat, _, _ = e2e
        assert C.cmd_download(spark, cat, "box", "esaworldcover-2020",
                              shuffle=False) == 0

    def test_geometry_guard_held_through_pipeline(self, spark, e2e):
        cat, _, _ = e2e
        # every merge used the guarded save: committed hash must equal the
        # recomputed one
        from geetiles_spark.operators.grid import dataset_hash

        t = cat.read(spark, "tiles_box")
        assert cat._committed_hash("tiles_box") == dataset_hash(t)
