"""``geet``-compatible CLI over the Spark engine.

Mirrors the reference's argparse surface (``/root/reference/geetiles/
main.py``) with the filesystem replaced by a catalog directory:

    python -m geetiles_spark.main grid --aoi_wkt_file lux.wkt \
        --chip_size_meters 1000 --aoi_name lux --dest_dir /data/cat
    python -m geetiles_spark.main download --tiles_name lux \
        --dataset_def esaworldcover-2020 --dest_dir /data/cat
    python -m geetiles_spark.main lp.compute / lp.from_foreign / intersect /
        split / zip.dataset / mosaic ...

Run via ``spark-submit --py-files geetiles_spark.zip`` on a cluster; in
local mode it builds its own session.
"""

from __future__ import annotations

import argparse
import sys

from .catalog import Catalog
from .geo import wkt
from .plans import commands as C
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="geet-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grid")
    g.add_argument("--aoi_wkt_file", required=True)
    g.add_argument("--chip_size_meters", type=float, required=True)
    g.add_argument("--aoi_name", required=True)
    g.add_argument("--dest_dir", required=True)

    r = sub.add_parser("random")
    r.add_argument("--aoi_wkt_file", required=True)
    r.add_argument("--max_rectangle_size_meters", type=float, required=True)
    r.add_argument("--aoi_name", required=True)
    r.add_argument("--dest_dir", required=True)
    r.add_argument("--seed", type=int, default=42)

    d = sub.add_parser("download")
    d.add_argument("--tiles_name", required=True)
    d.add_argument("--dataset_def", required=True)
    d.add_argument("--dest_dir", required=True)
    d.add_argument("--max_downloads", type=int, default=None)
    d.add_argument("--skip_if_exists", action="store_true", default=True)

    lp = sub.add_parser("lp.compute")
    lp.add_argument("--tiles_name", required=True)
    lp.add_argument("--labels_dataset_def", required=True)
    lp.add_argument("--dest_dir", required=True)

    it = sub.add_parser("intersect")
    it.add_argument("--tiles_name", required=True)
    it.add_argument("--foreign_tiles_name", required=True)
    it.add_argument("--dest_dir", required=True)

    lf = sub.add_parser("lp.from_foreign")
    lf.add_argument("--tiles_name", required=True)
    lf.add_argument("--foreign_tiles_name", required=True)
    lf.add_argument("--labels_dataset_def", required=True)
    lf.add_argument("--dest_dir", required=True)

    sp = sub.add_parser("split")
    sp.add_argument("--tiles_name", required=True)
    sp.add_argument("--nbands", type=int, required=True)
    sp.add_argument("--angle", type=float, required=True)
    sp.add_argument("--train_pct", type=float, required=True)
    sp.add_argument("--test_pct", type=float, required=True)
    sp.add_argument("--val_pct", type=float, required=True)
    sp.add_argument("--foreign_tiles_name", default=None)
    sp.add_argument("--dest_dir", required=True)

    z = sub.add_parser("zip.dataset")
    z.add_argument("--tiles_name", required=True)
    z.add_argument("--images_dataset_def", required=True)
    z.add_argument("--labels_dataset_def", default=None)
    z.add_argument("--foreign_tiles_name", default=None)
    z.add_argument("--dest_dir", required=True)

    m = sub.add_parser("mosaic")
    m.add_argument("--tiles_name", required=True)
    m.add_argument("--dataset_def", required=True)
    m.add_argument("--meters_per_pixel", type=float, required=True)
    m.add_argument("--dest_dir", required=True)

    a = p.parse_args(argv)
    spark = get_spark(app_name=f"geet-{a.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(a.dest_dir)

    if a.cmd == "grid":
        snap = C.cmd_grid(spark, cat, wkt.load_ring(a.aoi_wkt_file),
                          a.chip_size_meters, a.aoi_name)
        print(f"saved tiles_{a.aoi_name} snapshot {snap}")
    elif a.cmd == "random":
        snap = C.cmd_random(spark, cat, wkt.load_ring(a.aoi_wkt_file),
                            a.max_rectangle_size_meters, a.aoi_name, a.seed)
        print(f"saved tiles_{a.aoi_name} snapshot {snap}")
    elif a.cmd == "download":
        n = C.cmd_download(spark, cat, a.tiles_name, a.dataset_def,
                           max_downloads=a.max_downloads)
        print(f"downloaded {n} new chips")
    elif a.cmd == "lp.compute":
        snap = C.cmd_lp_compute(spark, cat, a.tiles_name, a.labels_dataset_def)
        print(f"saved to {snap}")
    elif a.cmd == "intersect":
        snap = C.cmd_intersect(spark, cat, a.tiles_name, a.foreign_tiles_name)
        print(f"saved to {snap}")
    elif a.cmd == "lp.from_foreign":
        snap = C.cmd_lp_from_foreign(spark, cat, a.tiles_name,
                                     a.foreign_tiles_name, a.labels_dataset_def)
        print(f"saved to {snap}")
    elif a.cmd == "split":
        snap = C.cmd_split(spark, cat, a.tiles_name, a.nbands, a.angle,
                           a.train_pct, a.test_pct, a.val_pct,
                           a.foreign_tiles_name)
        print(f"saved to {snap}")
    elif a.cmd == "zip.dataset":
        snap = C.cmd_dataset(spark, cat, a.tiles_name, a.images_dataset_def,
                             a.labels_dataset_def, a.foreign_tiles_name)
        print(f"dataset written: {snap}")
    elif a.cmd == "mosaic":
        snap, meta = C.cmd_mosaic(spark, cat, a.tiles_name, a.dataset_def,
                                  a.meters_per_pixel)
        print(f"mosaic written: {snap} dims={meta['dim_x']}x{meta['dim_y']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
