"""Chip-extraction stage (the reference's ``geet download`` / §2.1 S4-S7, §2.2 K4).

The reference downloads one GeoTIFF per tile from GEE via a process pool with
retry + skip-if-exists + ``.nodata`` markers (``gee.py:153-368``).  Here the
source is the deterministic synthetic generator on each dataset def
(:mod:`.datasets`); the Spark shape is identical to a production fetch stage:

  tiles --anti-join vs committed chips--> pending --mapInPandas(generate/
  decode/post_process)--> chips rows --MERGE into catalog--> chips table

Chips are rows ``(tile_id, dataset, media_ref, height, width, bands, dtype,
bounds_*, band_names, payload, status)`` — raw C-order bytes instead of
per-tile files, so a 10^12-scale run never touches a filesystem namespace.
``status='nodata'`` replaces the ``.nodata`` marker files
(``defs/globalfloods.py:148-150``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from .datasets import get_dataset_definition

CHIP_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        # tile geometry denormalized into the chip row: zonal stats and any
        # per-chip geometry math then run join-free — at 100 TB a payload
        # shuffle join is the single most expensive plan shape (columnar
        # stores prune the column when unused)
        T.StructField("geometry_wkb", T.BinaryType()),
        T.StructField("dataset", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("bounds_w", T.DoubleType()),
        T.StructField("bounds_s", T.DoubleType()),
        T.StructField("bounds_e", T.DoubleType()),
        T.StructField("bounds_n", T.DoubleType()),
        T.StructField("band_names", T.ArrayType(T.StringType())),
        T.StructField("payload", T.BinaryType()),
        T.StructField("status", T.StringType()),
    ]
)


def pixel_dims_from_mpp(
    minx, miny, maxx, maxy, meters_per_pixel: float
) -> tuple[np.ndarray, np.ndarray]:
    """F12 (``gee.py:281-284``): per-tile pixel dims from meters_per_pixel —
    project the tile envelope to the UTM CRS picked by its FIRST envelope
    corner (``gee.py:275-277`` takes ``coords[0]``), take the UTM-space
    axis-aligned envelope of the projected corners (per-axis max-min — the
    reference projects first, THEN takes ``.bounds``; under shear this span
    can exceed any single edge delta, ADVICE r2), ``ceil(/mpp)``.
    Vectorized per Arrow batch: (pixels_lon, pixels_lat) = (width, height).
    """
    from ..geo import utm as _utm

    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    zones = _utm.utm_zone(minx, miny)
    south = miny < 0
    # envelope ring corners (box_ring order), projected per tile
    lon = np.stack([minx, maxx, maxx, minx], axis=1)
    lat = np.stack([miny, miny, maxy, maxy], axis=1)
    px = np.empty_like(lon)
    py = np.empty_like(lat)
    for z in np.unique(np.stack([zones, south], axis=1), axis=0):
        zone_i, south_i = int(z[0]), bool(z[1])
        sel = (zones == zone_i) & (south == south_i)
        e, n = _utm.lonlat_to_utm(lon[sel].ravel(), lat[sel].ravel(), zone_i, south_i)
        px[sel] = e.reshape(-1, 4)
        py[sel] = n.reshape(-1, 4)
    # UTM envelope spans of the projected quad (reference .bounds parity)
    dx = px.max(axis=1) - px.min(axis=1)
    dy = py.max(axis=1) - py.min(axis=1)
    pixels_lon = np.ceil(dx / meters_per_pixel).astype(np.int64)
    pixels_lat = np.ceil(dy / meters_per_pixel).astype(np.int64)
    return pixels_lon, pixels_lat


def generate_chips(
    tiles: DataFrame,
    dataset_name: str,
    height: int = 100,
    width: int = 100,
    meters_per_pixel: float | None = None,
) -> DataFrame:
    """mapInPandas chip synthesis for every tile (no shuffle).

    With ``meters_per_pixel`` set, per-tile dims come from the reference's
    ceil(max-UTM-edge / mpp) recipe (F12) instead of fixed height/width.
    """

    # resolve on the driver and ship the plugin object in the closure
    # (cloudpickle) so user-registered defs work on executors — the Spark
    # analog of the reference persisting the def .py next to outputs
    ddef = get_dataset_definition(dataset_name) if isinstance(dataset_name, str) else dataset_name
    dataset_name = ddef.get_dataset_name()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            if meters_per_pixel is not None:
                ws, hs = pixel_dims_from_mpp(
                    pdf["minx"].to_numpy(), pdf["miny"].to_numpy(),
                    pdf["maxx"].to_numpy(), pdf["maxy"].to_numpy(),
                    meters_per_pixel,
                )
            else:
                ws = np.full(len(pdf), width, dtype=np.int64)
                hs = np.full(len(pdf), height, dtype=np.int64)
            for k, (tile_id, wkb, w_, s_, e_, n_) in enumerate(zip(
                pdf["tile_id"], pdf["geometry_wkb"],
                pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"],
            )):
                arr = ddef.synth_chip(tile_id, int(hs[k]), int(ws[k]))
                if arr is None:
                    rows.append(
                        _row(tile_id, wkb, dataset_name, 0, 0, 0, ddef.get_dtype(),
                             w_, s_, e_, n_, [], b"", "nodata")
                    )
                    continue
                arr = ddef.post_process_chip(arr)
                # A5 zero-sum check (defs/globalfloods.py:114-150,
                # defs/firecci51.py:45-53): defs may declare all-zero chips
                # as permanently-empty -> 'nodata' status row
                if getattr(ddef, "zero_sum_is_nodata", False) and arr.sum() == 0:
                    rows.append(
                        _row(tile_id, wkb, dataset_name, 0, 0, 0, ddef.get_dtype(),
                             w_, s_, e_, n_, [], b"", "nodata")
                    )
                    continue
                bands = 1 if arr.ndim == 2 else arr.shape[2]
                names = [f"b{i+1}" for i in range(bands)]
                rows.append(
                    _row(tile_id, wkb, dataset_name, arr.shape[0], arr.shape[1], bands,
                         str(arr.dtype), w_, s_, e_, n_, names,
                         np.ascontiguousarray(arr).tobytes(), "ok")
                )
            yield pd.DataFrame(rows)

    return tiles.select(
        "tile_id", "geometry_wkb", "minx", "miny", "maxx", "maxy"
    ).mapInPandas(gen, CHIP_SCHEMA)


def _row(tile_id, wkb, dataset, h, w, bands, dtype, bw, bs, be, bn, names, payload, status):
    return {
        "tile_id": tile_id,
        "geometry_wkb": bytes(wkb),
        "dataset": dataset,
        "media_ref": f"{dataset}/{tile_id}",
        "height": int(h),
        "width": int(w),
        "bands": int(bands),
        "dtype": dtype,
        "bounds_w": float(bw),
        "bounds_s": float(bs),
        "bounds_e": float(be),
        "bounds_n": float(bn),
        "band_names": names,
        "payload": payload,
        "status": status,
    }


def ingest_chips_resumable(
    spark: SparkSession,
    catalog: Catalog,
    tiles: DataFrame,
    dataset_name: str,
    table: str = "chips",
    height: int = 100,
    width: int = 100,
) -> int:
    """Idempotent chip ingestion: anti-join against the committed chips table
    (both 'ok' and 'nodata' rows count as done — ``gee.py:267-274`` +
    ``must_get_gee_image`` semantics), generate only the gap, MERGE.

    Returns the number of newly generated chips.
    """
    pending = tiles
    if catalog.exists(table):
        done = (
            catalog.read(spark, table)
            .filter(F.col("dataset") == dataset_name)
            .select("tile_id")
        )
        pending = tiles.join(done, on="tile_id", how="left_anti")
    new_chips = generate_chips(pending, dataset_name, height, width)
    n = new_chips.count()
    if n > 0:
        catalog.merge_upsert(spark, new_chips, table, keys=["tile_id", "dataset"])
        catalog.log_metrics(
            spark, job=f"ingest:{dataset_name}", stage="chips",
            df_out=catalog.read(spark, table), extra={"new_rows": n},
        )
    return n


def decode_payload(payload: bytes, dtype: str, h: int, w: int, bands: int) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.dtype(dtype))
    if bands == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, bands)


def merge_band_parts(parts: DataFrame) -> DataFrame:
    """W7: stitch ``__partNN`` band slices back into one chip
    (``gee.py:53-81``): per tile, parts sorted by part id, bands
    concatenated in order, band_names unioned.

    ``parts`` = chips rows + ``part_id:int`` where each payload holds a
    band-contiguous slice.  Plan: groupBy(tile_id, dataset) +
    sort_array(collect_list(struct(part_id, ...))) then a numpy concat per
    Arrow batch.
    """
    g = parts.groupBy("tile_id", "dataset").agg(
        F.sort_array(
            F.collect_list(
                F.struct("part_id", "payload", "bands", "band_names")
            )
        ).alias("ps"),
        F.first("geometry_wkb").alias("geometry_wkb"),
        F.first("height").alias("height"),
        F.first("width").alias("width"),
        F.first("dtype").alias("dtype"),
        F.first("bounds_w").alias("bounds_w"),
        F.first("bounds_s").alias("bounds_s"),
        F.first("bounds_e").alias("bounds_e"),
        F.first("bounds_n").alias("bounds_n"),
        F.first("media_ref").alias("media_ref"),
        F.first("status").alias("status"),
    )

    def stitch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arrs = []
                names: list[str] = []
                for p in r.ps:
                    a = decode_payload(
                        p["payload"], r.dtype, r.height, r.width, p["bands"]
                    )
                    arrs.append(a if a.ndim == 3 else a[:, :, None])
                    names.extend(p["band_names"])
                merged = np.concatenate(arrs, axis=2)
                rows.append(
                    _row(r.tile_id, r.geometry_wkb, r.dataset, r.height, r.width,
                         merged.shape[2], r.dtype, r.bounds_w, r.bounds_s,
                         r.bounds_e, r.bounds_n, names,
                         np.ascontiguousarray(merged).tobytes(), r.status)
                )
            yield pd.DataFrame(rows)

    return g.mapInPandas(stitch, CHIP_SCHEMA)
