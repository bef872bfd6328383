"""K6: mosaic assembly — place per-tile chips onto a global UTM canvas.

Reference (``/root/reference/geetiles/cmds.py:578-699``): for every tile
GeoTIFF, project its lon/lat corner box to the mosaic UTM CRS, convert to
pixel coords (``ceil((c - min_m) / mpp)``), order-0 resize to the pixel
rect, rotate by the corner-skew angle (``arctan2``), then paste non-zero
pixels into one giant in-memory canvas and write a GeoTIFF.

Spark design: the single canvas becomes a grid of fixed-size **blocks** —
each chip emits (block, placement) rows for every block its pixel rect
overlaps; ``groupBy(block).applyInPandas`` pastes each block independently
(same non-zero-wins rule, deterministic paste order by tile_id to replace
the reference's directory order, ``cmds.py:644``).  The blocks table is the
mosaic; a driver-side stitcher materializes small mosaics for tests.  At
10^12 scale blocks write straight to the catalog and no single machine ever
holds the canvas.

Documented divergence: the reference's rotation uses skimage ``rotate``
(bilinear, float output); without skimage we rotate nearest-neighbor.  The
skew angle of degree-aligned tiles projected to UTM is < 1 deg at mid
latitudes, so placements differ by at most one pixel at tile edges.

Faithful quirk: like the reference (``cmds.py:683-685``), patches whose
pixel rect falls even partially outside the canvas are dropped whole — the
corner-skew offset (rot_y) pushes the bottom/top tile rows out by a couple
of pixels, so mosaics lose their boundary tiles exactly as the reference's
do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import utm
from ..sources.chips import decode_payload

BLOCK = 1024  # canvas block side in pixels


def rotate_nn(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Nearest-neighbor rotation about the image center, same output shape
    (skimage ``rotate(..., resize=False)`` geometry, order-0)."""
    if abs(angle_deg) < 1e-12:
        return img
    a = np.deg2rad(angle_deg)
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse map: output pixel -> input pixel
    ca, sa = np.cos(a), np.sin(a)
    sx = ca * (xx - cx) + sa * (yy - cy) + cx
    sy = -sa * (xx - cx) + ca * (yy - cy) + cy
    sxi = np.rint(sx).astype(np.int64)
    syi = np.rint(sy).astype(np.int64)
    ok = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
    out = np.zeros_like(img)
    out[yy[ok], xx[ok]] = img[syi[ok], sxi[ok]]
    return out


def resize_nn(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Order-0 resize (reference ``resize(..., order=0)``, cmds.py:614)."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    yi = np.clip((np.arange(oh) * h // max(oh, 1)), 0, h - 1)
    xi = np.clip((np.arange(ow) * w // max(ow, 1)), 0, w - 1)
    return img[np.ix_(yi, xi)]


def mosaic_blocks(
    chips: DataFrame, meters_per_pixel: float, band: int = 0
) -> tuple[DataFrame, dict]:
    """Distributed mosaic: returns (blocks DataFrame, canvas metadata).

    blocks(bx, by, payload binary, dtype, h, w) — pixel layout matches the
    reference canvas (x = easting, y = northing axis before the final
    transpose/flip, ``cmds.py:676-699``).
    """
    spark = chips.sparkSession
    b = chips.filter(F.col("status") == "ok").agg(
        F.min("bounds_w").alias("w"), F.min("bounds_s").alias("s"),
        F.max("bounds_e").alias("e"), F.max("bounds_n").alias("n"),
        F.first("dtype").alias("dtype"),
    ).collect()[0]
    # mean of all corner coords picks the UTM zone (cmds.py:652-656)
    mean_lon = (b["w"] + b["e"]) / 2.0
    mean_lat = (b["s"] + b["n"]) / 2.0
    zone = int(utm.utm_zone(np.float64(mean_lon), np.float64(mean_lat)))
    south = mean_lat < 0
    ex, ny = utm.lonlat_to_utm(
        np.array([b["w"], b["e"]]), np.array([b["s"], b["n"]]), zone, south
    )
    min_m = np.array([ex[0], ny[0]])
    max_m = np.array([ex[1], ny[1]])
    dims = np.round((max_m - min_m) / meters_per_pixel).astype(int)
    meta = {
        "zone": zone, "south": south,
        "min_m": min_m.tolist(), "max_m": max_m.tolist(),
        "dim_x": int(dims[0]), "dim_y": int(dims[1]),
        "meters_per_pixel": meters_per_pixel, "dtype": b["dtype"],
        "block": BLOCK,
    }
    bc = spark.sparkContext.broadcast(meta)

    piece_schema = T.StructType(
        [
            T.StructField("bx", T.IntegerType()),
            T.StructField("by", T.IntegerType()),
            T.StructField("tile_id", T.StringType()),
            T.StructField("x0", T.IntegerType()),
            T.StructField("y0", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("patch", T.BinaryType()),
        ]
    )

    def place(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        mn = np.array(m["min_m"])
        mpp = m["meters_per_pixel"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_payload(r.payload, r.dtype, r.height, r.width, r.bands)
                if arr.ndim == 3:
                    arr = arr[:, :, band]
                # corner box in UTM: [w,n],[w,s],[e,s],[e,n] (cmds.py:600)
                lon = np.array([r.bounds_w, r.bounds_w, r.bounds_e, r.bounds_e])
                lat = np.array([r.bounds_n, r.bounds_s, r.bounds_s, r.bounds_n])
                cx, cy = utm.lonlat_to_utm(lon, lat, m["zone"], m["south"])
                coords = np.stack([cx, cy], axis=1)
                cp = np.ceil((coords - mn) / mpp).astype(int)
                sw = cp[1]
                patch_size = (cp[2, 0] - cp[1, 0], cp[3, 1] - cp[2, 1])
                if patch_size[0] <= 0 or patch_size[1] <= 0:
                    continue
                rot_y = cp[1, 1] - cp[2, 1]
                angle = np.arctan2(rot_y, patch_size[1]) * 180 / np.pi
                # reference orientation: img transposed to (x, y) with y
                # flipped later; emulate by building the (x, y) patch
                patch = resize_nn(np.transpose(arr)[:, ::-1], patch_size)
                patch = rotate_nn(patch, angle)
                x0, y0 = int(sw[0]), int(sw[1] - rot_y)
                ph, pw = patch.shape
                # reference skips whole patches out of canvas range
                # (cmds.py:683-685)
                if (
                    x0 < 0 or y0 < 0
                    or x0 + ph > m["dim_x"] or y0 + pw > m["dim_y"]
                ):
                    continue
                for bx in range(x0 // BLOCK, (x0 + ph - 1) // BLOCK + 1):
                    for by in range(y0 // BLOCK, (y0 + pw - 1) // BLOCK + 1):
                        rows.append(
                            {
                                "bx": bx, "by": by, "tile_id": r.tile_id,
                                "x0": x0, "y0": y0, "h": ph, "w": pw,
                                "dtype": str(patch.dtype),
                                "patch": np.ascontiguousarray(patch).tobytes(),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    pieces = chips.filter(F.col("status") == "ok").select(
        "tile_id", "payload", "dtype", "height", "width", "bands",
        "bounds_w", "bounds_s", "bounds_e", "bounds_n",
    ).mapInPandas(place, piece_schema)

    block_schema = T.StructType(
        [
            T.StructField("bx", T.IntegerType()),
            T.StructField("by", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("dtype", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def paste(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        dt = np.dtype(pdf["dtype"].iloc[0])
        canvas = np.zeros((BLOCK, BLOCK), dtype=dt)
        ox, oy = bx * BLOCK, by * BLOCK
        # deterministic order replaces the reference's sorted-filename order
        for r in pdf.sort_values("tile_id").itertuples(index=False):
            patch = np.frombuffer(r.patch, dtype=np.dtype(r.dtype)).reshape(r.h, r.w)
            gx0, gy0 = r.x0, r.y0
            sx0 = max(gx0, ox); sy0 = max(gy0, oy)
            sx1 = min(gx0 + r.h, ox + BLOCK); sy1 = min(gy0 + r.w, oy + BLOCK)
            if sx0 >= sx1 or sy0 >= sy1:
                continue
            sub = patch[sx0 - gx0:sx1 - gx0, sy0 - gy0:sy1 - gy0]
            tgt = canvas[sx0 - ox:sx1 - ox, sy0 - oy:sy1 - oy]
            tgt[sub != 0] = sub[sub != 0]
        return pd.DataFrame(
            [{"bx": bx, "by": by, "h": BLOCK, "w": BLOCK,
              "dtype": str(dt), "payload": canvas.tobytes()}]
        )

    blocks = pieces.groupBy("bx", "by").applyInPandas(paste, block_schema)
    return blocks, meta


def stitch_blocks(blocks_pdf: pd.DataFrame, meta: dict) -> np.ndarray:
    """Driver-side stitcher for small mosaics (tests/inspection): returns the
    final canvas in the reference's output orientation (transpose + y-flip,
    ``cmds.py:688-690``)."""
    dim_x, dim_y = meta["dim_x"], meta["dim_y"]
    dt = np.dtype(meta["dtype"])
    canvas = np.zeros((dim_x, dim_y), dtype=dt)
    for r in blocks_pdf.itertuples(index=False):
        block = np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(r.h, r.w)
        x0, y0 = r.bx * meta["block"], r.by * meta["block"]
        x1 = min(x0 + meta["block"], dim_x)
        y1 = min(y0 + meta["block"], dim_y)
        if x0 >= dim_x or y0 >= dim_y:
            continue
        canvas[x0:x1, y0:y1] = block[: x1 - x0, : y1 - y0]
    return canvas.T[::-1, :]
