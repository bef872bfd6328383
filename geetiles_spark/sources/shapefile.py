"""S3: pure-Python ESRI shapefile reader (.shp polygons + .dbf attributes).

The reference ingests admin boundaries with ``gpd.read_file``
(``/root/reference/geetiles/cmds.py:377-378``); fiona/GDAL are absent here,
so this module parses the two binary formats directly from their public
specs (ESRI Shapefile Technical Description, July 1998; dBASE III header
layout):

* ``.shp`` — 100-byte header (big-endian file code 9994 + length,
  little-endian version/shape type + bbox), then records of a big-endian
  (record number, content length) pair followed by little-endian shape
  content.  Supported shape types: 5 (Polygon), 15 (PolygonZ — Z/M ignored),
  0 (Null).
* ``.dbf`` — 32-byte header (record count, header/record sizes), 32-byte
  field descriptors terminated by 0x0D, fixed-width latin-1 records with a
  leading deletion flag.

Multi-ring records: the engine's geometry model is single exterior rings
(the reference never uses holes — SURVEY §1.2), so each record keeps its
largest-|area| ring (holes and secondary parts dropped; documented
divergence for multi-part admin shapes).

Output: a Spark DataFrame ``(geom_wkb binary, <dbf attributes>)`` — exactly
the shape :func:`..operators.select.select_partitions` consumes, making
``geet select`` runnable end-to-end from a real .shp/.dbf pair.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import geom

SHAPE_NULL = 0
SHAPE_POLYGON = 5
SHAPE_POLYGONZ = 15


def read_shp_rings(path: str | Path) -> list[np.ndarray | None]:
    """Parse a .shp file into one exterior ring per record (None for Null
    shapes)."""
    data = Path(path).read_bytes()
    if len(data) < 100:
        raise ValueError("not a shapefile: truncated header")
    (file_code,) = struct.unpack_from(">i", data, 0)
    if file_code != 9994:
        raise ValueError(f"not a shapefile: file code {file_code}")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    end = min(file_len_words * 2, len(data))
    (shape_type,) = struct.unpack_from("<i", data, 32)
    if shape_type not in (SHAPE_NULL, SHAPE_POLYGON, SHAPE_POLYGONZ):
        raise ValueError(f"unsupported shape type {shape_type} (need Polygon)")

    rings: list[np.ndarray | None] = []
    off = 100
    while off + 8 <= end:
        _recno, content_words = struct.unpack_from(">ii", data, off)
        off += 8
        rec_end = off + content_words * 2
        (stype,) = struct.unpack_from("<i", data, off)
        if stype == SHAPE_NULL:
            rings.append(None)
            off = rec_end
            continue
        if stype not in (SHAPE_POLYGON, SHAPE_POLYGONZ):
            raise ValueError(f"record shape type {stype} unsupported")
        num_parts, num_points = struct.unpack_from("<ii", data, off + 36)
        parts = np.frombuffer(data, dtype="<i4", count=num_parts, offset=off + 44)
        pts_off = off + 44 + 4 * num_parts
        pts = np.frombuffer(
            data, dtype="<f8", count=num_points * 2, offset=pts_off
        ).reshape(num_points, 2)
        # keep the largest-|area| part as the exterior ring
        best = None
        best_area = -1.0
        bounds_list = list(parts) + [num_points]
        for p in range(num_parts):
            ring = pts[bounds_list[p]:bounds_list[p + 1]]
            if len(ring) < 4:
                continue
            a = geom.ring_area(geom.ring_close(ring))
            if a > best_area:
                best_area = a
                best = ring
        rings.append(geom.ring_close(best.copy()) if best is not None else None)
        off = rec_end
    return rings


def read_dbf(path: str | Path) -> pd.DataFrame:
    """Parse a .dbf attribute table (types C/N/F/L/D) into a DataFrame."""
    data = Path(path).read_bytes()
    num_rec, hdr_size, rec_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < hdr_size - 1 and data[off] != 0x0D:
        raw_name = data[off:off + 11].split(b"\x00", 1)[0]
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((raw_name.decode("latin-1"), ftype, flen, fdec))
        off += 32
    rows = []
    off = hdr_size
    for _ in range(num_rec):
        if off + rec_size > len(data):
            break
        deleted = data[off] == 0x2A  # '*'
        pos = off + 1
        rec = {}
        for name, ftype, flen, fdec in fields:
            raw = data[pos:pos + flen].decode("latin-1").strip()
            pos += flen
            if ftype in ("N", "F"):
                if raw == "":
                    rec[name] = None
                elif ftype == "N" and fdec == 0 and "." not in raw:
                    rec[name] = int(raw)
                else:
                    rec[name] = float(raw)
            elif ftype == "L":
                rec[name] = raw.upper() in ("T", "Y")
            else:  # C, D and anything else: raw text
                rec[name] = raw
        if not deleted:
            rows.append(rec)
        off += rec_size
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def read_shapefile(spark: SparkSession, shp_path: str | Path) -> DataFrame:
    """.shp (+ sibling .dbf if present) -> DataFrame(geom_wkb, *attributes).

    Null-shape records are dropped (with their attribute rows).  The parse
    is a driver-side utility exactly like the reference's one-time
    ``gpd.read_file`` — the returned DataFrame is what scales.
    """
    shp_path = Path(shp_path)
    rings = read_shp_rings(shp_path)
    dbf_path = shp_path.with_suffix(".dbf")
    attrs = read_dbf(dbf_path) if dbf_path.exists() else pd.DataFrame(index=range(len(rings)))
    if len(attrs) not in (0, len(rings)):
        raise ValueError(
            f".dbf has {len(attrs)} records but .shp has {len(rings)}"
        )
    keep = [i for i, r in enumerate(rings) if r is not None]
    out = pd.DataFrame(
        {"geom_wkb": [geom.polygon_to_wkb(rings[i]) for i in keep]}
    )
    if len(attrs):
        out = pd.concat(
            [out, attrs.iloc[keep].reset_index(drop=True)], axis=1
        )
    return spark.createDataFrame(out)
