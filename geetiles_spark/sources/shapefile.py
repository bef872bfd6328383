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

Multi-ring records are read at full fidelity (VERDICT r2 #2): per the ESRI
spec exterior rings are clockwise and holes counter-clockwise; each hole is
assigned to the exterior part containing its first vertex.  Records encode
as WKB Polygon / Polygon-with-holes / MultiPolygon
(:func:`..geo.geom.parts_to_wkb`), which the G4 sliver guard consumes
exactly; single-ring consumers see the largest exterior via the
``wkb_to_polygon`` compat shim.

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


Parts = list[tuple[np.ndarray, list[np.ndarray]]]


def read_shp_parts(path: str | Path) -> list[Parts | None]:
    """Parse a .shp file into full multipolygon structure per record:
    ``[(exterior, [holes]), ...]`` (None for Null shapes).

    ESRI orientation rule: exterior rings wind clockwise (negative shoelace),
    holes counter-clockwise.  A hole attaches to the exterior whose ring
    contains its first vertex; an orphan CCW ring (mis-oriented producer) is
    promoted to an exterior part rather than dropped."""
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

    records: list[Parts | None] = []
    off = 100
    while off + 8 <= end:
        _recno, content_words = struct.unpack_from(">ii", data, off)
        off += 8
        rec_end = off + content_words * 2
        (stype,) = struct.unpack_from("<i", data, off)
        if stype == SHAPE_NULL:
            records.append(None)
            off = rec_end
            continue
        if stype not in (SHAPE_POLYGON, SHAPE_POLYGONZ):
            raise ValueError(f"record shape type {stype} unsupported")
        num_parts, num_points = struct.unpack_from("<ii", data, off + 36)
        part_offs = np.frombuffer(data, dtype="<i4", count=num_parts, offset=off + 44)
        pts_off = off + 44 + 4 * num_parts
        pts = np.frombuffer(
            data, dtype="<f8", count=num_points * 2, offset=pts_off
        ).reshape(num_points, 2)
        bounds_list = list(part_offs) + [num_points]
        exteriors: list[np.ndarray] = []
        holes: list[np.ndarray] = []
        for p in range(num_parts):
            ring = pts[bounds_list[p]:bounds_list[p + 1]]
            if len(ring) < 4:
                continue
            ring = geom.ring_close(ring.copy())
            x, y = ring[:-1, 0], ring[:-1, 1]
            signed = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) * 0.5
            (exteriors if signed <= 0 else holes).append(ring)
        if not exteriors and holes:
            # whole record mis-oriented: promote
            exteriors, holes = holes, []
        if not exteriors:
            records.append(None)
            off = rec_end
            continue
        parts: Parts = [(ext, []) for ext in exteriors]
        for h in holes:
            owner = None
            for i, (ext, _) in enumerate(parts):
                if geom.points_in_polygon(h[:1], ext)[0]:
                    owner = i
                    break
            if owner is None:
                parts.append((h, []))  # orphan CCW ring -> exterior part
            else:
                parts[owner][1].append(h)
        records.append(parts)
        off = rec_end
    return records


def read_shp_rings(path: str | Path) -> list[np.ndarray | None]:
    """Compat: one exterior ring per record — the largest-|area| exterior
    (None for Null shapes).  Full fidelity: :func:`read_shp_parts`."""
    out: list[np.ndarray | None] = []
    for parts in read_shp_parts(path):
        if parts is None:
            out.append(None)
        else:
            out.append(max((p[0] for p in parts), key=geom.ring_area))
    return out


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
    recs = read_shp_parts(shp_path)
    dbf_path = shp_path.with_suffix(".dbf")
    attrs = read_dbf(dbf_path) if dbf_path.exists() else pd.DataFrame(index=range(len(recs)))
    if len(attrs) not in (0, len(recs)):
        raise ValueError(
            f".dbf has {len(attrs)} records but .shp has {len(recs)}"
        )
    keep = [i for i, r in enumerate(recs) if r is not None]
    out = pd.DataFrame(
        {"geom_wkb": [geom.parts_to_wkb(recs[i]) for i in keep]}
    )
    if len(attrs):
        out = pd.concat(
            [out, attrs.iloc[keep].reset_index(drop=True)], axis=1
        )
    return spark.createDataFrame(out)
