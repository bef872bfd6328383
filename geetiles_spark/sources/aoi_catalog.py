"""S6: named-AOI catalog (the reference's Natural-Earth lookup).

Reference (``/root/reference/geetiles/utils.py:139-183``): a packaged
parquet of country polygons searched by name across six attribute columns
(``SOVEREIGNT SOV_A3 CONTINENT REGION_UN SUBREGION REGION_WB``) with a
2-letter-code convenience ('XX' -> 'XX1') and a unary union of all matching
geometries.  The packaged parquet is absent from the reference checkout
(``.MISSING_LARGE_BLOBS``), so the catalog here is pluggable: any DataFrame
with the six attribute columns + ``geometry_wkb`` works; a small synthetic
catalog ships for fixtures.

``get_aoi`` returns the list of matching exterior rings (the engine's
multipolygon representation); file paths short-circuit to WKT loading like
the reference (``utils.py:163-166``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import geom, wkt

SEARCH_COLS = ["SOVEREIGNT", "SOV_A3", "CONTINENT", "REGION_UN", "SUBREGION", "REGION_WB"]


def synthetic_catalog(spark: SparkSession) -> DataFrame:
    """Deterministic fixture catalog: a few box 'countries' grouped into
    continents (enough to exercise every lookup path)."""
    rows = []
    specs = [
        ("Luxembourg", "LUX", "Europe", "Europe", "Western Europe", "Europe & Central Asia", (5.7, 49.4, 6.6, 50.2)),
        ("Belgium", "BEL", "Europe", "Europe", "Western Europe", "Europe & Central Asia", (2.5, 49.5, 6.4, 51.5)),
        ("Atlantis", "ATL1", "Oceania", "Oceania", "Mythical", "Other", (-30.0, 30.0, -29.0, 31.0)),
        ("Mu", "MU1", "Oceania", "Oceania", "Mythical", "Other", (-28.0, 30.0, -27.0, 31.0)),
    ]
    for name, code, cont, reg, sub, wb, (x0, y0, x1, y1) in specs:
        rows.append(
            {
                "SOVEREIGNT": name, "SOV_A3": code, "CONTINENT": cont,
                "REGION_UN": reg, "SUBREGION": sub, "REGION_WB": wb,
                "geometry_wkb": geom.polygon_to_wkb(geom.box_ring(x0, y0, x1, y1)),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def get_aoi(catalog: DataFrame, aoiname: str) -> list[np.ndarray] | None:
    """Resolve an AOI name to exterior rings (or None when unknown).

    Matches the reference's search order: file path first, then the six
    attribute columns case-insensitively, 2-letter codes get a '1' suffix
    (``utils.py:168-177``).  Multiple matches union — represented as the
    list of member rings (the engine treats multipolygons as ring lists).
    """
    if os.path.isfile(aoiname):
        return wkt.loads_rings(open(aoiname).read())
    zname = f"{aoiname}1" if len(aoiname) == 2 else aoiname
    pdf = catalog.toPandas()  # small dim table, driver lookup (utils.py:174)
    for col in SEARCH_COLS:
        hits = pdf[pdf[col].str.lower() == zname.lower()]
        if len(hits):
            return [geom.wkb_to_polygon(bytes(w)) for w in hits["geometry_wkb"]]
    return None
