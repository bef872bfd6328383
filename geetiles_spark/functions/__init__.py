"""Scalar-function surface (SURVEY §2.7) — Spark column expressions and
pandas-UDF wrappers around the numpy kernels.

Most reference scalar functions map to built-ins or live in geo/:
F1/F2 hashing -> geo.hashing; F3 UTM -> geo.utm; F4/F5 value/range maps ->
geo.maps (+ the column wrappers here); F6 mask -> geo.raster; F7 expand ->
operators.zonal.expand_props; F8 flatten -> geo.wkt ring lists; F10
align_to_lonlat -> faithful no-op (the reference function does not exist;
``partitions.py:99-104`` swallows the NameError); F11/F12/F13 -> grid/chips/
mosaic kernels; F14 date helpers -> Spark built-ins (wrapped below);
F16/F17 -> dataset-def post-process hooks; F18 -> ``to_json(struct(...))``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..geo import maps


def apply_value_map_col(col: Column, value_map) -> Column:
    """F4 as a pure column expression: explicit int->int map via CASE chain
    (the SQL-oracle-friendly twin of ``geo.maps.apply_value_map``)."""
    vm = maps.normalize_value_map(value_map)
    init_val = 0 if (0 in vm and vm[0] == 0) else list(vm.keys())[0]
    expr = F.lit(init_val)
    for k, v in vm.items():
        if v == init_val:
            continue
        expr = F.when(col == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


def apply_range_map_col(col: Column, edges: list[float]) -> Column:
    """F5 as a column expression: ``< e0 -> 0``, ``[e_i, e_{i+1}) -> i+1``,
    ``>= e_last -> len(edges)`` (``utils.py:320-352`` semantics)."""
    expr = F.lit(0)
    for i, e in enumerate(edges):
        expr = F.when(col >= F.lit(float(e)), F.lit(i + 1)).otherwise(expr)
    return expr


def align_to_lonlat(geometry):
    """F10: the reference calls ``utils.align_to_lonlat`` which is defined
    nowhere; the except-handler at ``partitions.py:102-104`` makes alignment
    a silent no-op.  Reproduced faithfully."""
    return geometry


def month_bounds(col: Column) -> tuple[Column, Column]:
    """F14 date helpers (``defs/s1grdobs.py:86-103``): first/last day of the
    month — Spark built-ins."""
    return F.trunc(col, "month"), F.last_day(col)
