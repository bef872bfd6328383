"""S2-clustered spatial storage: Hilbert-partitioned writes + AOI-pruned reads.

The 10^12-row answer to "where does a spatial query's I/O go": the reference
keeps one GeoTIFF per tile on a filesystem and every AOI query lists the whole
directory (``geetiles/partitions.py:432-445``); at Iceberg scale the same
role is played by the table's partition spec + file sort order.  This module
writes a point/tile table

* hive-partitioned by the coarse S2 cell ``s2_part = cell_id(lon, lat, P)``
  (Iceberg partition-transform analog), and
* sorted within partitions by the leaf id ``s2_leaf`` — the Hilbert curve
  puts spatially-adjacent rows in the same parquet row group, so min/max
  row-group stats prune WITHIN files too;

and reads an AOI through :func:`geetiles_spark.geo.s2.cover_bbox` — a
provably-sound covering (superset law tested), so partition pruning can drop
only partitions with no AOI rows, never a matching row.  The exact lon/lat
predicate stays in the plan: results are BIT-IDENTICAL to an unpruned scan,
pruning is performance-only (same law as the kNN index choice).

Scan-time behavior (asserted in tests): the pruned read's
``PartitionFilters`` carries the cover, and ``inputFiles()`` shrinks from
O(all partitions) to O(cover).  At 1000 executors the AOI query reads
|cover|/|partitions| of the table instead of all of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..geo import s2


def with_s2_keys(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    part_level: int = 8,
    leaf_level: int = 20,
) -> DataFrame:
    """Append ``s2_part`` (coarse partition key) and ``s2_leaf`` (sort key).
    One Arrow-batched pass; both ids from the same projection math so
    ``s2_part == parent(s2_leaf, part_level)`` by construction."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("s2_part", T.LongType()),
                T.StructField("s2_leaf", T.LongType()),
            ]
        )
    )
    def keys(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        leaf = s2.cell_id(lon.to_numpy(), lat.to_numpy(), leaf_level)
        return pd.DataFrame(
            {"s2_part": s2.parent(leaf, part_level), "s2_leaf": leaf}
        )

    # materialize the struct once, then expand — two withColumn calls would
    # collapse into one projection holding the UDF expression twice (the
    # lambda-CSE lesson: Catalyst does not dedupe Python UDF calls)
    return (
        df.select("*", keys(F.col(lon_col), F.col(lat_col)).alias("_s2k"))
        .select("*", "_s2k.s2_part", "_s2k.s2_leaf")
        .drop("_s2k")
    )


def spatial_cluster_write(
    catalog: Catalog,
    name: str,
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    part_level: int = 8,
    leaf_level: int = 20,
) -> str:
    """Commit ``df`` as an S2-clustered snapshot: repartition on ``s2_part``
    (one output file per occupied coarse cell — bounded by geography, not by
    task count: the IVF small-files law), Hilbert-sort within partitions,
    hive-partition by ``s2_part``.  Partition spec recorded in the commit
    log so readers can validate their pruning level."""
    keyed = (
        with_s2_keys(df, lon_col, lat_col, part_level, leaf_level)
        .repartition("s2_part")
        .sortWithinPartitions("s2_part", "s2_leaf")
    )
    return catalog.write(
        keyed,
        name,
        meta={
            "spatial_index": "s2",
            "part_level": part_level,
            "leaf_level": leaf_level,
            "lon_col": lon_col,
            "lat_col": lat_col,
        },
        partition_by=["s2_part"],
    )


def read_aoi(
    catalog: Catalog,
    spark: SparkSession,
    name: str,
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
) -> DataFrame:
    """AOI scan over an S2-clustered table: cover the bbox at the table's
    committed ``part_level``, prune partitions with an ``isin`` on
    ``s2_part`` (directory-level PartitionFilters), keep the EXACT bbox
    predicate on lon/lat — identical rows to an unpruned scan, a fraction
    of the I/O."""
    meta = catalog.commit_meta(name)
    if meta.get("spatial_index") != "s2":
        raise ValueError(f"table {name} is not S2-clustered")
    cover = s2.cover_bbox(minlon, minlat, maxlon, maxlat, meta["part_level"])
    lon_col, lat_col = meta["lon_col"], meta["lat_col"]
    return (
        catalog.read(spark, name)
        .where(F.col("s2_part").isin([int(c) for c in cover]))
        .where(
            (F.col(lon_col) >= minlon)
            & (F.col(lon_col) <= maxlon)
            & (F.col(lat_col) >= minlat)
            & (F.col(lat_col) <= maxlat)
        )
    )


def cover_superset_check(
    lon: np.ndarray,
    lat: np.ndarray,
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
    level: int,
) -> bool:
    """Test hook for the soundness law: every point inside the bbox maps to
    a cell inside ``cover_bbox``'s result."""
    inside = (
        (lon >= minlon) & (lon <= maxlon) & (lat >= minlat) & (lat <= maxlat)
    )
    if not inside.any():
        return True
    cids = s2.cell_id(lon[inside], lat[inside], level)
    cover = s2.cover_bbox(minlon, minlat, maxlon, maxlat, level)
    return bool(np.isin(cids, cover).all())


def read_aoi_polygon(
    catalog: Catalog,
    spark: SparkSession,
    name: str,
    ring: np.ndarray,
) -> DataFrame:
    """Polygon-AOI scan over an S2-clustered table: prune partitions with
    the (sound, superset) bbox cover of the ring's envelope, then refine
    with the EXACT point-in-polygon test (`geo.geom.points_in_polygon`,
    Arrow-batched) — identical rows to an unpruned PIP scan (law shared
    with :func:`read_aoi`), reading only the AOI's partition directories.
    The reference's analog is the per-AOI directory layout it re-lists in
    full for every query (``geetiles/partitions.py:432-445``)."""
    from ..geo import geom

    meta = catalog.commit_meta(name)
    if meta.get("spatial_index") != "s2":
        raise ValueError(f"table {name} is not S2-clustered")
    ring = np.asarray(ring, dtype=np.float64)
    minlon, minlat = ring[:, 0].min(), ring[:, 1].min()
    maxlon, maxlat = ring[:, 0].max(), ring[:, 1].max()
    cover = s2.cover_bbox(minlon, minlat, maxlon, maxlat, meta["part_level"])
    lon_col, lat_col = meta["lon_col"], meta["lat_col"]
    pruned = (
        catalog.read(spark, name)
        .where(F.col("s2_part").isin([int(c) for c in cover]))
        .where(
            (F.col(lon_col) >= float(minlon))
            & (F.col(lon_col) <= float(maxlon))
            & (F.col(lat_col) >= float(minlat))
            & (F.col(lat_col) <= float(maxlat))
        )
    )
    bring = spark.sparkContext.broadcast(ring)

    @F.pandas_udf(T.BooleanType())
    def inside(lon: pd.Series, lat: pd.Series) -> pd.Series:
        pts = np.column_stack([lon.to_numpy(), lat.to_numpy()])
        return pd.Series(geom.points_in_polygon(pts, bring.value))

    return pruned.where(inside(F.col(lon_col), F.col(lat_col)))
