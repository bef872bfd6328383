"""Spatial joins: argmax-overlap intersect (J1), area-weighted foreign
proportions (J2), AOI semi-join (J3), and cell-ring-expansion kNN.

Reference semantics (``/root/reference/geetiles/partitions.py:470-507``):
for each tile, scan ALL foreign geometries with ``intersects`` (an O(N×M)
Python nested loop — the reference's scalability cliff), then

* J1 (``geet intersect``): foreign id of the max intersection area, ``-1``
  when nothing intersects; ties resolve to the first max in foreign row
  order (``np.argmax``);
* J2 (``geet lp.from_foreign``): weights ``w_i = area_i / Σ area`` over the
  intersecting set, output ``Σ w_i · props_i`` per class key (missing keys
  contribute 0 — pandas NaN-skip semantics at ``partitions.py:500``), plus
  the argmax foreign id.

Two physical strategies, result-identical (tested against each other and the
pandas oracle):

* **broadcast-refine** — the foreign set is small (communes vs 1 km tiles):
  collect + broadcast, one ``mapInPandas`` over tiles with a vectorized bbox
  prefilter then exact SAT/clip kernels.  Zero shuffles.
* **cell-join** — the 10^12-scale path: both sides explode to covering cell
  ids (:mod:`..geo.cells`), Spark equi-joins on the cell (AQE handles skew;
  salting is unnecessary because cell ids are already fine-grained), duplicate
  pairs from multi-cell coverage are dropped pre-refine, the exact kernel
  refines pairs, and window/agg functions produce the argmax / weighted maps.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells, geom

# --------------------------------------------------------------------------
# foreign-set representation
# --------------------------------------------------------------------------


def collect_foreign(foreign: DataFrame) -> list[dict]:
    """Driver-side foreign set for the broadcast path: [(idx, id, ring,
    bounds, props)] in row order (argmax tie parity needs the order)."""
    rows = foreign.select(
        "row_idx", "tile_id", "geometry_wkb", "minx", "miny", "maxx", "maxy", "props"
    ).orderBy("row_idx").collect()
    out = []
    for i, r in enumerate(rows):
        out.append(
            {
                "idx": i,
                "id": r["tile_id"],
                "ring": geom.wkb_to_polygon(bytes(r["geometry_wkb"])),
                "bounds": (r["minx"], r["miny"], r["maxx"], r["maxy"]),
                "props": dict(r["props"]) if r["props"] is not None else {},
            }
        )
    return out


# --------------------------------------------------------------------------
# broadcast-refine strategy
# --------------------------------------------------------------------------

_J1_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("foreign_id", T.StringType()),
    ]
)

_J2_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("foreign_id", T.StringType()),
        T.StructField("props_at_foreign", T.MapType(T.StringType(), T.DoubleType())),
    ]
)


def _candidates(tile_ring, tile_bounds, fset):
    """Exact intersect scan of one tile against the foreign set, with a
    vectorized bbox prefilter.  Returns (idx, area) lists in foreign order."""
    tx0, ty0, tx1, ty1 = tile_bounds
    hits = []
    for f in fset:
        fx0, fy0, fx1, fy1 = f["bounds"]
        if fx1 < tx0 or fx0 > tx1 or fy1 < ty0 or fy0 > ty1:
            continue
        if geom.convex_intersects(tile_ring, f["ring"]):
            area = geom.intersection_area_convex(f["ring"], tile_ring)
            hits.append((f, area))
    return hits


def intersect_join_broadcast(tiles: DataFrame, foreign: DataFrame) -> DataFrame:
    """J1 via broadcast-refine: (tile_id, foreign_id) with '-1' sentinel."""
    fset = collect_foreign(foreign)
    b = tiles.sparkSession.sparkContext.broadcast(fset)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fs = b.value
        for pdf in batches:
            ids, fids = [], []
            for tile_id, wkb, x0, y0, x1, y1 in zip(
                pdf["tile_id"], pdf["geometry_wkb"],
                pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"],
            ):
                ring = geom.wkb_to_polygon(bytes(wkb))
                hits = _candidates(ring, (x0, y0, x1, y1), fs)
                ids.append(tile_id)
                if hits:
                    areas = np.array([a for _, a in hits])
                    fids.append(hits[int(np.argmax(areas))][0]["id"])
                else:
                    fids.append("-1")
            yield pd.DataFrame({"tile_id": ids, "foreign_id": fids})

    return tiles.select(
        "tile_id", "geometry_wkb", "minx", "miny", "maxx", "maxy"
    ).mapInPandas(run, _J1_SCHEMA)


def foreign_proportions_broadcast(tiles: DataFrame, foreign: DataFrame) -> DataFrame:
    """J2 via broadcast-refine: (tile_id, foreign_id, props_at_foreign)."""
    fset = collect_foreign(foreign)
    b = tiles.sparkSession.sparkContext.broadcast(fset)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fs = b.value
        for pdf in batches:
            rows = []
            for tile_id, wkb, x0, y0, x1, y1 in zip(
                pdf["tile_id"], pdf["geometry_wkb"],
                pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"],
            ):
                ring = geom.wkb_to_polygon(bytes(wkb))
                hits = _candidates(ring, (x0, y0, x1, y1), fs)
                if hits:
                    areas = np.array([a for _, a in hits], dtype=np.float64)
                    w = areas / areas.sum()
                    props: dict[str, float] = {}
                    for (f, _), wi in zip(hits, w):
                        for k, v in f["props"].items():
                            props[k] = props.get(k, 0.0) + wi * float(v)
                    fid = hits[int(np.argmax(w))][0]["id"]
                    rows.append(
                        {"tile_id": tile_id, "foreign_id": fid, "props_at_foreign": props}
                    )
                else:
                    rows.append(
                        {"tile_id": tile_id, "foreign_id": "-1", "props_at_foreign": {}}
                    )
            yield pd.DataFrame(rows)

    return tiles.select(
        "tile_id", "geometry_wkb", "minx", "miny", "maxx", "maxy"
    ).mapInPandas(run, _J2_SCHEMA)


# --------------------------------------------------------------------------
# cell-join strategy (scale path)
# --------------------------------------------------------------------------

_CELLS_SCHEMA = "key string, cell long"
_PAIR_REFINE_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("foreign_idx", T.LongType()),
        T.StructField("foreign_id", T.StringType()),
        T.StructField("inter_area", T.DoubleType()),
    ]
)


def _explode_cells(df: DataFrame, level: int) -> DataFrame:
    """(key, cell) covering pairs via the vectorized bbox cover kernel.
    ``df`` must have columns (key, minx, miny, maxx, maxy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows, cids = cells.cover_bbox(
                pdf["minx"].to_numpy(), pdf["miny"].to_numpy(),
                pdf["maxx"].to_numpy(), pdf["maxy"].to_numpy(), level,
            )
            yield pd.DataFrame({"key": pdf["key"].to_numpy()[rows], "cell": cids})

    return df.select("key", "minx", "miny", "maxx", "maxy").mapInPandas(
        run, _CELLS_SCHEMA
    )


def choose_level(foreign: DataFrame) -> int:
    """Cell level ~ median foreign bbox width: big enough that a foreign tile
    covers O(1) cells, small enough to prune."""
    r = foreign.select(
        F.expr("percentile_approx(maxx - minx, 0.5)").alias("w")
    ).collect()[0]
    width = max(float(r["w"] or 0.01), 1e-6)
    return cells.level_for_size(width)


def spatial_pairs_cell_join(
    tiles: DataFrame, foreign: DataFrame, level: int | None = None
) -> DataFrame:
    """Candidate (tile, foreign) pairs + exact refine via the cell equi-join.

    Output: (tile_id, foreign_idx, foreign_id, inter_area) for *intersecting*
    pairs only (touching included, area may be 0).
    """
    level = level or choose_level(foreign)
    tcells = _explode_cells(
        tiles.select(F.col("tile_id").alias("key"), "minx", "miny", "maxx", "maxy"),
        level,
    ).withColumnRenamed("key", "tile_id")
    fcells = _explode_cells(
        foreign.select(F.col("tile_id").alias("key"), "minx", "miny", "maxx", "maxy"),
        level,
    ).withColumnRenamed("key", "foreign_key")

    pairs = (
        tcells.join(fcells, on="cell")
        .select("tile_id", "foreign_key")
        .distinct()  # a pair can co-occur in several cells
    )

    tgeo = tiles.select("tile_id", F.col("geometry_wkb").alias("tile_wkb"))
    fgeo = foreign.select(
        F.col("tile_id").alias("foreign_key"),
        F.col("row_idx").alias("foreign_idx"),
        F.col("geometry_wkb").alias("foreign_wkb"),
    )
    enriched = pairs.join(tgeo, "tile_id").join(F.broadcast(fgeo), "foreign_key")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tile_id, fidx, fkey, twkb, fwkb in zip(
                pdf["tile_id"], pdf["foreign_idx"], pdf["foreign_key"],
                pdf["tile_wkb"], pdf["foreign_wkb"],
            ):
                tring = geom.wkb_to_polygon(bytes(twkb))
                fring = geom.wkb_to_polygon(bytes(fwkb))
                if geom.convex_intersects(tring, fring):
                    rows.append(
                        {
                            "tile_id": tile_id,
                            "foreign_idx": int(fidx),
                            "foreign_id": fkey,
                            "inter_area": geom.intersection_area_convex(fring, tring),
                        }
                    )
            yield pd.DataFrame(rows)

    return enriched.mapInPandas(refine, _PAIR_REFINE_SCHEMA)


def intersect_join_cells(
    tiles: DataFrame, foreign: DataFrame, level: int | None = None
) -> DataFrame:
    """J1 via cell join: argmax area, first-max in foreign row order, '-1'
    for tiles with no intersecting foreign."""
    pairs = spatial_pairs_cell_join(tiles, foreign, level)
    w = Window.partitionBy("tile_id").orderBy(
        F.col("inter_area").desc(), F.col("foreign_idx").asc()
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("tile_id", "foreign_id")
    )
    return (
        tiles.select("tile_id")
        .join(best, "tile_id", "left")
        .fillna({"foreign_id": "-1"})
    )


def foreign_proportions_cells(
    tiles: DataFrame, foreign: DataFrame, level: int | None = None
) -> DataFrame:
    """J2 via cell join: explode props, weight by inter_area / Σ, re-aggregate
    to a map.  Argmax id as in J1."""
    pairs = spatial_pairs_cell_join(tiles, foreign, level)
    fprops = foreign.select(
        F.col("tile_id").alias("foreign_id"), "props"
    )
    with_props = pairs.join(F.broadcast(fprops), "foreign_id")

    wsum = Window.partitionBy("tile_id")
    weighted = with_props.withColumn(
        "w", F.col("inter_area") / F.sum("inter_area").over(wsum)
    )

    exploded = weighted.select(
        "tile_id", "w", F.explode("props").alias("class", "frac")
    )
    agg = (
        exploded.groupBy("tile_id", "class")
        .agg(F.sum(F.col("w") * F.col("frac")).alias("wfrac"))
        .groupBy("tile_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("class", "wfrac")))
            ).alias("props_at_foreign")
        )
    )

    worder = Window.partitionBy("tile_id").orderBy(
        F.col("inter_area").desc(), F.col("foreign_idx").asc()
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(worder))
        .filter(F.col("rn") == 1)
        .select("tile_id", "foreign_id")
    )
    out = (
        tiles.select("tile_id")
        .join(best, "tile_id", "left")
        .join(agg, "tile_id", "left")
        .fillna({"foreign_id": "-1"})
    )
    return out.withColumn(
        "props_at_foreign",
        F.coalesce(
            "props_at_foreign",
            F.create_map().cast("map<string,double>"),
        ),
    )


# --------------------------------------------------------------------------
# J3: AOI semi-join
# --------------------------------------------------------------------------


def aoi_filter(tiles: DataFrame, aoi_ring: np.ndarray) -> DataFrame:
    """Spatial left-semi join against one broadcast AOI geometry
    (``partitions.py:399-403``) — a filter, since the right side is 1 row."""
    b = tiles.sparkSession.sparkContext.broadcast(
        geom.ring_close(np.asarray(aoi_ring, dtype=np.float64))
    )

    @F.pandas_udf(T.BooleanType())
    def hits(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        return pd.Series(
            geom.boxes_intersect_polygon(
                minx.to_numpy(), miny.to_numpy(), maxx.to_numpy(), maxy.to_numpy(),
                b.value,
            )
        )

    return tiles.filter(hits("minx", "miny", "maxx", "maxy"))


# --------------------------------------------------------------------------
# point-in-polygon join
# --------------------------------------------------------------------------


def point_in_polygon_join(
    points: DataFrame,
    polys: DataFrame,
    level: int | None = None,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Assign points to containing polygons: cell equi-join on the point's
    cell vs the polygons' covering cells, then an exact vectorized
    point-in-polygon refine per (partition, polygon) group.

    ``polys`` needs (tile_id, geometry_wkb, minx..maxy).  Output:
    (point_id, lon, lat, tile_id) — inner join (unmatched points drop).
    Polygon rings are broadcast per closure (small dim side); at huge polygon
    cardinality swap the broadcast for a join on tile_id.
    """
    level = level or choose_level(polys)
    spark = points.sparkSession

    @F.pandas_udf(T.LongType())
    def pt_cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(cells.cell_id(lon.to_numpy(), lat.to_numpy(), level))

    pcells = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lon_col).alias("lon"),
        F.col(lat_col).alias("lat"),
    ).withColumn("cell", pt_cell("lon", "lat"))

    gcells = _explode_cells(
        polys.select(F.col("tile_id").alias("key"), "minx", "miny", "maxx", "maxy"),
        level,
    ).withColumnRenamed("key", "tile_id")

    cand = pcells.join(gcells, "cell").select("point_id", "lon", "lat", "tile_id")

    rings = {
        r["tile_id"]: geom.wkb_to_polygon(bytes(r["geometry_wkb"]))
        for r in polys.select("tile_id", "geometry_wkb").collect()
    }
    b = spark.sparkContext.broadcast(rings)

    schema = T.StructType(
        [
            T.StructField("point_id", points.schema[id_col].dataType),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("tile_id", T.StringType()),
        ]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr = b.value
        for pdf in batches:
            keep = np.zeros(len(pdf), dtype=bool)
            pts = np.stack([pdf["lon"].to_numpy(), pdf["lat"].to_numpy()], axis=1)
            # vectorize per polygon group within the batch
            for tid, idx in pdf.groupby("tile_id").indices.items():
                keep[idx] = geom.points_in_polygon(pts[idx], rr[tid])
            yield pdf[keep][["point_id", "lon", "lat", "tile_id"]]

    return cand.mapInPandas(refine, schema)


# --------------------------------------------------------------------------
# kNN: cell-ring-expansion + partial top-k
# --------------------------------------------------------------------------


def knn_join(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "id",
) -> DataFrame:
    """k nearest ``points`` to each query (haversine meters).

    Physical plan: broadcast the (small) query set; each partition computes
    its local top-k per query with a vectorized argpartition (the map-side
    combine of a top-k tree-reduce); a final window takes the global top-k.
    For huge point sets a cell-ring prefilter can bound candidates — the
    partial top-k already avoids any full sort, so the refine stays cheap.
    """
    spark = points.sparkSession
    b = spark.sparkContext.broadcast(queries)

    schema = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField("point_id", points.schema[id_col].dataType),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = b.value
        for pdf in batches:
            lon = np.deg2rad(pdf[lon_col].to_numpy())
            lat = np.deg2rad(pdf[lat_col].to_numpy())
            ids = pdf[id_col].to_numpy()
            for qid, qlon, qlat in qs:
                qlo, qla = np.deg2rad(qlon), np.deg2rad(qlat)
                dlat = lat - qla
                dlon = lon - qlo
                h = (
                    np.sin(dlat / 2) ** 2
                    + np.cos(lat) * np.cos(qla) * np.sin(dlon / 2) ** 2
                )
                d = 2 * 6371008.8 * np.arcsin(np.sqrt(h))
                if len(d) > k:
                    idx = np.argpartition(d, k)[:k]
                else:
                    idx = np.arange(len(d))
                yield pd.DataFrame(
                    {"query_id": qid, "point_id": ids[idx], "dist_m": d[idx]}
                )

    local = points.mapInPandas(local_topk, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col("point_id").asc()
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
