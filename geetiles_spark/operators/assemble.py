"""K5/J4: final dataset assembly (the reference's ``geet zip.dataset``).

Reference (``/root/reference/geetiles/cmds.py:402-575``): for every tile,
gather the image chip, the label chip (both remapped with ``map_values`` and
cast to int16), the tile's label proportions, the foreign proportions and the
foreign id, build a per-chip dict and write one pickle per chip into a
zip.  The chip dict keys: ``chip`` (int16 array), ``chip_id``,
``center_latlon``, ``corners{nw,se}``, ``label``, ``label_proportions``.
The ``include_chip_in_dataset`` hook filters rows (``cmds.py:527-529``).

Spark design: three equi-joins on tile_id (image chips ⋈ label chips left ⋈
tile metadata) + one mapInPandas that applies map_values / dtype cast /
center-corner math / the include hook, writing a single ``dataset`` table —
no per-file I/O, no zip (the reference's packaging is a file-format detail;
a parity packager can serialize rows to pickles if byte-level parity is ever
needed).  Joins are plain hash joins on tile_id; at scale both chip scans are
bucketed by tile_id so the joins are co-located.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.chips import decode_payload
from ..sources.datasets import get_dataset_definition

DATASET_SCHEMA = T.StructType(
    [
        T.StructField("chip_id", T.StringType()),
        T.StructField("chip", T.BinaryType()),          # int16 C-order
        T.StructField("chip_height", T.IntegerType()),
        T.StructField("chip_width", T.IntegerType()),
        T.StructField("chip_bands", T.IntegerType()),
        T.StructField("center_lat", T.DoubleType()),
        T.StructField("center_lon", T.DoubleType()),
        T.StructField("corner_nw_lat", T.DoubleType()),
        T.StructField("corner_nw_lon", T.DoubleType()),
        T.StructField("corner_se_lat", T.DoubleType()),
        T.StructField("corner_se_lon", T.DoubleType()),
        T.StructField("label", T.BinaryType()),         # int16, optional
        T.StructField("label_height", T.IntegerType()),
        T.StructField("label_width", T.IntegerType()),
        T.StructField("props_aschip", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("props_foreign", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("foreign_id", T.StringType()),
        T.StructField("split", T.StringType()),
    ]
)


def assemble_dataset(
    tiles: DataFrame,
    chips: DataFrame,
    images_dataset: str,
    labels_dataset: str | None,
    props: DataFrame | None = None,
    foreign: DataFrame | None = None,
    split_col: DataFrame | None = None,
) -> DataFrame:
    """Build the training dataset table.

    ``tiles`` needs (tile_id, minx..maxy); ``props`` is (tile_id, props);
    ``foreign`` is (tile_id, foreign_id, props_at_foreign); ``split_col``
    is (tile_id, split).  Label join is left-outer (missing label chips ->
    null label, matching the reference's os.path.exists check,
    ``cmds.py:508``).
    """
    img = chips.filter(
        (F.col("dataset") == images_dataset) & (F.col("status") == "ok")
    ).select(
        "tile_id",
        F.col("payload").alias("img_payload"), F.col("dtype").alias("img_dtype"),
        F.col("height").alias("img_h"), F.col("width").alias("img_w"),
        F.col("bands").alias("img_b"),
    )
    base = tiles.select("tile_id", "minx", "miny", "maxx", "maxy").join(
        img, "tile_id", "inner"
    )
    if labels_dataset is not None:
        lbl = chips.filter(
            (F.col("dataset") == labels_dataset) & (F.col("status") == "ok")
        ).select(
            "tile_id",
            F.col("payload").alias("lbl_payload"), F.col("dtype").alias("lbl_dtype"),
            F.col("height").alias("lbl_h"), F.col("width").alias("lbl_w"),
            F.col("bands").alias("lbl_b"),
        )
        base = base.join(lbl, "tile_id", "left")
    else:
        base = (
            base.withColumn("lbl_payload", F.lit(None).cast("binary"))
            .withColumn("lbl_dtype", F.lit(None).cast("string"))
            .withColumn("lbl_h", F.lit(None).cast("int"))
            .withColumn("lbl_w", F.lit(None).cast("int"))
            .withColumn("lbl_b", F.lit(None).cast("int"))
        )
    if props is not None:
        base = base.join(props.select("tile_id", "props"), "tile_id", "left")
    else:
        base = base.withColumn("props", F.lit(None).cast("map<string,double>"))
    if foreign is not None:
        base = base.join(
            foreign.select("tile_id", "foreign_id", "props_at_foreign"),
            "tile_id", "left",
        )
    else:
        base = base.withColumn("foreign_id", F.lit(None).cast("string")).withColumn(
            "props_at_foreign", F.lit(None).cast("map<string,double>")
        )
    if split_col is not None:
        base = base.join(split_col.select("tile_id", "split"), "tile_id", "left")
    else:
        base = base.withColumn("split", F.lit(None).cast("string"))

    img_def = get_dataset_definition(images_dataset)
    lbl_def = get_dataset_definition(labels_dataset) if labels_dataset else None

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                chip = decode_payload(
                    r.img_payload, r.img_dtype, r.img_h, r.img_w, r.img_b
                ).astype(np.int16)
                if hasattr(img_def, "map_values"):
                    chip = img_def.map_values(chip)
                # center/corner math (cmds.py:496-503): coords mean over the
                # closed 5-point envelope ring, latlon order
                cx = (3 * r.minx + 2 * r.maxx) / 5.0
                cy = (3 * r.miny + 2 * r.maxy) / 5.0
                rec = {
                    "chip_id": r.tile_id,
                    "chip": np.ascontiguousarray(chip).tobytes(),
                    "chip_height": int(chip.shape[0]),
                    "chip_width": int(chip.shape[1]),
                    "chip_bands": int(chip.shape[2]) if chip.ndim == 3 else 1,
                    "center_lat": cy, "center_lon": cx,
                    "corner_nw_lat": r.maxy, "corner_nw_lon": r.minx,
                    "corner_se_lat": r.miny, "corner_se_lon": r.maxx,
                    "label": None, "label_height": None, "label_width": None,
                    "props_aschip": dict(r.props) if r.props is not None else None,
                    "props_foreign": (
                        dict(r.props_at_foreign)
                        if r.props_at_foreign is not None else None
                    ),
                    "foreign_id": r.foreign_id,
                    "split": r.split,
                }
                if lbl_def is not None and r.lbl_payload is not None:
                    label = decode_payload(
                        r.lbl_payload, r.lbl_dtype, r.lbl_h, r.lbl_w, r.lbl_b
                    ).astype(np.int16)
                    label = lbl_def.map_values(label)
                    rec["label"] = np.ascontiguousarray(label).tobytes()
                    rec["label_height"] = int(label.shape[0])
                    rec["label_width"] = int(label.shape[1])
                # include_chip_in_dataset hook (cmds.py:527-529)
                hook_src = lbl_def if lbl_def is not None else img_def
                chip_dict = {
                    "chip_id": rec["chip_id"],
                    "label_proportions": {
                        "partitions_aschip": rec["props_aschip"],
                    },
                }
                if hook_src.include_chip_in_dataset(chip_dict):
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in DATASET_SCHEMA.fields])

    return base.mapInPandas(build, DATASET_SCHEMA)


def row_to_chip_pickle(row, foreign_name: str | None = None) -> bytes:
    """K5 byte-layout parity: serialize one assembled dataset row to the
    reference's per-chip pickle dict (``cmds.py:496-535``): keys ``chip``
    (int16 ndarray), ``chip_id``, ``center_latlon`` (lat, lon),
    ``corners{nw, se}`` (lat, lon arrays), optional ``label`` and
    ``label_proportions{partitions_aschip, partitions_<f>, foreignid_<f>}``.
    """
    import pickle

    r: dict = {}
    h, w, bands = row["chip_height"], row["chip_width"], row["chip_bands"]
    chip = np.frombuffer(row["chip"], dtype=np.int16)
    r["chip"] = chip.reshape((h, w) if bands == 1 else (h, w, bands))
    r["chip_id"] = row["chip_id"]
    r["center_latlon"] = np.array([row["center_lat"], row["center_lon"]])
    r["corners"] = {
        "nw": np.array([row["corner_nw_lat"], row["corner_nw_lon"]]),
        "se": np.array([row["corner_se_lat"], row["corner_se_lon"]]),
    }
    if row["label"] is not None:
        r["label"] = np.frombuffer(row["label"], dtype=np.int16).reshape(
            row["label_height"], row["label_width"]
        )
        props: dict = {}
        if row["props_aschip"] is not None:
            props["partitions_aschip"] = dict(row["props_aschip"])
        if foreign_name is not None and row["foreign_id"] is not None:
            if row["props_foreign"] is not None:
                props[f"partitions_{foreign_name}"] = dict(row["props_foreign"])
            props[f"foreignid_{foreign_name}"] = row["foreign_id"]
        if len(props) > 0:
            r["label_proportions"] = props
    return pickle.dumps(r)


def write_pickle_zip(
    dataset: DataFrame, zip_path: str, foreign_name: str | None = None
) -> int:
    """K5 packaging parity: one ``data/{chip_id}.pkl`` per row inside a
    deflate-9 zip (``cmds.py:530-568``).  Driver-side streaming utility for
    reference-format exports — the TABLE is the engine's scale format; this
    writes the zip from ``toLocalIterator`` so the dataset never
    materializes on the driver.  Returns the number of chips written."""
    from zipfile import ZIP_DEFLATED, ZipFile

    n = 0
    with ZipFile(zip_path, "w", compression=ZIP_DEFLATED, compresslevel=9) as zf:
        for row in dataset.toLocalIterator():
            zf.writestr(
                f"data/{row['chip_id']}.pkl", row_to_chip_pickle(row, foreign_name)
            )
            n += 1
    return n


def save_splits_projection(tiles_with_splits: DataFrame) -> DataFrame:
    """K2: the splits-CSV projection (``partitions.py:387-393``): identifier
    + every split column ('split_nb' excluded)."""
    cols = [
        c for c in tiles_with_splits.columns
        if ("split" in c and c != "split_nb") or c == "tile_id"
    ]
    return tiles_with_splits.select(*cols)
