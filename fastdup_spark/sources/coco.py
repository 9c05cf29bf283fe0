"""COCO-format annotation ingestion (S11 — last piece).

The reference accepts COCO JSON annotation dicts and flattens them to its
(filename, bbox, label) annotation frame
(/root/reference/fastdup/utils.py:518-565 convert_coco_dict_to_df, wired at
fastdup_controller.py:560-586). Here the same flatten is expressed as Spark
joins over three explicit-schema DataFrames — images, annotations,
categories — so the result plugs straight into `set_annotations` / the J4/J5
label joins. For webtext the image `file_name` plays the `url` role.

A COCO manifest is driver-side metadata (it arrives as one JSON dict), so
`createDataFrame` on its three lists is the right ingestion point; the
downstream joins stay distributed and the categories side is broadcast.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

_IMG_SCHEMA = StructType([
    StructField("image_id", LongType(), False),
    StructField("url", StringType(), False),
    StructField("img_w", LongType(), True),
    StructField("img_h", LongType(), True),
])
_ANN_SCHEMA = StructType([
    StructField("image_id", LongType(), False),
    StructField("category_id", LongType(), False),
    StructField("col_x", DoubleType(), True),
    StructField("row_y", DoubleType(), True),
    StructField("width", DoubleType(), True),
    StructField("height", DoubleType(), True),
])
_CAT_SCHEMA = StructType([
    StructField("category_id", LongType(), False),
    StructField("label", StringType(), False),
])


def coco_to_annotations(spark: SparkSession, coco: dict | str) -> DataFrame:
    """COCO dict (or path to a COCO JSON file) -> annotation DataFrame
    (url, label, col_x, row_y, width, height, img_w, img_h).

    Mirrors the reference's flatten: images[].file_name keys the rows
    (-> `url` here), annotations[].category_id resolves to the category
    name via categories[], and the xywh `bbox` explodes into the
    reference's col_x/row_y/width/height column names. Rotated-bbox
    (`rot_bb_view`) inputs are not supported — webtext has no rotated
    crops; pass a DataFrame for custom shapes.
    """
    if isinstance(coco, str):
        with open(coco) as f:
            coco = json.load(f)
    for key in ("images", "annotations", "categories"):
        if key not in coco:
            raise ValueError(f"invalid COCO dict: missing '{key}'")

    images = spark.createDataFrame(
        [(int(im["id"]), str(im["file_name"]),
          im.get("width"), im.get("height")) for im in coco["images"]],
        _IMG_SCHEMA)
    ann_rows = []
    for a in coco["annotations"]:
        if "rot_bb_view" in a or "rotated_bbox" in a:
            raise ValueError(
                f"rotated-bbox annotation id={a.get('id')} unsupported — "
                "pass a DataFrame for custom shapes")
        bbox = a.get("bbox")
        if bbox is not None and len(bbox) != 4:
            raise ValueError(
                f"annotation id={a.get('id')} has bbox of length "
                f"{len(bbox)} (expected 4 xywh floats)")
        ann_rows.append(
            (int(a["image_id"]), int(a["category_id"]),
             *(list(map(float, bbox)) if bbox is not None
               else [None, None, None, None])))
    anns = spark.createDataFrame(ann_rows, _ANN_SCHEMA)
    cats = spark.createDataFrame(
        [(int(c["id"]), str(c["name"])) for c in coco["categories"]],
        _CAT_SCHEMA)

    out = (
        anns.join(F.broadcast(images), "image_id")
        .join(F.broadcast(cats), "category_id")
        .select("url", "label", "col_x", "row_y", "width", "height",
                "img_w", "img_h")
    )
    if out.isEmpty():
        raise ValueError("COCO dict produced no annotation rows "
                         "(no annotation joined an image + category)")
    return out
