"""STAC item serialization — the stac_item analog (S7 read side lives in the
catalog; this is the write side).

Reference: Product -> STAC Item with EO/Projection/View extensions
(/root/reference/eoreader/stac/stac_item.py:61-179).

Spark form: one JVM-side projection building a JSON column from the scenes
table (to_json over a struct) — a catalog row per scene, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAC_VERSION = "1.0.0"


def to_stac_items(scenes: DataFrame, footprints: DataFrame | None = None) -> DataFrame:
    """scenes (T2) [+ footprints (T3)] -> (image_id, stac_json)."""
    df = scenes
    if footprints is not None:
        df = df.join(footprints.select("image_id", "geom_wkt"), "image_id", "left")
    else:
        df = df.withColumn("geom_wkt", F.lit(None).cast("string"))
    item = F.struct(
        F.lit("Feature").alias("type"),
        F.lit(STAC_VERSION).alias("stac_version"),
        F.col("image_id").alias("id"),
        F.struct(
            F.date_format("datetime", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("datetime"),
            F.col("constellation"),
            F.col("product_type"),
            F.col("pixel_size").alias("gsd"),
            F.col("crs_epsg").alias("proj:epsg"),
            F.col("orbit_direction").alias("sat:orbit_state"),
            F.col("cloud_cover").alias("eo:cloud_cover"),
        ).alias("properties"),
        F.col("geom_wkt").alias("geometry_wkt"),
        F.array(F.col("lon"), F.col("lat")).alias("centroid"),
    )
    return df.select("image_id", F.to_json(item).alias("stac_json"))
