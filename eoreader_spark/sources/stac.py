"""STAC item serialization + catalog read side (S7, both directions).

Reference: Product -> STAC Item with EO/Projection/View extensions
(/root/reference/eoreader/stac/stac_item.py:61-179), and the read side —
Reader.open accepts STAC items/paths and reconstructs product metadata
(/root/reference/eoreader/reader.py:673-738,
 /root/reference/eoreader/products/stac_product.py:81-140).

Spark form: one JVM-side projection each way — to_json over a struct out,
from_json with an explicit schema back in; a catalog row per scene, no
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAC_VERSION = "1.0.0"

# explicit parse schema (never inferred: at 10^12 items schema inference
# would scan the table; an explicit schema keeps the read a single pass)
ITEM_SCHEMA = (
    "struct<type:string, stac_version:string, id:string,"
    " properties:struct<datetime:string, constellation:string,"
    " product_type:string, gsd:double, `proj:epsg`:int,"
    " `sat:orbit_state`:string, `eo:cloud_cover`:double>,"
    " geometry_wkt:string, centroid:array<double>>"
)


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


def open_stac_items(items: DataFrame, json_col: str = "stac_json") -> DataFrame:
    """Inverse of to_stac_items: STAC JSON -> scene rows (the Reader.open
    from-STAC path, reference reader.py:673-738).

    Output columns mirror the scenes table (T2) minus the derived cell key:
    (image_id, constellation, product_type, datetime, pixel_size, crs_epsg,
    lon, lat, orbit_direction, cloud_cover, geom_wkt)."""
    parsed = items.withColumn("_it", F.from_json(F.col(json_col), ITEM_SCHEMA))
    p = "_it.properties"
    return parsed.select(
        F.col("_it.id").alias("image_id"),
        F.col(f"{p}.constellation").alias("constellation"),
        F.col(f"{p}.product_type").alias("product_type"),
        F.to_timestamp(F.col(f"{p}.datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("datetime"),
        F.col(f"{p}.gsd").alias("pixel_size"),
        F.col(f"{p}.`proj:epsg`").alias("crs_epsg"),
        F.col("_it.centroid")[0].alias("lon"),
        F.col("_it.centroid")[1].alias("lat"),
        F.col(f"{p}.`sat:orbit_state`").alias("orbit_direction"),
        F.col(f"{p}.`eo:cloud_cover`").alias("cloud_cover"),
        F.col("_it.geometry_wkt").alias("geom_wkt"),
    )
