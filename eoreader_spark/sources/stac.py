"""STAC item serialization + catalog read side (S7, both directions).

Reference: Product -> STAC Item with EO/Projection/View extensions
(/root/reference/eoreader/stac/stac_item.py:61-179, extension classes
 stac_extensions.py:62-420), and the read side — Reader.open accepts STAC
items/paths and reconstructs product metadata
(/root/reference/eoreader/reader.py:673-738,
 /root/reference/eoreader/products/stac_product.py:81-140).

Extension coverage:
- EO: `eo:cloud_cover` + per-band `eo:bands` structs
  (name / common_name / center_wavelength) derived from the constellation's
  layout vocabulary (bands.eo_bands_for — the analog of EoExt walking
  prod.bands, stac_extensions.py:150-183)
- Projection: epsg + centroid always; when the raster-grid descriptor is
  supplied (image_id, width, height, x0, y0 — the default_transform analog,
  stac_extensions.py:215-224), also `proj:shape` [height, width],
  `proj:transform` (north-up affine [px, 0, x0, 0, -px, y0]) and
  `proj:bbox` [xmin, ymin, xmax, ymax] like the reference's ProjExt
  (stac_extensions.py:300-313)
- View: `view:sun_azimuth`, `view:sun_elevation` (= 90 - zenith, exactly the
  reference's conversion, stac_extensions.py:336-345) and, when provided,
  `view:azimuth` / `view:off_nadir` / `view:incidence_angle`
Remote catalog HTTP fetch is out of sandbox scope (documented exclusion).

Spark form: one JVM-side projection each way — to_json over a struct out,
from_json with an explicit schema back in; a catalog row per scene, no
Python in the data path.  The eo:bands vocabulary is a ~43-row broadcast
dimension; view angles join broadcast-left on image_id when given.
to_json drops null fields, so items without angles simply omit the view
properties (the reference's ViewExt.create_ext semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eoreader_spark import bands as bands_mod

STAC_VERSION = "1.0.0"

_EO_BAND_STRUCT = "array<struct<name:string,common_name:string,center_wavelength:double>>"

# explicit parse schema (never inferred: at 10^12 items schema inference
# would scan the table; an explicit schema keeps the read a single pass)
ITEM_SCHEMA = (
    "struct<type:string, stac_version:string, id:string,"
    " properties:struct<datetime:string, constellation:string,"
    " product_type:string, gsd:double, `proj:epsg`:int,"
    " `proj:shape`:array<int>, `proj:transform`:array<double>,"
    " `proj:bbox`:array<double>,"
    " `sat:orbit_state`:string, `eo:cloud_cover`:double,"
    f" `eo:bands`:{_EO_BAND_STRUCT},"
    " `view:sun_azimuth`:double, `view:sun_elevation`:double,"
    " `view:azimuth`:double, `view:off_nadir`:double,"
    " `view:incidence_angle`:double>,"
    " geometry_wkt:string, centroid:array<double>>"
)

_VIEW_EXTRAS = {  # optional view_angles columns -> STAC property names
    "view_az": "view:azimuth",
    "off_nadir": "view:off_nadir",
    "incidence_angle": "view:incidence_angle",
}


def eo_bands_table(spark: SparkSession) -> DataFrame:
    """(constellation, eo_bands) dimension from the layout vocabulary —
    one row per detectable constellation, broadcast-sized forever."""
    rows = [
        (const, bands_mod.eo_bands_for(const))
        for const in bands_mod.CONSTELLATION_LAYOUT
    ]
    return spark.createDataFrame(
        rows, f"constellation string, eo_bands {_EO_BAND_STRUCT}"
    )


def to_stac_items(
    scenes: DataFrame,
    footprints: DataFrame | None = None,
    view_angles: DataFrame | None = None,
    eo_bands: bool = True,
    grid: DataFrame | None = None,
) -> DataFrame:
    """scenes (T2) [+ footprints (T3)] [+ view_angles (image_id, sun_az,
    sun_zen[, view_az, off_nadir, incidence_angle])] [+ grid (image_id,
    width, height, x0, y0) — the default_transform analog, yielding
    proj:shape / proj:transform / proj:bbox] -> (image_id, stac_json)."""
    df = scenes
    if footprints is not None:
        df = df.join(footprints.select("image_id", "geom_wkt"), "image_id", "left")
    else:
        df = df.withColumn("geom_wkt", F.lit(None).cast("string"))
    if eo_bands:
        df = df.join(
            F.broadcast(eo_bands_table(scenes.sparkSession)), "constellation", "left"
        )
    else:
        df = df.withColumn("eo_bands", F.lit(None).cast(_EO_BAND_STRUCT))
    proj_cols = []
    if grid is not None:
        df = df.join(
            F.broadcast(grid.select("image_id", "width", "height", "x0", "y0")),
            "image_id", "left",
        )
        px = F.col("pixel_size")
        xmin, ymax = F.col("x0"), F.col("y0")
        xmax = F.col("x0") + F.col("width") * px
        ymin = F.col("y0") - F.col("height") * px
        has_grid = F.col("width").isNotNull() & F.col("height").isNotNull()
        proj_cols = [
            # [height, width] row-major, stac_extensions.py:220; items with
            # no grid row OMIT the fields (to_json drops nulls), like the
            # reference's shape=None branch (stac_extensions.py:222-224)
            F.when(has_grid, F.array(F.col("height"), F.col("width")))
            .alias("proj:shape"),
            # north-up affine, first 6 coefficients (rasterio Affine order)
            F.when(has_grid, F.array(px, F.lit(0.0), xmin, F.lit(0.0), -px, ymax))
            .alias("proj:transform"),
            F.when(has_grid, F.array(xmin, ymin, xmax, ymax)).alias("proj:bbox"),
        ]
    view_cols = []
    if view_angles is not None:
        df = df.join(F.broadcast(view_angles), "image_id", "left")
        view_cols = [
            F.col("sun_az").alias("view:sun_azimuth"),
            # STAC wants elevation; products carry zenith (ref conversion)
            (F.lit(90.0) - F.col("sun_zen")).alias("view:sun_elevation"),
        ] + [
            F.col(c).alias(p)
            for c, p in _VIEW_EXTRAS.items()
            if c in view_angles.columns
        ]
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
            *proj_cols,
            F.col("orbit_direction").alias("sat:orbit_state"),
            F.col("cloud_cover").alias("eo:cloud_cover"),
            F.col("eo_bands").alias("eo:bands"),
            *view_cols,
        ).alias("properties"),
        F.col("geom_wkt").alias("geometry_wkt"),
        F.array(F.col("lon"), F.col("lat")).alias("centroid"),
    )
    return df.select("image_id", F.to_json(item).alias("stac_json"))


def open_stac_items(items: DataFrame, json_col: str = "stac_json") -> DataFrame:
    """Inverse of to_stac_items: STAC JSON -> scene rows (the Reader.open
    from-STAC path, reference reader.py:673-738).  Items written without the
    EO/View extension fields parse to nulls there (from_json is lenient on
    absent struct fields).

    Output columns mirror the scenes table (T2) minus the derived cell key:
    (image_id, constellation, product_type, datetime, pixel_size, crs_epsg,
    lon, lat, orbit_direction, cloud_cover, geom_wkt, eo_bands, sun_az,
    sun_el, view_az, off_nadir, incidence_angle)."""
    parsed = items.withColumn("_it", F.from_json(F.col(json_col), ITEM_SCHEMA))
    p = "_it.properties"
    return parsed.select(
        F.col("_it.id").alias("image_id"),
        F.col(f"{p}.constellation").alias("constellation"),
        F.col(f"{p}.product_type").alias("product_type"),
        F.to_timestamp(F.col(f"{p}.datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("datetime"),
        F.col(f"{p}.gsd").alias("pixel_size"),
        F.col(f"{p}.`proj:epsg`").alias("crs_epsg"),
        F.col(f"{p}.`proj:shape`").alias("proj_shape"),
        F.col(f"{p}.`proj:transform`").alias("proj_transform"),
        F.col(f"{p}.`proj:bbox`").alias("proj_bbox"),
        F.col("_it.centroid")[0].alias("lon"),
        F.col("_it.centroid")[1].alias("lat"),
        F.col(f"{p}.`sat:orbit_state`").alias("orbit_direction"),
        F.col(f"{p}.`eo:cloud_cover`").alias("cloud_cover"),
        F.col("_it.geometry_wkt").alias("geom_wkt"),
        F.col(f"{p}.`eo:bands`").alias("eo_bands"),
        F.col(f"{p}.`view:sun_azimuth`").alias("sun_az"),
        F.col(f"{p}.`view:sun_elevation`").alias("sun_el"),
        F.col(f"{p}.`view:azimuth`").alias("view_az"),
        F.col(f"{p}.`view:off_nadir`").alias("off_nadir"),
        F.col(f"{p}.`view:incidence_angle`").alias("incidence_angle"),
    )


# ------------------------------------------------- static local catalog walk
# (round-7 VERDICT #4: the read side of Reader.open on a STAC catalog path,
# reference reader.py:673-738 + stac_product.py:81-140, minus only the HTTP
# transport — remote fetch stays a documented sandbox exclusion.)


def write_stac_catalog(
    items: DataFrame,
    root: str,
    catalog_id: str = "catalog",
    collection_prefix: str = "scenes",
    description: str = "eoreader_spark static catalog",
) -> int:
    """(image_id, stac_json) -> a self-contained static STAC catalog tree:

        root/catalog.json                       rel=child -> sub-collections
        root/collections/<prefix>-<part>.json   rel=item  -> its items
        root/items/<image_id>.json

    -> number of sub-collections written.

    Scale story: item documents AND the per-partition sub-collections are
    written BY EXECUTORS (foreachPartition on a shared filesystem / object
    store — the standard Hadoop-style output contract); the driver writes
    only catalog.json, whose link count equals the PARTITION count, never
    the item count.  One collection listing 10^12 item links would itself
    be an unwalkable metadata blob — sharding the link lists by partition
    is how static catalogs stay readable, and it lets read_stac_catalog
    keep its driver walk metadata-sized too."""
    import json
    import os
    import shutil

    # A reused root would link stale collection shards (and leftover item
    # documents) from a previous write into the new catalog — wipe both
    # payload dirs first so catalog.json only ever references this job's
    # output (the Hadoop-output-committer "clobber the task dir" contract).
    for sub in ("items", "collections"):
        p = os.path.join(root, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
        os.makedirs(p)

    def _write_part(rows) -> None:
        import json as _json
        import os as _os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        links = []
        for r in rows:
            with open(_os.path.join(root, "items", f"{r.image_id}.json"), "w") as f:
                f.write(r.stac_json)
            links.append({"rel": "item", "href": f"../items/{r.image_id}.json"})
        if links:
            coll = {
                "type": "Collection",
                "stac_version": STAC_VERSION,
                "id": f"{collection_prefix}-{pid:05d}",
                "description": description,
                "license": "proprietary",
                "extent": {
                    "spatial": {"bbox": [[-180.0, -90.0, 180.0, 90.0]]},
                    "temporal": {"interval": [[None, None]]},
                },
                "links": [{"rel": "root", "href": "../catalog.json"}] + links,
            }
            path = _os.path.join(
                root, "collections", f"{collection_prefix}-{pid:05d}.json"
            )
            with open(path, "w") as f:
                _json.dump(coll, f)

    items.select("image_id", "stac_json").foreachPartition(_write_part)
    colls = sorted(os.listdir(os.path.join(root, "collections")))
    cat = {
        "type": "Catalog",
        "stac_version": STAC_VERSION,
        "id": catalog_id,
        "description": description,
        "links": [{"rel": "self", "href": "./catalog.json"}]
        + [{"rel": "child", "href": f"./collections/{c}"} for c in colls],
    }
    with open(os.path.join(root, "catalog.json"), "w") as f:
        json.dump(cat, f)
    return len(colls)


def read_stac_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Walk a static STAC catalog into scene rows (Reader.open on a catalog
    path, ref reader.py:673-738): catalog.json -> rel=child documents
    (catalogs or collections, recursively) -> rel=item hrefs.  The DRIVER
    touches only the catalog/collection metadata documents — fan-out equals
    the shard count, not the item count; the item documents are read
    DISTRIBUTED (spark.read.text wholetext, one file per row) and parsed
    with open_stac_items' explicit schema, so no executor ever JSON-infers
    and the driver never opens an item file.

    ``path`` may be the catalog directory, the catalog.json itself, or a
    file:// URL of either; hrefs resolve relative to their containing
    document (the STAC rule).  Corrupt/unreadable metadata documents raise
    a named ValueError (the engine's corrupt-input contract); rel=self /
    rel=root back-links and child cycles are skipped via a visited set."""
    import json
    import os

    def _local(p: str) -> str:
        return p[7:] if p.startswith("file://") else p

    start = _local(path)
    if os.path.isdir(start):
        start = os.path.join(start, "catalog.json")

    item_paths: list[str] = []
    visited: set[str] = set()

    def walk(doc_path: str) -> None:
        doc_path = os.path.normpath(doc_path)
        if doc_path in visited:
            return
        visited.add(doc_path)
        try:
            with open(doc_path) as f:
                doc = json.load(f)
        except OSError as e:
            raise ValueError(f"unreadable STAC document {doc_path}: {e}") from e
        except json.JSONDecodeError as e:
            raise ValueError(f"corrupt STAC JSON in {doc_path}: {e}") from e
        if not isinstance(doc, dict):
            raise ValueError(f"corrupt STAC document {doc_path}: not an object")
        base = os.path.dirname(doc_path)
        for link in doc.get("links", []):
            if not isinstance(link, dict):
                raise ValueError(f"corrupt STAC link in {doc_path}")
            rel, href = link.get("rel"), link.get("href", "")
            if not href:
                continue
            tgt = _local(href)
            if not os.path.isabs(tgt):
                tgt = os.path.normpath(os.path.join(base, tgt))
            if rel == "child":
                walk(tgt)
            elif rel == "item":
                item_paths.append(tgt)

    walk(start)
    if not item_paths:
        empty = spark.createDataFrame([], "value string")
        return open_stac_items(empty, json_col="value")
    return open_stac_items(
        spark.read.text(item_paths, wholetext=True), json_col="value"
    )
