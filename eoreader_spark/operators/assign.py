"""Tile <-> AOI assignment: the engine's headline spatial join.

Reference semantics: eoreader rasterizes AOI/mask polygons onto the band grid
(features.rasterize — a pixel is burned iff its CENTER is inside the polygon;
/root/reference/eoreader/products/optical/s2_product.py:1908-1957,
_create_mask /root/reference/eoreader/products/optical/optical_product.py:699-723)
and windows reads to an AOI (/root/reference/eoreader/utils.py:137-239,729-761).

Spark-first re-expression (BASELINE.json north_star):
  1. coarse:  explode AOI covering cells -> equi-join tiles on cell_r7
              (Catalyst partition-prunes when tiles are laid out by cell).
  2. strategy: broadcast vs shuffle chosen from CELL-HISTOGRAM stats; for the
              shuffle path, hot cells (count > skew_factor x median) get
              EXPLICIT SALTING: tile side gets a deterministic salt, AOI side
              is exploded x n_salts on hot cells only.
  3. refine:  batched ray-casting PIP of tile centers vs the AOI ring inside
              mapInPandas — vectorized, no per-row Python.

Assignment rule (bit-for-bit determinism): tile is assigned iff its center is
strictly inside by the even-odd half-open rule in spatial/pip.py — the same
rule at every parallelism level, so join rows and tile assignments match
exactly between local[8] and local[32] runs (BASELINE.json:2,6).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eoreader_spark.spatial import pip

BROADCAST_CELL_LIMIT = 2_000_000  # exploded aoi-cell rows under this -> broadcast
SKEW_FACTOR = 8.0  # cell hotter than 8x median tile count -> salt
N_SALTS = 16


def aoi_cells_exploded(aoi: DataFrame) -> DataFrame:
    """aoi(aoi_id, geom_wkt, cells_r7 array) -> one row per covering cell."""
    return aoi.select("aoi_id", "geom_wkt", F.explode("cells_r7").alias("cell_r7"))


def cell_histogram(tiles: DataFrame) -> DataFrame:
    """Per-cell tile counts — the stats table driving join strategy + salting.
    At 10^12 scale this is a cheap pre-aggregated metadata table; here we
    compute it on the fly (one map-side-combined groupBy)."""
    return tiles.groupBy("cell_r7").agg(F.count(F.lit(1)).alias("n_tiles"))


def _refine_pip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch refine: group candidate rows by polygon, run one batched
    ray-cast per polygon (spatial/pip.py)."""
    for pdf in it:
        if len(pdf) == 0:
            continue
        cx = ((pdf["x0"].to_numpy() + pdf["x1"].to_numpy()) * 0.5).astype(np.float64)
        cy = ((pdf["y0"].to_numpy() + pdf["y1"].to_numpy()) * 0.5).astype(np.float64)
        keep = np.zeros(len(pdf), dtype=bool)
        wkts = pdf["geom_wkt"].to_numpy()
        # group identical polygons inside the batch; parse each ring once
        uniq, inv = np.unique(wkts, return_inverse=True)
        rings = [pip.parse_wkt_polygon(w) for w in uniq]
        keep = pip.points_in_polygons_grouped(cx, cy, inv.astype(np.int64), rings)
        out = pdf.loc[keep, ["aoi_id", "image_id", "tile_x", "tile_y", "cell_r7"]]
        if len(out):
            yield out


_REFINE_SCHEMA = "aoi_id string, image_id string, tile_x int, tile_y int, cell_r7 long"


def assign_tiles(
    tiles: DataFrame,
    aoi: DataFrame,
    broadcast_limit: int = BROADCAST_CELL_LIMIT,
    skew_factor: float = SKEW_FACTOR,
    n_salts: int = N_SALTS,
    force_strategy: str | None = None,
) -> DataFrame:
    """-> (aoi_id, image_id, tile_x, tile_y, cell_r7): tiles whose center is
    inside the AOI polygon.  Strategy: 'broadcast' | 'salted' | None (auto)."""
    spark = tiles.sparkSession
    ac = aoi_cells_exploded(aoi)

    strategy = force_strategy
    if strategy is None:
        # cheap stats probe — at scale these come from table metadata
        n_aoi_cells = ac.count()
        strategy = "broadcast" if n_aoi_cells <= broadcast_limit else "salted"

    if strategy == "broadcast":
        cand = tiles.join(F.broadcast(ac), "cell_r7")
    else:
        hist = cell_histogram(tiles)
        med = hist.agg(F.expr("percentile_approx(n_tiles, 0.5)")).first()[0] or 1
        hot = [r["cell_r7"] for r in hist.filter(F.col("n_tiles") > skew_factor * med).collect()]
        hot_set = set(hot)
        if not hot_set:
            cand = tiles.join(ac, "cell_r7")
        else:
            hot_lit = F.array(*[F.lit(c) for c in hot_set])
            # tile side: deterministic salt on hot cells, 0 elsewhere
            t = tiles.withColumn(
                "salt",
                F.when(
                    F.array_contains(hot_lit, F.col("cell_r7")),
                    F.pmod(F.xxhash64("image_id", "tile_x", "tile_y"), F.lit(n_salts)),
                ).otherwise(F.lit(0)),
            )
            # aoi side: replicate hot-cell rows across all salts
            a = ac.withColumn(
                "salt",
                F.explode(
                    F.when(
                        F.array_contains(hot_lit, F.col("cell_r7")),
                        F.sequence(F.lit(0), F.lit(n_salts - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            cand = t.join(a, ["cell_r7", "salt"]).drop("salt")

    cand = cand.select("aoi_id", "image_id", "tile_x", "tile_y", "cell_r7",
                       "x0", "y0", "x1", "y1", "geom_wkt")
    return cand.mapInPandas(_refine_pip, schema=_REFINE_SCHEMA)


def join_rows(tiles: DataFrame, aoi: DataFrame, **kw) -> DataFrame:
    """Scene-level join rows (aoi_id, image_id) — the BASELINE.json:2
    'join-row match' output: distinct images with >=1 assigned tile."""
    return assign_tiles(tiles, aoi, **kw).select("aoi_id", "image_id").distinct()
