"""kNN spatial lookup: H3 k-ring expansion + distance-bounded refine + top-k.

Reference: Sentinel-3 swath geocoding resamples with a nearest-neighbour /
bilinear lookup within a bounded radius (pyresample XArrayResamplerNN,
/root/reference/eoreader/products/optical/s3_product.py:584-683).

Spark-first (north_star): queries expand to their k-ring of cells, equi-join
candidate points on cell, compute the distance JVM-side (built-in column
math, codegen'd — no UDF in the hot path), and keep top-k per query with a
rank window.  Ties broken by point id for bit-for-bit determinism.

Exactness: a query is RESOLVED by the ring pass iff it found >= k candidates
and its k-th scaled distance is under the ring guarantee radius
(k_cells * cell_extent * cos(lat) — any point outside the ring is at least
that far).  Unresolved queries (a small tail by construction) fall back to a
broadcast brute-force pass, so the result is always exact while the heavy
side stays a pruned equi-join.  At 1000-executor scale the ring pass touches
only k-ring cells per query — no global shuffle of the points table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eoreader_spark import cells


def _with_cell(df: DataFrame, lon: str, lat: str, res: int, out: str) -> DataFrame:
    @F.pandas_udf("long")
    def enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(cells.encode(lo.to_numpy(np.float64), la.to_numpy(np.float64), res))

    return df.withColumn(out, enc(F.col(lon), F.col(lat)))


def _scaled_d2(
    qlon: Column, qlat: Column, plon: Column, plat: Column, coslat: bool = True
) -> Column:
    """Squared equirectangular distance in degrees, lon wrapped at the
    antimeridian, optionally scaled by cos(query lat).  Monotone in true
    distance at scene scale; pure JVM column math (whole-stage codegen).
    ``coslat=False`` gives a plain degree metric built only from exactly
    rounded IEEE ops (+,-,*,abs,least) — bit-identical across engines/libms,
    used where results must match an external SQL oracle."""
    dlon = F.abs(plon - qlon)
    dlon = F.least(dlon, F.lit(360.0) - dlon)
    if coslat:
        dlon = dlon * F.cos(F.radians(qlat))
    dlat = plat - qlat
    return dlon * dlon + dlat * dlat


def _topk(cand: DataFrame, q_id: str, p_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(q_id).orderBy(F.col("dist").asc(), F.col(p_id).asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_brute(
    queries: DataFrame, points: DataFrame, k: int = 5,
    q_id: str = "query_id", p_id: str = "image_id", coslat: bool = True,
) -> DataFrame:
    """Broadcast brute force — the oracle, the fallback pass, and the right
    plan outright when the query side is tiny."""
    q = queries.select(q_id, F.col("lon").alias("qlon"), F.col("lat").alias("qlat"))
    p = points.select(p_id, "lon", "lat")
    cand = F.broadcast(q).crossJoin(p).withColumn(
        "dist", _scaled_d2(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"), coslat)
    )
    return _topk(cand, q_id, p_id, k).select(q_id, p_id, "dist", "rank")


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    res: int = 7,
    k_cells: int = 1,
    q_id: str = "query_id",
    p_id: str = "image_id",
    coslat: bool = True,
) -> DataFrame:
    """queries(q_id, lon, lat) x points(p_id, lon, lat) -> exact top-k per
    query: (q_id, p_id, dist, rank 1..k)."""
    q = _with_cell(queries.select(q_id, "lon", "lat"), "lon", "lat", res, "qcell")
    p = _with_cell(points.select(p_id, "lon", "lat"), "lon", "lat", res, "pcell")

    @F.pandas_udf("array<long>")
    def ring(c: pd.Series) -> pd.Series:
        arr = cells.k_ring(c.to_numpy(np.int64), k_cells)
        return pd.Series([np.unique(a) for a in arr])

    qx = (
        q.withColumn("cand_cell", F.explode(ring(F.col("qcell"))))
        .select(q_id, F.col("lon").alias("qlon"), F.col("lat").alias("qlat"), "cand_cell")
    )
    cand = qx.join(p.withColumnRenamed("pcell", "cand_cell"), "cand_cell").withColumn(
        "dist", _scaled_d2(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"), coslat)
    )
    ranked = _topk(cand, q_id, p_id, k)

    # resolution test: k-th hit inside the guarantee radius of the ring —
    # computed with plain window functions over the already-partitioned
    # ranked rows (no extra aggregate exchange; reuses the rank window's
    # partitioning)
    cell_deg = 180.0 / (1 << res)
    g = F.lit(float(k_cells) * cell_deg)
    if coslat:
        g = g * F.cos(F.radians(F.col("qlat")))
    guarantee = g * g
    wq = Window.partitionBy(q_id)
    ranked = ranked.withColumn("n_hits", F.count(F.lit(1)).over(wq)).withColumn(
        "kth_d2", F.max("dist").over(wq)
    )
    is_resolved = (F.col("n_hits") >= k) & (F.col("kth_d2") < guarantee)
    exact_part = ranked.filter(is_resolved)
    resolved_q = exact_part.select(q_id).distinct()
    unresolved = queries.join(F.broadcast(resolved_q), q_id, "left_anti")
    fallback = knn_brute(unresolved, points, k=k, q_id=q_id, p_id=p_id, coslat=coslat)
    return exact_part.select(q_id, p_id, "dist", "rank").unionByName(fallback)
