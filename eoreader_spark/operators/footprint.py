"""Footprint / extent / centroid aggregates + convex hull + dissolve.

Reference: Product.footprint/extent/crs (valid-data polygon, bbox, centroid —
/root/reference/eoreader/products/product.py:375-441), S2 dissolve +
convex_hull (/root/reference/eoreader/products/optical/s2_product.py:404-459),
@simplify decorator (/root/reference/eoreader/utils.py:391-412).

Spark-first: extent = plain min/max groupBy (map-side combined, one shuffle of
4 doubles per image); footprint = collect tile corner points per image ->
vectorized Andrew-monotone-chain convex hull inside applyInPandas (the
reference's dissolve+convex_hull, no shapely needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eoreader_spark.datagen import ring_wkt


def extent(tiles: DataFrame) -> DataFrame:
    """(image_id, x0, y0, x1, y1) bounding box of valid tiles — A2."""
    return tiles.groupBy("image_id").agg(
        F.min("x0").alias("x0"),
        F.min("y0").alias("y0"),
        F.max("x1").alias("x1"),
        F.max("y1").alias("y1"),
    )


def _poly_centroid(hull: np.ndarray) -> tuple[float, float]:
    """Area centroid of a CCW simple polygon (shoelace).  On integer-lattice
    vertices every cross product and partial sum is an exact float64 integer,
    so the single final division is bit-identical to any other engine doing
    the same exact-integer division.  Degenerate hulls (< 3 vertices or zero
    area) fall back to the vertex mean."""
    if len(hull) < 3:
        return float(hull[:, 0].mean()), float(hull[:, 1].mean())
    x, y = hull[:, 0], hull[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cr = x * yn - xn * y
    s = cr.sum()
    if s == 0.0:  # collinear ring
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cr).sum() / (3.0 * s)
    cy = ((y + yn) * cr).sum() / (3.0 * s)
    return float(cx), float(cy)


def centroid(tiles: DataFrame) -> DataFrame:
    """(image_id, cx, cy) — A3: centroid of the FOOTPRINT polygon (convex
    hull of valid-tile corners), the reference's valid-data centroid
    (/root/reference/eoreader/products/product.py:419-441) — not the extent
    center (they only coincide for axis-aligned rectangles)."""

    def per_image(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = np.concatenate([pdf["x0"].to_numpy(), pdf["x1"].to_numpy(),
                             pdf["x0"].to_numpy(), pdf["x1"].to_numpy()])
        ys = np.concatenate([pdf["y0"].to_numpy(), pdf["y0"].to_numpy(),
                             pdf["y1"].to_numpy(), pdf["y1"].to_numpy()])
        hull = convex_hull(np.column_stack([xs, ys]))
        cx, cy = _poly_centroid(hull)
        return pd.DataFrame({"image_id": [pdf["image_id"].iloc[0]], "cx": [cx], "cy": [cy]})

    return (
        tiles.select("image_id", "x0", "y0", "x1", "y1")
        .groupBy("image_id")
        .applyInPandas(per_image, schema="image_id string, cx double, cy double")
    )


def hull_centroid(
    points: DataFrame, group_col: str = "group_id", x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """A3 over arbitrary point groups: convex hull -> area centroid
    (group, cx, cy).  Same hierarchical composability as dissolve_hull."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = convex_hull(
            np.column_stack([pdf[x_col].to_numpy(), pdf[y_col].to_numpy()])
        )
        cx, cy = _poly_centroid(hull)
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], "cx": [cx], "cy": [cy]})

    return (
        points.select(group_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(per_group, schema=f"{group_col} string, cx double, cy double")
    )


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain, deterministic lexicographic order -> CCW hull."""
    pts = np.unique(points, axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return pts
    def half(iterable):
        h: list[np.ndarray] = []
        for p in iterable:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h
    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def footprint(tiles: DataFrame) -> DataFrame:
    """(image_id, geom_wkt) — A1/A8: dissolve valid tiles -> convex hull WKT.

    Grouped-map pandas UDF: per image, corners of every tile -> hull.  The
    shuffle moves only 4 corner doubles per tile; at 10^12 scale you'd first
    reduce per partition (cell-local hull) then merge — hull(hulls) == hull,
    so the same kernel composes hierarchically.
    """
    def per_image(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = np.concatenate([pdf["x0"].to_numpy(), pdf["x1"].to_numpy(),
                             pdf["x0"].to_numpy(), pdf["x1"].to_numpy()])
        ys = np.concatenate([pdf["y0"].to_numpy(), pdf["y0"].to_numpy(),
                             pdf["y1"].to_numpy(), pdf["y1"].to_numpy()])
        hull = convex_hull(np.column_stack([xs, ys]))
        return pd.DataFrame({"image_id": [pdf["image_id"].iloc[0]], "geom_wkt": [ring_wkt(hull)]})

    return (
        tiles.select("image_id", "x0", "y0", "x1", "y1")
        .groupBy("image_id")
        .applyInPandas(per_image, schema="image_id string, geom_wkt string")
    )


def dissolve_hull(
    points: DataFrame, group_col: str = "group_id", x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """A8 dissolve over arbitrary point groups: per-group strictly-convex
    hull, emitted as vertex ROWS (group, vx, vy) — the s2_product dissolve +
    convex_hull path generalized off the image key.  Coordinates pass
    through numpy unmodified (bit-preserving), so results are comparable
    against an exact SQL hull-membership oracle.  Hierarchically composable:
    hull(hulls) == hull, so at 10^12 points pre-reduce per partition first
    (same kernel)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = convex_hull(
            np.column_stack([pdf[x_col].to_numpy(), pdf[y_col].to_numpy()])
        )
        return pd.DataFrame(
            {group_col: pdf[group_col].iloc[0], "vx": hull[:, 0], "vy": hull[:, 1]}
        )

    return (
        points.select(group_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(per_group, schema=f"{group_col} string, vx double, vy double")
    )
