"""J9 SAR GRD pre-processing noise stages (SURVEY §2): thermal-noise
removal and GRD border-noise trimming, composed in the reference's SNAP
graph order Read -> [Apply-Orbit-File] -> ThermalNoiseRemoval ->
Remove-GRD-Border-Noise -> Calibration -> (despeckle) -> dB.

Reference file:line map:
- graph order + parameters (borderLimit=500, trimThreshold=0.5):
  /root/reference/eoreader/data/grd_s1_preprocess_default.xml:12-46
- graph runner: /root/reference/eoreader/products/sar/sar_product.py:1082-1201
- Apply-Orbit-File is metadata-only (it refines orbit state vectors used by
  Terrain-Correction); its engine analog is operators/orbit.py (round 7):
  Lagrange OSV interpolation (polyDegree=3) + refine_geolocation, applied to
  the geolocation tables that feed the geocode_* operators — not to pixels,
  exactly like SNAP.

Spark-first design notes (100 TB):
- Thermal noise is a per-range-position LUT subtraction: the LUT control
  points (S1 annotation noiseRangeVector analog) are a tiny per-image table,
  broadcast-joined on (image_id, tile_x) and applied as ONE JVM
  transform-with-index over the tile array — no Python, no shuffle beyond
  the broadcast.  Control points sit on tile boundaries so the interpolation
  slope (n1-n0)/tile is a dyadic division: bit-exact cross-engine.
- Border trimming needs a per-row scan ACROSS tiles, but only within
  `border_limit` pixels of the image edge: tiles beyond the limit pass
  through untouched (no shuffle), and only the O(border_limit/tile) edge
  tiles per row group-shuffle into an applyInPandas strip scan.  At S1 GRD
  width (~25k px, borderLimit 500) that is 2-8 edge tiles of a ~400-tile
  row — ~2% of the data moves.  Both edge crossings are computed on the
  ORIGINAL (pre-mask) intensities, like SNAP.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eoreader_spark.datagen import TILE


def thermal_noise_expr(
    px: Column | str, n0: Column | str, n1: Column | str, tile: int = TILE
) -> Column:
    """ThermalNoiseRemoval elementwise kernel: intensity minus a linear
    range-noise ramp, clamped at 0 (SNAP removeThermalNoise=true semantics,
    grd_s1_preprocess_default.xml:20-29).  ``n0``/``n1`` are the noise LUT
    values at this tile's left and right range boundaries; the in-tile
    interpolation slope divides by the power-of-2 tile size, so the whole
    kernel is +,-,* and one dyadic division — bit-stable cross-engine."""
    n0c = F.col(n0) if isinstance(n0, str) else n0
    n1c = F.col(n1) if isinstance(n1, str) else n1
    slope = (n1c - n0c) / F.lit(float(tile))
    # two-param python lambda would be read as (element, index) — that is
    # exactly what we need here: k is the flat index, k % tile the in-tile x
    return F.transform(
        px,
        lambda v, k: F.greatest(
            v - (n0c + (k % tile).cast("double") * slope), F.lit(0.0)
        ).cast("float"),
    )


def thermal_noise_removal(
    tiles: DataFrame,
    noise_pts: DataFrame,
    tile: int = TILE,
    px_col: str = "px",
) -> DataFrame:
    """Subtract the per-image range-noise LUT from intensity tiles.

    ``noise_pts``: (image_id, tile_x, n0 double, n1 double) — noise at range
    pixels tile_x*tile and (tile_x+1)*tile, linearly interpolated between
    (the S1 annotation ships ~a few hundred control points per image: a
    broadcast-sized dimension even at 100 TB of pixels)."""
    out_cols = tiles.columns
    j = tiles.join(F.broadcast(noise_pts), ["image_id", "tile_x"], "left")
    filled = [
        F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in ("n0", "n1")
    ]  # tiles without a LUT row: zero noise (SNAP continueOnFail analog)
    j = j.select(*out_cols, *filled)
    return j.withColumn(
        px_col, thermal_noise_expr(px_col, "n0", "n1", tile)
    ).select(*out_cols)


def _trim_strip(
    arrs: dict[int, np.ndarray],
    length: int,
    scan: int,
    thr: float,
    tile: int,
) -> None:
    """In-place border trim of one tile-row along its last axis.  ``arrs``
    maps tile index -> (tile, tile) float32 array (rows are the cross-scan
    axis).  Masks, per row: x < first crossing from the left and x > first
    crossing from the right, each within ``scan`` pixels of the respective
    edge; a side with no crossing masks its whole scan range.  BOTH
    crossings are found on the ORIGINAL values (SNAP scans the raw
    amplitudes) before either mask is applied — the scan ranges overlap on
    images narrower than 2*scan."""
    scan_n = min(scan, length)
    n_tiles = (length + tile - 1) // tile  # ceil: last tile may be partial
    left_t = list(range((scan_n + tile - 1) // tile))
    right_t = list(range((length - scan_n) // tile, n_tiles))
    missing = [t for t in set(left_t + right_t) if t not in arrs]
    if missing:
        raise ValueError(f"border trim: missing edge tiles {sorted(missing)}")

    def _strip_first(t_list: list[int], lo: int, hi: int, from_right: bool):
        strip = np.concatenate([arrs[t] for t in t_list], axis=1)
        cols = t_list[0] * tile + np.arange(strip.shape[1])
        sel = (cols >= lo) & (cols < hi)
        with np.errstate(invalid="ignore"):
            ge = strip[:, sel] >= thr
        if from_right:
            ge = ge[:, ::-1]
        has = ge.any(axis=1)
        if from_right:
            return np.where(has, hi - 1 - ge.argmax(axis=1), lo - 1)
        return np.where(has, lo + ge.argmax(axis=1), hi)

    lfirst = _strip_first(left_t, 0, scan_n, from_right=False)
    rlast = _strip_first(right_t, length - scan_n, length, from_right=True)
    for t, a in arrs.items():
        cols = t * tile + np.arange(tile)
        mask = (cols[None, :] < lfirst[:, None]) | (cols[None, :] > rlast[:, None])
        a[mask] = np.nan


def grd_border_trim(
    tiles: DataFrame,
    dims: DataFrame,
    tile: int = TILE,
    border_limit: int = 500,
    threshold: float | None = None,
    trim_threshold: float = 0.5,
    directions: Iterable[str] = ("range",),
    px_col: str = "px",
) -> DataFrame:
    """Remove-GRD-Border-Noise analog (grd_s1_preprocess_default.xml:31-40):
    scan inward from each image edge up to ``border_limit`` pixels and mask
    (NaN) every pixel before the first one whose intensity reaches the
    threshold; a side with no crossing masks its whole scan range.

    ``threshold=None`` derives the SNAP-style relative cut
    ``trim_threshold * mean(intensity)`` per image (one aggregate, broadcast
    back); pass an absolute ``threshold`` to skip that pass.
    ``directions``: "range" (x, the GRD border-noise case) and/or "azimuth"
    (y).  ``dims``: (image_id, h, w).  Only edge tiles shuffle; interior
    tiles pass through with no exchange."""
    out_cols = tiles.columns
    if threshold is None:
        means = tiles.groupBy("image_id").agg(
            (
                F.sum(F.aggregate(
                    F.filter(px_col, lambda v: ~F.isnan(v)),
                    F.lit(0.0),
                    lambda a, v: a + v.cast("double"),
                ))
                / F.sum(F.size(F.filter(px_col, lambda v: ~F.isnan(v))))
            ).alias("thr")
        ).withColumn("thr", F.col("thr") * F.lit(float(trim_threshold)))
    else:
        means = dims.select("image_id", F.lit(float(threshold)).alias("thr"))

    out = tiles
    for d in directions:
        if d not in ("range", "azimuth"):
            raise ValueError(f"unknown trim direction: {d!r}")
        out = _trim_pass(
            out, dims, means, d, tile, border_limit, px_col, out_cols
        )
    return out


def _trim_pass(
    tiles: DataFrame,
    dims: DataFrame,
    thr_df: DataFrame,
    direction: str,
    tile: int,
    border_limit: int,
    px_col: str,
    out_cols: list[str],
) -> DataFrame:
    along_x = direction == "range"
    tcol = "tile_x" if along_x else "tile_y"
    gcol = "tile_y" if along_x else "tile_x"
    dcol = "w" if along_x else "h"
    j = tiles.join(F.broadcast(dims.select("image_id", dcol)), "image_id").join(
        F.broadcast(thr_df), "image_id"
    )
    # a tile participates if it overlaps either scan range: [0, limit) on
    # the left, or [length - limit, length) on the right (tile END within
    # limit of the right edge)
    is_edge = (F.col(tcol) * tile < border_limit) | (
        F.col(dcol) - (F.col(tcol) + 1) * tile < border_limit
    )
    keep = j.filter(~is_edge).select(*out_cols)
    edge = j.filter(is_edge)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in tiles.schema
        if f.name in out_cols
    )
    extra = [c for c in out_cols if c not in ("image_id", "tile_x", "tile_y", px_col)]

    def group(pdf: pd.DataFrame) -> pd.DataFrame:
        length = int(pdf[dcol].iloc[0])
        thr = float(pdf["thr"].iloc[0])
        arrs = {  # np.array, not asarray: Arrow buffers are read-only
            int(t): np.array(p, dtype=np.float32).reshape(tile, tile)
            for t, p in zip(pdf[tcol], pdf[px_col])
        }
        if not along_x:  # scan runs along y: transpose so axis 1 is the scan
            arrs = {t: a.T.copy() for t, a in arrs.items()}
        _trim_strip(arrs, length, border_limit, thr, tile)
        if not along_x:
            arrs = {t: a.T for t, a in arrs.items()}
        res = pdf[["image_id", "tile_x", "tile_y", *extra]].copy()
        res[px_col] = [arrs[int(t)].reshape(-1) for t in pdf[tcol]]
        return res[out_cols]

    trimmed = edge.groupBy("image_id", gcol).applyInPandas(group, schema=schema)
    return keep.unionByName(trimmed)


def sar_preprocess(
    tiles: DataFrame,
    dims: DataFrame,
    noise_pts: DataFrame | None = None,
    tile: int = TILE,
    border_limit: int = 500,
    threshold: float | None = None,
    trim_threshold: float = 0.5,
    cal_gain: float = 1.0,
    cal_bias: float = 0.0,
    despeckle_method: str | None = "refined_lee",
    noise_var: float = 25.0,
    num_looks: float = 4.0,
    db: bool = True,
    px_col: str = "px",
) -> DataFrame:
    """Full GRD chain in the reference graph's node order
    (grd_s1_preprocess_default.xml:4-65): ThermalNoiseRemoval ->
    Remove-GRD-Border-Noise -> Calibration (affine sigma0 LUT analog) ->
    despeckle (data/sar_despeckle_default.xml) -> LinearToFromdB."""
    from eoreader_spark.functions import radiometry
    from eoreader_spark.operators import stencil

    out = tiles
    if noise_pts is not None:
        out = thermal_noise_removal(out, noise_pts, tile=tile, px_col=px_col)
    out = grd_border_trim(
        out, dims, tile=tile, border_limit=border_limit,
        threshold=threshold, trim_threshold=trim_threshold, px_col=px_col,
    )
    out = out.withColumn(
        px_col,
        F.expr(
            f"transform({px_col}, v -> cast(v as float))"
        ) if (cal_gain, cal_bias) == (1.0, 0.0)
        else F.expr(
            f"transform({px_col}, v -> cast(v * {float(cal_gain)!r}d"
            f" + {float(cal_bias)!r}d as float))"
        ),
    )
    if despeckle_method:
        out = stencil.despeckle(
            out, noise_var=noise_var, tile=tile,
            method=despeckle_method, num_looks=num_looks,
        )
    if db:
        out = out.withColumn(px_col, radiometry.to_db(px_col))
    return out
