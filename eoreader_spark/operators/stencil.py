"""Focal (stencil) raster operators with halo exchange over tile rows.

Reference operators re-expressed (SURVEY §2.5):
- slope / hillshade from a warped DEM
  (/root/reference/eoreader/products/product.py:2141-2190,
   /root/reference/eoreader/products/optical/optical_product.py:503-556)
- Refined-Lee-style 3x3 despeckle (SNAP Speckle-Filter graph,
  /root/reference/eoreader/data/sar_despeckle_default.xml, runner
  /root/reference/eoreader/products/sar/sar_product.py:1251-1308)
- NaN gap-fill along x with a limit
  (/root/reference/eoreader/products/sar/sar_product.py:1344-1358)

The reference hides chunk boundaries inside dask; in a row model the halo is
explicit: every tile emits its edge strips addressed to its 8 neighbours,
the strips (and ONLY the strips) shuffle — one groupBy collapses them to a
single halo row per target tile — and an equi-join against the center tiles,
co-partitioned on the tile key, hands each tile its (T+2)^2 padded input for
a narrow mapInPandas kernel pass.  Per-op exchange volume = 4 edges + 4
corners per tile (~4*T+4 floats ≈ 6% of a 64^2 tile, ~0.4% of a 1024^2
production tile).  The center payload crosses an exchange at most ONCE: the
caller-visible ``partitioned=`` flag skips even that when the tile table is
already hash-distributed on the tile key (bucketed/partitioned at rest, or
repartitioned once and reused across several stencil ops — Spark reuses the
exchange across the slope/hillshade/despeckle subtrees of one plan).
Image borders pad with NaN and kernels use nan-aware reductions, matching
xarray edge semantics.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from eoreader_spark.datagen import TILE

# (dx, dy) -> which strip of THIS tile the neighbour at (dx,dy) needs
_DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]


_KEY = ["image_id", "tile_x", "tile_y"]


def _strip_rows(tiles: DataFrame, tile: int) -> DataFrame:
    """Emit ONLY the 8 neighbour-addressed edge strips of each tile (the
    center tile does NOT re-enter the shuffle — that was round-1's
    full-payload exchange)."""
    schema = "image_id string, tile_x int, tile_y int, dx int, dy int, px array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, tx, ty, px in zip(
                pdf["image_id"], pdf["tile_x"], pdf["tile_y"], pdf["px"]
            ):
                a = np.asarray(px, dtype=np.float32).reshape(tile, tile)
                tx, ty = int(tx), int(ty)
                for dx, dy in _DIRS:
                    # the neighbour at (tx+dx, ty+dy) needs our edge FACING it:
                    # right neighbour (dx=+1) gets our rightmost column, etc.
                    xs = slice(tile - 1, tile) if dx == 1 else slice(0, 1) if dx == -1 else slice(None)
                    ys = slice(tile - 1, tile) if dy == 1 else slice(0, 1) if dy == -1 else slice(None)
                    strip = a[ys, xs]
                    rows.append((iid, tx + dx, ty + dy, dx, dy, strip.ravel()))
            yield pd.DataFrame(rows, columns=["image_id", "tile_x", "tile_y", "dx", "dy", "px"])

    return tiles.mapInPandas(batch, schema=schema)


def _pad_from_row(px, halos, tile: int) -> np.ndarray:
    """Center array + halo struct list -> (T+2, T+2) padded array (NaN outside)."""
    pad = np.full((tile + 2, tile + 2), np.nan, dtype=np.float32)
    pad[1 : tile + 1, 1 : tile + 1] = np.asarray(px, dtype=np.float32).reshape(tile, tile)
    if halos is None or isinstance(halos, float):  # left-join miss -> None/NaN
        halos = []
    for h in halos:
        dx, dy = int(h["dx"]), int(h["dy"])
        a = np.asarray(h["px"], dtype=np.float32)
        # strip sent by the neighbour at (-dx,-dy) relative to this tile:
        # it lands on the opposite border of the padded array
        hh = 1 if dy != 0 else tile
        ww = 1 if dx != 0 else tile
        ys = slice(0, 1) if dy == 1 else slice(tile + 1, tile + 2) if dy == -1 else slice(1, tile + 1)
        xs = slice(0, 1) if dx == 1 else slice(tile + 1, tile + 2) if dx == -1 else slice(1, tile + 1)
        pad[ys, xs] = a.reshape(hh, ww)
    return pad


def apply_stencil(
    tiles: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    tile: int = TILE,
    out_col: str = "px",
    partitioned: bool = False,
) -> DataFrame:
    """Generic 3x3-halo stencil: kernel((T+2,T+2) padded) -> (T,T) output.

    Strips-only shuffle: the edge strips (~6% of a 64^2 tile) are grouped to
    one halo row per target tile and equi-joined back onto the center tiles;
    the kernel runs in a narrow mapInPandas over the joined rows.  Pass
    ``partitioned=True`` when ``tiles`` is already hash-distributed on
    (image_id, tile_x, tile_y) — bucketed at rest, or repartitioned once by
    the caller and shared across several stencils (Spark then reuses that
    exchange and only the strips move per op).
    """
    import pyspark.sql.functions as F

    centers = tiles if partitioned else tiles.repartition(*_KEY)
    # strips derive from the RAW input (not the repartitioned centers): the
    # groupBy below shuffles them to their target tiles anyway, so routing
    # them through the centers' exchange would only add a redundant
    # full-payload pass.  Map-side partial collect_list combines strips
    # before the exchange.
    strips = _strip_rows(tiles, tile)
    # strips-only exchange: collapse to ONE row per target tile.  Strips
    # addressed outside the image drop out in the inner-ness of the left join.
    halos = strips.groupBy(*_KEY).agg(
        F.collect_list(F.struct("dx", "dy", "px")).alias("_halos")
    )
    joined = centers.join(halos, _KEY, "left")
    schema = f"image_id string, tile_x int, tile_y int, {out_col} array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out_px = []
            for px, halos_row in zip(pdf["px"], pdf["_halos"]):
                pad = _pad_from_row(px, halos_row, tile)
                out_px.append(kernel(pad).astype(np.float32).ravel())
            out = pdf[["image_id", "tile_x", "tile_y"]].copy()
            out[out_col] = out_px
            yield out

    return joined.select(*_KEY, "px", "_halos").mapInPandas(batch, schema=schema)


# ------------------------------------------------------------------ kernels
def slope_kernel(pad: np.ndarray) -> np.ndarray:
    """Slope in degrees from central differences (unit grid spacing).
    NaN borders fall back to one-sided differences via nan-replacement."""
    t = pad.shape[0] - 2
    c = pad[1 : t + 1, 1 : t + 1]
    right = np.where(np.isnan(pad[1 : t + 1, 2 : t + 2]), c, pad[1 : t + 1, 2 : t + 2])
    left = np.where(np.isnan(pad[1 : t + 1, 0:t]), c, pad[1 : t + 1, 0:t])
    down = np.where(np.isnan(pad[2 : t + 2, 1 : t + 1]), c, pad[2 : t + 2, 1 : t + 1])
    up = np.where(np.isnan(pad[0:t, 1 : t + 1]), c, pad[0:t, 1 : t + 1])
    dzdx = (right - left) / 2.0
    dzdy = (down - up) / 2.0
    return np.degrees(np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)))


def hillshade_kernel_factory(azimuth_deg: float, zenith_deg: float):
    """Standard hillshade from sun azimuth/zenith (broadcast scalars, the
    reference reads them from metadata, optical_product.py:467-501)."""
    az = math.radians(azimuth_deg)
    zen = math.radians(zenith_deg)

    def kernel(pad: np.ndarray) -> np.ndarray:
        t = pad.shape[0] - 2
        c = pad[1 : t + 1, 1 : t + 1]
        right = np.where(np.isnan(pad[1 : t + 1, 2 : t + 2]), c, pad[1 : t + 1, 2 : t + 2])
        left = np.where(np.isnan(pad[1 : t + 1, 0:t]), c, pad[1 : t + 1, 0:t])
        down = np.where(np.isnan(pad[2 : t + 2, 1 : t + 1]), c, pad[2 : t + 2, 1 : t + 1])
        up = np.where(np.isnan(pad[0:t, 1 : t + 1]), c, pad[0:t, 1 : t + 1])
        dzdx = (right - left) / 2.0
        dzdy = (down - up) / 2.0
        slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        hs = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
        return np.clip(hs, 0.0, 1.0)

    return kernel


def lee_kernel_factory(noise_var: float = 25.0):
    """Lee 3x3 speckle filter (Refined-Lee analog of the SNAP graph):
    out = mean + var/(var+noise_var) * (px - mean), 3x3 nan-aware stats."""

    def kernel(pad: np.ndarray) -> np.ndarray:
        t = pad.shape[0] - 2
        stack = np.stack(
            [pad[1 + dy : 1 + dy + t, 1 + dx : 1 + dx + t] for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        )
        with np.errstate(invalid="ignore"):
            mean = np.nanmean(stack, axis=0)
            var = np.nanvar(stack, axis=0)
        c = pad[1 : t + 1, 1 : t + 1]
        w = var / (var + noise_var)
        return mean + w * (c - mean)

    return kernel


def gap_fill_x(tiles: DataFrame, limit: int = 10, tile: int = TILE, px_col: str = "px") -> DataFrame:
    """W4 NaN gap-fill along x (forward then backward, each capped at
    ``limit``), tile-local — the reference's interpolate_na(dim=x, limit=10)
    with retry on the reversed index (sar_product.py:1344-1358).
    Gaps spanning a tile boundary are filled up to the boundary (documented
    divergence; reference operates on the whole array)."""
    schema = f"image_id string, tile_x int, tile_y int, {px_col} array<float>"

    def fill(a: np.ndarray) -> np.ndarray:
        t, n = a.shape
        out = a.copy()
        for direction in (1, -1):
            arr = out[:, ::direction]
            idx = np.arange(n)
            valid = ~np.isnan(arr)
            # index of most recent valid column per position (per row)
            last = np.where(valid, idx[None, :], -1)
            last = np.maximum.accumulate(last, axis=1)
            dist = idx[None, :] - last
            can = (last >= 0) & (dist > 0) & (dist <= limit)
            rows = np.nonzero(can & np.isnan(arr))
            arr[rows] = arr[rows[0], last[rows]]
            out[:, ::direction] = arr
        return out

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf[px_col] = [
                fill(np.asarray(px, dtype=np.float32).reshape(tile, tile)).ravel()
                for px in pdf[px_col]
            ]
            yield pdf[["image_id", "tile_x", "tile_y", px_col]]

    return tiles.mapInPandas(batch, schema=schema)


def slope(dem_tiles: DataFrame, tile: int = TILE, partitioned: bool = False) -> DataFrame:
    """W2: dem tile rows (px = z) -> slope degrees."""
    return apply_stencil(dem_tiles, slope_kernel, tile=tile, partitioned=partitioned)


def hillshade(
    dem_tiles: DataFrame,
    azimuth_deg: float,
    zenith_deg: float,
    tile: int = TILE,
    partitioned: bool = False,
) -> DataFrame:
    """W1: dem tile rows -> hillshade [0,1]."""
    return apply_stencil(
        dem_tiles, hillshade_kernel_factory(azimuth_deg, zenith_deg), tile=tile,
        partitioned=partitioned,
    )


def despeckle(
    band_tiles: DataFrame, noise_var: float = 25.0, tile: int = TILE, partitioned: bool = False
) -> DataFrame:
    """W3: VV -> VV_DSPK analog."""
    return apply_stencil(band_tiles, lee_kernel_factory(noise_var), tile=tile, partitioned=partitioned)
