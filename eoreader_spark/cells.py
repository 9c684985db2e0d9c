"""Integer-math hierarchical spatial cell index (H3 analog), numpy-vectorized.

Replaces eoreader's per-file spatial layout (reference: scene discovery in
/root/reference/eoreader/reader.py:473-952 and per-scene windowed reads in
/root/reference/eoreader/utils.py:137-239) with a cell grid usable as an
Iceberg/parquet partition key.  We implement our own integer cell math (no h3
C library in the container): an equirectangular quadtree.

Cell id layout (int64, always positive):
    cell = (res << 58) | (x << 29) | y
with res in [0, 28], x in [0, 2**(res+1)), y in [0, 2**res).
At res r the grid is 2^(r+1) columns x 2^r rows over lon [-180,180),
lat [-90,90].  res 7 -> 256x128 cells (~1.4 deg), our stand-in for "H3 res 5-9".

All functions accept and return numpy int64/float64 arrays (vectorized) so
they can run inside pandas UDFs over Arrow batches with no per-row Python.
Determinism: pure integer floor math -> bit-for-bit identical across
partitionings and parallelism levels (BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np

RES_SHIFT = 58
X_SHIFT = 29
Y_MASK = (1 << 29) - 1
X_MASK = (1 << 29) - 1
MAX_RES = 28


def _nx(res: int) -> int:
    return 1 << (res + 1)


def _ny(res: int) -> int:
    return 1 << res


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lon/lat (degrees, float64 arrays) -> cell ids at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0,{MAX_RES}], got {res}")
    nx, ny = _nx(res), _ny(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # floor with wrap on lon, clamp on lat; half-open cells [edge, next_edge)
    fx = (lon + 180.0) / 360.0
    fx = fx - np.floor(fx)  # wrap into [0,1)
    x = np.minimum((fx * nx).astype(np.int64), nx - 1)
    fy = (90.0 - lat) / 180.0
    y = np.clip((fy * ny).astype(np.int64), 0, ny - 1)
    return (np.int64(res) << RES_SHIFT) | (x << X_SHIFT) | y


def encode_expr(lon, lat, res: int):
    """JVM-column twin of ``encode`` (whole-stage codegen, no Python).

    Bit-identical to the numpy version: same IEEE +,-,*,/ sequence, and both
    Spark's double->long cast and numpy's .astype(int64) truncate toward zero
    (operands here are non-negative, so trunc == floor).  Use this in hot
    paths (kNN ring passes, tile assignment) where a pandas UDF would pay an
    Arrow round-trip per pass."""
    from pyspark.sql import functions as F

    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0,{MAX_RES}], got {res}")
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    nx, ny = _nx(res), _ny(res)
    fx = (lon + F.lit(180.0)) / F.lit(360.0)
    fx = fx - F.floor(fx)
    x = F.least((fx * nx).cast("long"), F.lit(nx - 1))
    fy = (F.lit(90.0) - lat) / F.lit(180.0)
    y = F.greatest(F.least((fy * ny).cast("long"), F.lit(ny - 1)), F.lit(0))
    return (
        F.shiftleft(F.lit(int(res)).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(x, X_SHIFT))
        .bitwiseOR(y)
    )


def k_ring_expr(cell_col: str, res: int, k: int = 1):
    """JVM-column twin of ``k_ring`` for a KNOWN resolution: all cells
    within Chebyshev distance k (incl. self) as an array<long>, built from
    shift/mask/pmod expressions (wrap in x, clamp in y, duplicates from the
    pole clamp removed with array_distinct) — whole-stage codegen, no
    Python.  ``cell_col`` is a column NAME (referenced in SQL text)."""
    from pyspark.sql import functions as F

    nx, ny = _nx(res), _ny(res)
    return F.expr(
        f"array_distinct(flatten(transform(sequence({-k}, {k}), dx ->"
        f" transform(sequence({-k}, {k}), dy ->"
        f"  (cast({res} as bigint) << {RES_SHIFT})"
        f"  | (pmod(((({cell_col} >> {X_SHIFT}) & {X_MASK}) + dx), {nx}) << {X_SHIFT})"
        f"  | least(greatest(({cell_col} & {Y_MASK}) + dy, 0), {ny - 1})"
        f" ))))"
    )


def decode_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> RES_SHIFT).astype(np.int64)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> X_SHIFT) & X_MASK, cell & Y_MASK


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (lon_min, lat_min, lon_max, lat_max) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = decode_res(cell)
    x, y = decode_xy(cell)
    nx = (np.int64(1) << (res + 1)).astype(np.float64)
    ny = (np.int64(1) << res).astype(np.float64)
    lon0 = x / nx * 360.0 - 180.0
    lon1 = (x + 1) / nx * 360.0 - 180.0
    lat1 = 90.0 - y / ny * 180.0
    lat0 = 90.0 - (y + 1) / ny * 180.0
    return lon0, lat0, lon1, lat1


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen cells to ``parent_res`` (vectorized; requires parent_res <= res)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = decode_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = res - parent_res
    x, y = decode_xy(cell)
    return (np.int64(parent_res) << RES_SHIFT) | ((x >> shift) << X_SHIFT) | (y >> shift)


def k_ring(cell: np.ndarray, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self), shape (n, (2k+1)^2).

    Wraps in x (longitude), clamps in y (pole rows deduplicate to the edge
    row — callers dedupe).  Used by the kNN expand stage (reference analog:
    pyresample neighbourhood search, /root/reference/eoreader/products/
    optical/s3_product.py:584-683).
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res = decode_res(cell)
    if not np.all(res == res[0]):
        raise ValueError("k_ring requires uniform resolution")
    r = int(res[0])
    nx, ny = _nx(r), _ny(r)
    x, y = decode_xy(cell)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    xs = (x[:, None] + dx) % nx
    ys = np.clip(y[:, None] + dy, 0, ny - 1)
    return (np.int64(r) << RES_SHIFT) | (xs << X_SHIFT) | ys


def cover_bbox(
    lon0: np.ndarray, lat0: np.ndarray, lon1: np.ndarray, lat1: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells of n bboxes at ``res``.

    Returns (row_index, cell_id) flat arrays — the explode-ready form for a
    DataFrame ``cells`` column.  Bboxes must be normalized (lon0<=lon1,
    lat0<=lat1) and must not cross the antimeridian; violations raise a
    clear ValueError instead of surfacing as np.repeat's obscure
    'negative dimensions' error.
    """
    nx, ny = _nx(res), _ny(res)
    lon0 = np.asarray(lon0, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat0 = np.asarray(lat0, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    bad = (lon0 > lon1) | (lat0 > lat1)
    if np.any(bad):
        i = int(np.argmax(bad))
        raise ValueError(
            "cover_bbox requires normalized bboxes (lon0<=lon1, lat0<=lat1) "
            "and does not support antimeridian-crossing boxes; offending row "
            f"{i}: lon [{lon0[i]}, {lon1[i]}], lat [{lat0[i]}, {lat1[i]}] — "
            "split crossing boxes at 180deg before calling"
        )
    x0 = np.clip(((lon0 + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    x1 = np.clip(((lon1 + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    y0 = np.clip(((90.0 - lat1) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    y1 = np.clip(((90.0 - lat0) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    counts = (x1 - x0 + 1) * (y1 - y0 + 1)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # per-row local offset 0..count-1
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:]) if len(counts) > 1 else None
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    w = np.repeat(y1 - y0 + 1, counts)
    cx = np.repeat(x0, counts) + local // w
    cy = np.repeat(y0, counts) + local % w
    cells = (np.int64(res) << RES_SHIFT) | (cx << X_SHIFT) | cy
    return row_idx, cells
