"""J9 SAR GRD noise stages: thermal-noise LUT subtraction and border-noise
trimming vs a brute-force per-pixel python oracle, plus chain-order
composition (graph order ThermalNoise -> BorderNoise -> Calibration,
/root/reference/eoreader/data/grd_s1_preprocess_default.xml:12-46)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from eoreader_spark.operators import sar

T = 64


def _img(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic intensity image with quiet borders: low values near the
    left/right/top/bottom edges, interior well above any test threshold."""
    rng = np.random.RandomState(seed)
    a = rng.randint(20, 60, size=(h, w)).astype(np.float64)
    # left border: first 5+(y%4) px of each row are sub-threshold
    for y in range(h):
        a[y, : 5 + (y % 4)] = (y % 2)
        a[y, w - 3 - (y % 5) :] = 1.0 + (y % 2)
    a[: 4, :] = np.minimum(a[:4, :], 2.0)  # quiet top rows too
    return a


def _tiles_df(spark, imgs: dict[str, np.ndarray]):
    rows = []
    for iid, a in imgs.items():
        h, w = a.shape
        for ty in range(h // T):
            for tx in range(w // T):
                px = a[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
                rows.append((iid, tx, ty, px.reshape(-1).astype(float).tolist()))
    return spark.createDataFrame(
        rows, "image_id string, tile_x int, tile_y int, px array<float>"
    )


def _collect_imgs(df, imgs):
    out = {iid: np.full(a.shape, np.nan, np.float64) for iid, a in imgs.items()}
    for r in df.collect():
        a = np.asarray(r.px, np.float64).reshape(T, T)
        out[r.image_id][r.tile_y * T : (r.tile_y + 1) * T, r.tile_x * T : (r.tile_x + 1) * T] = a
    return out


def _oracle_trim(a: np.ndarray, scan: int, thr: float, axis: int = 1) -> np.ndarray:
    """Brute-force row scan (axis=1: range; axis=0: azimuth)."""
    b = a.copy()
    if axis == 0:
        return _oracle_trim(a.T, scan, thr).T
    h, w = a.shape
    s = min(scan, w)
    for y in range(h):
        row = a[y]
        lf = next((x for x in range(s) if row[x] >= thr), s)
        rl = next((x for x in range(w - 1, w - s - 1, -1) if row[x] >= thr), w - s - 1)
        for x in range(w):
            if x < lf or x > rl:
                b[y, x] = np.nan
    return b


def _noise(x: int) -> float:
    # control points n_t at tile boundaries: n(x) linear between them
    t, fx = divmod(x, T)
    n0, n1 = float((t * 3) % 5), float(((t + 1) * 3) % 5)
    return n0 + fx * (n1 - n0) / T


def test_thermal_noise_removal_exact(spark):
    imgs = {"tnA": _img(0, 64, 192), "tnB": _img(1, 128, 64)}
    tiles = _tiles_df(spark, imgs)
    pts = spark.createDataFrame(
        [
            (iid, tx, float((tx * 3) % 5), float(((tx + 1) * 3) % 5))
            for iid, a in imgs.items()
            for tx in range(a.shape[1] // T)
        ],
        "image_id string, tile_x int, n0 double, n1 double",
    )
    got = _collect_imgs(sar.thermal_noise_removal(tiles, pts), imgs)
    for iid, a in imgs.items():
        want = np.maximum(
            a - np.array([_noise(x) for x in range(a.shape[1])])[None, :], 0.0
        ).astype(np.float32)
        assert np.array_equal(got[iid].astype(np.float32), want), iid


def test_thermal_noise_missing_lut_rows_zero_noise(spark):
    imgs = {"tn0": _img(2, 64, 128)}
    tiles = _tiles_df(spark, imgs)
    pts = spark.createDataFrame(
        [("tn0", 0, 4.0, 4.0)], "image_id string, tile_x int, n0 double, n1 double"
    )  # tile_x=1 has no LUT row -> untouched
    got = _collect_imgs(sar.thermal_noise_removal(tiles, pts), imgs)["tn0"]
    a = imgs["tn0"]
    assert np.array_equal(got[:, T:], a[:, T:])
    assert np.array_equal(got[:, :T], np.maximum(a[:, :T] - 4.0, 0.0))


def test_border_trim_range_matches_oracle(spark):
    imgs = {"btA": _img(3, 64, 256), "btB": _img(4, 128, 128), "btC": _img(5, 64, 64)}
    tiles = _tiles_df(spark, imgs)
    dims = spark.createDataFrame(
        [(i, a.shape[0], a.shape[1]) for i, a in imgs.items()],
        "image_id string, h int, w int",
    )
    for limit in (64, 100, 500):
        got = _collect_imgs(
            sar.grd_border_trim(tiles, dims, border_limit=limit, threshold=10.0),
            imgs,
        )
        for iid, a in imgs.items():
            want = _oracle_trim(a, limit, 10.0)
            assert np.array_equal(
                np.isnan(got[iid]), np.isnan(want)
            ), (iid, limit)
            assert np.allclose(got[iid], want, equal_nan=True), (iid, limit)


def test_border_trim_azimuth_and_both(spark):
    imgs = {"bz": _img(6, 192, 128)}
    tiles = _tiles_df(spark, imgs)
    dims = spark.createDataFrame([("bz", 192, 128)], "image_id string, h int, w int")
    a = imgs["bz"]
    got = _collect_imgs(
        sar.grd_border_trim(
            tiles, dims, border_limit=70, threshold=10.0,
            directions=("range", "azimuth"),
        ),
        imgs,
    )["bz"]
    want = _oracle_trim(_oracle_trim(a, 70, 10.0, axis=1), 70, 10.0, axis=0)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    assert np.allclose(got, want, equal_nan=True)


def test_border_trim_relative_threshold(spark):
    imgs = {"rt": _img(7, 64, 128)}
    tiles = _tiles_df(spark, imgs)
    dims = spark.createDataFrame([("rt", 64, 128)], "image_id string, h int, w int")
    a = imgs["rt"]
    thr = 0.5 * a.mean()
    got = _collect_imgs(
        sar.grd_border_trim(tiles, dims, border_limit=500, trim_threshold=0.5),
        imgs,
    )["rt"]
    want = _oracle_trim(a, 500, thr)
    assert np.array_equal(np.isnan(got), np.isnan(want))


def test_border_trim_partition_invariant(spark):
    """Same masks at 1 and 13 shuffle partitions (edge-tile grouping owns
    the scan; partitioning must not matter)."""
    imgs = {"pi": _img(8, 128, 192)}
    tiles = _tiles_df(spark, imgs)
    dims = spark.createDataFrame([("pi", 128, 192)], "image_id string, h int, w int")
    a_ = _collect_imgs(
        sar.grd_border_trim(tiles.coalesce(1), dims, border_limit=80, threshold=10.0),
        imgs,
    )["pi"]
    b_ = _collect_imgs(
        sar.grd_border_trim(
            tiles.repartition(13), dims, border_limit=80, threshold=10.0
        ),
        imgs,
    )["pi"]
    assert np.allclose(a_, b_, equal_nan=True)


def test_preprocess_chain_order(spark):
    """Chain == manual composition in the reference graph's node order, and
    border crossings are found on THERMAL-CORRECTED values (the graph runs
    ThermalNoiseRemoval before Remove-GRD-Border-Noise)."""
    imgs = {"ch": _img(9, 64, 128)}
    tiles = _tiles_df(spark, imgs)
    dims = spark.createDataFrame([("ch", 64, 128)], "image_id string, h int, w int")
    pts = spark.createDataFrame(
        [("ch", 0, 0.0, 2.0), ("ch", 1, 2.0, 0.0)],
        "image_id string, tile_x int, n0 double, n1 double",
    )
    got = _collect_imgs(
        sar.sar_preprocess(
            tiles, dims, noise_pts=pts, border_limit=64, threshold=10.0,
            cal_gain=0.5, cal_bias=1.0, despeckle_method=None, db=True,
        ),
        imgs,
    )["ch"]
    a = imgs["ch"]
    noise = np.array(
        [_x * 2.0 / T if _x < T else (128 - _x) * 2.0 / T for _x in range(128)]
    )
    tn = np.maximum(a - noise[None, :], 0.0).astype(np.float32)
    trimmed = _oracle_trim(tn.astype(np.float64), 64, 10.0)
    cal = (0.5 * np.float32(trimmed.astype(np.float32)) + 1.0).astype(np.float32)
    want = 10.0 * np.log10(cal.astype(np.float64))
    ok = ~np.isnan(want)
    assert np.array_equal(np.isnan(got), ~ok)
    assert np.allclose(got[ok], want[ok], rtol=1e-6)


def _tiles_df_padded(spark, imgs: dict[str, np.ndarray]):
    """Tiler variant for non-tile-multiple dims: partial edge tiles are
    zero-padded to (T, T), as the production scan does."""
    rows = []
    for iid, a in imgs.items():
        h, w = a.shape
        for ty in range(-(-h // T)):
            for tx in range(-(-w // T)):
                px = np.zeros((T, T), np.float64)
                blk = a[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
                px[: blk.shape[0], : blk.shape[1]] = blk
                rows.append((iid, tx, ty, px.reshape(-1).tolist()))
    return spark.createDataFrame(
        rows, "image_id string, tile_x int, tile_y int, px array<float>"
    )


def test_border_trim_partial_last_tile(spark):
    """Regression (ADVICE r5): width not a tile multiple — the right-edge
    scan must include the partial last tile (cols w-scan..w-1), and padding
    cols >= w must never cross the threshold."""
    imgs = {
        "pt100": _img(10, 64, 100),   # 2 tiles wide, last covers cols 64-99
        "pt70": _img(11, 128, 70),    # right scan lives almost entirely in tile 1
        "pt130h": _img(12, 100, 64),  # partial along azimuth instead
    }
    tiles = _tiles_df_padded(spark, imgs)
    dims = spark.createDataFrame(
        [(i, a.shape[0], a.shape[1]) for i, a in imgs.items()],
        "image_id string, h int, w int",
    )
    for limit in (10, 64, 500):
        got = _collect_imgs(
            sar.grd_border_trim(
                tiles, dims, border_limit=limit, threshold=10.0,
                directions=("range", "azimuth"),
            ),
            {i: np.zeros((-(-a.shape[0] // T) * T, -(-a.shape[1] // T) * T))
             for i, a in imgs.items()},
        )
        for iid, a in imgs.items():
            h, w = a.shape
            want = _oracle_trim(_oracle_trim(a, limit, 10.0, axis=1), limit, 10.0, axis=0)
            g = got[iid][:h, :w]
            assert np.array_equal(np.isnan(g), np.isnan(want)), (iid, limit)
            assert np.allclose(g, want, equal_nan=True), (iid, limit)
