"""Refined Lee (W3 parity) — 7x7 edge-directed despeckle over a width-3 halo.

The reference's despeckle graph is SNAP filter "Refined Lee"
(/root/reference/eoreader/data/sar_despeckle_default.xml,
sar_product.py:1251-1308); the engine re-derives the published algorithm
(Lee 1981) with its own documented orientation/tie conventions — see
stencil.refined_lee_kernel_factory.  The brute-force reference below
implements the same spec with independent per-pixel loops.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eoreader_spark.operators import stencil

OFFS = [(dy, dx) for dy in range(-3, 4) for dx in range(-3, 4)]
CONDS = {
    0: (lambda dy, dx: dx <= 0, lambda dy, dx: dx >= 0),
    1: (lambda dy, dx: dx >= dy, lambda dy, dx: dx <= dy),
    2: (lambda dy, dx: dy <= 0, lambda dy, dx: dy >= 0),
    3: (lambda dy, dx: dx + dy <= 0, lambda dy, dx: dx + dy >= 0),
}


def brute_refined_lee(img: np.ndarray, num_looks: float = 4.0) -> np.ndarray:
    """Independent per-pixel reference of the documented spec."""
    h, w = img.shape
    pad = np.full((h + 6, w + 6), np.nan)
    pad[3:-3, 3:-3] = img
    sv2 = 1.0 / num_looks
    out = np.zeros_like(img, dtype=np.float64)
    for y in range(h):
        for x in range(w):
            win = pad[y : y + 7, x : x + 7]
            if np.isnan(win).any():
                out[y, x] = np.nanmean(win)
                continue
            m = {}
            for jj, cy in enumerate((1, 3, 5)):
                for ii, cx in enumerate((1, 3, 5)):
                    m[(jj, ii)] = win[cy - 1 : cy + 2, cx - 1 : cx + 2].sum() / 9.0
            g = [
                abs(m[(1, 0)] - m[(1, 2)]), abs(m[(0, 2)] - m[(2, 0)]),
                abs(m[(0, 1)] - m[(2, 1)]), abs(m[(0, 0)] - m[(2, 2)]),
            ]
            ax = int(np.argmax(g))
            proxies = {
                0: (m[(1, 0)], m[(1, 2)]), 1: (m[(0, 2)], m[(2, 0)]),
                2: (m[(0, 1)], m[(2, 1)]), 3: (m[(0, 0)], m[(2, 2)]),
            }
            pa, pb = proxies[ax]
            cond = CONDS[ax][1 if abs(pb - m[(1, 1)]) < abs(pa - m[(1, 1)]) else 0]
            vals = np.array(
                [win[3 + dy, 3 + dx] for dy, dx in OFFS if cond(dy, dx)], dtype=np.float64
            )
            assert len(vals) == 28
            mean_y = vals.sum() / 28.0
            var_y = (vals * vals).sum() / 28.0 - mean_y * mean_y
            if var_y > 0:
                var_x = (var_y - mean_y * mean_y * sv2) / (1.0 + sv2)
                b = min(max(var_x / var_y, 0.0), 1.0)
                out[y, x] = mean_y + b * (win[3, 3] - mean_y)
            else:
                out[y, x] = mean_y
    return out


def _tile_df(spark, img: np.ndarray, t: int):
    h, w = img.shape
    rows = []
    for ty in range(h // t):
        for tx in range(w // t):
            rows.append(
                ("i0", tx, ty, img[ty * t : (ty + 1) * t, tx * t : (tx + 1) * t]
                 .astype(np.float32).ravel().tolist())
            )
    return spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")


def test_kernel_matches_brute_force():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(20, 20)).astype(np.float64)
    pad = np.full((26, 26), np.nan, dtype=np.float32)
    pad[3:-3, 3:-3] = img
    got = stencil.refined_lee_kernel_factory(4.0)(pad)
    want = brute_refined_lee(img)
    assert np.allclose(got, want, atol=1e-5)


def test_distributed_matches_whole_image(spark):
    """Width-3 halo exchange: multi-tile distributed output equals the
    whole-image reference, including pixels whose 7x7 window spans up to
    four tiles."""
    rng = np.random.RandomState(3)
    t = 16
    img = rng.randint(0, 256, size=(32, 48)).astype(np.float64)
    out = stencil.despeckle(_tile_df(spark, img, t), tile=t, method="refined_lee")
    got = np.zeros_like(img)
    for r in out.collect():
        got[r.tile_y * t : (r.tile_y + 1) * t, r.tile_x * t : (r.tile_x + 1) * t] = (
            np.asarray(r.px).reshape(t, t)
        )
    assert np.allclose(got, brute_refined_lee(img), atol=1e-4)


def test_partition_invariance(spark):
    """Bit-identical output regardless of input partitioning (the strips
    exchange is associative: max-of-one per direction)."""
    rng = np.random.RandomState(5)
    t = 16
    img = rng.randint(0, 256, size=(32, 32)).astype(np.float64)
    df = _tile_df(spark, img, t)
    a = stencil.despeckle(df.repartition(1), tile=t, method="refined_lee")
    b = stencil.despeckle(df.repartition(7), tile=t, method="refined_lee")
    ka = {(r.tile_x, r.tile_y): tuple(r.px) for r in a.collect()}
    kb = {(r.tile_x, r.tile_y): tuple(r.px) for r in b.collect()}
    assert ka == kb


def test_flat_window_passes_through():
    """Constant regions: varY == 0 -> output == mean == input (no blur)."""
    pad = np.full((22, 22), np.nan, dtype=np.float32)
    pad[3:-3, 3:-3] = 42.0
    out = stencil.refined_lee_kernel_factory()(pad)
    assert np.allclose(out, 42.0)


def test_edge_preservation_vs_plain_lee():
    """The point of Refined Lee: a hard vertical edge stays sharp (the
    directional window never mixes the two sides at the edge columns),
    while plain Lee 3x3 blurs across it."""
    img = np.full((20, 20), 10.0)
    img[:, 10:] = 200.0
    # interior columns adjacent to the edge
    rl = brute_refined_lee(img)
    assert np.allclose(rl[5:15, 9], 10.0, atol=1e-6)   # left side stays left-valued
    assert np.allclose(rl[5:15, 10], 200.0, atol=1e-6)
    pad = np.full((22, 22), np.nan, dtype=np.float32)
    pad[1:-1, 1:-1] = img
    pl = stencil.lee_kernel_factory(25.0)(pad)
    assert abs(pl[10, 9] - 10.0) > 0.1  # plain Lee leaks across the edge


def test_gate_fixture_rounding_margins():
    """Pin the refined_lee gate's 3dp-round safety: every interior output of
    the stripe fixture sits >= 2e-4 from a rounding boundary, an order of
    magnitude above the float32 storage error (~1.5e-5 at DN scale)."""
    from __spark_entry__ import _RLEE_SPEC

    for _name, a, b, _h, w in _RLEE_SPEC:
        v = np.array([a if (x % 6) < 3 else b for x in range(w)], dtype=np.float64)
        for x in range(3, w - 3):
            m10 = v[x - 3 : x].sum() / 3.0
            m12 = v[x + 1 : x + 4].sum() / 3.0
            m11 = v[x - 1 : x + 2].sum() / 3.0
            cols = v[x : x + 4] if abs(m12 - m11) < abs(m10 - m11) else v[x - 3 : x + 1]
            mean_y = (7 * cols.sum()) / 28.0
            var_y = (7 * (cols * cols).sum()) / 28.0 - mean_y * mean_y
            if var_y > 0:
                bb = min(max(((var_y - mean_y * mean_y * 0.25) / 1.25) / var_y, 0.0), 1.0)
                o = mean_y + bb * (v[x] - mean_y)
            else:
                o = mean_y
            margin = abs(((o * 1000) % 1) - 0.5) / 1000
            assert margin >= 2e-4, (a, b, x, o, margin)


def test_wide_halo_strips_volume():
    """The width-3 exchange still moves strips only: 4*(3T) edges + 4*9
    corners per tile ~= 12T+36 floats, ~19%% of a 64^2 tile and ~1.2%% of a
    1024^2 production tile — never the center payload."""
    t = 64
    strip_floats = 4 * 3 * t + 4 * 9
    assert strip_floats / (t * t) < 0.2


def test_despeckle_unknown_method():
    with pytest.raises(ValueError, match="unknown despeckle method"):
        stencil.despeckle(None, method="gamma_map")
