"""Guards for the stencil gate trio (slope_ramp / hillshade_ramp /
lee_despeckle): the cross-engine comparison rounds libm constants to 3dp, so
every constant must sit far from a rounding boundary relative to the
float32-kernel vs float64-oracle drift.  These tests pin that margin (and the
float32/float64 round agreement) so a future spec edit can't silently land on
a boundary."""

from __future__ import annotations

import math

import numpy as np

import __spark_entry__ as entrymod

AZ, ZEN = math.radians(315.0), math.radians(45.0)
MIN_MARGIN = 5e-5  # >= 50x the observed float32 kernel drift (~1e-6)


def _margin(v: float, dp: int) -> float:
    scaled = v * 10**dp
    return abs(scaled - math.floor(scaled) - 0.5) / 10**dp


def _oracle_vals(a: int, b: int) -> tuple[float, float]:
    s = math.atan(math.sqrt(a * a + b * b))
    aspect = math.atan2(b, -a)
    hs = math.cos(ZEN) * math.cos(s) + math.sin(ZEN) * math.sin(s) * math.cos(AZ - aspect)
    return math.degrees(s), min(max(hs, 0.0), 1.0)


def _kernel_vals(a: int, b: int) -> tuple[float, float]:
    """Replays the numpy float32 kernel arithmetic on a constant gradient."""
    dzdx, dzdy = np.float32(a), np.float32(b)
    slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    hs = (
        np.cos(np.float64(ZEN)) * np.cos(slope)
        + np.sin(np.float64(ZEN)) * np.sin(slope) * np.cos(np.float64(AZ) - aspect)
    )
    return (
        float(np.degrees(np.arctan(np.sqrt(np.float32(a * a + b * b))))),
        float(np.clip(hs, 0.0, 1.0)),
    )


def test_slope_constants_have_rounding_margin():
    for _img, a, b, _h, _w in entrymod._SLOPE_SPEC:
        sd, _ = _oracle_vals(a, b)
        s32, _ = _kernel_vals(a, b)
        assert _margin(sd, 3) >= MIN_MARGIN, (a, b, sd)
        assert round(s32, 3) == round(sd, 3), (a, b, s32, sd)


def test_hillshade_constants_have_rounding_margin():
    for _img, a, b, _h, _w in entrymod._HS_SPEC:
        _, hs = _oracle_vals(a, b)
        _, h32 = _kernel_vals(a, b)
        # clipped-to-zero constants sit mid-bucket by construction
        assert _margin(hs, 3) >= MIN_MARGIN, (a, b, hs)
        assert round(h32, 3) == round(hs, 3), (a, b, h32, hs)


def test_lee_spec_exactness_preconditions():
    """|a-b| = 6 and a == b (mod 6) guarantee integer window means, var in
    {0, 8}, weight exactly 1/2, integer outputs — re-derive per spec row."""
    for _img, a, b, _h, _w in entrymod._LEE_SPEC:
        assert abs(a - b) == 6 and (a - b) % 6 == 0, (a, b)
        # mixed 2:1 window: mean integer, var == noise_var == 8
        assert (2 * a + b) % 3 == 0 and (a + 2 * b) % 3 == 0
        assert 2 * (a - b) ** 2 / 9 == 8.0
        # outputs (5a+b)/6 and (a+5b)/6 must be integers
        assert (5 * a + b) % 6 == 0 and (a + 5 * b) % 6 == 0
