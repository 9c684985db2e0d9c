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


def test_bt_rounding_margins():
    """radiometric_chain crosses libm ln (JVM Math.log vs DuckDB C log can
    differ in the last ulp).  Every one of the 256 possible BT values must
    sit far from a round(bt*1e4) half-boundary relative to that drift."""
    dn = np.arange(0, 256)
    L = (dn + 1.0) * 0.125
    bt = entrymod._BT_K2 / np.log(entrymod._BT_K1 / L + 1.0)
    x = bt * 1e4
    margins = np.abs(x - np.floor(x) - 0.5)
    assert margins.min() > 1e-4  # observed 1.9e-3; libm drift ~1e-8


def test_mean_angle_bisectors_are_integers():
    """mean_angles relies on exact half/half azimuth mixes averaging to an
    integer bisector (mid-bucket at 4dp); re-derive per spec row."""
    import math

    for _img, a1, a2, _z1, _z2, h, w in entrymod._ANGLE_SPEC:
        assert h % 2 == 0 and w % 2 == 0  # exact checkerboard halves
        s = math.sin(math.radians(a1)) + math.sin(math.radians(a2))
        c = math.cos(math.radians(a1)) + math.cos(math.radians(a2))
        mean = (math.degrees(math.atan2(s, c)) + 360.0) % 360.0
        assert abs(mean - round(mean)) < 1e-9, (a1, a2, mean)
        assert _margin(mean, 4) > 1e-5 or abs(mean - round(mean)) < 1e-9
