"""Apply-Orbit-File analog (operators/orbit.py): Lagrange OSV interpolation
must reproduce polynomial orbits exactly (degree-3 interpolation of a cubic
is the identity), window selection must clamp at the span edges, and the
refined geolocation must feed the existing geocode operators unchanged.

Reference: grd_s1_preprocess_default.xml:11-22 (polyDegree=3);
sar_product.py:803-838 keeps the node in every SAR graph."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eoreader_spark.operators import orbit


def _cubic(img_seed: int):
    a, b, c, d = 1000 + img_seed, 7 + img_seed, 3, 2
    pos = lambda t: a + b * t + c * t * t + d * t * t * t  # noqa: E731
    vel = lambda t: b + 2 * c * t + 3 * d * t * t  # noqa: E731
    return pos, vel


def _osv_rows(img: str, seed: int, ts):
    pos, vel = _cubic(seed)
    return [
        (img, float(t), float(pos(t)), float(pos(t) + 11), float(pos(t) - 5),
         float(vel(t)), float(vel(t) + 1), float(vel(t) - 1))
        for t in ts
    ]


OSV_SCHEMA = "image_id string, t double, px double, py double, pz double, vx double, vy double, vz double"


def test_cubic_orbit_interpolated_exactly(spark):
    """Degree-3 Lagrange through 4+ OSVs of a cubic orbit reproduces the
    cubic (and its quadratic velocity) to float64 roundoff at every query
    time, interior or extrapolated."""
    rows = _osv_rows("A", 1, [0, 10, 20, 30, 40, 50]) + _osv_rows("B", 9, [0, 10, 20, 30])
    osv = spark.createDataFrame(rows, OSV_SCHEMA)
    times = spark.createDataFrame(
        [("A", i, t) for i, t in enumerate([0.0, 3.0, 17.5, 30.0, 49.0, 55.0, -2.0])]
        + [("B", i, t) for i, t in enumerate([5.0, 10.0, 29.5])],
        "image_id string, row_id int, t double",
    )
    out = orbit.interpolate_osv(times, osv, degree=3).collect()
    assert len(out) == 10
    for r in out:
        pos, vel = _cubic(1 if r.image_id == "A" else 9)
        assert r.px == pytest.approx(pos(r.t), abs=1e-6)
        assert r.py == pytest.approx(pos(r.t) + 11, abs=1e-6)
        assert r.pz == pytest.approx(pos(r.t) - 5, abs=1e-6)
        assert r.vx == pytest.approx(vel(r.t), abs=1e-8)
        assert r.vz == pytest.approx(vel(r.t) - 1, abs=1e-8)
        assert r.row_id is not None  # passthrough survives


def test_window_is_local_for_higher_order_orbits(spark):
    """With more OSVs than the window, interpolation uses the k nearest —
    pinned by a quartic orbit: a GLOBAL degree-5 fit through all 6 points
    would be exact, the local 4-point window must show the quartic's
    interpolation error instead (proves windowing, not global fit)."""
    q = lambda t: t**4  # noqa: E731
    rows = [("A", float(t), float(q(t)), 0.0, 0.0, 0.0, 0.0, 0.0) for t in range(0, 60, 10)]
    osv = spark.createDataFrame(rows, OSV_SCHEMA)
    times = spark.createDataFrame([("A", 25.0)], "image_id string, t double")
    r = orbit.interpolate_osv(times, osv, degree=3).first()
    # window [10,20,30,40]: lagrange of t^4 at 25 = 384375 != 390625
    assert r.px != pytest.approx(q(25.0), abs=1.0)
    got = 0.0
    T = [10.0, 20.0, 30.0, 40.0]
    for j in range(4):
        w = 1.0
        for i in range(4):
            if i != j:
                w *= (25.0 - T[i]) / (T[j] - T[i])
        got += w * q(T[j])
    assert r.px == pytest.approx(got, rel=1e-12)


def test_too_few_osvs_raises_named(spark):
    osv = spark.createDataFrame(_osv_rows("A", 1, [0, 10]), OSV_SCHEMA)
    times = spark.createDataFrame([("A", 5.0)], "image_id string, t double")
    with pytest.raises(Exception, match="OSVs < degree"):
        orbit.interpolate_osv(times, osv, degree=3).collect()
    with pytest.raises(Exception, match="no OSVs"):
        orbit.interpolate_osv(
            spark.createDataFrame([("MISSING", 5.0)], "image_id string, t double"),
            osv,
        ).collect()


def test_refine_geolocation_shifts_and_feeds_geocode(spark):
    """precise-minus-coarse delta applied to lon/lat; a zero-delta refine is
    the identity, and the refined swath drives geocode_swath_bilinear."""
    from eoreader_spark.operators import warp

    coarse = spark.createDataFrame(_osv_rows("A", 1, [0, 10, 20, 30]), OSV_SCHEMA)
    # precise orbit = coarse + 8 m in px (constant), so dlon = 8 * kx exactly
    prec = spark.createDataFrame(
        [(i, t, px + 8.0, py, pz, vx, vy, vz)
         for (i, t, px, py, pz, vx, vy, vz) in _osv_rows("A", 1, [0, 10, 20, 30])],
        OSV_SCHEMA,
    )
    swath = spark.createDataFrame(
        [("A", line, s, s * 0.25, line * 0.25, float(line))
         for line in range(6) for s in range(6)],
        "image_id string, line int, sample int, lon double, lat double, t double",
    )
    ref = orbit.refine_geolocation(swath, coarse, prec, kx=0.125, ky=0.0625)
    rows = ref.collect()
    assert len(rows) == 36
    for r in rows:
        assert r.dpx == pytest.approx(8.0, abs=1e-9)
        assert r.dpy == pytest.approx(0.0, abs=1e-9)
        assert r.lon == pytest.approx(r.sample * 0.25 + 8.0 * 0.125, abs=1e-9)
        assert r.lat == pytest.approx(r.line * 0.25, abs=1e-9)

    # identity refine (precise == coarse) leaves geocoding bit-identical
    same = orbit.refine_geolocation(swath, coarse, coarse, kx=0.125, ky=0.0625)
    grid = spark.createDataFrame(
        [("g0", 0.8125, 0.3125)], "grid_id string, lon double, lat double"
    )
    base = warp.geocode_swath_bilinear(
        swath.withColumn("value", F.col("t")), grid
    ).first()
    refd = warp.geocode_swath_bilinear(
        same.withColumn("value", F.col("t")).select(
            "image_id", "line", "sample", "lon", "lat", "value"
        ),
        grid,
    ).first()
    assert (base.u, base.v, base.value) == (refd.u, refd.v, refd.value)
