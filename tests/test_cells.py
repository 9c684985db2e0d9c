import numpy as np

from eoreader_spark import cells


def test_encode_bounds_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 179.999, 1000)
    lat = rng.uniform(-89.999, 89.999, 1000)
    for res in (5, 7, 9):
        c = cells.encode(lon, lat, res)
        lo0, la0, lo1, la1 = cells.cell_bounds(c)
        assert np.all((lo0 <= lon) & (lon < lo1 + 1e-9))
        assert np.all((la0 - 1e-9 <= lat) & (lat <= la1 + 1e-9))


def test_parent_consistency():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    c9 = cells.encode(lon, lat, 9)
    c5 = cells.encode(lon, lat, 5)
    assert np.array_equal(cells.parent(c9, 5), c5)


def test_k_ring_contains_neighbors():
    c = cells.encode(np.array([2.35]), np.array([48.85]), 7)
    ring = cells.k_ring(c, 1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]
    assert len(np.unique(ring[0])) == 9


def test_k_ring_wraps_antimeridian():
    c = cells.encode(np.array([179.99]), np.array([0.0]), 7)
    ring = np.unique(cells.k_ring(c, 1))
    west = cells.encode(np.array([-179.99]), np.array([0.0]), 7)
    assert west[0] in ring


def test_cover_bbox_covers_points():
    lon0, lat0, lon1, lat1 = 1.0, 40.0, 4.0, 43.0
    _, cc = cells.cover_bbox(
        np.array([lon0]), np.array([lat0]), np.array([lon1]), np.array([lat1]), 7
    )
    cc = set(cc.tolist())
    rng = np.random.default_rng(3)
    plon = rng.uniform(lon0, lon1, 200)
    plat = rng.uniform(lat0, lat1, 200)
    pc = cells.encode(plon, plat, 7)
    assert set(pc.tolist()) <= cc


def test_determinism_across_chunking():
    # same inputs, different array chunking -> identical ids (bit-for-bit rule)
    lon = np.linspace(-170, 170, 997)
    lat = np.linspace(-80, 80, 997)
    whole = cells.encode(lon, lat, 9)
    parts = np.concatenate([cells.encode(lon[i::7], lat[i::7], 9) for i in range(7)])
    assert set(whole.tolist()) == set(parts.tolist())


def test_encode_expr_matches_numpy(spark):
    """JVM encode_expr must be bit-identical to the numpy encode (same IEEE
    op sequence, trunc==floor on non-negative operands), including the wrap
    and clamp edges."""
    import numpy as np

    from eoreader_spark import cells

    lon = np.array([-180.0, -179.999, 0.0, 179.999, 180.0, 359.0, 2.35, -74.0])
    lat = np.array([90.0, 89.999, 0.0, -89.999, -90.0, 45.0, 48.85, 40.7])
    for res in (0, 5, 7, 9, 12):
        want = cells.encode(lon, lat, res)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
        )
        got = [r.c for r in df.select(cells.encode_expr("lon", "lat", res).alias("c")).collect()]
        assert got == want.tolist(), res


def test_k_ring_expr_matches_numpy(spark):
    import numpy as np

    from eoreader_spark import cells

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 40)
    lat = np.concatenate([rng.uniform(-90, 90, 36), [89.9, -89.9, 0.0, 45.0]])
    for res, k in ((5, 1), (7, 2), (9, 1)):
        cell = cells.encode(lon, lat, res)
        want = [sorted(set(r.tolist())) for r in cells.k_ring(cell, k)]
        df = spark.createDataFrame([(int(c),) for c in cell], "qcell long")
        got = [sorted(r.ring) for r in
               df.select(cells.k_ring_expr("qcell", res, k).alias("ring")).collect()]
        assert got == want, (res, k)
