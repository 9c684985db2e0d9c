import numpy as np

from eoreader_spark.spatial import pip


def _scalar_pip(px, py, ring):
    """Independent scalar reference implementation (same even-odd rule)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def test_square():
    ring = pip.parse_wkt_polygon("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    px = np.array([2.0, 5.0, -1.0, 2.0, 2.0])
    py = np.array([2.0, 2.0, 2.0, 5.0, -1.0])
    assert pip.points_in_polygon(px, py, ring).tolist() == [True, False, False, False, False]


def test_matches_scalar_reference_on_random_polygons():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = rng.integers(3, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.5, 2.0, n)
        ring = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        px = rng.uniform(-2.5, 2.5, 300)
        py = rng.uniform(-2.5, 2.5, 300)
        got = pip.points_in_polygon(px, py, ring)
        want = np.array([_scalar_pip(px[i], py[i], ring) for i in range(300)])
        assert np.array_equal(got, want)


def test_degenerate_on_vertex_and_edge_deterministic():
    ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
    # exactly on corners / edges: rule is half-open — left/bottom in, right/top out
    px = np.array([0.0, 4.0, 0.0, 4.0, 0.0, 2.0, 2.0, 4.0, 0.0])
    py = np.array([0.0, 0.0, 4.0, 4.0, 2.0, 0.0, 4.0, 2.0, 0.0])
    got = pip.points_in_polygon(px, py, ring)
    want = np.array([_scalar_pip(px[i], py[i], ring) for i in range(len(px))])
    assert np.array_equal(got, want)
    # repeatability: permuted evaluation gives identical per-point answers
    order = np.array([3, 1, 4, 0, 2, 8, 6, 7, 5])
    got2 = pip.points_in_polygon(px[order], py[order], ring)
    assert np.array_equal(got2, got[order])


def test_grouped_matches_single():
    rings = [
        np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]),
        np.array([(1.0, 1.0), (3.0, 1.0), (2.0, 3.0)]),
    ]
    rng = np.random.default_rng(0)
    px = rng.uniform(-1, 4, 500)
    py = rng.uniform(-1, 4, 500)
    idx = rng.integers(0, 2, 500).astype(np.int64)
    got = pip.points_in_polygons_grouped(px, py, idx, rings)
    for i in (0, 1):
        sel = idx == i
        assert np.array_equal(got[sel], pip.points_in_polygon(px[sel], py[sel], rings[i]))
