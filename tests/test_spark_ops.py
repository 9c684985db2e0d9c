import numpy as np
import pytest

from eoreader_spark import cells, codecs, datagen
from eoreader_spark.functions import indices
from eoreader_spark.operators import assign, footprint, knn
from eoreader_spark.spatial import pip

N = 60


@pytest.fixture(scope="module")
def tables(spark, synth):
    return {
        name: spark.read.parquet(f"{synth}/{name}.parquet")
        for name in ["images", "scenes", "footprints", "aoi", "tiles", "dem", "band_map", "qa_masks"]
    }


def _oracle_assignments(n_images, aoi_rows):
    """Pure-python oracle: every tile center vs every AOI ring (brute force)."""
    out = set()
    for aoi_id, wkt in aoi_rows:
        ring = pip.parse_wkt_polygon(wkt)
        for i in range(n_images):
            h, w = datagen.image_dims(i)
            bx0, by0, bx1, by1 = (float(v) for v in np.concatenate(datagen.scene_bbox(np.array([i]))))
            ntx, nty = w // datagen.TILE, h // datagen.TILE
            dx, dy = (bx1 - bx0) / ntx, (by1 - by0) / nty
            for ty in range(nty):
                for tx in range(ntx):
                    cx = bx0 + tx * dx + dx / 2
                    cy = by1 - (ty + 1) * dy + dy / 2
                    if pip.points_in_polygon(np.array([cx]), np.array([cy]), ring)[0]:
                        out.add((aoi_id, f"img{i:012d}", tx, ty))
    return out


def test_datagen_schema_and_counts(tables):
    assert tables["images"].count() == N
    cols = dict(tables["images"].dtypes)
    assert cols == {
        "image_id": "string", "bytes": "binary", "w": "int", "h": "int",
        "fmt": "string", "caption": "string", "phash": "bigint",
    }
    assert tables["scenes"].count() == N
    # skew: hot cells should dominate
    hist = tables["scenes"].groupBy("cell_r7").count().toPandas()
    assert hist["count"].max() >= 5


def test_decoded_pixels_and_caption_invariant(spark, tables):
    """BASELINE.json:15 per-row invariant: decoded-pixel allclose (PSNR>=40dB
    lossy) + caption equality, vs the closed-form oracle."""
    rows = tables["images"].collect()
    assert len(rows) == N
    for r in rows:
        i = int(r.image_id[3:])
        img = codecs.decode(bytes(r.bytes), r.fmt, r.h, r.w)
        want = codecs.make_image(i, r.h, r.w)
        if r.fmt == "jpeg":
            assert codecs.psnr(want, img) >= 40.0
        else:
            assert np.array_equal(want, img)
        assert r.caption == datagen.caption_of(i)
        assert r.phash == datagen.phash_of(want)


def test_tile_assignment_matches_oracle_all_strategies(spark, tables):
    """Bit-for-bit tile-assignment + join-row match, broadcast AND salted
    paths, vs the brute-force oracle (BASELINE.json:2,6)."""
    aoi_rows = [(r.aoi_id, r.geom_wkt) for r in tables["aoi"].select("aoi_id", "geom_wkt").collect()]
    want = _oracle_assignments(N, aoi_rows)
    for strategy in ("broadcast", "salted"):
        got = {
            (r.aoi_id, r.image_id, r.tile_x, r.tile_y)
            for r in assign.assign_tiles(
                tables["tiles"], tables["aoi"], force_strategy=strategy, skew_factor=0.5
            ).collect()
        }
        assert got == want, strategy
    want_join = {(a, i) for a, i, _, _ in want}
    got_join = {
        (r.aoi_id, r.image_id) for r in assign.join_rows(tables["tiles"], tables["aoi"]).collect()
    }
    assert got_join == want_join


def test_assignment_parallelism_invariance(spark, tables):
    """Same input at different partitionings -> identical assignment set."""
    t1 = tables["tiles"].repartition(1)
    t2 = tables["tiles"].repartition(17, "image_id")
    a = {tuple(r) for r in assign.assign_tiles(t1, tables["aoi"]).collect()}
    b = {tuple(r) for r in assign.assign_tiles(t2, tables["aoi"]).collect()}
    assert a == b


def test_index_stats_vs_oracle(spark, tables):
    names = ["NDVI", "NDWI", "EVI", "SAVI", "TCBRI", "GNDVI"]
    got = indices.index_stats(tables["images"], names).collect()
    assert len(got) == N * len(names)
    by_key = {(r.image_id, r.index_name): r for r in got}
    for i in range(0, N, 7):
        h, w = datagen.image_dims(i)
        want = indices.oracle_index_stats(i, h, w, names)
        fmt = datagen.image_fmt(i)
        for n in names:
            r = by_key[(f"img{i:012d}", n)]
            wm, wmin, wmax = want[n]
            tol = 1e-6 if fmt != "jpeg" else 0.05  # lossy rows: loose stats tol
            assert abs(r.mean - wm) <= tol, (i, n, fmt)
            assert abs(r.min - wmin) <= 3 * tol
            assert abs(r.max - wmax) <= 3 * tol


def test_parametric_index(spark, tables):
    # X2 analog: WDRVI alpha forwarded (reference test_index.py:77-79)
    a02 = indices.index_stats(tables["images"], ["WDRVI"], {"WDRVI": {"alpha": 0.2}})
    a10 = indices.index_stats(tables["images"], ["WDRVI"], {"WDRVI": {"alpha": 1.0}})
    m02 = {r.image_id: r.mean for r in a02.collect()}
    m10 = {r.image_id: r.mean for r in a10.collect()}
    assert any(abs(m02[k] - m10[k]) > 1e-3 for k in m02)


def test_custom_index_registration(spark, tables):
    # X1 analog: user-registered kernel
    indices.register_index("DIFF_RG", ["RED", "GREEN"], lambda b: b["RED"] - b["GREEN"])
    got = indices.index_stats(tables["images"].limit(6), ["DIFF_RG"]).collect()
    assert len(got) == 6
    del indices.INDEX_REGISTRY["DIFF_RG"]


def test_extent_and_footprint(spark, tables):
    ext = {r.image_id: (r.x0, r.y0, r.x1, r.y1) for r in footprint.extent(tables["tiles"]).collect()}
    for i in range(0, N, 11):
        want = tuple(float(v) for v in np.concatenate(datagen.scene_bbox(np.array([i]))))
        got = ext[f"img{i:012d}"]
        assert np.allclose(got, want)
    fp = footprint.footprint(tables["tiles"]).collect()
    assert len(fp) == N
    for r in fp[:5]:
        ring = pip.parse_wkt_polygon(r.geom_wkt)
        assert len(ring) >= 4


def test_knn_matches_brute_force(spark, tables):
    scenes = tables["scenes"]
    queries = scenes.limit(10).selectExpr("image_id as query_id", "lon", "lat")
    got = knn.knn_join(queries, scenes, k=3, res=5, k_cells=2).collect()
    want = knn.knn_brute(queries, scenes, k=3).collect()
    gk = {(r.query_id, r.rank): r.image_id for r in got}
    wk = {(r.query_id, r.rank): r.image_id for r in want}
    assert gk == wk
