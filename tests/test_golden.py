"""Golden-fixture tests: engine output vs committed pure-python-oracle files
(tools/make_golden.py) — the reference's golden GeoTIFF/GeoJSON strategy
(test_satellites.py:209-370) re-expressed.  Regenerate with
`python tools/make_golden.py` ONLY when generator semantics intentionally
change."""

import json
from pathlib import Path

import numpy as np
import pytest

from eoreader_spark import datagen
from eoreader_spark.functions import indices
from eoreader_spark.operators import assign, footprint, knn

GOLDEN = Path(__file__).parent / "golden"
N = 60


def _load(name):
    return json.loads((GOLDEN / f"{name}.json").read_text())


@pytest.fixture(scope="module")
def tabs(spark, synth):
    return {
        n: spark.read.parquet(f"{synth}/{n}.parquet")
        for n in ["images", "scenes", "aoi", "tiles"]
    }


def test_golden_tile_assign_bit_for_bit(spark, tabs):
    want = {tuple(r) for r in _load("tile_assign")}
    got = {
        (r.aoi_id, r.image_id, r.tile_x, r.tile_y)
        for r in assign.assign_tiles(tabs["tiles"], tabs["aoi"]).collect()
    }
    assert got == want


def test_golden_join_rows(spark, tabs):
    want = {(a, i) for a, i, _, _ in (tuple(r) for r in _load("tile_assign"))}
    got = {(r.aoi_id, r.image_id) for r in assign.join_rows(tabs["tiles"], tabs["aoi"]).collect()}
    assert got == want


def test_golden_index_stats(spark, tabs):
    want = _load("index_stats")
    names = ["NDVI", "NDWI", "EVI", "SAVI", "TCBRI", "GNDVI"]
    got = indices.index_stats(tabs["images"], names).collect()
    by = {(r.image_id, r.index_name): (r["mean"], r["min"], r["max"]) for r in got}
    checked = 0
    for iid, stats in want.items():
        for nm, (wm, wmin, wmax) in stats.items():
            gm, gmin, gmax = by[(iid, nm)]
            assert abs(gm - wm) < 1e-6 and abs(gmin - wmin) < 1e-6 and abs(gmax - wmax) < 1e-6
            checked += 1
    assert checked == len(want) * len(names)


def test_golden_knn(spark, tabs):
    want = _load("knn")
    queries = (
        tabs["scenes"]
        .filter(f"image_id < 'img{10:012d}'")
        .selectExpr("image_id as query_id", "lon", "lat")
    )
    got = {}
    for r in knn.knn_join(queries, tabs["scenes"], k=3, res=5, k_cells=2).collect():
        got.setdefault(r.query_id, {})[r.rank] = r.image_id
    for q, neighbors in want.items():
        assert [got[q][k] for k in (1, 2, 3)] == neighbors, q


def test_golden_extent(spark, tabs):
    want = _load("extent")
    got = {r.image_id: (r.x0, r.y0, r.x1, r.y1) for r in footprint.extent(tabs["tiles"]).collect()}
    for iid, w in want.items():
        assert np.allclose(got[iid], w, atol=1e-9), iid


def test_golden_phash(spark, tabs):
    want = _load("phash")
    got = {r.image_id: r.phash for r in tabs["images"].select("image_id", "phash").collect()}
    assert got == {k: int(v) for k, v in want.items()}
