import io
import json
import zipfile

import numpy as np
import pytest

from eoreader_spark import datagen
from eoreader_spark.operators import warp
from eoreader_spark.sources import archive, stac

T = datagen.TILE


@pytest.fixture(scope="module")
def one_tile(spark):
    yy, xx = np.mgrid[0:T, 0:T]
    px = (xx * 2.0 + yy * 3.0).astype(np.float32)
    return spark.createDataFrame(
        [("imgA", 0, 0, px.ravel().tolist())],
        "image_id string, tile_x int, tile_y int, px array<float>",
    ), px


def test_warp_affine_identity(spark, one_tile):
    df, px = one_tile
    ident = warp.Affine(1, 0, 0, 0, 1, 0)
    out = warp.warp_affine(df, ident, ident, method="nearest")
    got = np.asarray(out.first().px, dtype=np.float32).reshape(T, T)
    assert np.array_equal(got, px)


def test_warp_affine_shift_bilinear(spark, one_tile):
    df, px = one_tile
    ident = warp.Affine(1, 0, 0, 0, 1, 0)
    # source grid shifted by +0.5 px in x: dst pixel c samples src at c-0.5...
    src_t = warp.Affine(1, 0, 0.5, 0, 1, 0)
    out = warp.warp_affine(df, src_t, ident, method="bilinear")
    got = np.asarray(out.first().px, dtype=np.float32).reshape(T, T)
    # interior: linear surface -> exact interpolation of the shifted sample
    want = (np.mgrid[0:T, 0:T][1] - 0.5) * 2.0 + np.mgrid[0:T, 0:T][0] * 3.0
    interior = ~np.isnan(got)
    assert interior[1:-1, 1:-1].all()
    assert np.allclose(got[interior], want[interior], atol=1e-4)


def test_orthorectify_with_flat_dem_matches_affine(spark, one_tile):
    df, px = one_tile
    dem = df.selectExpr("image_id", "tile_x", "tile_y", "transform(px, x -> float(0.0)) as z")
    ident = warp.Affine(1, 0, 0, 0, 1, 0)
    # RPC that reduces to identity at h=0
    rpc = warp.RpcLite(c=(0, 1, 0, 0.001, 0, 0), r=(0, 0, 1, 0.002, 0, 0))
    out = warp.orthorectify(df, dem, rpc, ident, method="nearest")
    got = np.asarray(out.first().px, dtype=np.float32).reshape(T, T)
    assert np.array_equal(got, px)


def test_geocode_swath_nearest_and_idw(spark):
    # swath: dense deterministic points with value = closed fn of position
    pts = [(i, 1.0 + (i % 40) * 0.01, 45.0 + (i // 40) * 0.01, float((i % 40) + (i // 40)))
           for i in range(1600)]
    swath = spark.createDataFrame(pts, "point_id long, lon double, lat double, value double")
    grid = spark.createDataFrame(
        [(g, 1.0 + (g % 10) * 0.04 + 0.002, 45.0 + (g // 10) * 0.04 + 0.002) for g in range(100)],
        "grid_id long, lon double, lat double",
    )
    nn = warp.geocode_swath(swath, grid, k=1, res=9, k_cells=2, method="nearest")
    assert nn.count() == 100
    idw = warp.geocode_swath(swath, grid, k=4, res=9, k_cells=2, method="idw")
    rows = {r.grid_id: r.value for r in idw.collect()}
    assert len(rows) == 100
    # idw of a near-linear field stays within the local value range
    nnv = {r.grid_id: r.value for r in nn.collect()}
    for g in rows:
        assert abs(rows[g] - nnv[g]) < 3.0


def test_mosaic_first_wins(spark, one_tile):
    df, px = one_tile
    other = df.selectExpr("image_id", "tile_x", "tile_y", "transform(px, x -> float(-1.0)) as px")
    extra = spark.createDataFrame(
        [("imgA", 1, 0, [7.0] * (T * T))],
        "image_id string, tile_x int, tile_y int, px array<float>",
    )
    m = warp.mosaic([df, other.unionByName(extra)])
    rows = {(r.tile_x, r.tile_y): np.asarray(r.px) for r in m.collect()}
    assert len(rows) == 2
    assert np.array_equal(rows[(0, 0)].reshape(T, T), px)  # first source won
    assert rows[(1, 0)][0] == 7.0  # gap filled from second source


def _make_zip(files: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in files.items():
            z.writestr(name, content)
    return buf.getvalue()


def test_archive_scan(spark):
    z1 = _make_zip({"GRANULE/MTD_TL.xml": b"<xml/>", "GRANULE/IMG/B04.jp2": b"\x01" * 10})
    z2 = _make_zip({"metadata.xml": b"<m/>", "img/B08.jp2": b"\x02" * 5})
    df = spark.createDataFrame(
        [("a1", z1), ("a2", z2)], "archive_id string, bytes binary"
    )
    members = {(r.archive_id, r.member): r.size for r in archive.list_members(df).collect()}
    assert members[("a1", "GRANULE/IMG/B04.jp2")] == 10
    assert len(members) == 4
    got = archive.read_members(df, "*.jp2").collect()
    by = {(r.archive_id, r.member): bytes(r.content) for r in got}
    assert by[("a1", "GRANULE/IMG/B04.jp2")] == b"\x01" * 10
    assert by[("a2", "img/B08.jp2")] == b"\x02" * 5


def test_stac_items(spark):
    scenes = datagen.gen_scenes(spark, 5)
    fps = datagen.gen_footprints(spark, 5)
    out = stac.to_stac_items(scenes, fps).collect()
    assert len(out) == 5
    item = json.loads(out[0].stac_json)
    assert item["type"] == "Feature"
    assert item["properties"]["constellation"] in {"S2", "L8", "S1", "PLD"}
    assert "proj:epsg" in item["properties"]
    assert item["geometry_wkt"].startswith("POLYGON")


def test_stac_roundtrip_open(spark):
    """S7 read side: scenes -> to_stac_items -> open_stac_items == scenes
    (reference opens products from STAC items, reader.py:673-738)."""
    scenes = datagen.gen_scenes(spark, 10)
    fps = datagen.gen_footprints(spark, 10)
    items = stac.to_stac_items(scenes, fps)
    back = stac.open_stac_items(items)
    a = {r.image_id: r for r in scenes.collect()}
    b = {r.image_id: r for r in back.collect()}
    assert set(a) == set(b)
    for iid, r in b.items():
        s = a[iid]
        assert r.constellation == s.constellation
        assert r.product_type == s.product_type
        assert r.datetime.replace(microsecond=0) == s.datetime.replace(microsecond=0)
        assert r.pixel_size == s.pixel_size and r.crs_epsg == s.crs_epsg
        assert abs(r.lon - s.lon) < 1e-9 and abs(r.lat - s.lat) < 1e-9
        assert r.orbit_direction == s.orbit_direction
        assert r.cloud_cover == s.cloud_cover
        assert r.geom_wkt.startswith("POLYGON")


def test_affine_from_gcps_exact_and_lstsq(spark):
    """J5 GCP path: affine-consistent GCPs recover the transform (to float
    noise); a redundant noisy set still best-fits; < 3 points refuses."""
    import numpy as np
    import pytest as _pytest

    from eoreader_spark.operators.warp import Affine, affine_from_gcps

    true = Affine(2.0, 0.5, 100.0, -0.25, 3.0, -40.0)
    pts = [(0.0, 0.0), (50.0, 0.0), (0.0, 50.0), (37.0, 81.0), (12.0, 5.0)]
    gcps = []
    for c, r in pts:
        x, y = true.apply(np.array([c]), np.array([r]))
        gcps.append((c, r, float(x[0]), float(y[0])))
    fit = affine_from_gcps(gcps)
    for attr in "abcdef":
        assert abs(getattr(fit, attr) - getattr(true, attr)) < 1e-9
    # redundant + symmetric noise: mean-zero perturbation keeps the fit close
    noisy = [(c, r, x + (0.1 if i % 2 else -0.1), y) for i, (c, r, x, y) in enumerate(gcps[:4])]
    fit2 = affine_from_gcps(noisy)
    assert abs(fit2.a - true.a) < 0.05
    with _pytest.raises(ValueError):
        affine_from_gcps(gcps[:2])


def test_archive_scan_tar_and_targz(spark):
    """The reference's expensive case: tar (and tar.gz) members list and
    read in place through the same API as zip — format dispatched on magic
    bytes per archive row."""
    import gzip
    import io
    import tarfile

    def make_tar(members, compress=False):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            for name, content in members:
                info = tarfile.TarInfo(name)
                info.size = len(content)
                t.addfile(info, io.BytesIO(content))
        data = buf.getvalue()
        return gzip.compress(data) if compress else data

    t1 = make_tar([("LC08/B04.TIF", b"a" * 30), ("LC08/MTL.txt", b"meta")])
    t2 = make_tar([("ICEYE/VV.h5", b"z" * 17)], compress=True)
    df = spark.createDataFrame(
        [("t1", bytearray(t1)), ("t2", bytearray(t2))],
        "archive_id string, bytes binary",
    )
    members = {(r.archive_id, r.member): r.size for r in archive.list_members(df).collect()}
    assert members == {
        ("t1", "LC08/B04.TIF"): 30,
        ("t1", "LC08/MTL.txt"): 4,
        ("t2", "ICEYE/VV.h5"): 17,
    }
    got = {r.member: bytes(r.content) for r in archive.read_members(df, "*MTL*").collect()}
    assert got == {"LC08/MTL.txt": b"meta"}
    got2 = {r.member: bytes(r.content) for r in archive.read_members(df, "*.h5").collect()}
    assert got2 == {"ICEYE/VV.h5": b"z" * 17}


def test_archive_unknown_format_raises():
    """Corrupt/unknown payloads surface as a clear unsupported-format error,
    not an opaque tarfile.ReadError (round-4 ADVICE)."""
    from eoreader_spark.sources.archive import _members

    with pytest.raises(ValueError, match="unsupported archive format"):
        _members(b"\x89PNG not an archive" + b"\x00" * 400, want_content=False)


def test_geocode_bilinear_parallelogram_exact(spark):
    """J4 parity: on a sheared parallelogram swath the recovered (u, v) are
    bit-exact and the value is the exact 4-corner blend."""
    rows = [
        (line, s, s * 0.25 + line * 0.0625, line * 0.25, float((line * 13 + s * 7) % 50))
        for line in range(6) for s in range(6)
    ]
    swath = spark.createDataFrame(rows, "line int, sample int, lon double, lat double, value double")
    u, v, bl, bs = 0.75, 0.25, 1, 3

    def pos(line, s):
        return (s * 0.25 + line * 0.0625, line * 0.25)

    ax, ay = pos(bl, bs)
    bx, _ = pos(bl, bs + 1)
    cx, cy = pos(bl + 1, bs)
    px = ax + u * (bx - ax) + v * (cx - ax)
    py = ay + v * (cy - ay)
    grid = spark.createDataFrame([("g0", px, py)], "grid_id string, lon double, lat double")
    r = warp.geocode_swath_bilinear(swath, grid).first()
    assert (r.u, r.v) == (u, v)
    corners = [(bl, bs), (bl, bs + 1), (bl + 1, bs), (bl + 1, bs + 1)]
    vals = [(line * 13 + s * 7) % 50 for line, s in corners]
    want = (1 - u) * (1 - v) * vals[0] + u * (1 - v) * vals[1] + (1 - u) * v * vals[2] + u * v * vals[3]
    assert r.value == want


def test_geocode_bilinear_general_quad(spark):
    """Non-parallelogram cell: the quadratic inverse recovers (u, v) to
    float precision (checked against the forward bilinear mapping)."""
    # one irregular quad: A(0,0) B(1.0,0.1) C(0.2,1.0) D(1.3,1.2)
    quad = {(0, 0): (0.0, 0.0, 5.0), (0, 1): (1.0, 0.1, 9.0),
            (1, 0): (0.2, 1.0, 21.0), (1, 1): (1.3, 1.2, 33.0)}
    rows = [(line, s, x, y, val) for (line, s), (x, y, val) in quad.items()]
    swath = spark.createDataFrame(rows, "line int, sample int, lon double, lat double, value double")
    u, v = 0.3, 0.6
    ax, ay, va = quad[(0, 0)]
    bx, by, vb = quad[(0, 1)]
    cx, cy, vc = quad[(1, 0)]
    dx, dy, vd = quad[(1, 1)]
    px = ax + u * (bx - ax) + v * (cx - ax) + u * v * (dx - bx - cx + ax)
    py = ay + u * (by - ay) + v * (cy - ay) + u * v * (dy - by - cy + ay)
    grid = spark.createDataFrame([("g0", px, py)], "grid_id string, lon double, lat double")
    r = warp.geocode_swath_bilinear(swath, grid).first()
    assert abs(r.u - u) < 1e-9 and abs(r.v - v) < 1e-9
    want = (1 - u) * (1 - v) * va + u * (1 - v) * vb + (1 - u) * v * vc + u * v * vd
    assert abs(r.value - want) < 1e-9


def test_geocode_bilinear_outside_swath_drops(spark):
    rows = [(line, s, float(s), float(line), 1.0) for line in range(3) for s in range(3)]
    swath = spark.createDataFrame(rows, "line int, sample int, lon double, lat double, value double")
    grid = spark.createDataFrame(
        [("in", 0.5, 0.5), ("out", 40.0, 40.0)], "grid_id string, lon double, lat double"
    )
    got = {r.grid_id for r in warp.geocode_swath_bilinear(swath, grid).collect()}
    assert got == {"in"}


def test_geocode_bilinear_on_grid_point(spark):
    """A target exactly ON a swath point (u=v=0 corner): the shared-corner
    tie resolves deterministically and the value is the point's own."""
    rows = [
        (line, s, float(s), float(line), float(line * 10 + s))
        for line in range(3) for s in range(3)
    ]
    swath = spark.createDataFrame(rows, "line int, sample int, lon double, lat double, value double")
    grid = spark.createDataFrame([("g", 1.0, 1.0)], "grid_id string, lon double, lat double")
    r = warp.geocode_swath_bilinear(swath, grid).first()
    assert r.value == 11.0  # value at (line=1, sample=1)


def test_geocode_lut_reuse_multiband(spark):
    """J4 LUT reuse (ref s3_product.py:660-683: the bilinear resampler LUT
    is zarr-cached and reused for every band): geocode_bilinear_lut is
    built ONCE from geometry, a single two-band geocode_apply_lut returns
    exactly the per-band geocode_swath_bilinear answers, and the apply plan
    on a materialized LUT contains none of the build machinery — no Window
    (dedup winner), no quadratic-solve sqrt, no kNN anchor."""
    rows = [
        (line, s, s * 0.25 + line * 0.0625, line * 0.25,
         float((line * 13 + s * 7) % 50), float((line * 5 + s * 11) % 37))
        for line in range(6) for s in range(6)
    ]
    swath = spark.createDataFrame(
        rows, "line int, sample int, lon double, lat double, b1 double, b2 double"
    )
    grid = spark.createDataFrame(
        [("g0", 0.9, 0.4), ("g1", 1.1, 0.8), ("far", 99.0, 99.0)],
        "grid_id string, lon double, lat double",
    )
    lut = warp.geocode_bilinear_lut(swath, grid)
    # emulate the reference's cache: materialize once, reuse the rows
    lut_rows = lut.collect()
    assert {r.grid_id for r in lut_rows} == {"g0", "g1"}
    cached = spark.createDataFrame(lut_rows, lut.schema)

    both = warp.geocode_apply_lut(cached, swath, value_cols=("b1", "b2"))
    got = {r.grid_id: (r.b1, r.b2) for r in both.collect()}
    for band in ("b1", "b2"):
        one = swath.selectExpr("line", "sample", "lon", "lat", f"{band} as value")
        want = {r.grid_id: r.value for r in warp.geocode_swath_bilinear(one, grid).collect()}
        assert {g: got[g][0 if band == "b1" else 1] for g in got} == want

    plan = both._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "SQRT" not in plan.upper()


def test_stac_eo_view_extensions_roundtrip(spark):
    """S7 EO + View extensions (ref stac_extensions.py:62-183, 316-365):
    eo:bands structs come from the constellation's layout vocabulary,
    view:sun_elevation is 90 - zenith, items without angles omit the view
    properties, and everything survives the JSON round trip."""
    from eoreader_spark import bands as bands_mod

    scenes = datagen.gen_scenes(spark, 8)
    ids = [r.image_id for r in scenes.select("image_id").orderBy("image_id").collect()]
    view = spark.createDataFrame(
        [(ids[0], 123.0, 30.0, 45.0), (ids[1], 200.0, 55.0, None)],
        "image_id string, sun_az double, sun_zen double, off_nadir double",
    )
    items = stac.to_stac_items(scenes, view_angles=view)
    raw = {r.image_id: json.loads(r.stac_json) for r in items.collect()}
    p0 = raw[ids[0]]["properties"]
    assert p0["view:sun_azimuth"] == 123.0
    assert p0["view:sun_elevation"] == 60.0
    assert p0["view:off_nadir"] == 45.0
    const0 = p0["constellation"]
    want_bands = bands_mod.eo_bands_for(const0)
    assert [b["name"] for b in p0["eo:bands"]] == [n for n, _c, _w in want_bands]
    named = [b for b in p0["eo:bands"] if "common_name" in b]
    assert len(named) == sum(1 for _n, c, _w in want_bands if c)
    # items without a view row omit the view properties entirely
    assert "view:sun_azimuth" not in raw[ids[2]]["properties"]
    back = {r.image_id: r for r in stac.open_stac_items(items).collect()}
    assert back[ids[0]].sun_az == 123.0 and back[ids[0]].sun_el == 60.0
    assert back[ids[0]].off_nadir == 45.0 and back[ids[0]].view_az is None
    assert back[ids[2]].sun_az is None
    eb = back[ids[0]].eo_bands
    assert [b.name for b in eb] == [n for n, _c, _w in want_bands]
    wl = {b.name: b.center_wavelength for b in eb}
    for n, _c, w in want_bands:
        assert wl[n] == w
    # old items (no extension fields) still parse, with nulls
    legacy = stac.to_stac_items(scenes, eo_bands=False)
    lb = {r.image_id: r for r in stac.open_stac_items(legacy).collect()}
    assert lb[ids[0]].eo_bands is None and lb[ids[0]].sun_el is None


def test_geocode_bilinear_empty_swath_yields_empty(spark):
    """Round-7 ADVICE regression: an empty swath must flow through to an
    empty result (as before the round-6 bbox prefilter), not raise TypeError
    from float(None) on the all-None min/max aggregation row."""
    swath = spark.createDataFrame(
        [], "line int, sample int, lon double, lat double, value double"
    )
    grid = spark.createDataFrame(
        [("g0", 0.5, 0.5)], "grid_id string, lon double, lat double"
    )
    assert warp.geocode_swath_bilinear(swath, grid).count() == 0
    assert warp.geocode_bilinear_lut(swath, grid).count() == 0


def test_stac_static_catalog_roundtrip(spark, tmp_path):
    """Round-7 VERDICT #4: write_stac_catalog shards items into
    per-partition sub-collections; read_stac_catalog walks catalog.json ->
    child collections -> items and reparses every field exactly."""
    import json
    import os

    scenes = datagen.gen_scenes(spark, 40)
    items = stac.to_stac_items(scenes)
    root = str(tmp_path / "cat")
    n_colls = stac.write_stac_catalog(items.repartition(4), root)
    assert 1 <= n_colls <= 4
    assert os.path.exists(f"{root}/catalog.json")
    assert len(os.listdir(f"{root}/items")) == 40

    back = stac.read_stac_catalog(spark, root)
    direct = stac.open_stac_items(items)
    cols = ["image_id", "constellation", "product_type", "pixel_size",
            "crs_epsg", "lon", "lat", "orbit_direction", "cloud_cover"]
    got = {r.image_id: r for r in back.select(cols).collect()}
    want = {r.image_id: r for r in direct.select(cols).collect()}
    assert got == want

    # catalog dir, catalog.json path, and file:// all resolve
    assert stac.read_stac_catalog(spark, f"{root}/catalog.json").count() == 40
    assert stac.read_stac_catalog(spark, f"file://{root}").count() == 40

    # nested catalogs: a parent catalog whose child is the existing one
    parent = str(tmp_path / "parent")
    os.makedirs(parent)
    with open(f"{parent}/catalog.json", "w") as f:
        json.dump({"type": "Catalog", "stac_version": "1.0.0", "id": "p",
                   "description": "d",
                   "links": [{"rel": "child", "href": "../cat/catalog.json"}]}, f)
    assert stac.read_stac_catalog(spark, parent).count() == 40


def test_stac_catalog_corrupt_and_cycles(spark, tmp_path):
    import json
    import os

    root = str(tmp_path / "bad")
    os.makedirs(root)
    with open(f"{root}/catalog.json", "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt STAC"):
        stac.read_stac_catalog(spark, root)

    # missing child document -> named error
    with open(f"{root}/catalog.json", "w") as f:
        json.dump({"type": "Catalog", "stac_version": "1.0.0", "id": "c",
                   "description": "d",
                   "links": [{"rel": "child", "href": "./gone.json"}]}, f)
    with pytest.raises(ValueError, match="unreadable STAC"):
        stac.read_stac_catalog(spark, root)

    # child cycle (a <-> b) terminates and yields the empty frame
    with open(f"{root}/catalog.json", "w") as f:
        json.dump({"type": "Catalog", "stac_version": "1.0.0", "id": "a",
                   "description": "d",
                   "links": [{"rel": "child", "href": "./b.json"}]}, f)
    with open(f"{root}/b.json", "w") as f:
        json.dump({"type": "Catalog", "stac_version": "1.0.0", "id": "b",
                   "description": "d",
                   "links": [{"rel": "child", "href": "./catalog.json"}]}, f)
    out = stac.read_stac_catalog(spark, root)
    assert out.count() == 0
    assert "constellation" in out.columns
