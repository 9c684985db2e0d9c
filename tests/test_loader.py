import numpy as np
import pytest

from eoreader_spark import codecs, datagen
from eoreader_spark.plans import loader

N = 12


@pytest.fixture(scope="module")
def engine(spark):
    images = datagen.gen_images(spark, N).persist()
    qa = datagen.gen_qa_masks(spark, N).persist()
    dem = datagen.gen_dem(spark, N).persist()
    return loader.ImageEngine(images, qa_masks=qa, dem=dem)


def test_to_band_aliases():
    assert loader.to_band("B04") == "RED"
    assert loader.to_band("04") == "RED"
    assert loader.to_band("red") == "RED"
    assert loader.to_band("ndvi") == "NDVI"
    assert loader.to_band("SLOPE") == "SLOPE"
    with pytest.raises(loader.BandError):
        loader.to_band("B99")


def test_classify_and_dedup():
    plan = loader.classify(["RED", "B04", "NDVI", "SLOPE", "CLOUD_MASK"])
    assert plan.order == ["RED", "NDVI", "SLOPE", "CLOUD_MASK"]  # U4 dedup
    assert plan.spectral == ["RED"]
    assert plan.indices == ["NDVI"]
    assert plan.needed_planes == [0, 2]  # RED + NIR for NDVI


def test_has_band(spark):
    images = datagen.gen_images(spark, 2)
    bare = loader.ImageEngine(images)  # no side tables
    assert bare.has_band("RED") and bare.has_band("NDVI")
    assert not bare.has_band("SLOPE") and not bare.has_band("CLOUD_MASK")
    assert not bare.has_band("NOPE")


def test_load_end_to_end(spark, engine):
    wide = engine.load(["RED", "NDVI", "DEM", "SLOPE", "CLOUD_MASK"], clean="raw")
    cols = wide.columns
    assert cols == ["image_id", "tile_x", "tile_y", "px_RED", "px_NDVI",
                    "px_DEM", "px_SLOPE", "px_CLOUD_MASK"]
    rows = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").collect()
    assert len(rows) == 1
    r = rows[0]
    t = datagen.TILE
    red_dn = codecs.pixel_plane(0, 0, t, t).astype(np.float64)
    nir_dn = codecs.pixel_plane(0, 2, t, t).astype(np.float64)
    red = np.clip(red_dn / 255.0, 0, None)
    nir = np.clip(nir_dn / 255.0, 0, None)
    assert np.allclose(np.asarray(r.px_RED).reshape(t, t), red, atol=1e-6)
    want_ndvi = (nir - red) / (nir + red + 1e-12)
    assert np.allclose(np.asarray(r.px_NDVI).reshape(t, t), want_ndvi, atol=1e-5)
    # DEM closed form
    yy, xx = np.mgrid[0:t, 0:t]
    assert np.allclose(
        np.asarray(r.px_DEM).reshape(t, t), 100 * np.sin(xx / 5.0) + 2.0 * yy, atol=1e-3
    )
    # mask is the cloud bit of the closed-form qa
    p0 = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    assert np.array_equal(np.asarray(r.px_CLOUD_MASK).reshape(t, t), (p0 > 200).astype(int))


def test_load_clean_masks_invalid(spark, engine):
    wide = engine.load(["RED"], clean="clean", reflectance=False)
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    p0 = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    invalid = (p0 % 97 == 0) | (p0 % 89 == 0) | (p0 > 250)
    got = np.asarray(r.px_RED, dtype=np.float64).reshape(t, t)
    assert np.isnan(got[invalid]).all()
    assert np.array_equal(got[~invalid], p0[~invalid].astype(np.float64))


def test_load_window_prunes_tiles(spark, engine):
    all_tiles = engine.load(["RED"], clean="raw").count()
    windowed = engine.load(["RED"], clean="raw", window=(0, 0, 0, 0))
    assert windowed.count() == N  # one tile per image
    assert windowed.count() < all_tiles
    assert windowed.select("tile_x", "tile_y").distinct().collect()[0][0:2] == (0, 0)


def test_stack_uint16(spark, engine):
    st = engine.stack(["RED", "NDVI"], as_uint16=True, clean="raw")
    r = st.first()
    red = np.asarray(r.px_RED)
    assert red.dtype.kind == "i"
    assert red.min() >= 0 and red.max() <= 65535


def test_invalid_band_raises(spark, engine):
    with pytest.raises(loader.BandError):
        engine.load(["RED", "BOGUS"])


def test_despeckle_band_routing(spark, engine):
    # P8: RED_DSPK pulls in RED and runs the Lee stencil keyed to tile rows
    assert loader.to_band("red_dspk") == "RED_DSPK"
    plan = loader.classify(["RED_DSPK"])
    assert plan.despeckle == ["RED"] and plan.needed_planes == [0]
    wide = engine.load(["RED", "RED_DSPK"], clean="raw", reflectance=False)
    assert wide.columns[-2:] == ["px_RED", "px_RED_DSPK"]
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    raw = np.asarray(r.px_RED)
    dspk = np.asarray(r.px_RED_DSPK)
    assert dspk.shape == raw.shape and np.isfinite(dspk).all()
    # despeckle smooths: variance must not increase
    assert dspk.std() <= raw.std() + 1e-3


def test_registry_index_fallback_and_errors(spark, engine):
    # registry-only indices (no JVM expr) load via the pandas-UDF fallback
    wide = engine.load(["DVI", "OSAVI"], clean="raw")
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    img = codecs.make_image(0, t, t).astype(np.float64)
    red = np.clip(img[0] / 255.0, 0, None)
    nir = np.clip(img[2] / 255.0, 0, None)
    assert np.allclose(np.asarray(r.px_DVI).reshape(t, t), nir - red, atol=1e-5)
    assert np.allclose(
        np.asarray(r.px_OSAVI).reshape(t, t), (nir - red) / (nir + red + 0.16), atol=1e-5
    )
    # user-registered lowercase name resolves verbatim
    from eoreader_spark.functions import indices as idx

    idx.register_index("myidx", ["RED"], lambda b: b["RED"] * 2.0)
    try:
        assert loader.to_band("myidx") == "myidx"
        got = engine.load(["myidx"], clean="raw").first()
        assert got is not None
    finally:
        del idx.INDEX_REGISTRY["myidx"]
    # invalid combos fail with BandError, not KeyError
    idx.register_index("DEMIDX", ["DEM"], lambda b: b["DEM"])
    try:
        with pytest.raises(loader.BandError):
            engine.load(["DEMIDX"])
    finally:
        del idx.INDEX_REGISTRY["DEMIDX"]
    with pytest.raises(loader.BandError):
        loader.to_band("NDVI_DSPK")  # despeckle needs a spectral base


def test_mean_sun_angles_grid_aggregate(spark):
    """A5: per-image mean over the full angle GRIDS; azimuth uses the
    circular mean so north-straddling grids (odd images, base 355) don't
    average to ~180 (reference optical_product.py:467-501)."""
    from eoreader_spark.operators import raster

    grids = datagen.gen_angle_grids(spark, 4)
    got = {r.image_id: r for r in raster.mean_sun_angles(grids).collect()}
    for i in range(4):
        h, w = datagen.image_dims(i)
        gy, gx = np.mgrid[0 : (h // datagen.TILE) * datagen.TILE,
                          0 : (w // datagen.TILE) * datagen.TILE]
        base = 355.0 if i % 2 else 140.0
        saa = (base + 0.01 * gx - 0.02 * gy) % 360.0
        sza = (20.0 + 10.0 * np.sin(gx / 40.0) + 0.01 * gy).astype(np.float32)
        s = np.sin(np.radians(saa.astype(np.float32).astype(np.float64)))
        c = np.cos(np.radians(saa.astype(np.float32).astype(np.float64)))
        want_az = (np.degrees(np.arctan2(s.sum(), c.sum())) + 360.0) % 360.0
        r = got[f"img{i:012d}"]
        assert abs(r.mean_azimuth - want_az) < 1e-4, i
        assert abs(r.mean_zenith - float(sza.astype(np.float64).mean())) < 1e-4, i
        if i % 2:  # north-straddling: circular mean near 0/360, NOT ~180
            assert r.mean_azimuth > 300 or r.mean_azimuth < 60


def test_per_band_mask_association(spark):
    """J7: a qa table with a `band` column joins each plane its OWN mask
    (composite key), so RED and NIR get different invalid sets; product-level
    masks become the cross-band union."""
    images = datagen.gen_images(spark, 4)
    band_qa = datagen.gen_band_qa_masks(spark, 4)
    eng = loader.ImageEngine(images, qa_masks=band_qa)
    wide = eng.load(["RED", "NIR", "ALL_MASK"], clean="clean", reflectance=False)
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    for band, plane in (("RED", 0), ("NIR", 2)):
        p = codecs.pixel_plane(0, plane, t, t).astype(np.int32)
        invalid = (p % 97 == 0) | (p % 89 == 0) | (p > 250)
        got = np.asarray(getattr(r, f"px_{band}"), dtype=np.float64).reshape(t, t)
        assert np.isnan(got[invalid]).all(), band
        assert np.array_equal(got[~invalid], p[~invalid].astype(np.float64)), band
    # the two bands' invalid sets genuinely differ (different planes)
    p_red = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    p_nir = codecs.pixel_plane(0, 2, t, t).astype(np.int32)
    inv_red = (p_red % 97 == 0) | (p_red % 89 == 0) | (p_red > 250)
    inv_nir = (p_nir % 97 == 0) | (p_nir % 89 == 0) | (p_nir > 250)
    assert (inv_red != inv_nir).any()
    # ALL_MASK = union across bands of all 5 bits
    def qa_of(p):
        return ((p % 97 == 0).astype(int) | ((p % 89 == 0).astype(int) << 1)
                | ((p > 250).astype(int) << 2) | ((p > 200).astype(int) << 5)
                | ((p < 10).astype(int) << 6))
    qa_u = qa_of(p_red) | qa_of(codecs.pixel_plane(0, 1, t, t).astype(np.int32)) | qa_of(p_nir)
    want_all = ((qa_u & 0b1100111) != 0).astype(int)
    got_all = np.asarray(r.px_ALL_MASK).reshape(t, t)
    assert np.array_equal(got_all, want_all)


def test_qa_pixel_raw_band(spark, engine):
    """QA_PIXEL/BQA loads the raw QA bitfield as its own plane (Landsat
    landsat_product.py:1445-1514)."""
    assert loader.to_band("BQA") == "QA_PIXEL"
    wide = engine.load(["RED", "QA_PIXEL"], clean="raw", reflectance=False)
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    p0 = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    want = (
        (p0 % 97 == 0).astype(np.int32)
        | ((p0 % 89 == 0).astype(np.int32) << 1)
        | ((p0 > 250).astype(np.int32) << 2)
        | ((p0 > 200).astype(np.int32) << 5)
        | ((p0 < 10).astype(np.int32) << 6)
    )
    assert np.array_equal(np.asarray(r.px_QA_PIXEL).reshape(t, t), want)


def test_clean_masks_survive_reflectance(spark, engine):
    """P4xP6 interaction: masked pixels must stay invalid THROUGH the
    reflectance clip (greatest() skips nulls, which silently resurrected
    masked pixels as 0.0 before the round-2 fix)."""
    wide = engine.load(["RED", "NDVI"], clean="clean")  # reflectance=True
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    p0 = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    invalid = (p0 % 97 == 0) | (p0 % 89 == 0) | (p0 > 250)
    red = np.asarray(r.px_RED, dtype=np.float64).reshape(t, t)
    ndvi = np.asarray(r.px_NDVI, dtype=np.float64).reshape(t, t)
    assert np.isnan(red[invalid]).all()
    assert np.isnan(ndvi[invalid]).all()
    assert np.isfinite(red[~invalid]).all()


def test_sensor_mask_vocabulary_availability(spark):
    """Per-sensor mask bands (band_names.py:569-835 analog): names resolve,
    availability is gated by BOTH the layout class and the qa side table,
    and a foreign mask refuses to load."""
    from pyspark.sql import functions as F

    images = datagen.gen_images(spark, 2, layout="S2_L2A").filter(F.col("fmt") == "raw8")
    qa = datagen.gen_qa_masks(spark, 2)
    s2 = loader.ImageEngine(images, qa_masks=qa, band_map="S2_L2A")
    s2_dry = loader.ImageEngine(images, band_map="S2_L2A")  # no qa table
    l8 = loader.ImageEngine(datagen.gen_images(spark, 2, layout="L8_OLI"),
                            qa_masks=qa, band_map="L8_OLI")

    # resolution: case-insensitive, verbatim canonical names
    assert loader.to_band("cldprb") == "CLDPRB"
    assert loader.to_band("MSK_CLASSI_OPAQUE") == "MSK_CLASSI_OPAQUE"
    # S2 masks exist on the S2 engine WITH qa...
    for m in ("DETFOO", "TECQUA", "CLDPRB", "SNWPRB", "MSK_CLASSI_OPAQUE"):
        assert s2.has_band(m), m
        assert not s2_dry.has_band(m), m  # ...not without the side table
        assert not l8.has_band(m), m      # ...and not on a Landsat product
    # Landsat masks are the converse
    for m in ("QA_RADSAT", "SR_QA_AEROSOL", "ST_QA"):
        assert l8.has_band(m) and not s2.has_band(m), m
    # loading a foreign mask raises the band-availability error
    with pytest.raises(loader.BandError):
        l8.load(["CLDPRB"], clean="raw")

    # derivation semantics: CLDPRB is 0/100 on the cloud bit; DETFOO is the
    # INVERSE of the nodata bit (clear-where-valid)
    wide = s2.load(["CLDPRB", "DETFOO"], clean="raw")
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    t = datagen.TILE
    p0 = codecs.pixel_plane(0, 0, t, t).astype(np.int32)
    assert np.array_equal(
        np.asarray(r.px_CLDPRB).reshape(t, t), (p0 > 200).astype(int) * 100
    )
    assert np.array_equal(
        np.asarray(r.px_DETFOO).reshape(t, t), (p0 % 97 != 0).astype(int)
    )


def test_slstr_view_coefficient_sets(spark):
    """F5: the same product under view 'n' vs 'o' diverges by exactly the
    per-(band, view) coefficient ratio; BT channels pass through unchanged
    (s3_slstr_product.py:801-850 analog, S3.PN-SLSTR-L1.08 table)."""
    from pyspark.sql import functions as F

    from eoreader_spark.functions import radiometry

    images = datagen.gen_images(spark, 2, layout="S3_SLSTR").filter(F.col("fmt") == "raw8")
    wides = {}
    for view in ("n", "o"):
        eng = loader.ImageEngine(
            images, band_map="S3_SLSTR", view=view, rad_adjust="S3_PN_SLSTR_L1_08"
        )
        wides[view] = (
            eng.load(["GREEN", "TIR_1"], clean="raw")
            .filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0")
            .first()
        )
    g_n = np.asarray(wides["n"].px_GREEN)
    g_o = np.asarray(wides["o"].px_GREEN)
    # GREEN = S1: n coef 0.97, o coef 0.94 — exact per-pixel ratio of plain dn/255
    dn = codecs.pixel_plane(0, 0, datagen.TILE, datagen.TILE).astype(np.float64) / 255.0
    assert np.array_equal(g_n, (dn * 0.97).ravel())
    assert np.array_equal(g_o, (dn * 0.94).ravel())
    # TIR_1 has no entry in the set -> identical across views (pass-through)
    assert np.array_equal(np.asarray(wides["n"].px_TIR_1), np.asarray(wides["o"].px_TIR_1))
    # the named-set lookup itself
    assert radiometry.rad_adjust_coef("S5", "o") == 1.04
    assert radiometry.rad_adjust_coef("S9", "o") == 1.0  # unknown id
    assert radiometry.rad_adjust_coef("S1", "n", "NONE") == 1.0


def test_vector_mask_cleaning(spark):
    """P5 vector variant (round 4): WKT polygons NaN-out their interior on
    every decoded plane — the S2 < PB04.00 GML-mask analog
    (s2_product.py:1214-1280).  Half-integer rectangle edges make the
    expected pixel set exact."""
    images = datagen.gen_images(spark, 4).filter("fmt = 'raw8'")
    vm = spark.createDataFrame(
        [("img000000000000", "POLYGON((2.5 1.5, 10.5 1.5, 10.5 6.5, 2.5 6.5, 2.5 1.5))")],
        "image_id string, wkt string",
    )
    eng = loader.ImageEngine(images, vector_masks=vm)
    wide = eng.load(["RED", "GREEN"], clean="vector", reflectance=False)
    r = wide.filter("image_id = 'img000000000000' and tile_x = 0 and tile_y = 0").first()
    red = np.asarray(r.px_RED).reshape(64, 64)
    grn = np.asarray(r.px_GREEN).reshape(64, 64)
    want = np.zeros((64, 64), dtype=bool)
    want[2:7, 3:11] = True  # strict interior of the half-integer rect
    assert np.array_equal(np.isnan(red), want)
    assert np.array_equal(np.isnan(grn), want)  # same mask on every plane
    # the other image has no polygons -> untouched
    r2 = wide.filter("image_id = 'img000000000003' and tile_x = 0 and tile_y = 0").first()
    assert not np.isnan(np.asarray(r2.px_RED)).any()


def test_clean_vector_requires_vector_masks(spark):
    images = datagen.gen_images(spark, 2).filter("fmt = 'raw8'")
    eng = loader.ImageEngine(images)
    with pytest.raises(loader.BandError, match="vector_masks"):
        eng.load(["RED"], clean="vector")
