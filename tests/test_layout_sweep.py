"""Round-4 constellation load-layout sweep.

Every constellation the reader can DETECT must also be LOADABLE: a layout
class (bands.CONSTELLATION_LAYOUT -> bands.LAYOUTS), a plane map whose names
all resolve in the vocabulary, and a working ImageEngine.load through the
constellation-tag dispatch.  Mirrors the reference's per-product band maps
(/root/reference/eoreader/products/optical/*.py, sar/*.py) without copying
them: plane orders were re-derived from the published band ids
(vantor_product.py:1209-1230, pneo_product.py:60-110, spot67_product.py:62-81,
spot45_product.py:326-379, gs2_product.py:236-257, re_product.py:146-167,
pla_product.py:256-294, s3_olci_product.py:203-435, landsat_product.py:446-716,
sar_product.py:209-241).
"""

from __future__ import annotations

import numpy as np
import pytest

from eoreader_spark import bands, datagen
from eoreader_spark.plans import loader
from eoreader_spark.sources import reader


def test_every_detected_constellation_is_loadable():
    tags = {c for c, _ in reader.NAME_PATTERNS} | {c for c, _ in reader.MEMBER_PATTERNS}
    for tag in tags:
        lay = bands.layout_for(tag)  # KeyError = detection-only constellation
        pm = bands.plane_of(lay)
        assert pm, (tag, lay)
        for name in pm:
            assert bands.resolve(name) == name, (tag, name)
        # plane indices are dense 0..n-1
        assert set(pm.values()) == set(range(bands.n_planes(lay))), (tag, lay)


def test_plane_names_primary_order():
    assert bands.plane_names("MAXAR_MUL") == [
        "CA", "BLUE", "GREEN", "YELLOW", "RED", "VRE_1", "NIR", "WV"
    ]
    assert bands.n_planes("S3_OLCI") == 21
    assert bands.n_planes("MAXAR_MUL") == 8
    assert bands.plane_names("LANDSAT_MSS") == ["GREEN", "RED", "VRE_1", "NIR"]


def test_reference_plane_ids():
    """Spot-check plane indices against the reference's published 1-based ids."""
    m = bands.plane_of("MAXAR_MUL")
    assert m["CA"] == 0 and m["YELLOW"] == 3 and m["WV"] == 7
    assert m["NARROW_NIR"] == m["NIR"] == 6  # shared file id (vantor:1220-1221)
    assert m["VRE_2"] == m["VRE_1"] == 5
    o = bands.plane_of("S3_OLCI")
    assert o["CA"] == 2 and o["GREEN_1"] == 4 and o["VRE_3"] == 15  # Oa03/Oa05/Oa16
    assert o["Oa21"] == 20 and o["NARROW_NIR"] == o["NIR"] == 16
    g = bands.plane_of("GS2_MS")
    assert g["NIR"] == 0 and g["BLUE"] == 3  # gs2: NIR=1..BLUE=4 (1-based)
    s = bands.plane_of("SPOT45_MS")
    assert s["NIR"] == 0 and s["SWIR_1"] == 3
    e = bands.plane_of("LANDSAT_ETM")
    assert e["PAN"] == 7 and e["TIR_1"] == e["TIR_2"] == 5


def test_sensor_mask_availability_new_layouts():
    assert "CLD" in bands.SENSOR_MASK_BANDS["PNEO_MS"]  # DIMAP v2 family
    assert "CLD" in bands.SENSOR_MASK_BANDS["SPOT67_MS"]
    assert bands.SENSOR_MASK_BANDS["RE_MS"] == frozenset({"UDM"})
    assert "QA_RADSAT" in bands.SENSOR_MASK_BANDS["LANDSAT_TM"]
    assert bands.SENSOR_MASK_BANDS["LANDSAT_MSS"] == frozenset({"QA_RADSAT"})
    assert "CLEAR" in bands.SENSOR_MASK_BANDS["PS_8B"]


def test_olci_aliases_match_reference():
    # s3_olci_product.py:203-435 eoreader_name per Oa channel
    assert bands.resolve("Oa03") == "CA"
    assert bands.resolve("Oa05") == "GREEN_1"
    assert bands.resolve("Oa07") == "YELLOW"
    assert bands.resolve("Oa11") == "VRE_1"
    assert bands.resolve("Oa16") == "VRE_3"
    assert bands.resolve("Oa13") == "Oa13"  # no canonical name: keeps its id
    assert bands.resolve("oa13") == "Oa13"


@pytest.mark.parametrize("tag", ["MAXAR", "PNEO", "S3_OLCI", "L7", "RCM", "RE"])
def test_load_via_constellation_tag(spark, tag):
    lay = bands.layout_for(tag)
    pm = bands.plane_of(lay)
    imgs = datagen.gen_images(spark, 2, layout=lay)
    eng = loader.ImageEngine(imgs, band_map=tag)
    assert eng.layout_name == lay
    req = ["NDVI"] if "NIR" in pm and "RED" in pm else [bands.plane_names(lay)[0]]
    df = eng.load(req, clean="raw")
    rows = df.limit(2).collect()
    assert rows and f"px_{loader.to_band(req[0])}" in df.columns


def test_aliased_plane_values_equal(spark):
    """NARROW_NIR and NIR share Maxar file id 7 -> identical decoded values."""
    imgs = datagen.gen_images(spark, 2, layout="MAXAR_MUL").filter("fmt = 'raw8'")
    eng = loader.ImageEngine(imgs, band_map="MAXAR")
    df = eng.load(["NIR", "NARROW_NIR"], clean="raw")
    for r in df.limit(4).collect():
        assert np.array_equal(np.asarray(r.px_NIR), np.asarray(r.px_NARROW_NIR))


def test_requesting_foreign_band_raises(spark):
    imgs = datagen.gen_images(spark, 2, layout="SPOT67_MS")
    eng = loader.ImageEngine(imgs, band_map="SPOT6")
    assert not eng.has_band("SWIR_1")  # SPOT6/7 has no SWIR channel
    assert not eng.has_band("DETFOO")  # S2 mask on a DIMAP product
    with pytest.raises(loader.BandError):
        eng.load(["SWIR_1"])
