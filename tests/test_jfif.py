"""Real baseline-JPEG codec (sources/jpegc.py): spec structure, round-trip
fidelity, determinism, and the distributed tile path."""

import struct

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.sources import jpegc


@pytest.mark.parametrize(
    "seed,h,w,p",
    [(0, 64, 64, 3), (3, 128, 64, 3), (7, 60, 52, 1), (11, 64, 128, 14)],
)
def test_roundtrip_psnr_above_gate(seed, h, w, p):
    """Shapes survive (incl. non-multiple-of-8 dims and 1/14 planes) and the
    default quality clears the BASELINE PSNR>=40dB invariant on the
    worst-case near-noise synthetic pattern."""
    img = codecs.make_image(seed, h, w, planes=p)
    back = jpegc.decode_jfif(jpegc.encode_jfif(img))
    assert back.shape == img.shape
    assert codecs.psnr(img, back) >= 40.0


def test_encode_deterministic_and_marker_structure():
    img = codecs.make_image(2, 64, 64, planes=3)
    a = jpegc.encode_jfif(img)
    assert a == jpegc.encode_jfif(img)
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in a[:24]
    # SOF0 present with 3 components, 8-bit, correct dims
    i = a.find(b"\xff\xc0")
    assert i > 0
    prec, hh, ww, nf = struct.unpack(">BHHB", a[i + 4 : i + 10])
    assert (prec, hh, ww, nf) == (8, 64, 64, 3)
    # exactly one DQT, one DC + one AC DHT, three single-component scans
    assert a.count(b"\xff\xdb") == 1
    assert a.count(b"\xff\xc4") == 2
    assert a.count(b"\xff\xda") == 3


def test_quality_tradeoff_monotone():
    img = codecs.make_image(5, 64, 64, planes=3)
    lo = jpegc.encode_jfif(img, quality=70)
    hi = jpegc.encode_jfif(img, quality=95)
    assert len(lo) < len(hi)
    assert codecs.psnr(img, jpegc.decode_jfif(lo)) < codecs.psnr(img, jpegc.decode_jfif(hi))
    # smooth content compresses far better than the noise pattern
    y, x = np.mgrid[0:64, 0:64]
    smooth = np.stack([((x + y) // 4).astype(np.uint8)] * 3)
    assert len(jpegc.encode_jfif(smooth)) < len(hi) // 4
    assert codecs.psnr(smooth, jpegc.decode_jfif(jpegc.encode_jfif(smooth))) >= 50.0


def test_progressive_and_interleaved_rejected():
    img = codecs.make_image(1, 64, 64, planes=3)
    data = bytearray(jpegc.encode_jfif(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        jpegc.decode_jfif(bytes(data))


def test_codec_table_dispatch_and_qjpg_coexistence():
    """fmt='jfif' routes to the real codec; legacy fmt='jpeg' (qjpg closed
    form) still decodes — the value-exact oracles depend on it."""
    img = codecs.make_image(4, 64, 64, planes=3)
    back = codecs.decode(codecs.encode(img, "jfif"), "jfif", 64, 64)
    assert codecs.psnr(img, back) >= 40.0
    q = codecs.decode(codecs.encode(img, "jpeg"), "jpeg", 64, 64)
    assert np.array_equal(q, np.clip(np.round(img.astype(np.float32) / 3).astype(np.int32) * 3, 0, 255))


def test_distributed_tile_decode_matches_local(spark):
    """tiles_from_images over jfif payloads == local numpy decode, exactly,
    at any partitioning (the determinism the gate query relies on)."""
    from eoreader_spark.operators import raster

    rows = []
    want = {}
    for j in range(4):
        img = codecs.make_image(j, 64, 64, planes=3)
        data = codecs.encode(img, "jfif")
        rows.append((f"im{j}", bytearray(data), 64, 64, "jfif"))
        want[f"im{j}"] = codecs.decode(data, "jfif", 64, 64)[1].astype(np.float32)
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    for parts in (1, 4):
        tiles = raster.tiles_from_images(images.repartition(parts), plane=1).collect()
        assert len(tiles) == 4
        for r in tiles:
            assert np.array_equal(
                np.asarray(r.px, dtype=np.float32), want[r.image_id].ravel()
            )
