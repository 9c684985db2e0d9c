"""Pure-python GeoTIFF codec (sources/geotiff.py): byte-level round-trip,
geo tags, and the codecs-table integration (no Spark needed)."""

import numpy as np
import pytest

from eoreader_spark import codecs
from eoreader_spark.sources import geotiff


def test_geotiff_roundtrip_uint8_multiplane():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (4, 33, 57), dtype=np.uint8)
    data = geotiff.encode_geotiff(img, pixel_scale=(10.0, 10.0), origin=(600000.0, 4500000.0), epsg=32633)
    out, meta = geotiff.decode_geotiff(data)
    assert np.array_equal(out, img)
    assert meta["pixel_scale"] == (10.0, 10.0)
    assert meta["origin"] == (600000.0, 4500000.0)
    assert meta["epsg"] == 32633
    # classic little-endian TIFF magic — a real container, not a custom blob
    assert data[:4] == b"II\x2a\x00"


def test_geotiff_roundtrip_uint16():
    img = (np.arange(2 * 8 * 9, dtype=np.uint16) * 257 % 65536).reshape(2, 8, 9).astype(np.uint16)
    out, _ = geotiff.decode_geotiff(geotiff.encode_geotiff(img))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_geotiff_in_codec_table():
    img = codecs.make_image(3, 64, 64, planes=3)
    data = codecs.encode(img, "tiff")
    back = codecs.decode(data, "tiff", 64, 64)
    assert np.array_equal(back, img)
    assert codecs.psnr(img, back) == float("inf")  # lossless


def test_geotiff_rejects_compressed_and_bad_magic():
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(b"MM\x00\x2a" + b"\x00" * 16)
    img = np.zeros((1, 4, 4), dtype=np.uint8)
    data = bytearray(geotiff.encode_geotiff(img))
    # flip the Compression tag value to 5 (LZW) and expect a refusal
    import struct
    (ifd_off,) = struct.unpack("<I", bytes(data[4:8]))
    (n,) = struct.unpack("<H", bytes(data[ifd_off:ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, = struct.unpack("<H", bytes(data[e:e + 2]))
        if tag == 259:
            data[e + 8] = 5
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(bytes(data))
