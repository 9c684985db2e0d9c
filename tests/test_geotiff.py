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


# ------------------------------------------------------ round-4 compression
def test_lzw_roundtrip_boundaries():
    """TIFF LZW early-change codec: 9->10->11->12-bit width bumps and the
    4094 table reset all round-trip."""
    rng = np.random.RandomState(0)
    for n in (252, 253, 254, 300, 1000, 5000, 40000):
        data = bytes(rng.randint(0, 256, size=n).tolist())
        assert geotiff._lzw_decode(geotiff._lzw_encode(data)) == data, n
    rep = b"abcab" * 40000  # crosses several table resets
    assert geotiff._lzw_decode(geotiff._lzw_encode(rep)) == rep


def test_compressed_geotiff_roundtrips():
    rng = np.random.RandomState(1)
    for dtype in (np.uint8, np.uint16):
        for comp in ("lzw", "deflate"):
            for pred in (False, True):
                img = rng.randint(
                    0, 255 if dtype == np.uint8 else 65535, size=(3, 70, 90)
                ).astype(dtype)
                b = geotiff.encode_geotiff(img, compression=comp, predictor=pred)
                out, meta = geotiff.decode_geotiff(b)
                assert out.dtype == dtype and np.array_equal(out, img)


def test_predictor_compresses_smooth_rasters():
    """The reason the reference writes LZW+predictor: smooth rasters (DEMs,
    reflectance) become tiny runs after horizontal differencing."""
    smooth = (np.mgrid[0:256, 0:512][0] % 251).astype(np.uint8)[None]
    plain = geotiff.encode_geotiff(smooth)
    lzw = geotiff.encode_geotiff(smooth, compression="lzw", predictor=True)
    assert len(lzw) < len(plain) / 20
    assert np.array_equal(geotiff.decode_geotiff(lzw)[0], smooth)


def test_unknown_compression_rejected():
    img = np.zeros((1, 8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="unsupported compression"):
        geotiff.encode_geotiff(img, compression="jpeg")
