"""Minimal REAL GeoTIFF codec (uncompressed, planar, 8/16-bit) in pure
numpy — no rasterio/libtiff in the container, but the TIFF 6.0 container
format itself is simple enough to read and write directly, which closes the
'real raster containers are substituted' gap for the uncompressed case.

Reference behavior mirrored: the reference reads every product band through
rasterio/GDAL from GeoTIFF/JP2 containers and exposes transform + CRS
(/root/reference/eoreader/products/product.py:1334-1420 `utils.read`,
/root/reference/eoreader/utils.py:137-239).  Here the same role: a byte-level
container with geo-referencing tags (ModelPixelScale + ModelTiepoint +
GeoKeyDirectory EPSG), decodable to the engine's (planes, h, w) arrays.

Format choices (all within the TIFF 6.0 / GeoTIFF 1.1 public specs):
- little-endian classic TIFF, single IFD
- Compression=1 (none), PlanarConfiguration=2 (one strip per plane)
- BitsPerSample 8 or 16, SampleFormat unsigned
- GeoTIFF tags: 33550 ModelPixelScaleTag (sx, sy, 0), 33922
  ModelTiepointTag (0,0,0, x0, y0, 0), 34735 GeoKeyDirectoryTag carrying
  ProjectedCSTypeGeoKey (3072) = EPSG code
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II"
_MAGIC = 42

# TIFF tag ids
T_WIDTH, T_HEIGHT, T_BPS, T_COMP, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFF, T_SPP, T_RPS, T_STRIP_CNT, T_PLANAR, T_SFMT = 273, 277, 278, 279, 284, 339
T_PIXSCALE, T_TIEPOINT, T_GEOKEYS = 33550, 33922, 34735

# TIFF field types
TY_SHORT, TY_LONG, TY_DOUBLE = 3, 4, 12
_TY_SIZE = {TY_SHORT: 2, TY_LONG: 4, TY_DOUBLE: 8}
_TY_FMT = {TY_SHORT: "H", TY_LONG: "I", TY_DOUBLE: "d"}


def encode_geotiff(
    img: np.ndarray,
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    origin: tuple[float, float] = (0.0, 0.0),
    epsg: int = 32631,
) -> bytes:
    """(planes, h, w) uint8/uint16 -> GeoTIFF bytes (uncompressed planar)."""
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[None, :, :]
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"unsupported dtype {img.dtype} (uint8/uint16 only)")
    p, h, w = img.shape
    bps = 8 * img.dtype.itemsize
    plane_bytes = h * w * img.dtype.itemsize
    data = b"".join(img[i].astype(f"<u{img.dtype.itemsize}").tobytes() for i in range(p))

    # layout: header(8) | pixel data | IFD | out-of-line arrays
    data_off = 8
    ifd_off = data_off + len(data)
    entries: list[tuple[int, int, int, bytes | int]] = []

    def arr(ty: int, values) -> bytes:
        return struct.pack("<" + _TY_FMT[ty] * len(values), *values)

    strip_offsets = [data_off + i * plane_bytes for i in range(p)]
    geokeys = [1, 1, 0, 1, 3072, 0, 1, int(epsg)]  # version 1.1.0, 1 key
    entries = [
        (T_WIDTH, TY_LONG, 1, w),
        (T_HEIGHT, TY_LONG, 1, h),
        (T_BPS, TY_SHORT, p, arr(TY_SHORT, [bps] * p)),
        (T_COMP, TY_SHORT, 1, 1),
        (T_PHOTO, TY_SHORT, 1, 1),
        (T_STRIP_OFF, TY_LONG, p, arr(TY_LONG, strip_offsets)),
        (T_SPP, TY_SHORT, 1, p),
        (T_RPS, TY_LONG, 1, h),
        (T_STRIP_CNT, TY_LONG, p, arr(TY_LONG, [plane_bytes] * p)),
        (T_PLANAR, TY_SHORT, 1, 2),
        (T_SFMT, TY_SHORT, p, arr(TY_SHORT, [1] * p)),
        (T_PIXSCALE, TY_DOUBLE, 3, arr(TY_DOUBLE, [pixel_scale[0], pixel_scale[1], 0.0])),
        (
            T_TIEPOINT, TY_DOUBLE, 6,
            arr(TY_DOUBLE, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0]),
        ),
        (T_GEOKEYS, TY_SHORT, len(geokeys), arr(TY_SHORT, geokeys)),
    ]
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    extra_off = ifd_off + ifd_size
    ifd = struct.pack("<H", n)
    extra = b""
    for tag, ty, count, val in entries:
        if isinstance(val, bytes):
            if len(val) <= 4:
                packed = val.ljust(4, b"\x00")
            else:
                packed = struct.pack("<I", extra_off + len(extra))
                extra += val
        else:
            packed = struct.pack("<I", int(val))
        ifd += struct.pack("<HHI", tag, ty, count) + packed
    ifd += struct.pack("<I", 0)  # no next IFD

    header = _II + struct.pack("<HI", _MAGIC, ifd_off)
    return header + data + ifd + extra


def _read_values(buf: bytes, ty: int, count: int, raw: bytes) -> list:
    size = _TY_SIZE[ty] * count
    if size <= 4:
        payload = raw[:size]
    else:
        (off,) = struct.unpack("<I", raw)
        payload = buf[off : off + size]
    return list(struct.unpack("<" + _TY_FMT[ty] * count, payload))


def decode_geotiff(data: bytes) -> tuple[np.ndarray, dict]:
    """GeoTIFF bytes -> ((planes, h, w) array, geo metadata dict)."""
    if data[:2] != _II or struct.unpack("<H", data[2:4])[0] != _MAGIC:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, ty, count = struct.unpack("<HHI", data[e : e + 8])
        tags[tag] = _read_values(data, ty, count, data[e + 8 : e + 12])

    w, h = int(tags[T_WIDTH][0]), int(tags[T_HEIGHT][0])
    p = int(tags.get(T_SPP, [1])[0])
    bps = int(tags[T_BPS][0])
    if int(tags.get(T_COMP, [1])[0]) != 1:
        raise ValueError("only uncompressed TIFF supported")
    if int(tags.get(T_PLANAR, [1])[0]) != 2 and p > 1:
        raise ValueError("only planar configuration supported for multi-band")
    dt = np.uint8 if bps == 8 else np.uint16
    offsets = [int(o) for o in tags[T_STRIP_OFF]]
    counts = [int(c) for c in tags[T_STRIP_CNT]]
    planes = [
        np.frombuffer(data[o : o + c], dtype=f"<u{bps // 8}").reshape(h, w)
        for o, c in zip(offsets, counts)
    ]
    img = np.stack(planes).astype(dt)

    meta: dict = {}
    if T_PIXSCALE in tags:
        meta["pixel_scale"] = (tags[T_PIXSCALE][0], tags[T_PIXSCALE][1])
    if T_TIEPOINT in tags:
        tp = tags[T_TIEPOINT]
        meta["origin"] = (tp[3], tp[4])
    if T_GEOKEYS in tags:
        g = tags[T_GEOKEYS]
        # key entries follow the 4-short header: (key, location, count, value)
        for k in range(4, len(g), 4):
            if g[k] == 3072:
                meta["epsg"] = int(g[k + 3])
    return img, meta
