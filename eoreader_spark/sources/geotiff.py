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
import zlib

import numpy as np

from eoreader_spark.codecs import corrupt_guard

_II = b"II"
_MAGIC = 42

# TIFF tag ids
T_WIDTH, T_HEIGHT, T_BPS, T_COMP, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFF, T_SPP, T_RPS, T_STRIP_CNT, T_PLANAR, T_SFMT = 273, 277, 278, 279, 284, 339
T_PRED = 317
T_PIXSCALE, T_TIEPOINT, T_GEOKEYS = 33550, 33922, 34735

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "zlib": 8}

# ------------------------------------------------------------------ TIFF LZW
# TIFF 6.0 §13 LZW with the TTN2 "early change" convention: MSB-first
# variable-width codes starting at 9 bits, ClearCode 256 / EOI 257, code
# width bumps when the next free code reaches (1 << width) - 1 (one earlier
# than the GIF convention), table reset at 4094.  The reference writes this
# exact codec through GDAL (eoreader/utils.py:264-299 'LZW' + predictor 2).
_CLEAR, _EOI = 256, 257


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def reset() -> tuple[dict, int]:
        return {bytes([i]): i for i in range(256)}, 258

    table, next_code = reset()
    emit(_CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([b])
        if next_code >= 4094:
            emit(table[w])
            emit(_CLEAR)
            width = 9
            table, next_code = reset()
            w = b""
    if w:
        emit(table[w])
        # the decoder appends one entry AFTER the flush code, so its width
        # check runs once more before reading EOI; mirror it exactly or an
        # EOI landing on the bump boundary is read at the stale width
        if next_code >= (1 << width) - 2 and width < 12:
            width += 1
    emit(_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    pos = 0

    def read_code() -> int:
        nonlocal bitbuf, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # the decoder's insertions lag the encoder's by one code, so its
        # early-change boundary is one lower: (1 << width) - 2
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _predict(plane: np.ndarray) -> np.ndarray:
    """Predictor=2 horizontal differencing per SAMPLE (16-bit diffs apply to
    sample values, not bytes), modular wrap in the sample dtype."""
    d = plane.astype(np.int64)
    out = d.copy()
    out[:, 1:] = d[:, 1:] - d[:, :-1]
    return out.astype(plane.dtype)  # wraps mod 2^bps


def _unpredict(plane: np.ndarray) -> np.ndarray:
    mod = 1 << (8 * plane.dtype.itemsize)
    acc = np.cumsum(plane.astype(np.int64), axis=1) % mod
    return acc.astype(plane.dtype)

# TIFF field types
TY_SHORT, TY_LONG, TY_DOUBLE = 3, 4, 12
_TY_SIZE = {TY_SHORT: 2, TY_LONG: 4, TY_DOUBLE: 8}
_TY_FMT = {TY_SHORT: "H", TY_LONG: "I", TY_DOUBLE: "d"}


def encode_geotiff(
    img: np.ndarray,
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    origin: tuple[float, float] = (0.0, 0.0),
    epsg: int = 32631,
    compression: str = "none",
    predictor: bool = False,
) -> bytes:
    """(planes, h, w) uint8/uint16 -> GeoTIFF bytes (planar, one strip per
    plane).  ``compression``: 'none', 'lzw' (TIFF 6 §13, early-change), or
    'deflate' (COMPRESSION_ADOBE_DEFLATE, zlib streams); ``predictor``
    writes Predictor=2 horizontal differencing — the reference's write
    configuration (utils.py:264-299: LZW + predictor chosen by dtype)."""
    comp_id = _COMP_IDS.get(compression)
    if comp_id is None:
        raise ValueError(f"unsupported compression {compression!r}")
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[None, :, :]
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"unsupported dtype {img.dtype} (uint8/uint16 only)")
    p, h, w = img.shape
    bps = 8 * img.dtype.itemsize
    strips = []
    for i in range(p):
        plane = _predict(img[i]) if predictor else img[i]
        raw = plane.astype(f"<u{img.dtype.itemsize}").tobytes()
        if comp_id == 5:
            raw = _lzw_encode(raw)
        elif comp_id == 8:
            raw = zlib.compress(raw, 6)
        strips.append(raw)
    data = b"".join(strips)

    # layout: header(8) | pixel data | IFD | out-of-line arrays
    data_off = 8
    ifd_off = data_off + len(data)
    entries: list[tuple[int, int, int, bytes | int]] = []

    def arr(ty: int, values) -> bytes:
        return struct.pack("<" + _TY_FMT[ty] * len(values), *values)

    strip_offsets = []
    off = data_off
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    geokeys = [1, 1, 0, 1, 3072, 0, 1, int(epsg)]  # version 1.1.0, 1 key
    entries = [
        (T_WIDTH, TY_LONG, 1, w),
        (T_HEIGHT, TY_LONG, 1, h),
        (T_BPS, TY_SHORT, p, arr(TY_SHORT, [bps] * p)),
        (T_COMP, TY_SHORT, 1, comp_id),
        (T_PHOTO, TY_SHORT, 1, 1),
        (T_STRIP_OFF, TY_LONG, p, arr(TY_LONG, strip_offsets)),
        (T_SPP, TY_SHORT, 1, p),
        (T_RPS, TY_LONG, 1, h),
        (T_STRIP_CNT, TY_LONG, p, arr(TY_LONG, [len(s) for s in strips])),
        (T_PLANAR, TY_SHORT, 1, 2),
        (T_SFMT, TY_SHORT, p, arr(TY_SHORT, [1] * p)),
        (T_PIXSCALE, TY_DOUBLE, 3, arr(TY_DOUBLE, [pixel_scale[0], pixel_scale[1], 0.0])),
        (
            T_TIEPOINT, TY_DOUBLE, 6,
            arr(TY_DOUBLE, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0]),
        ),
        (T_GEOKEYS, TY_SHORT, len(geokeys), arr(TY_SHORT, geokeys)),
    ]
    if predictor:
        entries.append((T_PRED, TY_SHORT, 1, 2))
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
    if ty not in _TY_SIZE:
        raise ValueError(f"unsupported TIFF field type {ty}")
    size = _TY_SIZE[ty] * count
    if size > len(buf):  # corrupt count: must bound BEFORE building the
        # struct format string — "H"*count with a 32-bit count is a
        # multi-GB allocation in uninterruptible C (fuzzer-found hang)
        raise ValueError(f"TIFF field count {count} exceeds file size")
    if size <= 4:
        payload = raw[:size]
    else:
        (off,) = struct.unpack("<I", raw)
        payload = buf[off : off + size]
    return list(struct.unpack("<" + _TY_FMT[ty] * count, payload))


@corrupt_guard("geotiff")
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
    comp = int(tags.get(T_COMP, [1])[0])
    if comp not in (1, 5, 8):
        raise ValueError(f"unsupported TIFF compression {comp} (none/LZW/deflate)")
    if int(tags.get(T_PLANAR, [1])[0]) != 2 and p > 1:
        raise ValueError("only planar configuration supported for multi-band")
    pred = int(tags.get(T_PRED, [1])[0])
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {pred}")
    dt = np.uint8 if bps == 8 else np.uint16
    offsets = [int(o) for o in tags[T_STRIP_OFF]]
    counts = [int(c) for c in tags[T_STRIP_CNT]]
    planes = []
    for o, c in zip(offsets, counts):
        raw = data[o : o + c]
        if comp == 5:
            raw = _lzw_decode(raw)
        elif comp == 8:
            raw = zlib.decompress(raw)
        plane = np.frombuffer(raw, dtype=f"<u{bps // 8}").reshape(h, w)
        if pred == 2:
            plane = _unpredict(plane)
        planes.append(plane)
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
