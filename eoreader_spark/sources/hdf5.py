"""From-scratch HDF5 container (the netCDF4 substrate) — pure numpy/zlib.

The reference's Sentinel-3 band format is netCDF4 read through
xarray/h5netcdf with ``mask_and_scale=True`` (scale_factor / add_offset /
_FillValue applied on read):
/root/reference/eoreader/products/optical/s3_product.py:788-886 (_read_nc)
and :445-478 (_read_band multiplies by ``scale_factor``).  netCDF4 files
ARE HDF5 files, so this module implements the subset of the public HDF5
File Format Specification the engine needs to write deterministic
OLCI/SLSTR-shaped fixtures and read them back on executors:

- superblock version 0,
- version-1 object headers, including continuation-block chains on read
  (libhdf5 splits attribute-heavy headers across blocks),
- the classic group structure (local heap + v1 B-tree + SNOD symbol
  nodes), including NESTED groups on both write and read (slash paths,
  the netCDF4 group convention),
- fixed-point / IEEE-float datatypes (classes 0 and 1), strings (class 3),
- contiguous AND chunked data layouts (layout message v3),
- the deflate filter pipeline (gzip via zlib, filter id 1),
- attribute messages (v1), including the netCDF ``scale_factor`` /
  ``add_offset`` / ``_FillValue`` convention.

Scale story: the writer exists only to synthesize small test fixtures; the
READER is the production surface and runs inside Arrow batches on
executors (bytes-in, ndarray-out, no Python object churn in the loop) —
one container per row, exactly like the JP2/JFIF/TIFF codecs.

No code is taken from h5py/libhdf5; everything below is written against
the publicly documented wire format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from eoreader_spark.codecs import corrupt_guard

_UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# --------------------------------------------------------------- datatypes
# (classandversion, bitfields[3], size, properties) per public spec §IV.A.2.d
def _dt_message(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.kind in ("i", "u"):
        sign = 0x08 if dt.kind == "i" else 0x00
        return struct.pack(
            "<B3BIHH", 0x10, sign, 0, 0, dt.itemsize, 0, dt.itemsize * 8
        )
    if dt == np.float32:
        return struct.pack(
            "<B3BIHHBBBBI", 0x11, 0x20, 31, 0, 4, 0, 32, 23, 8, 0, 23, 127
        )
    if dt == np.float64:
        return struct.pack(
            "<B3BIHHBBBBI", 0x11, 0x20, 63, 0, 8, 0, 64, 52, 11, 0, 52, 1023
        )
    raise NotImplementedError(f"HDF5 writer: dtype {dt} not in subset")


def _dt_string(n: int) -> bytes:
    # class 3, v1; padding 0 (null-terminated), ASCII
    return struct.pack("<B3BI", 0x13, 0, 0, 0, n)


def _parse_dt(msg: bytes) -> np.dtype | tuple[str, int]:
    ver_cls = msg[0]
    cls = ver_cls & 0x0F
    (size,) = struct.unpack_from("<I", msg, 4)
    # boundary validation (round 7, ADVICE): a bit-flipped size of e.g. 3
    # reaches np.dtype('i3') and raises a bare TypeError, escaping the
    # corrupt-input contract.  Only power-of-two machine sizes are valid
    # numeric dtypes in this subset.
    if (cls == 0 and size not in (1, 2, 4, 8)) or (
        cls == 1 and size not in (2, 4, 8)
    ):
        raise ValueError(f"corrupt HDF5 datatype: invalid size {size} for class {cls}")
    if cls == 0:  # fixed-point
        signed = bool(msg[1] & 0x08)
        be = bool(msg[1] & 0x01)
        return np.dtype(("i" if signed else "u") + str(size)).newbyteorder(
            ">" if be else "<"
        )
    if cls == 1:  # float
        be = bool(msg[1] & 0x01)
        return np.dtype("f" + str(size)).newbyteorder(">" if be else "<")
    if cls == 3:  # string
        return ("S", size)
    raise NotImplementedError(f"HDF5 reader: datatype class {cls} not in subset")


def _ds_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _parse_ds(msg: bytes) -> tuple[int, ...]:
    version, ndims, flags = msg[0], msg[1], msg[2]
    if version != 1:
        raise NotImplementedError("HDF5 reader: dataspace v2 not in subset")
    off = 8
    dims = struct.unpack_from(f"<{ndims}Q", msg, off)
    return tuple(int(d) for d in dims)


def _attr_message(name: str, value) -> bytes:
    nm = name.encode() + b"\x00"
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        dt = _dt_string(len(raw))
        ds = _ds_message(())
        data = raw
    else:
        arr = np.asarray(value)
        dt = _dt_message(arr.dtype)
        ds = _ds_message(arr.shape if arr.shape else ())
        data = arr.tobytes()
    return (
        struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
        + _pad8(nm)
        + _pad8(dt)
        + _pad8(ds)
        + data
    )


def _parse_attr(msg: bytes):
    name_sz, dt_sz, ds_sz = struct.unpack_from("<HHH", msg, 2)
    off = 8
    name = msg[off : off + name_sz].split(b"\x00")[0].decode()
    off += -(-name_sz // 8) * 8
    dt = _parse_dt(msg[off : off + dt_sz])
    off += -(-dt_sz // 8) * 8
    shape = _parse_ds(msg[off : off + ds_sz])
    off += -(-ds_sz // 8) * 8
    if isinstance(dt, tuple):  # string
        raw = msg[off : off + dt[1]]
        return name, raw.split(b"\x00")[0].decode()
    n = int(np.prod(shape)) if shape else 1
    val = np.frombuffer(msg, dtype=dt, count=n, offset=off)
    return name, (val.reshape(shape) if shape else val[0])


# ------------------------------------------------------------------ writer
class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray(b"\x00" * 96)  # superblock written last

    def alloc(self, data: bytes) -> int:
        addr = len(self.buf)
        self.buf += data
        return addr


def _object_header(messages: list[tuple[int, bytes]]) -> bytes:
    body = b""
    for mtype, msg in messages:
        msg = _pad8(msg)
        body += struct.pack("<HHB3x", mtype, len(msg), 0) + msg
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def _write_dataset(w: _Writer, arr: np.ndarray, attrs: dict) -> int:
    """Emit one dataset's data blocks + object header; -> OH address."""
    arr = np.ascontiguousarray(arr)
    msgs: list[tuple[int, bytes]] = [
        (0x0001, _ds_message(arr.shape)),
        (0x0003, _dt_message(arr.dtype)),
    ]
    chunked = arr.ndim >= 2 and arr.size > 4096
    if chunked:
        # one band of rows per chunk: dims (band, full trailing dims)
        band = max(1, 4096 // max(1, int(np.prod(arr.shape[1:]))))
        chunk_shape = (min(band, arr.shape[0]),) + arr.shape[1:]
        n_chunks = -(-arr.shape[0] // chunk_shape[0])
        kids, keys = [], []
        for ci in range(n_chunks):
            block = arr[ci * chunk_shape[0] : (ci + 1) * chunk_shape[0]]
            if block.shape != chunk_shape:  # edge chunk: zero-pad
                padded = np.zeros(chunk_shape, arr.dtype)
                padded[: block.shape[0]] = block
                block = padded
            comp = zlib.compress(block.tobytes(), 6)
            kids.append(w.alloc(comp))
            keys.append((len(comp), ci * chunk_shape[0]))
        nd = arr.ndim + 1
        node = b"TREE" + struct.pack("<BBHQQ", 1, 0, n_chunks, _UNDEF, _UNDEF)
        for (sz, off0), kid in zip(keys, kids):
            node += struct.pack("<II", sz, 0)
            node += struct.pack(f"<{nd}Q", off0, *([0] * (arr.ndim - 1)), 0)
            node += struct.pack("<Q", kid)
        # final key: one past the last chunk
        node += struct.pack("<II", 0, 0)
        node += struct.pack(
            f"<{nd}Q", n_chunks * chunk_shape[0], *([0] * (arr.ndim - 1)), 0
        )
        btree_addr = w.alloc(node)
        layout = struct.pack("<BBBQ", 3, 2, nd, btree_addr)
        for d in chunk_shape:
            layout += struct.pack("<I", d)
        layout += struct.pack("<I", arr.itemsize)
        msgs.append((0x0008, layout))
        # deflate filter pipeline v1: id 1, one client value (level)
        msgs.append(
            (0x000B, struct.pack("<BB6xHHHHI4x", 1, 1, 1, 0, 0, 1, 6))
        )
    else:
        data_addr = w.alloc(arr.tobytes())
        msgs.append(
            (0x0008, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes))
        )
    for an, av in attrs.items():
        msgs.append((0x000C, _attr_message(an, av)))
    return w.alloc(_object_header(msgs))


def _write_group(
    w: _Writer, entries: dict[str, int], attrs: dict | None = None
) -> tuple[int, int, int]:
    """Emit one group's heap + SNOD + B-tree + object header.
    ``entries``: link name -> child object-header address.
    -> (group OH address, btree address, heap address)."""
    names = sorted(entries)
    heap_data = bytearray(b"\x00" * 8)  # offset 0 = the empty string
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode() + b"\x00")
    heap_data_addr = w.alloc(_pad8(bytes(heap_data)))
    heap_addr = w.alloc(
        b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), 1, heap_data_addr)
    )
    snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
    for n in names:
        snod += struct.pack("<QQI4x16x", name_off[n], entries[n], 0)
    snod_addr = w.alloc(snod)
    btree = b"TREE" + struct.pack(
        "<BBHQQQQQ",
        0, 0, 1, _UNDEF, _UNDEF,
        0, snod_addr, name_off[names[-1]] if names else 0,
    )
    btree_addr = w.alloc(btree)
    msgs = [(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
    for an, av in (attrs or {}).items():
        msgs.append((0x000C, _attr_message(an, av)))
    return w.alloc(_object_header(msgs)), btree_addr, heap_addr


def write_hdf5(datasets: dict, global_attrs: dict | None = None) -> bytes:
    """Serialize ``{name: (ndarray, attrs_dict)}`` (or ``{name: ndarray}``)
    to HDF5 bytes.  Names may contain ``/`` to place datasets in nested
    groups (the netCDF4 group convention, round 6).  2-D+ arrays of > 4096
    elements are chunked (one row-band per chunk) and deflate-compressed;
    smaller ones are stored contiguous.  ``global_attrs`` land on the root
    group (the netCDF global-attribute convention, ref
    s3_product.py:724-781)."""
    w = _Writer()

    # build the name tree: leaves = dataset specs, dicts = subgroups
    tree: dict = {}
    for name in sorted(datasets):
        parts = name.strip("/").split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"dataset/group name clash at {p!r} in {name!r}")
        if parts[-1] in node:
            raise ValueError(f"dataset/group name clash at {name!r}")
        node[parts[-1]] = datasets[name]

    def emit(node: dict) -> dict[str, int]:
        entries: dict[str, int] = {}
        for n, spec in node.items():
            if isinstance(spec, dict):  # subgroup, depth-first
                entries[n], _bt, _hp = _write_group(w, emit(spec))
            else:
                arr, attrs = spec if isinstance(spec, tuple) else (spec, {})
                entries[n] = _write_dataset(w, arr, attrs)
        return entries

    root_oh, btree_addr, heap_addr = _write_group(
        w, emit(tree), global_attrs or {}
    )

    # superblock v0 + root symbol-table entry
    sb = _SIG + struct.pack(
        "<BBBBBBBBHHIQQQQ",
        0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0,
        0, _UNDEF, len(w.buf), _UNDEF,
    )
    sb += struct.pack("<QQI4xQQ", 0, root_oh, 1, btree_addr, heap_addr)
    assert len(sb) == 96
    w.buf[:96] = sb
    return bytes(w.buf)


# ------------------------------------------------------------------ reader
def _read_oh(data: bytes, addr: int) -> list[tuple[int, bytes]]:
    version, nmsgs, refcnt, hsize = struct.unpack_from("<BxHII", data, addr)
    if version != 1:
        raise NotImplementedError("HDF5 reader: v2 object headers not in subset")
    out: list[tuple[int, bytes]] = []
    # header block chain: the prefix block, then any continuation blocks
    # (message type 0x0010: address + length) — real libhdf5 files grow
    # attribute-heavy headers this way.  nmsgs counts EVERY header message
    # including the continuation messages themselves.
    blocks = [(addr + 16, addr + 16 + hsize)]
    seen = {addr + 16}
    n_read = 0
    while blocks and n_read < nmsgs:
        pos, end = blocks.pop(0)
        while pos + 8 <= end and n_read < nmsgs:
            mtype, msize, flags = struct.unpack_from("<HHB", data, pos)
            body = data[pos + 8 : pos + 8 + msize]
            n_read += 1
            if mtype == 0x0010:  # continuation: queue the next block
                caddr, clen = struct.unpack_from("<QQ", body, 0)
                if caddr in seen or caddr + clen > len(data):
                    raise ValueError("corrupt HDF5 continuation chain")
                seen.add(caddr)
                blocks.append((caddr, caddr + clen))
            elif mtype != 0x0000:  # NIL messages pad blocks; skip them
                out.append((mtype, body))
            pos += 8 + msize
    return out


def _heap_string(data: bytes, heap_addr: int, off: int) -> str:
    if data[heap_addr : heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    (seg_addr,) = struct.unpack_from("<Q", data, heap_addr + 24)
    end = data.index(b"\x00", seg_addr + off)
    return data[seg_addr + off : end].decode()


def _walk_group(data: bytes, btree_addr: int, heap_addr: int) -> dict[str, int]:
    """name -> object header address, walking TREE/SNOD nodes."""
    out: dict[str, int] = {}
    visited: set[int] = set()  # round 7: a self-referencing child pointer
    # (level>0 node pointing at itself) is unbounded recursion otherwise

    def node(addr: int) -> None:
        if addr in visited:
            raise ValueError("corrupt HDF5: group B-tree node cycle")
        visited.add(addr)
        if data[addr : addr + 4] != b"TREE":
            raise ValueError("bad B-tree signature")
        ntype, level, used = struct.unpack_from("<BBH", data, addr + 4)
        pos = addr + 8 + 16  # skip siblings
        kids = []
        for i in range(used):
            pos += 8  # key i
            (child,) = struct.unpack_from("<Q", data, pos)
            kids.append(child)
            pos += 8
        for child in kids:
            if level > 0:
                node(child)
                continue
            if data[child : child + 4] != b"SNOD":
                raise ValueError("bad SNOD signature")
            (nsym,) = struct.unpack_from("<H", data, child + 6)
            p = child + 8
            for _ in range(nsym):
                noff, oh = struct.unpack_from("<QQ", data, p)
                out[_heap_string(data, heap_addr, noff)] = oh
                p += 40

    node(btree_addr)
    return out


def _root(data: bytes) -> tuple[dict[str, int], list[tuple[int, bytes]]]:
    """-> ({'path/to/dataset': oh_addr}, root-group messages).  Nested
    groups (links whose object header carries a Symbol Table message, the
    netCDF4 group convention) are flattened to slash paths, depth-first."""
    if data[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    if data[8] != 0:
        raise NotImplementedError("HDF5 reader: superblock v1+ not in subset")
    # root symbol-table entry sits at 24 + 4*8 = offset 56, scratch at +24
    (root_oh,) = struct.unpack_from("<Q", data, 56 + 8)
    btree_addr, heap_addr = struct.unpack_from("<QQ", data, 56 + 24)
    msgs = _read_oh(data, root_oh)
    for mtype, body in msgs:
        if mtype == 0x0011:
            btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)

    out: dict[str, int] = {}
    seen_groups = {root_oh}

    def descend(bt: int, hp: int, prefix: str) -> None:
        for name, oh in _walk_group(data, bt, hp).items():
            sub = None
            for mt, body in _read_oh(data, oh):
                if mt == 0x0011:
                    sub = struct.unpack_from("<QQ", body, 0)
            if sub is not None:
                if oh in seen_groups:
                    raise ValueError("corrupt HDF5: group cycle")
                seen_groups.add(oh)
                descend(sub[0], sub[1], f"{prefix}{name}/")
            else:
                out[f"{prefix}{name}"] = oh

    descend(btree_addr, heap_addr, "")
    return out, msgs


@corrupt_guard("hdf5")
def list_datasets(data: bytes) -> dict[str, dict]:
    """{name: {shape, dtype, attrs}} — the ncdump-style listing."""
    links, _ = _root(data)
    out = {}
    for name, oh in links.items():
        shape, dt, attrs = None, None, {}
        for mtype, body in _read_oh(data, oh):
            if mtype == 0x0001:
                shape = _parse_ds(body)
            elif mtype == 0x0003:
                dt = _parse_dt(body)
            elif mtype == 0x000C:
                an, av = _parse_attr(body)
                attrs[an] = av
        out[name] = {"shape": shape, "dtype": dt, "attrs": attrs}
    return out


@corrupt_guard("hdf5")
def global_attrs(data: bytes) -> dict:
    _, msgs = _root(data)
    out = {}
    for mtype, body in msgs:
        if mtype == 0x000C:
            an, av = _parse_attr(body)
            out[an] = av
    return out


@corrupt_guard("hdf5")
def read_dataset(
    data: bytes, name: str, mask_and_scale: bool = True
) -> np.ndarray:
    """Read one dataset.  ``mask_and_scale=True`` replays the netCDF read
    convention the reference relies on (s3_product.py:850 ``mask_and_scale``,
    :478 ``* scale_factor``): _FillValue -> NaN, then
    ``scale_factor * x + add_offset`` as float64."""
    links, _ = _root(data)
    if name not in links:
        raise KeyError(f"no dataset {name!r} in HDF5 file")
    shape = dt = layout = None
    filters: list[int] = []
    attrs: dict = {}
    for mtype, body in _read_oh(data, links[name]):
        if mtype == 0x0001:
            shape = _parse_ds(body)
        elif mtype == 0x0003:
            dt = _parse_dt(body)
        elif mtype == 0x0008:
            layout = body
        elif mtype == 0x000B:
            nf = body[1]
            pos = 8
            for _ in range(nf):
                fid, nlen, fl, ncv = struct.unpack_from("<HHHH", body, pos)
                filters.append(fid)
                pos += 8 + -(-nlen // 8) * 8 + ncv * 4
                pos += -pos % 8 if ncv % 2 else 0
        elif mtype == 0x000C:
            an, av = _parse_attr(body)
            attrs[an] = av
    if shape is None or dt is None or layout is None:
        raise ValueError(f"dataset {name!r}: missing core messages")
    if isinstance(dt, tuple):
        raise NotImplementedError("HDF5 reader: string datasets not in subset")
    if any(f != 1 for f in filters):
        raise NotImplementedError(
            f"HDF5 reader: filter ids {filters} not in subset (deflate only)"
        )

    version, lclass = layout[0], layout[1]
    if version != 3:
        raise NotImplementedError("HDF5 reader: layout message v1/v2/v4 not in subset")
    if lclass == 1:  # contiguous
        addr, size = struct.unpack_from("<QQ", layout, 2)
        arr = np.frombuffer(data, dtype=dt, count=int(np.prod(shape)), offset=addr)
        arr = arr.reshape(shape)
    elif lclass == 2:  # chunked
        nd = layout[2]
        (btree_addr,) = struct.unpack_from("<Q", layout, 3)
        chunk = struct.unpack_from(f"<{nd - 1}I", layout, 11)
        if any(c == 0 for c in chunk):
            raise ValueError("corrupt HDF5 chunk layout: zero chunk dimension")
        full = tuple(
            -(-s // c) * c for s, c in zip(shape, chunk)
        )
        # allocation bound (round 7, ADVICE): dataspace dims come from the
        # file; a bit-flipped dim would np.zeros() petabytes (MemoryError,
        # or an overcommit OOM-kill of the executor).  Deflate expands at
        # most ~1032:1, so a decoded dataset can never legitimately exceed
        # a small multiple of the container size — bound BEFORE allocating.
        need = np.dtype(dt).itemsize  # python ints: no int64 overflow wrap
        for d in full:
            need *= int(d)
        if need > (len(data) << 11) + (1 << 16):
            raise ValueError(
                f"corrupt HDF5 dataspace: {need} B dataset from a "
                f"{len(data)} B container exceeds the deflate bound"
            )
        arr = np.zeros(full, dtype=dt)
        _read_chunks(data, btree_addr, nd, chunk, arr, bool(filters))
        arr = arr[tuple(slice(0, s) for s in shape)]
    else:
        raise NotImplementedError("HDF5 reader: compact layout not in subset")

    if not mask_and_scale:
        return arr.copy()
    out = arr.astype(np.float64)
    if "_FillValue" in attrs:
        out[arr == attrs["_FillValue"]] = np.nan
    scale = float(attrs.get("scale_factor", 1.0))
    off = float(attrs.get("add_offset", 0.0))
    return out * scale + off


def _read_chunks(data, btree_addr, nd, chunk, arr, deflated, _seen=None) -> None:
    _seen = set() if _seen is None else _seen
    if btree_addr in _seen:  # round 7: self-referencing node -> RecursionError
        raise ValueError("corrupt HDF5: chunk B-tree node cycle")
    _seen.add(btree_addr)
    if data[btree_addr : btree_addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    ntype, level, used = struct.unpack_from("<BBH", data, btree_addr + 4)
    pos = btree_addr + 8 + 16
    keysz = 8 + 8 * nd
    for _ in range(used):
        size, fmask = struct.unpack_from("<II", data, pos)
        offs = struct.unpack_from(f"<{nd}Q", data, pos + 8)
        (child,) = struct.unpack_from("<Q", data, pos + keysz)
        pos += keysz + 8
        if level > 0:
            _read_chunks(data, child, nd, chunk, arr, deflated, _seen)
            continue
        raw = data[child : child + size]
        if deflated and not (fmask & 1):
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, dtype=arr.dtype).reshape(chunk)
        sel = tuple(slice(o, o + c) for o, c in zip(offs[:-1], chunk))
        arr[sel] = block


# -------------------------------------------------- engine codec ('nc' fmt)
def encode_nc(img: np.ndarray) -> bytes:
    """(planes, h, w) DN array -> one-dataset-per-plane HDF5 container in the
    Sentinel-3 OLCI shape (``Oa01_radiance`` ... per plane, int16 DN with
    netCDF scale/offset/fill attributes), chunked+deflate like real OLCI."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[None]
    # storage dtype (round 7, ADVICE): .astype(int16) silently wrapped
    # uint16 DN > 32767, corrupting format-generic transcodes (the JP2/TIFF
    # codecs preserve uint16).  Pick the narrowest writer-subset dtype that
    # holds the data exactly; decode_nc narrows back symmetrically.
    lo, hi = (int(img.min()), int(img.max())) if img.size else (0, 0)
    if -32768 <= lo and hi <= 32767:
        st, fill = np.int16, np.int16(-32768)
    elif 0 <= lo and hi <= 65535:
        st, fill = np.uint16, np.uint16(65535)
    elif -(2**31) <= lo and hi < 2**31:
        st, fill = np.int32, np.int32(-(2**31))
    else:
        raise ValueError(f"encode_nc: DN range [{lo}, {hi}] exceeds int32")
    dsets = {}
    for p in range(img.shape[0]):
        dsets[f"Oa{p + 1:02d}_radiance"] = (
            img[p].astype(st),
            {
                "scale_factor": np.float64(1.0),
                "add_offset": np.float64(0.0),
                "_FillValue": fill,
                "units": "DN",
            },
        )
    return write_hdf5(dsets, {"institution": "eoreader_spark", "source": "synthetic"})


@corrupt_guard("hdf5")
def decode_nc(data: bytes, h: int | None = None, w: int | None = None) -> np.ndarray:
    """HDF5 container -> (planes, h, w) DN array (codec-table signature).
    Planes come back in dataset-name order (Oa01..OaNN); values are raw DN
    in the narrowest dtype that holds them (uint8, else uint16, else the
    stored dtype — matching the GeoTIFF/JP2 uint16-preserving contract);
    reflectance scaling stays a downstream, plan-visible stage exactly
    like the raw8/jp2 paths."""
    meta = list_datasets(data)
    names = sorted(meta)
    planes = [read_dataset(data, n, mask_and_scale=False) for n in names]
    out = np.stack(planes)
    lo, hi = (int(out.min()), int(out.max())) if out.size else (0, 0)
    if 0 <= lo and hi <= 255:
        return out.astype(np.uint8)
    if 0 <= lo and hi <= 65535:
        return out.astype(np.uint16)
    return out
