"""Seeded deterministic synthetic tables per FIXTURES.md (shapes T1-T8).

The reference tests against real satellite products + golden rasters on a
private bucket (/root/reference/ci/scripts_utils.py:65-90); we synthesize the
same *shapes* with closed-form pixel/geometry functions so every operator has
an analytic oracle.  Input table shape is authoritative per BASELINE.json
input_hint: images(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long).

Generation is itself a Spark job: ``spark.range(n)`` -> ``mapInPandas`` with
all values pure functions of the row id — deterministic regardless of
partitioning, and the generator scales with the cluster like any other stage.

Skew: 70% of scenes land in 5 hot cells (coastal/urban analog) so the salting
path is actually exercised (BASELINE.json north_star).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from eoreader_spark import cells, codecs

CONSTELLATIONS = ["S2", "L8", "S1", "PLD"]
PRODUCT_TYPES = {"S2": "L2A", "L8": "L2", "S1": "GRD", "PLD": "ORT"}
TILE = 64  # sandbox tile size (reference uses 1024: eoreader/utils.py:53-54)
CELL_RES = 7  # our H3-res-5-9 analog partition resolution

# 5 hot "coastal/urban" centers (lon, lat)
HOT_SPOTS = [(2.35, 48.85), (-74.0, 40.7), (139.7, 35.7), (31.2, 30.0), (-43.2, -22.9)]
HOT_FRACTION = 0.7
SCENE_HALF_DEG = 0.25  # scene footprint half-extent in degrees

EPOCH = np.datetime64("2024-01-01T00:00:00")


# ---------------------------------------------------------------- scene math
def scene_center(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic scene center; 70% clustered on HOT_SPOTS."""
    ids = np.asarray(ids, dtype=np.int64)
    h = (ids * np.int64(2654435761)) & np.int64(0x7FFFFFFF)
    hot = (ids % 10) < int(HOT_FRACTION * 10)
    spot = ids % len(HOT_SPOTS)
    hot_lon = np.array([s[0] for s in HOT_SPOTS])[spot]
    hot_lat = np.array([s[1] for s in HOT_SPOTS])[spot]
    jx = ((h % 1000) / 1000.0 - 0.5) * 1.0  # +-0.5 deg jitter around hot spot
    jy = (((h // 1000) % 1000) / 1000.0 - 0.5) * 1.0
    ux = ((h % 100000) / 100000.0) * 320.0 - 160.0  # uniform cold scenes
    uy = (((h // 7) % 100000) / 100000.0) * 140.0 - 70.0
    lon = np.where(hot, hot_lon + jx, ux)
    lat = np.where(hot, hot_lat + jy, uy)
    return lon, lat


def scene_bbox(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lon, lat = scene_center(ids)
    return lon - SCENE_HALF_DEG, lat - SCENE_HALF_DEG, lon + SCENE_HALF_DEG, lat + SCENE_HALF_DEG


def footprint_ring(i: int) -> np.ndarray:
    """Convex quadrilateral inset in the scene bbox; 10% of rows get a notch
    (non-convex, FIXTURES.md T3) for PIP edge coverage."""
    x0, y0, x1, y1 = (float(v) for v in np.concatenate(scene_bbox(np.array([i]))))
    h = (i * 2654435761) & 0x7FFFFFFF
    # deterministic inward jitter per corner, up to 20% of extent
    j = [(h >> s) % 97 / 97.0 * 0.2 for s in (0, 7, 14, 21)]
    w, ht = x1 - x0, y1 - y0
    ring = [
        (x0 + j[0] * w, y0),
        (x1, y0 + j[1] * ht),
        (x1 - j[2] * w, y1),
        (x0, y1 - j[3] * ht),
    ]
    if i % 10 == 3:  # notch: push a midpoint inward
        mx, my = (ring[1][0] + ring[2][0]) / 2, (ring[1][1] + ring[2][1]) / 2
        ring.insert(2, (mx - 0.4 * w, my))
    return np.asarray(ring, dtype=np.float64)


def ring_wkt(ring: np.ndarray) -> str:
    pts = ", ".join(f"{x:.9f} {y:.9f}" for x, y in ring)
    first = f"{ring[0, 0]:.9f} {ring[0, 1]:.9f}"
    return f"POLYGON (({pts}, {first}))"


def image_dims(i: int) -> tuple[int, int]:
    sizes = [64, 128, 256]
    return sizes[(i // 3) % 3], sizes[(i // 7) % 3]  # (h, w)


def image_fmt(i: int) -> str:
    return ["raw8", "png", "jpeg"][i % 3]


def phash_of(img: np.ndarray) -> int:
    """Perceptual-hash-like 64-bit int: 8x8 block-mean of plane 0 vs its mean."""
    p0 = img[0].astype(np.float64)
    h, w = p0.shape
    blocks = p0[: h // 8 * 8, : w // 8 * 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def caption_of(i: int) -> str:
    lon, lat = scene_center(np.array([i]))
    cell = int(cells.encode(lon, lat, CELL_RES)[0])
    return f"{CONSTELLATIONS[i % 4]} scene over cell {cell}"


# ------------------------------------------------------------------- tables
def gen_images(
    spark: SparkSession, n: int, partitions: int | None = None, layout: str = "LEGACY3"
) -> DataFrame:
    """T1 `images` — the authoritative input shape (BASELINE.json:15).

    ``layout`` names a plane layout from eoreader_spark.bands.LAYOUTS; the
    default LEGACY3 keeps the round-1 3-plane bytes identical.  Non-3-plane
    layouts alternate raw8/qjpg (png is RGB-only by spec)."""
    from eoreader_spark import bands as bands_mod

    planes = bands_mod.n_planes(layout)
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                img = codecs.make_image(i, h, w, planes=planes)
                fmt = image_fmt(i) if planes == 3 else ["raw8", "jpeg"][i % 2]
                rows.append(
                    (
                        f"img{i:012d}",
                        codecs.encode(img, fmt),
                        w,
                        h,
                        fmt,
                        caption_of(i),
                        phash_of(img),
                    )
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    rng = spark.range(n, numPartitions=partitions or max(8, n // 256))
    return rng.mapInPandas(batch, schema=schema)


def transcode_images(images: DataFrame, to_fmt: str) -> DataFrame:
    """Re-encode an images table into another registered container format
    (decode via the row's fmt, encode to ``to_fmt``), preserving every other
    column.  Arrow-batched; used to put the SAME closed-form pixels behind a
    different real container (e.g. raw8 -> 'nc' HDF5) so value-exact oracles
    carry across codecs unchanged."""
    cols = images.columns

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for b, fmt, h, w in zip(pdf["bytes"], pdf["fmt"], pdf["h"], pdf["w"]):
                img = codecs.decode(bytes(b), str(fmt), int(h), int(w))
                out_bytes.append(codecs.encode(img, to_fmt))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            pdf["fmt"] = to_fmt
            yield pdf[cols]

    return images.mapInPandas(batch, schema=images.schema)


def gen_scenes(spark: SparkSession, n: int) -> DataFrame:
    """T2 `scenes` — per-image metadata (Product analog,
    /root/reference/eoreader/products/product.py:135-332)."""
    schema = (
        "image_id string, constellation string, product_type string, datetime timestamp,"
        " pixel_size double, crs_epsg int, lon double, lat double,"
        " orbit_direction string, cloud_cover double, cell_r7 long"
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lon, lat = scene_center(ids)
            const = np.array(CONSTELLATIONS)[ids % 4]
            dt = EPOCH + (ids * 3600 % (365 * 86400)).astype("timedelta64[s]")
            zone = np.clip(((lon + 180.0) / 6.0).astype(np.int64) + 1, 1, 60)
            yield pd.DataFrame(
                {
                    "image_id": [f"img{int(i):012d}" for i in ids],
                    "constellation": const,
                    "product_type": [PRODUCT_TYPES[c] for c in const],
                    "datetime": dt.astype("datetime64[us]"),
                    "pixel_size": np.array([10.0, 20.0, 30.0])[ids % 3],
                    "crs_epsg": (32600 + zone).astype(np.int32),
                    "lon": lon,
                    "lat": lat,
                    "orbit_direction": np.where(ids % 2 == 0, "ASCENDING", "DESCENDING"),
                    "cloud_cover": (ids * 37 % 101).astype(np.float64),
                    "cell_r7": cells.encode(lon, lat, CELL_RES),
                }
            )

    return spark.range(n, numPartitions=max(8, n // 4096)).mapInPandas(batch, schema=schema)


def gen_footprints(spark: SparkSession, n: int) -> DataFrame:
    """T3 `footprints` — valid-data polygons + covering cells at res 5..9."""
    schema = (
        "image_id string, geom_wkt string,"
        " cells_r5 array<long>, cells_r7 array<long>, cells_r9 array<long>"
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                ring = footprint_ring(i)
                x0, y0 = ring[:, 0].min(), ring[:, 1].min()
                x1, y1 = ring[:, 0].max(), ring[:, 1].max()
                covers = {}
                for r in (5, 7, 9):
                    _, cc = cells.cover_bbox(
                        np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]), r
                    )
                    covers[r] = np.unique(cc).tolist()
                rows.append((f"img{i:012d}", ring_wkt(ring), covers[5], covers[7], covers[9]))
            yield pd.DataFrame(
                rows, columns=["image_id", "geom_wkt", "cells_r5", "cells_r7", "cells_r9"]
            )

    return spark.range(n, numPartitions=max(8, n // 4096)).mapInPandas(batch, schema=schema)


def gen_aoi(spark: SparkSession, n_images: int, n_aoi: int | None = None) -> DataFrame:
    """T4 `aoi` — query polygons: tiny / scene-sized / multi-scene; every 20th
    degenerate (vertices exactly on cell edges) to pin ray-cast tie-breaking."""
    n_aoi = n_aoi or max(16, n_images // 50)
    schema = "aoi_id string, geom_wkt string, cells_r7 array<long>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for j in pdf["id"].astype("int64"):
                j = int(j)
                # anchor AOIs on the hot spots + a rotating cold offset
                sx, sy = HOT_SPOTS[j % len(HOT_SPOTS)]
                h = (j * 40503) & 0xFFFF
                cx = sx + ((h % 100) / 100.0 - 0.5) * 2.0
                cy = sy + (((h // 100) % 100) / 100.0 - 0.5) * 2.0
                half = [0.05, 0.3, 1.5][j % 3]  # tiny / scene / multi-scene
                if j % 20 == 4:  # degenerate: snap to exact cell boundary
                    nx = 1 << (CELL_RES + 1)
                    cx = round((cx + 180.0) / 360.0 * nx) / nx * 360.0 - 180.0
                ring = np.array(
                    [
                        (cx - half, cy - half),
                        (cx + half, cy - half),
                        (cx + half, cy + half),
                        (cx - half, cy + half),
                    ]
                )
                _, cc = cells.cover_bbox(
                    np.array([cx - half]),
                    np.array([cy - half]),
                    np.array([cx + half]),
                    np.array([cy + half]),
                    CELL_RES,
                )
                rows.append((f"aoi{j:06d}", ring_wkt(ring), np.unique(cc).tolist()))
            yield pd.DataFrame(rows, columns=["aoi_id", "geom_wkt", "cells_r7"])

    return spark.range(n_aoi, numPartitions=8).mapInPandas(batch, schema=schema)


def gen_tiles(spark: SparkSession, n: int) -> DataFrame:
    """T5 `tiles` — the dask-chunk analog: 64x64 pixel tiles with geo bounds
    mapped from the scene bbox; partition key = parent cell (north_rule)."""
    schema = (
        "image_id string, tile_x int, tile_y int,"
        " x0 double, y0 double, x1 double, y1 double, cell_r7 long"
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                bx0, by0, bx1, by1 = (float(v) for v in np.concatenate(scene_bbox(np.array([i]))))
                ntx, nty = w // TILE, h // TILE
                dx, dy = (bx1 - bx0) / ntx, (by1 - by0) / nty
                iid = f"img{i:012d}"
                for ty in range(nty):
                    for tx in range(ntx):
                        x0, y0 = bx0 + tx * dx, by1 - (ty + 1) * dy
                        x1, y1 = x0 + dx, y0 + dy
                        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
                        cell = int(cells.encode(np.array([cx]), np.array([cy]), CELL_RES)[0])
                        rows.append((iid, tx, ty, x0, y0, x1, y1, cell))
            yield pd.DataFrame(
                rows, columns=["image_id", "tile_x", "tile_y", "x0", "y0", "x1", "y1", "cell_r7"]
            )

    return spark.range(n, numPartitions=max(8, n // 1024)).mapInPandas(batch, schema=schema)


def gen_dem(spark: SparkSession, n: int) -> DataFrame:
    """T6 `dem` — closed-form surface z = 100*sin(x/5) + 2*y per tile pixel, so
    slope/hillshade have analytic oracles (reference: _warp_dem + slope +
    hillshade, /root/reference/eoreader/products/product.py:1898-2190)."""
    schema = "image_id string, tile_x int, tile_y int, z array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                iid = f"img{i:012d}"
                for ty in range(h // TILE):
                    for tx in range(w // TILE):
                        yy, xx = np.mgrid[0:TILE, 0:TILE]
                        gx = tx * TILE + xx
                        gy = ty * TILE + yy
                        z = 100.0 * np.sin(gx / 5.0) + 2.0 * gy
                        rows.append((iid, tx, ty, z.ravel().astype(np.float32)))
            yield pd.DataFrame(rows, columns=["image_id", "tile_x", "tile_y", "z"])

    return spark.range(n, numPartitions=max(8, n // 1024)).mapInPandas(batch, schema=schema)


def gen_angle_grids(spark: SparkSession, n: int) -> DataFrame:
    """T9 `angle_grids` — per-tile sun azimuth/zenith grids with a closed
    form (saa straddles north for odd images so the circular mean is
    exercised): saa = (base + 0.01*gx - 0.02*gy) mod 360, sza = 20 +
    10*sin(gx/40) + 0.01*gy.  Reference: the S2 tile-metadata angle grids
    (optical_product.py:467-501)."""
    schema = "image_id string, tile_x int, tile_y int, saa array<float>, sza array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                iid = f"img{i:012d}"
                base = 355.0 if i % 2 else 140.0  # odd images straddle north
                for ty in range(h // TILE):
                    for tx in range(w // TILE):
                        yy, xx = np.mgrid[0:TILE, 0:TILE]
                        gx = tx * TILE + xx
                        gy = ty * TILE + yy
                        saa = (base + 0.01 * gx - 0.02 * gy) % 360.0
                        sza = 20.0 + 10.0 * np.sin(gx / 40.0) + 0.01 * gy
                        rows.append(
                            (iid, tx, ty, saa.ravel().astype(np.float32),
                             sza.ravel().astype(np.float32))
                        )
            yield pd.DataFrame(rows, columns=["image_id", "tile_x", "tile_y", "saa", "sza"])

    return spark.range(n, numPartitions=max(8, n // 1024)).mapInPandas(batch, schema=schema)


def gen_band_map(spark: SparkSession, full: bool = False) -> DataFrame:
    """T7 `band_map` — broadcast dictionary (reference:
    /root/reference/eoreader/products/optical/s2_product.py:279-348).

    ``full=False`` (default) keeps the legacy 3-band rows per constellation.
    ``full=True`` emits each constellation's real layout from bands.LAYOUTS
    with S2-style band ids — the per-product band-number table."""
    if not full:
        rows = []
        for const in CONSTELLATIONS:
            for plane, (name, bid, gsd) in enumerate(
                [("RED", "04", 10.0), ("GREEN", "03", 10.0), ("NIR", "08", 10.0)]
            ):
                rows.append((const, name, bid, gsd, plane))
    else:
        from eoreader_spark import bands as bands_mod

        layout_of = {"S2": "S2_L2A", "L8": "L8_OLI", "S1": "S1_GRD", "PLD": "PLD_MS"}
        # canonical -> common id (inverse of the S2-id alias table)
        id_of = {v: k for k, v in bands_mod.ALIASES.items() if k.startswith("B") and len(k) == 3}
        gsd_of = {"S2": 10.0, "L8": 30.0, "S1": 10.0, "PLD": 0.5}
        rows = []
        for const in CONSTELLATIONS:
            for plane, name in enumerate(bands_mod.plane_names(layout_of[const])):
                rows.append((const, name, id_of.get(name, name), gsd_of[const], plane))
    return spark.createDataFrame(
        rows, "constellation string, band_name string, band_id string, gsd double, plane int"
    )


def gen_qa_masks(spark: SparkSession, n: int) -> DataFrame:
    """T8 `qa_masks` — per-pixel bitfields, deterministic from the pixel fn
    (reference: Landsat QA_PIXEL bit decode,
    /root/reference/eoreader/products/optical/landsat_product.py:1445-1514)."""
    schema = "image_id string, tile_x int, tile_y int, qa array<int>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                iid = f"img{i:012d}"
                full = codecs.pixel_plane(i, 0, h, w).astype(np.int32)  # whole image once
                for ty in range(h // TILE):
                    for tx in range(w // TILE):
                        # slice the image's ACTUAL pixels for this tile so qa
                        # bits line up with the decoded plane everywhere
                        p0 = full[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
                        qa = (
                            ((p0 % 97 == 0).astype(np.int32))  # bit0 nodata
                            | ((p0 % 89 == 0).astype(np.int32) << 1)  # bit1 dropped
                            | ((p0 > 250).astype(np.int32) << 2)  # bit2 saturated
                            | ((p0 > 200).astype(np.int32) << 5)  # bit5 cloud
                            | ((p0 < 10).astype(np.int32) << 6)  # bit6 shadow
                        )
                        rows.append((iid, tx, ty, qa.ravel()))
            yield pd.DataFrame(rows, columns=["image_id", "tile_x", "tile_y", "qa"])

    return spark.range(n, numPartitions=max(8, n // 1024)).mapInPandas(batch, schema=schema)


def gen_band_qa_masks(
    spark: SparkSession, n: int, band_planes: dict[str, int] | None = None
) -> DataFrame:
    """T8b `band_qa_masks` — PER-BAND QA bitfields keyed (image_id, band,
    tile_x, tile_y): the reference's per-band mask association (DETFOO_B03
    composite keys, /root/reference/eoreader/products/optical/
    s2_product.py:802-925).  Bits derive from that band's OWN pixel plane so
    bands genuinely differ and tests have a closed form."""
    band_planes = band_planes or {"RED": 0, "GREEN": 1, "NIR": 2}
    schema = "image_id string, band string, tile_x int, tile_y int, qa array<int>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                h, w = image_dims(i)
                iid = f"img{i:012d}"
                for band, plane in band_planes.items():
                    full = codecs.pixel_plane(i, plane, h, w).astype(np.int32)
                    for ty in range(h // TILE):
                        for tx in range(w // TILE):
                            p = full[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
                            qa = (
                                ((p % 97 == 0).astype(np.int32))
                                | ((p % 89 == 0).astype(np.int32) << 1)
                                | ((p > 250).astype(np.int32) << 2)
                                | ((p > 200).astype(np.int32) << 5)
                                | ((p < 10).astype(np.int32) << 6)
                            )
                            rows.append((iid, band, tx, ty, qa.ravel()))
            yield pd.DataFrame(rows, columns=["image_id", "band", "tile_x", "tile_y", "qa"])

    return spark.range(n, numPartitions=max(8, n // 1024)).mapInPandas(batch, schema=schema)


_DOC_VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "shuffle cache plan stage task codec tile pixel band scene index"
).split()


def gen_documents(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic word-salad documents in the testdata `documents` shape
    (doc_id, text, lang, source, n_chars), generated per-partition (no
    driver loop).  Every 10th doc is a light perturbation of the one 5
    before it, planting near-duplicate pairs for the dedup family; the
    perturbation keeps long shared runs so MinHash/winnowing find them.

    Vocabulary shape matters for realism: tokens are stem+suffix compounds
    (~34k distinct), so shingle document-frequency looks like natural text.
    A tiny vocab makes EVERY shingle a stop-shingle and turns the
    inverted-index self-join quadratic — a fixture artifact, not an engine
    property (measured: the round-6 sf1 leg ground >20 min on a 34-word
    vocab and runs in seconds on this one)."""
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    langs = ["en", "zh", "fr", "de", "es"]

    def words_of(i: int, k: int) -> list[str]:
        v = len(_DOC_VOCAB)
        return [
            _DOC_VOCAB[(i * 7919 + j * 104729 + (i * j) % 31) % v]
            + str((i * 31 + j * 7919 + (i % 13) * j * j) % 997)
            for j in range(k)
        ]

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                k = 40 + (i * 13) % 60
                ws = words_of(i, k)
                if i % 10 == 5 and i >= 10:
                    ws = words_of(i - 5, 40 + ((i - 5) * 13) % 60)
                    ws[0] = _DOC_VOCAB[i % len(_DOC_VOCAB)]  # 1-word edit
                text = " ".join(ws)
                rows.append(
                    (i, text, langs[i % 5], f"src{i % 7}", len(text))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    rng = spark.range(n, numPartitions=partitions or max(8, n // 4096))
    return rng.mapInPandas(batch, schema=schema)


def gen_embeddings(
    spark: SparkSession, n: int, dim: int = 64, partitions: int | None = None
) -> DataFrame:
    """Deterministic embeddings in the testdata `embeddings` shape
    (vec_id, embedding array<float>), generated per-partition at arbitrary
    scale for the ANN/near-dup scale lanes (round-7 VERDICT #3).  Values
    come from a splitmix-style integer hash of (vec_id, component) — fully
    deterministic, roughly uniform in [-1, 1).  Every vec_id with
    id % 50 == 1 is a tiny perturbation of id-1, planting near-duplicate
    pairs so bucketing operators have non-trivial structure at any n."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(dim, dtype=np.int64)

        def vecs(ids: np.ndarray) -> np.ndarray:
            x = (ids[:, None] * 2654435761 + (j[None, :] + 1) * 40503) & 0xFFFFFFFF
            x = ((x ^ (x >> 15)) * 2246822519) & 0xFFFFFFFF
            x = (x ^ (x >> 13)) & 0xFFFFFFFF
            return x.astype(np.float64) / 2**31 - 1.0

        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            v = vecs(ids)
            dup = (ids % 50 == 1) & (ids > 0)
            if dup.any():
                v[dup] = vecs(ids[dup] - 1) + 1e-3
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(v.astype(np.float32))}
            )

    rng = spark.range(n, numPartitions=partitions or max(8, n // 8192))
    return rng.mapInPandas(batch, schema="vec_id long, embedding array<float>")


def gen_media(spark: SparkSession, n: int) -> DataFrame:
    """T9 `media` — multimodal payload rows (operators/multimodal.MEDIA_SCHEMA):
    even ids carry raw8 images from the closed-form pixel function, odd ids
    carry REAL 16-bit PCM WAV bytes with samples

        pcm16[j] = ((id*7919 + j*31) % 4001) - 2000,  j in [0, 2048)

    — both replayable in SQL (the image via pixel_plane's formula, the audio
    via generate_series), so multimodal decode can sit on the value-exact
    gate.  Image dims are multiples of 8 with power-of-two block counts so
    8x8 box-means are exact in float32."""
    import io as _io
    import wave as _wave

    schema = (
        "media_id string, kind string, bytes binary, fmt string,"
        " w int, h int, sample_rate int, n_frames int"
    )
    n_samples, sr = 2048, 16000

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                mid = f"med{i:08d}"
                if i % 2 == 0:
                    m = i // 2
                    h = 32 if m % 2 == 0 else 64
                    w = 64 if m % 3 == 0 else 32
                    img = codecs.make_image(i, h, w, planes=3)
                    rows.append((mid, "image", codecs.encode(img, "raw8"), "raw8", w, h, 0, 0))
                else:
                    j = np.arange(n_samples, dtype=np.int64)
                    pcm16 = (((i * 7919 + j * 31) % 4001) - 2000).astype("<i2")
                    buf = _io.BytesIO()
                    with _wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(sr)
                        wf.writeframes(pcm16.tobytes())
                    rows.append((mid, "audio", buf.getvalue(), "wav", 0, 0, sr, n_samples))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "bytes", "fmt", "w", "h", "sample_rate", "n_frames",
                ],
            )

    return spark.range(n, numPartitions=max(4, n // 256)).mapInPandas(batch, schema=schema)


def parent_cell_udf(parent_res: int):
    """Vectorized cell->parent-cell column (partition-key derivation)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def parent_of(c: pd.Series) -> pd.Series:
        return pd.Series(cells.parent(c.to_numpy(np.int64), parent_res))

    return parent_of


def write_tiles_partitioned(
    spark: SparkSession, out_dir: str, n_images: int, parent_res: int = 3
) -> None:
    """North_rule layout: tiles written PARTITIONED BY the parent cell of
    their res-7 cell — Catalyst partition-prunes any query carrying a
    parent-cell predicate (tests/test_partition_layout.py)."""
    from pyspark.sql import functions as F

    tiles = gen_tiles(spark, n_images).withColumn(
        "cell_parent", parent_cell_udf(parent_res)(F.col("cell_r7"))
    )
    tiles.write.mode("overwrite").partitionBy("cell_parent").parquet(out_dir)


def write_all(spark: SparkSession, out_dir: str, n_images: int) -> None:
    """Materialize every table as parquet, images partitioned by scene cell
    parent (res 3) — the 'partition by H3 parent cell' layout (north_rule)."""
    gen_images(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/images.parquet")
    gen_scenes(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/scenes.parquet")
    gen_footprints(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/footprints.parquet")
    gen_aoi(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/aoi.parquet")
    gen_tiles(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/tiles.parquet")
    gen_dem(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/dem.parquet")
    gen_band_map(spark).write.mode("overwrite").parquet(f"{out_dir}/band_map.parquet")
    gen_qa_masks(spark, n_images).write.mode("overwrite").parquet(f"{out_dir}/qa_masks.parquet")
