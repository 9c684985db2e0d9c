"""Generate golden fixtures with the PURE-PYTHON oracle (no Spark) —
the engine tests compare against these files bit-for-bit / allclose,
mirroring the reference's golden GeoTIFF/GeoJSON strategy
(/root/reference/ci/on_push/test_satellites.py:209-370).

Usage: python tools/make_golden.py   (writes tests/golden/*.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eoreader_spark import cells, codecs, datagen  # noqa: E402
from eoreader_spark.functions import indices  # noqa: E402
from eoreader_spark.spatial import pip  # noqa: E402

N = 60
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"


def aoi_rows(n_images: int) -> list[tuple[str, str]]:
    """Re-derive the AOI set exactly as datagen.gen_aoi does (same math)."""
    n_aoi = max(16, n_images // 50)
    rows = []
    for j in range(n_aoi):
        sx, sy = datagen.HOT_SPOTS[j % len(datagen.HOT_SPOTS)]
        h = (j * 40503) & 0xFFFF
        cx = sx + ((h % 100) / 100.0 - 0.5) * 2.0
        cy = sy + (((h // 100) % 100) / 100.0 - 0.5) * 2.0
        half = [0.05, 0.3, 1.5][j % 3]
        if j % 20 == 4:
            nx = 1 << (datagen.CELL_RES + 1)
            cx = round((cx + 180.0) / 360.0 * nx) / nx * 360.0 - 180.0
        ring = np.array(
            [(cx - half, cy - half), (cx + half, cy - half),
             (cx + half, cy + half), (cx - half, cy + half)]
        )
        rows.append((f"aoi{j:06d}", datagen.ring_wkt(ring)))
    return rows


def golden_assign(n: int) -> list[list]:
    out = []
    for aoi_id, wkt in aoi_rows(n):
        ring = pip.parse_wkt_polygon(wkt)
        for i in range(n):
            h, w = datagen.image_dims(i)
            bx0, by0, bx1, by1 = (
                float(v) for v in np.concatenate(datagen.scene_bbox(np.array([i])))
            )
            ntx, nty = w // datagen.TILE, h // datagen.TILE
            dx, dy = (bx1 - bx0) / ntx, (by1 - by0) / nty
            for ty in range(nty):
                for tx in range(ntx):
                    cx = bx0 + tx * dx + dx / 2
                    cy = by1 - (ty + 1) * dy + dy / 2
                    if pip.points_in_polygon(np.array([cx]), np.array([cy]), ring)[0]:
                        out.append([aoi_id, f"img{i:012d}", tx, ty])
    return sorted(out)


def golden_index(n: int) -> dict:
    names = ["NDVI", "NDWI", "EVI", "SAVI", "TCBRI", "GNDVI"]
    out = {}
    for i in range(n):
        if datagen.image_fmt(i) == "jpeg":
            continue  # lossy rows checked by PSNR, not exact stats
        h, w = datagen.image_dims(i)
        stats = indices.oracle_index_stats(i, h, w, names)
        out[f"img{i:012d}"] = {k: [round(v, 10) for v in vals] for k, vals in stats.items()}
    return out


def golden_knn(n: int, k: int = 3, n_queries: int = 10) -> dict:
    ids = np.arange(n)
    lon, lat = datagen.scene_center(ids)
    out = {}
    for q in range(n_queries):
        dlon = np.abs(lon - lon[q])
        dlon = np.minimum(dlon, 360.0 - dlon) * np.cos(np.radians(lat[q]))
        d2 = dlon**2 + (lat - lat[q]) ** 2
        order = sorted(range(n), key=lambda j: (d2[j], j))[:k]
        out[f"img{q:012d}"] = [f"img{j:012d}" for j in order]
    return out


def golden_extent(n: int) -> dict:
    out = {}
    for i in range(n):
        out[f"img{i:012d}"] = [
            round(float(v), 10) for v in np.concatenate(datagen.scene_bbox(np.array([i])))
        ]
    return out


def golden_phash(n: int) -> dict:
    out = {}
    for i in range(n):
        h, w = datagen.image_dims(i)
        out[f"img{i:012d}"] = datagen.phash_of(codecs.make_image(i, h, w))
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "tile_assign.json").write_text(json.dumps(golden_assign(N)))
    (OUT / "index_stats.json").write_text(json.dumps(golden_index(N), indent=0))
    (OUT / "knn.json").write_text(json.dumps(golden_knn(N), indent=0))
    (OUT / "extent.json").write_text(json.dumps(golden_extent(N), indent=0))
    (OUT / "phash.json").write_text(json.dumps(golden_phash(N), indent=0))
    print(f"golden fixtures written to {OUT} (n={N})")


if __name__ == "__main__":
    main()
