"""Spectral-index registry + decode/compute kernels (mapInPandas, Arrow).

Reference: eoreader computes ~130 spyndex indices plus 4 hand-written linear
combos over loaded band arrays (/root/reference/eoreader/bands/indices.py:
102-373); any module-level function over {band: array} is an index (X1), and
parametric indices forward kwargs (X2, WDRVI alpha).  Bands are float32
reflectance after an affine DN conversion
(/root/reference/eoreader/products/optical/s2_product.py:653-722).

Here: the registry maps index name -> (needed_bands, kernel over plane dict).
``index_stats`` is the flagship pipeline — decode `bytes` inside Arrow
batches, apply the DN->reflectance affine, evaluate the index, and reduce to
per-image stats.  Per-pixel math is numpy on whole planes (vectorized); the
only Python loop is per image within a batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from eoreader_spark import codecs

# plane order fixed by band_map (datagen.gen_band_map): 0=RED 1=GREEN 2=NIR
RED, GREEN, NIR = "RED", "GREEN", "NIR"
PLANE_OF = {RED: 0, GREEN: 1, NIR: 2}

# DN -> reflectance affine, the S2-style (DN + offset)/quantif
# (/root/reference/eoreader/products/optical/s2_product.py:653-722)
REFL_OFFSET = 0.0
REFL_QUANTIF = 255.0

_EPS = 1e-12  # guard denominators; reference relies on NaN propagation instead


def _ndvi(b: dict[str, np.ndarray]) -> np.ndarray:
    return (b[NIR] - b[RED]) / (b[NIR] + b[RED] + _EPS)


def _ndwi(b: dict[str, np.ndarray]) -> np.ndarray:
    return (b[GREEN] - b[NIR]) / (b[GREEN] + b[NIR] + _EPS)


def _evi(b: dict[str, np.ndarray], g=2.5, c1=6.0, c2=7.5, L=1.0) -> np.ndarray:
    # blue-less 2-band EVI variant (reference defaults g=2.5,C1=6,C2=7.5,L=1:
    # /root/reference/eoreader/bands/indices.py:162-253)
    return g * (b[NIR] - b[RED]) / (b[NIR] + c1 * b[RED] + L + _EPS)


def _savi(b: dict[str, np.ndarray], L=0.5) -> np.ndarray:
    return (1.0 + L) * (b[NIR] - b[RED]) / (b[NIR] + b[RED] + L + _EPS)


def _wdrvi(b: dict[str, np.ndarray], alpha=0.2) -> np.ndarray:
    return (alpha * b[NIR] - b[RED]) / (alpha * b[NIR] + b[RED] + _EPS)


def _tcbri(b: dict[str, np.ndarray]) -> np.ndarray:
    # hand-written tasseled-cap-style linear combo analog
    # (/root/reference/eoreader/bands/indices.py:58-72 TCBRI)
    return 0.3037 * b[RED] + 0.2793 * b[GREEN] + 0.3279 * b[NIR]


def _gndvi(b: dict[str, np.ndarray]) -> np.ndarray:
    return (b[NIR] - b[GREEN]) / (b[NIR] + b[GREEN] + _EPS)


INDEX_REGISTRY: dict[str, tuple[list[str], Callable[..., np.ndarray]]] = {
    "NDVI": ([RED, NIR], _ndvi),
    "NDWI": ([GREEN, NIR], _ndwi),
    "EVI": ([RED, NIR], _evi),
    "SAVI": ([RED, NIR], _savi),
    "WDRVI": ([RED, NIR], _wdrvi),
    "TCBRI": ([RED, GREEN, NIR], _tcbri),
    "GNDVI": ([GREEN, NIR], _gndvi),
}

# the remainder of the spyndex-style catalog definable over the 3-plane
# (RED/GREEN/NIR) model — each a one-line vectorized kernel, same pattern as
# the reference's generated indices (/root/reference/eoreader/bands/
# indices.py:102-159 pulls these formulas from spyndex/Awesome Spectral
# Indices; constants below are the published defaults)
_EXTRA = {
    "DVI": ([NIR, RED], lambda b: b[NIR] - b[RED]),
    "RVI": ([NIR, RED], lambda b: b[NIR] / (b[RED] + _EPS)),
    "SR": ([NIR, RED], lambda b: b[NIR] / (b[RED] + _EPS)),
    "IPVI": ([NIR, RED], lambda b: b[NIR] / (b[NIR] + b[RED] + _EPS)),
    "EVI2": ([NIR, RED], lambda b: 2.5 * (b[NIR] - b[RED]) / (b[NIR] + 2.4 * b[RED] + 1.0)),
    "OSAVI": ([NIR, RED], lambda b: (b[NIR] - b[RED]) / (b[NIR] + b[RED] + 0.16)),
    "MSAVI": (
        [NIR, RED],
        lambda b: 0.5
        * (2 * b[NIR] + 1 - np.sqrt(np.maximum((2 * b[NIR] + 1) ** 2 - 8 * (b[NIR] - b[RED]), 0.0))),
    ),
    "RDVI": (
        [NIR, RED],
        lambda b: (b[NIR] - b[RED]) / np.sqrt(np.maximum(b[NIR] + b[RED], _EPS)),
    ),
    "MSR": (
        [NIR, RED],
        lambda b: (b[NIR] / (b[RED] + _EPS) - 1)
        / np.sqrt(np.maximum(b[NIR] / (b[RED] + _EPS) + 1, _EPS)),
    ),
    "TVI": (
        [NIR, RED],
        lambda b: np.sqrt(np.maximum((b[NIR] - b[RED]) / (b[NIR] + b[RED] + _EPS) + 0.5, 0.0)),
    ),
    "NLI": ([NIR, RED], lambda b: (b[NIR] ** 2 - b[RED]) / (b[NIR] ** 2 + b[RED] + _EPS)),
    "MNLI": (
        [NIR, RED],
        lambda b: 1.5 * (b[NIR] ** 2 - b[RED]) / (b[NIR] ** 2 + b[RED] + 0.5 + _EPS),
    ),
    "GRVI": ([GREEN, RED], lambda b: (b[GREEN] - b[RED]) / (b[GREEN] + b[RED] + _EPS)),
    "NGRDI": ([GREEN, RED], lambda b: (b[GREEN] - b[RED]) / (b[GREEN] + b[RED] + _EPS)),
    "RGR": ([GREEN, RED], lambda b: b[RED] / (b[GREEN] + _EPS)),
    "CIG": ([NIR, GREEN], lambda b: b[NIR] / (b[GREEN] + _EPS) - 1.0),
    "GCVI": ([NIR, GREEN], lambda b: b[NIR] / (b[GREEN] + _EPS) - 1.0),
    "GRNDVI": (
        [NIR, GREEN, RED],
        lambda b: (b[NIR] - (b[GREEN] + b[RED])) / (b[NIR] + b[GREEN] + b[RED] + _EPS),
    ),
    "CVI": ([NIR, RED, GREEN], lambda b: b[NIR] * b[RED] / (b[GREEN] ** 2 + _EPS)),
    "GARI": (
        [NIR, GREEN, RED],
        lambda b: (b[NIR] - (b[GREEN] - 1.7 * (b[RED] - b[GREEN])))
        / (b[NIR] + (b[GREEN] - 1.7 * (b[RED] - b[GREEN])) + _EPS),
    ),
    "GBNDVI": (
        [NIR, GREEN, RED],
        lambda b: (b[NIR] - (b[GREEN] + b[RED])) / (b[NIR] + b[GREEN] + b[RED] + _EPS),
    ),
    "AVI": (
        [NIR, RED],
        lambda b: np.cbrt(np.maximum(b[NIR] * (1.0 - b[RED]) * (b[NIR] - b[RED]), 0.0)),
    ),
    "SIPI2": (
        [NIR, GREEN, RED],
        lambda b: (b[NIR] - b[GREEN]) / (b[NIR] - b[RED] + _EPS),
    ),
    "TCGRE": (
        [RED, GREEN, NIR],
        lambda b: -0.2848 * b[RED] - 0.2435 * b[GREEN] + 0.5436 * b[NIR],
    ),
    "TCWET": (
        [RED, GREEN, NIR],
        lambda b: 0.1509 * b[RED] + 0.1973 * b[GREEN] + 0.3279 * b[NIR],
    ),
}
INDEX_REGISTRY.update(_EXTRA)


def register_index(name: str, needs: list[str], fn: Callable[..., np.ndarray]) -> None:
    """X1 extension point: user-registered index kernels
    (reference: /root/reference/eoreader/bands/indices.py:337-373)."""
    INDEX_REGISTRY[name] = (needs, fn)


def needed_bands(index_names: list[str]) -> list[str]:
    """NEEDED_BANDS dependency expansion
    (/root/reference/eoreader/products/product.py:1238-1240)."""
    out: list[str] = []
    for n in index_names:
        for b in INDEX_REGISTRY[n][0]:
            if b not in out:
                out.append(b)
    return out


def decode_planes(pdf: pd.DataFrame) -> list[np.ndarray]:
    """Decode a batch's `bytes` column -> list of (PLANES,h,w) float32 arrays."""
    out = []
    for data, fmt, h, w in zip(pdf["bytes"], pdf["fmt"], pdf["h"], pdf["w"]):
        out.append(codecs.decode(bytes(data), fmt, int(h), int(w)).astype(np.float32))
    return out


def to_reflectance(plane: np.ndarray) -> np.ndarray:
    return (plane + REFL_OFFSET) / REFL_QUANTIF


def index_stats(
    images: DataFrame, index_names: list[str], params: dict[str, dict] | None = None
) -> DataFrame:
    """images -> (image_id, index_name, mean, min, max) per index.

    One decode per image feeds every requested index (the reference's
    'open them only one time!' CSE,
    /root/reference/eoreader/products/product.py:1242-1247).
    """
    params = params or {}
    names = list(index_names)
    # capture the kernels in the task closure — executors re-import the module,
    # so driver-side register_index() mutations must travel with the plan
    entries = {n: INDEX_REGISTRY[n] for n in names}
    needs = needed_bands(names)
    schema = "image_id string, index_name string, mean double, min double, max double"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = []
            for (iid,), img in zip(pdf[["image_id"]].itertuples(index=False), decode_planes(pdf)):
                bands = {b: to_reflectance(img[PLANE_OF[b]]) for b in needs}
                for n in names:
                    _, fn = entries[n]
                    v = fn(bands, **params.get(n, {})).astype(np.float64)
                    rows.append((iid, n, float(v.mean()), float(v.min()), float(v.max())))
            yield pd.DataFrame(rows, columns=["image_id", "index_name", "mean", "min", "max"])

    return images.select("image_id", "bytes", "fmt", "h", "w").mapInPandas(batch, schema=schema)


def oracle_index_stats(image_seed: int, h: int, w: int, index_names: list[str]) -> dict:
    """Numpy closed-form oracle for tests: same math straight from the pixel fn."""
    img = codecs.make_image(image_seed, h, w).astype(np.float32)
    bands = {b: to_reflectance(img[PLANE_OF[b]]) for b in PLANE_OF}
    out = {}
    for n in index_names:
        _, fn = INDEX_REGISTRY[n]
        v = fn(bands).astype(np.float64)
        out[n] = (float(v.mean()), float(v.min()), float(v.max()))
    return out
