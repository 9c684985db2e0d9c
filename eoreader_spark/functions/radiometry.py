"""Radiometric scalar kernels + invalid-pixel cleaning (SURVEY §2.8 / §2.2).

All operators work on tile rows with array<float> pixel columns and stay
JVM-side via higher-order array functions (F.transform / F.zip_with —
whole-stage codegen, no Python) except where noted.

Reference file:line map:
- dn_to_reflectance: (DN + offset)/quantif with baseline offset
  (/root/reference/eoreader/products/optical/s2_product.py:653-722);
  Landsat affine c_mul*DN + c_add (landsat_product.py:1379-1425)
- radiance_to_bt: TB = K2 / ln(K1/L + 1) (landsat_product.py:1310-1377)
- toa_rad_to_refl: rho = pi d^2 L / (E0 cos(theta_z))
  (optical_product.py:752-820)
- to_db / from_db: SNAP LinearToFromdB (grd_s1_preprocess_default.xml)
- bit_plane / clean_invalid: QA bitfield decode + mask union
  (landsat_product.py:1427-1514; CleanMethod optical_product.py:48-67)
- clip_reflectance: band_arr.clip(min=0) (optical_product.py:335-338)
- convert_to_uint16: quantile guard + x10000 + fillna(65535)
  (/root/reference/eoreader/utils.py:461-515)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UINT16_NODATA = 65535
UINT16_SCALE = 10000.0


def dn_to_reflectance(px: Column | str, offset: float = 0.0, quantif: float = 255.0) -> Column:
    """F2: elementwise (DN + offset) / quantif over an array column."""
    return F.transform(px, lambda x: (x + F.lit(float(offset))) / F.lit(float(quantif)))


def gain_bias(px: Column | str, gain: float, bias: float) -> Column:
    """F2 Landsat-style affine: gain*DN + bias."""
    return F.transform(px, lambda x: x * F.lit(float(gain)) + F.lit(float(bias)))


def radiance_to_bt(px: Column | str, k1: float, k2: float) -> Column:
    """F3: brightness temperature TB = K2 / ln(K1/L + 1)."""
    return F.transform(px, lambda L: F.lit(float(k2)) / F.log(F.lit(float(k1)) / L + 1.0))


def toa_rad_to_refl(px: Column | str, earth_sun_dist: float, e0: float, sun_zenith_deg: float) -> Column:
    """F4: rho = pi * d^2 * L / (E0 * cos(theta_z)); scalars broadcast."""
    coef = math.pi * earth_sun_dist**2 / (e0 * math.cos(math.radians(sun_zenith_deg)))
    return F.transform(px, lambda L: L * F.lit(coef))


def scale_factor(px: Column | str, factor: float) -> Column:
    """F5/F6: plain multiplicative coefficient."""
    return F.transform(px, lambda x: x * F.lit(float(factor)))


S2_DEFAULT_QUANTIF = 10000.0
S2_OFFSET_BASELINE_4 = -1000.0


def s2_radio_offset(processing_baseline: float | str, mtd_offset: float | None = None) -> float:
    """F2 S2 processing-baseline-dependent DN offset (the reference reads it
    from the datatake MTD per band, /root/reference/eoreader/products/
    optical/s2_product.py:695-716): baselines < 04.00 carry no offset;
    >= 04.00 apply RADIO_ADD_OFFSET / BOA_ADD_OFFSET — uniformly -1000 in
    every published product, the default when no MTD value is supplied.
    Feed the result into ``dn_to_reflectance(px, offset=..., quantif=...)``."""
    pb = float(str(processing_baseline).replace("_", "."))
    if pb < 4.0:
        return 0.0
    return S2_OFFSET_BASELINE_4 if mtd_offset is None else float(mtd_offset)


def earth_sun_distance(date) -> float:
    """F4 Sun-Earth distance in AU from the acquisition date — the
    reference's ephemeris-free fallback formula
    (/root/reference/eoreader/products/optical/optical_product.py:785-791,
    the published Copernicus TOA-reflectance recipe): julian day counted
    from 1950-01-01, d = 1 - 0.01673*cos(0.0172*(jd - 2)).  Pass the result
    as ``toa_rad_to_refl(..., earth_sun_dist=...)``."""
    import datetime as _dt

    ref = _dt.datetime(1950, 1, 1)
    d0 = date if isinstance(date, _dt.datetime) else _dt.datetime(date.year, date.month, date.day)
    jd = (d0.replace(tzinfo=None) - ref).days + 1
    return 1.0 - 0.01673 * math.cos(0.0172 * (jd - 2))


# F5: SLSTR-style per-band-per-view radiance-adjustment coefficient SETS.
# Values are the PUBLIC product-notice table S3.PN-SLSTR-L1.08 (nadir /
# oblique corrections for the solar channels), mirrored from the reference's
# SlstrRadAdjust enum usage (/root/reference/eoreader/products/optical/
# s3_slstr_product.py:801-850): coefficient looked up by (band_id, view),
# bands without an entry pass through unchanged (BT channels, flags).
SLSTR_RAD_ADJUST: dict[str, dict[tuple[str, str], float]] = {
    "NONE": {},
    "S3_PN_SLSTR_L1_08": {
        ("S1", "n"): 0.97, ("S2", "n"): 0.98, ("S3", "n"): 0.98,
        ("S5", "n"): 1.11, ("S6", "n"): 1.13,
        ("S1", "o"): 0.94, ("S2", "o"): 0.95, ("S3", "o"): 0.95,
        ("S5", "o"): 1.04, ("S6", "o"): 1.07,
    },
}


def _mul_by(c: float):
    """Single-param lambda factory for F.transform (a 2-param lambda would be
    read as (element, index))."""
    lit = F.lit(c)
    return lambda x: x * lit


def rad_adjust_coef(
    band_id: str | None, view: str | None,
    rad_adjust: str | dict[tuple[str, str], float] = "S3_PN_SLSTR_L1_08",
) -> float:
    """Coefficient for (band_id, view) from a named set or a user table
    (the SlstrRadAdjustTuple analog); 1.0 when the band has no entry."""
    table = SLSTR_RAD_ADJUST[rad_adjust] if isinstance(rad_adjust, str) else rad_adjust
    if band_id is None or view is None:
        return 1.0
    return float(table.get((band_id, view), 1.0))


def to_db(px: Column | str) -> Column:
    """F10: 10*log10(x)."""
    return F.transform(px, lambda x: F.lit(10.0) * F.log10(x))


def from_db(px: Column | str) -> Column:
    return F.transform(px, lambda x: F.pow(F.lit(10.0), x / 10.0))


def clip_reflectance(px: Column | str, lo: float = 0.0) -> Column:
    """P6: clip(min=0) after reflectance conversion.  NULL/NaN (masked
    invalid pixels) pass through UNCHANGED — Spark's greatest() skips nulls,
    which would silently resurrect masked pixels as 0.0 reflectance; the
    reference's numpy clip preserves NaN (optical_product.py:335-338)."""
    return F.transform(
        px,
        lambda x: F.when(x.isNull() | F.isnan(x), x).otherwise(
            F.greatest(x, F.lit(float(lo)))
        ),
    )


def bit_plane(qa: Column | str, bit: int) -> Column:
    """F7: extract bit ``bit`` of an int array -> int array of 0/1."""
    return F.transform(qa, lambda x: F.shiftright(x, bit).bitwiseAND(F.lit(1)))


def mask_union(*masks: Column) -> Column:
    """U1: elementwise OR of 0/1 int arrays."""
    out = masks[0]
    for m in masks[1:]:
        out = F.zip_with(out, m, lambda a, b: F.greatest(a, b))
    return out


def apply_mask(px: Column | str, mask: Column | str, nodata=None) -> Column:
    """P4: where mask != 0 -> nodata (NULL = NaN-on-decode), else px."""
    nd = F.lit(nodata).cast("float") if nodata is not None else F.lit(None).cast("float")
    return F.zip_with(px, mask, lambda x, m: F.when(m == 0, x).otherwise(nd))


def threshold(px: Column | str, cutoff: float) -> Column:
    """F8: px > cutoff -> 1 else 0 (cloud-probability classify)."""
    return F.transform(px, lambda x: F.when(x > F.lit(float(cutoff)), 1).otherwise(0))


def clean_invalid(
    tiles_px: DataFrame,
    qa_masks: DataFrame,
    method: str = "clean",
    px_col: str = "px",
) -> DataFrame:
    """P5 invalid-pixel cleaning at 3 levels (CleanMethod RAW/NODATA/CLEAN,
    optical_product.py:48-67): RAW = untouched; NODATA = bit0 only;
    CLEAN = union(nodata, dropped, saturated) masked out.

    Join is the J7-style equi-join on the tile key; mask math is pure
    JVM array functions.
    """
    method = method.lower()
    if method == "raw":
        return tiles_px
    joined = tiles_px.join(qa_masks, ["image_id", "tile_x", "tile_y"])
    if method == "nodata":
        mask = bit_plane("qa", 0)
    elif method == "clean":
        mask = mask_union(bit_plane("qa", 0), bit_plane("qa", 1), bit_plane("qa", 2))
    else:
        raise ValueError(f"unknown clean method: {method}")
    return joined.withColumn(px_col, apply_mask(px_col, mask)).drop("qa")


def convert_to_uint16(tiles_px: DataFrame, px_col: str = "px") -> DataFrame:
    """S10 stack sink conversion: guard on the global 0.1% quantile (negative
    -> keep float semantics, here: clamp), then x10000, nodata 65535, uint16
    range check via percentile_approx + conditional cast."""
    q = tiles_px.select(
        F.expr(f"percentile_approx(array_min({px_col}), 0.001)").alias("q")
    ).first()["q"]
    if q is not None and q < -0.1:
        # reference keeps float32 when quantile check fails (utils.py:482-492)
        return tiles_px.withColumn("dtype", F.lit("float32"))
    # clip small negatives (]-0.1, 0], allowed through the quantile guard) to
    # 0 before scaling — matching the reference's clip-to-0 (utils.py:492-497);
    # without it a -0.05 reflectance would become -500 in a uint16 column
    scaled = F.transform(
        px_col,
        lambda x: F.when(x.isNull() | F.isnan(x), F.lit(UINT16_NODATA))
        .otherwise(F.least(F.round(F.greatest(x, F.lit(0.0)) * UINT16_SCALE), F.lit(65534.0)))
        .cast("int"),
    )
    return tiles_px.withColumn(px_col, scaled).withColumn("dtype", F.lit("uint16"))
