"""Canonical band vocabulary: names, aliases, per-constellation plane layouts.

Mirrors the reference's band-name nomenclature
(/root/reference/eoreader/bands/band_names.py:137-424 SpectralBandNames +
SarBandNames, :551-560 DemBandNames, :839-859 Sentinel2L2ABands) and its
alias-resolution semantics (/root/reference/eoreader/bands/__init__.py:556-646
``to_band``: enum name, enum value, or common id string all resolve to the
canonical band).  The reference keys per-product band numbers off these names
("each product will set their band number in regard to their corresponding
name"); here the same role is played by LAYOUTS: constellation-class ->
ordered list of canonical names = the plane order of the encoded image.

Everything below is public knowledge (Sentinel-2/Landsat band naming, the
spyndex/Awesome-Spectral-Indices short names, SAR polarizations).
"""

from __future__ import annotations

# ------------------------------------------------------------ canonical names
# Optical spectral bands (S2-based nomenclature, band_names.py:161-214)
SPECTRAL_NAMES = [
    "CA", "BLUE", "DEEP_BLUE", "GREEN", "GREEN_1", "YELLOW", "RED",
    "VRE_1", "VRE_2", "VRE_3", "NIR", "NARROW_NIR", "WV", "SWIR_CIRRUS",
    "SWIR_1", "SWIR_2", "TIR_1", "TIR_2", "PAN",
]
# SAR polarization bands (band_names.py:387-424); *_DSPK resolved by suffix
SAR_NAMES = ["VV", "VH", "HH", "HV", "RH", "RV"]
# S2-L2A quality-assurance bands (band_names.py:839-859)
L2A_NAMES = ["AOT", "WVP", "SCL"]
DEM_BANDS = {"DEM", "SLOPE", "HILLSHADE"}
MASK_BANDS = {"NODATA_MASK", "CLOUD_MASK", "SHADOW_MASK", "ALL_MASK"}
# QA-derived classification bands (need qa_masks, carry class codes rather
# than 0/1 masks, excluded from uint16 pixel conversion).  SCL is the S2-L2A
# scene classification.
DERIVED_MASK_BANDS = {"SCL", "QA_PIXEL"}

# ----------------------------------------------------- per-sensor mask bands
# The reference enumerates dozens of per-sensor mask bands
# (/root/reference/eoreader/bands/band_names.py:569-835: S2MaskBandNames,
# LandsatMaskBandNames, DimapV2MaskBandNames, PlanetMaskBandNames,
# HlsMaskBandNames, S2TheiaMaskBandNames, VenusMaskBandNames).  Here each
# name carries a DERIVATION over the engine's synthetic 7-bit qa bitfield
# (bit 0 nodata, 1 dropped/degraded, 2 saturated, 5 cloud, 6 shadow/snow):
#   ('bits', (b,...))  -> 0/1, union of the listed bits (masked where set)
#   ('clear', (b,...)) -> 0/1, 1 where NONE of the listed bits is set
#   ('prob', b)        -> 0/100 probability plane (bit * 100)
# Snow-class masks share the shadow bit plane (the synthetic qa has no
# dedicated snow bit — documented divergence); angle rasters (SAA/SZA/
# VAA/VZA) are NOT mask bands here: sun-angle grids live in the T9 table
# (operators.raster.mean_sun_angles).
SENSOR_MASK_DERIVATION: dict[str, tuple] = {
    # Sentinel-2 (S2MaskBandNames) — legacy + processing baseline >= 04.00
    "DETFOO": ("clear", (0,)),         # detector footprint = has data
    "TECQUA": ("bits", (1, 2)),        # technical quality
    "DEFECT": ("bits", (1,)),
    "NODATA": ("bits", (0,)),
    "SATURA": ("bits", (2,)),
    "MSK_QUALIT_ANC_LOST": ("bits", (1,)),
    "MSK_QUALIT_ANC_DEG": ("bits", (1,)),
    "MSK_QUALIT_MSI_LOST": ("bits", (1,)),
    "MSK_QUALIT_MSI_DEG": ("bits", (1,)),
    "MSK_QUALIT_QT_DEFECTIVE_PIXELS": ("bits", (1,)),
    "MSK_QUALIT_QT_NODATA_PIXELS": ("bits", (0,)),
    "MSK_QUALIT_QT_PARTIALLY_CORRECTED_PIXELS": ("bits", (1,)),
    "MSK_QUALIT_QT_SATURATED_PIXELS": ("bits", (2,)),
    "MSK_CLASSI_OPAQUE": ("bits", (5,)),
    "MSK_CLASSI_CIRRUS": ("bits", (5,)),
    "MSK_CLASSI_SNOW_ICE": ("bits", (6,)),
    "CLDPRB": ("prob", 5),             # L2A cloud probability
    "SNWPRB": ("prob", 6),             # L2A snow probability
    # Landsat collection 1/2 (LandsatMaskBandNames)
    "QA_RADSAT": ("bits", (2,)),
    "SR_QA_AEROSOL": ("bits", (1,)),
    "SR_CLOUD_QA": ("bits", (5,)),
    "ST_QA": ("bits", (1,)),
    # DIMAP v2 / Pleiades-class (DimapV2MaskBandNames)
    "CLD": ("bits", (5,)),
    "DET": ("bits", (1,)),
    "QTE": ("bits", (1, 2)),
    "ROI": ("clear", (0,)),
    "SLT": ("bits", (1,)),
    "SNW": ("bits", (6,)),
    "VIS": ("bits", (0,)),
    # Planet UDM2 (PlanetMaskBandNames)
    "CLEAR": ("clear", (0, 1, 2, 5, 6)),
    "SNOW": ("bits", (6,)),
    "SHADOW": ("bits", (6,)),
    "LIGHT_HAZE": ("bits", (5,)),
    "HEAVY_HAZE": ("bits", (5,)),
    "CLOUD": ("bits", (5,)),
    "CONFIDENCE": ("prob", 0),
    "UNUSABLE": ("bits", (0, 1, 2)),
    "UDM": ("bits", (0,)),
    # HLS (HlsMaskBandNames)
    "FMASK": ("bits", (0, 2, 5, 6)),
    # S2 Theia / Venus (S2TheiaMaskBandNames, VenusMaskBandNames)
    "DFP": ("bits", (1,)),
    "EDG": ("bits", (0,)),
    "SAT": ("bits", (2,)),
    "MG2": ("bits", (5, 6)),
    "IAB": ("bits", (1,)),
    "CLM": ("bits", (5,)),
    "PIX": ("bits", (1,)),
    "USI": ("clear", (0, 1, 2)),
}

_S2_MASKS = frozenset({
    "DETFOO", "TECQUA", "DEFECT", "NODATA", "SATURA",
    "MSK_QUALIT_ANC_LOST", "MSK_QUALIT_ANC_DEG", "MSK_QUALIT_MSI_LOST",
    "MSK_QUALIT_MSI_DEG", "MSK_QUALIT_QT_DEFECTIVE_PIXELS",
    "MSK_QUALIT_QT_NODATA_PIXELS", "MSK_QUALIT_QT_PARTIALLY_CORRECTED_PIXELS",
    "MSK_QUALIT_QT_SATURATED_PIXELS", "MSK_CLASSI_OPAQUE",
    "MSK_CLASSI_CIRRUS", "MSK_CLASSI_SNOW_ICE",
})

# layout-class -> which sensor masks exist for it (the reference's per-product
# mask availability: _get_band_path raises for foreign masks)
SENSOR_MASK_BANDS: dict[str, frozenset[str]] = {
    "S2_L2A": _S2_MASKS | {"CLDPRB", "SNWPRB"},   # CLDPRB/SNWPRB are L2A-only
    "L8_OLI": frozenset({"QA_RADSAT", "SR_QA_AEROSOL", "SR_CLOUD_QA", "ST_QA"}),
    "PLD_MS": frozenset({"CLD", "DET", "QTE", "ROI", "SLT", "SNW", "VIS"}),
    "PS_MS": frozenset({
        "CLEAR", "SNOW", "SHADOW", "LIGHT_HAZE", "HEAVY_HAZE", "CLOUD",
        "CONFIDENCE", "UNUSABLE", "UDM",
    }),
    "HLS": frozenset({"FMASK"}),
    "S2_THEIA": frozenset({"DFP", "EDG", "SAT", "MG2", "IAB", "CLM"}),
    "VENUS": frozenset({"CLM", "EDG", "SAT", "MG2", "IAB", "PIX", "USI"}),
}

ALL_PLANE_BANDS = set(SPECTRAL_NAMES) | set(SAR_NAMES) | {"AOT", "WVP"}

# --------------------------------------------------------------------- aliases
# id-string -> canonical name.  Sources: S2 band ids (B01..B12, B8A), Landsat
# OLI/TIRS ids, S3-OLCI Oa ids, spyndex short names (A/B/G/R/RE1../N/N2/S1/S2/
# T1/T2), long enum values from band_names.py.
ALIASES: dict[str, str] = {
    # Sentinel-2 ids (also Landsat-8/9 equivalents where they coincide)
    "B01": "CA", "B02": "BLUE", "B03": "GREEN", "B04": "RED",
    "B05": "VRE_1", "B06": "VRE_2", "B07": "VRE_3", "B08": "NIR",
    "B8A": "NARROW_NIR", "B09": "WV", "B10": "SWIR_CIRRUS",
    "B11": "SWIR_1", "B12": "SWIR_2",
    "01": "CA", "02": "BLUE", "03": "GREEN", "04": "RED", "05": "VRE_1",
    "06": "VRE_2", "07": "VRE_3", "08": "NIR", "8A": "NARROW_NIR",
    "09": "WV", "10": "SWIR_CIRRUS", "11": "SWIR_1", "12": "SWIR_2",
    # Landsat TIRS thermal ids
    "B6": "TIR_1", "B10L": "TIR_1",
    # spyndex / Awesome-Spectral-Indices short names
    "A": "CA", "B": "BLUE", "G": "GREEN", "G1": "GREEN_1", "Y": "YELLOW",
    "R": "RED", "RE1": "VRE_1", "RE2": "VRE_2", "RE3": "VRE_3",
    "N": "NIR", "N2": "NARROW_NIR", "S1": "SWIR_1", "S2": "SWIR_2",
    "T1": "TIR_1", "T2": "TIR_2",
    # long enum values (band_names.py right-hand sides)
    "COASTAL_AEROSOL": "CA", "VEGETATION_RED_EDGE_1": "VRE_1",
    "VEGETATION_RED_EDGE_2": "VRE_2", "VEGETATION_RED_EDGE_3": "VRE_3",
    "WATER_VAPOUR": "WV", "THERMAL_IR_1": "TIR_1", "THERMAL_IR_2": "TIR_2",
    "PANCHROMATIC": "PAN", "GREEN_I": "GREEN_1",
    # S3-OLCI ids (subset used by the synthetic layouts)
    "Oa01": "CA", "Oa04": "BLUE", "Oa06": "GREEN", "Oa08": "RED",
    "Oa11": "VRE_2", "Oa17": "NIR", "Oa20": "WV",
    # CloudsBandNames (band_names.py:525-548) -> the engine's mask planes
    "CLOUDS": "CLOUD_MASK", "RAW CLOUDS": "CLOUD_MASK", "RAW_CLOUDS": "CLOUD_MASK",
    "SHADOWS": "SHADOW_MASK", "ALL CLOUDS": "ALL_MASK", "ALL_CLOUDS": "ALL_MASK",
    "CIRRUS": "CLOUD_MASK",
    # Landsat raw QA band ids (LandsatMaskBandNames, band_names.py:639-671)
    "BQA": "QA_PIXEL",
}

# ------------------------------------------------------------- plane layouts
# constellation-class -> ordered canonical names = plane order in the encoded
# image (the per-product band_number table of the reference, e.g.
# s2_product.py:279-348).  LEGACY3 is the round-1 default kept for
# compatibility with existing tables/fixtures.
LAYOUTS: dict[str, list[str]] = {
    "LEGACY3": ["RED", "GREEN", "NIR"],
    # Sentinel-2 L2A: 12 spectral planes + AOT/WVP quality planes (SCL is
    # derived from the QA bitfield, see loader).  60 m B10 is absent in L2A.
    "S2_L2A": [
        "CA", "BLUE", "GREEN", "RED", "VRE_1", "VRE_2", "VRE_3", "NIR",
        "NARROW_NIR", "WV", "SWIR_1", "SWIR_2", "AOT", "WVP",
    ],
    # Landsat-8/9 OLI+TIRS
    "L8_OLI": [
        "CA", "BLUE", "GREEN", "RED", "NIR", "SWIR_1", "SWIR_2",
        "SWIR_CIRRUS", "TIR_1", "TIR_2", "PAN",
    ],
    # Sentinel-1 IW GRD dual-pol
    "S1_GRD": ["VV", "VH"],
    # RADARSAT-class dual-pol HH/HV
    "RS2_SLC": ["HH", "HV"],
    # Pleiades-class VHR: PAN + 4-band MS
    "PLD_MS": ["PAN", "BLUE", "GREEN", "RED", "NIR"],
    # PlanetScope 4-band MS (UDM2 mask family)
    "PS_MS": ["BLUE", "GREEN", "RED", "NIR"],
    # Harmonized Landsat-Sentinel 30 m (Fmask family)
    "HLS": ["CA", "BLUE", "GREEN", "RED", "NIR", "SWIR_1", "SWIR_2"],
    # Sentinel-2 Theia L2A (FRE surface reflectance, no AOT/WVP planes)
    "S2_THEIA": [
        "BLUE", "GREEN", "RED", "VRE_1", "VRE_2", "VRE_3", "NIR",
        "NARROW_NIR", "SWIR_1", "SWIR_2",
    ],
    # Venus VIS/NIR 12-band (Theia mask family)
    "VENUS": [
        "CA", "BLUE", "GREEN", "GREEN_1", "YELLOW", "RED", "VRE_1",
        "VRE_2", "VRE_3", "NIR", "NARROW_NIR", "WV",
    ],
    # Sentinel-3 SLSTR: 5 solar channels (S1-S3, S5-S6) + 2 BT channels
    "S3_SLSTR": ["GREEN", "RED", "NIR", "SWIR_1", "SWIR_2", "TIR_1", "TIR_2"],
}

# canonical name -> SLSTR band id (S1 555nm, S2 659nm, S3 865nm, S5 1.6um,
# S6 2.25um — the solar channels the radiance adjustment applies to;
# reference keys coefficients by this id, s3_slstr_product.py:836-841)
SLSTR_BAND_IDS = {"GREEN": "S1", "RED": "S2", "NIR": "S3", "SWIR_1": "S5", "SWIR_2": "S6"}


def plane_of(layout: str | list[str] | dict[str, int]) -> dict[str, int]:
    """-> {canonical band: plane index} for a layout name, explicit band
    order, or an already-built map."""
    if isinstance(layout, dict):
        return dict(layout)
    names = LAYOUTS[layout] if isinstance(layout, str) else list(layout)
    return {b: i for i, b in enumerate(names)}


class BandError(ValueError):
    """Invalid band request (reference: InvalidTypeError, bands/__init__.py:636)."""


def resolve(name: str, extra: set[str] | None = None) -> str:
    """Alias resolution to the canonical vocabulary (P1).

    'B04'/'04'/'red'/'RED' -> 'RED'; '<sar>_DSPK' keeps the suffix with its
    base resolved; DEM/mask/L2A names pass through; names in ``extra`` (e.g.
    the index registry) resolve verbatim.  Raises BandError otherwise.
    """
    key = str(name).strip()
    if extra and key in extra:
        return key
    up = key.upper()
    if up.endswith("_DSPK"):
        base = resolve(up[:-5])
        if base not in ALL_PLANE_BANDS:
            raise BandError(f"_DSPK requires a plane band base, got {base!r}")
        return base + "_DSPK"
    if (
        up in ALL_PLANE_BANDS or up in DEM_BANDS or up in MASK_BANDS
        or up in DERIVED_MASK_BANDS or up in SENSOR_MASK_DERIVATION
    ):
        return up
    if key in ALIASES:
        return ALIASES[key]
    if up in ALIASES:
        return ALIASES[up]
    # case-insensitive alias fallback (reference accepts 'Green', 'vh'...)
    for k, v in ALIASES.items():
        if k.upper() == up:
            return v
    raise BandError(f"cannot resolve band: {name!r}")
