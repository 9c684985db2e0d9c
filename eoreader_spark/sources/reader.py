"""Constellation detection / catalog dispatch — the Reader.open analog.

Reference: eoreader detects which of ~45 constellations a product belongs to
by regex over file names plus metadata-presence tests
(/root/reference/eoreader/reader.py:308-375 regex tables, :473-952 open,
:1009-1087 dispatch), then instantiates the right Product subclass.

Spark form: detection is a COLUMN EXPRESSION — a broadcast pattern table
folded into one when/otherwise chain of JVM regexes (rlike), applied to a
scene-name column in a single codegen'd projection.  The "Product subclass"
becomes per-constellation parameters (plane map, reflectance coefficients)
joined from the band_map dictionary; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered (constellation, name regex) — first match wins, like the
# reference's constellation iteration order (reader.py:740-826)
NAME_PATTERNS: list[tuple[str, str]] = [
    ("S2", r"^S2[ABC]_MSIL(1C|2A)_\d{8}T\d{6}"),
    ("S1", r"^S1[ABC]_(IW|EW|SM|WV)_(GRD|SLC|OCN)"),
    ("L8", r"^L[CO]08_L[12][A-Z]{2}_\d{6}_\d{8}"),
    ("PLD", r"^DS_PHR1[AB]_\d{15}"),
    ("S3", r"^S3[AB]_(OL|SL)_[12]_"),
]


def constellation_of(name: Column | str) -> Column:
    """name -> constellation string or NULL (no match)."""
    expr = F.lit(None).cast("string")
    for const, pat in reversed(NAME_PATTERNS):
        expr = F.when(F.col(name).rlike(pat) if isinstance(name, str) else name.rlike(pat),
                      F.lit(const)).otherwise(expr)
    return expr


def detect(df: DataFrame, name_col: str = "product_name", out_col: str = "constellation") -> DataFrame:
    """S1 scan: tag every row with its detected constellation; rows matching
    nothing keep NULL (the reference raises; a table engine filters/routes)."""
    return df.withColumn(out_col, constellation_of(name_col))


def acq_datetime(name: Column | str) -> Column:
    """F12: parse the %Y%m%dT%H%M%S acquisition stamp embedded in product
    names (s2_product.py:461-497)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.to_timestamp(F.regexp_extract(c, r"(\d{8}T\d{6})", 1), "yyyyMMdd'T'HHmmss")


def dispatch(df: DataFrame, band_map: DataFrame, name_col: str = "product_name") -> DataFrame:
    """Full open(): detect constellation + broadcast-join the per-
    constellation band dictionary (the Product-subclass parameter analog)."""
    tagged = detect(df, name_col)
    return tagged.join(F.broadcast(band_map), "constellation", "left")
