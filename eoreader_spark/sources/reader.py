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
# reference's constellation iteration order (reader.py:305-375 regex table;
# patterns below are re-derived from the PUBLIC product-naming conventions of
# each mission, kept RE2-compatible so the same strings run in Spark's Java
# regex AND DuckDB for oracle checks).  More specific patterns precede
# generic ones (L9 before L8, TSX before TDX, the near-catch-all SKY/PLA
# timestamp patterns last).
NAME_PATTERNS: list[tuple[str, str]] = [
    # --- Copernicus Sentinels
    ("S2", r"^S2[ABCD]_MSIL(1C|2A)_\d{8}T\d{6}"),
    ("S2_E84", r"^S2[ABCD]_\d{2}[A-Z]{3}_\d{8}_\d_L(1C|2A)"),
    ("S2_THEIA", r"^SENTINEL2[ABCD]_\d{8}-\d{6}-\d{3}_L(2A|1C)_T\d{2}[A-Z]{3}"),
    ("S1", r"^S1[ABCD]_(IW|EW|SM|WV|S\d)_(RAW|SLC|GRD|OCN)"),
    ("S1_RTC_ASF", r"^S1[ABCD]_(IW|EW|SM|WV|S\d)_\d{8}T\d{6}_[DS][VH][PRO]_RTC\d{2}"),
    ("S3_OLCI", r"^S3[ABCD]_OL_[012]_[A-Z0-9_]{6}_\d{8}T\d{6}"),
    ("S3_SLSTR", r"^S3[ABCD]_SL_[012]_[A-Z0-9_]{6}_\d{8}T\d{6}"),
    # --- Landsat family (mission number makes each pattern specific)
    ("L9", r"^L[OTC]09_(L1(GT|TP)|L2(SP|SR))_\d{6}_\d{8}_\d{8}_\d{2}_(RT|T1|T2)"),
    ("L8", r"^L[OTC]08_(L1(GT|TP)|L2(SP|SR))_\d{6}_\d{8}_\d{8}_\d{2}_(RT|T1|T2)"),
    ("L7", r"^LE07_(L1(GT|TP|GS)|L2(SP|SR))_\d{6}_\d{8}_\d{8}_\d{2}_(RT|T1|T2)"),
    ("L5", r"^L[TM]05_(L1(TP|GS)|L2(SP|SR))_\d{6}_\d{8}_\d{8}_\d{2}_(T1|T2)"),
    ("L4", r"^L[TM]04_(L1(TP|GS)|L2(SP|SR))_\d{6}_\d{8}_\d{8}_\d{2}_(T1|T2)"),
    ("L3", r"^LM03_L1(TP|GS)_\d{6}_\d{8}_\d{8}_\d{2}_T2"),
    ("L2", r"^LM02_L1(TP|GS)_\d{6}_\d{8}_\d{8}_\d{2}_T2"),
    ("L1", r"^LM01_L1(TP|GS)_\d{6}_\d{8}_\d{8}_\d{2}_T2"),
    ("HLS", r"^HLS\.[LS]30\.T\d{2}[A-Z]{3}\.\d{7}T\d{6}\.v2\.0"),
    # --- VHR optical (Airbus DIMAP, Maxar, others)
    ("PLD", r"^(DS_PHR1[AB]_\d{15}|IMG_PHR1[AB]_(P|MS|PMS|MS-N|MS-X|PMS-N|PMS-X)_\d{3})"),
    ("PNEO", r"^IMG_\d+_PNEO\d_(PMS-FS|MS-FS|PMS|MS|P)"),
    ("SPOT7", r"^IMG_SPOT7_(P|MS|PMS|MS-N|MS-X|PMS-N|PMS-X)_\d{3}"),
    ("SPOT6", r"^IMG_SPOT6_(P|MS|PMS|MS-N|MS-X|PMS-N|PMS-X)_\d{3}"),
    ("SPOT5", r"^SP05_HRG_(HM_|J__|T__|X__|TX__|HMX)__\d_\d{8}T\d{6}"),
    ("SPOT4", r"^SP04_HIR_(M_|I_|MI|X_|MX)___\d_\d{8}T\d{6}"),
    ("SPOT45", r"^SPVIEW_.+"),
    ("VIS1", r"^VIS1_(PAN|BUN|PSH|MS4)_.+_\d{2}-\d"),
    ("GS2", r"^DE2_(PM4|PSH|PS3|PS4|MS4|PAN)_L1[A-D]_\d{6}_\d{8}T\d{6}"),
    ("VENUS", r"^VENUS-XS_\d{8}-\d{6}-\d{3}_L2A"),
    ("MAXAR", r"^\d{12}_\d{2}_P\d{3}_(MUL|PAN|PSH|MOS)"),
    ("SV1", r"^SV1-0[1-4]_\d{8}_L(1B|2A)\d{10}_\d{13}_\d{2}-(MUX|PSH)"),
    ("ALEPH1", r"^\d{8}_\d{6}_[A-Za-z0-9]{3,}_L(0|1[ABCD])(_SR|)(_MS|)_\d{6,}"),
    # --- SAR
    ("TSX", r"^TSX1_SAR__(SSC|MGD|GEC|EEC)_([SR]E|__)___[SH][MCLST]_[SDTQ]_[SD]RA_\d{8}T\d{6}"),
    ("TDX", r"^TDX1_SAR__(SSC|MGD|GEC|EEC)_([SR]E|__)___[SH][MCLS]_[SDTQ]_[SD]RA_\d{8}T\d{6}"),
    ("PAZ", r"^PAZ1_SAR__(SSC|MGD|GEC|EEC)_([SR]E|__)___[SH][MCLST]_[SD]_[SD]RA_\d{8}T\d{6}"),
    ("CSK", r"^CSKS\d_(RAW|SCS|DGM|GEC|GTC)_[UB]_(HI|PP|WR|HR|S2)_"),
    ("CSG", r"^CSG_SSAR\d_(RAW|SCS|DGM|GEC|GTC)_"),
    ("RCM", r"^RCM\d_OK\d+_PK\d+_\d_.{4,}_\d{8}_\d{6}(_(HH|VV|VH|HV|RV|RH)){1,4}_(SLC|GRC|GRD|GCC|GCD)"),
    ("RS2", r"^RS2_(OK\d+_PK\d+_DK\d+_.{2,}_\d{8}_\d{6}|\d{8}_\d{6}_\d{4}_.{1,5})(_(HH|VV|VH|HV)){1,4}_S(LC|GX|GF|CN|CW|CF|CS|SG|PG)"),
    ("ICEYE", r"^((SM|SL|SC|SLEA)[HW]*_\d{5,}|ICEYE_X\d_(SM|SL|SC|SLEA)H*_\d{5,}_\d{8}T\d{6})"),
    ("SAOCOM", r"EOL1[ABCD]SARSAO1[AB]\d+(-product|)$"),
    ("CAPELLA", r"^CAPELLA_C\d{2}_S[PMS]_(GEO|GEC|SLC|SICD|SIDD)_(HH|VV)_\d{14}_\d{14}"),
    ("UMBRA", r"^\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}_UMBRA-\d{2}"),
    # --- smallsat optical with near-generic timestamp names (keep LAST)
    ("RE", r"^\d{7}_\d{4}-\d{2}-\d{2}_RE\d_3A_\d{6,}"),
    ("SKY", r"^\d{8}_\d{6}_ssc[a-z0-9]{1,4}_[a-z0-9]{4,5}"),
    ("PLA", r"^\d{8}_\d{6}_(\d{2}_|)[a-z0-9]{4}$"),
]

# Umbrella tags whose members are indistinguishable by NAME alone: the
# reference maps every Maxar/Vantor member (QB02/GE01/WV01-04/WVLG, plus the
# legacy MAXAR and rebranded VANTOR umbrella ids) to ONE shared regex
# (reader.py:352-361 _VANTOR_REGEX) and resolves the member from the
# metadata's IMAGE/SATID element (vantor_product.py:675-687); likewise
# ALEPH1/SATELLOGIC share _ALEPH1_REGEX (reader.py:373-374).  The engine's
# name stage emits the umbrella tag; refine_constellation() below is the
# SATID-driven member resolution.
CONSTELLATION_ALIASES: dict[str, str] = {
    # accepted user-facing alias -> canonical umbrella tag
    "VANTOR": "MAXAR",
    "SATELLOGIC": "ALEPH1",
}

# SATID metadata value -> per-member constellation tag.  Values are the
# member names themselves except Legion platforms LG01..LG08, which fold to
# WVLG (vantor_product.py:682-687: 'LG' in SATID -> Constellation.WVLG).
MAXAR_MEMBERS = ("QB02", "GE01", "WV01", "WV02", "WV03", "WV04")


def maxar_member_of(satid: Column | str) -> Column:
    """Metadata SATID -> per-member constellation tag (NULL if unknown).

    Mirrors the reference's VantorProduct._get_constellation
    (vantor_product.py:675-687): LGxx platforms map to WVLG, the other
    SATID values ARE the member tags."""
    c = F.col(satid) if isinstance(satid, str) else satid
    return (
        F.when(c.startswith("LG"), F.lit("WVLG"))
        .when(c.isin(*MAXAR_MEMBERS), c)
        .otherwise(F.lit(None).cast("string"))
    )


def refine_constellation(tag: Column | str, satid: Column | str) -> Column:
    """Name-stage umbrella tag + metadata SATID -> per-member tag.

    Products whose name stage detected the MAXAR/VANTOR umbrella resolve to
    QB02/GE01/WV01-04/WVLG from the SATID element; anything else (including
    a Maxar product with missing/garbled SATID, which keeps the umbrella
    tag so downstream dispatch still has the 8-band superset layout) passes
    through unchanged."""
    t = F.col(tag) if isinstance(tag, str) else tag
    member = maxar_member_of(satid)
    return F.when(
        t.isin("MAXAR", "VANTOR") & member.isNotNull(), member
    ).otherwise(t)


def stac_constellation_of(
    item_id: Column | str,
    self_href: Column | str,
    collection_id: Column | str,
) -> Column:
    """STAC-item-stage detection (reference Reader._open_stac_item,
    reader.py:700-733): hosted-catalog variants that carry NO name signal —
    an 'rtc' collection resolves to S1_RTC_MPC regardless of id; an S2 item
    served from Microsoft Planetary Computer is S2_MPC, from Element84's
    earth-search it is S2_E84.  Everything else falls back to the plain
    name-regex pass over the item id."""
    iid = F.col(item_id) if isinstance(item_id, str) else item_id
    href = F.col(self_href) if isinstance(self_href, str) else self_href
    coll = F.col(collection_id) if isinstance(collection_id, str) else collection_id
    base = constellation_of(iid)
    return (
        F.when(coll.contains("rtc"), F.lit("S1_RTC_MPC"))
        .when((base == "S2") & href.contains("planetarycomputer"), F.lit("S2_MPC"))
        .when(
            (base == "S2") & href.contains("earth-search.aws.element84.com"),
            F.lit("S2_E84"),
        )
        .otherwise(base)
    )


# metadata-presence fallback for products whose FOLDER name is unrecognizable
# (the reference checks a file inside instead, reader.py:377-420): applied to
# the archive member list (sources/archive.list_members) when the name pass
# returns NULL.
MEMBER_PATTERNS: list[tuple[str, str]] = [
    ("CSK", r"CSKS\d_(RAW|SCS|DGM|GEC|GTC)_[UB]_.*\.h5$"),
    ("CSG", r"CSG_SSAR\d_(RAW|SCS|DGM|GEC|GTC)_.*\.h5$"),
    ("MAXAR", r"\d{2}[A-Z]{3}\d{8}-.*\.TIL$"),
    ("SPOT45", r"METADATA\.DIM$"),
    ("S2_SIN", r"B12\.jp2$"),
    ("SV1", r"SV1-0[1-4]_\d{8}_L(1B|2A)\d{10}_\d{13}_\d{2}-(MUX|PSH)\.xml$"),
    ("ALEPH1", r"\d{8}_\d{6}_[A-Za-z0-9]{3,}_L(0|1[ABCD])(_SR|)(_MS|)_TOA\.vrt$"),
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


def member_constellation_of(members: Column | str) -> Column:
    """Archive member list -> constellation (metadata-presence fallback).

    ``members`` is an array<string> of archive entry names (from
    sources/archive.list_members).  Pure JVM: exists(members, rlike) chained
    when/otherwise — no per-row Python."""
    col = F.col(members) if isinstance(members, str) else members

    def matcher(pat):  # NB: `lambda m, p=pat` would read as a 2-arg
        return lambda m: m.rlike(pat)  # (element, index) lambda to Spark

    expr = F.lit(None).cast("string")
    for const, pat in reversed(MEMBER_PATTERNS):
        expr = F.when(F.exists(col, matcher(pat)), F.lit(const)).otherwise(expr)
    return expr


def detect_with_fallback(
    df: DataFrame,
    name_col: str = "product_name",
    members_col: str = "members",
    out_col: str = "constellation",
) -> DataFrame:
    """Name regex first; metadata-presence on the member list when the name
    is unrecognizable (reference reader.py:377-420 checks a file inside)."""
    by_name = constellation_of(name_col)
    return df.withColumn(
        out_col, F.coalesce(by_name, member_constellation_of(members_col))
    )


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
