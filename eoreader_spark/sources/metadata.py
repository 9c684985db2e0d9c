"""XML metadata read — the S6 operator.

Reference: product metadata is parsed from XML with namespace handling and
flattened to dicts (/root/reference/eoreader/products/product.py:945-1028,
quick_xml_to_dict /root/reference/eoreader/utils.py:302-323).

Spark form: metadata documents are small and per-scene; parse on the driver
(or in one mapInPandas pass for a metadata *column*) with stdlib
ElementTree, flatten to (path, value) pairs, and join/broadcast the literal
columns — never per-pixel work.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[1] if "}" in tag else tag


def xml_to_pairs(xml_text: str) -> list[tuple[str, str]]:
    """Flatten an XML doc to (slash/path, text) rows (quick_xml_to_dict
    analog, namespaces stripped).  Malformed XML raises a named ValueError
    (round-6 corrupt-input contract), not a bare ParseError."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise ValueError(f"malformed XML metadata: {e}") from e
    out: list[tuple[str, str]] = []

    def walk(el, path):
        p = f"{path}/{_strip_ns(el.tag)}"
        txt = (el.text or "").strip()
        if txt:
            out.append((p, txt))
        for k, v in el.attrib.items():
            out.append((f"{p}@{_strip_ns(k)}", v))
        for child in el:
            walk(child, p)

    walk(root, "")
    return out


def read_mtd_column(df: DataFrame, id_col: str = "image_id", xml_col: str = "mtd_xml") -> DataFrame:
    """(id, xml string) -> (id, path, value) exploded metadata rows."""
    schema = f"{id_col} string, path string, value string"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, xml in zip(pdf[id_col], pdf[xml_col]):
                rows.extend((iid, p, v) for p, v in xml_to_pairs(xml))
            yield pd.DataFrame(rows, columns=[id_col, "path", "value"])

    return df.select(id_col, xml_col).mapInPandas(batch, schema=schema)
