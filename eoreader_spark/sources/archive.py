"""Archive (zip) scan without extraction — the S2 operator.

Reference: eoreader lists zip/tar members and builds `zip+file://...!/...`
rasterio paths without unpacking (/root/reference/eoreader/utils.py:618-711).

Spark form: archives are binary cells (or binaryFile rows); member listing
and member extraction run inside mapInPandas with the stdlib zipfile over an
in-memory buffer — one archive per iteration, vectorized output.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def list_members(archives: DataFrame, id_col: str = "archive_id", bytes_col: str = "bytes") -> DataFrame:
    """-> (archive_id, member, size) one row per archive member (the
    get_archived_file_list analog)."""
    schema = f"{id_col} string, member string, size long"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
                    rows.extend((aid, i.filename, i.file_size) for i in z.infolist())
            yield pd.DataFrame(rows, columns=[id_col, "member", "size"])

    return archives.select(id_col, bytes_col).mapInPandas(batch, schema=schema)


def read_members(
    archives: DataFrame,
    pattern: str,
    id_col: str = "archive_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """-> (archive_id, member, content) for members whose name matches the
    glob-ish substring ``pattern`` (the get_archived_rio_path analog: read
    the file out of the archive in place)."""
    import fnmatch

    schema = f"{id_col} string, member string, content binary"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
                    for info in z.infolist():
                        if fnmatch.fnmatch(info.filename, pattern):
                            rows.append((aid, info.filename, z.read(info)))
            yield pd.DataFrame(rows, columns=[id_col, "member", "content"])

    return archives.select(id_col, bytes_col).mapInPandas(batch, schema=schema)
