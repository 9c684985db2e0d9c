"""Archive (zip/tar/tar.gz) scan without extraction — the S2 operator.

Reference: eoreader lists zip AND tar members and reads files out of the
archive in place, without unpacking — tars called out as the expensive case
(/root/reference/eoreader/utils.py:618-711 `get_archived_file_list` /
`read_archived_file`; the Landsat/ICEYE products ship as tars).

Spark form: archives are binary cells (or binaryFile rows); the container
format is dispatched on magic bytes (PK zip, gzip, ustar tar) and member
listing/extraction run inside mapInPandas with the stdlib zipfile/tarfile
over an in-memory buffer — one archive per iteration, vectorized output.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _members(data: bytes, want_content: bool, pattern: str | None = None):
    """-> [(member, size, content|None)] for zip, tar, or tar.gz payloads.
    ``pattern`` is an fnmatch glob applied before any content read (tar
    content reads are sequential and expensive — skip early).

    Corrupt archives raise a NAMED ValueError (round-6 corrupt-input
    contract): the stdlib leaks BadZipFile / TarError / BadGzipFile /
    zlib.error / EOFError on truncated or bit-flipped payloads, which would
    otherwise kill a whole Arrow batch at ingest instead of failing one
    quarantinable row."""
    try:
        return _members_inner(data, want_content, pattern)
    except (ValueError, NotImplementedError, KeyError):
        raise
    except (zipfile.BadZipFile, tarfile.TarError, OSError, EOFError,
            IndexError) as e:
        raise ValueError(
            f"corrupt or truncated archive ({type(e).__name__}: {e})"
        ) from e
    except Exception as e:  # zlib.error and friends from gzip internals
        import zlib

        if isinstance(e, zlib.error):
            raise ValueError(f"corrupt or truncated archive (zlib: {e})") from e
        raise


def _members_inner(data: bytes, want_content: bool, pattern: str | None = None):
    import fnmatch

    def keep(name: str) -> bool:
        return pattern is None or fnmatch.fnmatch(name, pattern)

    rows = []
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            for i in z.infolist():
                if i.is_dir() or not keep(i.filename):
                    continue
                rows.append(
                    (i.filename, i.file_size, z.read(i) if want_content else None)
                )
        return rows
    raw = gzip.decompress(data) if data[:2] == b"\x1f\x8b" else data
    # ustar magic at offset 257 (POSIX tar; GNU tar writes 'ustar  \0') —
    # anything else is an unknown container, not a corrupt tar (ADVICE r3)
    if len(raw) < 262 or raw[257:262] != b"ustar":
        raise ValueError("unsupported archive format (not zip, gzip, or ustar tar)")
    with tarfile.open(fileobj=io.BytesIO(raw)) as t:
        for m in t:
            if not m.isfile() or not keep(m.name):
                continue
            content = t.extractfile(m).read() if want_content else None
            rows.append((m.name, m.size, content))
    return rows


def list_members(archives: DataFrame, id_col: str = "archive_id", bytes_col: str = "bytes") -> DataFrame:
    """-> (archive_id, member, size) one row per archive member (the
    get_archived_file_list analog; zip, tar, and tar.gz)."""
    schema = f"{id_col} string, member string, size long"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                rows.extend(
                    (aid, name, size) for name, size, _ in _members(bytes(data), False)
                )
            yield pd.DataFrame(rows, columns=[id_col, "member", "size"])

    return archives.select(id_col, bytes_col).mapInPandas(batch, schema=schema)


def read_members(
    archives: DataFrame,
    pattern: str,
    id_col: str = "archive_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """-> (archive_id, member, content) for members whose name matches the
    glob-ish ``pattern`` (the read_archived_file analog: the file is read
    out of the archive in place; zip, tar, and tar.gz)."""
    schema = f"{id_col} string, member string, content binary"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                rows.extend(
                    (aid, name, content)
                    for name, _, content in _members(bytes(data), True, pattern)
                )
            yield pd.DataFrame(rows, columns=[id_col, "member", "content"])

    return archives.select(id_col, bytes_col).mapInPandas(batch, schema=schema)
