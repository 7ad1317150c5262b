"""Pure-Python parquet FOOTER reader — Thrift compact protocol decode of
FileMetaData, no Spark job, no parquet library.

The metadata plane behind every lakehouse optimization this repo ships
(Delta data skipping, Iceberg manifest pruning, Z-order layout audits) is
ultimately the parquet footer: row counts and per-column min/max/null
statistics serialized as a Thrift-compact FileMetaData struct at the file
tail (``[footer][4-byte little-endian length]["PAR1"]``). Reading it
costs two small tail reads per file — the primitive that lets an engine
skip data files without opening them, and what parquet-tools/DuckDB's
parquet_metadata() expose.

``_read_compact_struct`` is a GENERIC Thrift compact decoder (varint +
zigzag ints, short/long-form field headers with delta field ids, bool-
in-header encoding, binary, double, nested structs, lists/sets/maps) that
returns {field_id: value} maps — unknown/new fields skip cleanly, which
is what makes the walk robust across parquet writer versions. On top sit
the FileMetaData field-id maps from the public parquet-format spec
(num_rows=3, row_groups=4; RowGroup.columns=1; ColumnChunk.meta_data=3;
ColumnMetaData.path_in_schema=3, num_values=5, statistics=12;
Statistics.null_count=3, max_value=5/min_value=6 with the deprecated
max=1/min=2 fallback).

Stats caveat honored: string min/max may be writer-truncated per spec, so
the catalog query pins INT64 columns only (plain little-endian, exact).
Encrypted footers (magic "PARE") raise NotImplementedError.
"""

from __future__ import annotations

import io
import struct


def _varint(buf: io.BytesIO) -> int:
    shift = 0
    out = 0
    while True:
        b = buf.read(1)[0]
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(buf: io.BytesIO, ttype: int, in_collection: bool = False):
    if ttype in (1, 2):
        # in a FIELD header the bool value IS the type (1 true / 2 false);
        # as a collection ELEMENT it is a standalone byte
        if in_collection:
            return buf.read(1)[0] == 1
        return ttype == 1
    if ttype == 3:  # byte
        return struct.unpack("b", buf.read(1))[0]
    if ttype in (4, 5, 6):  # i16 / i32 / i64
        return _zigzag(_varint(buf))
    if ttype == 7:  # double
        return struct.unpack("<d", buf.read(8))[0]
    if ttype == 8:  # binary / string
        return buf.read(_varint(buf))
    if ttype in (9, 10):  # list / set
        head = buf.read(1)[0]
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = _varint(buf)
        return [_read_value(buf, etype, True) for _ in range(size)]
    if ttype == 11:  # map
        size = _varint(buf)
        if size == 0:
            return {}
        kv = buf.read(1)[0]
        kt, vt = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k = _read_value(buf, kt, True)
            out[k] = _read_value(buf, vt, True)
        return out
    if ttype == 12:
        return _read_compact_struct(buf)
    raise ValueError(f"thrift compact: unknown type {ttype}")


def _read_compact_struct(buf: io.BytesIO) -> dict:
    out: dict[int, object] = {}
    fid = 0
    while True:
        head = buf.read(1)[0]
        if head == 0:  # STOP
            return out
        delta = head >> 4
        ttype = head & 0x0F
        fid = fid + delta if delta else _zigzag(_varint(buf))
        out[fid] = _read_value(buf, ttype)


def read_footer(path: str) -> dict:
    """FileMetaData as nested {field_id: value} maps, from two tail
    reads (8-byte trailer, then the footer blob)."""
    with open(path, "rb") as fh:
        fh.seek(-8, 2)
        flen, magic = struct.unpack("<I4s", fh.read(8))
        if magic == b"PARE":
            raise NotImplementedError("encrypted parquet footer")
        if magic != b"PAR1":
            raise ValueError(f"not a parquet file (trailer {magic!r})")
        fh.seek(-8 - flen, 2)
        return _read_compact_struct(io.BytesIO(fh.read(flen)))


def int64_column_stats(path: str, column: str):
    """(num_rows, min, max, null_count) for an INT64 column, decoded
    from footer statistics only — the file's data pages are never read.
    Raises KeyError if the column has no statistics."""
    md = read_footer(path)
    num_rows = md[3]
    lo = hi = None
    nulls = 0
    for rg in md[4]:
        for chunk in rg[1]:
            cmeta = chunk[3]
            name = b".".join(cmeta[3]).decode()
            if name != column:
                continue
            if cmeta[1] != 2:  # Type.INT64 per parquet-format
                raise ValueError(f"{column} is not INT64 (type {cmeta[1]})")
            stats = cmeta.get(12)
            if stats is None:
                raise KeyError(f"no statistics for {column} in {path}")
            raw_max = stats.get(5, stats.get(1))
            raw_min = stats.get(6, stats.get(2))
            cmin = struct.unpack("<q", raw_min)[0]
            cmax = struct.unpack("<q", raw_max)[0]
            lo = cmin if lo is None else min(lo, cmin)
            hi = cmax if hi is None else max(hi, cmax)
            nulls += stats.get(3, 0)
    if lo is None:
        raise KeyError(f"column {column} not found in {path}")
    return num_rows, lo, hi, nulls
