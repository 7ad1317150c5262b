"""Pure-Python ORC FOOTER reader — protobuf wire decode of the
postscript/footer tail, no ORC library, no Spark job.

The ORC twin of sources/parquet_meta.py: ORC files end with
``...[footer][postscript][1-byte postscript length]`` where the
postscript is UNCOMPRESSED protobuf naming the codec and footer length,
and the footer (compressed in ORC's 3-byte-header chunk framing) carries
stripe geometry, the type tree, row counts and per-column statistics —
including integer min/max/SUM, which parquet footers don't have. Two
tail reads per file give an engine everything it needs for file-level
skipping and cost estimation.

``_decode_message`` is a GENERIC protobuf wire-format decoder (varint
keys, wire types 0/1/2/5, repeated fields accumulate) — unknown fields
skip cleanly, so the walk survives writer-version drift; on top sit the
field-number maps from the public ORC specification (orc.apache.org):
PostScript{1 footerLength, 2 compression, 5 metadataLength, 8000 magic};
Footer{3 stripes, 4 types, 6 numberOfRows, 7 statistics};
ColumnStatistics{1 numberOfValues, 2 intStatistics{1 min, 2 max, 3 sum},
10 hasNull}. Column indexes follow the type tree (0 = root struct, then
flattened fields in order).

Codecs: NONE, ZLIB (stdlib, raw deflate) and SNAPPY (avrolite's
pure-Python decoder). LZO/LZ4/ZSTD footers raise NotImplementedError.
"""

from __future__ import annotations

import io
import zlib

from .avrolite import _snappy_decompress


def _lz4_block_decompress(data: bytes) -> bytes:
    """LZ4 BLOCK format (public spec): token with nibble-encoded literal
    and match lengths (15 -> 255-continued extension bytes), raw
    literals, 2-byte little-endian match offset, minimum match length 4.
    The last sequence is literals-only."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += data[i : i + lit]
        i += lit
        if i >= n:
            break  # final literals-only sequence
        offset = int.from_bytes(data[i : i + 2], "little")
        i += 2
        if offset == 0:
            raise ValueError("LZ4: zero match offset")
        mlen = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("LZ4: match offset before output start")
        for k in range(mlen):  # byte-wise: matches may overlap themselves
            out.append(out[start + k])
    return bytes(out)


def _varint(buf: io.BytesIO) -> int:
    shift = out = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("protobuf: truncated varint")
        out |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return out
        shift += 7


def _decode_message(data: bytes) -> dict[int, list]:
    """Generic wire decode: {field_no: [raw values]}. Length-delimited
    values stay bytes (caller decides message vs string)."""
    buf = io.BytesIO(data)
    out: dict[int, list] = {}
    while True:
        head = buf.read(1)
        if not head:
            return out
        buf.seek(-1, 1)
        key = _varint(buf)
        fno, wt = key >> 3, key & 0x07
        if wt == 0:
            val = _varint(buf)
        elif wt == 1:
            val = buf.read(8)
        elif wt == 2:
            val = buf.read(_varint(buf))
        elif wt == 5:
            val = buf.read(4)
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        out.setdefault(fno, []).append(val)


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _decompress_stream(data: bytes, kind: int) -> bytes:
    """ORC chunked compression framing: 3-byte little-endian header
    ``length << 1 | isOriginal`` per chunk."""
    if kind == 0:  # NONE: no framing
        return data
    out = bytearray()
    pos = 0
    while pos < len(data):
        h = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        length, original = h >> 1, h & 1
        chunk = data[pos : pos + length]
        pos += length
        if original:
            out += chunk
        elif kind == 1:  # ZLIB = raw deflate
            out += zlib.decompress(chunk, -15)
        elif kind == 2:  # SNAPPY
            out += _snappy_decompress(chunk)
        elif kind == 4:  # LZ4 (block format inside ORC chunks)
            out += _lz4_block_decompress(chunk)
        elif kind == 5:  # ZSTD (full RFC 8878 frames)
            from .zstd_lite import decompress as _zstd

            out += _zstd(chunk)
        else:
            raise NotImplementedError(
                f"ORC compression kind {kind} (LZO) not decoded here"
            )
    return bytes(out)


def read_orc_tail(path: str) -> tuple[dict, dict]:
    """(postscript, footer) as generic {field_no: [values]} maps, from
    two tail reads."""
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        size = fh.tell()
        fh.seek(-1, 2)
        ps_len = fh.read(1)[0]
        fh.seek(size - 1 - ps_len)
        ps = _decode_message(fh.read(ps_len))
        if ps.get(8000, [b""])[0] != b"ORC":
            raise ValueError(f"not an ORC file (postscript magic) {path}")
        footer_len = ps[1][0]
        kind = ps.get(2, [0])[0]
        fh.seek(size - 1 - ps_len - footer_len)
        footer = _decode_message(
            _decompress_stream(fh.read(footer_len), kind)
        )
    return ps, footer


def int_column_stats(path: str, column_index: int):
    """(num_rows, min, max, sum, has_null) for an integer column from
    footer statistics only. ``column_index`` follows the ORC type tree
    (0 = root struct; first field = 1)."""
    _ps, footer = read_orc_tail(path)
    num_rows = footer[6][0]
    stats = _decode_message(footer[7][column_index])
    if 2 not in stats:
        raise KeyError(f"column {column_index} has no intStatistics")
    ints = _decode_message(stats[2][0])
    has_null = bool(stats.get(10, [0])[0])
    return (
        num_rows,
        _zigzag(ints[1][0]) if 1 in ints else None,
        _zigzag(ints[2][0]) if 2 in ints else None,
        _zigzag(ints[3][0]) if 3 in ints else None,
        has_null,
    )


def stripe_info(path: str):
    """[(offset, data_length, n_rows)] per stripe — the unit ORC splits
    on at scale."""
    _ps, footer = read_orc_tail(path)
    out = []
    for raw in footer.get(3, []):
        s = _decode_message(raw)
        out.append((s[1][0], s.get(3, [0])[0], s.get(5, [0])[0]))
    return out
