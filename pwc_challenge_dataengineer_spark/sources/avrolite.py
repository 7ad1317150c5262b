"""Jar-free Avro: a pure-stdlib Object Container File codec exposed as a
Spark 4 Python DataSource (``format("avrolite")``), batch read + write.

The spark-avro module is external to pyspark and absent here, so the Avro
surface was an honest NotImplementedError gate (sources/readers.py). This
closes it the same way kafkalike closed the Kafka gate: implement the wire
format against the PUBLIC spec (Avro 1.11 specification, "Object Container
Files" + binary encoding) in pure Python, and let Spark parallelize it as
a first-class DataSource. Parity target: the reference reads/writes Avro
event exports through its ingestion service (reference: src/etl/ingest —
format registry); this gives the same capability without a JVM package.

Scale posture:
  * SPLITTABLE READS, like real Avro: the driver walks each file's block
    headers (count + byteSize varints let it SEEK over the data without
    decompressing), groups blocks into ~32 MB splits, and each executor
    decodes only its byte range — a 100 TB Avro lake fans out across the
    cluster exactly as the jar-based reader would.
  * the decode itself is Python-side (that is the honest cost of jar-free;
    the container format is record-oriented, not columnar) — blocks decode
    in one pass with zero per-record seeks, and rows stream to Spark
    without buffering a whole file.

Supported: codecs null + deflate (raw RFC-1951 via stdlib zlib) + snappy
(pure-Python decode of the public format; literal-only encode + CRC32
trailer per the Avro spec) + bzip2 + xz (stdlib bz2/lzma), all
primitives, records (nested), arrays, maps, enums, fixed, unions — [null, X] → nullable X, multi-branch
non-null unions → memberN struct (the spark-avro reader convention) —
and logical types date / timestamp-millis / timestamp-micros / decimal
(bytes or fixed two's-complement → DecimalType; writer emits bytes
decimals). Remaining honest gates: 16-bit-interval types nobody writes
(duration), the zstandard codec, writing multi-branch unions.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import io
import json
import os
import re
import struct
import uuid
import zlib

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MAGIC = b"Obj\x01"
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _tzinfo(name: str) -> "_dt.tzinfo | None":
    """tzinfo for a session-timezone name; None for UTC spellings (the
    fast path — naive arithmetic against the naive epoch is then exact)."""
    if name in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "UTC+00:00"):
        return None
    from zoneinfo import ZoneInfo

    return ZoneInfo(name)
#: target bytes of (compressed) block data per read split
SPLIT_BYTES = 32 * 1024 * 1024


# ----------------------------------------------------------- binary codec


def _read_long(buf: io.BufferedIOBase) -> int:
    """Zigzag varint — the one primitive everything else builds on."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _snappy_decompress(data: bytes) -> bytes:
    """Raw snappy per the public format description (google/snappy
    format_description.txt): unsigned-varint uncompressed length, then a
    tag stream of literals and back-references (1/2/4-byte offsets,
    overlapping copies legal). ~60 LoC of spec — the codec jar gate was
    never about the format being secret."""
    pos = 0
    ulen = shift = 0
    while True:
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if t == 1:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif t == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: invalid copy offset")
        start = len(out) - off
        for i in range(ln):  # byte-wise: overlapping copies replicate
            out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {ulen}"
        )
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy: spec-valid output any snappy decoder reads
    (compression ratio 1.0 — jar-free parity is about the container
    contract, not saving bytes)."""
    out = bytearray()
    v = len(data)
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 256:
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


# ------------------------------------------------------------ schema model


class _Named:
    """Registry for named-type references (a record/enum/fixed defined once
    and referenced by name later in the same schema)."""

    def __init__(self, tz: "_dt.tzinfo | None" = None) -> None:
        self.types: dict[str, dict] = {}
        #: session timezone for NAIVE timestamp values (None = UTC fast
        #: path). Avro timestamp-micros/millis are UTC-epoch instants;
        #: Spark hands the Python DataSource naive datetimes in the
        #: SESSION timezone, so in a non-UTC session the caller must pass
        #: option("timeZone", <session tz>) or the container would carry
        #: local-epoch micros and read back shifted in third-party
        #: readers. This repo's session.py pins the session to UTC.
        self.tz = tz

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            self.types[f"{ns}.{name}" if ns else name] = schema
            self.types[name] = schema

    def resolve(self, schema):
        if isinstance(schema, str) and schema in self.types:
            return self.types[schema]
        return schema


def _avro_to_spark(schema, named: _Named) -> tuple[T.DataType, bool]:
    """(spark type, nullable). Nullability only ever comes from a
    [null, X] union — Avro has no nullable-by-default."""
    schema = named.resolve(schema)
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        nullable = len(branches) != len(schema)
        if len(branches) == 0:
            return T.NullType(), True
        if len(branches) == 1:
            t, _ = _avro_to_spark(branches[0], named)
            return t, nullable
        # multi-branch non-null union -> struct of memberN fields (the
        # spark-avro reader convention): exactly one member is non-null
        # per value, so the mapping is lossless and joins/filters can
        # address branches by name
        fields = []
        for i, br in enumerate(branches):
            bt, _ = _avro_to_spark(br, named)
            fields.append(T.StructField(f"member{i}", bt, True))
        return T.StructType(fields), nullable
    if isinstance(schema, dict):
        typ = schema["type"]
        logical = schema.get("logicalType")
        if logical == "decimal":
            if typ not in ("bytes", "fixed"):
                raise NotImplementedError(
                    f"avrolite: decimal over {typ!r} (spec allows only "
                    "bytes/fixed)"
                )
            if typ == "fixed":
                named.define(schema)
            return (
                T.DecimalType(
                    int(schema.get("precision", 38)),
                    int(schema.get("scale", 0)),
                ),
                False,
            )
        if typ == "int" and logical == "date":
            return T.DateType(), False
        if typ == "long" and logical in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType(), False
        if typ == "record":
            named.define(schema)
            fields = []
            for f in schema["fields"]:
                ft, fn = _avro_to_spark(f["type"], named)
                fields.append(T.StructField(f["name"], ft, fn))
            return T.StructType(fields), False
        if typ == "array":
            it, inull = _avro_to_spark(schema["items"], named)
            return T.ArrayType(it, inull), False
        if typ == "map":
            vt, vnull = _avro_to_spark(schema["values"], named)
            return T.MapType(T.StringType(), vt, vnull), False
        if typ == "enum":
            named.define(schema)
            return T.StringType(), False
        if typ == "fixed":
            named.define(schema)
            return T.BinaryType(), False
        return _avro_to_spark(typ, named)
    prim = {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }
    if schema not in prim:
        raise NotImplementedError(f"avrolite: unsupported type {schema!r}")
    return prim[schema], False


def _spark_to_avro(dt: T.DataType, nullable: bool, name: str = "r"):
    """Inverse mapping for the writer; nullable → [null, X] union."""
    if isinstance(dt, T.StructType):
        out = {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": _spark_to_avro(f.dataType, f.nullable, f"{name}_{f.name}"),
                }
                for f in dt.fields
            ],
        }
    elif isinstance(dt, T.ArrayType):
        out = {
            "type": "array",
            "items": _spark_to_avro(dt.elementType, dt.containsNull, name),
        }
    elif isinstance(dt, T.MapType):
        out = {
            "type": "map",
            "values": _spark_to_avro(dt.valueType, dt.valueContainsNull, name),
        }
    elif isinstance(dt, T.DecimalType):
        out = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif isinstance(dt, T.DateType):
        out = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        out = {"type": "long", "logicalType": "timestamp-micros"}
    else:
        prim = {
            T.BooleanType(): "boolean",
            T.IntegerType(): "int",
            T.ShortType(): "int",
            T.ByteType(): "int",
            T.LongType(): "long",
            T.FloatType(): "float",
            T.DoubleType(): "double",
            T.BinaryType(): "bytes",
            T.StringType(): "string",
        }
        if dt not in prim:
            raise NotImplementedError(f"avrolite writer: unsupported {dt}")
        out = prim[dt]
    if nullable:
        return ["null", out]
    return out


# ------------------------------------------------------------------ decode


def _decoder(schema, named: _Named):
    """Compile an Avro schema into a closure buf -> python value. Compiled
    ONCE per split, so per-record work is just the closure chain."""
    schema = named.resolve(schema)
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) <= 1:
            subs = [_decoder(s, named) for s in schema]

            def du(buf, subs=subs):
                return subs[_read_long(buf)](buf)

            return du
        # multi-branch union -> memberN struct row: slot[i] is the member
        # index of schema branch i (None for the null branch)
        slot: list = []
        decs: list = []
        mi = 0
        for s in schema:
            if s == "null":
                slot.append(None)
                decs.append(None)
            else:
                slot.append(mi)
                decs.append(_decoder(s, named))
                mi += 1

        def du_multi(buf, slot=slot, decs=decs, n=mi):
            i = _read_long(buf)
            if slot[i] is None:
                return None
            row = [None] * n
            row[slot[i]] = decs[i](buf)
            return tuple(row)

        return du_multi
    if isinstance(schema, dict):
        typ = schema["type"]
        logical = schema.get("logicalType")
        if logical == "decimal":
            scale = int(schema.get("scale", 0))
            if schema["type"] == "fixed":
                named.define(schema)
                size = int(schema["size"])

                def ddf(buf, s=scale, n=size):
                    raw = buf.read(n)
                    if len(raw) != n:
                        raise EOFError("truncated fixed decimal")
                    return _decimal.Decimal(
                        int.from_bytes(raw, "big", signed=True)
                    ).scaleb(-s)

                return ddf

            def ddb(buf, s=scale):
                return _decimal.Decimal(
                    int.from_bytes(_read_bytes(buf), "big", signed=True)
                ).scaleb(-s)

            return ddb
        if typ == "int" and logical == "date":
            return lambda buf: _EPOCH_DATE + _dt.timedelta(days=_read_long(buf))
        if typ == "long" and logical in ("timestamp-millis", "timestamp-micros"):
            scale = 1000 if logical == "timestamp-millis" else 1
            tz = named.tz
            if tz is None:
                return lambda buf, s=scale: _EPOCH_DT + _dt.timedelta(
                    microseconds=_read_long(buf) * s
                )
            # container carries UTC-epoch instants; surface them as naive
            # session-local wall times (what Spark expects back)
            return lambda buf, s=scale, tz=tz: (
                _EPOCH_UTC + _dt.timedelta(microseconds=_read_long(buf) * s)
            ).astimezone(tz).replace(tzinfo=None)
        if typ == "record":
            named.define(schema)
            fds = [_decoder(f["type"], named) for f in schema["fields"]]
            return lambda buf, fds=fds: tuple(d(buf) for d in fds)
        if typ == "array":
            item = _decoder(schema["items"], named)

            def da(buf, item=item):
                out = []
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        n = -n
                        _read_long(buf)  # block byte size — skip
                    for _ in range(n):
                        out.append(item(buf))

            return da
        if typ == "map":
            val = _decoder(schema["values"], named)

            def dm(buf, val=val):
                out = {}
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        n = -n
                        _read_long(buf)
                    for _ in range(n):
                        # key MUST decode before the value: subscript
                        # assignment evaluates its RHS first, so inlining
                        # both reads in one statement consumes the bytes
                        # in the wrong order
                        k = _read_bytes(buf).decode("utf-8")
                        out[k] = val(buf)

            return dm
        if typ == "enum":
            named.define(schema)
            syms = schema["symbols"]
            return lambda buf, syms=syms: syms[_read_long(buf)]
        if typ == "fixed":
            named.define(schema)
            size = schema["size"]
            return lambda buf, size=size: buf.read(size)
        return _decoder(typ, named)
    return {
        "null": lambda buf: None,
        "boolean": lambda buf: buf.read(1) == b"\x01",
        "int": _read_long,
        "long": _read_long,
        "float": lambda buf: struct.unpack("<f", buf.read(4))[0],
        "double": lambda buf: struct.unpack("<d", buf.read(8))[0],
        "bytes": _read_bytes,
        "string": lambda buf: _read_bytes(buf).decode("utf-8"),
    }[schema]


def _encoder(schema, named: _Named):
    schema = named.resolve(schema)
    if isinstance(schema, list):
        # only [null, X] is ever produced by _spark_to_avro
        sub = _encoder([s for s in schema if s != "null"][0], named)
        null_at = schema.index("null")
        val_at = 1 - null_at

        def eu(out, v, sub=sub):
            if v is None:
                _write_long(out, null_at)
            else:
                _write_long(out, val_at)
                sub(out, v)

        return eu
    if isinstance(schema, dict):
        typ = schema["type"]
        logical = schema.get("logicalType")
        if logical == "decimal" and typ == "bytes":
            scale = int(schema.get("scale", 0))

            def edec(out, v, s=scale):
                unscaled = int(
                    v.scaleb(s).to_integral_value(_decimal.ROUND_HALF_UP)
                )
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                raw = unscaled.to_bytes(nbytes, "big", signed=True)
                _write_long(out, len(raw))
                out += raw

            return edec
        if typ == "int" and logical == "date":
            return lambda out, v: _write_long(out, (v - _EPOCH_DATE).days)
        if typ == "long" and logical == "timestamp-micros":
            tz = named.tz

            def ets(out, v, tz=tz):
                if v.tzinfo is not None:
                    v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                elif tz is not None:
                    # naive value = session-local wall time; normalize to
                    # UTC so the container carries true epoch micros
                    v = (
                        v.replace(tzinfo=tz)
                        .astimezone(_dt.timezone.utc)
                        .replace(tzinfo=None)
                    )
                td = v - _EPOCH_DT
                _write_long(
                    out,
                    (td.days * 86400 + td.seconds) * 1_000_000
                    + td.microseconds,
                )

            return ets
        if typ == "record":
            named.define(schema)
            fes = [
                (f["name"], _encoder(f["type"], named))
                for f in schema["fields"]
            ]

            def er(out, v, fes=fes):
                # v is a pyspark Row or tuple in field order
                for i, (_, e) in enumerate(fes):
                    e(out, v[i])

            return er
        if typ == "array":
            item = _encoder(schema["items"], named)

            def ea(out, v, item=item):
                if v:
                    _write_long(out, len(v))
                    for x in v:
                        item(out, x)
                _write_long(out, 0)

            return ea
        if typ == "map":
            val = _encoder(schema["values"], named)

            def em(out, v, val=val):
                if v:
                    _write_long(out, len(v))
                    for k, x in v.items():
                        kb = k.encode("utf-8")
                        _write_long(out, len(kb))
                        out.extend(kb)
                        val(out, x)
                _write_long(out, 0)

            return em
        return _encoder(typ, named)

    def eb(out, v):
        _write_long(out, len(v))
        out.extend(v)

    return {
        "boolean": lambda out, v: out.append(1 if v else 0),
        "int": _write_long,
        "long": _write_long,
        "float": lambda out, v: out.extend(struct.pack("<f", v)),
        "double": lambda out, v: out.extend(struct.pack("<d", v)),
        "bytes": eb,
        "string": lambda out, v: eb(out, v.encode("utf-8")),
    }[schema]


# --------------------------------------------------------- container files


def _read_header(fh) -> tuple[dict, bytes, int]:
    """(metadata map, sync marker, header byte length)."""
    if fh.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(fh)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(fh)
        for _ in range(n):
            k = _read_bytes(fh).decode("utf-8")
            meta[k] = _read_bytes(fh)
    sync = fh.read(16)
    return meta, sync, fh.tell()


def _decompressor(codec: str):
    if codec in ("", "null"):
        return lambda b: b
    if codec == "deflate":
        return lambda b: zlib.decompress(b, -15)  # raw RFC-1951
    if codec == "snappy":
        # Avro snappy blocks: raw snappy data + big-endian CRC32 of the
        # UNCOMPRESSED bytes (Avro spec, "Required Codecs")
        def _ds(b):
            raw = _snappy_decompress(b[:-4])
            want = struct.unpack(">I", b[-4:])[0]
            if zlib.crc32(raw) & 0xFFFFFFFF != want:
                raise ValueError("snappy block CRC mismatch")
            return raw

        return _ds
    if codec == "bzip2":
        import bz2

        return bz2.decompress
    if codec == "xz":
        import lzma

        # Avro xz blocks are raw .xz streams (format auto-detected)
        return lzma.decompress
    if codec == "zstandard":
        # Avro zstandard blocks are plain zstd frames; decoded by the
        # in-repo RFC 8878 implementation (read side only — the writer
        # keeps zstandard gated, encode is a different animal)
        from .zstd_lite import decompress as _zstd

        return _zstd
    raise NotImplementedError(
        f"avrolite: codec {codec!r} (null/deflate/snappy/bzip2/xz/"
        "zstandard readable jar- and dependency-free)"
    )


def _scan_blocks(path: str) -> tuple[dict, bytes, list[tuple[int, int, int]]]:
    """Walk block headers WITHOUT decompressing: each block is
    (record count, byte size, data, sync), so the scan seeks over data.
    Returns (meta, sync, [(start_offset, end_offset, n_records), ...])."""
    blocks = []
    with open(path, "rb") as fh:
        meta, sync, pos = _read_header(fh)
        size = os.fstat(fh.fileno()).st_size
        while pos < size:
            n_rec = _read_long(fh)
            n_bytes = _read_long(fh)
            fh.seek(n_bytes, 1)
            if fh.read(16) != sync:
                raise ValueError(
                    f"{path}: sync marker mismatch at block ending "
                    f"{fh.tell()} — corrupt container"
                )
            end = fh.tell()
            blocks.append((pos, end, n_rec))
            pos = end
    return meta, sync, blocks


class _AvroSplit(InputPartition):
    def __init__(self, path, start, end, schema_json, codec, sync_hex,
                 tzname="UTC"):
        self.path = path
        self.start = start
        self.end = end
        self.schema_json = schema_json
        self.codec = codec
        self.sync_hex = sync_hex
        self.tzname = tzname


def _read_split(split: _AvroSplit):
    decode = _decoder(
        json.loads(split.schema_json), _Named(_tzinfo(split.tzname))
    )
    decomp = _decompressor(split.codec)
    sync = bytes.fromhex(split.sync_hex)
    with open(split.path, "rb") as fh:
        fh.seek(split.start)
        while fh.tell() < split.end:
            n_rec = _read_long(fh)
            n_bytes = _read_long(fh)
            data = decomp(fh.read(n_bytes))
            if fh.read(16) != sync:
                raise ValueError(f"{split.path}: sync mismatch mid-split")
            buf = io.BytesIO(data)
            for _ in range(n_rec):
                yield decode(buf)


def _avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro") and not f.startswith((".", "_"))
        )
    raise FileNotFoundError(path)


# -------------------------------------------------------------- datasource


class AvroLiteReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.tzname = options.get("timeZone", "UTC")

    def partitions(self):
        splits: list[_AvroSplit] = []
        for f in _avro_files(self.path):
            meta, sync, blocks = _scan_blocks(f)
            schema_json = meta["avro.schema"].decode("utf-8")
            codec = meta.get("avro.codec", b"null").decode("utf-8")
            # group contiguous blocks up to SPLIT_BYTES of on-disk data
            cur_start, cur_end = None, None
            for start, end, _n in blocks:
                if cur_start is None:
                    cur_start, cur_end = start, end
                elif end - cur_start <= SPLIT_BYTES:
                    cur_end = end
                else:
                    splits.append(
                        _AvroSplit(f, cur_start, cur_end, schema_json,
                                   codec, sync.hex(), self.tzname)
                    )
                    cur_start, cur_end = start, end
            if cur_start is not None:
                splits.append(
                    _AvroSplit(f, cur_start, cur_end, schema_json,
                               codec, sync.hex(), self.tzname)
                )
        return splits

    def read(self, partition: _AvroSplit):
        yield from _read_split(partition)


class _Staged(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class AvroLiteWriter(DataSourceWriter):
    """Two-phase writer: each task encodes its rows into one staged
    container file; driver commit() renames them into place (and clears
    prior part files first under overwrite). Task retries leave only
    orphaned staging files, never half-visible data."""

    def __init__(self, options: dict, schema: T.StructType, overwrite: bool):
        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        if self.codec not in ("null", "deflate", "snappy", "bzip2", "xz"):
            raise NotImplementedError(
                f"avrolite writer: codec {self.codec!r} "
                "(null/deflate/snappy/bzip2/xz)"
            )
        self.overwrite = overwrite
        self.avro_schema = _spark_to_avro(schema, False, "spark_row")
        self.block_records = int(options.get("blockRecords", "50000"))
        # naive timestamps arrive in the SESSION timezone; pass
        # option("timeZone", <session tz>) in non-UTC sessions so the
        # container carries true UTC-epoch micros (Avro spec semantics)
        self.tzname = options.get("timeZone", "UTC")

    def write(self, iterator):
        os.makedirs(os.path.join(self.path, ".staging"), exist_ok=True)
        staged = os.path.join(self.path, ".staging", f"{uuid.uuid4()}.avro")
        encode = _encoder(self.avro_schema, _Named(_tzinfo(self.tzname)))
        sync = os.urandom(16)
        header = bytearray(MAGIC)
        meta = {
            "avro.schema": json.dumps(self.avro_schema).encode(),
            "avro.codec": self.codec.encode(),
        }
        _write_long(header, len(meta))
        for k, v in meta.items():
            kb = k.encode()
            _write_long(header, len(kb))
            header.extend(kb)
            _write_long(header, len(v))
            header.extend(v)
        _write_long(header, 0)
        header.extend(sync)
        with open(staged, "wb") as fh:
            fh.write(header)
            block = bytearray()
            n = 0

            def flush():
                nonlocal block, n
                if not n:
                    return
                data = bytes(block)
                if self.codec == "deflate":
                    c = zlib.compressobj(6, zlib.DEFLATED, -15)
                    data = c.compress(data) + c.flush()
                elif self.codec == "snappy":
                    data = _snappy_compress(data) + struct.pack(
                        ">I", zlib.crc32(data) & 0xFFFFFFFF
                    )
                elif self.codec == "bzip2":
                    import bz2

                    data = bz2.compress(data)
                elif self.codec == "xz":
                    import lzma

                    data = lzma.compress(data)
                head = bytearray()
                _write_long(head, n)
                _write_long(head, len(data))
                fh.write(bytes(head) + data + sync)
                block, n = bytearray(), 0

            for row in iterator:
                encode(block, row)
                n += 1
                if n >= self.block_records:
                    flush()
            flush()
        return _Staged(staged)

    def commit(self, messages):
        if self.overwrite:
            for f in _avro_files(self.path):
                os.remove(f)
        # Start numbering past any existing part files: committing from
        # index 0 unconditionally would os.replace() over a previous
        # append's part-0000N.avro files — silent data loss in a
        # documented write mode. Under overwrite the directory was just
        # cleared, so start stays 0.
        start = 0
        for f in _avro_files(self.path):
            m = re.fullmatch(r"part-(\d+)\.avro", os.path.basename(f))
            if m:
                start = max(start, int(m.group(1)) + 1)
        for i, m in enumerate(
            sorted((m for m in messages if m is not None),
                   key=lambda m: m.path)
        ):
            os.replace(
                m.path, os.path.join(self.path, f"part-{start + i:05d}.avro")
            )

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class AvroLiteDataSource(DataSource):
    """``spark.read.format("avrolite").load(path)`` /
    ``df.write.format("avrolite").mode(...).save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "avrolite"

    def schema(self):
        files = _avro_files(self.options["path"])
        if not files:
            raise ValueError(f"avrolite: no .avro files under {self.options['path']}")
        meta, _sync, _blocks = _scan_blocks(files[0])
        spark_t, _ = _avro_to_spark(
            json.loads(meta["avro.schema"].decode("utf-8")), _Named()
        )
        if not isinstance(spark_t, T.StructType):
            spark_t = T.StructType([T.StructField("value", spark_t, True)])
        return spark_t

    def reader(self, schema):
        return AvroLiteReader(self.options)

    def writer(self, schema, overwrite: bool):
        return AvroLiteWriter(self.options, schema, overwrite)

    def streamReader(self, schema):
        return AvroLiteStreamReader(self.options)


class AvroLiteStreamReader(DataSourceStreamReader):
    """File-watch Avro stream: each micro-batch reads the .avro files
    that appeared since the last trigger (the reference streams
    file-watched event exports — spark_structured_streaming.py:185-264
    family). Parity with Spark's own FileStreamSource semantics where the
    Python stream API allows:

      * discovery order is lexicographic file name — export directories
        name files monotonically (timestamps/part numbers), which makes
        the offset a simple prefix length. The offset also carries the
        last consumed name, so a replay detects a reordered/vanished
        prefix and fails loudly (failOnDataLoss analogue) instead of
        silently skipping or double-reading.
      * ``maxFilesPerTrigger`` caps each batch's advance.
      * each file fans out through the SAME block-header split planner as
        the batch reader (~32 MB splits) — a big late-arriving file is
        read by many executors, not one task per file.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.tzname = options.get("timeZone", "UTC")
        cap = options.get("maxFilesPerTrigger")
        self.max_files = int(cap) if cap is not None else None
        self.starting = options.get("startingOffsets", "earliest")

    def _files(self) -> list[str]:
        try:
            return _avro_files(self.path)
        except FileNotFoundError:
            return []

    @staticmethod
    def _offset(files: list[str], n: int) -> dict:
        return {
            "n": n,
            "last": os.path.basename(files[n - 1]) if n else "",
        }

    def initialOffset(self) -> dict:
        files = self._files()
        n = len(files) if self.starting == "latest" else 0
        self._last_n = n  # seed the cap base for the first trigger
        return self._offset(files, n)

    def latestOffset(self) -> dict:
        files = self._files()
        n = len(files)
        # NOTE: like kafkalike, the Python API's latestOffset has no
        # start argument — the cap advances from the last planned end
        # tracked via partitions(). The engine may call latestOffset on
        # an instance that never saw initialOffset (observed: planning
        # and execution readers are distinct), so when no base exists
        # fall back to the configured start; the first post-restart
        # trigger with no replayed batch may exceed the cap once.
        if self.max_files is not None:
            base = getattr(self, "_last_n", None)
            if base is None:
                base = len(files) if self.starting == "latest" else 0
            n = min(n, base + self.max_files)
        self._last_n = n
        return self._offset(files, n)

    def partitions(self, start: dict, end: dict):
        files = self._files()
        n0, n1 = int(start["n"]), int(end["n"])
        # cap base never regresses below the consumed prefix (a stale
        # fallback base could otherwise plan end < start after restart)
        self._last_n = max(n0, n1, getattr(self, "_last_n", 0) or 0)
        if n1 > len(files):
            raise ValueError(
                f"avrolite stream: offset says {n1} files but only "
                f"{len(files)} present — files were removed (data loss)"
            )
        for k, want in ((n0, start), (n1, end)):
            have = os.path.basename(files[k - 1]) if k else ""
            if want.get("last", have) != have:
                raise ValueError(
                    "avrolite stream: file order changed under the "
                    f"checkpoint (expected {want['last']!r} at position "
                    f"{k}, found {have!r}) — new files must sort after "
                    "consumed ones"
                )
        splits: list[_AvroSplit] = []
        for f in files[n0:n1]:
            meta, sync, blocks = _scan_blocks(f)
            schema_json = meta["avro.schema"].decode("utf-8")
            codec = meta.get("avro.codec", b"null").decode("utf-8")
            cur_start, cur_end = None, None
            for bstart, bend, _cnt in blocks:
                if cur_start is None:
                    cur_start, cur_end = bstart, bend
                elif bend - cur_start <= SPLIT_BYTES:
                    cur_end = bend
                else:
                    splits.append(_AvroSplit(
                        f, cur_start, cur_end, schema_json, codec,
                        sync.hex(), self.tzname,
                    ))
                    cur_start, cur_end = bstart, bend
            if cur_start is not None:
                splits.append(_AvroSplit(
                    f, cur_start, cur_end, schema_json, codec,
                    sync.hex(), self.tzname,
                ))
        if not splits:
            # Spark requires >= 1 partition per batch; empty advance
            # yields one empty split of the first consumed file — or, if
            # nothing was ever consumed, a zero-range sentinel
            if files:
                splits.append(_AvroSplit(
                    files[0], 0, 0, "\"null\"", "null", "00" * 16,
                    self.tzname,
                ))
            else:
                splits.append(_AvroSplit(
                    "", 0, 0, "\"null\"", "null", "00" * 16, self.tzname
                ))
        return splits

    def read(self, partition: _AvroSplit):
        if partition.start >= partition.end:
            return iter(())
        return _read_split(partition)

    def commit(self, end: dict) -> None:
        pass  # consumed-prefix state lives in Spark's checkpoint WAL


def register_avrolite(spark) -> None:
    spark.dataSource.register(AvroLiteDataSource)
