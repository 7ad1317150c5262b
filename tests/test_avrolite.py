"""Jar-free Avro (sources/avrolite.py): golden-byte wire-format pin,
round-trip through the Python DataSource, split planning, codec gates.

Wire-format bytes in test_golden_bytes_null_codec are hand-assembled from
the Avro 1.11 spec (zigzag varints, container layout) INDEPENDENTLY of the
module's encoder — the same evidence style as the protoshim golden tests:
if the codec and the spec ever disagree, this fails even though writer and
reader agree with each other.
"""

import datetime as dt
import json
import os

import pytest

from pwc_challenge_dataengineer_spark.sources import avrolite
from pwc_challenge_dataengineer_spark.sources.avrolite import (
    register_avrolite,
)

SYNC = bytes(range(16))


def _hand_container(tmp_path) -> str:
    """record{a: long, b: string}, codec null, rows (1,'x'), (-2,'yz')."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        }
    ).encode()

    def vint(n: int) -> bytes:  # unsigned varint of zigzag(n)
        z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    meta = (
        vint(2)
        + vint(len(b"avro.schema")) + b"avro.schema"
        + vint(len(schema)) + schema
        + vint(len(b"avro.codec")) + b"avro.codec"
        + vint(4) + b"null"
        + vint(0)
    )
    # records: (1,'x') -> 02 02 78 ; (-2,'yz') -> 03 04 79 7a
    data = vint(1) + vint(1) + b"x" + vint(-2) + vint(2) + b"yz"
    block = vint(2) + vint(len(data)) + data + SYNC
    p = tmp_path / "hand.avro"
    p.write_bytes(b"Obj\x01" + meta + SYNC + block)
    return str(p)


def test_golden_bytes_null_codec(spark, tmp_path):
    path = _hand_container(tmp_path)
    register_avrolite(spark)
    rows = spark.read.format("avrolite").load(path).collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (-2, "yz")]


def test_round_trip_all_types(spark, tmp_path):
    register_avrolite(spark)
    out = str(tmp_path / "rt")
    df = spark.createDataFrame(
        [
            (
                1,
                "alpha",
                2.5,
                True,
                dt.date(2024, 3, 1),
                dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
                [1, 2, 3],
                {"k": 7},
                bytearray(b"\x00\xff"),
                (10, "nested"),
                None,
            ),
            (
                -2,
                "beta",
                -0.125,
                False,
                dt.date(1969, 12, 31),
                dt.datetime(1969, 12, 31, 23, 59, 59),
                [],
                {},
                bytearray(b""),
                (-1, ""),
                "present",
            ),
        ],
        "a BIGINT, s STRING, d DOUBLE, f BOOLEAN, dy DATE, ts TIMESTAMP, "
        "arr ARRAY<BIGINT>, m MAP<STRING,BIGINT>, bin BINARY, "
        "st STRUCT<x: BIGINT, y: STRING>, opt STRING",
    )
    df.write.format("avrolite").mode("append").save(out)
    back = spark.read.format("avrolite").load(out)
    assert back.schema == df.schema
    a, b = sorted(back.collect(), key=lambda r: -r.a)
    assert (a.a, a.s, a.d, a.f) == (1, "alpha", 2.5, True)
    assert a.dy == dt.date(2024, 3, 1)
    assert a.ts == dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert a.arr == [1, 2, 3] and a.m == {"k": 7}
    assert bytes(a.bin) == b"\x00\xff"
    assert (a.st.x, a.st.y) == (10, "nested") and a.opt is None
    assert (b.a, b.dy, b.opt) == (-2, dt.date(1969, 12, 31), "present")
    assert b.arr == [] and b.m == {}


def test_overwrite_and_deflate_smaller(spark, tmp_path):
    register_avrolite(spark)
    out = str(tmp_path / "ow")
    df1 = spark.range(1000).selectExpr(
        "id", "repeat('pad', 20) AS s"
    ).coalesce(1)
    df1.write.format("avrolite").option("codec", "deflate").mode("append").save(out)
    deflate_bytes = sum(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out) if f.endswith(".avro")
    )
    df1.write.format("avrolite").option("codec", "null").mode(
        "overwrite"
    ).save(out)
    null_bytes = sum(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out) if f.endswith(".avro")
    )
    assert spark.read.format("avrolite").load(out).count() == 1000
    # overwrite replaced, not appended; deflate actually compressed
    assert deflate_bytes < null_bytes


def test_block_splits_cover_all_rows(spark, tmp_path, monkeypatch):
    register_avrolite(spark)
    out = str(tmp_path / "blocks")
    spark.range(5000).selectExpr("id", "'v' || id AS s").coalesce(
        1
    ).write.format("avrolite").option("blockRecords", "500").mode("append").save(out)
    # one physical file, many blocks: with a tiny split target the driver
    # must plan >1 split and together they must cover every row exactly once
    monkeypatch.setattr(avrolite, "SPLIT_BYTES", 4096)
    reader = avrolite.AvroLiteReader({"path": out})
    splits = reader.partitions()
    assert len(splits) > 1
    seen = [r[0] for s in splits for r in avrolite._read_split(s)]
    assert sorted(seen) == list(range(5000))


def test_remaining_gates_raise(tmp_path):
    """r9 moved the snappy / decimal / multi-branch-union boundaries into
    supported territory, then the zstandard READ gate fell too (zstd_lite,
    RFC 8878); what remains gated must still raise honestly."""
    with pytest.raises(NotImplementedError, match="codec 'lzo'"):
        avrolite._decompressor("lzo")
    with pytest.raises(NotImplementedError, match="decimal over 'string'"):
        avrolite._avro_to_spark(
            {"type": "string", "logicalType": "decimal", "scale": 2},
            avrolite._Named(),
        )


def test_read_avro_falls_back_jar_free(spark, tmp_path):
    from pwc_challenge_dataengineer_spark.sources.readers import read_avro

    out = str(tmp_path / "fb")
    register_avrolite(spark)
    spark.range(10).selectExpr("id", "id * 2 AS dbl").write.format(
        "avrolite"
    ).mode("append").save(out)
    df = read_avro(spark, out)
    assert df.count() == 10
    assert {r.dbl for r in df.collect()} == {i * 2 for i in range(10)}


def _vint(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _container(schema_obj, data: bytes, n_rec: int, codec: bytes = b"null") -> bytes:
    schema = json.dumps(schema_obj).encode()
    meta = (
        _vint(2)
        + _vint(len(b"avro.schema")) + b"avro.schema"
        + _vint(len(schema)) + schema
        + _vint(len(b"avro.codec")) + b"avro.codec"
        + _vint(len(codec)) + codec
        + _vint(0)
    )
    block = _vint(n_rec) + _vint(len(data)) + data + SYNC
    return b"Obj\x01" + meta + SYNC + block


def test_enum_fixed_and_named_type_reuse(spark, tmp_path):
    """Decode paths the writer never emits: enum (index -> symbol), fixed
    (raw size bytes), and a named type defined once then referenced BY
    NAME in a later field — per the spec's named-type rules."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "e1", "type": {"type": "enum", "name": "E",
                                    "symbols": ["LO", "MID", "HI"]}},
            {"name": "e2", "type": "E"},  # reference by name
            {"name": "fx", "type": {"type": "fixed", "name": "F2", "size": 2}},
        ],
    }
    # row 1: e1=HI(2), e2=LO(0), fx=0xBEEF ; row 2: e1=MID(1), e2=MID(1), fx=0x0102
    data = (
        _vint(2) + _vint(0) + b"\xbe\xef"
        + _vint(1) + _vint(1) + b"\x01\x02"
    )
    p = tmp_path / "enum.avro"
    p.write_bytes(_container(schema, data, 2))
    register_avrolite(spark)
    rows = spark.read.format("avrolite").load(str(p)).collect()
    assert [(r.e1, r.e2, bytes(r.fx)) for r in rows] == [
        ("HI", "LO", b"\xbe\xef"),
        ("MID", "MID", b"\x01\x02"),
    ]


def test_hand_deflated_block(spark, tmp_path):
    """A deflate block compressed INDEPENDENTLY of the module's writer
    (raw RFC-1951 stream) decodes correctly — pins the raw-vs-zlib-header
    distinction the Avro spec requires."""
    import zlib

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    raw = _vint(100) + _vint(-100) + _vint(0)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    data = comp.compress(raw) + comp.flush()
    p = tmp_path / "defl.avro"
    p.write_bytes(_container(schema, data, 3, codec=b"deflate"))
    register_avrolite(spark)
    assert [r.a for r in spark.read.format("avrolite").load(str(p)).collect()] == [
        100, -100, 0,
    ]


def test_corrupt_sync_marker_detected(tmp_path):
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    raw = bytearray(_container(schema, _vint(1), 1))
    raw[-1] ^= 0xFF  # flip a byte of the block-trailing sync marker
    p = tmp_path / "bad.avro"
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="sync marker mismatch"):
        avrolite._scan_blocks(str(p))


def test_empty_partition_writes_header_only_file(spark, tmp_path):
    """A task with zero rows stages a header-only container; reading the
    directory back yields exactly the non-empty rows (header-only files
    contribute no splits)."""
    register_avrolite(spark)
    out = str(tmp_path / "sparse")
    # 32 partitions, 3 rows -> most tasks are empty
    spark.range(3).repartition(32).write.format("avrolite").mode(
        "append"
    ).save(out)
    assert sorted(
        r.id for r in spark.read.format("avrolite").load(out).collect()
    ) == [0, 1, 2]


def test_append_does_not_clobber_prior_parts(spark, tmp_path):
    """r8 ADVICE: commit() used to rename staged files to part-00000...
    from index 0 unconditionally, so a second append os.replace()d over
    the first append's files — silent data loss. Appends must accumulate."""
    register_avrolite(spark)
    path = str(tmp_path / "acc")
    df1 = spark.range(0, 10).selectExpr("id AS a")
    df2 = spark.range(10, 25).selectExpr("id AS a")
    df1.coalesce(1).write.format("avrolite").mode("append").save(path)
    df2.coalesce(1).write.format("avrolite").mode("append").save(path)
    got = sorted(
        r["a"] for r in
        spark.read.format("avrolite").load(path).collect()
    )
    assert got == list(range(25))
    # and overwrite still clears everything first
    df1.coalesce(1).write.format("avrolite").mode("overwrite").save(path)
    assert spark.read.format("avrolite").load(path).count() == 10


def test_timestamp_micros_utc_epoch_with_session_tz_option(tmp_path):
    """r8 ADVICE: the container must carry UTC-epoch micros per the Avro
    spec. With option timeZone=<session tz>, a naive (session-local)
    datetime must be normalized to UTC on encode and shifted back on
    decode — verified against hand-computed epoch micros, no Spark session
    needed (pure codec level)."""
    import io as _io

    enc_named = avrolite._Named(avrolite._tzinfo("America/New_York"))
    schema = {"type": "long", "logicalType": "timestamp-micros"}
    encode = avrolite._encoder(schema, enc_named)
    out = bytearray()
    # 2024-01-15 12:00:00 EST (UTC-5, winter — no DST ambiguity)
    naive_local = dt.datetime(2024, 1, 15, 12, 0, 0)
    encode(out, naive_local)
    raw = avrolite._read_long(_io.BytesIO(bytes(out)))
    true_utc_micros = int(
        dt.datetime(2024, 1, 15, 17, 0, 0, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
    assert raw == true_utc_micros
    # decode with the same tz round-trips to the local wall time
    dec = avrolite._decoder(
        schema, avrolite._Named(avrolite._tzinfo("America/New_York"))
    )
    assert dec(_io.BytesIO(bytes(out))) == naive_local
    # decode with UTC (default) surfaces the true UTC wall time
    dec_utc = avrolite._decoder(schema, avrolite._Named(None))
    assert dec_utc(_io.BytesIO(bytes(out))) == dt.datetime(2024, 1, 15, 17, 0, 0)


def test_avro_fallback_condition_is_specific():
    """r8 ADVICE: the jar-free fallback must trigger ONLY on the
    missing-data-source condition, not on any error whose message merely
    contains 'avro' (e.g. a missing path named .../orders_avro raised
    while the jar IS present)."""
    from pyspark.errors import AnalysisException

    from pwc_challenge_dataengineer_spark.sources.readers import (
        _is_missing_avro_source,
    )

    assert _is_missing_avro_source(
        AnalysisException("Failed to find data source: avro.")
    )
    assert not _is_missing_avro_source(
        AnalysisException("[PATH_NOT_FOUND] Path does not exist: "
                          "file:/data/orders_avro")
    )
    assert not _is_missing_avro_source(
        ValueError("avrolite: no .avro files under /data/orders_avro")
    )


def test_decimal_round_trip_and_wire_format(spark, tmp_path):
    """decimal logical type (r8 verdict item 3): DecimalType columns write
    as bytes decimals (minimal two's-complement unscaled int) and read
    back exactly; the wire bytes are checked against hand-computed
    two's-complement so writer and reader can't just agree by accident."""
    import decimal as dec
    import io as _io

    register_avrolite(spark)
    path = str(tmp_path / "dec")
    df = spark.sql(
        """SELECT * FROM VALUES
           (1, CAST(12345.67 AS DECIMAL(12,2))),
           (2, CAST(-0.01 AS DECIMAL(12,2))),
           (3, CAST(0 AS DECIMAL(12,2))),
           (4, CAST(-9999999999.99 AS DECIMAL(12,2))) t(id, amt)"""
    )
    df.coalesce(1).write.format("avrolite").mode("overwrite").save(path)
    back = spark.read.format("avrolite").load(path)
    assert back.schema["amt"].dataType.simpleString() == "decimal(12,2)"
    got = {r["id"]: r["amt"] for r in back.collect()}
    assert got == {
        1: dec.Decimal("12345.67"),
        2: dec.Decimal("-0.01"),
        3: dec.Decimal("0.00"),
        4: dec.Decimal("-9999999999.99"),
    }
    # wire-level: encoder bytes for -0.01 must be the 1-byte
    # two's-complement of -1 (0xFF), length-prefixed
    enc = avrolite._encoder(
        {"type": "bytes", "logicalType": "decimal",
         "precision": 12, "scale": 2},
        avrolite._Named(),
    )
    out = bytearray()
    enc(out, dec.Decimal("-0.01"))
    assert bytes(out) == b"\x02\xff"  # varint len 1, byte 0xFF
    d = avrolite._decoder(
        {"type": "bytes", "logicalType": "decimal",
         "precision": 12, "scale": 2},
        avrolite._Named(),
    )
    assert d(_io.BytesIO(b"\x02\xff")) == dec.Decimal("-0.01")


def test_fixed_decimal_decode():
    """fixed-backed decimals: the unscaled int is sign-extended across the
    FULL fixed size (spec), e.g. 4-byte fixed holding -2 at scale 3."""
    import decimal as dec
    import io as _io

    schema = {
        "type": "fixed", "name": "amt4", "size": 4,
        "logicalType": "decimal", "precision": 9, "scale": 3,
    }
    d = avrolite._decoder(schema, avrolite._Named())
    assert d(_io.BytesIO(b"\xff\xff\xff\xfe")) == dec.Decimal("-0.002")
    assert d(_io.BytesIO(b"\x00\x00\x30\x39")) == dec.Decimal("12.345")
    t, _ = avrolite._avro_to_spark(schema, avrolite._Named())
    assert t.simpleString() == "decimal(9,3)"


def test_multi_branch_union_decodes_to_member_struct():
    """non-null multi-branch unions (r8 verdict item 3) map to a struct of
    memberN fields (spark-avro reader convention). Hand-encoded values:
    branch index varint then the branch payload."""
    import io as _io

    schema = ["null", "long", "string"]
    t, nullable = avrolite._avro_to_spark(schema, avrolite._Named())
    assert nullable
    assert t.simpleString() == "struct<member0:bigint,member1:string>"
    d = avrolite._decoder(schema, avrolite._Named())
    # index 0 -> null
    assert d(_io.BytesIO(b"\x00")) is None
    # index 1 (varint 02) -> long 7 (zigzag 0e)
    assert d(_io.BytesIO(b"\x02\x0e")) == (7, None)
    # index 2 (varint 04) -> string "hi" (len 2 -> 04)
    assert d(_io.BytesIO(b"\x04\x04hi")) == (None, "hi")


def test_snappy_codec_round_trip_and_golden_backref(spark, tmp_path):
    """snappy codec, jar- and dependency-free: writer emits literal-only
    snappy + CRC32 trailer (spec-valid), reader decodes the FULL format.
    The back-reference path (which our writer never emits) is proven on a
    hand-assembled stream, and CRC corruption is detected."""
    register_avrolite(spark)
    path = str(tmp_path / "snap")
    df = spark.range(0, 5000).selectExpr("id", "concat('v', id) AS s")
    (df.coalesce(2).write.format("avrolite")
       .option("codec", "snappy").mode("overwrite").save(path))
    back = spark.read.format("avrolite").load(path)
    assert back.count() == 5000
    assert {r["s"] for r in back.filter("id < 3").collect()} == {"v0", "v1", "v2"}
    # container really says snappy
    files = avrolite._avro_files(path)
    meta, _, _ = avrolite._scan_blocks(files[0])
    assert meta["avro.codec"] == b"snappy"

    # golden back-reference: literal "abcd" then copy(len 4, offset 2)
    # -> "abcdcdcd"; preamble varint 8
    stream = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([(4 - 4) << 2 | 1, 2])
    assert avrolite._snappy_decompress(stream) == b"abcdcdcd"
    # overlapping copy: literal "ab" + copy(len 6, offset 2) -> "abababab"
    stream2 = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([(6 - 4) << 2 | 1, 2])
    assert avrolite._snappy_decompress(stream2) == b"abababab"

    import pytest as _pytest
    import struct as _struct
    import zlib as _zlib

    good = avrolite._snappy_compress(b"payload")
    block = good + _struct.pack(">I", (_zlib.crc32(b"payload") ^ 1) & 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="CRC"):
        avrolite._decompressor("snappy")(block)


def test_avro_stream_source_live(spark, tmp_path):
    """File-watch Avro stream (r8 verdict item 5): files consumed in name
    order, maxFilesPerTrigger honored, files appended MID-STREAM are
    picked up, every row lands exactly once."""
    import time

    register_avrolite(spark)
    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "out")

    def write_file(tag, lo, hi):
        import os as _os

        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, hi)], "id BIGINT, s STRING"
        )
        staging = str(tmp_path / f"stage_{tag}")
        df.coalesce(1).write.format("avrolite").mode("overwrite").save(staging)
        _os.makedirs(src, exist_ok=True)
        part = [f for f in _os.listdir(staging) if f.endswith(".avro")][0]
        _os.replace(
            _os.path.join(staging, part),
            _os.path.join(src, f"export_{tag}.avro"),
        )

    write_file("00", 0, 10)
    write_file("01", 10, 25)

    sizes, total = [], [0]

    def on_batch(df, bid):
        rows = df.collect()
        sizes.append(len(rows))
        if rows:
            df.sparkSession.createDataFrame(rows, df.schema).write.mode(
                "append"
            ).parquet(out)
        total[0] += len(rows)

    q = (
        spark.readStream.format("avrolite")
        .option("path", src)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    appended = False
    while total[0] < 40 and time.time() < deadline:
        if total[0] >= 25 and not appended:
            write_file("02", 25, 40)  # arrives mid-stream
            appended = True
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(40))
    # maxFilesPerTrigger=1: the two initial files arrive in separate
    # batches (10 then 15), never fused
    nonempty = [s for s in sizes if s]
    assert nonempty[0] == 10 and nonempty[1] == 15, sizes


def test_avro_stream_detects_removed_file(spark, tmp_path):
    """Offset carries (count, last-name): shrinking the directory under a
    checkpoint must raise (data loss), not silently re-read."""
    from pwc_challenge_dataengineer_spark.sources.avrolite import (
        AvroLiteStreamReader,
    )

    register_avrolite(spark)
    src = str(tmp_path / "src")
    df = spark.createDataFrame([(1, "a")], "id BIGINT, s STRING")
    df.coalesce(1).write.format("avrolite").mode("overwrite").save(src)
    r = AvroLiteStreamReader({"path": src})
    end = r.latestOffset()
    assert end["n"] == 1
    with pytest.raises(ValueError, match="data loss|removed"):
        r.partitions({"n": 2, "last": "zzz.avro"}, {"n": 2, "last": "zzz.avro"})
    with pytest.raises(ValueError, match="order changed"):
        r.partitions({"n": 0, "last": ""}, {"n": 1, "last": "other.avro"})


@pytest.mark.parametrize("codec", ["bzip2", "xz"])
def test_bzip2_and_xz_codecs_round_trip(spark, tmp_path, codec):
    """Avro's bzip2 and xz codecs are stdlib (bz2/lzma) — round trip plus
    container metadata pin, closing two more spec codecs jar-free (only
    zstandard remains gated)."""
    register_avrolite(spark)
    path = str(tmp_path / codec)
    df = spark.range(0, 3000).selectExpr("id", "repeat('pad', 10) AS s")
    (df.coalesce(1).write.format("avrolite")
       .option("codec", codec).mode("overwrite").save(path))
    files = avrolite._avro_files(path)
    meta, _, _ = avrolite._scan_blocks(files[0])
    assert meta["avro.codec"] == codec.encode()
    back = spark.read.format("avrolite").load(path)
    assert back.count() == 3000
    assert sorted(r["id"] for r in back.filter("id < 3").collect()) == [0, 1, 2]
    # these codecs actually compress (unlike literal-only snappy)
    import os as _os

    null_path = str(tmp_path / "null")
    (df.coalesce(1).write.format("avrolite")
       .option("codec", "null").mode("overwrite").save(null_path))
    sz = lambda p: sum(  # noqa: E731
        _os.path.getsize(f) for f in avrolite._avro_files(p)
    )
    assert sz(path) < sz(null_path)
