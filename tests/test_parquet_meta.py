"""Thrift-compact parquet footer decode, pinned against files written by
INDEPENDENT writers (the driver's testdata parquet and DuckDB's own
COPY TO output) — not just Spark's — plus the protocol edge cases."""

from __future__ import annotations

import io
import struct

import duckdb
import pytest

from pwc_challenge_dataengineer_spark.sources.parquet_meta import (
    _read_compact_struct,
    int64_column_stats,
    read_footer,
)


def test_footer_stats_match_data_on_testdata_parquet():
    con = duckdb.connect()
    for path, col in (
        ("/root/testdata/sf0.001/documents.parquet", "doc_id"),
        ("/root/testdata/sf0.001/orders.parquet", "o_orderkey"),
        ("/root/testdata/sf0.001/lineitem.parquet", "l_orderkey"),
    ):
        n, lo, hi, nulls = int64_column_stats(path, col)
        exp = con.execute(
            f"SELECT COUNT(*), MIN({col}), MAX({col}) FROM '{path}'"
        ).fetchone()
        assert (n, lo, hi) == exp
        assert nulls == 0


def test_footer_of_duckdb_written_file(tmp_path):
    p = str(tmp_path / "d.parquet")
    duckdb.connect().execute(
        f"COPY (SELECT CAST(range AS BIGINT) AS v, "
        f"CASE WHEN range % 3 = 0 THEN NULL ELSE CAST(range * 2 AS BIGINT) "
        f"END AS w FROM range(100)) TO '{p}' (FORMAT PARQUET)"
    )
    n, lo, hi, nulls = int64_column_stats(p, "v")
    assert (n, lo, hi, nulls) == (100, 0, 99, 0)
    n, lo, hi, nulls = int64_column_stats(p, "w")
    assert (n, lo, hi) == (100, 2, 196)  # 99 % 3 == 0 -> max non-null is 98*2
    assert nulls == 34  # multiples of 3 in 0..99


def test_gates_and_errors(tmp_path):
    p = str(tmp_path / "x.parquet")
    with open(p, "wb") as fh:
        fh.write(b"\x00" * 16 + struct.pack("<I4s", 4, b"PARE"))
    with pytest.raises(NotImplementedError, match="encrypted"):
        read_footer(p)
    with open(p, "wb") as fh:
        fh.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="not a parquet"):
        read_footer(p)
    good = "/root/testdata/sf0.001/documents.parquet"
    with pytest.raises(KeyError):
        int64_column_stats(good, "no_such_column")
    with pytest.raises(ValueError, match="not INT64"):
        int64_column_stats(good, "text")


def test_compact_protocol_long_form_field_ids():
    # field id 200 forces the long-form (delta=0, zigzag varint id) path
    buf = io.BytesIO(bytes([0x05, 0x90, 0x03, 0x2A, 0x00]))
    # head 0x05: delta 0 -> long form, type 5 (i32); id = zigzag(400)=200;
    # value = zigzag(42)=21... build properly instead:
    payload = bytes([0x05]) + bytes([0x90, 0x03]) + bytes([0x54]) + b"\x00"
    # 0x90 0x03 varint = 400 -> zigzag 200; 0x54 varint = 84 -> zigzag 42
    out = _read_compact_struct(io.BytesIO(payload))
    assert out == {200: 42}


def test_compact_protocol_bools_in_collections():
    # bools are header-encoded in FIELDS but byte-encoded as ELEMENTS
    buf = io.BytesIO(bytes([0x31, 1, 0, 1]))  # list: size 3, elem type 1
    from pwc_challenge_dataengineer_spark.sources.parquet_meta import (
        _read_value,
    )

    assert _read_value(buf, 9) == [True, False, True]
    assert buf.read() == b""  # every element byte consumed
