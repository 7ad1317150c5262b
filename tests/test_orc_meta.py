"""ORC tail decode pinned against Spark's native ORC writer (an
independent implementation) across all three supported codecs, plus the
protobuf wire-format and chunk-framing edge cases."""

from __future__ import annotations

import glob
import os

import pytest

from pwc_challenge_dataengineer_spark.sources.orc_meta import (
    _decode_message,
    _decompress_stream,
    int_column_stats,
    read_orc_tail,
    stripe_info,
)


@pytest.fixture(scope="module")
def orc_files(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("orc"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {}
    for codec in ("zlib", "snappy", "none", "lz4"):
        d = os.path.join(base, codec)
        docs.coalesce(1).write.option("compression", codec).orc(d)
        out[codec] = glob.glob(d + "/*.orc")[0]
    return out, docs


def test_footer_stats_match_data_all_codecs(orc_files):
    files, docs = orc_files
    exp = docs.selectExpr(
        "count(*)", "min(doc_id)", "max(doc_id)", "sum(doc_id)"
    ).collect()[0]
    for codec, path in files.items():
        n, lo, hi, sm, has_null = int_column_stats(path, 1)
        assert (n, lo, hi, sm) == tuple(exp), codec
        assert has_null is False
        stripes = stripe_info(path)
        assert sum(rows for _, _, rows in stripes) == n


def test_non_orc_and_unknown_codec(orc_files, tmp_path):
    p = str(tmp_path / "x.orc")
    with open(p, "wb") as fh:
        fh.write(b"\x00" * 20 + b"\x03")
    with pytest.raises(ValueError):
        read_orc_tail(p)
    with pytest.raises(NotImplementedError, match="compression kind"):
        _decompress_stream(b"\x04\x00\x00zz", 3)  # LZO chunk


def test_generic_protobuf_decode_skips_unknown_fields():
    # field 1 varint 150; field 99 length-delimited "abc"; field 3 fixed32
    # key for field 99 wire-type 2 is varint 794 = 0x9A 0x06
    msg = (
        bytes([0x08, 0x96, 0x01])
        + bytes([0x9A, 0x06, 3]) + b"abc"
        + bytes([(3 << 3) | 5]) + b"\x01\x02\x03\x04"
    )
    out = _decode_message(msg)
    assert out[1] == [150]
    assert out[99] == [b"abc"]
    assert out[3] == [b"\x01\x02\x03\x04"]


def test_lz4_block_edge_cases():
    from pwc_challenge_dataengineer_spark.sources.orc_meta import (
        _lz4_block_decompress,
    )

    # literals-only final sequence
    assert _lz4_block_decompress(bytes([0x30]) + b"abc") == b"abc"
    # overlapping match (offset 1 replicates the last byte, RLE-style)
    blk = bytes([0x11]) + b"a" + bytes([0x01, 0x00])  # 1 literal, match 4+1 @1
    assert _lz4_block_decompress(blk) == b"aaaaaa"
    # extended literal length: 15 + 255 + 3 = 273 literals
    lits = bytes(273)
    blk = bytes([0xF0, 255, 3]) + lits
    assert _lz4_block_decompress(blk) == lits
