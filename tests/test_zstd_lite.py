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


def _seq_frame(literals: bytes, seq_tail: bytes, fcs: int) -> bytes:
    """Single-segment frame with one compressed block: raw literals
    (<=31 bytes) followed by the given raw sequence-section bytes."""
    assert len(literals) <= 31
    block = bytes([len(literals) << 3]) + literals + seq_tail
    bh = (len(block) << 3) | (2 << 1) | 1
    return (
        struct.pack("<I", 0xFD2FB528)
        + bytes([0x20, fcs])
        + struct.pack("<I", bh)[:3]
        + block
    )


def test_match_bounded_to_frame_start():
    # one sequence, all-RLE tables: ll=2 literals then a match at
    # offset 4 (of_value 7 = (1<<2) + extra bits 0b11) — only 2 bytes
    # exist in THIS frame, so the match must raise even when a prior
    # frame's output sits in the buffer (ADVICE r9: frame-start bound)
    tail = bytes([0x01, 0x54, 0x02, 0x02, 0x01, 0x07])
    frame = _seq_frame(b"ab", tail, 6)
    with pytest.raises(ValueError, match="frame start"):
        decompress(frame)
    prior = pa.Codec("zstd").compress(b"0123456789").to_pybytes()
    with pytest.raises(ValueError, match="frame start"):
        decompress(prior + frame)  # prior-frame bytes must NOT satisfy it


def test_in_frame_match_still_decodes():
    # same shape but 6 literals precede the match, so offset 4 is legal:
    # "abcdef" + 4 bytes copied from offset 4 -> "abcdef" + "cdef"
    tail = bytes([0x01, 0x54, 0x06, 0x02, 0x01, 0x07])
    assert decompress(_seq_frame(b"abcdef", tail, 10)) == b"abcdefcdef"


def test_bitstream_underflow_raises():
    # the offset extra bits are missing (bitstream holds only the
    # sentinel): zero-padding would decode silently wrong bytes
    tail = bytes([0x01, 0x54, 0x02, 0x02, 0x01, 0x01])
    with pytest.raises(ValueError, match="underflow"):
        decompress(_seq_frame(b"ab", tail, 6))


def test_offset_table_accuracy_cap():
    # OF table declared with accuracy_log 9 (4-bit field = 4): legal for
    # LL/ML but beyond the RFC's OF maximum of 8 -> must raise
    tail = bytes([0x01, 0x64, 0x05, 0x04])
    with pytest.raises(ValueError, match="table max 8"):
        decompress(_seq_frame(b"", tail, 0))
