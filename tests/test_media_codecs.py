"""Pure-Python tests for the real (no-codec) media containers: 24-bit BMP
and PCM WAV write->parse round trips, golden bytes, and the honest
NotImplementedError gates for compressed variants. No Spark session needed —
the distributed plumbing is oracle-verified by the multimodal_real_decode
catalog query; these pin the byte-level format contract."""

from __future__ import annotations

import struct

import pytest

from pwc_challenge_dataengineer_spark.functions.multimodal import (
    make_bmp,
    make_wav,
    parse_bmp,
    parse_wav,
)


def test_bmp_golden_bytes_1x1():
    # Hand-derived from the BMP spec: 14-byte file header, 40-byte
    # BITMAPINFOHEADER, one BGR pixel (0,1,2) + 1 pad byte to a 4-byte row.
    data = make_bmp(0, width=1, height=1)
    expected = (
        struct.pack("<2sIHHI", b"BM", 58, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
        + bytes([0, 1, 2, 0])
    )
    assert data == expected


def test_bmp_round_trip_includes_padding_and_row_order():
    for seed in (0, 1, 42, 250):
        for w, h in ((1, 1), (2, 3), (6, 4), (5, 2)):  # 5 -> 1 pad byte
            wth, hgt, px = parse_bmp(make_bmp(seed, width=w, height=h))
            assert (wth, hgt) == (w, h)
            expected = [
                (
                    (seed + 3 * p + 2) % 256,
                    (seed + 3 * p + 1) % 256,
                    (seed + 3 * p) % 256,
                )
                for p in range(w * h)
            ]
            assert px == expected


def test_bmp_top_down_negative_height():
    # Spec: negative biHeight means rows are stored top-down (no flip).
    data = bytearray(make_bmp(7, width=2, height=2))
    # Flip the stored rows so a top-down reading yields the same image,
    # then negate the height field.
    offset = struct.unpack_from("<I", bytes(data), 10)[0]
    stride = 2 * 3 + 2  # 2 px * 3 B + pad to 8
    r0 = bytes(data[offset : offset + stride])
    r1 = bytes(data[offset + stride : offset + 2 * stride])
    data[offset : offset + 2 * stride] = r1 + r0
    struct.pack_into("<i", data, 22, -2)
    assert parse_bmp(bytes(data)) == parse_bmp(make_bmp(7, width=2, height=2))


def test_bmp_gates():
    with pytest.raises(ValueError):
        parse_bmp(b"PNG........")
    data = bytearray(make_bmp(1))
    struct.pack_into("<H", data, 28, 8)  # 8-bit palette BMP
    with pytest.raises(NotImplementedError):
        parse_bmp(bytes(data))
    data = bytearray(make_bmp(1))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8 compression
    with pytest.raises(NotImplementedError):
        parse_bmp(bytes(data))


def test_wav_round_trip_against_stdlib_writer():
    for seed in (0, 3, 250):
        rate, samples = parse_wav(make_wav(seed))
        assert rate == 8000
        assert samples == [((seed * 7 + 13 * i) % 2003) - 1001 for i in range(64)]


def test_wav_gates():
    with pytest.raises(ValueError):
        parse_wav(b"OggS" + b"\x00" * 40)
    data = bytearray(make_wav(5))
    fmt_pos = data.find(b"fmt ")
    struct.pack_into("<H", data, fmt_pos + 8, 3)  # IEEE-float format tag
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(data))
