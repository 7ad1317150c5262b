"""PNG codec (functions/multimodal.py make_png/parse_png): round trip per
filter type, CRC validation, honest gates. Pure-Python — no Spark session
(the Spark plumbing is covered by the png_real_decode oracle query)."""

import struct
import zlib

import pytest

from pwc_challenge_dataengineer_spark.functions import multimodal as mm


def _expected(seed, w, h):
    return [
        (
            (seed + 3 * p + 2) % 256,
            (seed + 3 * p + 1) % 256,
            (seed + 3 * p) % 256,
        )
        for p in range(w * h)
    ]


def test_round_trip_mixed_filters():
    # 10 rows -> filter types 0..4 each used twice
    for seed in (0, 17, 250):
        data = mm.make_png(seed)
        w, h, px = mm.parse_png(data)
        assert (w, h) == (mm._PNG_W, mm._PNG_H)
        assert px == _expected(seed, w, h)


def test_each_filter_type_alone():
    # height 1..5 slices isolate each filter type as the LAST row used
    for height in range(1, 6):
        data = mm.make_png(7, width=5, height=height)
        w, h, px = mm.parse_png(data)
        assert (w, h) == (5, height)
        assert px == _expected(7, 5, height)


def test_crc_corruption_detected():
    data = bytearray(mm.make_png(3))
    # flip one bit inside the IDAT payload (after sig + IHDR chunk)
    idat_at = data.index(b"IDAT")
    data[idat_at + 10] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        mm.parse_png(bytes(data))


def test_rgba_supported_alpha_dropped():
    # hand-build a 2x1 RGBA (color type 6) image, filter 0
    w, h = 2, 1
    raw = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )
    assert mm.parse_png(png) == (2, 1, [(10, 20, 30), (40, 50, 60)])


def test_honest_gates():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr16)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00\x00"))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit truecolor"):
        mm.parse_png(png)
    with pytest.raises(ValueError, match="signature"):
        mm.parse_png(b"JFIF....")
