"""Byte-level tests for the round-9 media-metadata codecs: GIF (full
LZW + interlace decode), MP3 (frame-header walk) and H.264 (Annex-B NAL
walk + SPS parse). No Spark session needed — the distributed plumbing is
oracle-verified by the gif_real_decode / mp3_metadata_scan /
h264_sps_parse catalog queries; these pin the format contracts,
including against a PUBLIC golden GIF vector (so the LZW width/packing
protocol matches real-world files, not merely this repo's own encoder).
"""

from __future__ import annotations

import pytest

from pwc_challenge_dataengineer_spark.functions.gif_codec import (
    gif_index,
    gif_palette,
    lzw_decode,
    lzw_encode,
    make_gif,
    parse_gif,
)
from pwc_challenge_dataengineer_spark.functions.h264_meta import (
    escape_rbsp,
    h264_geometry,
    make_h264,
    parse_h264,
    sei_payload,
    unescape_rbsp,
)
from pwc_challenge_dataengineer_spark.functions.mpeg_audio import (
    make_mp3,
    mp3_frame_plan,
    parse_mp3,
)

# The canonical "smallest GIF" (1x1, 2-color, widely published public
# vector): decodes to a single pixel of palette index 0. Pins the LZW
# bit-packing protocol (LSB-first, clear=4 / eoi=5 at width 3) against
# an externally-authored file.
_GOLDEN_GIF_1PX = bytes.fromhex(
    "47494638396101000100800000000000ffffff"
    "21f90401000000002c00000000010001000002024401003b"
)


def test_gif_golden_public_vector():
    w, h, pal, idx = parse_gif(_GOLDEN_GIF_1PX)
    assert (w, h) == (1, 1)
    assert pal == [(0, 0, 0), (255, 255, 255)]
    assert idx == [0]


def test_gif_round_trip_interlace_and_palette():
    for seed in range(0, 251, 13):
        w, h, pal, idx = parse_gif(make_gif(seed))
        assert (w, h) == (8, 8)
        assert pal == [gif_palette(seed, i) for i in range(8)]
        # logical (de-interlaced) order must match the generation form
        assert idx == [gif_index(seed, p) for p in range(64)]


def test_gif_rows_actually_differ():
    # the pixel formula is row-dependent; a wrong de-interlace must
    # change at least one row sum (guard against a degenerate oracle)
    _w, _h, pal, idx = parse_gif(make_gif(17))
    sums = [
        sum(sum(pal[i]) for i in idx[y * 8 : (y + 1) * 8]) for y in range(8)
    ]
    assert len(set(sums)) > 1


def test_lzw_width_crossings_and_kwkwk():
    # long sequences force 4->5->6 bit growth; aaa... forces KwKwK
    seq = [(i * i + 3 * i) % 8 for i in range(5000)]
    assert lzw_decode(lzw_encode(seq, 3), 3, len(seq)) == seq
    run = [5] * 100
    assert lzw_decode(lzw_encode(run, 3), 3, 100) == run


def test_gif_gates_and_corruption():
    data = bytearray(make_gif(3))
    data[:6] = b"GIF87a"
    with pytest.raises(NotImplementedError):
        parse_gif(bytes(data))
    with pytest.raises(ValueError):
        parse_gif(b"NOTGIF" + bytes(20))


def test_mp3_walk_matches_plan():
    for seed in (0, 1, 4, 7, 100, 250):
        s = parse_mp3(make_mp3(seed))
        plan = mp3_frame_plan(seed)
        assert s["n_frames"] == len(plan)
        assert s["sum_bitrate_kbps"] == sum(k for k, _ in plan)
        assert s["padded_frames"] == sum(p for _, p in plan)
        assert s["is_vbr"] == (0 if seed % 4 == 0 else 1)
        assert s["id3v2_size"] == 17 + seed % 23
        assert s["has_id3v1"] == 1


def test_mp3_lost_sync_and_gates():
    data = bytearray(make_mp3(5))
    # corrupt the first frame's sync byte (after the ID3v2 tag)
    tag_end = 10 + (17 + 5 % 23)
    data[tag_end] = 0x00
    with pytest.raises(ValueError, match="lost sync"):
        parse_mp3(bytes(data))
    # MPEG-2 version bits -> honest gate
    data = bytearray(make_mp3(5))
    data[tag_end + 1] = 0xF3  # version bits 10 = MPEG-2
    with pytest.raises(NotImplementedError):
        parse_mp3(bytes(data))


def test_h264_sps_geometry_and_sei_escape():
    for seed in (0, 1, 2, 5, 6, 123, 250):
        s = parse_h264(make_h264(seed))
        g = h264_geometry(seed)
        assert s["vid_width"] == g["width"]
        assert s["vid_height"] == g["height"]
        assert s["n_idr"] == g["n_idr"]
        assert s["n_nonidr"] == g["n_nonidr"]
        assert s["sei_sum"] == sum(sei_payload(seed))


def test_h264_emulation_prevention_on_wire():
    # the SEI payload embeds 00 00 01 / 02 / 03 runs: the escaped wire
    # bytes must differ from the raw payload, and the only 00 00 01 runs
    # in the whole stream must be start codes (every NAL header follows)
    raw = sei_payload(9)
    assert escape_rbsp(raw) != raw
    assert unescape_rbsp(escape_rbsp(raw)) == raw
    data = make_h264(9)
    i = data.find(b"\x00\x00\x01", 0)
    types = set()
    while i != -1:
        types.add(data[i + 3] & 0x1F)
        i = data.find(b"\x00\x00\x01", i + 3)
    assert types <= {7, 8, 6, 5, 1, 0}  # 0 = the 4-byte start-code prefix


# ---------------------------------------------------------------- WARC
from pwc_challenge_dataengineer_spark.functions.warc_codec import (  # noqa: E402
    make_warc,
    make_warc_gz,
    parse_warc,
    warc_plan,
)


def test_warc_walk_matches_plan_plain_and_gzip():
    for seed in (0, 1, 4, 9, 123, 250):
        plan = warc_plan(seed)
        for data in (make_warc(seed), make_warc_gz(seed)):
            s = parse_warc(data)
            assert s["n_records"] == 1 + 2 * len(plan)
            assert s["n_responses"] == s["n_requests"] == len(plan)
            assert s["http_200"] == sum(1 for p in plan if p["status"] == 200)
            assert s["total_payload_bytes"] == sum(p["body_len"] for p in plan)


def test_warc_gzip_is_per_record_multistream():
    # Common Crawl layout: one gzip member per record, so any member
    # boundary is an independent split point
    gz = make_warc_gz(7)
    n_members = gz.count(b"\x1f\x8b\x08")
    assert n_members == 1 + 2 * len(warc_plan(7))


def test_warc_framing_errors_detected():
    data = bytearray(make_warc(3))
    data[:8] = b"WARC/9.9"
    with pytest.raises(ValueError, match="version"):
        parse_warc(bytes(data))
    # corrupt a Content-Length so the CRLFCRLF terminator misaligns
    data = make_warc(3)
    i = data.index(b"Content-Length: ")
    bad = data[: i + 16] + b"9" + data[i + 16 :]
    with pytest.raises((ValueError, KeyError, IndexError)):
        parse_warc(bad)


# ---------------------------------------------------------------- TIFF
from pwc_challenge_dataengineer_spark.functions.tiff_codec import (  # noqa: E402
    make_tiff,
    packbits_decode,
    packbits_encode,
    parse_tiff,
    tiff_pixel,
)


def test_tiff_round_trip_both_endiannesses():
    for seed in (0, 1, 2, 7, 42, 101, 250):  # even=II, odd=MM
        w, h, px = parse_tiff(make_tiff(seed))
        assert (w, h) == (6, 8)
        assert px == [tiff_pixel(seed, p) for p in range(48)]


def test_tiff_inline_short_strip_arrays():
    # ADVICE r9: two inline SHORTs (typ=3 count=2, 4 bytes — legal for
    # StripOffsets/StripByteCounts on a 2-strip file) must decode as TWO
    # values on both endians, not one mangled 32-bit int.
    import struct as _s

    def build(endian: str) -> tuple[bytes, list[tuple[int, int, int]]]:
        width, height, rps = 2, 4, 2
        px = [((7 * p + 1) % 256, (7 * p + 2) % 256, (7 * p + 3) % 256)
              for p in range(width * height)]
        raw = b"".join(bytes(t) for t in px)
        strips = [raw[:12], raw[12:]]
        offsets = [8, 20]

        def short_pair(tag, v1, v2):
            return _s.pack(endian + "HHIHH", tag, 3, 2, v1, v2)

        def one(tag, typ, count, value):
            if typ == 3 and count == 1:  # inline, left-justified
                return _s.pack(endian + "HHIHH", tag, typ, count, value, 0)
            return _s.pack(endian + "HHII", tag, typ, count, value)

        ifd_offset = 8 + 24
        n_entries = 10
        bits_off = ifd_offset + 2 + n_entries * 12 + 4
        entries = [
            one(256, 3, 1, width),
            one(257, 3, 1, height),
            one(258, 3, 3, bits_off),
            one(259, 3, 1, 1),  # uncompressed
            one(262, 3, 1, 2),
            short_pair(273, *offsets),   # StripOffsets: inline SHORTs
            one(277, 3, 1, 3),
            one(278, 3, 1, rps),
            short_pair(279, 12, 12),     # StripByteCounts: inline SHORTs
            one(284, 3, 1, 1),
        ]
        out = bytearray()
        out += (b"II" if endian == "<" else b"MM")
        out += _s.pack(endian + "HI", 42, ifd_offset)
        out += strips[0] + strips[1]
        out += _s.pack(endian + "H", n_entries)
        for e in entries:
            out += e
        out += _s.pack(endian + "I", 0)
        out += _s.pack(endian + "HHH", 8, 8, 8)
        return bytes(out), px

    for endian in ("<", ">"):
        data, px = build(endian)
        w, h, got = parse_tiff(data)
        assert (w, h) == (2, 4)
        assert got == px


def test_packbits_edge_runs():
    for payload in (b"", b"a", b"aaaa", b"abc", bytes(300), b"ab" * 200):
        assert packbits_decode(packbits_encode(payload), len(payload)) == payload


def test_tiff_gates():
    data = bytearray(make_tiff(4))
    # flip compression tag 259 value to LZW (5): find via parse offsets —
    # cheaper to just corrupt the byte-order mark variants instead
    with pytest.raises(ValueError, match="byte-order"):
        parse_tiff(b"XX" + bytes(data[2:]))
    import struct
    bad = bytearray(make_tiff(4))
    struct.pack_into("<H", bad, 2, 43)  # BigTIFF magic
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        parse_tiff(bytes(bad))


def test_warc_zstd_input():
    # .warc.zst: whole-file zstd frames (pyarrow's libzstd as the
    # independent compressor); stats must match the plain parse
    pa = pytest.importorskip("pyarrow")
    raw = make_warc(11)
    z = pa.Codec("zstd").compress(raw).to_pybytes()
    assert parse_warc(z) == parse_warc(raw)


def test_gif_animation_census_and_frames():
    from pwc_challenge_dataengineer_spark.functions.gif_codec import (
        make_animated_gif,
        parse_gif_animation,
    )

    for seed in (0, 1, 6, 123, 250):
        w, h, nf, delay, loop, frames = parse_gif_animation(
            make_animated_gif(seed)
        )
        assert (w, h) == (8, 8) and nf == 3 + seed % 4
        assert delay == sum((seed + 10 * f) % 50 for f in range(nf))
        assert loop is True
        # every frame decodes, and frames genuinely differ
        assert len({tuple(f) for f in frames}) == nf
    # single-frame interlaced files parse through the census path too
    w, h, nf, delay, loop, frames = parse_gif_animation(make_gif(9))
    assert nf == 1 and loop is False
    assert frames[0] == [gif_index(9, p) for p in range(64)]


def test_tiff_lzw_roundtrip_and_width_growth():
    """r13: TIFF-variant LZW (MSB-first, EarlyChange) — roundtrips
    through the independent decoder across width bumps (9->10->11->12)
    and a table reset, plus the KwKwK case and the EOI-width edge (the
    decoder's add on the final data code can bump its read width; the
    encoder must simulate it)."""
    import random

    from pwc_challenge_dataengineer_spark.functions.tiff_codec import (
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    rnd = random.Random(13)
    for n in (0, 1, 2, 144, 510, 511, 512, 5000, 40000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data, n
    # KwKwK: immediate self-extending sequence
    data = b"ababababab" * 50
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data
    # long runs then high-entropy tail (forces reset mid-structure)
    data = b"z" * 8000 + bytes(range(256)) * 32
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


def test_tiff_lzw_full_file_decode_both_endians():
    """LZW TIFFs parse end-to-end on II and MM headers with the same
    closed-form pixels as PackBits files."""
    from pwc_challenge_dataengineer_spark.functions.tiff_codec import (
        make_tiff,
        parse_tiff,
        tiff_pixel,
    )

    for seed in (0, 1, 6, 33):
        data = make_tiff(seed, compression="lzw")
        w, h, px = parse_tiff(data)
        assert (w, h) == (6, 8)
        assert px == [tiff_pixel(seed, p) for p in range(w * h)]
    # compression tag is honestly recorded: 5 vs 32773
    import struct

    lzw = make_tiff(2, compression="lzw")
    pb = make_tiff(2, compression="packbits")
    assert b"\x05\x00" in lzw or b"\x00\x05" in lzw
    assert lzw != pb
