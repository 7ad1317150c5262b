"""Baseline JPEG codec (functions/jpeg_codec.py): closed-form round trip,
restart markers, byte unstuffing via a hand-assembled golden file, honest
gates for non-baseline frames.

The golden-byte test builds a grayscale 8x8 JPEG BY HAND from the T.81
spec (canonical 1-bit Huffman codes, stuffed FF 00 in the entropy
segment) — independent of the module's encoder, same evidence style as
the avrolite/protoshim golden tests."""

import struct

import pytest

from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
    CHECKER,
    JPEG_H,
    JPEG_W,
    coeffs_for,
    make_jpeg,
    parse_jpeg,
    ycbcr_to_rgb,
)


def _expected_planes(seed: int):
    a, b, c, d = coeffs_for(seed)
    Y = [
        [
            128
            + a[4 * (x // 16) + 2 * ((y % 16) // 8) + ((x % 16) // 8)]
            + CHECKER[x % 8]
            * CHECKER[y % 8]
            * b[4 * (x // 16) + 2 * ((y % 16) // 8) + ((x % 16) // 8)]
            for x in range(JPEG_W)
        ]
        for y in range(JPEG_H)
    ]
    Cb = [[128 + c[x // 16] for x in range(JPEG_W)] for _ in range(JPEG_H)]
    Cr = [[128 + d[x // 16] for x in range(JPEG_W)] for _ in range(JPEG_H)]
    return Y, Cb, Cr


@pytest.mark.parametrize("seed", [0, 7, 97, 250])
def test_round_trip_matches_closed_form(seed):
    w, h, pl = parse_jpeg(make_jpeg(seed))
    assert (w, h) == (JPEG_W, JPEG_H)
    Y, Cb, Cr = _expected_planes(seed)
    assert pl["Y"] == Y
    assert pl["Cb"] == Cb
    assert pl["Cr"] == Cr


@pytest.mark.parametrize("seed", [3, 42, 199])
def test_restart_markers_reset_dc_prediction(seed):
    """restart_interval=1 puts an RSTn between the two MCUs: the decoder
    must byte-align, consume the marker, and reset all DC predictors —
    pixels must be identical to the no-restart encoding."""
    data = make_jpeg(seed, restart_interval=1)
    assert b"\xff\xdd" in data  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + n]) in data for n in range(8))
    _, _, pl = parse_jpeg(data)
    _, _, pl0 = parse_jpeg(make_jpeg(seed))
    assert pl == pl0


def test_golden_hand_assembled_grayscale_with_byte_stuffing():
    """8x8 single-component file assembled byte-by-byte from T.81:
    DC Huffman code '0' (length 1) -> size 8, value bits 11111111 = 255;
    AC table's EOB code is '1' (second length-1 code), so the entropy
    stream is 0 11111111 1 + 1-padding = 0x7F 0xFF -> the 0xFF MUST be
    stuffed (FF 00). Decoded plane: DC 255, Q=1 -> IDCT flat
    round(255/8) + 128 = 160 everywhere. Exercises unstuffing, canonical
    table build from DHT, and _extend on an all-ones magnitude."""

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table 0: two length-1 codes; huffval order [8, 0] -> size 8 = '0'
    dc_bits = bytes([2] + [0] * 15)
    dht_dc = seg(0xC4, bytes([0x00]) + dc_bits + bytes([8, 0]))
    # AC table 0: two length-1 codes; huffval [0xF0, 0x00] -> EOB = '1'
    ac_bits = bytes([2] + [0] * 15)
    dht_ac = seg(0xC4, bytes([0x10]) + ac_bits + bytes([0xF0, 0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy: 0 | 11111111 | 1 | pad 111111 -> bytes 0x7F 0xFF(stuffed)
    entropy = bytes([0x7F, 0xFF, 0x00])
    data = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy
        + b"\xff\xd9"
    )
    w, h, pl = parse_jpeg(data)
    assert (w, h) == (8, 8)
    assert pl["Y"] == [[160] * 8] * 8


def test_non_baseline_and_garbage_raise():
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"\x89PNG\r\n\x1a\n")
    # SOF3 lossless is decoded for real now, but only single-component;
    # relabeling a 3-component baseline file as SOF3 must raise honestly
    data = bytearray(make_jpeg(5))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="multi-component lossless"):
        parse_jpeg(bytes(data))
    # hierarchical stays a gate
    data = bytearray(make_jpeg(5))
    data[i + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="frame type"):
        parse_jpeg(bytes(data))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 42, 250])
def test_lossless_round_trip_all_predictors(seed):
    """SOF3 decode must reproduce the closed-form samples byte-exactly;
    the seed sweep covers all seven T.81 H.1 predictor selectors and the
    boundary predictions (128 / Ra / Rb)."""
    from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
        LOSSLESS_H,
        LOSSLESS_W,
        lossless_px,
        make_lossless_jpeg,
    )

    w, h, planes = parse_jpeg(make_lossless_jpeg(seed))
    assert (w, h) == (LOSSLESS_W, LOSSLESS_H)
    assert planes["Y"] == [
        [lossless_px(seed, x, y) for x in range(LOSSLESS_W)]
        for y in range(LOSSLESS_H)
    ]


def test_corrupt_entropy_detected():
    """Truncating the entropy segment mid-MCU must fail loudly (marker or
    EOF inside entropy), never return a silently-short image."""
    data = make_jpeg(11)
    with pytest.raises((EOFError, ValueError, IndexError)):
        parse_jpeg(data[: len(data) - 40])


def test_ycbcr_to_rgb_fixed_point_bounds():
    assert ycbcr_to_rgb(128, 128, 128) == (128, 128, 128)
    r, g, b = ycbcr_to_rgb(255, 0, 255)
    assert all(0 <= v <= 255 for v in (r, g, b))
    assert ycbcr_to_rgb(0, 128, 128) == (0, 0, 0)


@pytest.mark.parametrize("seed", [0, 5, 42, 97, 250])
def test_progressive_decodes_identical_to_baseline(seed):
    """SOF2 five-scan file (interleaved DC first at Al=1, raw-bit DC
    refinement, non-interleaved AC spectral scans with EOB0 and EOBn+ext)
    must reconstruct the SAME pixels as the baseline encoding."""
    from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
        make_progressive_jpeg,
    )

    assert parse_jpeg(make_progressive_jpeg(seed)) == parse_jpeg(
        make_jpeg(seed)
    )


def test_progressive_partial_scan_is_visibly_coarse():
    """Progressive property: truncating after the DC scans (drop the AC
    scans) must still decode — to the flat per-block DC image (that is
    the point of progressive rendering). Verifies scans accumulate
    independently rather than all-or-nothing."""
    from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
        CHECKER,
        coeffs_for,
        make_progressive_jpeg,
    )

    seed = 42
    data = make_progressive_jpeg(seed)
    # cut just before the THIRD SOS (the first AC scan), keep EOI
    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    third = data.find(b"\xff\xda", second + 2)
    w, h, pl = parse_jpeg(data[:third] + b"\xff\xd9")
    a, b, c, d = coeffs_for(seed)
    for y in range(h):
        for x in range(w):
            k = 4 * (x // 16) + 2 * ((y % 16) // 8) + ((x % 16) // 8)
            assert pl["Y"][y][x] == 128 + a[k]  # DC only, no checker term
    assert pl["Cb"][0][0] == 128 + c[0]


@pytest.mark.parametrize("seed", [0, 5, 42, 97, 151, 250])
def test_ac_refine_decodes_identical_to_baseline(seed):
    """Eight-scan AC-successive-approximation file (AC first at Al=1,
    Ah=1 refinement with correction bits / newly-nonzero placement /
    refinement EOBRUN) must reconstruct the SAME pixels as the baseline
    and five-scan-progressive encodings."""
    from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
        make_ac_refine_jpeg,
    )

    assert parse_jpeg(make_ac_refine_jpeg(seed)) == parse_jpeg(
        make_jpeg(seed)
    )


def _nth_sos(data: bytes, n: int) -> int:
    pos = -1
    for _ in range(n):
        pos = data.find(b"\xff\xda", pos + 2)
    return pos


def test_ac_refine_partial_scan_is_half_precision():
    """Truncating before the Y AC refinement scan must decode to the
    Al=1 approximation: every pixel's AC contribution is the coefficient
    with its LOW BIT DROPPED toward zero (so the full-vs-partial delta
    at a block's top-left pixel is exactly |b|&1 in b's sign), and
    |b|==1 blocks contribute nothing at all yet."""
    from pwc_challenge_dataengineer_spark.functions.jpeg_codec import (
        make_ac_refine_jpeg,
    )

    checked_odd = checked_one = 0
    for seed in range(0, 251, 7):
        data = make_ac_refine_jpeg(seed)
        cut = _nth_sos(data, 4)  # scans 1-3 only: DC full, Y AC at Al=1
        _, _, part = parse_jpeg(data[:cut] + b"\xff\xd9")
        _, _, full = parse_jpeg(data)
        a, b, c, d = coeffs_for(seed)
        for by in range(2):
            for bx in range(4):
                k = 4 * (bx // 2) + 2 * by + (bx % 2)
                y, x = 8 * by, 8 * bx
                delta = full["Y"][y][x] - part["Y"][y][x]
                sign = 1 if b[k] > 0 else -1
                assert delta == sign * (abs(b[k]) & 1)
                if abs(b[k]) == 1:
                    checked_one += 1
                elif abs(b[k]) & 1:
                    checked_odd += 1
    assert checked_odd > 0 and checked_one > 0  # both refine paths hit
