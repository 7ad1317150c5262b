"""Pure-stdlib MPEG audio (MP3) frame-header walker.

What a crawl/corpus pipeline actually needs from an MP3 before any
training use is its METADATA — duration, bitrate profile, CBR/VBR,
tag overhead — and all of that comes from the frame-header walk, which
needs no codec library (ISO/IEC 11172-3 headers are 4 fixed bytes and a
closed-form frame-length formula). Full Layer III sample decode
(Huffman spectral data + IMDCT + polyphase synthesis) stays honestly
NotImplementedError-gated; this module closes the metadata half of the
MP3 gate the way avrolite closed the Avro jar gate — by walking the
container format itself.

Writer/parser are independent: ``make_mp3`` assembles ID3v2.3 tag +
MPEG-1 Layer III frames + ID3v1 trailer from closed-form seed rules;
``parse_mp3`` walks sync words, validates version/layer, applies the
spec frame-length formula (144 * bitrate / sample_rate + padding) and
accumulates the per-file stats the DuckDB oracle recomputes
analytically.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free-format
_BITRATE_KBPS = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_SAMPLE_RATE = (44100, 48000, 32000)  # MPEG-1 sample-rate index 0..2
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _syncsafe(n: int) -> bytes:
    return bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F))


def _read_syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def mp3_frame_plan(seed: int) -> list[tuple[int, int]]:
    """Per-frame (bitrate_kbps, padding_bit) closed form shared with the
    DuckDB oracle: seed % 4 == 0 files are CBR at 128 kbps, the rest
    cycle 128/160/192 (VBR); padding alternates on (seed + k) % 2."""
    n_frames = 12 + seed % 9
    plan = []
    for k in range(n_frames):
        if seed % 4 == 0:
            kbps = 128
        else:
            kbps = (128, 160, 192)[(seed + k) % 3]
        plan.append((kbps, (seed + k) % 2))
    return plan


def make_mp3(seed: int) -> bytes:
    """ID3v2.3 tag (syncsafe size), MPEG-1 Layer III frames per
    ``mp3_frame_plan``, ID3v1 trailer. Sample rate fixed at 44100
    (index 0), joint stereo, no CRC."""
    out = bytearray()
    tag_body = 17 + seed % 23
    out += b"ID3\x03\x00\x00" + _syncsafe(tag_body) + bytes(tag_body)
    for kbps, pad in mp3_frame_plan(seed):
        br_index = _BITRATE_KBPS.index(kbps)
        h0 = 0xFF
        h1 = 0b1111_1011  # sync(3) | version MPEG-1 (11) | layer III (01) | no CRC (1)
        h2 = (br_index << 4) | (0 << 2) | (pad << 1)  # sr index 0 = 44100
        h3 = 0b01_00_0_0_1_0  # joint stereo, original
        frame_len = (144 * kbps * 1000) // _SAMPLE_RATE[0] + pad
        out += bytes((h0, h1, h2, h3)) + bytes(frame_len - 4)
    out += b"TAG" + bytes(125)  # ID3v1 trailer
    return bytes(out)


def parse_mp3(data: bytes):
    """Frame-header walk: skip ID3v2, verify sync/version/layer at each
    frame boundary, stride by the spec length formula, stop at the ID3v1
    trailer. Returns a dict of per-file stats. MPEG-2/2.5, Layers I/II
    and free-format bitrate raise NotImplementedError (full sample
    decode is likewise out of scope here — metadata only)."""
    pos = 0
    id3v2_size = 0
    if data[:3] == b"ID3":
        id3v2_size = _read_syncsafe(data[6:10])
        pos = 10 + id3v2_size
    n_frames = 0
    sum_kbps = 0
    padded = 0
    bitrates = set()
    sample_rate = None
    has_id3v1 = 0
    while pos + 4 <= len(data):
        if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
            has_id3v1 = 1
            pos += 128
            break
        h0, h1, h2, _h3 = data[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        version = (h1 >> 3) & 0x3
        layer = (h1 >> 1) & 0x3
        if version != 0b11:
            raise NotImplementedError("MPEG-2/2.5 audio not walked here")
        if layer != 0b01:
            raise NotImplementedError("only Layer III walked here")
        br_index = (h2 >> 4) & 0xF
        sr_index = (h2 >> 2) & 0x3
        pad = (h2 >> 1) & 0x1
        if br_index == 0:
            raise NotImplementedError("free-format bitrate")
        if br_index == 0xF or sr_index == 3:
            raise ValueError("MP3: invalid bitrate/sample-rate index")
        kbps = _BITRATE_KBPS[br_index]
        sr = _SAMPLE_RATE[sr_index]
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("MP3: sample rate changed mid-stream")
        frame_len = (144 * kbps * 1000) // sr + pad
        if pos + frame_len > len(data):
            raise ValueError("MP3: truncated final frame")
        n_frames += 1
        sum_kbps += kbps
        padded += pad
        bitrates.add(kbps)
        pos += frame_len
    if n_frames == 0:
        raise ValueError("MP3: no frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "total_samples": n_frames * _SAMPLES_PER_FRAME,
        "sum_bitrate_kbps": sum_kbps,
        "padded_frames": padded,
        "is_vbr": int(len(bitrates) > 1),
        "id3v2_size": id3v2_size,
        "has_id3v1": has_id3v1,
    }
