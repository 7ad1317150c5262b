"""Pure-stdlib H.264 (ITU-T H.264 / ISO 14496-10) Annex-B metadata walker.

The video leg of the media-metadata story: a corpus pipeline's first
question about a video payload is its dimensions, profile/level and
keyframe census — all of which live in the SPS NAL unit and the NAL
header bytes, parseable with a bit reader and Exp-Golomb decode, no
codec library. Pixel decode (CABAC/CAVLC slice data, inter prediction,
deblocking) stays honestly NotImplementedError-gated; this module
closes the metadata half, like mpeg_audio.py does for MP3.

Writer/parser are independent implementations of the public spec:

- ``make_h264`` assembles an Annex-B stream (4-byte start codes): SPS
  (baseline profile, Exp-Golomb-coded geometry incl. frame cropping),
  PPS, an SEI whose payload deliberately contains 00 00 01 / 00 00 02 /
  00 00 03 runs so EMULATION-PREVENTION bytes must be inserted, and a
  seed-driven census of IDR / non-IDR slice NALs.
- ``parse_h264`` scans start codes (3- and 4-byte), strips emulation
  prevention to recover the RBSP, parses the SPS bit-exactly (ue(v)
  fields, cropping arithmetic with 4:2:0 crop units) and sums the SEI
  payload — a value that is only right if the de-escape is.
"""

from __future__ import annotations


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        # Exp-Golomb: leadingZeroBits = floor(log2(value+1)); codeNum = value
        v = value + 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def rbsp_trailing(self) -> bytes:
        self.bits.append(1)  # rbsp_stop_one_bit
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("H.264: malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte wherever 00 00 0x(0-3)
    would otherwise appear (spec 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def unescape_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < len(ebsp) and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def h264_geometry(seed: int) -> dict:
    """Closed-form seed -> SPS geometry shared with the DuckDB oracle."""
    mb_w = 2 + seed % 9
    mb_h = 2 + (seed // 3) % 7
    crop_r = seed % 2  # in 4:2:0 crop units (2 px each)
    crop_b = (seed // 2) % 2
    return {
        "mb_w": mb_w,
        "mb_h": mb_h,
        "crop_r": crop_r,
        "crop_b": crop_b,
        "level_idc": 30 + (seed % 3) * 10,
        "max_ref_frames": 1 + seed % 4,
        "n_idr": 1 + seed % 3,
        "n_nonidr": 3 + seed % 5,
        "width": mb_w * 16 - 2 * crop_r,
        "height": mb_h * 16 - 2 * crop_b,
    }


def sei_payload(seed: int) -> bytes:
    """16-byte user_data_unregistered UUID containing three start-code-
    shaped runs — forces emulation prevention on the wire."""
    return bytes(
        (
            0, 0, 1, seed % 256,
            0, 0, 2, (seed * 3) % 256,
            0, 0, 3, (seed * 5) % 256,
            (seed + 1) % 256, (seed + 2) % 256, 0, 0,
        )
    )


_START = b"\x00\x00\x00\x01"


def make_h264(seed: int) -> bytes:
    g = h264_geometry(seed)
    out = bytearray()
    # --- SPS (nal_ref_idc 3, type 7)
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: baseline
    w.u(0, 8)  # constraint flags + reserved
    w.u(g["level_idc"], 8)
    w.ue(0)  # sps_id
    w.ue(seed % 5)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type
    w.ue(g["max_ref_frames"])
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(g["mb_w"] - 1)
    w.ue(g["mb_h"] - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop = 1 if (g["crop_r"] or g["crop_b"]) else 0
    w.u(crop, 1)
    if crop:
        w.ue(0)  # left
        w.ue(g["crop_r"])
        w.ue(0)  # top
        w.ue(g["crop_b"])
    w.u(0, 1)  # vui_parameters_present_flag
    out += _START + b"\x67" + escape_rbsp(w.rbsp_trailing())
    # --- PPS (type 8)
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # entropy_coding_mode (CAVLC)
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.ue(0)  # pic_init_qp_minus26: se(0) encodes as ue(0)
    w.ue(0)  # pic_init_qs_minus26
    w.ue(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    out += _START + b"\x68" + escape_rbsp(w.rbsp_trailing())
    # --- SEI (type 6, nal_ref_idc 0 per spec 7.4.1): escape-forcing payload
    payload = sei_payload(seed)
    sei = bytes((5, len(payload))) + payload
    out += _START + b"\x06" + escape_rbsp(sei + b"\x80")
    # --- slice NALs: headers only (slice data decode is out of scope)
    for i in range(g["n_idr"]):
        out += _START + b"\x65" + bytes(((seed + i) % 256, 0x80))
    for i in range(g["n_nonidr"]):
        # exercise 3-byte start codes on the non-IDR census
        out += b"\x00\x00\x01" + b"\x41" + bytes(((seed + 7 * i) % 256, 0x80))
    return bytes(out)


def parse_h264(data: bytes):
    """Annex-B walk: start-code scan (3/4-byte), NAL census, SPS parse
    with full cropping arithmetic, SEI payload sum through the
    de-escape. Slice pixel decode raises nowhere — it is simply not
    attempted (metadata only). High-profile SPS (chroma_format_idc
    signalling) raises NotImplementedError."""
    nals: list[bytes] = []
    i = 0
    n = len(data)
    starts: list[int] = []
    while i + 3 <= n:
        if data[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for j, s in enumerate(starts):
        e = (starts[j + 1] - 3) if j + 1 < len(starts) else n
        while e > s and data[e - 1] == 0:  # trailing zeros belong to next start code
            e -= 1
        nals.append(data[s:e])
    if not nals:
        raise ValueError("H.264: no NAL units")
    stats = {"n_idr": 0, "n_nonidr": 0, "n_sei": 0, "n_pps": 0, "sei_sum": None}
    sps = None
    for nal in nals:
        ref_idc = (nal[0] >> 5) & 0x3
        ntype = nal[0] & 0x1F
        if nal[0] & 0x80:
            raise ValueError("H.264: forbidden_zero_bit set")
        rbsp = unescape_rbsp(nal[1:])
        if ntype == 7:
            r = _BitReader(rbsp)
            profile = r.u(8)
            r.u(8)  # constraint/reserved
            level = r.u(8)
            r.ue()  # sps_id
            if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
                raise NotImplementedError("high-profile SPS not parsed here")
            log2_mfn = r.ue() + 4
            poc_type = r.ue()
            if poc_type == 1:
                raise NotImplementedError("pic_order_cnt_type 1")
            max_ref = r.ue()
            r.u(1)
            mb_w = r.ue() + 1
            mb_h = r.ue() + 1
            frame_mbs_only = r.u(1)
            if not frame_mbs_only:
                r.u(1)  # mb_adaptive_frame_field_flag
            r.u(1)  # direct_8x8_inference_flag
            crop_l = crop_r = crop_t = crop_b = 0
            if r.u(1):
                crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
            # 4:2:0 crop units: x=2, y=2*(2-frame_mbs_only)
            unit_y = 2 * (2 - frame_mbs_only)
            sps = {
                "profile_idc": profile,
                "level_idc": level,
                "log2_max_frame_num": log2_mfn,
                "max_ref_frames": max_ref,
                "vid_width": mb_w * 16 - 2 * (crop_l + crop_r),
                "vid_height": (2 - frame_mbs_only) * mb_h * 16
                - unit_y * (crop_t + crop_b),
            }
        elif ntype == 8:
            stats["n_pps"] += 1
        elif ntype == 6:
            ptype, plen = rbsp[0], rbsp[1]
            if ptype != 5:
                raise NotImplementedError(f"SEI payload type {ptype}")
            stats["n_sei"] += 1
            stats["sei_sum"] = sum(rbsp[2 : 2 + plen])
        elif ntype == 5:
            stats["n_idr"] += 1
        elif ntype == 1:
            stats["n_nonidr"] += 1
        else:
            raise NotImplementedError(f"NAL type {ntype}")
        _ = ref_idc
    if sps is None:
        raise ValueError("H.264: no SPS")
    return {**sps, **stats}
