"""Pure-stdlib GIF89a codec — encoder and independent decoder.

Closes the GIF gate the same way PNG (multimodal.py) and JPEG
(jpeg_codec.py) were closed: GIF's compression is LZW over palette
indices, which needs no codec library, so a crawl pipeline can decode it
jar- and dependency-free. The encoder and decoder are independent
implementations of the public GIF89a specification (CompuServe, 1990):

- variable-width LZW (initial width = min_code_size + 1, clear / EOI
  codes, width grows when the NEXT assignable code would not fit, 12-bit
  cap with clear-and-reset), packed LSB-first into <=255-byte sub-blocks;
- the encoder always writes the image INTERLACED (4-pass row shuffle),
  so a correct decode proves the de-interlace path, not just the LZW;
- extension blocks (Graphic Control 0xF9, Comment 0xFE) are written and
  generically skipped by the decoder, exercising the sub-block walk.

Protocol check: the canonical "smallest transparent GIF" byte vector
(public domain, reproduced in tests/test_media_meta.py) decodes to one
pixel of index 0 — the LZW width/packing rules here match real-world
files, not merely this module's own encoder.

Reference parity: the reference ingests media exports through its format
registry (see /root/reference/README.md media/export sections); this
module supplies the image leg jar-free. Animated GIFs (multiple image
descriptors) and local color tables raise NotImplementedError — stated,
not silently mangled.
"""

from __future__ import annotations

import struct

_GIF_SIG = b"GIF89a"


# ------------------------------------------------------------------ LZW
def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor variable-width LZW. Emits CLEAR first, resets the
    table at 4096 codes, grows the width when the next assignable code
    would exceed the current width's range."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    w_str = bytes([indices[0]])
    for k in indices[1:]:
        cand = w_str + bytes([k])
        if cand in table:
            w_str = cand
            continue
        emit(table[w_str], width)
        table[cand] = nxt
        nxt += 1
        w_str = bytes([k])
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt == 4097:  # 12-bit table full: clear and restart
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
    emit(table[w_str], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Independent GIF LZW decoder: KwKwK case, clear/EOI handling,
    width growth one entry ahead of the decoder's own table (the decoder
    lags the encoder by exactly one entry at equal stream positions)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8

    def read(w: int) -> int:
        nonlocal pos
        if pos + w > total_bits:
            raise ValueError("GIF LZW: bitstream exhausted")
        v = 0
        for i in range(w):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += w
        return v

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW: decoded fewer pixels than expected")
    return out[:n_pixels]


def _interlace_order(height: int) -> list[int]:
    """Row storage order for an interlaced GIF (4 passes)."""
    rows: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, height, step))
    return rows


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_GIF_W, _GIF_H, _GIF_NCOLORS = 8, 8, 8


def gif_palette(seed: int, i: int) -> tuple[int, int, int]:
    return (
        (seed * 3 + 5 * i) % 256,
        (seed * 5 + 7 * i) % 256,
        (seed * 7 + 11 * i) % 256,
    )


def gif_index(seed: int, p: int) -> int:
    """Palette index at logical pixel p = y*W + x; row-dependent so a
    wrong de-interlace changes row sums."""
    x, y = p % _GIF_W, p // _GIF_W
    return (seed + x * (1 + y)) % _GIF_NCOLORS


def make_gif(seed: int, width: int = _GIF_W, height: int = _GIF_H) -> bytes:
    """Spec-conformant interlaced GIF89a: global color table of 8
    colors, a Graphic Control and a Comment extension (so the decoder's
    generic extension skip is on the hot path), one interlaced image."""
    mcs = 3  # 8 colors -> min LZW code size 3
    out = bytearray(_GIF_SIG)
    # logical screen descriptor: GCT flag, color resolution 7, GCT size 2^(2+1)=8
    out += struct.pack("<HHBBB", width, height, 0b1_111_0_010, 0, 0)
    for i in range(_GIF_NCOLORS):
        out += bytes(gif_palette(seed, i))
    # graphic control extension (delay derived from seed; exercises skip)
    out += b"\x21\xf9\x04\x00" + struct.pack("<H", seed % 100) + b"\x00\x00"
    # comment extension
    out += b"\x21\xfe" + _sub_blocks(b"spark-graft seed %d" % seed)
    # image descriptor, interlace flag set, no local color table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0b0_1_0_00_000)
    logical = [gif_index(seed, p) for p in range(width * height)]
    stored: list[int] = []
    for y in _interlace_order(height):
        stored.extend(logical[y * width : (y + 1) * width])
    out.append(mcs)
    out += _sub_blocks(lzw_encode(stored, mcs))
    out += b"\x3b"
    return bytes(out)


def parse_gif(data: bytes):
    """Full single-frame GIF decode, stdlib only: header + logical
    screen descriptor, global color table, generic extension skip, LZW
    decode, de-interlace. Returns (width, height, palette, indices) with
    indices in logical top-down row-major order. Animated GIFs, local
    color tables and GIF87a raise NotImplementedError."""
    if data[:6] == b"GIF87a":
        raise NotImplementedError("GIF87a not decoded here (89a only)")
    if data[:6] != _GIF_SIG:
        raise ValueError("not a GIF file (bad signature)")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        for i in range(n):
            palette.append(tuple(data[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * n
    frames = 0
    indices: list[int] | None = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        frames += 1
        if frames > 1:
            raise NotImplementedError("animated GIF (multiple frames)")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x80:
            raise NotImplementedError("local color table")
        interlaced = bool(ipacked & 0x40)
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        stored = lzw_decode(bytes(lzw), mcs, iw * ih)
        if interlaced:
            logical = [0] * (iw * ih)
            for si, y in enumerate(_interlace_order(ih)):
                logical[y * iw : (y + 1) * iw] = stored[si * iw : (si + 1) * iw]
            indices = logical
        else:
            indices = stored
        if left or top or iw != width or ih != height:
            raise NotImplementedError("sub-rectangle image placement")
    if indices is None:
        raise ValueError("GIF: no image data")
    return width, height, palette, indices


def make_animated_gif(seed: int, width: int = _GIF_W, height: int = _GIF_H) -> bytes:
    """Multi-frame GIF89a: NETSCAPE2.0 loop extension, then
    3 + seed % 4 frames, each with its own Graphic Control Extension
    (delay = (seed + 10*f) % 50 centiseconds) and non-interlaced LZW
    image data whose pixels shift per frame (idx + f) % 8."""
    n_frames = 3 + seed % 4
    mcs = 3
    out = bytearray(_GIF_SIG)
    out += struct.pack("<HHBBB", width, height, 0b1_111_0_010, 0, 0)
    for i in range(_GIF_NCOLORS):
        out += bytes(gif_palette(seed, i))
    # application extension: NETSCAPE2.0 infinite loop
    out += b"\x21\xff\x0bNETSCAPE2.0" + bytes((3, 1, 0, 0, 0))
    for f in range(n_frames):
        delay = (seed + 10 * f) % 50
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        idx = [
            (gif_index(seed, p) + f) % _GIF_NCOLORS
            for p in range(width * height)
        ]
        out.append(mcs)
        out += _sub_blocks(lzw_encode(idx, mcs))
    out += b"\x3b"
    return bytes(out)


def parse_gif_animation(data: bytes):
    """Animation census + full per-frame decode: returns (width, height,
    n_frames, total_delay_cs, loop_extension_present, frames) with
    frames a list of logical-order index lists (all frames LZW-decoded —
    a census that cannot decode its frames proves nothing). Frame
    DISPOSAL/compositing is out of scope (census, not playback);
    GIF87a and local color tables raise as in parse_gif."""
    if data[:6] == b"GIF87a":
        raise NotImplementedError("GIF87a")
    if data[:6] != _GIF_SIG:
        raise ValueError("not a GIF file")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    total_delay = 0
    loop_ext = False
    frames: list[list[int]] = []
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control: extract the delay
                blen = data[pos]
                total_delay += int.from_bytes(
                    data[pos + 2 : pos + 4], "little"
                )
                pos += 1 + blen
            elif label == 0xFF and data[pos + 1 : pos + 12] == b"NETSCAPE2.0":
                loop_ext = True
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x80:
            raise NotImplementedError("local color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        stored = lzw_decode(bytes(lzw), mcs, iw * ih)
        if ipacked & 0x40:
            logical = [0] * (iw * ih)
            for si, y in enumerate(_interlace_order(ih)):
                logical[y * iw : (y + 1) * iw] = stored[si * iw : (si + 1) * iw]
            frames.append(logical)
        else:
            frames.append(stored)
        n_frames += 1
    return width, height, n_frames, total_delay, loop_ext, frames
