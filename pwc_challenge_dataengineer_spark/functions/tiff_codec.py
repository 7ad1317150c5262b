"""Pure-stdlib baseline TIFF 6.0 codec — encoder and independent decoder.

The scanned-document leg of the media-format story: TIFF is what OCR /
document-AI corpora arrive in, and BASELINE TIFF (IFD tag walk, strip
layout, PackBits compression) needs no codec library. Writer and parser
are independent implementations of the public TIFF 6.0 specification:

- ``make_tiff`` writes an 8-bit RGB image in TWO strips, PackBits-
  compressed, alternating little-endian (II) and big-endian (MM) headers
  by seed parity — so the decoder's endian handling is on the hot path,
  not just the II default;
- ``parse_tiff`` validates the magic 42, walks the IFD (12-byte entries,
  inline-vs-offset values by type size), requires the baseline RGB tag
  set, decompresses PackBits per strip (literal runs, replicate runs,
  -128 no-op), and returns top-down row-major RGB pixels.

LZW strips (compression tag 5, MSB-first EarlyChange variant — r13)
decode through the independent tiff_lzw_decode below; tiled, multi-IFD
and 16-bit TIFFs raise NotImplementedError — stated, not silently
mangled.
"""

from __future__ import annotations

import struct

_TIFF_W, _TIFF_H = 6, 8


def tiff_pixel(seed: int, p: int) -> tuple[int, int, int]:
    """Pixel closed form shared with the DuckDB oracle (same family as
    make_bmp/make_png so oracles stay comparable)."""
    return (
        (seed + 5 * p + 1) % 256,
        (seed + 5 * p + 3) % 256,
        (seed + 5 * p + 4) % 256,
    )


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits: replicate runs for >=2 equal bytes, literal runs
    otherwise (greedy, spec Appendix 9)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits: input exhausted")
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # replicate next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError("PackBits: output overrun")
    return bytes(out)


# ------------------------------------------------------------- TIFF LZW
# TIFF 6.0 §13 LZW with the EarlyChange behavior every real writer uses
# (the spec's own famous off-by-one, standardized by libtiff): codes are
# MSB-first, ClearCode=256, EOI=257, first table entry 258, width starts
# at 9 and bumps when NextCode reaches 2^width - 1 (one EARLY relative
# to the naive rule); the table is cleared before NextCode would exceed
# 4093. Unlike GIF's LZW (functions/gif_codec.py — LSB-first packing,
# palette-sized roots, sub-block framing), roots here are the 256 byte
# values and the stream is one unframed strip.


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW over raw strip bytes (MSB-first, EarlyChange)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w_seq = b""
    for b in data:
        wc = w_seq + bytes([b])
        if wc in table:
            w_seq = wc
            continue
        emit(table[w_seq], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:
            # table full under EarlyChange: clear and restart
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w_seq = bytes([b])
    if w_seq:
        emit(table[w_seq], width)
        # mirror the decoder: it ADDS an entry while processing this
        # final data code, which can bump its read width for EOI — the
        # encoder must simulate that add so EOI is emitted at the width
        # the decoder will read it with
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """Independent TIFF LZW decoder: MSB-first reads, KwKwK case,
    EarlyChange width bumps mirrored, clear handling."""
    CLEAR, EOI = 256, 257
    pos = 0  # bit position

    def read(w: int) -> int:
        nonlocal pos
        end = pos + w
        if end > len(data) * 8:
            raise ValueError("TIFF LZW: bitstream exhausted")
        acc = 0
        p = pos
        while p < end:
            byte = data[p // 8]
            take = min(8 - p % 8, end - p)
            shift = 8 - p % 8 - take
            acc = (acc << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
        pos = end
        return acc

    roots = [bytes([i]) for i in range(256)]
    table: list[bytes] = []
    width = 9
    next_code = 258
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table, width, next_code, prev = [], 9, 258, None
            continue
        if prev is None:
            if code > 255:
                raise ValueError(
                    "TIFF LZW: first code after clear not a root"
                )
            entry = roots[code]
        else:
            if code < 256:
                entry = roots[code]
            elif code - 258 < len(table):
                entry = table[code - 258]
            elif code == next_code:  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError(f"TIFF LZW: code {code} beyond table")
            table.append(prev + entry[:1])
            next_code += 1
            # EarlyChange DECODER rule (PDF LZWDecode EarlyChange=1 /
            # libtiff): bump at 2^w - 2 — one add-count earlier than
            # the encoder's 2^w - 1, because the decoder's table count
            # lags the encoder by exactly one entry
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) > expected:
            raise ValueError("TIFF LZW: decoded more bytes than expected")
    if len(out) != expected:
        raise ValueError("TIFF LZW: decoded fewer bytes than expected")
    return bytes(out)


def make_tiff(
    seed: int,
    width: int = _TIFF_W,
    height: int = _TIFF_H,
    compression: str = "packbits",
) -> bytes:
    """Two compressed strips of 4 rows each; header endianness II/MM by
    seed parity; IFD placed after the strip data. ``compression``:
    "packbits" (default, tag 32773) or "lzw" (tag 5, TIFF-variant LZW
    with EarlyChange)."""
    endian = "<" if seed % 2 == 0 else ">"
    if compression == "packbits":
        comp_tag, comp_fn = 32773, packbits_encode
    elif compression == "lzw":
        comp_tag, comp_fn = 5, tiff_lzw_encode
    else:
        raise ValueError(f"unsupported compression {compression!r}")
    rows_per_strip = 4
    strips = []
    for s in range(2):
        raw = bytearray()
        for y in range(s * rows_per_strip, (s + 1) * rows_per_strip):
            for x in range(width):
                raw += bytes(tiff_pixel(seed, y * width + x))
        strips.append(comp_fn(bytes(raw)))

    header_len = 8
    strip_offsets = []
    pos = header_len
    for sdata in strips:
        strip_offsets.append(pos)
        pos += len(sdata)
    if pos % 2:
        pos += 1  # word-align the IFD
    ifd_offset = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # inline SHORT values are LEFT-justified in the 4-byte field
        if typ == 3 and count == 1:
            return struct.pack(endian + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(endian + "HHII", tag, typ, count, value)

    # BitsPerSample (258) needs 3 SHORTs -> stored after the IFD
    n_entries = 11
    after_ifd = ifd_offset + 2 + n_entries * 12 + 4
    bits_off = after_ifd
    offsets_off = bits_off + 6
    counts_off = offsets_off + 8

    entries = [
        entry(256, 3, 1, width),  # ImageWidth
        entry(257, 3, 1, height),  # ImageLength
        entry(258, 3, 3, bits_off),  # BitsPerSample -> offset
        entry(259, 3, 1, comp_tag),  # Compression: PackBits or LZW
        entry(262, 3, 1, 2),  # Photometric: RGB
        entry(273, 4, 2, offsets_off),  # StripOffsets (LONGs)
        entry(277, 3, 1, 3),  # SamplesPerPixel
        entry(278, 3, 1, rows_per_strip),  # RowsPerStrip
        entry(279, 4, 2, counts_off),  # StripByteCounts
        entry(284, 3, 1, 1),  # PlanarConfig: chunky
        entry(296, 3, 1, 2),  # ResolutionUnit (baseline filler)
    ]
    out = bytearray()
    out += (b"II" if endian == "<" else b"MM") + struct.pack(
        endian + "HI", 42, ifd_offset
    )
    for sdata in strips:
        out += sdata
    if len(out) % 2:
        out += b"\x00"
    out += struct.pack(endian + "H", n_entries)
    for e in sorted(entries, key=lambda e: struct.unpack(endian + "H", e[:2])[0]):
        out += e
    out += struct.pack(endian + "I", 0)  # next IFD: none
    out += struct.pack(endian + "HHH", 8, 8, 8)
    for off in strip_offsets:
        out += struct.pack(endian + "I", off)
    for sdata in strips:
        out += struct.pack(endian + "I", len(sdata))
    return bytes(out)


def parse_tiff(data: bytes):
    """Baseline RGB TIFF decode: endian detect, IFD walk, PackBits
    strips. Returns (width, height, pixels) top-down row-major RGB."""
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_offset = struct.unpack_from(endian + "HI", data, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF")
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    n = struct.unpack_from(endian + "H", data, ifd_offset)[0]
    # (type, count, offset-field-as-LONG, raw field position): inline
    # values (size*count <= 4) are re-read from the raw field bytes with
    # the proper per-type format, so e.g. TWO inline SHORTs (typ=3,
    # count=2 — legal for StripOffsets on a 2-strip file) decode as two
    # values instead of one mangled 32-bit int, on both endians.
    tags: dict[int, tuple[int, int, int, int]] = {}
    for i in range(n):
        field_pos = ifd_offset + 2 + 12 * i
        tag, typ, count, value = struct.unpack_from(
            endian + "HHII", data, field_pos
        )
        tags[tag] = (typ, count, value, field_pos + 8)
    nxt = struct.unpack_from(
        endian + "I", data, ifd_offset + 2 + 12 * n
    )[0]
    if nxt:
        raise NotImplementedError("multi-IFD (multi-page) TIFF")

    def values(tag: int) -> list[int]:
        typ, count, value, field_off = tags[tag]
        size = {3: 2, 4: 4}[typ]
        fmt = "H" if typ == 3 else "I"
        if size * count <= 4:  # inline: decode the raw field bytes
            return list(
                struct.unpack_from(endian + fmt * count, data, field_off)
            )
        return [
            struct.unpack_from(endian + fmt, data, value + size * i)[0]
            for i in range(count)
        ]

    width = values(256)[0]
    height = values(257)[0]
    comp = values(259)[0]
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    if values(258) != [8, 8, 8] and values(258) != [8]:
        raise NotImplementedError("non-8-bit TIFF")
    if values(277)[0] != 3:
        raise NotImplementedError("non-RGB sample count")
    rows_per_strip = values(278)[0]
    offsets = values(273)
    counts = values(279)
    raw = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, height - s * rows_per_strip)
        expected = rows * width * 3
        chunk = data[off : off + cnt]
        if comp == 32773:
            raw += packbits_decode(chunk, expected)
        elif comp == 5:
            raw += tiff_lzw_decode(chunk, expected)
        else:
            raw += chunk
    pixels = [
        (raw[3 * p], raw[3 * p + 1], raw[3 * p + 2])
        for p in range(width * height)
    ]
    return width, height, pixels
