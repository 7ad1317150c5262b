"""Pure-Python ZSTANDARD decoder (RFC 8878) — frames, FSE, Huffman,
sequences, repeat offsets. Decompression only, stdlib only.

Zstd is the one codec gate this repo kept hitting: ORC footers
(orc_meta.py), modern Avro lakes, and parquet files all ship zstd, and
the container walks stayed honestly gated on it. This module closes the
READ side with a clean-room implementation of the public RFC:

- frame parsing: magic, frame-header descriptor (single-segment flag,
  FCS/dictionary-id field sizes, content-checksum flag), skippable
  frames, raw/RLE/compressed blocks;
- literals: raw/RLE/compressed/treeless, 1- and 4-stream Huffman with
  the jump table, Huffman table from direct 4-bit weights OR
  FSE-compressed weights (two interleaved states, last weight deduced
  from the power-of-two completion rule);
- FSE: normalized-count header parse (variable-width probability reads,
  zero-repeat runs, "less than 1" -1 probabilities at the table top),
  canonical spread (step = 5/8 size + 3) and state table construction;
- sequences: predefined / RLE / FSE-compressed / repeat table modes for
  the LL/OF/ML alphabets (predefined distributions from the RFC),
  BACKWARD bitstream with sentinel bit, per-sequence decode order
  (offset bits, match bits, literal bits) and state-update order
  (LL, ML, OF), the three-slot repeat-offset history including the
  literals_length==0 shift and the rep1-1 special case;
- execution: literal copy + overlapping match copy, content checksum
  skipped (xxhash not verified — stated).

Dictionaries raise NotImplementedError (stated; corpus files rarely use
them). Verified against frames produced by INDEPENDENT compressors
(Spark's native ORC zstd writer) — see tests/test_zstd_lite.py and the
orc_footer_stats zstd leg.
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50

# RFC 8878 predefined FSE distributions
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

# literal-length codes 16..35: (baseline, extra bits)
_LL_EXTRA = [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
# match-length codes 32..52: (baseline, extra bits)
_ML_EXTRA = [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]


def _ll_value(code: int, bits_reader) -> int:
    if code < 16:
        return code
    base, nb = _LL_EXTRA[code - 16]
    return base + bits_reader(nb)


def _ml_value(code: int, bits_reader) -> int:
    if code < 32:
        return code + 3
    base, nb = _ML_EXTRA[code - 32]
    return base + bits_reader(nb)


class _BackBits:
    """Backward bitstream: written LSB-first, read from the top after
    stripping the padding up to the sentinel 1-bit."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupt backward bitstream (no sentinel)")
        self.val = int.from_bytes(data, "little")
        self.pos = len(data) * 8 - 8 + data[-1].bit_length() - 1

    def read(self, n: int, init: bool = False) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        if not init:
            # every non-init read (extra bits, state updates) must have
            # its bits present — zero-padding here decodes corrupt or
            # truncated frames to silently wrong bytes (ADVICE r9 fix)
            raise ValueError("zstd: backward bitstream underflow")
        # FSE state-init tail: zero-pad, the one legal short read
        v = (self.val << -self.pos) & ((1 << n) - 1) if self.pos > -n else 0
        return v


def _build_fse_table(probs: list[int], accuracy_log: int):
    """[(symbol, nb_bits, baseline)] of size 1 << accuracy_log."""
    size = 1 << accuracy_log
    table: list = [None] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            table[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE spread did not complete a cycle")
    nxt = [p if p > 0 else 1 for p in probs]
    out = []
    for i in range(size):
        s = table[i]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        baseline = (x << nb) - size
        out.append((s, nb, baseline))
    return out


def _read_fse_header(
    data: bytes, pos: int, max_symbols: int, max_accuracy: int = 9
):
    """Normalized-count header per RFC 8878 4.1.1: little-endian forward
    bitstream; each value is read with a variable width (the low range
    reuses one fewer bit), value - 1 = probability; probability 0 is
    followed by 2-bit runs of extra zero counts. ``max_accuracy`` is the
    RFC's PER-TABLE cap: LL/ML 9, OF 8, Huffman weights 6."""
    bitpos = pos * 8

    def peek(n: int) -> int:
        v = 0
        for i in range(n):
            idx = (bitpos + i) >> 3
            byte = data[idx] if idx < len(data) else 0
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        return v

    def skip(n: int) -> None:
        nonlocal bitpos
        bitpos += n

    accuracy_log = peek(4) + 5
    skip(4)
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"zstd: accuracy log {accuracy_log} > table max {max_accuracy}"
        )
    remaining = (1 << accuracy_log) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbols:
            raise ValueError("zstd: FSE header overruns symbol alphabet")
        nbits = remaining.bit_length()  # max value fits in this many bits
        max_plus = remaining + 1  # number of distinct values (-1..remaining)
        lo_count = (1 << nbits) - max_plus  # values that fit in nbits-1
        v = peek(nbits - 1)
        if v < lo_count:
            skip(nbits - 1)
        else:
            v = peek(nbits)
            if v >= (1 << (nbits - 1)):
                v -= lo_count
            skip(nbits)
        prob = v - 1
        probs.append(prob)
        remaining -= prob if prob > 0 else (1 if prob == -1 else 0)
        if prob == 0:
            while True:
                rep = peek(2)
                skip(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    return probs, accuracy_log, (bitpos + 7) >> 3


def _huffman_from_weights(weights: list[int]):
    """(table, max_bits): table is 2^max_bits entries of (symbol, nbits);
    the LAST weight is implied and appended by the caller's completion
    rule before calling here."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if total != (1 << max_bits):
        raise ValueError("zstd: Huffman weights do not sum to a power of 2")
    entries = sorted(
        ((w, s) for s, w in enumerate(weights) if w > 0),
        key=lambda t: (t[0], t[1]),
    )
    table: list = []
    for w, s in entries:
        nbits = max_bits + 1 - w
        table.extend([(s, nbits)] * (1 << (max_bits - nbits)))
    if len(table) != (1 << max_bits):
        raise ValueError("zstd: Huffman table fill mismatch")
    return table, max_bits


def _complete_weights(weights: list[int]) -> list[int]:
    """Append the implied final weight (power-of-two completion)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weights")
    nxt = 1 << total.bit_length()
    rest = nxt - total
    if rest & (rest - 1):
        raise ValueError("zstd: invalid Huffman weight completion")
    return weights + [rest.bit_length()]


def _parse_huffman(data: bytes, pos: int):
    """Huffman tree description -> (table, max_bits, next_pos)."""
    hbyte = data[pos]
    pos += 1
    if hbyte >= 128:  # direct 4-bit weights
        n = hbyte - 127
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        pos += (n + 1) >> 1
    else:  # FSE-compressed weights, two interleaved states
        comp = data[pos : pos + hbyte]
        probs, al, hdr_end = _read_fse_header(comp, 0, 256, max_accuracy=6)
        fse = _build_fse_table(probs, al)
        bb = _BackBits(comp[hdr_end:])
        s1 = bb.read(al, init=True)
        s2 = bb.read(al, init=True)
        weights = []
        while True:
            sym, nb, base = fse[s1]
            weights.append(sym)
            if bb.pos < nb:
                weights.append(fse[s2][0])
                break
            s1 = base + bb.read(nb)
            sym, nb, base = fse[s2]
            weights.append(sym)
            if bb.pos < nb:
                weights.append(fse[s1][0])
                break
            s2 = base + bb.read(nb)
        pos += hbyte
    table, max_bits = _huffman_from_weights(_complete_weights(weights))
    return table, max_bits, pos


def _huff_decode_stream(data: bytes, table, max_bits: int, n_out: int):
    bb = _BackBits(data)
    out = bytearray()
    mask = (1 << max_bits) - 1
    while len(out) < n_out:
        if bb.pos >= max_bits:
            idx = (bb.val >> (bb.pos - max_bits)) & mask
        else:
            idx = (bb.val << (max_bits - bb.pos)) & mask if bb.pos > 0 else 0
        sym, nbits = table[idx]
        if nbits > bb.pos and len(out) < n_out - 1:
            raise ValueError("zstd: Huffman stream exhausted early")
        bb.pos -= nbits
        out.append(sym)
    return bytes(out)


def _decode_literals(block: bytes, pos: int, huff_state: dict):
    b0 = block[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            pos += 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            rs = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            return block[pos : pos + rs], pos + rs
        return bytes([block[pos]]) * rs, pos + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        streams = 1
        rs = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        cs = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif sf == 1:
        streams = 4
        rs = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        cs = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif sf == 2:
        streams = 4
        rs = (
            (b0 >> 4)
            | (block[pos + 1] << 4)
            | ((block[pos + 2] & 0x03) << 12)
        )
        cs = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
        pos += 4
    else:
        streams = 4
        rs = (
            (b0 >> 4)
            | (block[pos + 1] << 4)
            | ((block[pos + 2] & 0x3F) << 12)
        )
        cs = (
            (block[pos + 2] >> 6)
            | (block[pos + 3] << 2)
            | (block[pos + 4] << 10)
        )
        pos += 5
    body = block[pos : pos + cs]
    end = pos + cs
    bpos = 0
    if ltype == 2:
        table, max_bits, bpos = _parse_huffman(body, 0)
        huff_state["table"] = table
        huff_state["max_bits"] = max_bits
    else:
        if "table" not in huff_state:
            raise ValueError("zstd: treeless literals with no prior table")
        table, max_bits = huff_state["table"], huff_state["max_bits"]
    if streams == 1:
        return _huff_decode_stream(body[bpos:], table, max_bits, rs), end
    s1, s2, s3 = struct.unpack_from("<HHH", body, bpos)
    bpos += 6
    per = (rs + 3) >> 2
    sizes_out = [per, per, per, rs - 3 * per]
    out = bytearray()
    for i, clen in enumerate((s1, s2, s3, len(body) - bpos - s1 - s2 - s3)):
        out += _huff_decode_stream(
            body[bpos : bpos + clen], table, max_bits, sizes_out[i]
        )
        bpos += clen
    return bytes(out), end


def _seq_table(mode: int, block: bytes, pos: int, default, max_symbols: int,
               prev, max_accuracy: int = 9):
    """Resolve one of LL/OF/ML per its compression mode. Returns
    (fse_table_or_rle_symbol, accuracy_log_or_None, next_pos, state)."""
    if mode == 0:  # predefined
        probs, al = default
        return _build_fse_table(probs, al), al, pos, ("fse",)
    if mode == 1:  # RLE: one byte symbol, zero-bit table
        return block[pos], 0, pos + 1, ("rle",)
    if mode == 2:  # FSE-compressed
        probs, al, nxt = _read_fse_header(
            block, pos, max_symbols, max_accuracy
        )
        return _build_fse_table(probs, al), al, nxt, ("fse",)
    if prev is None:
        raise ValueError("zstd: repeat table mode with no previous table")
    return prev[0], prev[1], pos, prev[2]


def decompress(data: bytes) -> bytes:
    """Decode all zstd frames in ``data`` and concatenate their content
    (skippable frames skipped), per RFC 8878."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            size = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad frame magic 0x{magic:08x}")
        fhd = data[pos]
        pos += 1
        single_segment = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_size = (0, 1, 2, 4)[fhd & 3]
        fcs_size = (0, 2, 4, 8)[fhd >> 6]
        if fhd >> 6 == 0 and single_segment:
            fcs_size = 1
        if not single_segment:
            pos += 1  # window descriptor (bound checks not enforced here)
        if did_size:
            raise NotImplementedError("zstd: dictionaries not supported")
        if fcs_size:
            pos += fcs_size
        reps = [1, 4, 8]
        huff_state: dict = {}
        prev_tables: dict = {"ll": None, "of": None, "ml": None}
        frame_start = len(out)  # match offsets may not cross frames
        while True:
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            if btype == 0:
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                block = data[pos : pos + bsize]
                pos += bsize
                _decode_block(
                    block, out, reps, huff_state, prev_tables, frame_start
                )
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if checksum:
            pos += 4  # xxhash64 low bits — not verified (stated)
    return bytes(out)


def _decode_block(block: bytes, out: bytearray, reps: list[int],
                  huff_state: dict, prev_tables: dict,
                  frame_start: int = 0) -> None:
    literals, pos = _decode_literals(block, 0, huff_state)
    b0 = block[pos]
    if b0 == 0:
        out += literals
        return
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    modes = block[pos]
    pos += 1
    ll_t, ll_al, pos, ll_kind = _seq_table(
        (modes >> 6) & 3, block, pos, _LL_DEFAULT, 36, prev_tables["ll"],
        max_accuracy=9,
    )
    of_t, of_al, pos, of_kind = _seq_table(
        (modes >> 4) & 3, block, pos, _OF_DEFAULT, 32, prev_tables["of"],
        max_accuracy=8,
    )
    ml_t, ml_al, pos, ml_kind = _seq_table(
        (modes >> 2) & 3, block, pos, _ML_DEFAULT, 53, prev_tables["ml"],
        max_accuracy=9,
    )
    prev_tables["ll"] = (ll_t, ll_al, ll_kind)
    prev_tables["of"] = (of_t, of_al, of_kind)
    prev_tables["ml"] = (ml_t, ml_al, ml_kind)
    bb = _BackBits(block[pos:])
    ll_state = bb.read(ll_al, init=True) if ll_kind[0] == "fse" else 0
    of_state = bb.read(of_al, init=True) if of_kind[0] == "fse" else 0
    ml_state = bb.read(ml_al, init=True) if ml_kind[0] == "fse" else 0

    def sym(kind, table, state):
        return table if kind[0] == "rle" else table[state][0]

    lit_pos = 0
    for i in range(n_seq):
        of_code = sym(of_kind, of_t, of_state)
        of_value = (1 << of_code) + bb.read(of_code)
        ml = _ml_value(sym(ml_kind, ml_t, ml_state), bb.read)
        ll = _ll_value(sym(ll_kind, ll_t, ll_state), bb.read)
        if i + 1 < n_seq:  # update states (order LL, ML, OF)
            if ll_kind[0] == "fse":
                _, nb, base = ll_t[ll_state]
                ll_state = base + bb.read(nb)
            if ml_kind[0] == "fse":
                _, nb, base = ml_t[ml_state]
                ml_state = base + bb.read(nb)
            if of_kind[0] == "fse":
                _, nb, base = of_t[of_state]
                of_state = base + bb.read(nb)
        # offset resolution with the repeat history
        if of_value > 3:
            offset = of_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and of_value == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        start = len(out) - offset
        if start < frame_start:
            # bound against the CURRENT frame's start, not the whole
            # output buffer — a match may never reach into a prior
            # frame's bytes (ADVICE r9 fix)
            raise ValueError("zstd: match before frame start")
        for k in range(ml):
            out.append(out[start + k])
    out += literals[lit_pos:]
