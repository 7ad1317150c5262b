"""Delta Lake deletion-vector codec — jar-free, from the published spec.

Implements the three public formats PROTOCOL.md ("Deletion Vectors",
"Deletion Vector Format") defines so the log replay in ``delta_log.py``
can read (and write) reader-v3 tables:

1. **Z85 encoding** (the ZeroMQ base85 variant Delta uses) for the UUID
   in ``storageType="u"`` descriptors and for inline (``"i"``) DV data.
2. **RoaringBitmapArray "portable" serialization**: an 8-byte LE bitmap
   count followed by that many standard 32-bit RoaringBitmaps (RoaringFormatSpec
   portable layout), where 64-bit row index = (bitmap ordinal << 32) | low32.
   The decoder handles all three container kinds — array, bitmap, run —
   and both cookies (12346 no-run / 12347 with run-flag bitset); the
   encoder emits the no-run layout with array/bitmap containers (always
   valid — runs are an optional compression).
3. **DV file layout** for ``storageType`` "u"/"p": a 1-byte format
   version (1), then per stored DV at ``offset``: 4-byte BE length,
   the serialized DV bytes (4-byte LE magic 1681511377 + bitmap array),
   and a 4-byte BE CRC-32 of those bytes. ``storageType="i"`` carries
   z85(serialized DV) directly in ``pathOrInlineDv``.

Reference capability: src/etl/spark/delta_lake_manager.py:260-310 reads
DV-bearing tables through delta-spark jars; this module is the jar-free
equivalent. Everything here derives from delta.io PROTOCOL.md and the
RoaringFormatSpec — both public.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

DV_MAGIC = 1681511377  # LE magic prefixing every serialized DV
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096  # cardinality above this -> bitmap container


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out: list[str] = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit RoaringBitmap (RoaringFormatSpec portable layout)
# --------------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """Portable no-run serialization of sorted unique 32-bit values."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    buf = bytearray(struct.pack("<ii", _COOKIE_NO_RUN, n))
    for k in keys:
        buf += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (byte offsets from the start of this bitmap)
    off = 8 + 4 * n + 4 * n
    for k in keys:
        buf += struct.pack("<I", off)
        card = len(containers[k])
        off += 8192 if card > _ARRAY_MAX else 2 * card
    for k in keys:
        vals = containers[k]
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            buf += struct.pack("<1024Q", *words)
        else:
            buf += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(buf)


def _deserialize_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit bitmap at ``pos``; return (values, next_pos)."""
    start = pos
    (cookie,) = struct.unpack_from("<i", data, pos)
    if cookie & 0xFFFF == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = data[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= 4  # NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", data, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie} at byte {start}")
    header = struct.unpack_from(f"<{2 * n}H", data, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets are redundant
    out: list[int] = []
    for i in range(n):
        key, card_m1 = header[2 * i], header[2 * i + 1]
        card = card_m1 + 1
        base = key << 16
        if run_flags[i >> 3] & (1 << (i & 7)):
            (nruns,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(nruns):
                lo, ln = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.extend(base | v for v in range(lo, lo + ln + 1))
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base | (wi << 6) | b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            out.extend(base | v for v in vals)
    return out, pos


def roaring_array_serialize(indexes) -> bytes:
    """RoaringBitmapArray portable bytes (magic NOT included) for a set of
    64-bit row indexes."""
    groups: dict[int, list[int]] = {}
    for v in indexes:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    nb = max(groups) + 1 if groups else 0
    buf = bytearray(struct.pack("<q", nb))
    for i in range(nb):  # every ordinal 0..nb-1 present, empty ones too
        buf += _serialize_roaring32(sorted(set(groups.get(i, []))))
    return bytes(buf)


def roaring_array_deserialize(data: bytes) -> list[int]:
    (nb,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    for i in range(nb):
        vals, pos = _deserialize_roaring32(data, pos)
        out.extend((i << 32) | v for v in vals)
    return out


# --------------------------------------------------------------------------
# Serialized DV (magic + bitmap array) and the .bin file layout
# --------------------------------------------------------------------------


def serialize_dv(indexes) -> bytes:
    return struct.pack("<I", DV_MAGIC) + roaring_array_serialize(indexes)


def deserialize_dv(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    return roaring_array_deserialize(data[4:])


def write_dv_file(
    table_root: str, dvs: list[list[int]], prefix: str = "ab"
) -> list[dict]:
    """Write one ``deletion_vector_<uuid>.bin`` holding every DV in
    ``dvs`` back to back, and return the matching ``deletionVector``
    descriptors (storageType "u"). A single file with several DVs at
    different offsets is the layout Delta itself produces for a multi-file
    DELETE."""
    uid = _uuid.uuid4()
    rel_dir = prefix if prefix else ""
    os.makedirs(os.path.join(table_root, rel_dir) or table_root, exist_ok=True)
    fname = f"deletion_vector_{uid}.bin"
    fpath = os.path.join(table_root, rel_dir, fname)
    descriptors: list[dict] = []
    buf = bytearray(b"\x01")  # format version
    for indexes in dvs:
        data = serialize_dv(indexes)
        offset = len(buf)
        buf += struct.pack(">i", len(data))
        buf += data
        buf += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descriptors.append(
            {
                "storageType": "u",
                "pathOrInlineDv": prefix + z85_encode(uid.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": len(set(indexes)),
            }
        )
    with open(fpath, "wb") as fh:
        fh.write(buf)
    return descriptors


def inline_dv_descriptor(indexes) -> dict:
    data = serialize_dv(indexes)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(
            data + b"\x00" * (-len(data) % 4)  # z85 needs 4-byte alignment
        ),
        "sizeInBytes": len(data),
        "cardinality": len(set(indexes)),
    }


def read_dv_indexes(table_root: str, descriptor: dict) -> list[int]:
    """Deleted row indexes for one ``deletionVector`` descriptor."""
    st = descriptor["storageType"]
    size = descriptor["sizeInBytes"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
        return deserialize_dv(data)
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, uid_b85 = enc[:-20], enc[-20:]
        uid = _uuid.UUID(bytes=z85_decode(uid_b85))
        fpath = os.path.join(table_root, prefix, f"deletion_vector_{uid}.bin")
    elif st == "p":
        fpath = descriptor["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletion-vector storageType {st!r}")
    with open(fpath, "rb") as fh:
        fh.seek(descriptor["offset"])
        (length,) = struct.unpack(">i", fh.read(4))
        if length != size:
            raise ValueError(
                f"DV length prefix {length} != descriptor sizeInBytes {size}"
            )
        data = fh.read(length)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {fpath}")
    return deserialize_dv(data)
