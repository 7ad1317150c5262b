"""Multimodal column plumbing (image/audio/video as opaque binary).

North-star operator set (BASELINE.json): at 100 TB, media arrives as binary
columns + typed metadata structs. The Spark-side plumbing here is real —
BinaryType columns, Arrow-batched ``mapInPandas`` with an explicit output
schema, partition-sized batches — while the actual codec work is STUBBED
(this container has no image/audio libraries): ``decode_image_stub`` derives
deterministic fake features from the bytes so pipelines are testable
end-to-end.

Swap ``_fake_decode`` for PIL/torchvision/ffmpeg calls in a real deployment;
the operator contract (schema in/out, batching) does not change.

UPDATE: for codec-free containers the decode is now REAL — see the
"REAL container codecs" section below (uncompressed 24-bit BMP pixels,
RIFF PCM WAV samples, both pure stdlib and oracle-verified end-to-end by
the multimodal_real_decode catalog query).

UPDATE 2 (r8): PNG is no longer gated either — its compression is DEFLATE,
which the stdlib zlib provides, so make_png/parse_png implement the full
spec path (chunk walk + CRC validation, inflate, all five row unfilters
including Paeth) with zero dependencies; oracle-verified end-to-end by the
png_real_decode catalog query; baseline JPEG followed in r9
(functions/jpeg_codec.py, jpeg_real_decode). Remaining honest gates: MP3/H.264
(DCT/psychoacoustic codecs genuinely need codec libraries).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("fake_mean_intensity", T.DoubleType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic fake binary payload from a text column (the
    test corpus has no real media; md5-unhex gives stable 16-byte blobs)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.unhex(F.md5(F.col(text_col))).alias("content"),
        F.struct(
            F.lit("image/fake").alias("mime"), F.lit("synthetic").alias("source")
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decode.

    REAL IMPLEMENTATION REQUIRES: PIL/opencv →
    ``raise NotImplementedError`` if you need true pixels. The fake keeps
    the pipeline runnable: width/height/mean derived from the bytes.
    """
    w = 64 + content[0] % 192
    h = 64 + content[1] % 192
    mean = sum(content) / len(content) / 255.0
    return w, h, round(mean, 6)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas`` processes partition-sized pandas batches — the right
    shape for codec work (amortizes per-batch model/codec setup, keeps
    memory bounded by batch size, parallelism = partitions).
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = pdf["content"].map(
                lambda b: _fake_decode(bytes(b)) if b is not None else (None, None, None)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "header_hex": pdf["content"].map(
                        lambda b: bytes(b)[:4].hex() if b is not None else None
                    ),
                    "fake_width": feats.map(lambda t: t[0]),
                    "fake_height": feats.map(lambda t: t[1]),
                    "fake_mean_intensity": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("content_resized", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize operator: same mapInPandas batch shape a PIL/opencv resize
    would use. STUB kernel: the "resized" payload is the byte stream cycled
    to width*height/64 bytes (deterministic, size-correct); swap the inner
    lambda for a real interpolating resize."""
    import pandas as pd

    n_out = max(1, width * height // 64)

    def batches(it):
        for pdf in it:
            content = pdf["content"].map(
                lambda b: bytes((bytes(b) * (n_out // len(b) + 1))[:n_out])
                if b is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "content_resized": content,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling operator (video → rows of frames): the one-to-many
    batch shape (each input row yields a variable number of output rows)
    ffmpeg frame extraction needs. STUB: frame count = content[2] % 4 + 1,
    frame payload stands in as md5(hex(content) + ':' + idx)."""
    import hashlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                if b is None:
                    continue
                bb = bytes(b)
                for i in range(bb[2] % 4 + 1):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(
                        hashlib.md5(f"{bb.hex()}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAMES_SCHEMA)


# --- REAL container codecs (pure stdlib; no image/audio libraries) -------
#
# The fake-decode path above stays for the generic "swap in PIL/ffmpeg"
# contract, but two real formats need no codec at all: uncompressed 24-bit
# BMP (raw BGR pixels, bottom-up rows, 4-byte row padding) and PCM WAV
# (RIFF chunks + little-endian int16 samples). These upgrade the honest
# NotImplementedError gate: true-pixel / true-sample decode IS implemented
# for uncompressed containers; only compressed codecs (MP3/H.264 — PNG and
# baseline JPEG are now truly decoded, see below and jpeg_codec.py)
# remain environment-gated.

REAL_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("bmp", T.BinaryType(), True),
        T.StructField("wav", T.BinaryType(), True),
    ]
)

REAL_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("px0_r", T.IntegerType(), True),
        T.StructField("px0_g", T.IntegerType(), True),
        T.StructField("px0_b", T.IntegerType(), True),
        T.StructField("img_mean_intensity", T.DoubleType(), True),
        T.StructField("img_top_row_mean", T.DoubleType(), True),
        T.StructField("wav_n_samples", T.IntegerType(), True),
        T.StructField("wav_first_sample", T.IntegerType(), True),
        T.StructField("wav_zero_crossings", T.IntegerType(), True),
        T.StructField("wav_rms", T.DoubleType(), True),
    ]
)

_BMP_W, _BMP_H = 6, 4  # width 6 -> 18-byte rows + 2 pad bytes: exercises padding
_WAV_N, _WAV_RATE = 64, 8000


def make_bmp(seed: int, width: int = _BMP_W, height: int = _BMP_H) -> bytes:
    """Spec-conformant uncompressed 24-bit BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes. Pixel (x, y)
    (y = 0 is the TOP row) at p = y*width + x carries
    B/G/R = (seed + 3p [+1/+2]) % 256 — the closed form the DuckDB oracle
    recomputes analytically, so the write->parse round trip is
    hash-verified including row order, padding and channel order."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up per spec
        row = bytearray()
        for x in range(width):
            p = y * width + x
            row += bytes(
                ((seed + 3 * p) % 256, (seed + 3 * p + 1) % 256, (seed + 3 * p + 2) % 256)
            )
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + b"".join(rows)


def parse_bmp(data: bytes):
    """Parse an uncompressed 24-bit BMP into (width, height, pixels) with
    pixels a top-down row-major list of (R, G, B) tuples. Validates magic,
    bit depth and compression; raises NotImplementedError for compressed
    or non-24-bit files (the honest codec gate)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP decoded here (bpp={bpp}, "
            f"compression={compression}); compressed formats need a codec"
        )
    bottom_up = height > 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    pixels = []
    for y in range(height):  # emit top-down
        src_y = (height - 1 - y) if bottom_up else y
        base = offset + src_y * stride
        row = data[base : base + row_raw]
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            pixels.append((r, g, b))
    return width, height, pixels


def make_wav(seed: int, n: int = _WAV_N, rate: int = _WAV_RATE) -> bytes:
    """PCM WAV via the stdlib ``wave`` writer (an implementation
    independent of parse_wav's hand-rolled RIFF walk): mono int16 samples
    s_i = ((seed*7 + 13*i) % 2003) - 1001."""
    import io
    import struct
    import wave

    samples = [((seed * 7 + 13 * i) % 2003) - 1001 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def parse_wav(data: bytes):
    """Hand-rolled RIFF/WAVE parser (chunk walk, no ``wave`` module — the
    writer and parser are independent implementations, so the pytest
    round trip actually tests the format). Returns (rate, samples) for
    16-bit mono PCM; raises NotImplementedError on compressed audio."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, channels, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1:
                raise NotImplementedError(
                    f"only PCM (fmt=1) decoded here, got fmt={fmt}"
                )
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise NotImplementedError("only 16-bit mono PCM decoded here")
            samples = list(
                struct.unpack_from(f"<{len(body) // 2}h", body, 0)
            )
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synthesize_real_media(df: DataFrame, id_col: str) -> DataFrame:
    """Build REAL container payloads (BMP + WAV) per row, deterministically
    seeded by the id — Arrow-batched mapInPandas, the same batch shape a
    production media-materialization stage uses."""
    import pandas as pd

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        for pdf in it:
            seeds = (pdf["media_id"] % 251).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "bmp": [make_bmp(int(s)) for s in seeds],
                    "wav": [make_wav(int(s)) for s in seeds],
                }
            )

    return src.mapInPandas(batches, REAL_MEDIA_SCHEMA)


def extract_real_media_features(media: DataFrame) -> DataFrame:
    """TRUE-pixel / true-sample feature extraction over real binary
    containers: every feature is computed from the PARSED bytes (not the
    generation formula), so the oracle's analytic recomputation verifies
    the full write->parse round trip."""
    import math

    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for mid, bmp, wav in zip(pdf["media_id"], pdf["bmp"], pdf["wav"]):
                w, h, px = parse_bmp(bytes(bmp))
                s_all = sum(r + g + b for r, g, b in px)
                s_top = sum(r + g + b for r, g, b in px[:w])
                rate, samples = parse_wav(bytes(wav))
                n = len(samples)
                zc = sum(
                    1
                    for i in range(1, n)
                    if samples[i] * samples[i - 1] < 0
                )
                rows.append(
                    {
                        "doc_id": mid,
                        "img_width": w,
                        "img_height": h,
                        "px0_r": px[0][0],
                        "px0_g": px[0][1],
                        "px0_b": px[0][2],
                        "img_mean_intensity": round(
                            s_all / (3.0 * w * h) / 255.0, 6
                        ),
                        "img_top_row_mean": round(s_top / (3.0 * w) / 255.0, 6),
                        "wav_n_samples": n,
                        "wav_first_sample": samples[0],
                        "wav_zero_crossings": zc,
                        "wav_rms": round(
                            math.sqrt(sum(s * s for s in samples) / n), 6
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, REAL_FEATURES_SCHEMA)


# ---------------------------------------------------------------- PNG (r8)
# PNG's only compression is DEFLATE, which the stdlib zlib provides — so
# unlike MP3/H.264 there is nothing environment-gated about it (and r9
# showed the same for baseline JPEG — jpeg_codec.py). The
# encoder and decoder below are independent implementations of the spec
# (RFC 2083): the encoder deliberately writes row y with filter type
# y % 5, so a successful decode proves all five unfilters (None/Sub/Up/
# Average/Paeth), the chunk walk, and per-chunk CRC validation — not just
# the trivial filter-0 path.

_PNG_W, _PNG_H = 6, 10  # 10 rows -> each of the 5 filter types twice
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def make_png(seed: int, width: int = _PNG_W, height: int = _PNG_H) -> bytes:
    """Spec-conformant 8-bit truecolor (color type 2) PNG, stdlib-only.
    Pixel p = y*width + x (top-down) carries R/G/B =
    (seed + 3p + 2, seed + 3p + 1, seed + 3p) % 256 — the same closed form
    as make_bmp, so the DuckDB oracle recomputes features analytically.
    Row y is FILTERED with type y % 5 before deflate, exercising every
    unfilter in the decoder."""
    import struct
    import zlib

    bpp = 3
    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            p = y * width + x
            row += bytes(
                (
                    (seed + 3 * p + 2) % 256,
                    (seed + 3 * p + 1) % 256,
                    (seed + 3 * p) % 256,
                )
            )
        raw_rows.append(bytes(row))
    out = bytearray()
    prev = bytes(width * bpp)
    for y, row in enumerate(raw_rows):
        ft = y % 5
        out.append(ft)
        for i, c in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = c
            elif ft == 1:
                f = c - a
            elif ft == 2:
                f = c - b
            elif ft == 3:
                f = c - (a + b) // 2
            else:
                f = c - _paeth(a, b, cc)
            out.append(f % 256)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def parse_png(data: bytes):
    """Full PNG decode for 8-bit truecolor (color types 2 and 6), stdlib
    only: chunk walk with CRC validation, concatenated-IDAT inflate, and
    all five row unfilters. Returns (width, height, pixels) with pixels a
    top-down row-major list of (R, G, B) tuples (alpha dropped for type
    6). Palette / grayscale / 16-bit / interlaced files raise
    NotImplementedError — stated, not silently mangled."""
    import struct
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG decoded here "
            f"(depth={depth}, colorType={ctype_n}, interlace={interlace})"
        )
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    bpp = 4 if ctype_n == 6 else 3
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    pixels = []
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ft = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if ft == 1:
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) % 256
        elif ft == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) % 256
        elif ft == 3:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) % 256
        elif ft != 0:
            raise ValueError(f"invalid PNG filter type {ft}")
        for x in range(width):
            o = x * bpp
            pixels.append((row[o], row[o + 1], row[o + 2]))
        prev = row
    return width, height, pixels


PNG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("px0_r", T.IntegerType(), True),
        T.StructField("px0_g", T.IntegerType(), True),
        T.StructField("px0_b", T.IntegerType(), True),
        T.StructField("img_sum", T.LongType(), True),
        T.StructField("paeth_row_sum", T.LongType(), True),
    ]
)


def synthesize_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """One real (deflate-compressed, mixed-filter) PNG per row — Arrow-
    batched mapInPandas, same shape as synthesize_real_media."""
    import pandas as pd

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        for pdf in it:
            seeds = (pdf["media_id"] % 251).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "png": [make_png(int(s)) for s in seeds],
                }
            )

    return src.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("png", T.BinaryType(), True),
            ]
        ),
    )


def extract_png_features(media: DataFrame) -> DataFrame:
    """TRUE-pixel features from PARSED PNG bytes. ``paeth_row_sum`` is the
    channel sum of row y=4 — the first Paeth-filtered row, so the value is
    only right if the Paeth unfilter is."""

    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for mid, png in zip(pdf["media_id"], pdf["png"]):
                w, h, px = parse_png(bytes(png))
                s_all = sum(r + g + b for r, g, b in px)
                s_p = sum(r + g + b for r, g, b in px[4 * w : 5 * w])
                rows.append(
                    {
                        "doc_id": mid,
                        "img_width": w,
                        "img_height": h,
                        "px0_r": px[0][0],
                        "px0_g": px[0][1],
                        "px0_b": px[0][2],
                        "img_sum": s_all,
                        "paeth_row_sum": s_p,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, PNG_FEATURES_SCHEMA)


# ------------------------------------------------------------------ JPEG
# Baseline sequential JPEG codec lives in functions/jpeg_codec.py (pure
# stdlib — Huffman entropy decode, dequant, sparse IDCT, 4:2:0 upsample).
# With it decoded, only MP3/H.264 remain environment-gated.

JPEG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("y00", T.IntegerType(), True),
        T.StructField("y_mid", T.IntegerType(), True),
        T.StructField("y_right", T.IntegerType(), True),
        T.StructField("y_sum", T.LongType(), True),
        T.StructField("y_checker_sum", T.LongType(), True),
        T.StructField("cb_sum", T.LongType(), True),
        T.StructField("cr_sum", T.LongType(), True),
    ]
)


def synthesize_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """One real baseline JFIF file per row (two interleaved 4:2:0 MCUs,
    canonical Huffman tables in DHT, ZRL runs, DC prediction) — Arrow-
    batched mapInPandas, same shape as synthesize_png_media."""
    import pandas as pd

    from .jpeg_codec import make_jpeg

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        for pdf in it:
            seeds = (pdf["media_id"] % 251).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "jpeg": [make_jpeg(int(s)) for s in seeds],
                }
            )

    return src.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("jpeg", T.BinaryType(), True),
            ]
        ),
    )


def extract_jpeg_features(media: DataFrame) -> DataFrame:
    """TRUE-pixel features from PARSED JPEG bytes (functions/jpeg_codec
    parse_jpeg). ``y_checker_sum`` weights each luma pixel by the (4,4)
    basis sign pattern s(x%8)s(y%8), isolating the AC coefficients — it
    is only right if the Huffman AC path (two ZRLs + run/size + EOB per
    block), the zigzag placement, and the IDCT are; ``y_sum`` isolates
    the DC prediction chain; ``cb_sum``/``cr_sum`` are only right if
    chroma decode + 2x2 nearest-neighbor upsampling are. All BIGINT-exact
    (the synthetic coefficient pattern makes every true pixel an integer
    — jpeg_codec module docstring)."""
    import pandas as pd

    from .jpeg_codec import CHECKER, parse_jpeg

    def batches(it):
        for pdf in it:
            rows = []
            for mid, jpg in zip(pdf["media_id"], pdf["jpeg"]):
                w, h, pl = parse_jpeg(bytes(jpg))
                ys, yc, cbs, crs = 0, 0, 0, 0
                for y in range(h):
                    ry, rcb, rcr = pl["Y"][y], pl["Cb"][y], pl["Cr"][y]
                    sy = CHECKER[y % 8]
                    for x in range(w):
                        ys += ry[x]
                        yc += sy * CHECKER[x % 8] * ry[x]
                        cbs += rcb[x]
                        crs += rcr[x]
                rows.append(
                    {
                        "doc_id": mid,
                        "img_width": w,
                        "img_height": h,
                        "y00": pl["Y"][0][0],
                        "y_mid": pl["Y"][8][8],
                        "y_right": pl["Y"][0][24],
                        "y_sum": ys,
                        "y_checker_sum": yc,
                        "cb_sum": cbs,
                        "cr_sum": crs,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, JPEG_FEATURES_SCHEMA)


def synthesize_ac_refine_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """One AC-successive-approximation progressive JFIF per row (eight
    scans incl. AC refinement) — same image content as
    synthesize_jpeg_media, the third wire encoding."""
    import pandas as pd

    from .jpeg_codec import make_ac_refine_jpeg

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        for pdf in it:
            seeds = (pdf["media_id"] % 251).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "jpeg": [make_ac_refine_jpeg(int(s)) for s in seeds],
                }
            )

    return src.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("jpeg", T.BinaryType(), True),
            ]
        ),
    )


def synthesize_progressive_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """One PROGRESSIVE (SOF2, five-scan) JFIF file per row — same image
    content as synthesize_jpeg_media, different wire encoding."""
    import pandas as pd

    from .jpeg_codec import make_progressive_jpeg

    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        for pdf in it:
            seeds = (pdf["media_id"] % 251).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "jpeg": [make_progressive_jpeg(int(s)) for s in seeds],
                }
            )

    return src.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("jpeg", T.BinaryType(), True),
            ]
        ),
    )
