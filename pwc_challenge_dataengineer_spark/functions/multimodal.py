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
the multimodal_real_decode catalog query). Only compressed formats
(PNG/JPEG/MP3/H.264) remain gated.
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
# for uncompressed containers; only compressed codecs (PNG/JPEG/MP3/H.264)
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
