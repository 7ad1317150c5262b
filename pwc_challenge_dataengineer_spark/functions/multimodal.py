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
