"""Media metadata extraction queries — GIF / MP3 / H.264, jar-free.

Round-9 wave closing the remaining media-format gates at the level a
corpus pipeline actually needs them:

- ``gif_real_decode`` — TRUE-pixel decode of a COMPRESSED palette
  format (LZW + 4-pass interlace + extension skip), same proof shape as
  png/jpeg_real_decode: synthesize spec-conformant bytes per document,
  decode with an independent parser, check integer-exact features
  against an analytic DuckDB oracle.
- ``mp3_metadata_scan`` — MPEG-1 Layer III frame-header walk (duration,
  bitrate profile, CBR/VBR, tag overhead). Full sample decode stays
  honestly gated; the metadata walk IS the crawl-pipeline operation.
- ``h264_sps_parse`` — Annex-B NAL walk + SPS parse (dimensions with
  crop arithmetic, profile/level, keyframe census, SEI sum through the
  emulation-prevention de-escape). Slice pixel decode stays gated.

Reference parity: the reference's format registry ingests media exports
(image/audio/video legs); see also its media handling notes in
/root/reference/README.md. All three stages here are Arrow-batched
mapInPandas over partition-local batches — one row per item, no
shuffle, the exact shape a PIL/ffmpeg deployment uses at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.gif_codec import make_gif, parse_gif
from ..functions.h264_meta import make_h264, parse_h264
from ..functions.mpeg_audio import make_mp3, parse_mp3
from ..schemas import load_table
from .catalog import register


def _media_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % F.lit(251)).cast("long").alias("seed"),
    )


_GIF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("px0_r", T.IntegerType(), True),
        T.StructField("px0_g", T.IntegerType(), True),
        T.StructField("px0_b", T.IntegerType(), True),
        T.StructField("img_sum", T.LongType(), True),
        T.StructField("row3_sum", T.LongType(), True),
    ]
)


@register(
    "gif_real_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    ),
    px AS (
        SELECT b.doc_id, g.p,
               (b.seed + (g.p % 8) * (1 + g.p // 8)) % 8 AS i
        FROM base b, (SELECT unnest(range(0, 64)) AS p) g
    ),
    agg AS (
        SELECT px.doc_id,
               CAST(SUM((b.seed*3 + 5*px.i) % 256 + (b.seed*5 + 7*px.i) % 256
                        + (b.seed*7 + 11*px.i) % 256) AS BIGINT) AS img_sum,
               CAST(SUM(CASE WHEN px.p >= 24 AND px.p < 32 THEN
                        (b.seed*3 + 5*px.i) % 256 + (b.seed*5 + 7*px.i) % 256
                        + (b.seed*7 + 11*px.i) % 256 END) AS BIGINT) AS row3_sum
        FROM px JOIN base b ON b.doc_id = px.doc_id
        GROUP BY px.doc_id
    )
    SELECT b.doc_id,
           CAST(8 AS INT) AS img_width, CAST(8 AS INT) AS img_height,
           CAST((b.seed*3 + 5*(b.seed % 8)) % 256 AS INT) AS px0_r,
           CAST((b.seed*5 + 7*(b.seed % 8)) % 256 AS INT) AS px0_g,
           CAST((b.seed*7 + 11*(b.seed % 8)) % 256 AS INT) AS px0_b,
           agg.img_sum, agg.row3_sum
    FROM base b JOIN agg ON b.doc_id = agg.doc_id
    """,
)
def gif_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-pixel GIF decode, stdlib-only (functions/gif_codec.py): per
    document a spec-conformant INTERLACED GIF89a (8-color global table,
    GCE + comment extensions, variable-width LZW with a 4->5 bit code
    crossing at 64 pixels) is decoded by the independent parse_gif and
    features come from the PARSED palette+indices. ``row3_sum`` is row
    y=3 — stored LAST by the 4-pass interlace, so its value is only
    right if the de-interlace is; px0 pins the palette order; the LZW
    protocol itself is pinned by a public golden byte vector in tests.
    The pixel formula is row-dependent (idx = (seed + x*(1+y)) % 8) so
    every row sums differently. BIGINT-exact, no float risk."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                w, h, pal, idx = parse_gif(make_gif(int(seed)))
                r0, g0, b0 = pal[idx[0]]
                tot = sum(sum(pal[i]) for i in idx)
                row3 = sum(sum(pal[i]) for i in idx[3 * w : 4 * w])
                rows.append(
                    {
                        "doc_id": did,
                        "img_width": w,
                        "img_height": h,
                        "px0_r": r0,
                        "px0_g": g0,
                        "px0_b": b0,
                        "img_sum": tot,
                        "row3_sum": row3,
                    }
                )
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _GIF_SCHEMA)


_MP3_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("total_samples", T.LongType(), True),
        T.StructField("sum_bitrate_kbps", T.LongType(), True),
        T.StructField("padded_frames", T.IntegerType(), True),
        T.StructField("is_vbr", T.IntegerType(), True),
        T.StructField("id3v2_size", T.IntegerType(), True),
        T.StructField("has_id3v1", T.IntegerType(), True),
    ]
)


@register(
    "mp3_metadata_scan",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    ),
    frames AS (
        SELECT b.doc_id, b.seed, g.k,
               CASE WHEN b.seed % 4 = 0 THEN 128
                    ELSE CASE (b.seed + g.k) % 3
                         WHEN 0 THEN 128 WHEN 1 THEN 160 ELSE 192 END
               END AS kbps,
               (b.seed + g.k) % 2 AS pad
        FROM base b, (SELECT unnest(range(0, 21)) AS k) g
        WHERE g.k < 12 + b.seed % 9
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_frames,
               CAST(COUNT(*) * 1152 AS BIGINT) AS total_samples,
               CAST(SUM(kbps) AS BIGINT) AS sum_bitrate_kbps,
               CAST(SUM(pad) AS INT) AS padded_frames
        FROM frames GROUP BY doc_id
    )
    SELECT b.doc_id, agg.n_frames,
           CAST(44100 AS INT) AS sample_rate,
           agg.total_samples, agg.sum_bitrate_kbps, agg.padded_frames,
           CAST(CASE WHEN b.seed % 4 = 0 THEN 0 ELSE 1 END AS INT) AS is_vbr,
           CAST(17 + b.seed % 23 AS INT) AS id3v2_size,
           CAST(1 AS INT) AS has_id3v1
    FROM base b JOIN agg ON b.doc_id = agg.doc_id
    """,
)
def mp3_metadata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata walk (functions/mpeg_audio.py): per document a real
    MPEG-1 Layer III byte stream (ID3v2.3 tag with syncsafe size, 12-20
    frames with seed-driven bitrate/padding via the spec length formula,
    ID3v1 trailer) is walked frame by frame by the independent
    parse_mp3. CBR files (seed % 4 == 0) pin the VBR detector's false-
    positive side; padding bits pin the length formula's +1 branch; the
    oracle recomputes every stat from the shared closed form. Full
    sample decode (Huffman + IMDCT + polyphase) stays honestly gated —
    metadata is the pipeline-relevant operation."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                s = parse_mp3(make_mp3(int(seed)))
                rows.append({"doc_id": did, **s})
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _MP3_SCHEMA)


_H264_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("profile_idc", T.IntegerType(), True),
        T.StructField("level_idc", T.IntegerType(), True),
        T.StructField("vid_width", T.IntegerType(), True),
        T.StructField("vid_height", T.IntegerType(), True),
        T.StructField("max_ref_frames", T.IntegerType(), True),
        T.StructField("n_idr", T.IntegerType(), True),
        T.StructField("n_nonidr", T.IntegerType(), True),
        T.StructField("sei_sum", T.LongType(), True),
    ]
)


@register(
    "h264_sps_parse",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    )
    SELECT doc_id,
           CAST(66 AS INT) AS profile_idc,
           CAST(30 + (seed % 3) * 10 AS INT) AS level_idc,
           CAST((2 + seed % 9) * 16 - 2 * (seed % 2) AS INT) AS vid_width,
           CAST((2 + (seed // 3) % 7) * 16 - 2 * ((seed // 2) % 2) AS INT)
               AS vid_height,
           CAST(1 + seed % 4 AS INT) AS max_ref_frames,
           CAST(1 + seed % 3 AS INT) AS n_idr,
           CAST(3 + seed % 5 AS INT) AS n_nonidr,
           CAST(6 + seed % 256 + (seed * 3) % 256 + (seed * 5) % 256
                  + (seed + 1) % 256 + (seed + 2) % 256 AS BIGINT) AS sei_sum
    FROM base
    """,
)
def h264_sps_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H.264 stream metadata (functions/h264_meta.py): per document an
    Annex-B stream (SPS with Exp-Golomb geometry incl. frame cropping,
    PPS, an SEI whose payload forces emulation-prevention bytes, and a
    seed-driven IDR/non-IDR slice census over BOTH 3- and 4-byte start
    codes) is walked by the independent parse_h264. ``vid_width``/
    ``vid_height`` exercise the 4:2:0 crop-unit arithmetic; ``sei_sum``
    is only right if the 00 00 03 de-escape is; the slice census is the
    keyframe-rate stat a video corpus pipeline samples on. Slice pixel
    decode (CAVLC/CABAC) stays honestly gated."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                s = parse_h264(make_h264(int(seed)))
                rows.append(
                    {
                        "doc_id": did,
                        "profile_idc": s["profile_idc"],
                        "level_idc": s["level_idc"],
                        "vid_width": s["vid_width"],
                        "vid_height": s["vid_height"],
                        "max_ref_frames": s["max_ref_frames"],
                        "n_idr": s["n_idr"],
                        "n_nonidr": s["n_nonidr"],
                        "sei_sum": s["sei_sum"],
                    }
                )
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _H264_SCHEMA)


# ------------------------------------------------------------------ WARC
_WARC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_records", T.IntegerType(), True),
        T.StructField("n_responses", T.IntegerType(), True),
        T.StructField("n_requests", T.IntegerType(), True),
        T.StructField("http_200", T.IntegerType(), True),
        T.StructField("html_responses", T.IntegerType(), True),
        T.StructField("total_payload_bytes", T.LongType(), True),
        T.StructField("payload_checksum", T.LongType(), True),
    ]
)


@register(
    "warc_records_scan",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    ),
    resp AS (
        SELECT b.doc_id, b.seed, g.i,
               CASE WHEN (b.seed + g.i) % 5 = 0 THEN 404 ELSE 200 END AS status,
               CASE WHEN (b.seed + g.i) % 3 = 0 THEN 0 ELSE 1 END AS is_html,
               50 + (b.seed * 7 + g.i * 13) % 100 AS body_len
        FROM base b, (SELECT unnest(range(0, 7)) AS i) g
        WHERE g.i < 3 + b.seed % 4
    ),
    bytes_ AS (
        SELECT r.doc_id,
               CAST(SUM((r.seed + r.i * 31 + g.j * 7) % 256) AS BIGINT) AS ck
        FROM resp r, (SELECT unnest(range(0, 150)) AS j) g
        WHERE g.j < r.body_len
        GROUP BY 1
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_responses,
               CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS INT)
                   AS http_200,
               CAST(SUM(is_html) AS INT) AS html_responses,
               CAST(SUM(body_len) AS BIGINT) AS total_payload_bytes
        FROM resp GROUP BY 1
    )
    SELECT a.doc_id,
           CAST(1 + 2 * a.n_responses AS INT) AS n_records,
           a.n_responses,
           a.n_responses AS n_requests,
           a.http_200, a.html_responses, a.total_payload_bytes,
           b.ck AS payload_checksum
    FROM agg a JOIN bytes_ b ON a.doc_id = b.doc_id
    """,
)
def warc_records_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) record walk over the COMMON CRAWL wire layout:
    per document a per-record-gzipped multistream WARC (warcinfo +
    request/response pairs with full embedded HTTP/1.1 messages) is
    built by functions/warc_codec.make_warc_gz and walked by the
    independent parse_warc — gzip member concatenation, Content-Length
    framing, case-insensitive WARC headers, CRLFCRLF terminators, HTTP
    status/header parse separating header bytes from the true payload.
    ``payload_checksum`` sums every PAYLOAD byte, so any framing error
    that leaks HTTP headers into the body (or truncates it) flips the
    hash. Per-record gzip members are what make WARC splittable at
    100 TB: any byte range can start decoding at the next member
    boundary, the same property avrolite exploits for Avro blocks."""
    import pandas as pd

    from ..functions.warc_codec import make_warc_gz, parse_warc

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                s = parse_warc(make_warc_gz(int(seed)))
                rows.append({"doc_id": did, **s})
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _WARC_SCHEMA)


# ------------------------------------------------------------------ TIFF
_TIFF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("is_big_endian", T.IntegerType(), True),
        T.StructField("px0_r", T.IntegerType(), True),
        T.StructField("px0_g", T.IntegerType(), True),
        T.StructField("px0_b", T.IntegerType(), True),
        T.StructField("img_sum", T.LongType(), True),
        T.StructField("strip2_sum", T.LongType(), True),
        T.StructField("is_lzw", T.IntegerType(), True),
    ]
)


@register(
    "tiff_real_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    ),
    px AS (
        SELECT b.doc_id, g.p,
               (b.seed + 5 * g.p + 1) % 256 + (b.seed + 5 * g.p + 3) % 256
               + (b.seed + 5 * g.p + 4) % 256 AS s
        FROM base b, (SELECT unnest(range(0, 48)) AS p) g
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(s) AS BIGINT) AS img_sum,
               CAST(SUM(CASE WHEN p >= 24 THEN s END) AS BIGINT) AS strip2_sum
        FROM px GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(6 AS INT) AS img_width, CAST(8 AS INT) AS img_height,
           CAST(b.seed % 2 AS INT) AS is_big_endian,
           CAST((b.seed + 1) % 256 AS INT) AS px0_r,
           CAST((b.seed + 3) % 256 AS INT) AS px0_g,
           CAST((b.seed + 4) % 256 AS INT) AS px0_b,
           agg.img_sum, agg.strip2_sum,
           CAST(CASE WHEN b.seed % 3 = 0 THEN 1 ELSE 0 END AS INT) AS is_lzw
    FROM base b JOIN agg ON b.doc_id = agg.doc_id
    """,
)
def tiff_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline TIFF 6.0 true-pixel decode (functions/tiff_codec.py):
    per document a two-strip PackBits-compressed RGB TIFF whose header
    endianness ALTERNATES II/MM by seed parity is decoded by the
    independent parse_tiff — endian detect, IFD tag walk (inline vs
    offset values, left-justified inline SHORTs), strip assembly,
    PackBits runs. ``strip2_sum`` (rows 4-7) is only right if the second
    strip's offset/count round the IFD correctly; ``is_big_endian``
    pins the MM branch onto half the corpus. r13: a THIRD of the corpus
    (seed % 3 == 0, pinned by the oracle's is_lzw column) compresses
    with TIFF-variant LZW (MSB-first, EarlyChange) instead of PackBits
    — same closed-form pixel oracle, so a wrong code-width bump or KwKwK
    flip breaks the hash. Tiled/multi-page/16-bit stay honestly gated."""
    import pandas as pd

    from ..functions.tiff_codec import make_tiff, parse_tiff

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                comp = "lzw" if int(seed) % 3 == 0 else "packbits"
                data = make_tiff(int(seed), compression=comp)
                w, h, px = parse_tiff(data)
                tot = sum(sum(t) for t in px)
                s2 = sum(sum(t) for t in px[4 * w :])
                rows.append(
                    {
                        "doc_id": did,
                        "img_width": w,
                        "img_height": h,
                        "is_big_endian": 1 if data[:2] == b"MM" else 0,
                        "px0_r": px[0][0],
                        "px0_g": px[0][1],
                        "px0_b": px[0][2],
                        "img_sum": tot,
                        "strip2_sum": s2,
                        "is_lzw": 1 if comp == "lzw" else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _TIFF_SCHEMA)


# ------------------------------------------------- sniffing dispatcher
_SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("detected_format", T.StringType(), True),
        T.StructField("img_width", T.IntegerType(), True),
        T.StructField("img_height", T.IntegerType(), True),
        T.StructField("pixel_checksum", T.LongType(), True),
    ]
)


@register(
    "media_sniff_dispatch",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed,
               doc_id % 4 AS fmt FROM documents
    ),
    gif AS (
        SELECT b.doc_id,
               CAST(SUM((b.seed*3 + 5*i.i) % 256 + (b.seed*5 + 7*i.i) % 256
                        + (b.seed*7 + 11*i.i) % 256) AS BIGINT) AS ck
        FROM base b,
             (SELECT p, NULL AS dummy FROM (SELECT unnest(range(0, 64)) AS p)) g,
             LATERAL (SELECT (b.seed + (g.p % 8) * (1 + g.p // 8)) % 8 AS i) i
        WHERE b.fmt = 0 GROUP BY 1
    ),
    png AS (
        SELECT b.doc_id,
               CAST(SUM((b.seed + 3*g.p) % 256 + (b.seed + 3*g.p + 1) % 256
                        + (b.seed + 3*g.p + 2) % 256) AS BIGINT) AS ck
        FROM base b, (SELECT unnest(range(0, 60)) AS p) g
        WHERE b.fmt = 1 GROUP BY 1
    ),
    tif AS (
        SELECT b.doc_id,
               CAST(SUM((b.seed + 5*g.p + 1) % 256 + (b.seed + 5*g.p + 3) % 256
                        + (b.seed + 5*g.p + 4) % 256) AS BIGINT) AS ck
        FROM base b, (SELECT unnest(range(0, 48)) AS p) g
        WHERE b.fmt = 2 GROUP BY 1
    ),
    jpg AS (
        SELECT b.doc_id,
               CAST(65536 + 64 * SUM((b.seed*(g.k+3) + 11*g.k) % 97 - 48)
                    AS BIGINT) AS ck
        FROM base b, (SELECT unnest(range(0, 8)) AS k) g
        WHERE b.fmt = 3 GROUP BY 1
    ),
    cks AS (
        SELECT doc_id, ck FROM gif UNION ALL SELECT doc_id, ck FROM png
        UNION ALL SELECT doc_id, ck FROM tif UNION ALL SELECT doc_id, ck FROM jpg
    )
    SELECT b.doc_id,
           CASE b.fmt WHEN 0 THEN 'gif' WHEN 1 THEN 'png'
                      WHEN 2 THEN 'tiff' ELSE 'jpeg' END AS detected_format,
           CAST(CASE b.fmt WHEN 0 THEN 8 WHEN 1 THEN 6
                           WHEN 2 THEN 6 ELSE 32 END AS INT) AS img_width,
           CAST(CASE b.fmt WHEN 0 THEN 8 WHEN 1 THEN 10
                           WHEN 2 THEN 8 ELSE 16 END AS INT) AS img_height,
           cks.ck AS pixel_checksum
    FROM base b JOIN cks ON b.doc_id = cks.doc_id
    """,
)
def media_sniff_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-SNIFFING media ingest — the shape a real crawl pipeline
    runs: payload bytes arrive with no trusted extension, the dispatcher
    detects the container by MAGIC BYTES (GIF89a / \\x89PNG / II*\\0 and
    MM\\0* / \\xFF\\xD8) and routes to the right in-repo decoder, emitting
    one uniform feature row per item. Per document the payload format
    rotates by doc_id %% 4 across all four true-pixel decoders, and
    ``pixel_checksum`` is each format's closed-form pixel sum (JPEG uses
    its luma DC chain) — so a wrong sniff decodes garbage or raises, and
    either flips the hash. One Arrow-batched mapInPandas, no shuffle;
    unknown magics raise (no silent skip)."""
    import pandas as pd

    from ..functions.jpeg_codec import make_jpeg, parse_jpeg
    from ..functions.multimodal import make_png, parse_png
    from ..functions.tiff_codec import make_tiff, parse_tiff

    makers = {
        0: make_gif,
        1: make_png,
        2: make_tiff,
        3: make_jpeg,
    }

    def sniff_decode(payload: bytes):
        if payload[:6] in (b"GIF89a", b"GIF87a"):
            w, h, pal, idx = parse_gif(payload)
            return "gif", w, h, sum(sum(pal[i]) for i in idx)
        if payload[:4] == b"\x89PNG":
            w, h, px = parse_png(payload)
            return "png", w, h, sum(r + g + b for r, g, b in px)
        if payload[:3] in (b"II\x2a", b"MM\x00"):
            w, h, px = parse_tiff(payload)
            return "tiff", w, h, sum(sum(t) for t in px)
        if payload[:2] == b"\xff\xd8":
            w, h, planes = parse_jpeg(payload)
            return "jpeg", w, h, sum(sum(row) for row in planes["Y"])
        raise ValueError(f"unknown media magic {payload[:4]!r}")

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                payload = makers[int(did) % 4](int(seed))
                fmt, w, h, ck = sniff_decode(payload)
                rows.append(
                    {
                        "doc_id": did,
                        "detected_format": fmt,
                        "img_width": w,
                        "img_height": h,
                        "pixel_checksum": ck,
                    }
                )
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _SNIFF_SCHEMA)


# ------------------------------------------------------- GIF animation
_ANIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("total_delay_cs", T.IntegerType(), True),
        T.StructField("has_loop_ext", T.IntegerType(), True),
        T.StructField("first_frame_sum", T.LongType(), True),
        T.StructField("last_frame_sum", T.LongType(), True),
    ]
)


@register(
    "gif_animation_census",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 251 AS BIGINT) AS seed FROM documents
    ),
    delays AS (
        SELECT b.doc_id,
               CAST(SUM((b.seed + 10 * g.f) % 50) AS INT) AS total_delay_cs,
               CAST(COUNT(*) AS INT) AS n_frames,
               CAST(MAX(g.f) AS BIGINT) AS last_f
        FROM base b, (SELECT unnest(range(0, 7)) AS f) g
        WHERE g.f < 3 + b.seed % 4
        GROUP BY 1
    ),
    px AS (
        SELECT b.doc_id, g.p,
               (b.seed + (g.p % 8) * (1 + g.p // 8)) % 8 AS i0
        FROM base b, (SELECT unnest(range(0, 64)) AS p) g
    ),
    sums AS (
        SELECT px.doc_id,
               CAST(SUM(px.i0) AS BIGINT) AS first_sum,
               CAST(SUM((px.i0 + d.last_f) % 8) AS BIGINT) AS last_sum
        FROM px JOIN delays d ON d.doc_id = px.doc_id
        GROUP BY 1
    )
    SELECT b.doc_id, d.n_frames, d.total_delay_cs,
           CAST(1 AS INT) AS has_loop_ext,
           s.first_sum AS first_frame_sum, s.last_sum AS last_frame_sum
    FROM base b
    JOIN delays d ON d.doc_id = b.doc_id
    JOIN sums s ON s.doc_id = b.doc_id
    """,
)
def gif_animation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANIMATED GIF census with full per-frame decode: per document a
    multi-frame GIF89a (NETSCAPE2.0 loop extension, per-frame Graphic
    Control delays, frame pixels shifting (idx+f) % 8) is walked by
    functions/gif_codec.parse_gif_animation — frame count, summed delay
    centiseconds, loop detection, and index checksums of the FIRST and
    LAST frames, each LZW-decoded (a census that cannot decode its
    frames proves nothing). The oracle recomputes everything from the
    generation closed form, so a skipped frame, a mis-read delay or a
    broken per-frame LZW restart flips the hash. Frame compositing/
    disposal is out of scope (census, not playback — stated)."""
    import pandas as pd

    from ..functions.gif_codec import make_animated_gif, parse_gif_animation

    def batches(it):
        for pdf in it:
            rows = []
            for did, seed in zip(pdf["doc_id"], pdf["seed"]):
                w, h, nf, delay, loop, frames = parse_gif_animation(
                    make_animated_gif(int(seed))
                )
                rows.append(
                    {
                        "doc_id": did,
                        "n_frames": nf,
                        "total_delay_cs": delay,
                        "has_loop_ext": int(loop),
                        "first_frame_sum": sum(frames[0]),
                        "last_frame_sum": sum(frames[-1]),
                    }
                )
            yield pd.DataFrame(rows)

    return _media_ids(spark, sf_dir).mapInPandas(batches, _ANIM_SCHEMA)
