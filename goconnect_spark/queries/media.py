"""Multimodal header-routing certification (VERDICT r11 item 4).

`parse_media_headers` (operators/multimodal.py) is the layer the
100 TB multimodal design leans on: pure whole-stage-codegen column
expressions (substring/hex/conv) that classify every blob and extract
container metadata WITHOUT the payload ever leaving the JVM. Until
round 12 that layer was pytest-only; this module gives it a driver-
visible DuckDB-certified catalog entry.

Oracle design — planted truth, same style as the planted-similarity
suite: both engines derive a deterministic media corpus from the
`documents` table (doc_id arithmetic chooses one of 10 container
variants and plants width/height/sample-rate/channel values). The
SPARK side renders each row into REAL container bytes (hex-built PNG /
GIF / BMP-info / BMP-top-down / BMP-core / canonical WAV / LIST-first
WAV / JPEG / MP4 / junk, zero-padded to a fixed 64 bytes), runs the
actual `parse_media_headers` operator over the binary column, and
aggregates what the operator RECOVERED. The DuckDB side never touches
bytes: it aggregates the PLANTED values directly. Any parsing defect —
wrong offset, endianness, signed-height handling, core-vs-info header
branch, fmt-first WAV gate — makes the recovered aggregates diverge
from the planted ones and fails the hash match.

Scale note: the corpus is derived per-row from a table scan (no
driver-side construction, no collect), so the certified plan is the
same classify-on-scan shape a 100 TB binary corpus would run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from goconnect_spark.operators.multimodal import parse_media_headers
from goconnect_spark.tables import load


def _hx2(col):
    """2-hex-char (1 byte) rendering of an int column in [0, 255]."""
    return F.lpad(F.hex(col), 2, "0")


def _be32(col):
    return F.lpad(F.hex(col), 8, "0")


def _le16(col):
    return F.concat(_hx2(col % 256), _hx2(F.shiftright(col, 8) % 256))


def _le32(col):
    return F.concat(
        _hx2(col % 256),
        _hx2(F.shiftright(col, 8) % 256),
        _hx2(F.shiftright(col, 16) % 256),
        _hx2(F.shiftright(col, 24) % 256),
    )


def _media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media binary): one deterministic 64-byte container per
    document row, variant = doc_id % 10."""
    d = F.col("doc_id")
    w = (d % 500 + 1).cast("long")
    h = (d % 300 + 2).cast("long")
    ch = (d % 2 + 1).cast("long")
    rate = ((d % 4 + 1) * 8000).cast("long")
    v = d % 10
    png = F.concat(
        F.lit("89504E470D0A1A0A"),          # signature
        F.lit("0000000D49484452"),          # IHDR length + type
        _be32(w), _be32(h), F.lit("0806000000"),
    )
    gif = F.concat(F.lit("474946383961"), _le16(w), _le16(h))
    bmp_info = F.concat(
        F.lit("424D"), _le32(F.lit(98)), F.lit("00000000"),
        _le32(F.lit(54)), _le32(F.lit(40)), _le32(w), _le32(h),
    )
    # top-down BMP: height stored as the two's-complement negative
    bmp_topdown = F.concat(
        F.lit("424D"), _le32(F.lit(98)), F.lit("00000000"),
        _le32(F.lit(54)), _le32(F.lit(40)), _le32(w),
        _le32(F.lit(4294967296) - h),
    )
    bmp_core = F.concat(
        F.lit("424D"), _le32(F.lit(32)), F.lit("00000000"),
        _le32(F.lit(26)), _le32(F.lit(12)), _le16(w), _le16(h),
        _le16(F.lit(1)), _le16(F.lit(24)),
    )
    wav_fmt_first = F.concat(
        F.lit("52494646"), _le32(F.lit(56)), F.lit("57415645"),
        F.lit("666D7420"), _le32(F.lit(16)), _le16(F.lit(1)),
        _le16(ch), _le32(rate),
    )
    # a valid WAV whose first chunk is LIST/INFO: format must still be
    # 'wav' but the fixed-offset rate/channel fields must come back
    # NULL (the fmt-first gate), never garbage read from LIST bytes
    wav_list_first = F.concat(
        F.lit("52494646"), _le32(F.lit(56)), F.lit("57415645"),
        F.lit("4C495354"), _le32(F.lit(16)), F.lit("494E464F"),
    )
    jpeg = F.lit("FFD8FFE000104A46494600")
    mp4 = F.lit("000000186674797069736F6D")
    junk = F.concat(F.lit("DEADBEEF"), _be32(d.cast("long")))
    hexstr = (
        F.when(v == 0, png)
        .when(v == 1, gif)
        .when(v == 2, bmp_info)
        .when(v == 3, bmp_topdown)
        .when(v == 4, bmp_core)
        .when(v == 5, wav_fmt_first)
        .when(v == 6, wav_list_first)
        .when(v == 7, jpeg)
        .when(v == 8, mp4)
        .otherwise(junk)
    )
    return (
        load(spark, "documents", sf_dir)
        .select("doc_id", F.unhex(F.rpad(hexstr, 128, "0")).alias("media"))
    )


def media_classify_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format x kind aggregate of what parse_media_headers RECOVERS
    from the constructed container bytes; the oracle aggregates the
    planted values. Certifies: signature classification, PNG BE-u32
    dims, GIF LE-u16 dims, BMP INFO/top-down/CORE dimension branches,
    WAV fmt-first field gating, and the fixed n_bytes accounting."""
    df = parse_media_headers(_media_corpus(spark, sf_dir))
    m = F.col("media_meta")
    return (
        df.groupBy(
            m["format"].alias("format"), m["kind"].alias("kind")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(m["width"]).alias("n_with_dims"),
            F.sum(m["width"].cast("long") * m["height"].cast("long")).alias(
                "total_pixels"),
            F.sum(m["sample_rate"].cast("long")).alias("sum_rate"),
            F.sum(m["n_channels"].cast("long")).alias("sum_channels"),
            F.sum(m["n_bytes"]).alias("total_bytes"),
        )
        .orderBy("format", "kind")
    )


_MEDIA_CLASSIFY_SQL = """
WITH planted AS (
    SELECT doc_id % 10 AS v,
           doc_id % 500 + 1 AS w,
           doc_id % 300 + 2 AS h,
           doc_id % 2 + 1 AS ch,
           (doc_id % 4 + 1) * 8000 AS rate
    FROM documents
), c AS (
    SELECT CASE WHEN v = 0 THEN 'png' WHEN v = 1 THEN 'gif'
                WHEN v IN (2, 3, 4) THEN 'bmp'
                WHEN v IN (5, 6) THEN 'wav'
                WHEN v = 7 THEN 'jpeg' WHEN v = 8 THEN 'mp4'
                ELSE 'unknown' END AS format,
           CASE WHEN v IN (0, 1, 2, 3, 4, 7) THEN 'image'
                WHEN v IN (5, 6) THEN 'audio'
                WHEN v = 8 THEN 'video'
                ELSE 'unknown' END AS kind,
           CASE WHEN v IN (0, 1, 2, 3, 4) THEN w END AS width,
           CASE WHEN v IN (0, 1, 2, 3, 4) THEN h END AS height,
           CASE WHEN v = 5 THEN rate END AS sample_rate,
           CASE WHEN v = 5 THEN ch END AS n_channels
    FROM planted
)
SELECT format, kind,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(width) AS BIGINT) AS n_with_dims,
       CAST(SUM(width * height) AS BIGINT) AS total_pixels,
       CAST(SUM(sample_rate) AS BIGINT) AS sum_rate,
       CAST(SUM(n_channels) AS BIGINT) AS sum_channels,
       CAST(COUNT(*) * 64 AS BIGINT) AS total_bytes
FROM c
GROUP BY format, kind
ORDER BY format, kind
"""


def _be16(col):
    return F.lpad(F.hex(col), 4, "0")


def _jpeg_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media): one deterministic JPEG per document row with a
    VARIABLE-POSITION SOF — the APP0 (and, for some variants, COM)
    segment lengths derive from doc_id, so recovering the planted
    dimensions requires an actual marker walk, not a fixed offset.
    Variant = doc_id % 6:
      0 baseline (C0)   1 extended (C1)   2 progressive (C2)
      3 arith-sequential (C9 — a gated profile: routes to quarantine)
      4 desynced marker stream (profile/dims honestly NULL)
      5 SOS before any SOF (profile/dims honestly NULL)"""
    d = F.col("doc_id")
    w = (d % 900 + 16).cast("long")
    h = (d % 600 + 16).cast("long")
    v = d % 6
    app0_pad = ((d % 5) * 3).cast("int")        # 0..12 extra body bytes
    com_pad = ((d % 4 + 1) * 2).cast("int")     # 2..8 body bytes
    app0 = F.concat(F.lit("FFE0"), _be16(app0_pad + 8),
                    F.lit("4A4649460000"),  # 'JFIF\0\0' (6 body bytes)
                    F.repeat(F.lit("00"), app0_pad))
    com = F.concat(F.lit("FFFE"), _be16(com_pad + 2),
                   F.repeat(F.lit("00"), com_pad))
    def sof(marker):
        return F.concat(F.lit(marker), F.lit("000B08"), _be16(h), _be16(w),
                        F.lit("011100"))
    soi = F.lit("FFD8")
    tail = F.lit("FFDA0008010100003F00ABCD")  # SOS + entropy-ish bytes
    hexstr = (
        F.when(v == 0, F.concat(soi, app0, sof("FFC0"), tail))
        .when(v == 1, F.concat(soi, app0, com, sof("FFC1"), tail))
        .when(v == 2, F.concat(soi, com, app0, sof("FFC2"), tail))
        .when(v == 3, F.concat(soi, app0, sof("FFC9"), tail))
        # FFD8, a 4-byte APP1, then a 0x00 where the next marker's FF
        # must be: the scanner bails instead of guessing
        .when(v == 4, F.lit("FFD8FFE1000400001234"))
        # SOS with no preceding SOF: dims/profile must be NULL
        .otherwise(F.concat(soi, app0, tail))
    )
    return (
        load(spark, "documents", sf_dir)
        .select("doc_id", F.unhex(hexstr).alias("media"))
    )


def media_jpeg_dims_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certificate for the bounded-prefix JPEG SOF routing layer
    (with_jpeg_dimensions + with_jpeg_profile): Spark walks REAL
    marker streams whose segment lengths vary per row and aggregates
    the RECOVERED profile/dimensions; the oracle aggregates the
    planted values. A wrong marker-length read, a missed fill byte, a
    wrong SOF field offset, or a profile-table defect breaks the
    hash. `decodable` certifies the quarantine routing key
    (JPEG_DECODABLE_PROFILES)."""
    from goconnect_spark.operators.multimodal import (
        JPEG_DECODABLE_PROFILES,
        with_jpeg_dimensions,
        with_jpeg_profile,
    )

    df = with_jpeg_profile(with_jpeg_dimensions(
        parse_media_headers(_jpeg_corpus(spark, sf_dir))))
    m = F.col("media_meta")
    prof = F.coalesce(F.col("jpeg_profile"), F.lit("unparseable"))
    decodable = F.coalesce(
        F.col("jpeg_profile").isin(*JPEG_DECODABLE_PROFILES), F.lit(False))
    return (
        df.groupBy(prof.alias("profile"), decodable.alias("decodable"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(m["width"]).alias("n_with_dims"),
            F.sum(m["width"].cast("long")).alias("sum_width"),
            F.sum(m["height"].cast("long")).alias("sum_height"),
        )
        .orderBy("profile")
    )


_MEDIA_JPEG_SQL = """
WITH planted AS (
    SELECT doc_id % 6 AS v,
           doc_id % 900 + 16 AS w,
           doc_id % 600 + 16 AS h
    FROM documents
), c AS (
    SELECT CASE WHEN v = 0 THEN 'baseline' WHEN v = 1 THEN 'extended'
                WHEN v = 2 THEN 'progressive'
                WHEN v = 3 THEN 'arith-sequential'
                ELSE 'unparseable' END AS profile,
           v IN (0, 1, 2) AS decodable,
           CASE WHEN v <= 3 THEN w END AS width,
           CASE WHEN v <= 3 THEN h END AS height
    FROM planted
)
SELECT profile, decodable,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(width) AS BIGINT) AS n_with_dims,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(height) AS BIGINT) AS sum_height
FROM c
GROUP BY profile, decodable
ORDER BY profile
"""


QUERIES = {
    "media_classify_counts": media_classify_counts,
    "media_jpeg_dims_profile": media_jpeg_dims_profile,
}

ORACLE = {
    "media_classify_counts": _MEDIA_CLASSIFY_SQL,
    "media_jpeg_dims_profile": _MEDIA_JPEG_SQL,
}
