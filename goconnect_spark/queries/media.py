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


QUERIES = {
    "media_classify_counts": media_classify_counts,
}

ORACLE = {
    "media_classify_counts": _MEDIA_CLASSIFY_SQL,
}
