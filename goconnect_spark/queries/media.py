"""Multimodal routing-stack certification (VERDICT r11 item 4 / r12
item 3): four planted-truth catalog entries that together drive every
stage of the media routing layer the 100 TB multimodal design leans
on, each against a DuckDB oracle that only aggregates planted values:

- media_classify_counts (r12): parse_media_headers — signature
  classification + fixed-offset container dims/rate/channels, pure
  whole-stage-codegen column expressions;
- media_jpeg_dims_profile (r12): with_jpeg_dimensions/_profile — the
  bounded-prefix SOF marker walk and decoder-routing profile table;
- media_animation_metadata (r13): with_gif_metadata/with_mp4_metadata
  — the GIF GCE/frame block walk and the ISO-BMFF mvhd/tkhd/stts box
  walk that route static vs animated before any decode;
- media_mp4_sample_ranges (r13): parse_mp4_video_samples via the
  sample_frames fan-out — the demuxer-lite stsz/stsc/stco|co64 sample
  extraction, with emitted payloads byte-checked against planted
  fills (mutation-verified: a one-byte offset defect fails the check;
  tools/bench_captures/r13_gates_summary.txt).

Until round 12 this stack was pytest-only; these entries make it
driver-certified.

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
from goconnect_spark.tables import load, spread


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
    # spread BEFORE the container construction (r14, guide §2.5): the
    # documents table is one parquet split at bench scale, so the
    # heavy per-row hex-assembly + every downstream header parse (incl.
    # the Arrow-UDF consumers' single Python worker) ran on ONE core.
    # Only doc_id crosses the tiny shuffle (§2.3 project-before-
    # exchange); no-op once the scan itself is parallel.
    return (
        spread(load(spark, "documents", sf_dir).select("doc_id"), key="doc_id", factor=0.25)
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
    # spread before construction — same single-split rationale as
    # _media_corpus (the Arrow marker-walk downstream is CPU-dense).
    return (
        spread(load(spark, "documents", sf_dir).select("doc_id"), key="doc_id", factor=0.25)
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


def _animation_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media): one deterministic GIF or MP4 container per
    document row whose ANIMATION metadata — frame count, GCE delays,
    mvhd timescale/duration, tkhd 16.16 dims, stts sample counts — is
    planted from doc_id arithmetic. Variant = doc_id % 6:
      0 animated GIF: n = doc_id%5+2 frames, each with a GCE delay of
        doc_id%20+1 centiseconds, global color table present
      1 static GIF: one frame, local color table, NO GCE
        (n_frames=1, duration honestly NULL)
      2 MP4, moov-FIRST, v0 mvhd (u32 timescale/duration), one video
        trak (16.16 width/height) with a one-entry stts frame count
      3 MP4, moov-LAST behind an mdat the walk must skip by declared
        size, v1 mvhd (u64 duration), one AUDIO trak (0x0 dims —
        width/height/n_frames honestly NULL)
      4 TRUNCATED animated GIF: doc_id%3+1 complete frames, then a
        frame whose data sub-block claims more bytes than exist —
        only the complete frames may count
      5 MP4 whose mvhd declares timescale=0 (div-by-zero guard:
        duration honestly NULL) and no trak at all

    The GIF frame units repeat via the SQL repeat() on a per-row hex
    string, so frame count is data-dependent without leaving
    whole-stage codegen; the MP4 boxes are fixed-layout with planted
    values at spec offsets (ISO/IEC 14496-12 §8.2.2 mvhd, §8.3.2
    tkhd, §8.6.1.2 stts; GIF89a §20/§23)."""
    d = F.col("doc_id")
    v = d % 6
    w = (d % 200 + 3).cast("long")
    h = (d % 120 + 2).cast("long")
    nf_gif = (d % 5 + 2).cast("int")
    delay_cs = (d % 20 + 1).cast("long")
    nf_trunc = (d % 3 + 1).cast("int")
    w4 = (d % 640 + 16).cast("long")
    h4 = (d % 360 + 16).cast("long")
    ts0 = ((d % 4 + 1) * 1000).cast("long")
    dur0 = (d % 9000 + 1000).cast("long")
    nf_mp4 = (d % 50 + 1).cast("long")
    ts1 = ((d % 3 + 1) * 600).cast("long")
    dur1 = (d % 250000 + 600).cast("long")

    # --- GIF pieces ---
    # logical screen descriptor; variant 0 carries a 2-entry GCT
    gif_hdr = F.concat(F.lit("474946383961"), _le16(w), _le16(h))
    gct = F.lit("800000000000FFFFFF")   # flags 0x80 | bg | aspect | 6-byte GCT
    no_gct = F.lit("000000")
    # GCE (delay planted) + image descriptor (full cover, no LCT) +
    # LZW min code + one 2-byte data sub-block + terminator
    frame_unit = F.concat(
        F.lit("21F90400"), _le16(delay_cs), F.lit("0000"),
        F.lit("2C00000000"), _le16(w), _le16(h), F.lit("00"),
        F.lit("02"), F.lit("024C01"), F.lit("00"),
    )
    gif_anim = F.concat(gif_hdr, gct,
                        F.repeat(frame_unit, nf_gif), F.lit("3B"))
    # static: one frame with a LOCAL color table (iflags 0x80), no GCE
    gif_static = F.concat(
        gif_hdr, no_gct,
        F.lit("2C00000000"), _le16(w), _le16(h), F.lit("80"),
        F.lit("000000FFFFFF"), F.lit("02"), F.lit("024C01"), F.lit("00"),
        F.lit("3B"),
    )
    # truncated: complete frames, then a descriptor whose first data
    # sub-block claims 5 bytes with only 2 present and no terminator
    gif_trunc = F.concat(
        gif_hdr, no_gct, F.repeat(frame_unit, nf_trunc),
        F.lit("2C00000000"), _le16(w), _le16(h), F.lit("00"),
        F.lit("02"), F.lit("054C01"),
    )

    # --- MP4 pieces (fixed-size boxes, planted values) ---
    ftyp = F.lit("000000106674797069736F6D00000000")
    mvhd_v0 = F.concat(F.lit("0000001C6D766864"), F.lit("00000000"),
                       F.lit("0000000000000000"), _be32(ts0), _be32(dur0))
    tkhd_video = F.concat(
        F.lit("0000005C746B6864"), F.lit("00000007"),
        F.lit("0000000000000000"), F.lit("00000001"), F.lit("00000000"),
        F.lit("00000000"), F.lit("0000000000000000"),
        F.lit("0000000000000000"),   # layer/alt-group/volume/reserved
        F.lit("000100000000000000000000000000000001000000000000"
              "000000000000000040000000"),  # unity matrix
        _be16(w4), F.lit("0000"), _be16(h4), F.lit("0000"),
    )
    stts = F.concat(F.lit("0000001873747473"), F.lit("00000000"),
                    F.lit("00000001"), _be32(nf_mp4), F.lit("00000400"))
    stbl = F.concat(F.lit("000000207374626C"), stts)
    minf = F.concat(F.lit("000000286D696E66"), stbl)
    mdia = F.concat(F.lit("000000306D646961"), minf)
    trak_video = F.concat(F.lit("000000947472616B"), tkhd_video, mdia)
    moov_v0 = F.concat(F.lit("000000B86D6F6F76"), mvhd_v0, trak_video)
    mp4_faststart = F.concat(ftyp, moov_v0)

    mdat = F.lit("000000106D646174DEADBEEFDEADBEEF")
    mvhd_v1 = F.concat(F.lit("000000286D766864"), F.lit("01000000"),
                       F.lit("0000000000000000"), F.lit("0000000000000000"),
                       _be32(ts1), F.lit("00000000"), _be32(dur1))
    tkhd_audio = F.concat(
        F.lit("0000005C746B6864"), F.lit("00000007"),
        F.lit("0000000000000000"), F.lit("00000002"), F.lit("00000000"),
        F.lit("00000000"), F.lit("0000000000000000"),
        F.lit("0000000000000000"),
        F.lit("000100000000000000000000000000000001000000000000"
              "000000000000000040000000"),
        F.lit("00000000"), F.lit("00000000"),   # 0x0: not a video track
    )
    trak_audio = F.concat(F.lit("000000647472616B"), tkhd_audio)
    moov_v1 = F.concat(F.lit("000000946D6F6F76"), mvhd_v1, trak_audio)
    mp4_moov_last = F.concat(ftyp, mdat, moov_v1)

    mvhd_ts0 = F.concat(F.lit("0000001C6D766864"), F.lit("00000000"),
                        F.lit("0000000000000000"), F.lit("00000000"),
                        _be32((d % 1000).cast("long")))
    mp4_zero_ts = F.concat(ftyp, F.lit("000000246D6F6F76"), mvhd_ts0)

    hexstr = (
        F.when(v == 0, gif_anim)
        .when(v == 1, gif_static)
        .when(v == 2, mp4_faststart)
        .when(v == 3, mp4_moov_last)
        .when(v == 4, gif_trunc)
        .otherwise(mp4_zero_ts)
    )
    # spread before construction — same single-split rationale as
    # _media_corpus (the GIF/MP4 box walk downstream is CPU-dense).
    return (
        spread(load(spark, "documents", sf_dir).select("doc_id"), key="doc_id", factor=0.25)
        .select("doc_id", F.unhex(hexstr).alias("media"))
    )


def media_animation_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certificate for the animation-routing metadata layer
    (with_gif_metadata + with_mp4_metadata — VERDICT r12 item 3, the
    last pytest-only routing operators): Spark walks REAL GIF block
    streams and ISO-BMFF box trees built per row and aggregates the
    RECOVERED frame counts / durations / dimensions per planted
    variant; the oracle aggregates the planted arithmetic directly.
    A wrong GCE delay offset, a missed sub-block skip, counting an
    incomplete frame, a wrong mvhd v0/v1 field width, a missed
    mdat skip, treating an audio trak as video, or a div-by-zero on
    timescale=0 each breaks the hash."""
    from goconnect_spark.operators.multimodal import (
        with_gif_metadata,
        with_mp4_metadata,
    )

    df = with_mp4_metadata(with_gif_metadata(
        parse_media_headers(_animation_corpus(spark, sf_dir))))
    m = F.col("media_meta")
    return (
        df.groupBy((F.col("doc_id") % 6).cast("int").alias("variant"),
                   m["format"].alias("format"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(m["n_frames"]).alias("n_with_frames"),
            F.sum(m["n_frames"].cast("long")).alias("sum_frames"),
            F.count(m["duration_ms"]).alias("n_with_duration"),
            F.sum(m["duration_ms"]).alias("sum_duration_ms"),
            F.sum(m["width"].cast("long")).alias("sum_width"),
            F.sum(m["height"].cast("long")).alias("sum_height"),
        )
        .orderBy("variant")
    )


_MEDIA_ANIMATION_SQL = """
WITH planted AS (
    SELECT CAST(doc_id % 6 AS INT) AS variant,
           doc_id % 200 + 3 AS w,
           doc_id % 120 + 2 AS h,
           doc_id % 5 + 2 AS nf_gif,
           doc_id % 20 + 1 AS delay_cs,
           doc_id % 3 + 1 AS nf_trunc,
           doc_id % 640 + 16 AS w4,
           doc_id % 360 + 16 AS h4,
           (doc_id % 4 + 1) * 1000 AS ts0,
           doc_id % 9000 + 1000 AS dur0,
           doc_id % 50 + 1 AS nf_mp4,
           (doc_id % 3 + 1) * 600 AS ts1,
           doc_id % 250000 + 600 AS dur1
    FROM documents
), c AS (
    SELECT variant,
           CASE WHEN variant IN (0, 1, 4) THEN 'gif' ELSE 'mp4' END AS format,
           CASE WHEN variant = 0 THEN nf_gif
                WHEN variant = 1 THEN 1
                WHEN variant = 2 THEN nf_mp4
                WHEN variant = 4 THEN nf_trunc END AS n_frames,
           CASE WHEN variant = 0 THEN nf_gif * delay_cs * 10
                WHEN variant = 2 THEN dur0 * 1000 // ts0
                WHEN variant = 3 THEN dur1 * 1000 // ts1
                WHEN variant = 4 THEN nf_trunc * delay_cs * 10
                END AS duration_ms,
           CASE WHEN variant IN (0, 1, 4) THEN w
                WHEN variant = 2 THEN w4 END AS width,
           CASE WHEN variant IN (0, 1, 4) THEN h
                WHEN variant = 2 THEN h4 END AS height
    FROM planted
)
SELECT variant, format,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(n_frames) AS BIGINT) AS n_with_frames,
       CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
       CAST(COUNT(duration_ms) AS BIGINT) AS n_with_duration,
       CAST(SUM(duration_ms) AS BIGINT) AS sum_duration_ms,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(height) AS BIGINT) AS sum_height
FROM c
GROUP BY variant, format
ORDER BY variant
"""


def _samples_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media): one MP4 per document row whose SAMPLE TABLES
    (stsz/stsc/stco|co64, ISO/IEC 14496-12 §8.7) locate planted
    constant-fill payload bytes inside a real mdat — the demuxer-lite
    ground truth for parse_media_headers -> sample_frames routing.
    Variant = doc_id % 4:
      0 per-sample stsz (4 planted sizes) split 3+1 across TWO chunks
        by stsc runs, u32 stco — certifies run expansion and the
        within-chunk size-prefix offset arithmetic
      1 FIXED-size stsz (sample_size=fx, count n1 = doc_id%6+2, no
        table) — certifies the fixed-size path
      2 co64 64-bit chunk offsets — certifies the wide-offset branch
      3 moov-LAST: the mdat (and every sample offset) sits BEFORE the
        moov that describes it — certifies offsets are absolute file
        positions, not moov-relative
    Sample i of a row is (doc_id + 17i) % 251 repeated size_i times,
    samples contiguous in the mdat: any off-by-one in offset/size
    arithmetic bleeds into a neighbor's different fill byte and fails
    the payload check."""
    d = F.col("doc_id")
    v = d % 4
    w4 = (d % 640 + 16).cast("long")
    h4 = (d % 360 + 16).cast("long")
    fx = (d % 5 + 2).cast("long")           # variant-1 fixed sample size
    n1 = (d % 6 + 2).cast("int")            # variant-1 sample count (2..7)
    s = [((d + 3 * i) % 7 + 1).cast("long") for i in range(4)]
    fill = [((d + 17 * i) % 251).cast("long") for i in range(7)]

    ftyp = F.lit("000000106674797069736F6D00000000")
    mvhd = F.lit("0000001C6D766864" "00000000" "0000000000000000"
                 "000003E8" "00002710")
    tkhd = F.concat(
        F.lit("0000005C746B6864" "00000007" "0000000000000000"
              "00000001" "00000000" "00000000" "0000000000000000"
              "0000000000000000"
              "000100000000000000000000000000000001000000000000"
              "000000000000000040000000"),
        _be16(w4), F.lit("0000"), _be16(h4), F.lit("0000"),
    )

    def boxes(stbl_inner_hex, stbl_size, minf_size, mdia_size, trak_size,
              moov_size):
        stbl = F.concat(_be32(F.lit(stbl_size)), F.lit("7374626C"),
                        stbl_inner_hex)
        minf = F.concat(_be32(F.lit(minf_size)), F.lit("6D696E66"), stbl)
        mdia = F.concat(_be32(F.lit(mdia_size)), F.lit("6D646961"), minf)
        trak = F.concat(_be32(F.lit(trak_size)), F.lit("7472616B"), tkhd,
                        mdia)
        return F.concat(_be32(F.lit(moov_size)), F.lit("6D6F6F76"), mvhd,
                        trak)

    def stts(count_col):
        return F.concat(F.lit("0000001873747473" "00000000" "00000001"),
                        _be32(count_col), F.lit("00000400"))

    stsz4 = F.concat(F.lit("000000247374737A" "00000000" "00000000"
                           "00000004"),
                     _be32(s[0]), _be32(s[1]), _be32(s[2]), _be32(s[3]))
    pay4 = F.concat(*[F.repeat(_hx2(fill[i]), s[i].cast("int"))
                      for i in range(4)])
    total4 = s[0] + s[1] + s[2] + s[3]

    # --- variant 0: two chunks (3 + 1 samples), u32 stco ---
    stsc_2runs = F.lit("0000002873747363" "00000000" "00000002"
                       "00000001" "00000003" "00000001"
                       "00000002" "00000001" "00000001")
    stco_2 = F.concat(F.lit("000000187374636F" "00000000" "00000002"),
                      _be32(F.lit(308)), _be32(F.lit(308) + s[0] + s[1] + s[2]))
    moov0 = boxes(F.concat(stsz4, stsc_2runs, stco_2, stts(F.lit(4))),
                  132, 140, 148, 248, 284)
    mp4_v0 = F.concat(ftyp, moov0, _be32(total4 + 8), F.lit("6D646174"),
                      pay4)

    # --- variant 1: fixed-size stsz, one chunk ---
    stsz_fixed = F.concat(F.lit("000000147374737A" "00000000"),
                          _be32(fx), _be32(n1.cast("long")))
    stsc_1run_n = F.concat(F.lit("0000001C73747363" "00000000" "00000001"
                                 "00000001"),
                           _be32(n1.cast("long")), F.lit("00000001"))
    stco_1 = F.concat(F.lit("000000147374636F" "00000000" "00000001"),
                      _be32(F.lit(276)))
    moov1 = boxes(F.concat(stsz_fixed, stsc_1run_n, stco_1,
                           stts(n1.cast("long"))),
                  100, 108, 116, 216, 252)
    pay_fixed7 = F.concat(*[F.repeat(_hx2(fill[i]), fx.cast("int"))
                            for i in range(7)])
    pay1 = F.substring(pay_fixed7, 1, (n1.cast("long") * fx * 2).cast("int"))
    mp4_v1 = F.concat(ftyp, moov1, _be32(n1.cast("long") * fx + 8),
                      F.lit("6D646174"), pay1)

    # --- variant 2: co64 wide offsets, one chunk of 4 ---
    stsc_1run_4 = F.lit("0000001C73747363" "00000000" "00000001"
                        "00000001" "00000004" "00000001")
    co64_1 = F.concat(F.lit("00000018636F3634" "00000000" "00000001"
                            "00000000"), _be32(F.lit(296)))
    moov2 = boxes(F.concat(stsz4, stsc_1run_4, co64_1, stts(F.lit(4))),
                  120, 128, 136, 236, 272)
    mp4_v2 = F.concat(ftyp, moov2, _be32(total4 + 8), F.lit("6D646174"),
                      pay4)

    # --- variant 3: moov-LAST (mdat first, offsets point backward) ---
    stco_back = F.concat(F.lit("000000147374636F" "00000000" "00000001"),
                         _be32(F.lit(24)))
    moov3 = boxes(F.concat(stsz4, stsc_1run_4, stco_back, stts(F.lit(4))),
                  116, 124, 132, 232, 268)
    mp4_v3 = F.concat(ftyp, _be32(total4 + 8), F.lit("6D646174"), pay4,
                      moov3)

    hexstr = (
        F.when(v == 0, mp4_v0)
        .when(v == 1, mp4_v1)
        .when(v == 2, mp4_v2)
        .otherwise(mp4_v3)
    )
    # spread before construction — same single-split rationale as
    # _media_corpus (the demuxer mapInPandas fan-out downstream ran in
    # a single Python worker on the unspread scan).
    return (
        spread(load(spark, "documents", sf_dir).select("doc_id"), key="doc_id", factor=0.25)
        .select("doc_id", F.unhex(hexstr).alias("media"))
    )


def media_mp4_sample_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certificate for the demuxer-lite sample-extraction layer
    (parse_mp4_video_samples through the sample_frames fan-out — the
    last pytest-only stage of the media routing stack): Spark demuxes
    REAL sample tables built per row and the emitted frame PAYLOADS
    are checked byte-for-byte against the planted constant fills (a
    wrong chunk offset, run expansion, size-prefix sum, co64 width,
    or moov-relative-instead-of-absolute offset bleeds into a
    neighboring sample's different fill and zeroes n_payload_ok); the
    oracle expands the planted arithmetic. n_payload_ok == n_frames
    on every variant row is the certificate."""
    from goconnect_spark.operators.multimodal import sample_frames

    frames = sample_frames(_samples_corpus(spark, sf_dir),
                           media_col="media", id_col="doc_id")
    mid = F.col("media_id")
    idx = F.col("frame_idx")
    variant = (mid % 4).cast("int")
    exp_size = F.when(variant == 1, mid % 5 + 2).otherwise(
        (mid + 3 * idx) % 7 + 1)
    exp_hex = F.repeat(_hx2((mid + 17 * idx) % 251), exp_size.cast("int"))
    ok = (F.length("frame") == exp_size) & (F.hex("frame") == exp_hex)
    return (
        frames.groupBy(variant.alias("variant"))
        .agg(
            F.countDistinct("media_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(idx.cast("long")).alias("sum_frame_idx"),
            F.sum(F.length("frame").cast("long")).alias("sum_len"),
            F.sum(ok.cast("long")).alias("n_payload_ok"),
        )
        .orderBy("variant")
    )


_MEDIA_SAMPLES_SQL = """
WITH p AS (
    SELECT doc_id, CAST(doc_id % 4 AS INT) AS variant,
           CASE WHEN doc_id % 4 = 1 THEN doc_id % 6 + 2 ELSE 4 END AS n,
           doc_id % 5 + 2 AS fx
    FROM documents
), f AS (
    SELECT doc_id, variant, fx, unnest(range(0, n)) AS frame_idx
    FROM p
)
SELECT variant,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(frame_idx) AS BIGINT) AS sum_frame_idx,
       CAST(SUM(CASE WHEN variant = 1 THEN fx
                     ELSE (doc_id + 3 * frame_idx) % 7 + 1 END) AS BIGINT)
         AS sum_len,
       CAST(COUNT(*) AS BIGINT) AS n_payload_ok
FROM f
GROUP BY variant
ORDER BY variant
"""


QUERIES = {
    "media_classify_counts": media_classify_counts,
    "media_jpeg_dims_profile": media_jpeg_dims_profile,
    "media_animation_metadata": media_animation_metadata,
    "media_mp4_sample_ranges": media_mp4_sample_ranges,
}

ORACLE = {
    "media_classify_counts": _MEDIA_CLASSIFY_SQL,
    "media_jpeg_dims_profile": _MEDIA_JPEG_SQL,
    "media_animation_metadata": _MEDIA_ANIMATION_SQL,
    "media_mp4_sample_ranges": _MEDIA_SAMPLES_SQL,
}
