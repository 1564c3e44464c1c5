"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media are opaque `binary` columns travelling beside a typed
metadata struct — the schema any 100 TB multimodal corpus uses:

    media        BINARY                     -- raw encoded bytes
    media_meta   STRUCT<kind: STRING,       -- image|audio|video
                        format: STRING,     -- png|jpeg|wav|mp4|...
                        width: INT, height: INT,
                        sample_rate: INT, n_channels: INT,
                        n_frames: INT, duration_ms: LONG,
                        n_bytes: LONG>

Decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas UDFs over mapInPandas — the Spark-side plumbing (schema,
batching, partition sizing) is real and tested; the codec itself is
stubbed (this container ships no PIL/ffmpeg): `decode_stub=True`
produces a deterministic fake decode, otherwise NotImplementedError
names the dependency. Swapping the stub for PIL/libav turns these
into production operators without touching any Spark code.

Scale notes: mapInPandas streams Arrow batches, so peak executor
memory is one batch of decoded media, not one partition.
`media_repartition` targets bytes-per-partition (binary payloads make
row-count partitioning meaningless — 10k rows can be 40 GB).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "struct<kind:string,format:string,width:int,height:int,"
    "sample_rate:int,n_channels:int,n_frames:int,duration_ms:bigint,"
    "n_bytes:bigint>"
)

_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_hash string, "
    "features array<float>"
)

_FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def attach_meta(df: DataFrame, media_col: str = "media", kind: str = "image",
                fmt: str = "png") -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(media_col).cast("bigint").alias("n_bytes"),
        ),
    )


def _be_u32(col: F.Column, pos: int) -> F.Column:
    """Big-endian u32 at 1-based byte offset `pos` of a binary col."""
    return F.conv(F.hex(F.substring(col, pos, 4)), 16, 10).cast("long")


def _le_u32(col: F.Column, pos: int) -> F.Column:
    """Little-endian u32 at 1-based byte offset `pos`."""
    b = [F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("long") for i in range(4)]
    return b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216


def _le_u16(col: F.Column, pos: int) -> F.Column:
    b = [F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("long") for i in range(2)]
    return b[0] + b[1] * 256


def parse_media_headers(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL (not stubbed) container-header metadata extraction as pure
    column expressions over the binary payload — no codec library:

    - PNG:  signature 89 50 4E 47 0D 0A 1A 0A; IHDR is always the
            first chunk, so width/height are the big-endian u32s at
            byte offsets 16/20 (PNG spec §5.3, §11.2.2).
    - WAV:  'RIFF' .... 'WAVE'; in the canonical layout the 'fmt '
            chunk follows at offset 12, with channels (LE u16 @22)
            and sample rate (LE u32 @24) (RIFF/WAVE spec).
    - JPEG: FF D8 FF signature — format detection only (dimensions
            live in variable-position SOF markers; a real pipeline
            scans them in the decode UDF).

    Everything is whole-stage-codegen Spark SQL (substring/conv/hex),
    so header classification of a 100 TB corpus never leaves the JVM
    and reads only the leading bytes of each blob. Overwrites
    `media_meta` with the parsed struct."""
    c = F.col(media_col)
    is_png = F.hex(F.substring(c, 1, 8)) == "89504E470D0A1A0A"
    is_wav = (F.hex(F.substring(c, 1, 4)) == "52494646") & (
        F.hex(F.substring(c, 9, 4)) == "57415645"
    )
    is_jpeg = F.hex(F.substring(c, 1, 3)) == "FFD8FF"
    fmt = (
        F.when(is_png, "png").when(is_wav, "wav").when(is_jpeg, "jpeg").otherwise("unknown")
    )
    kind = (
        F.when(is_png | is_jpeg, "image").when(is_wav, "audio").otherwise("unknown")
    )
    width = F.when(is_png, _be_u32(c, 17)).cast("int")
    height = F.when(is_png, _be_u32(c, 21)).cast("int")
    sample_rate = F.when(is_wav, _le_u32(c, 25)).cast("int")
    n_channels = F.when(is_wav, _le_u16(c, 23)).cast("int")
    return df.withColumn(
        "media_meta",
        F.struct(
            kind.alias("kind"),
            fmt.alias("format"),
            width.alias("width"),
            height.alias("height"),
            sample_rate.alias("sample_rate"),
            n_channels.alias("n_channels"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(media_col).cast("bigint").alias("n_bytes"),
        ),
    )


def media_repartition(df: DataFrame, media_col: str = "media",
                      target_bytes: int = 256 * 1024 * 1024) -> DataFrame:
    """Repartition so each partition carries ~target_bytes of media.
    At 100 TB this is the difference between 400k balanced decode
    tasks and a handful of OOMing ones."""
    total = df.agg(F.sum(F.length(media_col))).collect()[0][0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def _fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a codec: byte-histogram features.
    Replaceable by a real decoder with the same signature."""
    if data is None:
        return [0.0] * dim
    buckets = [0] * dim
    for b in data:
        buckets[b % dim] += 1
    n = max(1, len(data))
    return [round(c / n, 6) for c in buckets]


def extract_features(df: DataFrame, media_col: str = "media",
                     id_col: str = "media_id", decode_stub: bool = True,
                     dim: int = 8) -> DataFrame:
    """media bytes -> feature vector via Arrow-batched mapInPandas.

    With decode_stub=False this is where PIL/torchaudio decode would
    run; the container has neither, so it raises NotImplementedError
    naming the gap (per-operator stub contract)."""
    import hashlib

    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/torchaudio/av which are not "
            "installed; pass decode_stub=True for the deterministic fake"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": pdf["media_meta"].map(lambda m: m["kind"] if m else None),
                    "n_bytes": pdf[media_col].map(lambda b: 0 if b is None else len(b)),
                    "content_hash": pdf[media_col].map(
                        lambda b: hashlib.md5(bytes(b or b"")).hexdigest()
                    ),
                    "features": pdf[media_col].map(lambda b: _fake_decode(bytes(b or b""), dim)),
                }
            )
            yield out

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, media_col: str = "media",
                  id_col: str = "media_id", every_n_bytes: int = 1024,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: 1 row in -> N frame rows out through
    mapInPandas (video frame extraction shape). The stub slices the
    byte stream; a real build would demux with av."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                data = bytes(data or b"")
                for k in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(data[k * every_n_bytes : (k + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=_FRAME_SCHEMA)
