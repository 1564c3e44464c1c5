"""Multimodal column plumbing: schema, batching, 1->N frame fan-out.
The codec is stubbed (no PIL/av in the container) — these tests pin
the Spark-side contract that a real decoder would plug into."""

import pyspark.sql.functions as F
import pytest

from goconnect_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_meta,
    extract_features,
    media_repartition,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes([i % 251]) * (500 + 137 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    return attach_meta(df, kind="image", fmt="png")


def test_meta_schema(media_df):
    assert media_df.schema["media_meta"].dataType.simpleString() == MEDIA_META_SCHEMA


def test_extract_features_deterministic(spark, media_df):
    out1 = {r.media_id: (r.content_hash, r.features) for r in extract_features(media_df).collect()}
    out2 = {r.media_id: (r.content_hash, r.features) for r in extract_features(media_df).collect()}
    assert out1 == out2
    assert len(out1) == 20
    # features are normalized byte histograms
    for _, feats in out1.values():
        assert len(feats) == 8 and abs(sum(feats) - 1.0) < 1e-3


def test_extract_features_real_decode_is_stubbed(media_df):
    with pytest.raises(NotImplementedError, match="PIL|torchaudio|av"):
        extract_features(media_df, decode_stub=False)


def test_sample_frames_fan_out(media_df):
    frames = sample_frames(media_df, every_n_bytes=512, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(20))
    for rows in by_id.values():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(len(idxs)))  # contiguous frame indices
        assert all(len(r.frame) <= 512 for r in rows)


def test_media_repartition_targets_bytes(media_df):
    df = media_repartition(media_df, target_bytes=5000)
    assert df.rdd.getNumPartitions() >= 2


def _png(w, h):
    """A real minimal PNG: signature + IHDR chunk (+ empty IEND)."""
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return b"\x89PNG\r\n\x1a\n" + chunk + iend


def _wav(sample_rate, channels):
    """A real canonical 44-byte WAV header (PCM, no data)."""
    import struct

    byte_rate = sample_rate * channels * 2
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data" + struct.pack("<I", 0)
    )


def test_parse_media_headers_real_containers(spark):
    """Header metadata extraction is REAL: genuine PNG/WAV bytes parse
    to their true dimensions/sample rates via pure column exprs."""
    from goconnect_spark.operators.multimodal import parse_media_headers

    rows = [
        (1, _png(640, 480)),
        (2, _png(16, 4096)),
        (3, _wav(44100, 2)),
        (4, _wav(16000, 1)),
        (5, b"\xff\xd8\xff\xe0 jpeg-ish"),
        (6, b"plain bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r.media_id: r.media_meta for r in parse_media_headers(df).collect()}
    assert (out[1].format, out[1].width, out[1].height, out[1].kind) == ("png", 640, 480, "image")
    assert (out[2].width, out[2].height) == (16, 4096)
    assert (out[3].format, out[3].sample_rate, out[3].n_channels, out[3].kind) == ("wav", 44100, 2, "audio")
    assert (out[4].sample_rate, out[4].n_channels) == (16000, 1)
    assert out[4].n_bytes == 44 and out[4].n_frames is None
    assert (out[5].format, out[5].kind) == ("jpeg", "image")
    assert out[6].format == "unknown" and out[6].width is None


def test_parse_media_headers_stays_jvm_side(spark):
    from goconnect_spark.operators.multimodal import parse_media_headers

    df = spark.createDataFrame([(1, _png(2, 2))], "media_id long, media binary")
    plan = parse_media_headers(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
