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
