"""Multimodal column plumbing: decode stub, blob partitioning, frame
sampling."""

import pytest
from pyspark.sql import functions as F

from sling_cli_spark.operators.multimodal import (
    FEATURES_SCHEMA, decode_features, frame_sample_plan, make_fake_media,
    repartition_for_blobs)


def test_decode_features_schema_and_values(spark):
    media = make_fake_media(spark, n=10)
    feats = decode_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 10
    r0 = rows[0]
    assert r0["n_bytes"] == 64
    assert len(r0["features"]) == 16
    assert abs(sum(r0["features"]) - 1.0) < 1e-5  # L1-normalized histogram


def test_decode_features_deterministic(spark):
    media = make_fake_media(spark, n=5)
    a = {r["media_id"]: r["features"] for r in decode_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in decode_features(media).collect()}
    assert a == b


def test_decode_without_stub_raises(spark):
    media = make_fake_media(spark, n=2)
    with pytest.raises(Exception):  # NotImplementedError inside the task
        decode_features(media, decode_stub=False).collect()


def test_repartition_for_blobs(spark):
    media = make_fake_media(spark, n=50) \
        .withColumn("n_bytes", F.length("content").cast("long"))
    out = repartition_for_blobs(media, target_task_bytes=1000)
    # 50 blobs * ~100B ≈ 5KB -> ~6 partitions
    assert 2 <= out.rdd.getNumPartitions() <= 10
    assert out.count() == 50


def test_frame_sample_plan(spark):
    media = make_fake_media(spark, n=4)  # durations 1000..4000ms
    frames = frame_sample_plan(media, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    by_id = {r["media_id"]: r["count"] for r in per}
    # duration 1000 -> ts 0,1000 = 2 frames; 4000 -> 5 frames
    assert by_id[0] == 2 and by_id[3] == 5


def test_metadata_only_query_prunes_blob(spark):
    media = make_fake_media(spark, n=5)
    meta = media.select("media_id", "media_type", "duration_ms")
    assert "content" not in meta.columns
    assert meta.count() == 5
