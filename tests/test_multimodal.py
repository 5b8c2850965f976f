"""Multimodal column plumbing: decode stub, blob partitioning, frame
sampling."""

import os

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


def test_webdataset_roundtrip(spark, tmp_path):
    """WebDataset sink/reader: rows shard deterministically, members
    name <key>.<ext>, binary and text columns round-trip byte-exact,
    nulls skip their member."""
    from sling_cli_spark.sinks.wds import read_webdataset, write_webdataset

    d = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [(1, "hello", b"\x00\x01"), (2, "world", None),
         (3, None, b"zz"), (4, "x", b"y")],
        "doc_id long, text string, blob binary")
    out = write_webdataset(
        df, d, "doc_id", {"text": "txt", "blob": "bin"}, shards=2)
    stats = {r["shard"]: r for r in out.collect()}
    assert sum(r["n_samples"] for r in stats.values()) == 4
    assert all(r["path"].endswith(".tar") for r in stats.values())

    back = read_webdataset(spark, d)
    got = {(r["key"], r["ext"]): bytes(r["data"]) for r in back.collect()}
    assert got == {
        ("1", "txt"): b"hello", ("1", "bin"): b"\x00\x01",
        ("2", "txt"): b"world",
        ("3", "bin"): b"zz",
        ("4", "txt"): b"x", ("4", "bin"): b"y",
    }
    # determinism: a second write produces byte-identical shards
    import hashlib
    d2 = str(tmp_path / "wds2")
    write_webdataset(df, d2, "doc_id", {"text": "txt", "blob": "bin"},
                     shards=2)
    for n in sorted(os.listdir(d)):
        h1 = hashlib.md5(open(os.path.join(d, n), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(d2, n), "rb").read()).hexdigest()
        assert h1 == h2
