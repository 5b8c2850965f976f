"""As-of join, batch sessionization, stateful streaming sessionization."""

import datetime
import json
import os

import pytest
from pyspark.sql import Row

from sling_cli_spark.operators.asof import asof_join, sessionize


def _sides(spark):
    left = spark.createDataFrame([
        Row(k="a", t=5, lv="l5"), Row(k="a", t=10, lv="l10"),
        Row(k="b", t=7, lv="l7")])
    right = spark.createDataFrame([
        Row(k="a", t=3, rv="r3"), Row(k="a", t=8, rv="r8"),
        Row(k="b", t=9, rv="r9")])
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = {(r["k"], r["t"]): r["r_rv"]
           for r in asof_join(left, right, "k", "t").collect()}
    assert out == {("a", 5): "r3", ("a", 10): "r8", ("b", 7): None}


def test_asof_forward(spark):
    left, right = _sides(spark)
    out = {(r["k"], r["t"]): r["r_rv"]
           for r in asof_join(left, right, "k", "t",
                              direction="forward").collect()}
    assert out == {("a", 5): "r8", ("a", 10): None, ("b", 7): "r9"}


def test_asof_equal_time_matches(spark):
    left = spark.createDataFrame([Row(k="a", t=8)])
    right = spark.createDataFrame([Row(k="a", t=8, rv="r8")])
    out = asof_join(left, right, "k", "t").collect()[0]
    assert out["r_rv"] == "r8"


def test_sessionize_numeric_gap(spark):
    df = spark.createDataFrame([
        Row(u=1, t=0.0), Row(u=1, t=10.0), Row(u=1, t=200.0),
        Row(u=2, t=5.0)])
    out = sessionize(df, "u", "t", gap=60)
    got = {(r["u"], r["t"]): r["session_id"] for r in out.collect()}
    assert got == {(1, 0.0): 1, (1, 10.0): 1, (1, 200.0): 2, (2, 5.0): 1}


def test_sessionize_timestamps(spark):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame([
        Row(u=1, ts=base),
        Row(u=1, ts=base + datetime.timedelta(minutes=10)),
        Row(u=1, ts=base + datetime.timedelta(hours=3)),
    ])
    out = sessionize(df, "u", "ts", gap="1 hour")
    assert [r["session_id"] for r in out.orderBy("ts").collect()] == [1, 1, 2]


def test_streaming_sessionize(spark, tmp_path):
    from pyspark.sql import types as T
    from sling_cli_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [
        {"user_id": 1, "ts_sec": 0.0}, {"user_id": 1, "ts_sec": 100.0},
        {"user_id": 1, "ts_sec": 5000.0},   # closes session 1 (gap>1800)
        {"user_id": 2, "ts_sec": 50.0},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_sec", T.DoubleType())])
    import time

    stream = spark.readStream.schema(schema).json(src)
    sessions = sessionize_stream(stream, gap_seconds=1800.0)
    # ProcessingTimeTimeout keeps scheduling batches to fire idle-session
    # timeouts, so neither availableNow nor processAllAvailable ever
    # returns — poll the sink for the expected row, then stop
    q = sessions.writeStream.format("memory").queryName("sess_out") \
        .outputMode("append") \
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    want = (1, 0.0, 100.0, 2)
    got = set()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and want not in got:
            time.sleep(2)
            got = {(r["user_id"], r["session_start"], r["session_end"],
                    r["n_events"])
                   for r in spark.sql("SELECT * FROM sess_out").collect()}
    finally:
        q.stop()
    # only user 1's first session closed within the batch
    assert want in got


def test_streaming_sessionize_no_timeout_available_now(spark, tmp_path):
    """r14: timeout_conf="none" lets an availableNow run TERMINATE (with
    any processing-time timeout registered, Spark schedules no-data
    batches forever) and, when a flush event closes every session, emits
    the identical row set."""
    from pyspark.sql import types as T
    from sling_cli_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [
        {"user_id": 1, "ts_sec": 0.0}, {"user_id": 1, "ts_sec": 100.0},
        {"user_id": 1, "ts_sec": 5000.0},   # closes session 1 (gap>1800)
        {"user_id": 2, "ts_sec": 50.0},
        # flush: far-future event per user closes the open sessions
        {"user_id": 1, "ts_sec": 1e12}, {"user_id": 2, "ts_sec": 1e12},
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_sec", T.DoubleType())])
    stream = spark.readStream.schema(schema).json(src)
    sessions = sessionize_stream(stream, gap_seconds=1800.0,
                                 timeout_conf="none")
    q = sessions.writeStream.format("memory").queryName("sess_nt") \
        .outputMode("append") \
        .option("checkpointLocation", str(tmp_path / "ckpt")) \
        .trigger(availableNow=True).start()
    terminated = q.awaitTermination(120)
    assert terminated, "availableNow + NoTimeout must self-terminate"
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"])
           for r in spark.sql("SELECT * FROM sess_nt").collect()}
    assert got == {(1, 0.0, 100.0, 2), (1, 5000.0, 5000.0, 1),
                   (2, 50.0, 50.0, 1)}


def test_stream_state_partitions_sizing(spark):
    """r14: size-derived stream state partitioning — floor 1, linear in
    source bytes, capped by the session shuffle setting."""
    from sling_cli_spark.streaming.tuning import (
        scoped_shuffle_partitions, stream_state_partitions)

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert stream_state_partitions(spark, 0) == 1
    assert stream_state_partitions(spark, 1) == 1
    assert stream_state_partitions(spark, 64 << 20) == min(1, cap) or \
        stream_state_partitions(spark, 64 << 20) == 1
    assert stream_state_partitions(spark, (64 << 20) + 1) == min(2, cap)
    assert stream_state_partitions(spark, 10 ** 18) == cap
    with scoped_shuffle_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == cap
