"""Merge strategies (reference: core/dbio/templates/base.yaml:52-126,
core/sling/task_run_write.go:997-1179)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sling_cli_spark.operators.merge import (
    dedup_last, delete_missing, merge_change_capture, merge_delete_insert,
    merge_history_insert, merge_insert, merge_update, merge_update_insert)


def _frames(spark):
    target = spark.createDataFrame(
        [Row(id=1, v="t1"), Row(id=2, v="t2"), Row(id=3, v="t3")])
    src = spark.createDataFrame(
        [Row(id=2, v="s2"), Row(id=3, v="s3"), Row(id=4, v="s4")])
    return target, src


def _as_map(df):
    return {r["id"]: r["v"] for r in df.collect()}


def test_update_insert(spark):
    t, s = _frames(spark)
    assert _as_map(merge_update_insert(t, s, "id")) == \
        {1: "t1", 2: "s2", 3: "s3", 4: "s4"}


def test_insert_only(spark):
    t, s = _frames(spark)
    assert _as_map(merge_insert(t, s, "id")) == \
        {1: "t1", 2: "t2", 3: "t3", 4: "s4"}


def test_update_only(spark):
    t, s = _frames(spark)
    assert _as_map(merge_update(t, s, "id")) == \
        {1: "t1", 2: "s2", 3: "s3"}


def test_delete_insert(spark):
    t, s = _frames(spark)
    assert _as_map(merge_delete_insert(t, s, "id")) == \
        {1: "t1", 2: "s2", 3: "s3", 4: "s4"}


def test_history_insert_keeps_both(spark):
    t, s = _frames(spark)
    out = merge_history_insert(t, s, "id")
    assert out.count() == 6


def test_delete_missing(spark):
    t, s = _frames(spark)
    assert set(_as_map(delete_missing(t, s, "id"))) == {2, 3}


def test_dedup_last(spark):
    df = spark.createDataFrame([
        Row(id=1, seq=1, v="old"), Row(id=1, seq=2, v="new"),
        Row(id=2, seq=1, v="only")])
    out = {r["id"]: r["v"] for r in dedup_last(df, "id", "seq").collect()}
    assert out == {1: "new", 2: "only"}


def test_change_capture_applies_ops(spark):
    t = spark.createDataFrame(
        [Row(id=1, v="a", _sling_synced_op="I", _sling_synced_seq=0),
         Row(id=2, v="b", _sling_synced_op="I", _sling_synced_seq=0)])
    s = spark.createDataFrame(
        [Row(id=2, v="b2", _sling_synced_op="U", _sling_synced_seq=1),
         Row(id=1, v=None, _sling_synced_op="D", _sling_synced_seq=1)])
    out = merge_change_capture(t, s, "id")
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {2}           # id=1 hard-deleted
    assert rows[2]["v"] == "b2"


def test_composite_pk(spark):
    t = spark.createDataFrame([Row(a=1, b=1, v="t"), Row(a=1, b=2, v="t")])
    s = spark.createDataFrame([Row(a=1, b=2, v="s"), Row(a=2, b=1, v="s")])
    out = merge_update_insert(t, s, ["a", "b"])
    got = {(r["a"], r["b"]): r["v"] for r in out.collect()}
    assert got == {(1, 1): "t", (1, 2): "s", (2, 1): "s"}
