"""Regression tests for the round-4 advisory findings.

1. merge_iceberg partition prune: manifest partition values must be
   URL-unquoted and nulls must use the same __HIVE_DEFAULT_PARTITION__
   sentinel as the batch side — otherwise no candidate file matches and
   the merge silently APPENDS (duplicate PKs).
2. merge_delta partition prune: batch values must use Spark's
   cast-to-string form (boolean True -> "true"), not Python str().
3. _commit_with_retry must flag files ADDED since the merge's snapshot
   (a concurrent append may hold the batch's PKs), not only rewritten
   removes — delta-spark's ConcurrentAppendException semantics.
4. unwrap_debezium must drop Kafka tombstones (null value after a
   delete) instead of emitting a garbage op='I' row with a null PK.
5. `sling-spark pipeline` on a top-level-list YAML (the documented
   short form) — conditional-precedence bug made it raise.
"""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _assert_merged(spark, read_back, pk="id"):
    rows = {r[pk]: r for r in read_back.collect()}
    assert len(rows) == read_back.count(), "duplicate primary keys"
    return rows


# ---------------------------------------------------------------- iceberg

def test_iceberg_merge_prunes_with_null_and_escaped_partitions(
        spark, tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        merge_iceberg, read_iceberg, write_iceberg)

    t = str(tmp_path / "ice_null_part")
    df = spark.createDataFrame(
        [(1, None, "v1"), (2, "a:b", "v2"), (3, "plain", "v3")],
        "id int, cat string, v string")
    write_iceberg(df, t, partition_by=["cat"])

    # batch updates the null-partition row and the colon-partition row
    batch = spark.createDataFrame(
        [(1, None, "V1"), (2, "a:b", "V2")], "id int, cat string, v string")
    stats = merge_iceberg(spark, t, batch, "id")
    # the touched files MUST be found (pre-fix: prune missed them all
    # and the merge appended -> touched == 0 and 5 rows)
    assert stats["touched"] >= 1
    back = read_iceberg(spark, t)
    rows = _assert_merged(spark, back)
    assert rows[1]["v"] == "V1" and rows[2]["v"] == "V2"
    assert rows[3]["v"] == "v3"


# ------------------------------------------------------------------ delta

def test_delta_merge_prunes_boolean_partition(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        merge_delta, read_delta, write_delta)

    t = str(tmp_path / "delta_bool_part")
    df = spark.createDataFrame(
        [(1, True, "v1"), (2, False, "v2"), (3, True, "v3")],
        "id int, flag boolean, v string")
    write_delta(df, t, partition_by=["flag"])

    batch = spark.createDataFrame(
        [(1, True, "V1")], "id int, flag boolean, v string")
    stats = merge_delta(spark, t, batch, "id")
    assert stats["touched"] >= 1  # pre-fix: str(True)='True' never matched
    back = read_delta(spark, t)
    rows = _assert_merged(spark, back)
    assert rows[1]["v"] == "V1" and rows[2]["v"] == "v2"


def test_delta_merge_prunes_null_partition(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        merge_delta, read_delta, write_delta)

    t = str(tmp_path / "delta_null_part")
    df = spark.createDataFrame(
        [(1, None, "v1"), (2, "x", "v2")], "id int, cat string, v string")
    write_delta(df, t, partition_by=["cat"])
    batch = spark.createDataFrame(
        [(1, None, "V1")], "id int, cat string, v string")
    stats = merge_delta(spark, t, batch, "id")
    assert stats["touched"] >= 1
    rows = _assert_merged(spark, read_delta(spark, t))
    assert rows[1]["v"] == "V1"


def test_delta_merge_prunes_escaped_partition(spark, tmp_path):
    """A ':' in a partition value is Hive-escaped on disk (%3A) and
    percent-encoded again in _metadata.file_path URIs (%253A): the
    remove path must still match the log's literal relative path."""
    from sling_cli_spark.sources.delta_py import (
        merge_delta, read_delta, write_delta)

    t = str(tmp_path / "delta_esc_part")
    df = spark.createDataFrame(
        [(1, "a:b", "v1"), (2, "x", "v2")], "id int, cat string, v string")
    write_delta(df, t, partition_by=["cat"])
    batch = spark.createDataFrame(
        [(1, "a:b", "V1")], "id int, cat string, v string")
    stats = merge_delta(spark, t, batch, "id")
    assert stats["touched"] >= 1
    rows = _assert_merged(spark, read_delta(spark, t))
    assert rows[1]["v"] == "V1" and rows[2]["v"] == "v2"


def test_hive_partition_str_forms():
    from sling_cli_spark.sources.delta_py import (
        _HIVE_NULL, hive_partition_str)

    assert hive_partition_str(None) == _HIVE_NULL
    assert hive_partition_str(True) == "true"
    assert hive_partition_str(False) == "false"
    assert hive_partition_str(7) == "7"
    assert hive_partition_str("a b") == "a b"


def test_commit_retry_flags_concurrent_append(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        ConcurrentModificationError, _commit_with_retry, latest_version,
        replay_log, write_delta)

    t = str(tmp_path / "delta_conc_append")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_delta(df, t)
    _, read_files = replay_log(t)  # the snapshot "our merge" read

    # a concurrent writer appends AND claims the version we wanted
    claimed = latest_version(t) + 1
    write_delta(spark.createDataFrame([(9, "z")], "id int, v string"), t)

    # our merge-shaped commit (has a remove) must now refuse to retry
    # blindly: the appended file may hold our batch's PKs
    some_active = sorted(read_files)[0]
    actions = [
        {"remove": {"path": some_active, "deletionTimestamp": 0,
                    "dataChange": True}},
    ]
    with pytest.raises(ConcurrentModificationError, match="added"):
        _commit_with_retry(t, claimed, actions,
                           read_files=set(read_files))

    # without read_files (pure-append semantics) the retry still works
    v = _commit_with_retry(t, latest_version(t) + 1, [], read_files=None)
    assert v == latest_version(t)


# -------------------------------------------------------------- debezium

def test_unwrap_debezium_drops_tombstones(spark):
    from pyspark.sql import types as T

    from sling_cli_spark.streaming.cdc import unwrap_debezium

    row_schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])
    event = json.dumps({"before": None, "after": {"id": 1, "v": "a"},
                        "op": "c", "ts_ms": 10})
    delete = json.dumps({"before": {"id": 1, "v": "a"}, "after": None,
                         "op": "d", "ts_ms": 11})
    df = spark.createDataFrame(
        [Row(value=event), Row(value=delete), Row(value=None)],
        "value string")
    out = unwrap_debezium(df, row_schema).collect()
    # the tombstone (null value) must be gone; pre-fix it surfaced as an
    # all-null op='I' row with a null PK
    assert len(out) == 2
    assert {r["_sling_synced_op"] for r in out} == {"I", "D"}
    assert all(r["id"] == 1 for r in out)


# ------------------------------------------------------------------- cli

def test_pipeline_cli_accepts_top_level_list(spark, tmp_path, monkeypatch):
    from sling_cli_spark.__main__ import main

    monkeypatch.setenv("HOME", str(tmp_path))
    pipe = tmp_path / "pipe.yaml"
    pipe.write_text("- type: log\n  message: hello from a list\n")
    assert main(["pipeline", str(pipe)]) == 0
