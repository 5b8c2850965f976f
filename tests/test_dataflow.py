"""Dataflow utility operators: map/chunk/collect."""

from pyspark.sql import Row

from sling_cli_spark.operators.dataflow import (
    chunk, collect_rows, map_columns)


def test_map_columns(spark):
    df = spark.createDataFrame([Row(a=2, b=3)])
    out = map_columns(df, {"c": "a * b", "a": "a + 10"}).collect()[0]
    assert out["c"] == 6 and out["a"] == 12


def test_chunk_partitions(spark):
    df = spark.range(100)
    assert chunk(df, 7).rdd.getNumPartitions() == 7


def test_chunk_by_key_colocates(spark):
    df = spark.createDataFrame([Row(k=i % 3, v=i) for i in range(30)])
    parts = chunk(df, 3, by=["k"]).rdd \
        .mapPartitions(lambda it: [set(r["k"] for r in it)]).collect()
    seen = [p for p in parts if p]
    # each key lives in exactly one partition
    all_keys = [k for p in seen for k in p]
    assert len(all_keys) == len(set(all_keys))


def test_collect_rows_capped(spark):
    df = spark.range(1000)
    assert len(collect_rows(df, limit=50)) == 50
