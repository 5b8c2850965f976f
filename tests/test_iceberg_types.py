"""Iceberg nested + v3 variant types (spec §Schemas, v3 §Variant).

The reference reads Iceberg through DuckDB (core/dbio/iop/iceberg.go)
and flattens nested data via its JSON path; here nested struct/list/
map columns and the v3 variant type round-trip natively with
spec-conformant nested field ids.
"""

import json
import os

import pytest

from pyspark.sql import functions as F

from sling_cli_spark.sources.iceberg_py import (
    UnsupportedTableFeature, _current_metadata, _max_field_id,
    read_iceberg, write_iceberg)


def test_nested_types_round_trip_with_field_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1, 2, 3], {"k": 1.5}),
         (2, {"a": 2, "b": "y"}, [], {})],
        "id long, s struct<a: long, b: string>, arr array<long>, "
        "m map<string, double>")
    write_iceberg(df, path)
    _, meta = _current_metadata(path)
    schema = meta["schemas"][0]
    by_name = {f["name"]: f for f in schema["fields"]}
    # nested iceberg types recorded structurally, not stringified
    assert by_name["s"]["type"]["type"] == "struct"
    assert [sf["name"] for sf in by_name["s"]["type"]["fields"]] \
        == ["a", "b"]
    assert by_name["arr"]["type"]["type"] == "list"
    assert by_name["arr"]["type"]["element"] == "long"
    assert by_name["m"]["type"]["type"] == "map"
    # every id unique; last-column-id covers the nested ones
    ids = [f["id"] for f in schema["fields"]]
    ids += [sf["id"] for sf in by_name["s"]["type"]["fields"]]
    ids += [by_name["arr"]["type"]["element-id"],
            by_name["m"]["type"]["key-id"],
            by_name["m"]["type"]["value-id"]]
    assert len(ids) == len(set(ids))
    assert meta["last-column-id"] == max(ids) == _max_field_id(schema)

    got = read_iceberg(spark, path).orderBy("id").collect()
    assert got[0]["s"]["b"] == "x" and got[0]["arr"] == [1, 2, 3]
    assert got[0]["m"] == {"k": 1.5} and got[1]["arr"] == []


def test_nested_ids_stable_across_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, {"a": 7})], "id long, s struct<a: long>")
    write_iceberg(df, path)
    _, m1 = _current_metadata(path)
    write_iceberg(df, path, mode="append")
    write_iceberg(df.withColumn("extra", F.lit("e")), path,
                  mode="append")
    _, m2 = _current_metadata(path)
    f1 = {f["name"]: f for f in m1["schemas"][0]["fields"]}
    cur = next(s for s in m2["schemas"]
               if s["schema-id"] == m2["current-schema-id"])
    f2 = {f["name"]: f for f in cur["fields"]}
    # the unchanged struct keeps its nested ids verbatim; the new
    # column's id is past every prior id, nested included
    assert f2["s"] == f1["s"]
    assert f2["extra"]["id"] > _max_field_id(m1["schemas"][0])
    assert read_iceberg(spark, path).count() == 3


def test_variant_round_trip_v3(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3).select(
        "id",
        F.parse_json(F.concat(
            F.lit('{"k": '), F.col("id").cast("string"),
            F.lit(', "tag": "v"}'))).alias("payload"))
    with pytest.raises(UnsupportedTableFeature, match="variant"):
        write_iceberg(df, path)  # v2 default must refuse the v3 type
    write_iceberg(df, path, format_version=3)
    _, meta = _current_metadata(path)
    assert {f["name"]: f["type"]
            for f in meta["schemas"][0]["fields"]}["payload"] \
        == "variant"
    got = read_iceberg(spark, path) \
        .select("id", F.to_json("payload").alias("j")) \
        .orderBy("id").collect()
    assert json.loads(got[2]["j"]) == {"k": 2, "tag": "v"}


def test_variant_stream_refused_batch_only(spark, tmp_path):
    from sling_cli_spark.streaming.iceberg_source import (
        register_iceberg_stream)

    path = str(tmp_path / "t")
    df = spark.range(2).select(
        "id", F.parse_json(F.lit('{"a": 1}')).alias("v"))
    write_iceberg(df, path, format_version=3)
    register_iceberg_stream(spark)
    with pytest.raises(Exception, match="batch-only|variant"):
        (spark.readStream.format("iceberg_stream")
         .option("path", path).load().schema)


def test_sync_uniform_variant_lands_v3(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import write_delta
    from sling_cli_spark.sources.iceberg_py import sync_uniform

    d = str(tmp_path / "d")
    df = spark.range(3).select(
        "id", F.parse_json(F.lit('{"a": 1}')).alias("v"))
    write_delta(df, d)
    sync_uniform(d)
    _, meta = _current_metadata(d)
    assert meta["format-version"] == 3
    assert {f["name"]: f["type"]
            for f in (meta["schemas"][0]["fields"])}["v"] == "variant"
    got = read_iceberg(spark, d).select(
        F.to_json("v").alias("j")).distinct().collect()
    assert json.loads(got[0]["j"]) == {"a": 1}
