"""Struct flatten + JSON field extraction (reference: core/dbio/iop
dataflow flatten + jmespath record paths)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sling_cli_spark.operators.flatten import extract_json_fields, flatten


def test_flatten_nested_struct(spark):
    df = spark.createDataFrame(
        [Row(id=1, nest=Row(a=1, deep=Row(b="x")))])
    out = flatten(df)
    assert set(out.columns) == {"id", "nest__a", "nest__deep__b"}
    row = out.collect()[0]
    assert row["nest__deep__b"] == "x"


def test_flatten_depth_limit(spark):
    df = spark.createDataFrame([Row(id=1, nest=Row(a=1, deep=Row(b="x")))])
    out = flatten(df, max_depth=2)
    assert "nest__a" in out.columns
    # deeper struct serializes as a JSON string at the depth limit
    assert dict(out.dtypes)["nest__deep"] == "string"


def test_flatten_no_structs_identity(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    assert flatten(df).columns == ["a", "b"]


def test_extract_json_fields(spark):
    df = spark.createDataFrame([Row(id=1, js='{"k": 5, "s": "v"}')])
    out = extract_json_fields(df, "js", {"k": "$.k", "s": "$.s"})
    row = out.collect()[0]
    assert row["k"] == "5" and row["s"] == "v"
    assert "js" not in out.columns
