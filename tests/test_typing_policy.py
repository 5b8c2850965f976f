"""Column typing policy (reference datatype.go:2508-2664 matrix)."""

import pytest
from pyspark.sql import types as T

from sling_cli_spark.operators.typing_policy import (
    ColumnTyping, DecimalTyping, StringTyping, apply_column_typing,
    string_ddl_length,
)


# --- StringTyping.Apply port (datatype.go:2540-2576) --------------------

@pytest.mark.parametrize("kw,length,native_max,expected", [
    ({}, 42, 4000, 42),                              # no policy: passthrough
    ({"min_length": 100}, 42, 4000, 100),            # floor
    ({"max_length": 30}, 42, 4000, 30),              # cap below native max
    ({"length_factor": 2}, 42, 4000, 84),            # factor
    ({"length_factor": 10, "max_length": 100}, 42, 4000, 100),  # factor capped
    ({"length_factor": 2, "min_length": 200}, 42, 4000, 200),   # factor floored
    ({"use_max": True}, 42, 4000, 4000),             # use native max
    ({"use_max": True, "max_length": 9000}, 42, 4000, 9000),    # max raised
    ({"max_length": 9000}, 8000, 4000, 8000),        # len under raised max
])
def test_string_apply_matrix(kw, length, native_max, expected):
    assert StringTyping(**kw).apply(length, native_max) == expected


def test_string_ddl_length_defaults():
    assert string_ddl_length(None, 10) == 10
    assert string_ddl_length({"string": {"length_factor": 3}}, 10) == 30
    assert string_ddl_length({"string": {"use_max": True}}, 10) == 4000


# --- DecimalTyping.Apply ------------------------------------------------

@pytest.mark.parametrize("kw,p,s,expected", [
    ({}, 38, 10, (38, 10)),
    ({"max_scale": 6}, 38, 10, (38, 6)),
    ({"min_scale": 4}, 20, 2, (20, 4)),
    ({"max_precision": 18, "max_scale": 4}, 38, 10, (18, 4)),
    ({"min_precision": 24}, 10, 2, (24, 2)),
])
def test_decimal_apply_matrix(kw, p, s, expected):
    assert DecimalTyping(**kw).apply(p, s) == expected


def test_decimal_keeps_integer_digit():
    p, s = DecimalTyping(min_scale=10).apply(8, 2)
    assert p > s


# --- DataFrame casts ----------------------------------------------------

def test_boolean_cast_as_integer(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    out = apply_column_typing(df, {"boolean": {"cast_as": "integer"}})
    assert dict(out.dtypes)["b"] == "smallint"
    assert [r["b"] for r in out.orderBy("b").collect()] == [None, 0, 1]


def test_boolean_cast_as_string(spark):
    df = spark.createDataFrame([(True,)], "b boolean")
    out = apply_column_typing(df, {"boolean": {"cast_as": "string"}})
    assert dict(out.dtypes)["b"] == "string"
    assert out.collect()[0]["b"] == "true"


def test_decimal_clamp_cast(spark):
    df = spark.createDataFrame([(1,)], "i int") \
        .selectExpr("cast(1234.56789 as decimal(38, 10)) AS d")
    out = apply_column_typing(
        df, {"decimal": {"max_precision": 18, "max_scale": 4}})
    assert out.schema["d"].dataType == T.DecimalType(18, 4)
    assert str(out.collect()[0]["d"]) == "1234.5679"


def test_decimal_cast_as_double(spark):
    df = spark.createDataFrame([(1,)], "i int") \
        .selectExpr("cast(2.5 as decimal(10, 2)) AS d")
    out = apply_column_typing(df, {"decimal": {"cast_as": "double"}})
    assert dict(out.dtypes)["d"] == "double"


def test_json_as_text(spark):
    df = spark.createDataFrame([({"a": 1}, [1, 2])], "s struct<a:int>, arr array<int>")
    out = apply_column_typing(df, {"json": {"as_text": True}})
    assert dict(out.dtypes) == {"s": "string", "arr": "string"}
    row = out.collect()[0]
    assert row["s"] == '{"a":1}' and row["arr"] == "[1,2]"


def test_noop_returns_same_plan(spark):
    df = spark.createDataFrame([(1, "x")], "i int, s string")
    assert apply_column_typing(df, {"boolean": {"cast_as": "integer"}}) is df
    assert apply_column_typing(df, None) is df


# --- end-to-end through runner + DDL ------------------------------------

def test_runner_applies_column_typing(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = tmp_path / "s.jsonl"
    src.write_text('{"id": 1, "ok": true}\n{"id": 2, "ok": false}\n')
    out = str(tmp_path / "o.parquet")
    cfg = Config.from_dict({
        "source": {"stream": str(src)},
        "target": {"object": out,
                   "options": {"column_typing": {"boolean": {"cast_as": "integer"}}}},
        "mode": "full-refresh"})
    run(spark, cfg)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["ok"] == "smallint"


def test_ddl_uses_policy(spark):
    from sling_cli_spark.dialects import create_table_ddl, get_dialect

    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(38, 12)),
    ])
    ddl = create_table_ddl(
        get_dialect("postgres"), "t", schema, max_lens={"name": 10},
        column_typing={"string": {"length_factor": 4, "min_length": 64},
                       "decimal": {"max_precision": 20, "max_scale": 6}})
    assert "varchar(64)" in ddl
    assert "numeric(20,6)" in ddl or "numeric(20, 6)" in ddl or "decimal(20,6)" in ddl
