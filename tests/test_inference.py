"""Sample-based schema inference for dirty text sources
(reference: core/dbio/iop/dataset.go:422-610, stream_processor.go:812-837)."""

from pyspark.sql import Row

from sling_cli_spark.operators.inference import infer_and_cast
from sling_cli_spark.types import ColumnType, widen


def _all_strings(spark, rows):
    return spark.createDataFrame(rows)


def test_integer_column(spark):
    df = _all_strings(spark, [Row(c="1"), Row(c="22"), Row(c="-3")])
    out = infer_and_cast(df)
    assert dict(out.dtypes)["c"] in ("int", "bigint")
    assert sorted(r["c"] for r in out.collect()) == [-3, 1, 22]


def test_decimal_column(spark):
    df = _all_strings(spark, [Row(c="1.5"), Row(c="2.25")])
    out = infer_and_cast(df)
    dt = dict(out.dtypes)["c"]
    assert dt.startswith("decimal") or dt == "double"


def test_mixed_int_decimal_widens(spark):
    df = _all_strings(spark, [Row(c="1"), Row(c="2.5")])
    dt = dict(infer_and_cast(df).dtypes)["c"]
    assert dt.startswith("decimal") or dt == "double"


def test_bool_column(spark):
    df = _all_strings(spark, [Row(c="true"), Row(c="false")])
    assert dict(infer_and_cast(df).dtypes)["c"] == "boolean"


def test_date_column(spark):
    df = _all_strings(spark, [Row(c="2024-01-02"), Row(c="2024-03-04")])
    assert dict(infer_and_cast(df).dtypes)["c"] == "date"


def test_timestamp_column(spark):
    df = _all_strings(spark,
                      [Row(c="2024-01-02 03:04:05"), Row(c="2024-01-02 03:04:06")])
    assert "timestamp" in dict(infer_and_cast(df).dtypes)["c"]


def test_string_stays_string(spark):
    df = _all_strings(spark, [Row(c="abc"), Row(c="1x")])
    assert dict(infer_and_cast(df).dtypes)["c"] == "string"


def test_mixed_falls_back_to_string(spark):
    df = _all_strings(spark, [Row(c="123"), Row(c="abc")])
    assert dict(infer_and_cast(df).dtypes)["c"] == "string"


def test_empty_as_null_inference(spark):
    df = _all_strings(spark, [Row(c="1"), Row(c="")])
    out = infer_and_cast(df)
    vals = [r["c"] for r in out.collect()]
    assert None in vals and 1 in vals


def test_widen_lattice():
    assert widen(ColumnType.INTEGER, ColumnType.DECIMAL) == ColumnType.DECIMAL
    assert widen(ColumnType.INTEGER, ColumnType.BIGINT) == ColumnType.BIGINT
    assert widen(ColumnType.DATE, ColumnType.DATETIME) == ColumnType.DATETIME
    assert widen(ColumnType.INTEGER, ColumnType.STRING) == ColumnType.STRING
    assert widen(ColumnType.BOOL, ColumnType.INTEGER) == ColumnType.STRING
