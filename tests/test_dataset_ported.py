"""dataset_test.go vectors, ported 1:1 over operators/inference.py.

Source tables (reference: ``core/dbio/iop/dataset_test.go``):

- TestDataset_InferColumnTypes (:11) — 21 datasets
- TestEmptyStringHandling      (:352)

Port adaptations (deliberate):

- The Go test feeds TYPED values (ints, bools, time.Time); our inference
  classifies the string form (the CSV contract both engines share), so
  typed inputs stringify — Go's midnight ``time.Date`` values port as
  ``datetime.date`` (their CSV rendering), matching the DateType
  expectation.
- SampleSize override is a function arg here (``sample_size=10``), not a
  package global.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sling_cli_spark.operators.inference import (
    ColStats, classify_value, decide_type, infer_schema)
from sling_cli_spark.types import ColumnType

LONG = ("this is a very long string that should be inferred as text type "
        "because it exceeds 255 characters. " * 3).strip()


def _infer(columns, rows):
    """Driver-side twin of Dataset.InferColumnTypes over python rows."""
    stats = {c: ColStats() for c in columns}
    for row in rows:
        for c, v in zip(columns, row):
            classify_value(None if v is None else str(v), stats[c])
    return [decide_type(stats[c]) for c in columns], stats


INFER_CASES = [
    ("Empty dataset", ["col1", "col2"], [],
     [ColumnType.STRING, ColumnType.STRING]),
    ("All nulls", ["col1"], [[None], [None], [None]],
     [ColumnType.STRING]),
    ("String values", ["short_string", "long_string"],
     [["abc", LONG], ["def", "another long string"],
      ["ghi", "yet another long string"]],
     [ColumnType.STRING, ColumnType.TEXT]),
    ("Integer values", ["small_int", "big_int"],
     [[123, 9223372036854775807], [456, 9223372036854775806],
      [789, 9223372036854775805]],
     [ColumnType.INTEGER, ColumnType.BIGINT]),
    ("Decimal values", ["decimal_col"],
     [[123.45], [456.78], [789.01]], [ColumnType.DECIMAL]),
    ("Boolean values", ["bool_col"],
     [[True], [False], [True]], [ColumnType.BOOL]),
    ("Date values", ["date_col"],
     [[dt.date(2022, 1, 1)], [dt.date(2022, 1, 2)], [dt.date(2022, 1, 3)]],
     [ColumnType.DATE]),
    ("Datetime values", ["datetime_col", "datetimez_col"],
     [[dt.datetime(2022, 1, 1, 12, 30, 45),
       "2022-01-01 12:30:45-05:00"],
      [dt.datetime(2022, 1, 2, 13, 31, 46),
       "2022-01-02 13:31:46-05:00"],
      [dt.datetime(2022, 1, 3, 14, 32, 47),
       "2022-01-03 14:32:47-05:00"]],
     [ColumnType.DATETIME, ColumnType.TIMESTAMPZ]),
    ("JSON values", ["json_col"],
     [['{"key": "value"}'], ['{"array": [1, 2, 3]}'],
      ['{"nested": {"obj": true}}']], [ColumnType.JSON]),
    ("Mixed values with nulls", ["mixed_col"],
     [[123], [456.78], [None]], [ColumnType.DECIMAL]),
    ("Mixed string and numbers - should default to string", ["mixed_col"],
     [[123], ["abc"], [456]], [ColumnType.STRING]),
    ("CSV-like string integers", ["int_as_string"],
     [["123"], ["456"], ["789"]], [ColumnType.INTEGER]),
    ("CSV-like string decimals", ["decimal_as_string"],
     [["123.45"], ["456.78"], ["789.01"]], [ColumnType.DECIMAL]),
    ("CSV-like string booleans", ["bool_as_string"],
     [["true"], ["false"], ["true"]], [ColumnType.BOOL]),
    ("CSV-like string dates", ["date_as_string"],
     [["2022-01-01"], ["2022-01-02"], ["2022-01-03"]],
     [ColumnType.DATE]),
    ("CSV-like string timestamps",
     ["iso_timestamp", "datetime_tz", "regional_timestamp",
      "short_timestamp"],
     [["2022-01-01T12:30:45Z", "2022-01-01 12:30:45-05:00",
       "01/02/2022 12:30:45", "2022-01-01 12:30"],
      ["2022-01-02T13:31:46Z", "2022-01-02 13:31:46-05:00",
       "01/03/2022 13:31:46", "2022-01-02 13:31"],
      ["2022-01-03T14:32:47Z", "2022-01-03 14:32:47-05:00",
       "01/04/2022 14:32:47", "2022-01-03 14:32"]],
     [ColumnType.DATETIME, ColumnType.TIMESTAMPZ, ColumnType.DATETIME,
      ColumnType.DATETIME]),
    ("CSV-like mixed valid and invalid timestamps",
     ["valid_mixed", "invalid_timestamp"],
     [["2022-01-01T12:30:45Z", "not-a-date"],
      ["01/02/2022 12:30:45", "timestamp-without-numbers"],
      ["2022-01-03 14:32:47", "2022:01:03"]],
     [ColumnType.DATETIME, ColumnType.STRING]),
    ("CSV-like timestamp with nulls", ["sparse_timestamp"],
     [[None], [""], ["2022-01-01T12:30:45Z"]], [ColumnType.DATETIME]),
    ("CSV-like mixed integers and empty strings", ["mixed_int_empty"],
     [["123"], [""], ["789"]], [ColumnType.INTEGER]),
    ("CSV-like mixed types", ["col1", "col2", "col3", "col4"],
     [["123", "abc", "123.45", "true"],
      ["456", "def", "456.78", "false"],
      ["", "", "", ""],
      ["789", "ghi", "789.01", "true"]],
     [ColumnType.INTEGER, ColumnType.STRING, ColumnType.DECIMAL,
      ColumnType.BOOL]),
    ("Invalid string numbers mixed with valid ones",
     ["mixed_valid_invalid"],
     [["123"], ["456abc"], ["789"]], [ColumnType.STRING]),
    ("Sparse dataset with few values", ["sparse_col"],
     [[None]] * 9 + [["123"]], [ColumnType.INTEGER]),
]


@pytest.mark.parametrize("name,columns,rows,expected", INFER_CASES,
                         ids=[c[0] for c in INFER_CASES])
def test_infer_column_types_ported(name, columns, rows, expected):
    got, stats = _infer(columns, rows)
    assert got == expected


def test_string_values_max_len():
    # dataset_test.go expectedMaxLen for the "String values" case
    _, stats = _infer(
        ["short_string", "long_string"],
        [["abc", LONG], ["def", "another long string"],
         ["ghi", "yet another long string"]])
    assert stats["short_string"].max_len == 3
    assert stats["long_string"].max_len == len(LONG)


def test_empty_string_handling_ported():
    types, stats = _infer(
        ["col1", "col2", "col3"],
        [["123", "", "abc"], ["", "456", "def"], ["789", "123", ""]])
    assert types == [ColumnType.INTEGER, ColumnType.INTEGER,
                     ColumnType.STRING]
    for c in ("col1", "col2", "col3"):
        assert stats[c].nulls > 0  # empty strings count as nulls


def test_infer_schema_on_spark_df_matches(spark):
    """The same decisions through the Spark-facing infer_schema."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(a="123", b="abc", c="2022-01-01", d="2022-01-01T12:30:45Z"),
        Row(a="456", b="def", c="2022-01-02", d="2022-01-02T13:31:46Z"),
    ])
    inferred = infer_schema(df, sample_size=10)
    assert inferred["a"][0] == ColumnType.INTEGER
    assert inferred["b"][0] == ColumnType.STRING
    assert inferred["c"][0] == ColumnType.DATE
    assert inferred["d"][0] == ColumnType.DATETIME
