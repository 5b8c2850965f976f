"""Incremental / backfill / limit-offset (reference: core/sling
task_run_read.go incremental where-clause building)."""

import datetime

from pyspark.sql import Row

from sling_cli_spark.operators.incremental import (
    apply_limit_offset, backfill_filter, incremental_filter, max_watermark)


def _df(spark):
    return spark.createDataFrame(
        [Row(id=i, d=datetime.date(2024, 1, i + 1)) for i in range(10)])


def test_max_watermark(spark):
    assert max_watermark(_df(spark), "id") == 9


def test_max_watermark_empty(spark):
    df = _df(spark).filter("id < 0")
    assert max_watermark(df, "id") is None


def test_incremental_filter(spark):
    out = incremental_filter(_df(spark), "id", 6)
    assert sorted(r["id"] for r in out.collect()) == [7, 8, 9]


def test_incremental_filter_none_passthrough(spark):
    assert incremental_filter(_df(spark), "id", None).count() == 10


def test_backfill_range_inclusive(spark):
    out = backfill_filter(
        _df(spark), "d", datetime.date(2024, 1, 3), datetime.date(2024, 1, 5))
    assert out.count() == 3


def test_limit(spark):
    assert apply_limit_offset(_df(spark), 4).count() == 4


def test_limit_offset(spark):
    out = apply_limit_offset(_df(spark).orderBy("id"), 3, 2)
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]
