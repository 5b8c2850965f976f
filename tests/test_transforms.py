"""Named transform registry (reference: core/dbio/iop/transforms.go:166-422)."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sling_cli_spark.operators.transforms import (
    apply_transforms, transform_column)


def _one(spark, value, *transforms):
    df = spark.createDataFrame([Row(c=value)])
    out = apply_transforms(df, {"c": list(transforms)})
    return out.collect()[0]["c"]


def test_lower_trim(spark):
    assert _one(spark, "  HeLLo ", "lower", "trim_space") == "hello"


def test_hash_md5(spark):
    assert _one(spark, "abc", "hash_md5") == hashlib.md5(b"abc").hexdigest()


def test_hash_sha256(spark):
    assert _one(spark, "abc", "hash_sha256") == \
        hashlib.sha256(b"abc").hexdigest()


def test_empty_as_null(spark):
    assert _one(spark, "", "empty_as_null") is None
    assert _one(spark, "x", "empty_as_null") == "x"


def test_replace_non_printable(spark):
    assert _one(spark, "a\x01b\x02c", "replace_non_printable") == "abc"


def test_replace_accents(spark):
    assert _one(spark, "café", "replace_accents") == "cafe"


def test_arg_transform_replace(spark):
    assert _one(spark, "a-b-c", "replace(-,_)") == "a_b_c"


def test_arg_transform_substring(spark):
    assert _one(spark, "abcdef", "substring(1,3)") == "abc"


def test_unknown_transform_raises(spark):
    df = spark.createDataFrame([Row(c="x")])
    with pytest.raises(ValueError):
        apply_transforms(df, {"c": ["no_such_transform"]})


def test_list_form_applies_to_all_strings(spark):
    df = spark.createDataFrame([Row(a=" X ", b=" y ", n=1)])
    out = apply_transforms(df, ["trim_space", "lower"]).collect()[0]
    assert (out["a"], out["b"], out["n"]) == ("x", "y", 1)


def test_parse_bit(spark):
    df = spark.createDataFrame([Row(c=bytearray(b"\x01"))])
    out = df.select(transform_column(F.col("c"), "parse_bit").alias("c"))
    assert out.collect()[0]["c"] == "1"
