"""Config loading / env render / runtime vars + validation checksums."""

import os

from pyspark.sql import Row

from sling_cli_spark.config import (
    Config, Mode, render_env, render_vars, runtime_vars)
from sling_cli_spark.operators.validation import (
    checksums, count_validation, validate)

YAML = """
source:
  conn: local
  stream: /data/in/*.csv
  primary_key: [id]
  update_key: updated_at
target:
  conn: local
  object: /data/out/table.parquet
mode: incremental
"""


def test_yaml_load():
    cfg = Config.from_yaml(YAML)
    assert cfg.source.stream == "/data/in/*.csv"
    assert cfg.source.primary_key == ["id"]
    assert cfg.mode == Mode.INCREMENTAL
    assert cfg.target.object == "/data/out/table.parquet"


def test_render_env():
    os.environ["SLING_TEST_VAR"] = "hello"
    try:
        assert render_env("${SLING_TEST_VAR}/x") == "hello/x"
        assert render_env({"k": "${SLING_TEST_VAR}"}) == {"k": "hello"}
    finally:
        del os.environ["SLING_TEST_VAR"]


def test_runtime_vars_and_render():
    cfg = Config.from_yaml(YAML)
    rv = runtime_vars(cfg)
    assert rv["stream_name"]
    out = render_vars("prefix/{stream_name}", rv)
    assert "{" not in out


def test_checksums_roundtrip_match(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(i=1, s="ab", f=2.7), Row(i=-3, s="xyz", f=1.2)])
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    result = validate(df, back)
    assert result["_row_count"] is True
    assert all(result.values())


def test_checksums_expected_values(spark):
    df = spark.createDataFrame([Row(i=1, s="ab"), Row(i=-3, s="xyz")])
    cs = checksums(df)
    assert cs["_row_count"] == 2
    assert cs["i"] == 4        # sum(abs)
    assert cs["s"] == 5        # sum(length)


def test_checksum_detects_mismatch(spark):
    a = spark.createDataFrame([Row(i=1)])
    b = spark.createDataFrame([Row(i=2)])
    assert validate(a, b)["i"] is False


def test_count_validation():
    assert count_validation(10, 10) is True
    assert count_validation(10, 9) is False
