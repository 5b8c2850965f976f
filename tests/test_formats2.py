"""XML round-trip, Google Sheets reader, avro gating."""

import pytest
from pyspark.sql import Row

from sling_cli_spark.config import Mode, SourceOptions, Target, TargetOptions
from sling_cli_spark.sinks.writers import write_files
from sling_cli_spark.sources.files import read_files
from sling_cli_spark.sources.gsheet import export_url, read_gsheet


def test_xml_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, v="x"), Row(id=2, v="y")])
    out = str(tmp_path / "t.xml")
    target = Target(conn="local", object=out, options=TargetOptions())
    write_files(df, target, Mode.FULL_REFRESH, fmt="xml")
    back = read_files(spark, out, SourceOptions(format="xml"))
    assert sorted((r["id"], r["v"]) for r in back.collect()) == \
        [(1, "x"), (2, "y")]


def test_gsheet_export_url():
    url = export_url(
        "https://docs.google.com/spreadsheets/d/ABC123_x-y/edit#gid=7", 7)
    assert "ABC123_x-y" in url and "gid=7" in url
    assert export_url("RAWID").startswith(
        "https://docs.google.com/spreadsheets/d/RAWID/")


def test_read_gsheet_with_fake_transport(spark):
    csv = b"id,name,score\n1,alice,9.5\n2,bob,8.0\n"
    df = read_gsheet(spark, "FAKE", transport=lambda url: csv)
    rows = sorted((r["id"], r["name"]) for r in df.collect())
    assert rows == [(1, "alice"), (2, "bob")]
    # inference typed the numeric columns
    assert dict(df.dtypes)["id"] in ("int", "bigint")


def test_avro_write_falls_back_to_stdlib_ocf(spark, tmp_path):
    # without the spark-avro jar the stdlib OCF writer takes over
    from sling_cli_spark.sources.avro_py import read_avro

    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    path = str(tmp_path / "t.avro")
    target = Target(conn="local", object=path, options=TargetOptions())
    write_files(df, target, Mode.FULL_REFRESH, fmt="avro")
    _, recs = read_avro(path)
    assert sorted(r["a"] for r in recs) == [1, 2]
