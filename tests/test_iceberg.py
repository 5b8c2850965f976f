"""Minimal Iceberg v1 layer (sources/iceberg_py.py): snapshot
append/overwrite, manifest-list/manifest avro chain, time travel."""

import json
import os

from sling_cli_spark.sources.iceberg_py import (
    is_iceberg_table, read_iceberg, write_iceberg,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_write_read_append(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a")]), t)
    assert is_iceberg_table(t)
    s2 = write_iceberg(_df(spark, [(2, "b")]), t)
    assert s2 != s1
    got = {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()}
    assert got == {1: "a", 2: "b"}


def test_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a")]), t)
    s2 = write_iceberg(_df(spark, [(9, "z")]), t, mode="overwrite")
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == {9}
    assert {r["id"] for r in read_iceberg(spark, t, snapshot_id=s1).collect()} == {1}
    assert {r["id"] for r in read_iceberg(spark, t, snapshot_id=s2).collect()} == {9}


def test_metadata_layout(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a")]), t)
    md = os.path.join(t, "metadata")
    v = int(open(os.path.join(md, "version-hint.text")).read())
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    assert meta["format-version"] == 1
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
    assert meta["schemas"][0]["fields"][0]["id"] == 1
    assert any(f.endswith(".avro") for f in os.listdir(md))


def test_el_task_iceberg_roundtrip(spark, tmp_path):
    from sling_cli_spark.config import Config, Source, SourceOptions
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.files import read_source

    t = str(tmp_path / "ice")
    cfg = Config.from_dict({
        "source": {"stream": "/root/testdata/sf0.001/region.parquet"},
        "target": {"object": t, "options": {"format": "iceberg"}},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 5 and is_iceberg_table(t)
    back = read_source(spark, Source(
        stream=t, options=SourceOptions(format="iceberg")))
    assert back.count() == 5


def test_merge_iceberg_touched_files_only(spark, tmp_path):
    from sling_cli_spark.sources.iceberg_py import merge_iceberg

    t = str(tmp_path / "t")
    for lo in (0, 100, 200):
        write_iceberg(
            spark.range(lo, lo + 100)
            .selectExpr("id", "cast(id as string) v").coalesce(1), t)
    batch = spark.createDataFrame([(150, "X"), (999, "new")],
                                  "id long, v string")
    stats = merge_iceberg(spark, t, batch, "id")
    assert stats["touched"] == 1 and stats["kept"] == 2
    got = {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()}
    assert got[150] == "X" and got[999] == "new" and len(got) == 301


def test_runner_routes_iceberg_merge(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    t = str(tmp_path / "it")
    for lo in (0, 100):
        write_iceberg(
            spark.range(lo, lo + 100)
            .selectExpr("id", "cast(id as string) v", "id as ts")
            .coalesce(1), t)
    src = tmp_path / "b.csv"
    src.write_text("id,v,ts\n50,VX,999\n")
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": t},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=read_iceberg(spark, t))
    assert r.merge_stats is not None and r.merge_stats["touched"] == 1
    got = {x["id"]: x["v"] for x in read_iceberg(spark, t).collect()}
    assert got[50] == "VX" and len(got) == 200
