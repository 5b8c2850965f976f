"""Iceberg partition transforms (spec §Partition Transforms):
bucket[N] / truncate[W] / year / month / day / hour — unit vectors,
write layout, manifest partition values, scan pruning, merge pruning,
and partition evolution onto a transform spec."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from sling_cli_spark.sources.iceberg_py import (
    _active_files, _current_metadata, evolve_partition_spec,
    merge_iceberg, prune_files_by_bounds, read_iceberg, write_iceberg)
from sling_cli_spark.sources.iceberg_transforms import (
    murmur3_32, parse_partition_field, transform_literal)


def test_murmur3_spec_vectors():
    """Spec Appendix B test vectors, the hash every engine must match."""
    import struct

    assert murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert murmur3_32(struct.pack("<q", days)) == -653330422
    assert murmur3_32(bytes([0, 1, 2, 3])) == -188683207


def test_parse_partition_field():
    assert parse_partition_field("c") == ("identity", "c", "c")
    assert parse_partition_field("bucket(16, id)") == \
        ("bucket[16]", "id", "id_bucket")
    assert parse_partition_field("truncate(4, name)") == \
        ("truncate[4]", "name", "name_trunc")
    assert parse_partition_field("day(ts)") == ("day", "ts", "ts_day")
    assert parse_partition_field("MONTH(d)") == ("month", "d", "d_month")
    with pytest.raises(ValueError):
        parse_partition_field("bucket(0, id)")
    with pytest.raises(ValueError):
        parse_partition_field("wat(4, x)")


def _mk(spark, tmp_path, partition_by):
    t = str(tmp_path / "t")
    rows = [(i, f"name{i % 7}",
             datetime.date(2024, 1 + (i % 12), 1 + (i % 27)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, name string, d date")
    write_iceberg(df.repartition(4), t, partition_by=partition_by)
    return t, rows


def test_bucket_write_layout_and_roundtrip(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, ["bucket(4, id)"])
    _, meta = _current_metadata(t)
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [{"name": "id_bucket", "transform": "bucket[4]",
                     "source-id": 1, "field-id": 1000}]
    files = _active_files(t, meta, None)
    # dirs carry the DERIVED value; manifests record it per file
    assert all(set(f["partition"]) == {"id_bucket"} for f in files)
    assert {int(f["partition"]["id_bucket"]) for f in files} <= set(range(4))
    # manifest value matches the spec transform of the rows inside
    for f in files:
        assert f["file_path"].split("/data/")[1].startswith("id_bucket=")
    back = read_iceberg(spark, t)
    assert sorted(r["id"] for r in back.collect()) == \
        sorted(r[0] for r in rows)
    # source column survives INSIDE the files (not dir-derived)
    assert "id" in back.columns and "id_bucket" not in back.columns
    # every row actually sits in its spec-computed bucket
    got = back.withColumn(
        "__dir", F.element_at(F.split(
            F.col("_metadata.file_path"), "/id_bucket="), 2))
    for r in got.select("id", "__dir").collect():
        assert int(r["__dir"].split("/")[0]) == \
            transform_literal("bucket[4]", r["id"], "long")


def test_bucket_scan_pruning(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, ["bucket(4, id)"])
    _, meta = _current_metadata(t)
    files = _active_files(t, meta, None)
    pruned = prune_files_by_bounds(files, [("id", "=", 17)], meta)
    want_bucket = transform_literal("bucket[4]", 17, "long")
    assert pruned and all(
        int(f["partition"]["id_bucket"]) == want_bucket for f in pruned)
    assert len(pruned) < len(files)
    got = read_iceberg(spark, t, skip_filters=[("id", "=", 17)]) \
        .filter("id = 17").collect()
    assert [r["id"] for r in got] == [17]


def test_temporal_and_truncate_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = [(i, f"k{i:04d}", datetime.date(2020 + i % 5, 1 + i % 12, 5))
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, name string, d date")
    write_iceberg(df.repartition(3), t,
                  partition_by=["month(d)", "truncate(2, name)"])
    _, meta = _current_metadata(t)
    files = _active_files(t, meta, None)
    shapes = {frozenset((f["partition"] or {}).keys()) for f in files}
    assert shapes == {frozenset({"d_month", "name_trunc"})}
    # month interval disproof: d >= 2024-06-01 drops every file whose
    # month ordinal predates it
    cut = datetime.date(2024, 6, 1)
    pruned = prune_files_by_bounds(files, [("d", ">=", cut)], meta)
    cut_m = transform_literal("month", cut, "date")
    assert all(int(f["partition"]["d_month"]) >= cut_m for f in pruned)
    assert len(pruned) < len(files)
    # truncate prefix equality
    pruned2 = prune_files_by_bounds(
        files, [("name", "=", "k0013")], meta)
    assert pruned2 and all(
        f["partition"]["name_trunc"] == "k0" for f in pruned2)
    # results still exact through the pruned scan
    got = read_iceberg(spark, t, skip_filters=[("d", ">=", cut)]) \
        .filter(F.col("d") >= F.lit(cut))
    exp = sorted(r[0] for r in rows if r[2] >= cut)
    assert sorted(r["id"] for r in got.collect()) == exp


def test_merge_into_transform_partitioned(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, ["bucket(4, id)"])
    src = spark.createDataFrame(
        [(7, "UPDATED", datetime.date(2030, 1, 1)),
         (999, "NEW", datetime.date(2030, 1, 2))],
        "id long, name string, d date")
    stats = merge_iceberg(spark, t, src, ["id"])
    # the probe pruned: only files in id=7's bucket were touched
    assert stats["touched"] >= 1
    back = {r["id"]: r["name"] for r in read_iceberg(spark, t).collect()}
    assert back[7] == "UPDATED" and back[999] == "NEW"
    assert len(back) == 61
    # new files landed under their spec buckets
    _, meta = _current_metadata(t)
    for f in _active_files(t, meta, None):
        assert "id_bucket=" in f["file_path"]


def test_partition_evolution_onto_transform_spec(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, ["bucket(4, id)"])
    new_id = evolve_partition_spec(t, ["year(d)"])
    assert new_id == 1
    _, meta = _current_metadata(t)
    assert meta["default-spec-id"] == 1
    fields = [s for s in meta["partition-specs"]
              if s["spec-id"] == 1][0]["fields"]
    assert fields[0]["name"] == "d_year" and \
        fields[0]["transform"] == "year"
    # new write stages under the new layout; reads span both
    write_iceberg(spark.createDataFrame(
        [(1000, "late", datetime.date(2031, 5, 5))],
        "id long, name string, d date"), t, mode="append")
    files = _active_files(t, meta, None)
    back = read_iceberg(spark, t)
    assert back.count() == 61
    assert {r["id"] for r in back.filter("id >= 1000").collect()} == {1000}
    _, meta2 = _current_metadata(t)
    new_files = [f for f in _active_files(t, meta2, None)
                 if "d_year=" in f["file_path"]]
    assert new_files and all(
        f["partition"].get("d_year") == "61" for f in new_files)


def test_unsupported_transform_write_refuses(spark, tmp_path):
    from sling_cli_spark.sources.iceberg_py import UnsupportedTableFeature

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1.5, 1)], "x double, id long")
    with pytest.raises((UnsupportedTableFeature, ValueError)):
        write_iceberg(df, t, partition_by=["bucket(4, x)"])


def test_hour_transform_on_timestamps(spark, tmp_path):
    t = str(tmp_path / "t")
    base = datetime.datetime(2024, 3, 1, 0, 30, tzinfo=datetime.timezone.utc)
    rows = [(i, base + datetime.timedelta(minutes=90 * i))
            for i in range(8)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    write_iceberg(df.coalesce(1), t, partition_by=["hour(ts)"])
    _, meta = _current_metadata(t)
    files = _active_files(t, meta, None)
    for f in files:
        assert "ts_hour=" in f["file_path"]
    back = read_iceberg(spark, t)
    assert back.count() == 8
    cut = base + datetime.timedelta(hours=6)
    pruned = prune_files_by_bounds(files, [("ts", ">", cut)], meta)
    cut_h = transform_literal("hour", cut, "timestamp")
    assert all(int(f["partition"]["ts_hour"]) >= cut_h for f in pruned)
    assert len(pruned) < len(files)


def test_sync_delta_on_transform_layout(spark, tmp_path):
    """r9: a pure-transform (bucket) Iceberg layout syncs to a Delta
    log as an UNPARTITIONED table — the source columns live inside the
    files, so one parquet copy serves both protocols (r8 refused)."""
    from sling_cli_spark.sources.delta_py import read_delta
    from sling_cli_spark.sources.iceberg_py import sync_delta

    t, rows = _mk(spark, tmp_path, ["bucket(4, id)"])
    v = sync_delta(t)
    assert v == 0
    back = read_delta(spark, t)
    assert sorted(r["id"] for r in back.collect()) == \
        sorted(r[0] for r in rows)
    meta_back = back.schema.fieldNames()
    assert "id_bucket" not in meta_back
    # refresh after another append commits a diff, not a full relog
    write_iceberg(spark.createDataFrame(
        [(999, "late", datetime.date(2030, 1, 1))],
        "id long, name string, d date"), t, mode="append")
    v2 = sync_delta(t)
    assert v2 == 1
    assert read_delta(spark, t).count() == len(rows) + 1


def test_sync_delta_refuses_identity_outside_default_spec(spark, tmp_path):
    """Identity values live only in manifests: a live file under an
    old identity spec that the default (transform) spec no longer
    covers must refuse, not null-fill."""
    from sling_cli_spark.sources.delta_py import UnsupportedTableFeature
    from sling_cli_spark.sources.iceberg_py import (
        evolve_partition_spec, sync_delta)

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}", datetime.date(2024, 1, 1 + i)) for i in range(6)],
        "id long, name string, d date")
    write_iceberg(df.filter("id < 3").coalesce(1), t,
                  partition_by=["id"])  # identity
    evolve_partition_spec(t, ["bucket(4, id)"])
    write_iceberg(df.filter("id >= 3").coalesce(1), t, mode="append")
    with pytest.raises(UnsupportedTableFeature, match="identity"):
        sync_delta(t)


def test_iceberg_stream_source_on_transform_layout(spark, tmp_path):
    """The streaming source reads transform-partitioned snapshots: the
    derived dir names are NOT table columns (no spurious attach) and
    the source columns come straight from the files."""
    from sling_cli_spark.streaming.iceberg_source import (
        register_iceberg_stream)

    register_iceberg_stream(spark)
    t = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(i, f"n{i}", datetime.date(2024, 1 + i % 3, 5))
         for i in range(12)], "id long, name string, d date")
    write_iceberg(df.repartition(2), t,
                  partition_by=["bucket(4, id)", "month(d)"])
    q = (spark.readStream.format("iceberg_stream").option("path", t)
         .load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert sorted(back.columns) == ["d", "id", "name"]
    assert sorted(r["id"] for r in back.collect()) == list(range(12))
    got = {r["id"]: (r["name"], r["d"]) for r in back.collect()}
    assert got[3] == ("n3", datetime.date(2024, 1, 5))


def test_decimal_transforms(spark, tmp_path):
    """Decimal bucket (spec Appendix B: 14.20 -> -500754589) and
    truncate (unscaled-value increments: truncate[50] of decimal(10,2)
    rounds down to 0.50 steps) — exprs match the literal twins and a
    bucket-partitioned decimal table round-trips with pruning."""
    from decimal import Decimal

    from sling_cli_spark.sources.iceberg_transforms import (
        _decimal_bytes, transform_expr)

    assert murmur3_32(_decimal_bytes(1420)) == -500754589  # spec vector
    assert transform_literal("bucket[8]", Decimal("14.20"), "decimal(10,2)") \
        == ((-500754589 & 0x7FFFFFFF) % 8)
    assert transform_literal("truncate[50]", Decimal("10.65"),
                             "decimal(10,2)") == Decimal("10.50")
    assert transform_literal("truncate[50]", Decimal("-0.05"),
                             "decimal(10,2)") == Decimal("-0.50")

    df = spark.createDataFrame(
        [(i, Decimal(f"{i}.{i % 100:02d}")) for i in range(40)],
        "id long, amt decimal(10,2)")
    out = df.select(
        "amt",
        transform_expr("bucket[8]", F.col("amt"),
                       "decimal(10,2)").alias("b"),
        transform_expr("truncate[50]", F.col("amt"),
                       "decimal(10,2)").alias("t")).collect()
    for r in out:
        assert r["b"] == transform_literal(
            "bucket[8]", r["amt"], "decimal(10,2)")
        assert r["t"] == transform_literal(
            "truncate[50]", r["amt"], "decimal(10,2)")

    t = str(tmp_path / "t")
    write_iceberg(df.repartition(3), t, partition_by=["bucket(4, amt)"])
    back = read_iceberg(spark, t)
    assert back.count() == 40
    _, meta = _current_metadata(t)
    files = _active_files(t, meta, None)
    probe = Decimal("7.07")
    pruned = prune_files_by_bounds(files, [("amt", "=", probe)], meta)
    want = transform_literal("bucket[4]", probe, "decimal(10,2)")
    assert pruned and all(
        int(f["partition"]["amt_bucket"]) == want for f in pruned)
    assert len(pruned) < len(files)
