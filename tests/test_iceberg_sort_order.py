"""Iceberg sort orders (spec §Sort Orders).

Reference surface: the reference reads Iceberg via DuckDB's extension
(core/dbio/iop/iceberg.go) and leaves table maintenance to warehouse
engines; sort orders are public-spec metadata those warehouses write.
Here the engine both RECORDS the order (metadata + per-file
``sort_order_id``, spec field 140) and HONORS it on every staged
write (rows sorted within each task by partition cols + sort fields,
so each emitted file is internally ordered with tight bounds).
"""

import json
import os

import pytest

from sling_cli_spark.sources.avro_py import read_avro
from sling_cli_spark.sources.iceberg_py import (
    _current_metadata, compact_iceberg, read_iceberg, set_sort_order,
    write_iceberg)
from sling_cli_spark.sources.iceberg_transforms import parse_sort_field


def _entries(meta):
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests = read_avro(snap["manifest-list"])
    out = []
    for m in manifests:
        _, es = read_avro(m["manifest_path"])
        out += [e for e in es if e["status"] != 2]
    return out


def test_parse_sort_field():
    assert parse_sort_field("o_orderkey") == {
        "transform": "identity", "source": "o_orderkey",
        "direction": "asc", "null-order": "nulls-first"}
    assert parse_sort_field("o_totalprice desc") == {
        "transform": "identity", "source": "o_totalprice",
        "direction": "desc", "null-order": "nulls-last"}
    assert parse_sort_field("truncate(4, o_clerk) asc nulls-last") == {
        "transform": "truncate[4]", "source": "o_clerk",
        "direction": "asc", "null-order": "nulls-last"}
    assert parse_sort_field("bucket(8, o_custkey) desc nulls_first") == {
        "transform": "bucket[8]", "source": "o_custkey",
        "direction": "desc", "null-order": "nulls-first"}


def test_sorted_write_records_order_and_sorts_files(spark, orders,
                                                   tmp_path):
    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderpriority").limit(4000)
    write_iceberg(src.repartition(4), path,
                  sort_by=["o_totalprice desc"])
    _, meta = _current_metadata(path)
    assert meta["default-sort-order-id"] == 1
    assert meta["sort-orders"][1]["fields"][0]["direction"] == "desc"

    # every ADDED entry names the order it was written under
    es = _entries(meta)
    assert es and all(
        e["data_file"]["sort_order_id"] == 1 for e in es)

    # every data file is internally ordered by the declared key
    import pyarrow.parquet as pq
    for e in es:
        vals = pq.read_table(
            e["data_file"]["file_path"],
            columns=["o_totalprice"])["o_totalprice"].to_pylist()
        assert vals == sorted(vals, reverse=True)

    # content round-trips untouched
    got = read_iceberg(spark, path)
    assert got.count() == src.count()
    assert got.select("o_orderkey").exceptAll(
        src.select("o_orderkey")).count() == 0


def test_set_sort_order_on_existing_and_partitioned(spark, orders,
                                                    tmp_path):
    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus",
                        "o_totalprice").limit(3000)
    write_iceberg(src, path, partition_by=["o_orderstatus"])
    oid = set_sort_order(path, ["o_orderkey"])
    assert oid == 1
    # idempotent: same order re-defaults, no duplicate entry
    assert set_sort_order(path, ["o_orderkey"]) == 1
    _, meta = _current_metadata(path)
    assert len(meta["sort-orders"]) == 2

    write_iceberg(src, path, mode="append")
    _, meta = _current_metadata(path)
    es = _entries(meta)
    # first write predates the order (null), the append carries it
    assert {e["data_file"]["sort_order_id"] for e in es} == {None, 1}

    import pyarrow.parquet as pq
    for e in es:
        if e["data_file"]["sort_order_id"] != 1:
            continue
        vals = pq.read_table(
            e["data_file"]["file_path"],
            columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert vals == sorted(vals)

    # reset to unsorted order 0
    assert set_sort_order(path, []) == 0
    write_iceberg(src.limit(10), path, mode="append")
    _, meta = _current_metadata(path)
    assert None in {e["data_file"]["sort_order_id"]
                    for e in _entries(meta)}


def test_compact_sort_strategy_rewrites_all(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_totalprice").limit(2000)
    # 4 unsorted appends -> interleaved key ranges across files
    for i in range(4):
        write_iceberg(src.filter(f"o_orderkey % 4 = {i}"), path,
                      mode="append" if i else "overwrite")
    with pytest.raises(ValueError, match="no default sort order"):
        compact_iceberg(spark, path, sort=True)
    set_sort_order(path, ["o_orderkey"])
    res = compact_iceberg(spark, path, sort=True,
                          target_file_bytes=16 * 1024)
    assert res["compacted"] == 4 and res["new_files"] >= 1
    _, meta = _current_metadata(path)
    es = _entries(meta)
    assert all(e["data_file"]["sort_order_id"] == 1 for e in es)
    # rewritten files own DISJOINT key ranges (range partitioning)
    import pyarrow.parquet as pq
    spans = []
    for e in es:
        vals = pq.read_table(
            e["data_file"]["file_path"],
            columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert vals == sorted(vals)
        spans.append((vals[0], vals[-1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    got = read_iceberg(spark, path)
    assert got.count() == src.count()


def test_detail_shows_sort_order(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg(orders.limit(50), path, sort_by=["o_orderkey desc"])
    from sling_cli_spark.sources.iceberg_py import iceberg_detail
    row = iceberg_detail(spark, path).collect()[0]
    assert "desc" in row["sort_order"]


def test_distribution_mode_hash_one_file_per_partition(spark, orders,
                                                       tmp_path):
    """write.distribution-mode=hash: a fragmented input (8 tasks x 3
    statuses) lands ONE file per partition value instead of up to 24
    — the table-property-driven small-file control Iceberg's own
    Spark writer applies."""
    from sling_cli_spark.sources.iceberg_py import (
        _active_files, _current_metadata, read_iceberg,
        set_iceberg_properties, write_iceberg)

    src = orders.select("o_orderkey", "o_orderstatus").limit(3000)

    base = str(tmp_path / "none")
    write_iceberg(src.repartition(8), base,
                  partition_by=["o_orderstatus"])
    n_none = len(_active_files(base, _current_metadata(base)[1], None))

    t = str(tmp_path / "hash")
    write_iceberg(src.limit(1), t, partition_by=["o_orderstatus"])
    props = set_iceberg_properties(
        t, {"write.distribution-mode": "hash"})
    assert props["write.distribution-mode"] == "hash"
    write_iceberg(src.repartition(8), t, mode="overwrite")
    files = _active_files(t, _current_metadata(t)[1], None)
    parts = {json.dumps(f.get("partition")) for f in files}
    assert len(files) == len(parts) == 3
    assert n_none > len(files)
    assert read_iceberg(spark, t).count() == src.count()

    # unset restores the incoming distribution
    props = set_iceberg_properties(
        t, {"write.distribution-mode": None})
    assert "write.distribution-mode" not in props


def test_distribution_mode_range_with_sort_order(spark, orders,
                                                 tmp_path):
    """range distribution keys on (partition cols, sort order): an
    unpartitioned sorted table gets table-wide disjoint file spans
    straight from the WRITE, no compaction pass needed."""
    import pyarrow.parquet as pq

    from sling_cli_spark.sources.iceberg_py import (
        _active_files, _current_metadata, set_iceberg_properties,
        write_iceberg)

    t = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_totalprice").limit(4000)
    write_iceberg(src.limit(1), t, sort_by=["o_orderkey"])
    set_iceberg_properties(t, {"write.distribution-mode": "range"})
    # test-scale data coalesces to one range partition under AQE
    # (the desired behavior at scale); pin it off to observe spans
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")
        write_iceberg(src.repartition(6), t, mode="overwrite")
    finally:
        spark.conf.set(key, prev)
    files = _active_files(t, _current_metadata(t)[1], None)
    assert len(files) >= 2
    spans = []
    for f in files:
        vals = pq.read_table(
            f["file_path"],
            columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert vals == sorted(vals)
        spans.append((vals[0], vals[-1]))
    spans.sort()
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2
