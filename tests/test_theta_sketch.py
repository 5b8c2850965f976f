"""Theta-sketch NDV statistics (Puffin apache-datasketches-theta-v1).

The reference delegates all Iceberg work to DuckDB's extension
(core/dbio/iop/iceberg.go) and has no ANALYZE surface; this is
public-spec statistics interchange (Iceberg spec §Table Statistics,
Puffin spec, DataSketches CompactSketch SerVer-3 layout).
"""

import struct

import pytest

from sling_cli_spark.sources.theta_sketch import (
    murmur3_x64_128, parse_sketch, seed_hash, sketch_from_hashes,
    update_hash)


def test_murmur3_x64_128_published_vectors():
    """The mmh3 package's README vectors (the same x64_128 variant
    DataSketches uses)."""
    h1, h2 = murmur3_x64_128(b"foo")
    as_signed = (struct.unpack("<q", struct.pack("<Q", h1))[0],
                 struct.unpack("<q", struct.pack("<Q", h2))[0])
    assert as_signed == (-2129773440516405919, 9128664383759220103)
    assert h1 | (h2 << 64) == \
        168394135621993849475852668931176482145
    assert murmur3_x64_128(b"") == (0, 0)
    # seed must change the hash; same input same seed is stable
    assert murmur3_x64_128(b"foo", 42) != murmur3_x64_128(b"foo")
    assert murmur3_x64_128(b"foo", 42) == murmur3_x64_128(b"foo", 42)


def test_tail_lengths_all_distinct():
    """Every tail length 0..16 exercises a distinct code path; all
    must produce distinct, deterministic hashes."""
    hs = [murmur3_x64_128(bytes(range(n))) for n in range(33)]
    assert len(set(hs)) == 33


def test_seed_hash_nonzero_stable():
    assert 0 < seed_hash() < 1 << 16
    assert seed_hash() == seed_hash()


def test_sketch_exact_roundtrip():
    hs = [update_hash(str(i).encode()) for i in range(500)]
    blob = sketch_from_hashes(hs, k=4096)
    p = parse_sketch(blob)
    assert p["entries"] == 500 and p["theta"] == 1.0
    assert p["estimate"] == 500.0
    assert p["seed_hash"] == seed_hash()
    # serialized hashes are ascending int64 (ordered compact layout)
    vals = [struct.unpack_from("<q", blob, 16 + 8 * i)[0]
            for i in range(500)]
    assert vals == sorted(vals)


def test_sketch_estimation_mode_accuracy():
    n = 80_000
    hs = [update_hash(struct.pack("<q", i)) for i in range(n)]
    p = parse_sketch(sketch_from_hashes(hs, k=4096))
    assert p["entries"] == 4096 and p["theta"] < 1.0
    assert abs(p["estimate"] - n) / n < 0.05


def test_sketch_empty_and_single():
    assert parse_sketch(sketch_from_hashes([]))["estimate"] == 0.0
    # single-item foreign form: preamble-longs 1, non-empty
    single = struct.pack("<BBBBBBH", 1, 3, 3, 0, 0, 0x1A, seed_hash())
    single += struct.pack("<q", 12345)
    assert parse_sketch(single)["estimate"] == 1.0


def test_analyze_writes_statistics_and_reader_agrees(spark, orders,
                                                     tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        analyze_iceberg, iceberg_ndv, iceberg_statistics, write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus",
                        "o_orderpriority").limit(1200)
    write_iceberg(src, path)
    ndvs = analyze_iceberg(spark, path)
    from pyspark.sql import functions as F
    truth = src.agg(*[
        F.countDistinct(c).alias(c)
        for c in ("o_orderkey", "o_orderstatus", "o_orderpriority")
    ]).collect()[0].asDict()
    assert ndvs["o_orderstatus"] == truth["o_orderstatus"]
    assert ndvs["o_orderpriority"] == truth["o_orderpriority"]
    assert ndvs["o_orderkey"] == truth["o_orderkey"]

    # the registered stats round-trip through the metadata reader
    assert iceberg_ndv(path) == ndvs
    stats = {r["column"]: r for r in
             iceberg_statistics(spark, path).collect()}
    assert stats["o_orderkey"]["blob_type"] \
        == "apache-datasketches-theta-v1"
    assert stats["o_orderkey"]["ndv"] == ndvs["o_orderkey"]

    # the sketch payload itself decodes to the same (exact) count —
    # i.e. a foreign DataSketches reader would see the right NDV
    from sling_cli_spark.sources import puffin
    from sling_cli_spark.sources.iceberg_py import _current_metadata
    _, meta = _current_metadata(path)
    entry = meta["statistics"][0]
    footer = puffin.read_footer(entry["statistics-path"])
    for b in footer["blobs"]:
        blob = puffin.read_blob(entry["statistics-path"],
                                b["offset"], b["length"])
        assert round(parse_sketch(blob)["estimate"]) \
            == int(b["properties"]["ndv"])


def test_analyze_kmv_path_for_large_columns(spark, orders, tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        analyze_iceberg, iceberg_ndv, write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus").limit(1500)
    write_iceberg(src, path)
    # force the KMV path by setting the exact threshold below the
    # key cardinality
    ndvs = analyze_iceberg(spark, path, max_exact_distinct=100, k=256)
    truth = src.select("o_orderkey").distinct().count()
    assert abs(ndvs["o_orderkey"] - truth) / truth < 0.15
    assert ndvs["o_orderstatus"] == 3
    assert iceberg_ndv(path) == ndvs


def test_analyze_respects_mor_deletes(spark, orders, tmp_path):
    """NDV counts LIVE rows: a merge-on-read delete must drop out."""
    from sling_cli_spark.sources.iceberg_py import (
        analyze_iceberg, upsert_iceberg, write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus").limit(100)
    write_iceberg(src, path)
    assert analyze_iceberg(spark, path)["o_orderkey"] == 100
    # equality-delete 10 keys (no new rows for them)
    from sling_cli_spark.sources.iceberg_py import (
        delete_missing_iceberg)
    keep = src.limit(90)
    delete_missing_iceberg(spark, path, keep, ["o_orderkey"])
    assert analyze_iceberg(spark, path)["o_orderkey"] == 90


def test_expire_snapshots_reclaims_stale_stats(spark, orders,
                                               tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, analyze_iceberg, expire_snapshots,
        write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey").limit(100)
    write_iceberg(src, path)
    analyze_iceberg(spark, path)
    _, meta = _current_metadata(path)
    old_stats = meta["statistics"][0]["statistics-path"]
    write_iceberg(src, path, mode="append")
    write_iceberg(src, path, mode="append")
    res = expire_snapshots(path, keep=1)
    assert res["expired"] == 2
    _, meta = _current_metadata(path)
    assert not meta.get("statistics")
    import os
    assert not os.path.exists(old_stats)
    assert old_stats in res["deleted_files"]


def test_partition_stats_file_roundtrip(spark, orders, tmp_path):
    """spec §Partition Statistics: the registered parquet file's rows
    agree with the manifests-arithmetic twin (iceberg_partitions),
    including MoR delete debt and last-updated lineage."""
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, compute_partition_stats,
        delete_missing_iceberg, iceberg_partitions,
        read_partition_stats, write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus").limit(600)
    write_iceberg(src, path, partition_by=["o_orderstatus"])
    keep = src.filter("o_orderstatus <> 'F' or o_orderkey % 2 = 0")
    delete_missing_iceberg(spark, path, keep, ["o_orderkey"],
                           use_dvs=True)

    res = compute_partition_stats(path)
    got = {r["partition"]["o_orderstatus"]: r
           for r in read_partition_stats(spark, path).collect()}
    twin = {}
    import json as _json
    for r in iceberg_partitions(spark, path).collect():
        twin[_json.loads(r["partition"])["o_orderstatus"]] = r
    assert set(got) == set(twin) and res["rows"] == len(twin)
    for k, r in got.items():
        t = twin[k]
        assert r["data_record_count"] == t["record_count"]
        assert r["data_file_count"] == t["file_count"]
        assert r["equality_delete_record_count"] \
            == t["equality_delete_record_count"]
    # delete debt is visible where it was created (this path produces
    # position deletes / DVs; equality-delete columns mirror the twin)
    assert any(r["position_delete_file_count"] > 0
               or r["equality_delete_file_count"] > 0
               for r in got.values())
    for k, r in got.items():
        assert r["position_delete_record_count"] \
            == twin[k]["position_delete_record_count"]
    # lineage points at retained snapshots with real timestamps
    _, meta = _current_metadata(path)
    ids = {s["snapshot-id"] for s in meta["snapshots"]}
    for r in got.values():
        assert r["last_updated_snapshot_id"] in ids
        assert r["last_updated_at"] > 0

    # recompute for the same snapshot replaces, not duplicates
    compute_partition_stats(path)
    _, meta = _current_metadata(path)
    assert len(meta["partition-statistics"]) == 1


def test_partition_stats_refuses_unpartitioned(spark, orders,
                                               tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        compute_partition_stats, write_iceberg)

    path = str(tmp_path / "t")
    write_iceberg(orders.limit(10), path)
    with pytest.raises(ValueError, match="unpartitioned"):
        compute_partition_stats(path)


def test_expire_snapshots_reclaims_partition_stats(spark, orders,
                                                   tmp_path):
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, compute_partition_stats, expire_snapshots,
        write_iceberg)

    path = str(tmp_path / "t")
    src = orders.select("o_orderkey", "o_orderstatus").limit(100)
    write_iceberg(src, path, partition_by=["o_orderstatus"])
    old = compute_partition_stats(path)["statistics-path"]
    write_iceberg(src, path, mode="append")
    res = expire_snapshots(path, keep=1)
    _, meta = _current_metadata(path)
    assert not meta.get("partition-statistics")
    import os
    assert not os.path.exists(old)
    assert old in res["deleted_files"]
