"""Pin the staged-file codec byte cut (r15, guide §6).

The lake staging paths (delta ``_stage_data_files``, iceberg stage
writes, the streaming sinks) write zstd parquet. This test measures the
actual byte cut against a snappy stage of the SAME frame — the
bytes-written measurement VERDICT r14 asked for (wall-clock can't A/B a
codec above sandbox I/O variance, file sizes can) — and pins that the
staged files really are zstd and read back value-identical.
"""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def orders(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    p = os.path.join(sf_dir, "orders.parquet")
    if not os.path.exists(p):
        pytest.skip("no testdata")
    return spark.read.parquet(p)


def test_staged_delta_files_are_zstd_and_smaller(spark, tmp_path, orders):
    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    t = str(tmp_path / "t")
    write_delta(orders.coalesce(2), t)
    files = [f for f in glob.glob(t + "/*.parquet")]
    assert files and all(f.endswith(".zstd.parquet") for f in files)
    # parquet footer says zstd for every column chunk
    md = pq.ParquetFile(files[0]).metadata
    codecs = {md.row_group(g).column(c).compression
              for g in range(md.num_row_groups)
              for c in range(md.row_group(g).num_columns)}
    assert codecs == {"ZSTD"}
    zstd_bytes = sum(os.path.getsize(f) for f in files)

    # the same frame staged with snappy (what the writer used before
    # r15): zstd must be a real byte cut, not a wash
    snap = str(tmp_path / "snap")
    orders.coalesce(2).write.option("compression", "snappy").parquet(snap)
    snappy_bytes = sum(os.path.getsize(f)
                       for f in glob.glob(snap + "/*.parquet"))
    cut = 1 - zstd_bytes / snappy_bytes
    assert cut > 0.10, f"zstd cut only {cut:.1%} vs snappy"

    # value-identity: the staged files read back exactly
    back = read_delta(spark, t)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0

    # add.stats still ride the staged files (the footer fast path reads
    # zstd footers like any other)
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    adds = [json.loads(ln)["add"] for ln in open(log)
            if '"add"' in ln]
    assert adds and all("stats" in a and
                        json.loads(a["stats"])["numRecords"] > 0
                        for a in adds)


def test_staged_iceberg_files_are_zstd(spark, tmp_path, orders):
    from sling_cli_spark.sources.iceberg_py import (
        read_iceberg, write_iceberg)

    t = str(tmp_path / "t")
    write_iceberg(orders.coalesce(2), t)
    files = [f for f in glob.glob(t + "/data/*.parquet")]
    assert files
    md = pq.ParquetFile(files[0]).metadata
    codecs = {md.row_group(g).column(c).compression
              for g in range(md.num_row_groups)
              for c in range(md.row_group(g).num_columns)}
    assert codecs == {"ZSTD"}
    back = read_iceberg(spark, t)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0
