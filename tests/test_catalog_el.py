"""EL runner over catalog-managed Iceberg tables (catalog:// URLs —
the reference routes the same flows through an IcebergConn target:
database_iceberg.go BulkImportStream:1252 / StreamRowsContext:741)."""

import os

import pytest

from pyspark.sql import functions as F

from sling_cli_spark.config import Config
from sling_cli_spark.runner import run
from sling_cli_spark.sources.iceberg_catalog import (
    SqlCatalog, read_table)


@pytest.fixture
def caturl(tmp_path):
    db = str(tmp_path / "c.db")
    SqlCatalog(db, warehouse=str(tmp_path / "wh"))
    wh = str(tmp_path / "wh")
    return lambda ident: f"catalog://{ident}?db={db}&warehouse={wh}"


def _cat(url):
    from sling_cli_spark.sources.iceberg_catalog import open_catalog_url
    return open_catalog_url(url)


def test_full_refresh_into_catalog_autocreates(spark, tmp_path,
                                               caturl):
    src = str(tmp_path / "src.parquet")
    spark.range(10).selectExpr(
        "id", "cast(id * 2 as double) as x").write.parquet(src)
    url = caturl("db.t")
    cfg = Config.from_dict({
        "source": {"stream": src},
        "target": {"object": url},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 10
    cat, ident = _cat(url)
    # namespace + empty table were auto-created, then the batch
    # committed under the pointer CAS (v1 create -> v2 data)
    assert cat.load_table(ident).endswith("v2.metadata.json")
    assert read_table(cat, spark, ident).count() == 10
    # incremental without a PK appends (the reference's append shape)
    cfg2 = Config.from_dict({
        "source": {"stream": src},
        "target": {"object": url},
        "mode": "incremental"})
    run(spark, cfg2)
    assert read_table(cat, spark, ident).count() == 20


def test_catalog_source_to_file_with_watermark(spark, tmp_path,
                                               caturl):
    url = caturl("db.ev")
    cat, ident = _cat(url)
    from sling_cli_spark.sources.iceberg_catalog import (
        create_table, write_table)
    df = spark.range(100).selectExpr("id", "id % 7 as k")
    cat.create_namespace("db")
    create_table(cat, ident, df.schema)
    write_table(df, cat, ident)
    out = str(tmp_path / "out.parquet")
    cfg = Config.from_dict({
        "source": {"stream": url, "where": "k = 3"},
        "target": {"object": out},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 14
    got = spark.read.parquet(out)
    assert got.count() == 14
    assert got.agg(F.min("k"), F.max("k")).first() == (3, 3)


def test_incremental_merge_through_catalog(spark, tmp_path, caturl):
    """update_insert merge against a catalog-managed target: the
    merge commits locally, then the pointer CAS swaps it in."""
    url = caturl("db.m")
    cat, ident = _cat(url)
    from sling_cli_spark.sources.iceberg_catalog import (
        create_table, write_table)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, v string, w long")
    cat.create_namespace("db")
    create_table(cat, ident, base.schema)
    write_table(base, cat, ident)

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)],
        "id long, v string, w long").write.parquet(src)
    cfg = Config.from_dict({
        "source": {"stream": src, "primary_key": ["id"],
                   "update_key": "w"},
        "target": {"object": url,
                   "options": {"merge_strategy": "update_insert"}},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=read_table(cat, spark, ident))
    assert r.rows == 2
    got = {row["id"]: (row["v"], row["w"])
           for row in read_table(cat, spark, ident).collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30),
                   4: ("d", 40)}
    # the merge advanced the catalog pointer (not just the hint)
    assert cat.load_table(ident).endswith("v3.metadata.json")


def test_idempotent_txn_through_catalog(spark, tmp_path, caturl):
    src = str(tmp_path / "src.parquet")
    spark.range(5).write.parquet(src)
    url = caturl("db.i")
    cfg = {
        "source": {"stream": src},
        "target": {"object": url,
                   "options": {"txn_app_id": "job1",
                               "txn_version": 1}},
        "mode": "incremental"}
    r1 = run(spark, Config.from_dict(cfg))
    assert r1.rows == 5
    # replay of the same (app, version): short-circuits, no new rows
    r2 = run(spark, Config.from_dict(cfg))
    assert r2.rows == 0
    cat, ident = _cat(url)
    assert read_table(cat, spark, ident).count() == 5
    # next version lands
    cfg["target"]["options"]["txn_version"] = 2
    assert run(spark, Config.from_dict(cfg)).rows == 5
    assert read_table(cat, spark, ident).count() == 10


def test_ignore_existing_catalog_target(spark, tmp_path, caturl):
    src = str(tmp_path / "src.parquet")
    spark.range(4).write.parquet(src)
    url = caturl("db.g")
    cfg = {
        "source": {"stream": src},
        "target": {"object": url, "options": {"ignore_existing": True}},
        "mode": "full-refresh"}
    assert run(spark, Config.from_dict(cfg)).rows == 4
    # target now holds data -> the task is skipped
    assert run(spark, Config.from_dict(cfg)).rows == 0
    cat, ident = _cat(url)
    assert read_table(cat, spark, ident).count() == 4


def test_catalog_view_as_el_source(spark, tmp_path, caturl):
    """r10: a catalog VIEW is a first-class EL source — the runner
    resolves + runs its SQL and lands the result; the view's own
    replace history stays queryable behind the same URL."""
    from sling_cli_spark.sources import iceberg_views as V
    from sling_cli_spark.sources.iceberg_catalog import (
        create_table, write_table)

    url = caturl("db.by_k")
    cat, _ = _cat(url)
    cat.create_namespace("db")
    df = spark.range(20).selectExpr("id", "id % 4 as k")
    create_table(cat, "db.base", df.schema)
    write_table(df, cat, "db.base")
    V.create_view(cat, spark, "db.by_k",
                  "SELECT k, COUNT(*) AS n, SUM(id) AS total "
                  "FROM db.base GROUP BY k")

    out = str(tmp_path / "out.parquet")
    r = run(spark, Config.from_dict({
        "source": {"stream": url},
        "target": {"object": out},
        "mode": "full-refresh"}))
    assert r.rows == 4
    got = {(x.k, x.n, x.total)
           for x in spark.read.parquet(out).collect()}
    assert got == {(0, 5, 40), (1, 5, 45), (2, 5, 50), (3, 5, 55)}

    # replacing the view changes what the SAME source url loads
    V.replace_view(cat, spark, "db.by_k",
                   "SELECT k, MAX(id) AS mx FROM db.base GROUP BY k")
    out2 = str(tmp_path / "out2.parquet")
    run(spark, Config.from_dict({
        "source": {"stream": url},
        "target": {"object": out2},
        "mode": "full-refresh"}))
    assert {(x.k, x.mx) for x in spark.read.parquet(out2).collect()} \
        == {(0, 16), (1, 17), (2, 18), (3, 19)}
