"""Iceberg REST catalog client + serving twin (reference
database_iceberg.go connectREST:90-250; wire format = the public
Iceberg REST Catalog OpenAPI)."""

import urllib.request

import pytest

from pyspark.sql import functions as F

from sling_cli_spark.sources.iceberg_catalog import (
    CatalogError, CommitConflict, NoSuchTable, SqlCatalog,
    create_table, max_value, read_table, table_columns, write_table)
from sling_cli_spark.sources.iceberg_rest import (
    RestCatalog, RestCatalogServer)


@pytest.fixture
def served(tmp_path):
    store = SqlCatalog(str(tmp_path / "cat.db"),
                       warehouse=str(tmp_path / "wh"))
    srv = RestCatalogServer(store, token="sekret",
                            credential="etl:hunter2").start()
    try:
        yield srv, store
    finally:
        srv.stop()


def test_rest_roundtrip_through_bridges(served, spark):
    srv, _ = served
    cat = RestCatalog(srv.uri, token="sekret")
    # warehouse arrives via /v1/config defaults
    assert cat.warehouse and cat.warehouse.endswith("wh")
    cat.create_namespace("db", {"owner": "etl"})
    assert cat.list_namespaces() == ["db"]
    assert cat.namespace_properties("db")["owner"] == "etl"

    df = spark.range(6).select("id", F.lit("a").alias("v"))
    create_table(cat, "db.t", df.schema)
    write_table(df, cat, "db.t")
    write_table(df.withColumn("id", F.col("id") + 6), cat, "db.t")
    got = read_table(cat, spark, "db.t")
    assert {r["id"] for r in got.collect()} == set(range(12))
    assert cat.load_table("db.t").endswith("v3.metadata.json")
    assert table_columns(cat, "db.t") == [
        ("id", "long", False), ("v", "string", False)]
    assert max_value(cat, "db.t", "id") == 11
    assert cat.list_tables() == [("db", "t")]
    assert cat.table_exists("db.t") and not cat.table_exists("db.x")

    cat.rename_table("db.t", "db.u")
    assert read_table(cat, spark, "db.u").count() == 12
    cat.drop_table("db.u")
    with pytest.raises(NoSuchTable):
        cat.load_table("db.u")
    cat.drop_namespace("db")


def test_rest_commit_conflict_409(served, spark):
    srv, store = served
    cat = RestCatalog(srv.uri, token="sekret")
    cat.create_namespace("db")
    create_table(cat, "db.t", spark.range(0).schema)
    write_table(spark.range(3), cat, "db.t")
    # a rival commit moves the pointer directly in the backing store
    # (to a real metadata file, as a real racer's would be)
    ml = store.load_table("db.t")
    rival = ml.replace("v2.metadata", "v0.metadata")
    with open(ml, "rb") as f:
        body = f.read()
    with open(rival, "wb") as f:
        f.write(body)
    store.commit_table("db.t", ml, rival)
    with pytest.raises(CommitConflict):
        write_table(spark.range(5), cat, "db.t")
    # the store's pointer view is intact
    assert store.load_table("db.t").endswith("v0.metadata.json")


def test_rest_auth_modes(served, spark):
    srv, _ = served
    # no token -> 401 mapped to CatalogError
    with pytest.raises(CatalogError):
        RestCatalog(srv.uri)
    with pytest.raises(CatalogError):
        RestCatalog(srv.uri, token="wrong")
    # OAuth2 client-credentials exchange (reference rest.WithCredential)
    cat = RestCatalog(srv.uri, credential="etl:hunter2")
    assert cat.token == "sekret"
    with pytest.raises(Exception):
        RestCatalog(srv.uri, credential="etl:wrongpw")


def test_rest_server_side_create_table(served, spark):
    srv, _ = served
    cat = RestCatalog(srv.uri, token="sekret")
    cat.create_namespace("db")
    ml = cat.create_table("db.t", {
        "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False,
             "type": "long"},
            {"id": 2, "name": "v", "required": False,
             "type": "string"}]})
    assert ml.endswith("v1.metadata.json")
    assert read_table(cat, spark, "db.t").count() == 0
    # and the ordinary catalog write path continues from there
    write_table(spark.range(4).select(
        "id", F.lit("x").alias("v")), cat, "db.t")
    assert read_table(cat, spark, "db.t").count() == 4


def test_rest_swap_via_renames(served, spark):
    srv, _ = served
    cat = RestCatalog(srv.uri, token="sekret")
    cat.create_namespace("db")
    create_table(cat, "db.a", spark.range(0).schema)
    create_table(cat, "db.b", spark.range(0).schema)
    write_table(spark.range(2), cat, "db.a")
    write_table(spark.range(7), cat, "db.b")
    cat.swap_tables("db.a", "db.b")
    assert read_table(cat, spark, "db.a").count() == 7
    assert read_table(cat, spark, "db.b").count() == 2


def test_rest_multilevel_namespace_unit_separator(served):
    """Spec: nested namespaces travel URL-encoded with 0x1F joins."""
    srv, store = served
    cat = RestCatalog(srv.uri, token="sekret")
    cat.create_namespace("a.b.c")
    assert cat.namespace_exists("a.b.c")
    assert store.namespace_exists("a.b.c")
    # the URL really used the unit separator, not a dot
    req = urllib.request.Request(
        srv.uri + "/v1/namespaces/a%1Fb%1Fc",
        headers={"Authorization": "Bearer sekret"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    cat.drop_namespace("a.b.c")
