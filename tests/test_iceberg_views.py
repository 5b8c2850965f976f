"""Iceberg views (public View Spec v1) over the SQL + REST catalogs.

Beyond-reference row: sling's Iceberg connection is tables-only
(``database_iceberg.go`` GetTables:514), but views are the standard
derived-query surface of a real warehouse; formats are fully public
(iceberg.apache.org/view-spec + the REST OpenAPI view endpoints).
"""

import json

import pytest

from sling_cli_spark import fsio
from sling_cli_spark.sources import iceberg_views as V
from sling_cli_spark.sources.iceberg_catalog import (
    CatalogError, CommitConflict, NoSuchView, SqlCatalog,
    ViewAlreadyExists, create_table, write_table)


@pytest.fixture
def cat(tmp_path):
    return SqlCatalog(str(tmp_path / "catalog.db"),
                      warehouse=str(tmp_path / "wh"))


@pytest.fixture
def orders(cat, spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, seg string, amt double")
    cat.create_namespace("db")
    create_table(cat, "db.orders", df.schema)
    write_table(df, cat, "db.orders")
    return df


# -- pointer store ----------------------------------------------------------

def test_view_pointer_crud(cat):
    cat.create_namespace("db")
    cat.register_view("db.v1", "/tmp/x/00001-a.metadata.json")
    assert cat.view_exists("db.v1")
    assert cat.load_view("db.v1") == "/tmp/x/00001-a.metadata.json"
    assert cat.list_views() == [("db", "v1")]
    # views never leak into the table listing and vice versa
    assert cat.list_tables() == []
    assert not cat.table_exists("db.v1")
    cat.rename_view("db.v1", "db.v2")
    assert cat.list_views() == [("db", "v2")]
    cat.drop_view("db.v2")
    with pytest.raises(NoSuchView):
        cat.load_view("db.v2")


def test_view_table_name_collision(cat, spark, orders):
    # a view may not shadow a table (shared identifier namespace)
    with pytest.raises(ViewAlreadyExists):
        V.create_view(cat, spark, "db.orders", "SELECT 1 AS x")
    cat.register_view("db.v", "/tmp/m.metadata.json")
    with pytest.raises(ViewAlreadyExists):
        cat.register_view("db.v", "/tmp/other.metadata.json")


def test_view_commit_cas(cat):
    cat.create_namespace("db")
    cat.register_view("db.v", "/a/00001-x.metadata.json")
    cat.commit_view("db.v", "/a/00001-x.metadata.json",
                    "/a/00002-y.metadata.json")
    with pytest.raises(CommitConflict):
        cat.commit_view("db.v", "/a/00001-x.metadata.json",
                        "/a/00003-z.metadata.json")


# -- lifecycle over the SQL catalog ----------------------------------------

def test_create_read_view(cat, spark, orders):
    ml = V.create_view(
        cat, spark, "db.agg",
        "SELECT seg, SUM(amt) AS total FROM db.orders GROUP BY seg")
    got = {(r.seg, r.total)
           for r in V.read_view(cat, spark, "db.agg").collect()}
    assert got == {("a", 40.0), ("b", 20.0)}
    meta = json.loads(fsio.get_fs(ml).read_bytes(ml))
    assert meta["format-version"] == 1
    assert meta["current-version-id"] == 1
    v = meta["versions"][0]
    assert v["representations"][0]["dialect"] == "spark"
    assert v["default-namespace"] == ["db"]
    # schema was ANALYZED at create time (spec: engines store the
    # output schema)
    names = [f["name"] for f in meta["schemas"][0]["fields"]]
    assert names == ["seg", "total"]


def test_bare_name_default_namespace(cat, spark, orders):
    V.create_view(cat, spark, "db.agg",
                  "SELECT COUNT(*) AS n FROM orders")
    assert V.read_view(cat, spark, "db.agg").collect()[0].n == 3


def test_replace_and_version_pinning(cat, spark, orders):
    V.create_view(cat, spark, "db.agg",
                  "SELECT SUM(amt) AS total FROM db.orders")
    V.replace_view(cat, spark, "db.agg",
                   "SELECT MAX(amt) AS total FROM db.orders")
    assert V.read_view(
        cat, spark, "db.agg").collect()[0].total == 30.0
    # spec: replaced versions are retained history
    assert V.read_view(
        cat, spark, "db.agg", version_id=1).collect()[0].total == 60.0
    vv = {r.version_id: r for r in
          V.view_versions(cat, spark, "db.agg").collect()}
    assert vv[1].operation == "create" and not vv[1].is_current
    assert vv[2].operation == "replace" and vv[2].is_current
    with pytest.raises(CatalogError):
        V.read_view(cat, spark, "db.agg", version_id=9)
    # time travel by instant: latest version at or before
    meta = V.load_view_metadata(cat, "db.agg")
    t1 = int(meta["versions"][0]["timestamp-ms"])
    assert V.read_view(cat, spark, "db.agg",
                       as_of_timestamp_ms=t1).collect()[0].total \
        == 60.0
    with pytest.raises(CatalogError, match="predates"):
        V.read_view(cat, spark, "db.agg", as_of_timestamp_ms=t1 - 10)


def test_nested_views_and_cycle_guard(cat, spark, orders):
    V.create_view(cat, spark, "db.base",
                  "SELECT seg, SUM(amt) AS total FROM db.orders "
                  "GROUP BY seg")
    V.create_view(cat, spark, "db.top",
                  "SELECT seg FROM db.base WHERE total > 25")
    assert [r.seg for r in
            V.read_view(cat, spark, "db.top").collect()] == ["a"]
    # forge a cycle: base -> top -> base (replace analyzes against
    # base's OLD definition, so the cycle only bites on read)
    V.replace_view(cat, spark, "db.base",
                   "SELECT seg, 1.0 AS total FROM db.top")
    with pytest.raises(CatalogError, match="cycl"):
        V.read_view(cat, spark, "db.base").collect()


def test_history_trim(cat, spark, orders):
    V.create_view(cat, spark, "db.agg",
                  "SELECT 1 AS x FROM db.orders LIMIT 1",
                  properties={"version.history.num-entries": 2})
    for i in range(3):
        V.replace_view(cat, spark, "db.agg",
                       f"SELECT {i + 2} AS x FROM db.orders LIMIT 1")
    meta = V.load_view_metadata(cat, "db.agg")
    assert [v["version-id"] for v in meta["versions"]] == [3, 4]
    assert meta["current-version-id"] == 4
    # schemas referenced only by trimmed versions are dropped too
    kept = {v["schema-id"] for v in meta["versions"]}
    assert {s["schema-id"] for s in meta["schemas"]} == kept


def test_apply_view_updates_actions():
    meta = V.author_view_metadata(
        "/tmp/v", {"type": "struct", "schema-id": 0, "fields": []},
        V.new_view_version("SELECT 1", version_id=1, schema_id=0,
                           default_namespace="db"))
    out = V.apply_view_updates(meta, [
        {"action": "set-properties", "updates": {"comment": "hi"}},
        {"action": "set-location", "location": "/tmp/v2"},
    ])
    assert out["properties"]["comment"] == "hi"
    assert out["location"] == "/tmp/v2"
    out = V.apply_view_updates(out, [
        {"action": "remove-properties", "removals": ["comment"]}])
    assert "comment" not in out["properties"]
    with pytest.raises(CatalogError, match="unsupported"):
        V.apply_view_updates(meta, [{"action": "warp-core"}])
    with pytest.raises(CatalogError):
        V.apply_view_updates(meta, [
            {"action": "set-current-view-version",
             "view-version-id": -1}])


# -- lifecycle over REST ----------------------------------------------------

@pytest.fixture
def rest(cat):
    from sling_cli_spark.sources.iceberg_rest import (
        RestCatalog, RestCatalogServer)
    srv = RestCatalogServer(cat, token="t").start()
    try:
        yield RestCatalog(srv.uri, token="t")
    finally:
        srv.stop()


def test_rest_view_lifecycle(cat, spark, orders, rest):
    V.create_view(
        rest, spark, "db.agg",
        "SELECT seg, SUM(amt) AS total FROM db.orders GROUP BY seg")
    assert rest.list_views("db") == [("db", "agg")]
    assert rest.view_exists("db.agg")
    got = {(r.seg, r.total)
           for r in V.read_view(rest, spark, "db.agg").collect()}
    assert got == {("a", 40.0), ("b", 20.0)}
    V.replace_view(rest, spark, "db.agg",
                   "SELECT MAX(amt) AS mx FROM db.orders")
    assert V.read_view(rest, spark, "db.agg").collect()[0].mx == 30.0
    meta = V.load_view_metadata(rest, "db.agg")
    assert [v["version-id"] for v in meta["versions"]] == [1, 2]
    # stale view-uuid -> CommitFailedException -> CommitConflict
    bad = dict(meta, **{"view-uuid": "not-the-uuid"})
    with pytest.raises(CommitConflict):
        rest.post_replace_view(
            "db.agg", bad, meta["schemas"][0],
            V.new_view_version("SELECT 1", version_id=-1,
                               schema_id=-1, default_namespace="db"))
    rest.rename_view("db.agg", "db.agg2")
    assert rest.list_views("db") == [("db", "agg2")]
    rest.drop_view("db.agg2")
    assert not rest.view_exists("db.agg2")
    with pytest.raises(NoSuchView):
        rest.load_view("db.agg2")


def test_rest_create_collides_with_table(cat, spark, orders, rest):
    with pytest.raises(ViewAlreadyExists):
        V.create_view(rest, spark, "db.orders", "SELECT 1 AS x")


def test_view_sql_literals_and_comments_not_rewritten(tmp_path, spark):
    """r11 advice fix: a catalog identifier inside a string literal,
    comment, or backticked identifier must survive resolution
    verbatim — only code spans rewrite to temp views."""
    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, create_table, write_table)
    from sling_cli_spark.sources.iceberg_views import (
        create_view, read_view)

    cat = SqlCatalog(str(tmp_path / "c.db"),
                     warehouse=str(tmp_path / "wh"))
    cat.create_namespace("db")
    df = spark.range(3).selectExpr("id", "id * 2 as x")
    create_table(cat, "db.t", df.schema)
    write_table(df, cat, "db.t", mode="append")
    create_view(
        cat, spark, "db.v",
        "SELECT id, x, 'db.t' AS src,  -- db.t stays in this comment\n"
        "       /* join db.t here? no */ 'from db.t' AS note\n"
        "FROM db.t",
        default_namespace="db")
    rows = read_view(cat, spark, "db.v").orderBy("id").collect()
    assert [r.id for r in rows] == [0, 1, 2]
    assert rows[0].src == "db.t", "literal was rewritten"
    assert rows[0].note == "from db.t", "literal after FROM rewritten"
