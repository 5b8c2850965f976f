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


def test_rest_list_pagination_multi_page(served):
    """>2 pages end-to-end over the socket (r10: pageToken/pageSize on
    both list endpoints, spec-optional pagination): 7 namespaces and
    25 tables drain through page size 3/10 with opaque tokens; an
    unpaginated client still gets everything in one round-trip."""
    srv, store = served
    for i in range(7):
        store.create_namespace(f"ns{i}")
    for i in range(25):
        store.register_table(
            f"ns0.t{i:02d}", f"/nowhere/v{i}.metadata.json")

    paged = RestCatalog(srv.uri, token="sekret", page_size=3)
    assert paged.list_namespaces() == [f"ns{i}" for i in range(7)]
    paged.page_size = 10  # 25 tables -> 3 pages
    assert paged.list_tables("ns0") == [
        ("ns0", f"t{i:02d}") for i in range(25)]

    # raw wire check: page 2 carries a token, the last page none
    req = urllib.request.Request(
        srv.uri + "/v1/namespaces?pageSize=3",
        headers={"Authorization": "Bearer sekret"})
    import json as _json
    with urllib.request.urlopen(req) as r:
        body = _json.loads(r.read())
    assert len(body["namespaces"]) == 3
    assert body["next-page-token"] == "3"
    req2 = urllib.request.Request(
        srv.uri + "/v1/namespaces?pageSize=3&pageToken=6",
        headers={"Authorization": "Bearer sekret"})
    with urllib.request.urlopen(req2) as r:
        body2 = _json.loads(r.read())
    assert len(body2["namespaces"]) == 1
    assert "next-page-token" not in body2

    # a client with no page_size gets the full list, no token
    plain = RestCatalog(srv.uri, token="sekret")
    assert len(plain.list_namespaces()) == 7


def test_rest_retry_backoff_on_429_and_5xx(served, monkeypatch):
    """r10: _req backs off and retries transient statuses (429 +
    gateway 5xx, honoring Retry-After); a non-transient 404 never
    retries; attempts are bounded."""
    import io
    import urllib.error as ue
    import urllib.request as ur

    srv, store = served
    store.create_namespace("db")
    cat = RestCatalog(srv.uri, token="sekret")

    real = ur.urlopen
    calls = {"n": 0}

    def flaky(req, timeout=None):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ue.HTTPError(
                req.full_url, 429, "slow down",
                {"Retry-After": "0.01"}, io.BytesIO(b"{}"))
        return real(req, timeout=timeout)

    monkeypatch.setattr(ur, "urlopen", flaky)
    assert cat.list_namespaces() == ["db"]
    assert calls["n"] == 3  # 2 throttles + 1 success

    calls["n"] = 0

    def always_503(req, timeout=None):
        calls["n"] += 1
        raise ue.HTTPError(req.full_url, 503, "down", {},
                           io.BytesIO(b"{}"))

    monkeypatch.setattr(ur, "urlopen", always_503)
    cat._MAX_RETRIES  # bounded by the class constant
    with pytest.raises(CatalogError, match="503"):
        cat.list_namespaces()
    assert calls["n"] == RestCatalog._MAX_RETRIES + 1

    calls["n"] = 0

    def always_404(req, timeout=None):
        calls["n"] += 1
        raise ue.HTTPError(
            req.full_url, 404, "nope", {}, io.BytesIO(
                b'{"error": {"type": "NoSuchNamespaceException",'
                b' "message": "x"}}'))

    monkeypatch.setattr(ur, "urlopen", always_404)
    from sling_cli_spark.sources.iceberg_catalog import NoSuchNamespace
    with pytest.raises(NoSuchNamespace):
        cat.namespace_properties("gone")
    assert calls["n"] == 1  # non-transient: no retry


def test_rest_catalog_wap_el(served, spark, tmp_path):
    """WAP through a catalog://...?uri= REST target (r10): staging
    commits the branch snapshot via the requirements/updates handshake
    (main's assert-ref-snapshot-id unchanged), publish moves main with
    set-snapshot-ref; a failing gate leaves the REST main view at the
    published state with the branch inspectable."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sinks.writers import AuditFailed
    from sling_cli_spark.sources.iceberg_catalog import (
        _read_meta, read_table)
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    srv, _ = served
    url = f"catalog://db.t?uri={srv.uri}&token=sekret"
    gate = "SELECT * FROM _audit WHERE id IS NULL"

    def cfg(stream):
        return Config.from_dict({
            "source": {"stream": stream},
            "target": {"object": url, "options": {
                "format": "iceberg", "audit_branch": "audit",
                "audit_sql": gate}},
            "mode": "full-refresh"})

    src = str(tmp_path / "s.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .write.parquet(src)
    run(spark, cfg(src))
    cat = RestCatalog(srv.uri, token="sekret")
    assert {r["id"] for r in read_table(cat, spark, "db.t").collect()} \
        == {1, 2}

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(None, "BAD")], "id long, v string") \
        .write.parquet(bad)
    with pytest.raises(AuditFailed):
        run(spark, cfg(bad))
    assert {r["id"] for r in read_table(cat, spark, "db.t").collect()} \
        == {1, 2}
    meta = _read_meta(cat.load_table("db.t"))
    staged = read_iceberg(spark, meta["location"], ref="audit")
    assert staged.filter("id IS NULL").count() == 1


def test_rest_commit_transaction(spark, tmp_path):
    """r10: POST /v1/transactions/commit — two tables' staged writes
    land under ONE atomic server-side commit; a stale requirement on
    the second table leaves the first untouched."""
    import pytest as _pytest

    from sling_cli_spark.sources.iceberg_catalog import (
        CommitConflict, SqlCatalog, create_table, read_table,
        run_committed_many)
    from sling_cli_spark.sources.iceberg_py import write_iceberg
    from sling_cli_spark.sources.iceberg_rest import (
        RestCatalog, RestCatalogServer)

    store = SqlCatalog(str(tmp_path / "c.db"),
                       warehouse=str(tmp_path / "wh"))
    srv = RestCatalogServer(store, token="t").start()
    try:
        cat = RestCatalog(srv.uri, token="t")
        cat.create_namespace("db")
        df = spark.range(4).selectExpr("id", "id * 3 as x")
        create_table(cat, "db.a", df.schema)
        create_table(cat, "db.b", df.schema)
        run_committed_many(cat, [
            ("db.a", lambda loc: write_iceberg(df, loc,
                                               mode="append")),
            ("db.b", lambda loc: write_iceberg(df, loc,
                                               mode="append")),
        ])
        assert read_table(cat, spark, "db.a").count() == 4
        assert read_table(cat, spark, "db.b").count() == 4
        # a VALID staged change on db.a + a failing requirement on
        # db.b -> 409 -> db.a's pointer must NOT move either
        a_ml, b_ml = cat.load_table("db.a"), cat.load_table("db.b")
        a_loc = a_ml.rsplit("/metadata/", 1)[0]
        write_iceberg(df, a_loc, mode="append")  # staged, uncommitted
        good = cat._table_change(
            "db.a", a_ml, a_ml.replace("v2", "v3"))
        bad = {"identifier": {"namespace": ["db"], "name": "b"},
               "requirements": [
                   {"type": "assert-table-uuid", "uuid": "nope"}],
               "updates": []}
        with _pytest.raises(CommitConflict):
            cat._req("POST", "/v1/transactions/commit",
                     {"table-changes": [good, bad]})
        assert cat.load_table("db.a") == a_ml
        assert cat.load_table("db.b") == b_ml
        # without the bad change the same transaction lands
        cat._req("POST", "/v1/transactions/commit",
                 {"table-changes": [good]})
        assert cat.load_table("db.a").endswith("v3.metadata.json")
        assert read_table(cat, spark, "db.a").count() == 8
    finally:
        srv.stop()


def test_namespace_properties_update(tmp_path):
    """r10: spec updateProperties — set + remove in one transaction,
    missing removals reported, update/remove overlap refused; same
    verb over SQL and REST."""
    import pytest as _pytest

    from sling_cli_spark.sources.iceberg_catalog import (
        CatalogError, SqlCatalog)
    from sling_cli_spark.sources.iceberg_rest import (
        RestCatalog, RestCatalogServer)

    store = SqlCatalog(str(tmp_path / "c.db"))
    store.create_namespace("db", {"owner": "etl"})
    got = store.update_namespace_properties(
        "db", {"owner": "ml", "tier": "gold"}, ["nope"])
    assert got == {"updated": ["owner", "tier"], "removed": [],
                   "missing": ["nope"]}
    assert store.namespace_properties("db")["owner"] == "ml"
    with _pytest.raises(CatalogError, match="both"):
        store.update_namespace_properties("db", {"x": 1}, ["x"])

    srv = RestCatalogServer(store, token="t").start()
    try:
        cat = RestCatalog(srv.uri, token="t")
        got = cat.update_namespace_properties(
            "db", {"tier": "silver"}, ["owner"])
        assert got["updated"] == ["tier"] and got["removed"] == \
            ["owner"]
        props = cat.namespace_properties("db")
        assert props["tier"] == "silver" and "owner" not in props
    finally:
        srv.stop()


def test_rest_commit_many_unwinds_creates_on_txn_failure(spark, tmp_path):
    """r11 advice fix: commit_many registers creates (expected=None)
    per-table BEFORE the atomic transaction POST (the spec has no
    transactional register). If the transaction then fails, the
    registered creates must be rolled back so the call stays
    all-or-none like the SqlCatalog twin."""
    import pytest as _pytest

    from sling_cli_spark.sources.iceberg_catalog import (
        CommitConflict, SqlCatalog, create_table)
    from sling_cli_spark.sources.iceberg_py import write_iceberg
    from sling_cli_spark.sources.iceberg_rest import (
        RestCatalog, RestCatalogServer)

    store = SqlCatalog(str(tmp_path / "c.db"),
                       warehouse=str(tmp_path / "wh"))
    srv = RestCatalogServer(store, token="t").start()
    try:
        cat = RestCatalog(srv.uri, token="t")
        cat.create_namespace("db")
        df = spark.range(3).selectExpr("id", "id * 2 as x")
        create_table(cat, "db.existing", df.schema)
        import glob as _glob
        v1 = cat.load_table("db.existing")
        loc = v1.rsplit("/metadata/", 1)[0]
        # advance the table out-of-band so v1 goes stale (both
        # metadata files exist on shared storage)
        write_iceberg(df, loc, mode="append")
        v2 = sorted(_glob.glob(loc + "/metadata/*.metadata.json"))[-1]
        cat.commit_table("db.existing", v1, v2)
        ml = cat.load_table("db.existing")
        # stage a fresh table out-of-catalog for the create leg
        new_loc = str(tmp_path / "wh" / "db" / "fresh")
        write_iceberg(df, new_loc, mode="overwrite")
        import glob
        new_ml = sorted(glob.glob(new_loc + "/metadata/*.metadata.json"))[-1]
        # change leg asserts the STALE v1 base -> 409
        with _pytest.raises(CommitConflict):
            cat.commit_many([
                ("db.fresh", None, new_ml),
                ("db.existing", v1, v2),
            ])
        assert not cat.table_exists("db.fresh"), \
            "registered create must unwind when the transaction fails"
        assert cat.load_table("db.existing") == ml
        # the same creates-only call (no table-changes) still lands
        cat.commit_many([("db.fresh", None, new_ml)])
        assert cat.table_exists("db.fresh")
    finally:
        srv.stop()
