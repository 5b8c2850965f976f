"""The DB-target lifecycle on stdlib sqlite3 — a SECOND live embedded
engine behind sinks/db_load.run_db (third overall with Derby over
JDBC), proving the orchestration is not DuckDB-coupled: staged batches
ingest via batched executemany (the reference's generic
prepared-statement loader, database.go:2437-2503), merges render from
the sqlite dialect pack (sqlite.yaml — INSERT..ON CONFLICT upsert,
UPDATE..FROM), and sqlite's no-ALTER-COLUMN-TYPE limitation gates the
adjust_column_type path instead of crashing it."""

import os

import pytest

from sling_cli_spark.config import Config
from sling_cli_spark.sinks.db_load import SQLiteTarget, run_db


@pytest.fixture()
def sqlite_db(tmp_path):
    db = SQLiteTarget(str(tmp_path / "t.db"))
    yield db
    db.close()


def _csv(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_sqlite_full_refresh_swap(spark, tmp_path, sqlite_db):
    src = _csv(tmp_path, "in.csv",
               "id,name,ts\n1,a,2024-01-01 10:00:00\n2,b,2024-01-02 10:00:00\n")
    cfg = Config.from_dict({
        "source": {"stream": src, "options": {"format": "csv"}},
        "target": {"object": "main.t1"},
        "mode": "full-refresh"})
    r = run_db(spark, cfg, sqlite_db)
    assert r.rows == 2
    assert sqlite_db.get_count("main.t1") == 2
    # FileToDB stamps _sling_loaded_at like the reference
    assert "_sling_loaded_at" in [c for c, _ in sqlite_db.columns("main.t1")]
    # full refresh again replaces via the temp-table swap
    r2 = run_db(spark, cfg, sqlite_db)
    assert r2.rows == 2 and sqlite_db.get_count("main.t1") == 2


def test_sqlite_incremental_upsert_on_conflict(spark, tmp_path, sqlite_db):
    src = _csv(tmp_path, "a.csv",
               "id,v,ts\n1,a,2024-01-01\n2,b,2024-01-02\n3,c,2024-01-03\n")
    base = {
        "source": {"stream": src, "primary_key": "id", "update_key": "ts",
                   "options": {"format": "csv",
                               "columns": {"id": "bigint"}}},
        "target": {"object": "main.t2",
                   "options": {"table_keys": {"primary": ["id"]},
                               "merge_strategy": "update_insert"}},
        "mode": "incremental"}
    run_db(spark, Config.from_dict(base), sqlite_db)
    assert sqlite_db.get_count("main.t2") == 3
    # newer rows upsert through sqlite's INSERT..ON CONFLICT
    src2 = _csv(tmp_path, "b.csv",
                "id,v,ts\n3,C2,2024-01-05\n4,d,2024-01-06\n")
    r2 = run_db(spark, Config.from_dict({**base, "source": {
        **base["source"], "stream": src2}}), sqlite_db)
    assert r2.rows == 2
    rows = dict(sqlite_db.fetch_all("select id, v from t2"))
    assert rows == {1: "a", 2: "b", 3: "C2", 4: "d"}


def test_sqlite_delete_insert_and_delete_missing(spark, tmp_path,
                                                 sqlite_db):
    src = _csv(tmp_path, "a.csv",
               "id,v\n1,a\n2,b\n3,c\n4,d\n")
    base = {
        "source": {"stream": src, "primary_key": "id",
                   "options": {"format": "csv"}},
        "target": {"object": "main.t3",
                   "options": {"merge_strategy": "delete_insert"}},
        "mode": "incremental"}
    run_db(spark, Config.from_dict(base), sqlite_db)
    # source shrinks to 2 rows; delete_missing hard removes the rest
    src2 = _csv(tmp_path, "b.csv", "id,v\n2,B2\n3,c\n")
    run_db(spark, Config.from_dict({
        "source": {"stream": src2, "primary_key": "id",
                   "options": {"format": "csv"}},
        "target": {"object": "main.t3",
                   "options": {"merge_strategy": "delete_insert",
                               "delete_missing": "hard"}},
        "mode": "incremental"}), sqlite_db)
    rows = dict(sqlite_db.fetch_all("select id, v from t3 order by id"))
    assert rows == {2: "B2", 3: "c"}


def test_sqlite_add_new_columns_and_json(spark, tmp_path, sqlite_db):
    run_db(spark, Config.from_dict({
        "source": {"stream": _csv(tmp_path, "a.csv", "id,v\n1,a\n2,b\n"),
                   "options": {"format": "csv"}},
        "target": {"object": "main.t4"}, "mode": "full-refresh"}),
        sqlite_db)
    # incremental batch carries a NEW json column -> add_column DDL
    src2 = _csv(tmp_path, "b.csv",
                'id,v,payload\n2,B,"{""k"":2}"\n3,c,"{""k"":3}"\n')
    run_db(spark, Config.from_dict({
        "source": {"stream": src2, "primary_key": "id",
                   "options": {"format": "csv"}},
        "target": {"object": "main.t4",
                   "options": {"merge_strategy": "delete_insert",
                               "add_new_columns": True}},
        "mode": "incremental"}), sqlite_db)
    cols = [c for c, _ in sqlite_db.columns("main.t4")]
    assert "payload" in cols
    got = dict(sqlite_db.fetch_all(
        "select id, payload from t4 order by id"))
    assert got[3] == '{"k":3}' and got[1] is None


def test_sqlite_adjust_column_type_is_gated(spark, tmp_path, sqlite_db):
    # sqlite cannot ALTER COLUMN TYPE: the widen path must no-op (text
    # affinity absorbs wider values), never crash
    run_db(spark, Config.from_dict({
        "source": {"stream": _csv(tmp_path, "a.csv",
                                  "id,amt\n1,2.5\n2,3.25\n"),
                   "options": {"format": "csv"}},
        "target": {"object": "main.t5"}, "mode": "full-refresh"}),
        sqlite_db)
    run_db(spark, Config.from_dict({
        "source": {"stream": _csv(tmp_path, "b.csv",
                                  "id,amt\n3,1234567.125\n"),
                   "primary_key": "id", "options": {"format": "csv"}},
        "target": {"object": "main.t5",
                   "options": {"merge_strategy": "delete_insert",
                               "adjust_column_type": True}},
        "mode": "incremental"}), sqlite_db)
    assert sqlite_db.get_count("main.t5") == 3


def test_sqlite_discovery(spark, tmp_path, sqlite_db):
    from sling_cli_spark.sinks.db_load import discover_db

    run_db(spark, Config.from_dict({
        "source": {"stream": _csv(tmp_path, "a.csv", "id,v\n1,a\n"),
                   "options": {"format": "csv"}},
        "target": {"object": "main.td"}, "mode": "full-refresh"}),
        sqlite_db)
    cols = discover_db(sqlite_db, "main.td", level="column")
    names = [c["column_name"] for c in cols]
    assert "id" in names and "v" in names
