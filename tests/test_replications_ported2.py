"""Replication-corpus port, round-14 batch (VERDICT r13 ask #3) —
continues tests/test_replications_ported.py down the reference's
``tests/replications/r.*.yaml`` corpus with the same harness and the
same documented-divergence policy (warehouse conns -> DuckDB/SQLite
twins; dialect spelling normalized by tests/replication_harness.py;
each case's own hook checks are the assertions).

New in this batch's harness rules (replication_harness.py):
``N'...'`` literal prefix strip, ``decode(x,'hex')`` -> ``unhex``,
``continue_on_error`` -> ``on_failure: continue``, blob/time folds in
the general-type probe.

Skipped-with-reason (environmental, not ported):
- r.01-r.06, r.08, r.10-r.17, r.19, r.21 — need pre-provisioned
  warehouse fixture tables (food_food_category, test1k...) or live
  S3/GCS buckets; no hooks create their data.
- r.09, r.18 — hit a live webhook (webhook.ocral.org) / pre-provisioned
  pg fixtures.
- r.22 (mysql BIT(n) b'' literals), r.58 (postgres convert_from/bytea
  E'' fixtures) — fixture SQL is engine-specific beyond spelling.
- r.24/25/26/36/38/41/43/53/54/63/66/73/74/77-80/84/87/92/96/105/
  109/110/115/118/119/122 — live clickhouse/prometheus/mongo/azure/
  snowflake/starrocks/bigquery/adbc/odbc/ducklake-s3 bindings.
- r.102.sling_timeout — wall-clock kill of a 200M-row stream; the
  engine has no SLING_TIMEOUT watchdog (noted as missing).
- r.65.part2 — pins the reference's exact output-file COUNT (11) of
  its single-writer splitter; Spark's parallel writer shards by
  partition (the splitting CONTRACT is pinned by r.52, already green).
"""

from __future__ import annotations

import os
import re

import pytest

from tests.replication_harness import (
    REF_REPL, ReplicationCase, load_case, run_case)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_REPL),
    reason="reference replication corpus not available")

REF_FILES = "file:///root/reference/tests/files/"


def _map_ref_files(text: str) -> str:
    """Reference-repo-relative file streams -> absolute paths (the
    reference runs from its repo root; tests/ holds the fixtures)."""
    text = text.replace("file://./cmd/sling/tests/files/", REF_FILES)
    # pre-render form: the {folder} var renders AFTER this adapt
    text = text.replace("file://./cmd/sling/{folder}/files/",
                        "file:///root/reference/{folder}/files/")
    text = text.replace("file://./tests/files/", REF_FILES)
    text = text.replace("file://tests/files/", REF_FILES)
    text = text.replace(
        "bash tests/replications/",
        "bash /root/reference/tests/replications/")
    return text


def _store(case: ReplicationCase, key: str):
    return case.rt.store[key]


# ---------------------------------------------------------------------------
# r.00 — env-templated source conn (`source: '{source}'` + env.source:
# LOCAL) and `{folder}` var inside the stream KEY; csv -> sqlite.

def test_r00_env_templated_conn(spark, tmp_path):
    case = ReplicationCase(
        spark, load_case("r.00.yaml", text_adapt=_map_ref_files),
        tmp_path)
    try:
        case.run()
        assert case.errors == 0
        n = case.conns["sqlite"].fetch_one(
            'select count(*) from main."test"')[0]
        assert n == 18  # test1.1.csv body rows
    finally:
        case.close()


# ---------------------------------------------------------------------------
# r.07 — three glob file streams (parquet/*, *.csv with a `"*": string`
# columns wildcard, test?.json) -> sqlite, object from
# {stream_file_folder}_{stream_file_name}.

def test_r07_glob_file_streams(spark, tmp_path):
    case = ReplicationCase(
        spark, load_case("r.07.yaml", text_adapt=_map_ref_files),
        tmp_path)
    try:
        case.run()
        assert case.errors == 0
        tables = [r[0] for r in case.conns["sqlite"].fetch_all(
            "select name from sqlite_master where type='table'")]
        # one table per matched file, named {folder}_{file}
        assert any("test1_1" in t for t in tables), tables
        assert any("parquet" in t for t in tables), tables
        assert len(tables) >= 3, tables
    finally:
        case.close()


# ---------------------------------------------------------------------------
# r.42 — `select: ["-extra_col"]` on a DB source writing parquet
# (issue #607: exclusion was silently ignored). The case's own duckdb
# DESCRIBE probe asserts the column is gone.

def test_r42_exclude_column(spark, tmp_path):
    case = run_case(spark, "r.42.mssql_exclude_column_issue607.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    assert _store(case, "extra_col_check")[0]["extra_col_count"] == 0


# ---------------------------------------------------------------------------
# r.51 — XML file -> DB with flatten; the case checks row count, field
# values and numeric parses.

def test_r51_xml_import(spark, tmp_path):
    case = run_case(spark, "r.51.xml_postgres_import.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    assert _store(case, "result")[0]["count"] == 5


# ---------------------------------------------------------------------------
# r.55 — two nested-JSON files with DIFFERENT key sets union into one
# table (flatten: 1 + schema drift), 1700 rows total.

def test_r55_json_nested_union(spark, tmp_path):
    import shutil

    # the corpus preps share /tmp/sling-test-files without clearing it
    # first; isolate so another case's leftover fixture can't pollute
    # the glob (the reference's CI runs cases in clean containers)
    shutil.rmtree("/tmp/sling-test-files", ignore_errors=True)
    case = run_case(spark, "r.55.json_snowflake_nested.yaml", tmp_path,
                    text_adapt=_map_ref_files)
    assert case.errors == 0
    assert int(_store(case, "result")[0]["count"]) == 1700


# ---------------------------------------------------------------------------
# r.65.part1 — 100k-row generated CSV -> DB with column_casing: snake +
# direct_insert (the prep script generates the fixture).

def test_r65_large_csv_part1(spark, tmp_path):
    case = run_case(spark,
                    "r.65.large_csv_postgres_parquet.part1.yaml",
                    tmp_path, text_adapt=_map_ref_files)
    assert case.errors == 0
    assert int(_store(case, "result")[0]["count"]) == 100000


# ---------------------------------------------------------------------------
# r.67 — camelCase JSON keys + column_casing: snake must produce ONE set
# of snake_case columns (regression: duplicated camel+snake columns).

def test_r67_json_column_casing(spark, tmp_path):
    import shutil

    shutil.rmtree("/tmp/sling-test-files", ignore_errors=True)
    case = run_case(spark, "r.67.json_postgres_column_casing.yaml",
                    tmp_path, text_adapt=_map_ref_files)
    assert case.errors == 0
    assert not case.rt.broke
    cols = [r["column_name"] for r in _store(case, "result_columns")]
    assert "user_id" in cols and "first_name" in cols
    assert not any(c for c in cols if c != c.lower())


# ---------------------------------------------------------------------------
# r.76 — thread_state_sync: the {runs.*} registry must carry every
# stream's total_rows/status/total_bytes (bracket-indexed lookups).

def test_r76_thread_state_sync(spark, tmp_path):
    case = run_case(spark, "r.76.thread_state_sync.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    runs = case.rt.state_extra["runs"]
    assert {k for k in runs} >= {
        f"public_thread_sync_test_{i}" for i in range(1, 5)}


# ---------------------------------------------------------------------------
# r.93 — csv file -> MySQL target (the reference's LOAD DATA LOCAL
# INFILE fast path; on the twin the same staged bulk-load lifecycle).

def test_r93_mysql_load_data_local(spark, tmp_path):
    case = run_case(spark, "r.93.mysql_load_data_local.yaml", tmp_path,
                    text_adapt=_map_ref_files)
    assert case.errors == 0
    assert not case.rt.broke
    assert int(_store(case, "result")[0]["cnt"]) == 18


# ---------------------------------------------------------------------------
# r.100.mssql_merge_semicolon — two streams into ONE target object:
# full-refresh (5 rows) then incremental merge (+2 new) = 7; regression
# for semicolon-terminated MERGE statements.

def test_r100_merge_semicolon(spark, tmp_path):
    case = run_case(spark, "r.100.mssql_merge_semicolon.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    assert int(_store(case, "result")[0]["cnt"]) == 7


# ---------------------------------------------------------------------------
# r.113 — binary (bytea/BLOB) fidelity: PDF header bytes, full byte
# range, 128KB payload, NULL — md5-matched source vs target and the
# destination column stays a binary type.

def test_r113_binary_fidelity(spark, tmp_path):
    # spelling: duckdb's md5() takes VARCHAR only — hash the hex form
    # (same equality power; both sides hash identically)
    case = run_case(spark, "r.113.postgres_binary_fidelity.yaml",
                    tmp_path,
                    text_adapt=lambda t: t.replace(
                        "md5(cert_blob)", "md5(hex(cert_blob))")
                    .replace("length(cert_blob)",
                             "octet_length(cert_blob)"))
    assert case.errors == 0
    assert not case.rt.broke
    src, dst = _store(case, "src"), _store(case, "dst")
    assert [r["m"] for r in src] == [r["m"] for r in dst]


# ---------------------------------------------------------------------------
# r.121 — delete_insert merge strategy replaces a stale pre-existing
# target row (the Redshift no-DELETE-alias template regression).

def test_r121_delete_insert(spark, tmp_path):
    case = run_case(spark, "r.121.redshift_delete_insert.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    rows = _store(case, "rows")
    assert len(rows) == 2 and rows[0]["val"] == "a1"


# ---------------------------------------------------------------------------
# r.114 — bare (no-schema) stream name resolves against the
# connection's default schema (issue #749). Env-templated conn names
# (${SOURCE}/${TARGET}/${SCHEMA}) bound in-test; the Oracle
# EXECUTE-IMMEDIATE drop blocks fold to DROP IF EXISTS (the harness
# rule covers the simple shape; this case's SQLCODE guard variant is
# folded by the same spelling policy below).

_ORACLE_DROP = re.compile(
    r"BEGIN\s+EXECUTE IMMEDIATE 'DROP TABLE ([^']+) PURGE';.*?END;",
    re.S)


def test_r114_no_schema_stream(spark, tmp_path):
    def adapt(text):
        text = text.replace("${SCHEMA}", "oracle") \
                   .replace("${SOURCE}", "oracle") \
                   .replace("${TARGET}", "postgres") \
                   .replace("'{my_source}'", "oracle") \
                   .replace("'{my_target}'", "postgres") \
                   .replace("{env.schema}", "oracle")
        return _ORACLE_DROP.sub(r"DROP TABLE IF EXISTS \1", text)

    case = run_case(spark, "r.114.oracle_no_schema_columns.yaml",
                    tmp_path, text_adapt=adapt)
    assert case.errors == 0
    rows = _store(case, "result")
    assert [r["name"] for r in rows] == ["Alice", "Bob", "Carol"]


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


# ---------------------------------------------------------------------------
# r.85 — SLING_SYNCED_AT_COLUMN metadata pair: _sling_synced_at +
# _sling_synced_op with 'I' on load, 'U' on merge-update, 'D' on soft
# delete_missing (deleted_at folds onto synced_at, config.go:176).

def test_r85_synced_at_column(spark, tmp_path):
    def adapt(t):
        # pg_sleep doesn't exist on the twin; the stamp-separation it
        # guards is inherent here (merge ts vs delete current_timestamp)
        t = t.replace("SELECT pg_sleep(2)", "SELECT 1")
        # the duckdb twin's DEFAULT strategy is delete_insert (its own
        # dialect template); postgres' default is update_insert — pin
        # the strategy the case actually exercises on postgres so the
        # matched rows flow through the UPDATE branch ('U')
        return t.replace(
            "      delete_missing: soft",
            "      delete_missing: soft\n"
            "      merge_strategy: update_insert")

    case = run_case(
        spark, "r.85.mssql_postgres_synced_at.yaml", tmp_path,
        text_adapt=adapt)
    assert case.errors == 0
    assert not case.rt.broke
    assert int(_store(case, "t1_count")[0]["count"]) == 10
    assert int(_store(case, "deleted_op_count")[0]["deleted_count"]) == 2
    assert int(_store(case, "updated_op_count")[0]["updated_count"]) == 8


# ---------------------------------------------------------------------------
# r.61 — identity-column incremental: pre_merge/post_merge stream hooks
# bracket the merge with SET IDENTITY_INSERT (no-op on the twin; the
# HOOK TIMING is the contract — they fire with {run.object.full_name}
# live), identity values preserved through the merge.

def test_r61_identity_incremental(spark, tmp_path):
    case = run_case(spark, "r.61.mssql_identity_incremental.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke
    src, tgt = _store(case, "source_stats"), _store(case, "target_stats_1")
    assert int(src[0]["row_count"]) == int(tgt[0]["row_count"]) == 5
    assert int(src[0]["min_id"]) == int(tgt[0]["min_id"])
    assert int(src[0]["max_id"]) == int(tgt[0]["max_id"])


# ---------------------------------------------------------------------------
# r.46 — NOT PORTED (engine limitation, documented): the case pins
# TIME WITH TIME ZONE preservation; Spark's type system has TimeType
# (4.1) but no timetz, so the staged-parquet scan cannot carry the
# column. Recorded as a known type-surface gap rather than adapted
# away (an adaptation would change what the case asserts).


# ---------------------------------------------------------------------------
# r.81/r.82/r.83 — boolean handling: a pre-existing VARCHAR target
# column keeps strings (no forced bool cast); a fresh table gets a real
# boolean column; explicit `cast_as` overrides (r.82); mysql tinyint
# twin (r.83). The cases' own checks assert values + catalog types.

def test_r81_bool_string(spark, tmp_path):
    # catalog-name spelling: MSSQL reports BIT where the twin reports
    # boolean — fold the EXPECTED literal, not the data
    case = run_case(spark, "r.81.mssql_bool_string.yaml", tmp_path,
                    text_adapt=lambda t: t.replace('== "bit"',
                                                   '== "boolean"'))
    assert case.errors == 0
    assert not case.rt.broke


def test_r82_boolean_cast_as(spark, tmp_path):
    case = run_case(spark,
                    "r.82.mssql_postgres_boolean_cast_as.yaml", tmp_path,
                    text_adapt=lambda t: t.replace(
                        "'character varying'", "'text'").replace(
                        '"character varying"', '"text"'))
    assert case.errors == 0
    assert not case.rt.broke


def test_r83_mssql_mysql_bool(spark, tmp_path):
    case = run_case(spark, "r.83.mssql_mysql_bool.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.69/r.70 — decimal precision/scale preservation mssql->postgres,
# plus `cast_as` decimal overrides.

def test_r69_decimal(spark, tmp_path):
    case = run_case(spark, "r.69.mssql_postgres_decimal.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


def test_r70_decimal_cast_as(spark, tmp_path):
    # catalog spelling: postgres 'character varying' = the twin's
    # folded 'text' (expected-literal fold, not a data change)
    case = run_case(spark,
                    "r.70.mssql_postgres_decimal_cast_as.yaml", tmp_path,
                    text_adapt=lambda t: t.replace(
                        "'character varying'", "'text'").replace(
                        '"character varying"', '"text"'))
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.94/r.99 — the mysql LOAD DATA fast path's NULL marker and escape
# handling (on the twin: the staged bulk load must preserve NULLs vs
# empty strings and embedded quotes/newlines byte-for-byte).

def test_r94_load_data_nulls(spark, tmp_path):
    case = run_case(spark, "r.94.mysql_load_data_local_nulls.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


def test_r99_load_data_escape(spark, tmp_path):
    case = run_case(spark, "r.99.mysql_load_data_escape_bug.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.112 — SQL Server binary fidelity (VARBINARY round-trip, the
# sqlserver twin of r.113).

def test_r112_sqlserver_binary(spark, tmp_path):
    case = run_case(
        spark, "r.112.sqlserver_binary_fidelity.yaml", tmp_path,
        text_adapt=lambda t: t
        .replace("md5(cert_blob)", "md5(hex(cert_blob))")
        .replace("length(cert_blob)", "octet_length(cert_blob)")
        # MSSQL hex-out spelling -> duckdb hex(); catalog-name fold
        # for the expected literal (mssql varbinary = the twin's bytea)
        .replace("convert(varchar(max), cert_blob, 2)",
                 "hex(cert_blob)")
        .replace('== "varbinary"', '== "bytea"'))
    assert case.errors == 0
    assert not case.rt.broke
