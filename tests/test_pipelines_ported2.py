"""Pipeline-corpus port, round-14 batch (VERDICT r13 ask #4) —
continues tests/test_pipelines_ported.py down the reference's
``tests/pipelines/p.*.yaml`` corpus via tests/replication_harness's
PipelineCase (DuckDB twins for named conns, cloud prefixes mapped
under tmp). The cases' own check steps are the assertions.

Skipped-with-reason:
- p.06 (swapi live API), p.08 (ssh command), p.11 (bigquery state),
  p.13 (duckdb s3 secret), p.15/16 (mariadb/sftp), p.20/21/25/31
  (oracle sqlldr/live types), p.22 (ducklake), p.28/29 (platform/
  agent service), p.30 (sling timeout watchdog — noted missing),
  p.44 (live pg->clickhouse batch duration), cdc/adbc/postgis/
  schema_migration dirs (live warehouse/broker bindings).
- p.09.http_post drives webhook.site-style endpoints — its http-step
  retry/backoff SHAPES are pinned by p.07 (already green); the live
  POST targets are environmental.
"""

from __future__ import annotations

import json
import os

import pytest

from tests.replication_harness import REF_PIPE, PipelineCase, run_pipeline_case

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PIPE),
    reason="reference pipeline corpus not available")


def _map_ref(text: str) -> str:
    text = text.replace("tests/files/", "/root/reference/tests/files/")
    text = text.replace("path: tests/pipelines/",
                        "path: /root/reference/tests/pipelines/")
    # double-mapped guard (file:// prefix already handled by the case)
    text = text.replace("file:///root/reference//root/reference/",
                        "file:///root/reference/")
    return text


# ---------------------------------------------------------------------------
# p.03 — copy fix: filenames listed from a (simulated) remote must not
# duplicate into `to/<name>/<name>` when copied via {loop.value.*}.

def test_p03_copy_fix(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.03.test_copy_fix_demonstration.yaml", tmp_path)
    files = case.rt.state_ns["verify_output"]["result"]
    # the copied names appear UNDUPLICATED at the top level (no
    # <name>/<name> nesting); /tmp/output is shared, so other suites'
    # leftovers may coexist — assert containment, not equality
    assert {f["name"] for f in files} >= {
        "demo_file_1.csv", "demo_file_2.csv"}
    assert not any("demo_file_1.csv/" in f["path"] for f in files)
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# p.14 — incremental + chunk_size + explicit range: the USER range must
# bound the chunks even when the target's max watermark is older
# (regression: "" range min parsed as year-0 -> chunk explosion).

def test_p14_chunk_range_override(spark, tmp_path):
    fixture = (
        "INSERT INTO oracle.test_chunk_range (id, event_date, val)\n"
        "      SELECT g as id, DATE '2024-12-01' + (g % 10)::INT "
        "as event_date, 'row_' || g as val\n"
        "      FROM generate_series(1, 20) t(g)")

    def adapt(t):
        # Oracle CONNECT-BY row generator -> generate_series (fixture
        # SQL substitution, same 20 rows over the same date range)
        i = t.index("INSERT INTO oracle.test_chunk_range")
        j = t.index("CONNECT BY LEVEL <= 20") + len(
            "CONNECT BY LEVEL <= 20")
        return t[:i] + fixture + t[j:]

    case = run_pipeline_case(
        spark, "p.14.chunk_incremental_range_override.yaml", tmp_path,
        text_adapt=adapt)
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# p.17 — direct_insert + column_casing + SLING_STATE-backed incremental
# over a DB pair (state conn is a DuckDB twin).

def test_p17_direct_insert_state(spark, tmp_path):
    # `default` is clickhouse's default schema name but a reserved word
    # on the twin — schema-name spelling only
    case = run_pipeline_case(
        spark, "p.17.direct_insert_state_datetime.yaml", tmp_path,
        text_adapt=lambda t: t.replace("default.test_direct_state",
                                       "public.test_direct_state"))
    assert not case.rt.broke
    err = case.rt.state_extra["execution"]["status"]["error"]
    assert err == 0


# ---------------------------------------------------------------------------
# p.18 — {store.*} values render inside replication `where:` and `sql:`
# fields (store -> replication variable passing).

def test_p18_store_in_replication(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.18.store_in_replication.yaml", tmp_path)
    assert not case.rt.broke
    assert case.rt.state_extra["execution"]["status"]["error"] == 0


# ---------------------------------------------------------------------------
# p.19 — duckdb chunked wildcard target (issue #717: the compile-step
# connection must release its lock before chunk tasks open theirs).

def test_p19_duckdb_chunk_lock(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.19.duckdb_chunk_lock.yaml", tmp_path)
    assert not case.rt.broke
    assert case.rt.state_extra["execution"]["status"]["error"] == 0


# ---------------------------------------------------------------------------
# p.26 — parquet -> single-file CSV output, row count verified by the
# case's own shell step.

def test_p26_arrow_ipc_output(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.26.duckdb_arrow_ipc_output.yaml", tmp_path,
        text_adapt=_map_ref)
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# p.32 — select-list REORDERING survives a DB->DB load (pg -> mysql
# twin): the target's ordinal positions follow the select list.

def test_p32_select_reorder(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.32.select_reorder_pg_to_mysql.yaml", tmp_path)
    assert not case.rt.broke
    assert case.rt.state_extra["execution"]["status"]["error"] == 0


# ---------------------------------------------------------------------------
# p.43 — NOT PORTED (noted): pins Snowflake/Oracle cross-DATABASE
# (3-part) targets — `CREATE DATABASE` + Oracle INSERT ALL fixtures are
# engine DDL the twin can only mimic via ATTACH, which changes what the
# case asserts (catalog routing). 3-part parsing itself is covered by
# dialects.parse_table_name vectors.


# ---------------------------------------------------------------------------
# p.10 — MSSQL BIT -> pre-existing INTEGER / VARCHAR / BOOLEAN target
# columns across a 4-target group loop, plus boolean.cast_as: integer
# on a fresh table. Targets not in the scan registry are injected as
# twins (the loop names are runtime values).

def test_p10_bool_cast_multi_target(spark, tmp_path):
    from sling_cli_spark.sinks.db_load import DuckDBTarget

    case = PipelineCase(spark, "p.10.bool_cast_multi_target.yaml",
                        tmp_path)
    for n in ("postgres", "mysql", "mariadb", "starrocks", "mssql"):
        if n not in case.conns:
            path = os.path.join(str(tmp_path), f"{n}_twin.duckdb")
            case.conns[n] = DuckDBTarget(path)
            case.rt.connections[n] = case.conns[n]
            case.rt.conn_urls[n] = f"duckdb://{path}"
    try:
        case.run()
        assert not case.rt.broke
        assert case.rt.state_extra["execution"]["status"]["error"] == 0
    finally:
        case.close()


# ---------------------------------------------------------------------------
# p.41 — execution.cli_args: pipeline steps read the CLI flags the run
# was invoked with (array --streams, typed --limit, hyphen folding,
# missing keys absent, execution.id/file_name/status.count populated).
# Driven through the REAL CLI entry (`sling run -p ... --streams ...`).

def test_p41_cli_args(tmp_path, monkeypatch):
    from sling_cli_spark.__main__ import main

    monkeypatch.setenv("SLING_HOME_DIR", str(tmp_path / "home"))
    rc = main(["run", "-p",
               os.path.join(REF_PIPE, "p.41.cli_args_streams.yaml"),
               "--streams", "tag:transactions",
               "--mode", "full-refresh", "--limit", "5",
               "--src-conn", "PG"])
    assert rc == 0


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


# ---------------------------------------------------------------------------
# p.05 — extra-parquet-file deletion (issue #614): a second full-refresh
# write to the same file target must REPLACE the old part files, never
# accumulate them. AWS_S3 is bound as a local-base connection (the
# reference's env.yaml local-conn shape, issue #712 machinery).

def test_p05_extra_parquet_deletion(spark, tmp_path):
    base = os.path.join(str(tmp_path), "aws_s3")
    def adapt(t):
        # postgres's default schema is public; the twin's is main —
        # qualify the fixture DDL the way postgres actually places it
        t = _map_ref(t)
        return t.replace("EXISTS test_parquet_614",
                         "EXISTS public.test_parquet_614") \
                .replace("TABLE test_parquet_614",
                         "TABLE public.test_parquet_614") \
                .replace("INTO test_parquet_614",
                         "INTO public.test_parquet_614") \
                .replace("FROM test_parquet_614",
                         "FROM public.test_parquet_614")

    case = run_pipeline_case(
        spark, "p.05.extra_parquet_files_deletion.yaml", tmp_path,
        text_adapt=adapt,
        env={"AWS_S3": f'{{ type: local, url: "file://{base}" }}'})
    assert not case.rt.broke
    # after the 5-row re-write the old 25-row part files are gone
    second = case.rt.state_ns["list_files_second"]["result"]
    first = case.rt.state_ns["list_files_first"]["result"]
    assert len(first) >= 1
    assert len(second) <= len(first)
