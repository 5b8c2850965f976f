"""The reference's regression replication corpus
(``/root/reference/tests/replications/r.*.yaml``, 142 configs) driven
through this engine — compile via ``plans/replication.py``, execute via
``run_db``/``runner.run``, assert via the reference's own hook checks
(``plans/pipeline.py`` query/check steps over the {store.*} /
{execution.*} namespaces).

Selection: the named-feature regression cases whose semantics are
engine-portable (merge strategies, constraints, delete_missing scoping,
column DSL, selects/renames, casing, definition-only, wildcards,
loaded_at casts, transforms). Cases tied to a specific live warehouse
binding (adbc drivers, prometheus, mongo, azure, clickhouse-http,
snowflake compression...) are environmental and stay out, like the r12
suite port's policy.

Per-case divergences are documented inline at each test; the harness's
dialect-spelling normalizations are documented in
tests/replication_harness.py.
"""

from __future__ import annotations

import os

import pytest

from tests.replication_harness import (
    REF_REPL, ReplicationCase, load_case, run_case)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_REPL),
    reason="reference replication corpus not available")


def _store(case: ReplicationCase, key: str):
    return case.rt.store[key]


# ---------------------------------------------------------------------------
# r.100 merge_strategy — update_insert / delete_insert / insert / update
# + insert-skip-existing (issue #755). Divergence: runs on the DuckDB
# twin with the beyond-reference two-statement update_insert template
# (the reference parametrizes this case over postgres).

def test_r100_merge_strategy(spark, tmp_path):
    case = run_case(spark, "r.100.merge_strategy.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.101/102/103 constraints — SLING_ON_CONSTRAINT_FAILURE abort/warn,
# including the >20-violations regression (the reference's log cap must
# not swallow the abort).

def test_r101_constraints_abort(spark, tmp_path):
    case = run_case(spark, "r.101.constraints_test.yaml", tmp_path)
    # the case ASSERTS execution.status.error != 0 via its own check
    assert case.errors == 1
    assert not case.rt.broke


def test_r102_constraints_21plus_abort(spark, tmp_path):
    case = run_case(spark, "r.102.constraints_21plus_bug.yaml", tmp_path)
    assert case.errors == 1
    assert not case.rt.broke


def test_r103_constraints_warn_allows_rows(spark, tmp_path):
    case = run_case(spark, "r.103.constraints_warn_21plus_bug.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.104 delete_missing with scoped wheres — soft + hard variants.
# Divergence: MSSQL hook SQL spelled for DuckDB (harness ADAPT_SQL).

def test_r104_delete_missing_where_soft(spark, tmp_path):
    case = run_case(spark, "r.104.delete_missing_where.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


def test_r104_delete_missing_where_hard(spark, tmp_path):
    case = run_case(spark, "r.104.delete_missing_where_hard.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.95 select with renames / exclusions / wildcards / {fields} in SQL

def test_r95_select_column_rename(spark, tmp_path):
    case = run_case(spark, "r.95.select_column_rename.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.75 {fields} placeholder with literal/expression select items

def test_r75_fields_placeholder_select(spark, tmp_path):
    case = run_case(spark, "r.75.fields_placeholder_select.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.72 DB wildcard expansion + explicit disabled stream override.
# Divergence: the reference CI pre-seeds mysql.testing_1..3; the twin
# seeds them here.

def test_r72_wildcard_disabled(spark, tmp_path):
    from tests.replication_harness import ReplicationCase, load_case

    doc = load_case("r.72.wildcard_disabled.yaml")
    case = ReplicationCase(spark, doc, tmp_path)
    src = case.conns["mysql"]
    src.execute('create schema if not exists "mysql"')
    for i in (1, 2, 3):
        src.execute(f"create table mysql.testing_{i} as "
                    f"select {i} as id, 'v{i}' as val")
    try:
        case.run()
    finally:
        case.close()
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.89/90/91 definition-only: DB target, file target, file source.
# r.89 divergence: mssql type-name assertions fold to the DuckDB twin's
# general names (datetime->timestamp, bit->boolean, varchar->text,
# decimal->numeric — the same fold the harness's _GENERAL_TYPE_SQL
# applies, mirroring sling_test.go's per-dialect correction table).

def _fold_mssql_type_names(text: str) -> str:
    return (text
            .replace('"datetime"', '"timestamp"')
            .replace('== "bit"', '== "boolean"')
            .replace('"varchar"', '"text"')
            .replace('== "decimal"', '== "numeric"'))


def test_r89_definition_only_db(spark, tmp_path):
    case = run_case(spark, "r.89.definition_only_db.yaml", tmp_path,
                    text_adapt=_fold_mssql_type_names)
    assert case.errors == 0
    assert not case.rt.broke


def test_r90_definition_only_file(spark, tmp_path):
    from tests.replication_harness import ReplicationCase, load_case

    doc = load_case("r.90.definition_only_file.yaml")
    # divergence: an extension-named object is a single FILE in sling;
    # this engine's layout switch is the `single` target option
    doc["defaults"].setdefault("target_options", {})["single"] = True
    case = ReplicationCase(spark, doc, tmp_path,
                           env={"OUTPUT_PATH": f"{tmp_path}/defonly"})
    try:
        case.run()
    finally:
        case.close()
    assert case.errors == 0
    assert not case.rt.broke


def test_r91_definition_only_file_source(spark, tmp_path):
    case = run_case(spark, "r.91.definition_only_file_source.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.31 columns-DSL string casts keep timestamps unquoted in parquet

def test_r31_timestamp_string_quotes(spark, tmp_path):
    case = run_case(spark, "r.31.timestamp_string_quotes.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.32 CSV date column forced to string via columns DSL (encoding: utf8
# alias accepted; select + column_casing + adjust_column_type)

def test_r32_columns_cast_to_string(spark, tmp_path):
    case = run_case(spark, "r.32.columns_cast_to_string.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.35 transform functions over a CSV -> CSV stream.
# Divergence: the verification read pins all_varchar so value checks
# compare text (DuckDB's auto-detect would type the bool column).

def test_r35_transform_functions(spark, tmp_path):
    case = run_case(
        spark, "r.35.transform_functions_test.yaml", tmp_path,
        env={"test_dir": f"{tmp_path}/tt"},
        text_adapt=lambda t: t.replace(
            "read_csv('{env.test_dir}/output.csv', header=true)",
            "read_csv('{env.test_dir}/output.csv', header=true, "
            "all_varchar=true)"))
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.44 STAGED transforms (goval expressions over value/record.*, new
# computed columns, "*" wildcards, legacy list/dict forms) — compiled to
# Catalyst projections (operators/expr_compile.py); the case's own
# stream-level post hooks assert every transformed value.
# Divergence: mysql string literals fold \x to x; duckdb keeps the
# backslash, so the seeded literal is pre-folded.

def test_r44_staged_transforms(spark, tmp_path):
    case = run_case(
        spark, "r.44.staged_transforms_test.yaml", tmp_path,
        text_adapt=lambda t: t.replace(
            r"test with\x00null", "test withx00null"))
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.97 transforms must NOT break delete_missing (the keyset projects PK
# only; the computed column prunes away instead of erroring)

def test_r97_delete_missing_with_transforms(spark, tmp_path):
    case = run_case(spark, "r.97.delete_missing_with_transforms.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.57 run-state registry: {runs.<key>.*} / {run.*} namespaces, custom
# table_ddl with {object.full_name}/{col_types}, incremental 0-row
# re-run with incremental_value.
# Divergence: `replica identity full` is a postgres-ism the DuckDB twin
# lacks — replaced by a no-op statement in the same multi-statement DDL.

def test_r57_run_state(spark, tmp_path):
    case = run_case(
        spark, "r.57.run_state_test.yaml", tmp_path,
        text_adapt=lambda t: t.replace(
            "alter table {object.full_name} replica identity full",
            "select 1"))
    assert case.errors == 0
    assert not case.rt.broke
    runs = case.rt.state_extra["runs"]
    assert runs["public_run_state_test"]["total_rows"] == 10
    assert runs["public_run_state_test_incremental"]["total_rows"] == 0


# ---------------------------------------------------------------------------
# r.62 add_new_columns: false — extra source column must NOT be added

def test_r62_add_columns_false(spark, tmp_path):
    case = run_case(spark, "r.62.mssql_postgres_add_columns_false.yaml",
                    tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.86 mixed-case record keys in transform expressions (record.dateadded
# refers to column "DateAdded"); parquet file target

def test_r86_record_key_casing(spark, tmp_path):
    case = run_case(spark, "r.86.record_key_casing.yaml", tmp_path,
                    env={"output_dir": f"{tmp_path}/od"})
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.107 columns-DSL defaults merge: plain replace / +col merge /
# +col: ~ unset — per-stream against shared defaults

def test_r107_columns_merge_defaults(spark, tmp_path):
    case = run_case(spark, "r.107.columns_merge_defaults.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.120 explicit timestampz cast via columns DSL survives streaming

def test_r120_explicit_cast_datetime(spark, tmp_path):
    case = run_case(spark, "r.120.explicit_cast_datetime.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.39/r.40 _sling_loaded_at stays TIMESTAMP when columns: {"*": string}
# casts everything (DB source and CSV source).
# Divergence: snowflake's TIMESTAMP_TZ/UPPER-folded catalog names map to
# the DuckDB twin's lowercase timestamp.

def _fold_snowflake(t: str) -> str:
    return (t.replace('== "TIMESTAMP_TZ"', '== "timestamp"')
            .replace("TABLE_SCHEMA = 'PUBLIC'", "TABLE_SCHEMA = 'public'")
            .replace("TABLE_NAME = 'TEST_SLING_LOADED_AT_CAST'",
                     "TABLE_NAME = 'test_sling_loaded_at_cast'")
            .replace("TABLE_NAME = 'TEST_SLING_LOADED_AT'",
                     "TABLE_NAME = 'test_sling_loaded_at'")
            .replace("COLUMN_NAME = '_SLING_LOADED_AT'",
                     "COLUMN_NAME = '_sling_loaded_at'"))


def test_r39_loaded_at_string_cast_db_source(spark, tmp_path):
    case = run_case(spark, "r.39.sling_loaded_at_string_cast.yaml",
                    tmp_path, text_adapt=_fold_snowflake)
    assert case.errors == 0
    assert not case.rt.broke


def test_r40_loaded_at_string_cast_csv_source(spark, tmp_path):
    case = run_case(spark, "r.40.sling_loaded_at_csv_string_cast.yaml",
                    tmp_path, text_adapt=_fold_snowflake)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.52 file_max_rows splitting: 1000 rows / 100 per file -> 10 parts
# (+ the write marker) under the {stream_schema}/{stream_table} layout;
# the stream SQL renders {stream_*} runtime vars.
# Divergence: the reference CI seeds public.test1k_athena_pg; seeded
# here. The 11th file is Spark's _SUCCESS marker standing in for the
# reference's manifest.

def test_r52_parquet_file_splitting(spark, tmp_path):
    from tests.replication_harness import ReplicationCase, load_case

    doc = load_case("r.52.parquet_file_splitting.yaml")
    case = ReplicationCase(spark, doc, tmp_path,
                           env={"my_target": str(tmp_path),
                                "MY_TARGET": str(tmp_path)})
    src = case.conns["postgres"]
    src.execute("create schema if not exists public")
    src.execute("create table public.test1k_athena_pg as "
                "select range as id, 'n'||range as name from range(1000)")
    try:
        case.run()
    finally:
        case.close()
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.106 chunked read must respect the where clause (issue: chunking
# ignored `where`). The case ships no end hooks — the row-count
# assertion here IS the bug's contract.
# Divergence: the reference CI seeds oracle.test1k_duckdb_pg; seeded.

def test_r106_chunk_where_clause(spark, tmp_path):
    from tests.replication_harness import ReplicationCase, load_case

    doc = load_case("r.106.chunk_where_clause.yaml")
    case = ReplicationCase(spark, doc, tmp_path)
    src = case.conns["oracle"]
    src.execute('create schema if not exists "oracle"')
    src.execute("create table oracle.test1k_duckdb_pg as "
                "select range as id, 'n'||range as name from range(1, 1001)")
    try:
        case.run()
    finally:
        case.close()
    assert case.errors == 0
    tgt = case.conns["mssql"]
    # re-open: handles are closed by case.close()
    from sling_cli_spark.sinks.db_load import DuckDBTarget

    tgt = DuckDBTarget(f"{tmp_path}/mssql_twin.duckdb")
    assert tgt.get_count("dbo.test1k_chunk_where_bug") == 100, \
        "where must bound the chunked read"
    tgt.close()


# ---------------------------------------------------------------------------
# r.116 stream-SQL runtime vars: {execution.start_time} (shared across
# streams), {store.*} from start hooks, {state.<id>.status} — rendered
# into the stream SQL after start hooks run.
# Divergence: duckdb's `~` is a FULL regex match (postgres' is partial)
# — the probe folds to regexp_matches.

def test_r116_stream_sql_runtime_vars(spark, tmp_path):
    import re

    def adapt(text):
        return re.sub(r"\(([\w.]+) ~ '([^']+)'\)",
                      r"regexp_matches(\1, '\2')", text)

    case = run_case(spark, "r.116.stream_sql_runtime_vars.yaml",
                    tmp_path, text_adapt=adapt)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.98 chunking + custom SQL + {stream_table} object var: the temp/
# final table name must expand the runtime var, chunks must cover the
# full table (chunk_count over the rendered SQL with
# {incremental_where_cond}).
# Divergence: the reference CI seeds public.test1k_clickhouse_pg.

def test_r98_chunking_stream_table_var(spark, tmp_path):
    from tests.replication_harness import ReplicationCase, load_case

    doc = load_case("r.98.chunking_stream_table_var.yaml")
    case = ReplicationCase(spark, doc, tmp_path)
    src = case.conns["postgres"]
    src.execute("create schema if not exists public")
    src.execute("create schema if not exists sling")
    src.execute("create table public.test1k_clickhouse_pg as "
                "select range as id, 'n'||range as name "
                "from range(1, 1001)")
    try:
        case.run()
    finally:
        case.close()
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.20-shape chunked reads (r.20.chunking.yaml parametrizes over live
# warehouses + a MODE env matrix; the chunk semantics it pins — size in
# rows/days/months, count, backfill ranges composing with chunks — are
# pinned here directly against the embedded twin): every chunking form
# must reproduce the table EXACTLY and respect where/range bounds.

@pytest.mark.parametrize("src_extra,expect", [
    ({"update_key": "id", "options": {"chunk_size": 200}}, 1000),
    ({"update_key": "id", "where": "id <= 100",
      "options": {"chunk_size": 50}}, 100),            # r.106 contract
    ({"update_key": "update_dt", "options": {"chunk_size": "10d"}}, 1000),
    ({"update_key": "update_dt", "options": {"chunk_size": "2m"}}, 1000),
    ({"update_key": "id", "options": {"chunk_count": 3}}, 1000),
    ({"update_key": "id", "options": {"chunk_size": 200,
                                      "range": "1,800"}}, 800),
])
def test_r20_shape_chunked_reads(spark, tmp_path, src_extra, expect):
    from sling_cli_spark.config import Config
    from sling_cli_spark.sinks.db_load import DuckDBTarget, run_db

    db = DuckDBTarget(f"{tmp_path}/s.db")
    db.execute("create schema if not exists public")
    db.execute("create table public.t1k as select range as id, "
               "timestamp '2018-11-01' + interval (range % 120) day "
               "as update_dt, 'v'||range as v from range(1, 1001)")
    mode = "backfill" if "range" in src_extra.get("options", {}) \
        else "full-refresh"
    cfg = Config.from_dict({
        "source": {"conn": f"duckdb://{tmp_path}/s.db",
                   "stream": "public.t1k", **src_extra},
        "target": {"object": "main.tgt"},
        "mode": mode})
    r = run_db(spark, cfg, db)
    assert r.rows == expect
    assert db.get_count("main.tgt") == expect
    db.close()


# ---------------------------------------------------------------------------
# r.71 nested JSON glob -> SQLITE target (the REAL embedded sqlite, not
# the duckdb twin): flatten + snake column_casing + mixed-case key
# merge across files.

def test_r71_json_sqlite_nested(spark, tmp_path):
    case = run_case(
        spark, "r.71.json_sqlite_nested.yaml", tmp_path,
        text_adapt=lambda t: t.replace(
            "bash tests/replications/",
            "bash /root/reference/tests/replications/"))
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.37 decimal precision/scale survive a truncate load (DECIMAL(10,2)
# etc. keep their values through staging)

def test_r37_decimal_to_string_cast(spark, tmp_path):
    case = run_case(spark, "r.37.decimal_to_string_cast.yaml", tmp_path)
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.34 encoding round-trips: latin1 source read with encoding produces
# clean text; the SAME bytes without the option garble (the case's own
# grep contracts assert both)

def test_r34_encoding_garbled(spark, tmp_path):
    case = run_case(spark, "r.34.encoding_garbled_test.yaml", tmp_path,
                    env={"TEST_DIR": f"{tmp_path}/enc"})
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.33 target-side encoding: CSV outputs in latin1 / utf8 /
# windows1252 (the last outside Spark's CSV charset whitelist —
# transcoded in the single-file assembly)

def test_r33_encoding_target(spark, tmp_path):
    case = run_case(spark, "r.33.encoding_target_test.yaml", tmp_path,
                    env={"TEST_DIR": f"{tmp_path}/enc33"})
    assert case.errors == 0
    assert not case.rt.broke


# ---------------------------------------------------------------------------
# r.88 custom table_ddl with an inline PRIMARY KEY (+ a WITH clause
# after the column list, GitHub #694): the PK must land inside the
# column parens and survive the load.
# Divergences: the sys.indexes PK probe folds to duckdb_constraints();
# DATA_COMPRESSION is an mssql storage option the twin lacks — the
# WITH clause (and its check) drop, the PK-placement contract stays.

def test_r88_table_ddl_with_clause(spark, tmp_path):
    import re

    pk_probe = """
        SELECT unnest(constraint_column_names) AS column_name
        FROM duckdb_constraints()
        WHERE table_name = '{T}' AND constraint_type = 'PRIMARY KEY'
"""

    def adapt(t):
        t = re.sub(
            r"SELECT\s+c\.name AS column_name\s+FROM sys\.indexes.*?"
            r"ORDER BY ic\.key_ordinal",
            lambda m: pk_probe.format(
                T="test_ddl_pk_tgt_88_with"
                if "tgt_88_with" in m.group(0) else "test_ddl_pk_tgt_88"),
            t, flags=re.S)
        t = t.replace(") WITH (DATA_COMPRESSION = PAGE)", ")")
        start = t.index(
            "    # Verify Stream 2: table has DATA_COMPRESSION enabled")
        end = t.index("    # Cleanup")
        return t[:start] + t[end:]

    case = run_case(spark, "r.88.table_ddl_with_clause.yaml", tmp_path,
                    text_adapt=adapt)
    assert case.errors == 0
    assert not case.rt.broke
