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
