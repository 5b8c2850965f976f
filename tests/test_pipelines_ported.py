"""The reference's pipeline-step corpus
(``/root/reference/tests/pipelines/p.*.yaml``) driven through
``plans/pipeline.py`` — the hook ENGINE is closed-source in the
reference (hooks.go declares the kinds; task_run stubs them), so these
yamls are the only executable spec of step semantics.

Ported: inspect (DB catalog + file forms), inline/path replications,
jq source option, on_failure warn/defer status propagation, routines
with {params.*}, group loops (+concurrency), command print/capture
shapes, read/write/store-map steps, local base-path connections.

Cloud-bound cases (adbc, s3/azure/sftp live endpoints, bigquery,
platform/agent CLIs) are environmental and stay out; ``aws_s3/``
prefixes inside ported cases remap under the case tmp dir (documented
in tests/replication_harness.PipelineCase).
"""

from __future__ import annotations

import os

import pytest

from tests.replication_harness import (
    REF_PIPE, PipelineCase, run_pipeline_case)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PIPE),
    reason="reference pipeline corpus not available")


# ---------------------------------------------------------------------------
# p.04 inspect hook: DB table (exists/columns/precision/scale/
# column_map), missing table, file writes + file inspects


def test_p04_inspect_hook(spark, tmp_path):
    case = run_pipeline_case(spark, "p.04.test_inspect_hook.yaml",
                             tmp_path)
    st = case.rt.state_ns
    assert st["inspect_postgres_table"]["exists"] is True
    assert st["inspect_missing_table"]["exists"] is False


# ---------------------------------------------------------------------------
# p.35 on_failure: warn — status "warning" propagates through nested
# groups; clean groups stay "success". The case's own checks assert.


def test_p35_on_failure_warn_status(spark, tmp_path):
    case = run_pipeline_case(spark, "p.35.on_failure_warn_status.yaml",
                             tmp_path)
    assert case.rt.state_ns["clean_group"]["status"] == "success"
    assert case.rt.state_ns["warn_group"]["status"] == "warning"


# ---------------------------------------------------------------------------
# p.38 on_failure: defer — every loop iteration and group step still
# runs; the deferred failure raises at group end; later steps don't run


def test_p38_on_failure_defer(spark, tmp_path):
    from sling_cli_spark.plans.pipeline import StepError

    case = PipelineCase(spark, "p.38.on_failure_defer.yaml", tmp_path)
    try:
        with pytest.raises(StepError, match="deferred"):
            case.run()
    finally:
        case.close()
    # the post-group log must NOT have run
    assert not any("should-not-reach" in str(v)
                   for v in case.rt.state_ns.values())


# ---------------------------------------------------------------------------
# p.42 command print/capture: captured output lands in
# state.<id>.output.stdout regardless of print; capture: false keeps
# state empty


def test_p42_command_print_log_sink(spark, tmp_path):
    case = run_pipeline_case(spark, "p.42.command_print_log_sink.yaml",
                             tmp_path)
    st = case.rt.state_ns
    assert "cmd-stdout-line-A" in st["printed"]["output"]["stdout"]
    assert st["quiet"]["output"]["stdout"].strip() == "cmd-quiet-line"
    assert st["uncaptured"]["output"]["stdout"] == ""


# ---------------------------------------------------------------------------
# p.37 routine + on_failure: warn — the routine resolves from
# $SLING_ROUTINES_DIR/routines.yaml, {params.*} render, a missing-table
# validate warns instead of failing the pipeline


def test_p37_routine_validate_missing_table(spark, tmp_path):
    case = run_pipeline_case(
        spark, "p.37.duckdb_describe_missing_table.yaml", tmp_path,
        env={"SLING_ROUTINES_DIR": REF_PIPE})
    assert case.rt.state_ns["validate"]["status"] == "warning"


# ---------------------------------------------------------------------------
# p.12 jq source option through an inline replication (Test 1; the CLI
# half is covered by tests/test_cli_suite_ported.py shapes).
# Divergence: the trailing `sling run` CLI steps exercise the Go binary
# and are dropped here — the same flag surface is pinned in test_cli.


def test_p12_jq_source_option(spark, tmp_path):
    def drop_cli_steps(text):
        return text[:text.index("# Test 2")]

    case = run_pipeline_case(spark, "p.12.jq.yaml", tmp_path,
                             text_adapt=drop_cli_steps)
    assert case.rt.store["repl_result"][0]["cnt"] == 3
    assert case.rt.store["repl_first"][0]["name"] == "Alice"


# ---------------------------------------------------------------------------
# p.27 adjust_column_type widening via an inline replication


def test_p27_adjust_column_type_expand(spark, tmp_path):
    case = run_pipeline_case(spark,
                             "p.27.adjust_column_type_expand.yaml",
                             tmp_path)
    # the case's own checks assert the widened types + row values


# ---------------------------------------------------------------------------
# p.36 group concurrency: parallel loop iterations beat the sequential
# wall-clock; {loop.value} resolves per iteration


def test_p36_group_concurrency(spark, tmp_path):
    case = run_pipeline_case(spark, "p.36.group_concurrency.yaml",
                             tmp_path)
    assert case.rt.state_ns["concurrent_group"]["status"] == "success"


# ---------------------------------------------------------------------------
# p.17 local connections with a base path (issue #712): relative
# stream/object paths resolve against the connection's url


def test_p17_local_base_path_connections(spark, tmp_path):
    case = run_pipeline_case(spark, "p.17.unc_local_path.yaml", tmp_path)
    # the `cat` command step proved the file existed before cleanup
    assert any(isinstance(v, dict) and "Alice" in
               str(v.get("output", {}).get("stdout", ""))
               for v in case.rt.state_ns.values())


# ---------------------------------------------------------------------------
# p.07 http hook with write_to + read step.
# Divergence: no network in the sandbox — the harness injects the
# transport, exactly the injectable the engine exposes for tests.


def test_p07_http_write_read(spark, tmp_path):
    def inject_transport(text):
        return text.replace(
            'url: "https://www.omdbapi.com/?apikey={env.OMDB_API_KEY}&t=movie"',
            'url: "local-mock://movie"')

    case = PipelineCase(spark, "p.07.http.yaml", tmp_path,
                        env={"OMDB_API_KEY": "x"},
                        text_adapt=inject_transport)

    def fake_transport(url, params, headers):
        return 200, {"Title": "movie", "Resp": "ok"}

    steps = case.steps()
    for s in steps:
        if s.get("type") == "http":
            s["transport"] = fake_transport
    from sling_cli_spark.plans.pipeline import run_pipeline

    try:
        run_pipeline(spark, steps, env=case.env, runtime=case.rt)
    finally:
        case.close()
    assert "movie" in case.rt.store["movie"]


# ---------------------------------------------------------------------------
# p.23 wildcard ternary with type_of + length over mixed types: the
# Catalyst compiler folds type_of(value) statically, so the non-string
# branch never evaluates length() on ints (the reference's goval bug
# cannot reproduce). Oracle spellings adapt per the harness rules.


def test_p23_ternary_length_mixed_types(spark, tmp_path):
    def adapt(text):
        return (text
                .replace("RPAD('Very long text that exceeds 509 "
                         "characters. ', 600, 'ABCDEFGHIJ')",
                         "rpad('Very long text that exceeds 509 "
                         "characters. ', 600, 'ABCDEFGHIJ')")
                .replace("TO_DATE('2025-01-15', 'YYYY-MM-DD')",
                         "DATE '2025-01-15'")
                .replace("TO_DATE('2025-06-20', 'YYYY-MM-DD')",
                         "DATE '2025-06-20'"))

    case = run_pipeline_case(spark,
                             "p.23.ternary_length_mixed_types.yaml",
                             tmp_path, text_adapt=adapt)
    # the case's own checks assert truncation + untouched non-strings


# ---------------------------------------------------------------------------
# p.33 select grammar on a JSON file source: explicit lists narrow AND
# order, glob exclusions with implicit `*` keep SOURCE key order
# (recovered from the raw head bytes — FirstObjectKeysInOrder; Spark's
# inference sorts keys), renames drop the old name, front pins + `*` +
# back pins reorder. Raw-byte regex assertions, array-document .json
# output.

def test_p33_select_json_file_source(spark, tmp_path):
    case = run_pipeline_case(spark, "p.33.select_json_file_source.yaml",
                             tmp_path, env={"WORK": f"{tmp_path}/p33"})
    body = case.rt.store["case2_body"]
    assert body.startswith('[{"id":')
    assert "internal_score" not in body
