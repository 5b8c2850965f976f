"""Port of the reference's THREE ``tests/specs/`` scenarios (VERDICT
r13 ask #1) — each driven against a local mock server with the
scenario's OWN pipeline/replication YAML as the assertion:

- ``queue_only_omdb``           — queue_only producer feeding a
  consumer endpoint through an iop queue, full pipeline.yaml driven
  (its check steps are the assertions).
- ``queue_streaming_failfast``  — two independent streaming-queue
  groups (consume: immediate); success run (all children get all
  items, incl. the non-queue_only producer regression for group 3)
  and fail-fast run (a 422 in group 1 fails its children while the
  independent group 2 completes).
- ``api_select_columns``        — the `select` contract for API
  sources, driven in test_api_select_pipeline.py (the 10-case
  pipeline).

Documented divergences:
- mock servers stand in for omdbapi.com / the Go test server
  (tests/api_mock_servers.py replays the same shapes; server.go's
  fixture generator is re-expressed in python — same /search, /detail,
  NUM_ITEMS, FAIL_ON_ID, FAIL_ON_GROUP contract).
- the engine executes replication streams sequentially; the
  fail-fast scenario asserts the reference's OUTCOME contract (group 1
  errors, group 2 complete) rather than its concurrent termination
  timing.
"""

from __future__ import annotations

import json
import os

import pytest
import yaml

from tests.api_mock_servers import omdb_routes, queue_stream_routes, start_server

SPECS = "/root/reference/tests/specs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SPECS), reason="reference tests/specs not present")


@pytest.fixture(autouse=True)
def _fresh_conns():
    from sling_cli_spark.sources.api_spec import clear_api_conns

    clear_api_conns()
    yield
    clear_api_conns()


def _run_pipeline_doc(spark, text: str, conn_urls: dict, env: dict):
    from sling_cli_spark.plans.pipeline import (
        PipelineRuntime, run_pipeline)

    doc = yaml.safe_load(text)
    penv = {**{str(k): str(v) for k, v in (doc.get("env") or {}).items()},
            **env}
    rt = PipelineRuntime(
        connections={}, conn_urls=conn_urls,
        state={"execution": {"status": {"error": 0, "success": 0}}},
        env=penv)
    run_pipeline(spark, doc.get("steps") or [], env=penv, runtime=rt)
    return rt


# ---------------------------------------------------------------------------
# queue_only_omdb


def test_queue_only_omdb_pipeline(spark, tmp_path):
    from sling_cli_spark.sources.api_spec import register_api_conn

    base, stop = start_server(omdb_routes())
    try:
        register_api_conn(
            "OMDB_QUEUE_TEST",
            spec_path=os.path.join(SPECS, "queue_only_omdb/omdb.yaml"),
            env={"OMDB_API_KEY": "test-key"},
            state={"base_url": base})
        with open(os.path.join(SPECS, "queue_only_omdb/pipeline.yaml")) as f:
            text = f.read().replace("${OMDB_API_KEY}", "test-key")
        out_dir = str(tmp_path / "omdb_out")
        # the pipeline's check steps ARE the assertions (CheckFailed on
        # violation): consumer produced >100 bytes, imdbID/Title fields,
        # and the Batman-1989 id flowed producer->queue->consumer
        _run_pipeline_doc(
            spark, text,
            conn_urls={"omdb_queue_test": "api://OMDB_QUEUE_TEST"},
            env={"OUT_DIR": out_dir, "OMDB_API_KEY": "test-key"})
        # structural double-check on the consumer output file
        with open(os.path.join(out_dir, "details.json")) as f:
            details = json.load(f)
        assert {d["imdbID"] for d in details} == {
            "tt0096895", "tt0103776", "tt0118688"}
    finally:
        stop()


def test_queue_only_producer_emits_no_records(spark, tmp_path):
    """queue_only: the producer runs (fills the queue) but emits zero
    records downstream — its own stream writes nothing."""
    from sling_cli_spark.sources.api_spec import open_api_conn, register_api_conn

    base, stop = start_server(omdb_routes())
    try:
        register_api_conn(
            "OMDB_Q2", spec_path=os.path.join(
                SPECS, "queue_only_omdb/omdb.yaml"),
            env={"OMDB_API_KEY": "k"}, state={"base_url": base})
        conn = open_api_conn("api://OMDB_Q2")
        out = conn.run(endpoints=["search", "details"])
        assert out["search"] == []            # queue_only: no records
        assert len(out["details"]) == 3       # consumer iterated queue
        assert len(conn.queues["imdb_ids"]) == 3
    finally:
        stop()


# ---------------------------------------------------------------------------
# queue_streaming_failfast


def _failfast_rc(name: str, out_dir: str):
    from sling_cli_spark.plans.replication import ReplicationConfig

    from sling_cli_spark.expressions import Evaluator

    with open(os.path.join(SPECS, "queue_streaming_failfast", name)) as f:
        text = f.read().replace("${OUT_DIR}", out_dir)
    doc = yaml.safe_load(text)
    env = {str(k): str(v) for k, v in (doc.get("env") or {}).items()}
    # `{env.*}` spans render against the case env (same policy as
    # tests/replication_harness.ReplicationCase.replication_config)
    ev = Evaluator(state={"env": dict(env), **env},
                   keep_missing=True, allow_no_prefix=True)
    return ReplicationConfig(
        source="api://QUEUE_STREAM_TEST",
        target=doc.get("target"),
        defaults=ev.render(doc.get("defaults") or {}),
        streams=ev.render(doc.get("streams") or {}),
        env=env, hooks={})


def _register_queue_stream(base):
    from sling_cli_spark.sources.api_spec import register_api_conn

    register_api_conn(
        "QUEUE_STREAM_TEST",
        spec_path=os.path.join(
            SPECS, "queue_streaming_failfast/spec.yaml"),
        env={"TEST_BASE_URL": base})


def _read_json(path):
    with open(path) as f:
        return json.load(f)


def test_queue_streaming_success(spark, tmp_path):
    from sling_cli_spark.plans.replication import run_replication

    base, stop = start_server(queue_stream_routes(num_items=30))
    out_dir = str(tmp_path / "qs_ok")
    try:
        _register_queue_stream(base)
        rc = _failfast_rc("replication.success.yaml", out_dir)
        results = run_replication(spark, rc, base_output=out_dir)
        # every child stream got ALL 30 items (queue broadcast + count
        # match — the run_test.sh success contract), including group 3's
        # regression: list_c is a REGULAR producer that must still
        # signal queue done for details_c
        for child in ("details_a", "details_b", "details2_a",
                      "details2_b", "details_c"):
            rows = _read_json(os.path.join(out_dir, f"{child}.json"))
            assert len(rows) == 30, child
            assert {r["id"] for r in rows} == {
                f"item-{i:03d}" for i in range(1, 31)}
        # list_c ALSO emits its own 30 records (not queue_only)
        rows = _read_json(os.path.join(out_dir, "list_c.json"))
        assert len(rows) == 30
        # queue_only producers emit no rows
        assert results["search"].rows == 0
    finally:
        stop()


def test_queue_streaming_failfast(spark, tmp_path):
    from sling_cli_spark.plans.pipeline import PipelineRuntime
    from sling_cli_spark.plans.replication import run_replication

    base, stop = start_server(queue_stream_routes(
        num_items=30, fail_on_id="item-015", fail_on_group="1"))
    out_dir = str(tmp_path / "qs_ff")
    try:
        _register_queue_stream(base)
        rc = _failfast_rc("replication.failfast.yaml", out_dir)
        rt = PipelineRuntime(
            connections={},
            state={"execution": {"status": {"error": 0, "success": 0}}},
            env=rc.env)
        results = run_replication(spark, rc, base_output=out_dir,
                                  runtime=rt, continue_on_error=True)
        errs = rt.state_extra["execution"]["status"]["error"]
        # group 1's children fail on the injected 422
        assert errs >= 1
        assert results.get("details_a") is None \
            or results.get("details_b") is None
        # the INDEPENDENT group 2 finished with all items
        for child in ("details2_a", "details2_b"):
            rows = _read_json(os.path.join(out_dir, f"{child}.json"))
            assert len(rows) == 30, child
    finally:
        stop()


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
