"""Drive the reference's PRODUCTION API specs end-to-end against local
mock HTTP servers (VERDICT r13 ask #1).

Specs under test (loaded verbatim from ``/root/reference/api/specs/``,
skipif absent):

- ``github.yaml``   — next_state page pagination, connection setup
  (rate-limit probe), queue DAG (commits -> commit_comments), sync
  keys with ``aggregation: maximum``, record processors, multiselect
  jmespath, ``require(inputs.*)`` iteration.
- ``stripe.yaml``   — starting_after cursor via ``next_state`` +
  ``jmespath(response.records, "[-1].id")``, has_more stop condition,
  defaults-level request parameters.
- ``shopify_graphql.yaml`` — POST GraphQL payloads (query + typed
  variables), cursor-from-edges pagination, ``edges[].node`` records.

Divergence notes per spec are inline at each assertion. The mock
servers (tests/api_mock_servers.py) replay the public APIs' documented
response shapes — hand-written fixtures, no live calls.
"""

from __future__ import annotations

import os

import pytest
import yaml

from tests.api_mock_servers import (
    github_routes, shopify_graphql_routes, start_server, stripe_routes)

SPECS = "/root/reference/api/specs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SPECS), reason="reference specs not present")


def load_spec(name: str, base_url: str, **state) -> dict:
    with open(os.path.join(SPECS, name)) as f:
        spec = yaml.safe_load(f)
    spec["state"] = {"base_url": base_url, **state}
    return spec


@pytest.fixture(scope="module")
def gh():
    base, stop = start_server(github_routes())
    yield base
    stop()


@pytest.fixture(scope="module")
def stripe():
    base, stop = start_server(stripe_routes())
    yield base
    stop()


# ---------------------------------------------------------------------------
# github.yaml


def _github_conn(gh, **kw):
    from sling_cli_spark.sources.api_spec import APIConnection

    spec = load_spec("github.yaml", gh)
    return APIConnection(
        spec,
        secrets={"access_token": "test-token"},
        inputs={"owner": "slingdata-io", "repositories": "sling-cli"},
        **kw)


def test_github_users_multiselect_jmespath(gh):
    conn = _github_conn(gh)
    out = conn.run(endpoints=["users"])
    recs = out["users"]
    assert len(recs) == 1
    # the endpoint's multiselect-hash jmespath projects exactly these
    assert set(recs[0]) == {
        "id", "login", "name", "email", "type", "company", "blog",
        "location", "bio", "public_repos", "public_gists", "followers",
        "following", "created_at", "updated_at"}
    assert recs[0]["login"] == "slingdata-io"


def test_github_repositories_iterates_inputs(gh):
    conn = _github_conn(gh)
    recs = conn.run(endpoints=["repositories"])["repositories"]
    assert [r["full_name"] for r in recs] == ["slingdata-io/sling-cli"]
    # multiselect pulled the nested owner.login up
    assert recs[0]["owner_login"] == "slingdata-io"


def test_github_setup_rate_limit_probe(gh):
    conn = _github_conn(gh)
    conn.run(endpoints=["users"])
    # defaults.setup processor: record.remaining -> state.quota_remaining
    assert conn.state.get("quota_remaining") == 4800


def test_github_setup_low_quota_stops_run(gh):
    from sling_cli_spark.sources.api_spec import APIConnection

    spec = load_spec("github.yaml", gh)
    # the setup rule reads state.quota_remaining AFTER the processors
    # seeded it; forcing the threshold up trips the stop rule
    for step in spec["defaults"]["setup"]:
        for rule in step["response"]["rules"]:
            rule["condition"] = "state.quota_remaining < 1000000"
    conn = APIConnection(
        spec, secrets={"access_token": "t"},
        inputs={"owner": "o", "repositories": "r"})
    with pytest.raises(RuntimeError, match="quota"):
        conn.run(endpoints=["users"])


def test_github_branches_record_processor_adds_repository(gh):
    conn = _github_conn(gh)
    recs = conn.run(endpoints=["branches"])["branches"]
    assert {r["name"] for r in recs} == {"main", "dev"}
    # processor `trim(state.repo)` -> record.repository on every row
    assert all(r["repository"] == "sling-cli" for r in recs)


def test_github_commits_sync_maximum_and_queue(gh):
    conn = _github_conn(gh)
    recs = conn.run(endpoints=["commits"])["commits"]
    assert len(recs) == 3
    # sync: [last_updated] captured with aggregation maximum over the
    # nested commit.committer.date
    assert conn.sync_out["last_updated"] == "2026-07-03T10:05:00Z"
    # the queue processor staged {repo, sha} objects for children
    q = conn.queues["commit_keys"]
    assert len(q) == 3
    items = list(q.consume())
    assert items[0]["repo"] == "sling-cli"
    assert items[0]["sha"].startswith("c000")


def test_github_commit_comments_consumes_queue(gh):
    conn = _github_conn(gh)
    out = conn.run(endpoints=["commit_comments"])
    # the topo order pulled the producer (commits) in transitively
    assert len(out["commits"]) == 3
    recs = out["commit_comments"]
    assert len(recs) == 3  # one comment per commit sha
    assert all(r["body"].startswith("lgtm c0") for r in recs)


def test_github_sync_feeds_next_run_since(gh):
    conn = _github_conn(gh, sync={"last_updated": "2026-07-02T00:00:00Z"})
    conn.run(endpoints=["commits"])
    # endpoint state: since = coalesce(sync.last_updated, anchor_date)
    # — with a persisted sync value the request carried it (the mock
    # returns all commits regardless; we assert the rendered state)
    # via the captured request log would need transport spying; the
    # state itself is authoritative here:
    ep = conn._merged(conn.spec["endpoints"]["commits"])
    st = {k: conn.evaluator.render(v, {"state": dict(conn.state)})
          if isinstance(v, str) and "{" in v else v
          for k, v in (ep.get("state") or {}).items()}
    assert st["since"] == "2026-07-02T00:00:00Z"


def test_github_missing_required_input_errors(gh):
    from sling_cli_spark.expressions import RequireError
    from sling_cli_spark.sources.api_spec import APIConnection

    spec = load_spec("github.yaml", gh)
    conn = APIConnection(spec, secrets={"access_token": "t"},
                         inputs={"owner": "slingdata-io"})
    with pytest.raises(RequireError, match="repositories"):
        conn.run(endpoints=["repositories"])


# ---------------------------------------------------------------------------
# stripe.yaml


def _stripe_conn(stripe):
    from sling_cli_spark.sources.api_spec import APIConnection

    spec = load_spec("stripe.yaml", stripe + "/v1")
    return APIConnection(spec, secrets={"api_key": "sk_test_x"})


def test_stripe_charge_cursor_pagination(stripe):
    conn = _stripe_conn(stripe)
    recs = conn.run(endpoints=["charge"])["charge"]
    # 3 pages x 2 — next_state starting_after walked every page and
    # the has_more stop condition ended the walk
    assert [r["id"] for r in recs] == [f"ch_{i:04d}" for i in range(6)]


def test_stripe_account_single_page(stripe):
    conn = _stripe_conn(stripe)
    recs = conn.run(endpoints=["account"])["account"]
    assert len(recs) == 1 and recs[0]["id"] == "acct_1"


def test_stripe_anchor_unix_rendered(stripe):
    conn = _stripe_conn(stripe)
    # defaults.state chain: anchor_date (calendar year-add) ->
    # anchor_unix (%s) — both render at connection init
    assert str(conn.state["anchor_unix"]).isdigit()


# ---------------------------------------------------------------------------
# shopify_graphql.yaml


@pytest.fixture(scope="module")
def shopify():
    base, stop = start_server(shopify_graphql_routes())
    yield base
    stop()


def _shopify_conn(shopify):
    from sling_cli_spark.sources.api_spec import APIConnection

    spec = load_spec(
        "shopify_graphql.yaml",
        shopify + "/admin/api/2025-04/graphql.json")
    return APIConnection(
        spec, secrets={"shop_name": "demo", "access_token": "shpat_x"},
        env={"UPDATED_AT_MIN": "2026-01-01T00:00:00+0000"})


def test_shopify_shop_graphql_post(shopify):
    conn = _shopify_conn(shopify)
    recs = conn.run(endpoints=["shop"])["shop"]
    assert len(recs) == 1
    assert recs[0]["name"] == "demo"
    assert recs[0]["id"].startswith("gid://shopify/Shop/")


def test_shopify_products_cursor_pages(shopify):
    conn = _shopify_conn(shopify)
    recs = conn.run(endpoints=["product"])["product"]
    # 5 products, page_size 2 -> 3 pages via edges[-1].cursor
    assert [r["title"] for r in recs] == [f"P{i}" for i in range(5)]
    # processor captured state.last_id (sync: [last_id])
    assert conn.sync_out["last_id"] == recs[-1]["id"]
    # and the product_ids queue fed for children
    assert len(conn.queues["product_ids"]) == 5


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
