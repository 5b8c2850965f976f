"""API spec machinery: auth flows, endpoint DAG, queues.

Scenario parity with the reference's ``core/dbio/api/api_test.go``
(dependent endpoints feeding child requests, cursor pagination,
401-then-refresh) using an injected fake transport — no network.
"""

import threading

import pytest

from sling_cli_spark.sources.api_spec import (
    APIConnection, BasicAuth, BearerAuth, OAuth2ClientCredentials, Queue,
    make_authenticator,
)


# ------------------------------------------------------------------ queue

def test_queue_deferred_waits_for_done():
    q = Queue("t")
    q.extend([1, 2])
    got = []

    t = threading.Thread(target=lambda: got.extend(q.consume(deferred=True)))
    t.start()
    q.append(3)
    q.mark_done()
    t.join(timeout=5)
    assert got == [1, 2, 3]


def test_queue_immediate_tails_live():
    q = Queue("t")
    got = []
    t = threading.Thread(target=lambda: got.extend(q.consume(deferred=False)))
    t.start()
    for i in range(5):
        q.append(i)
    q.mark_done()
    t.join(timeout=5)
    assert got == [0, 1, 2, 3, 4]


# ------------------------------------------------------------------- auth

def test_bearer_and_basic_headers():
    assert BearerAuth("tok").headers == {"Authorization": "Bearer tok"}
    # base64("u:p") == dTpw
    assert BasicAuth("u", "p").headers == {"Authorization": "Basic dTpw"}


def test_static_auth_renders_secrets():
    from sling_cli_spark.expressions import Evaluator

    ev = Evaluator(state={"secrets": {"API_KEY": "sk-123"}})
    a = make_authenticator(
        {"type": "static", "headers": {"X-Key": "{secrets.API_KEY}"}}, ev)
    assert a.headers == {"X-Key": "sk-123"}


def test_oauth2_client_credentials_flow_and_401_refresh():
    calls = {"token": 0, "api": 0}

    def transport(url, params, headers):
        if url.endswith("/oauth/token"):
            calls["token"] += 1
            assert params["grant_type"] == "client_credentials"
            assert params["client_id"] == "cid"
            return 200, {"access_token": f"tok{calls['token']}"}
        calls["api"] += 1
        # first api call sees an expired token -> 401 -> refresh -> retry
        if headers.get("Authorization") == "Bearer tok1":
            return 401, {"error": "expired"}
        assert headers["Authorization"] == "Bearer tok2"
        return 200, {"data": [{"id": 1}]}

    conn = APIConnection({
        "authentication": {
            "type": "oauth2",
            "authentication_url": "https://x/oauth/token",
            "client_id": "cid", "client_secret": "sec",
        },
        "endpoints": {
            "things": {
                "request": {"url": "https://x/api/things"},
                "response": {"records": {"jmespath": "data"}},
            },
        },
    }, transport=transport)
    out = conn.run()
    assert out["things"] == [{"id": 1}]
    assert calls["token"] == 2  # initial auth + 401-triggered refresh
    assert calls["api"] == 2    # 401 then success


def test_oauth2_interactive_flows_rejected():
    # device_code still needs a human; authorization_code is supported
    # round 4 via supplied code / stored refresh token (see below)
    with pytest.raises(NotImplementedError, match="browser"):
        make_authenticator({
            "type": "oauth2", "flow": "device_code",
            "authentication_url": "https://x/t"})


# ------------------------------------------------------------ endpoint DAG

def _crm_transport(log=None):
    """Fake CRM: /customers pages by cursor; /customers/<id>/orders."""
    customers = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                 {"id": 3, "name": "c"}]
    orders = {1: [{"oid": 10, "amt": 5}], 2: [],
              3: [{"oid": 30, "amt": 7}, {"oid": 31, "amt": 9}]}

    def transport(url, params, headers):
        if log is not None:
            log.append((url, dict(params or {})))
        if url.endswith("/customers"):
            cur = int(params.get("cursor", 0))
            page = customers[cur:cur + 2]
            nxt = cur + 2 if cur + 2 < len(customers) else None
            return 200, {"data": page, "next": nxt}
        if "/customers/" in url and url.endswith("/orders"):
            cid = int(url.split("/customers/")[1].split("/")[0])
            return 200, {"data": orders[cid]}
        return 404, {}

    return transport


CRM_SPEC = {
    "endpoints": {
        "customers": {
            "request": {"url": "https://crm/customers"},
            "response": {"records": {"jmespath": "data"}},
            "pagination": {"type": "cursor", "cursor_path": "next",
                           "cursor_param": "cursor"},
        },
        "orders": {
            "iterate": {"over": "queue.customers", "into": "customer",
                        "concurrency": 3},
            "request": {
                "url": "https://crm/customers/{state.customer.id}/orders"},
            "response": {"records": {"jmespath": "data"}},
        },
    },
}


def test_endpoint_dag_parent_feeds_child():
    log = []
    conn = APIConnection(CRM_SPEC, transport=_crm_transport(log))
    out = conn.run(endpoints=["orders"])  # parent pulled in as dependency
    assert sorted(r["oid"] for r in out["orders"]) == [10, 30, 31]
    assert len(out["customers"]) == 3
    # cursor pagination: customers fetched in 2 pages
    cust_calls = [(u, p) for u, p in log if u.endswith("/customers")]
    assert len(cust_calls) == 2 and cust_calls[1][1]["cursor"] == 2
    # one orders request per parent record
    assert sum("/orders" in u for u, _ in log) == 3


def test_dependency_cycle_detected():
    # reference semantics (spec.go topologicalSort + spec_test.go:994):
    # a cycle does NOT error — the stuck endpoints append alphabetically
    # after the sortable ones, with a warning
    spec = {"endpoints": {
        "a": {"depends_on": ["b"], "request": {"url": "x"}},
        "b": {"depends_on": ["a"], "request": {"url": "x"}},
        "c": {"request": {"url": "x"}},
    }}
    conn = APIConnection(spec, transport=lambda *a: (200, {}))
    assert conn._topo_order(["a", "b", "c"]) == ["c", "a", "b"]
    out = conn.run()
    assert set(out) == {"a", "b", "c"}  # all still execute


def test_iterate_over_expression():
    seen = []

    def transport(url, params, headers):
        seen.append(url)
        return 200, {"data": [{"n": url.rsplit("/", 1)[1]}]}

    conn = APIConnection({
        "endpoints": {
            "shards": {
                "iterate": {"over": "{int_range(1, 3)}", "into": "shard"},
                "request": {"url": "https://x/shard/{state.shard}"},
                "response": {"records": {"jmespath": "data"}},
            },
        },
    }, transport=transport)
    out = conn.run()
    assert sorted(r["n"] for r in out["shards"]) == ["1", "2", "3"]
    assert len(seen) == 3


def test_stop_condition_halts_pagination():
    def transport(url, params, headers):
        page = int(params.get("offset", 0)) // 2
        return 200, {"data": [{"i": page * 2}, {"i": page * 2 + 1}],
                     "done": page >= 1}

    conn = APIConnection({
        "endpoints": {
            "x": {
                "request": {"url": "https://x/items"},
                "response": {"records": {"jmespath": "data"}},
                "pagination": {"type": "offset", "page_size": 2,
                               "stop_condition": "response.json.done"},
            },
        },
    }, transport=transport)
    out = conn.run()
    assert [r["i"] for r in out["x"]] == [0, 1, 2, 3]


def test_run_to_dataframes(spark):
    conn = APIConnection(CRM_SPEC, transport=_crm_transport())
    out = conn.run(spark=spark)
    assert out["customers"].count() == 3
    rows = {r["oid"]: r["amt"] for r in out["orders"].collect()}
    assert rows == {10: 5, 30: 7, 31: 9}


def test_defaults_request_merged_and_env_rendered():
    seen = {}

    def transport(url, params, headers):
        seen.update(headers=dict(headers), params=dict(params))
        return 200, {"data": [{"ok": 1}]}

    conn = APIConnection({
        "defaults": {"request": {"headers": {"X-App": "{env.APP}"}}},
        "endpoints": {
            "e": {"request": {"url": "https://x/e",
                              "parameters": {"since": "{state.start}"}},
                  "response": {"records": {"jmespath": "data"}}},
        },
        "state": {"start": "2025-01-01"},
    }, env={"APP": "sling"}, transport=transport)
    out = conn.run()
    assert out["e"] == [{"ok": 1}]
    assert seen["headers"]["X-App"] == "sling"
    assert seen["params"]["since"] == "2025-01-01"


# ------------------------------------------------- records post-processing

def test_records_pk_dedup_select_casing_limit():
    pages = [{"data": [{"Id": 1, "Name": "a", "Tmp": "x"},
                       {"Id": 2, "Name": "b", "Tmp": "y"},
                       {"Id": 1, "Name": "a2", "Tmp": "z"},  # dup PK
                       {"Id": 3, "Name": "c", "Tmp": "w"}]}]

    conn = APIConnection({
        "endpoints": {
            "e": {
                "request": {"url": "https://x/e"},
                "response": {"records": {
                    "jmespath": "data", "primary_key": "Id",
                    "select": ["-Tmp"], "casing": "snake", "limit": 2}},
            },
        },
    }, transport=lambda *a: (200, pages[0]))
    out = conn.run()
    assert out["e"] == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


# ----------------------------------------------------------- response rules

def test_rule_retry_with_backoff_then_success():
    calls = {"n": 0}

    def transport(url, params, headers):
        calls["n"] += 1
        if calls["n"] < 3:
            return 429, {"err": "rate limited"}
        return 200, {"data": [{"ok": 1}]}

    conn = APIConnection({
        "endpoints": {
            "e": {
                "request": {"url": "https://x/e"},
                "response": {
                    "records": {"jmespath": "data"},
                    "rules": [{"action": "retry",
                               "condition": "response.status == 429",
                               "max_attempts": 5,
                               "backoff": "none"}]},
            },
        },
    }, transport=transport)
    assert conn.run()["e"] == [{"ok": 1}]
    assert calls["n"] == 3


def test_rule_retry_exhausted_fails():
    conn = APIConnection({
        "endpoints": {
            "e": {"request": {"url": "https://x/e"},
                  "response": {"rules": [
                      {"action": "retry", "condition": "response.status == 429",
                       "max_attempts": 2, "backoff": "none"}]}},
        },
    }, transport=lambda *a: (429, {}))
    with pytest.raises(RuntimeError, match="API error 429"):
        conn.run()


def test_rule_stop_halts_endpoint():
    def transport(url, params, headers):
        off = int(params.get("offset", 0))
        return 200, {"data": [{"i": off}], "quota": off >= 1}

    conn = APIConnection({
        "endpoints": {
            "e": {"request": {"url": "https://x/e"},
                  "response": {
                      "records": {"jmespath": "data"},
                      "rules": [{"action": "stop",
                                 "condition": "response.json.quota == true"}]},
                  "pagination": {"type": "offset", "page_size": 1}},
        },
    }, transport=transport)
    # page0 ok; page1 matches stop -> its records are not consumed
    assert conn.run()["e"] == [{"i": 0}]


def test_rule_skip_drops_records_keeps_paging():
    def transport(url, params, headers):
        off = int(params.get("offset", 0))
        flagged = off == 1
        data = [{"i": off, "bad": flagged}]
        return 200, {"data": data, "bad_page": flagged}

    conn = APIConnection({
        "endpoints": {
            "e": {"request": {"url": "https://x/e"},
                  "response": {
                      "records": {"jmespath": "data"},
                      "rules": [{"action": "skip",
                                 "condition": "response.json.bad_page == true"}]},
                  "pagination": {"type": "offset", "page_size": 1,
                                 "max_pages": 3}},
        },
    }, transport=transport)
    assert conn.run()["e"] == [{"i": 0, "bad": False}, {"i": 2, "bad": False}]


# ----------------------------------------- round 4: oauth2 + durable queue

class _TokenServer:
    """Fake token endpoint: code -> token exchange, refresh grant with
    rotation, and expiring access tokens."""

    def __init__(self):
        self.n = 0
        self.calls = []

    def __call__(self, url, params, headers):
        self.calls.append(dict(params))
        grant = params.get("grant_type")
        if grant == "authorization_code":
            if params.get("code") != "goodcode":
                return 400, {"error": "invalid_grant"}
            self.n += 1
            return 200, {"access_token": f"AT{self.n}",
                         "refresh_token": f"RT{self.n}"}
        if grant == "refresh_token":
            if not str(params.get("refresh_token", "")).startswith("RT"):
                return 400, {"error": "invalid_grant"}
            self.n += 1
            return 200, {"access_token": f"AT{self.n}",
                         "refresh_token": f"RT{self.n}"}
        return 400, {"error": "unsupported_grant_type"}


def test_auth_code_exchange_and_store(tmp_path):
    from sling_cli_spark.sources.api_spec import OAuth2AuthorizationCode

    srv = _TokenServer()
    store = str(tmp_path / "tok.json")
    a = OAuth2AuthorizationCode(
        "https://idp/token", "cid", "sec", code="goodcode",
        redirect_uri="http://localhost/callback", token_store=store,
        transport=srv)
    a.authenticate()
    assert a.headers["Authorization"] == "Bearer AT1"
    assert srv.calls[0]["grant_type"] == "authorization_code"
    assert srv.calls[0]["redirect_uri"] == "http://localhost/callback"
    import json
    assert json.load(open(store))["refresh_token"] == "RT1"


def test_stored_refresh_token_survives_restart(tmp_path):
    """A new process with only the token_store refreshes without a code,
    and rotation persists the NEW refresh token (auth.go:448-469)."""
    from sling_cli_spark.sources.api_spec import OAuth2AuthorizationCode

    srv = _TokenServer()
    store = str(tmp_path / "tok.json")
    a1 = OAuth2AuthorizationCode("https://idp/token", "cid", "sec",
                                 code="goodcode", token_store=store,
                                 transport=srv)
    a1.authenticate()

    a2 = OAuth2AuthorizationCode("https://idp/token", "cid", "sec",
                                 token_store=store, transport=srv)
    a2.authenticate()  # no code: refresh grant from the store
    assert a2.headers["Authorization"] == "Bearer AT2"
    assert srv.calls[-1] == {
        "grant_type": "refresh_token", "refresh_token": "RT1",
        "client_id": "cid", "client_secret": "sec"}
    import json
    assert json.load(open(store))["refresh_token"] == "RT2"


def test_401_triggers_refresh_and_retry(tmp_path):
    """An endpoint 401 mid-run refreshes the token once and retries."""
    from sling_cli_spark.sources.api_spec import APIConnection

    srv = _TokenServer()
    seen_tokens = []

    def api_transport(url, params, headers):
        if "idp/token" in url:
            return srv(url, params, headers)
        tok = headers.get("Authorization")
        seen_tokens.append(tok)
        if tok == "Bearer AT1":
            return 401, {"error": "expired"}
        return 200, {"items": [{"id": 1}]}

    conn = APIConnection({
        "name": "t",
        "authentication": {
            "type": "oauth2", "flow": "authorization_code",
            "authentication_url": "https://idp/token",
            "client_id": "cid", "client_secret": "sec",
            "code": "goodcode",
        },
        "endpoints": {
            "items": {"request": {"url": "https://api/items"},
                      "response": {"records": {"jmespath": "items"}}},
        },
    }, transport=api_transport)
    rows = conn.fetch_endpoint("items")
    assert rows == [{"id": 1}]
    assert seen_tokens == ["Bearer AT1", "Bearer AT2"]


def test_auth_code_without_code_or_store_raises():
    import pytest as _pytest

    from sling_cli_spark.sources.api_spec import OAuth2AuthorizationCode

    a = OAuth2AuthorizationCode("https://idp/token", "cid", transport=_TokenServer())
    with _pytest.raises(RuntimeError, match="browser authorization"):
        a.authenticate()


def test_durable_queue_survives_restart(tmp_path):
    from sling_cli_spark.sources.api_spec import Queue

    p = str(tmp_path / "q.jsonl")
    q1 = Queue("jobs", path=p)
    q1.extend([{"page": 1}, {"page": 2}])
    q1.append({"page": 3})
    q1.close()  # simulated crash/restart boundary

    q2 = Queue("jobs", path=p)
    assert len(q2) == 3
    q2.append({"page": 4})
    q2.mark_done()
    assert [i["page"] for i in q2.consume()] == [1, 2, 3, 4]
    q2.close()


# ------------------------------------------------ queue_test.go vectors

def test_queue_append_explodes_slices_ported():
    # queue_test.go:84 — slices explode into elements; byte payloads
    # stay ONE item, base64-encoded (Go json.Marshal of []byte)
    q = Queue("test-queue-slice-int")
    q.append([1, 2, 3])
    q.reset()
    for expected in (1, 2, 3):
        item, has_more = q.next()
        assert has_more and item == expected
    _, has_more = q.next()
    assert not has_more

    q2 = Queue("test-queue-byteslice")
    q2.append(b"hello")
    q2.reset()
    item, has_more = q2.next()
    assert has_more and item == "aGVsbG8="
    _, has_more = q2.next()
    assert not has_more


def test_queue_reset_rewinds_ported():
    # queue_test.go:158 — Reset replays from the start
    q = Queue("test-reset")
    q.extend(["a", "b"])
    q.reset()
    assert q.next() == ("a", True)
    assert q.next() == ("b", True)
    assert q.next()[1] is False
    q.reset()
    assert q.next() == ("a", True)  # rewound


def test_queue_write_then_read_then_write_ported():
    # queue_test.go:193/229 — reads interleave with writes; items
    # written after a drain surface on the next read
    q = Queue("test-wr")
    q.append("x")
    q.reset()
    assert q.next() == ("x", True)
    assert q.next()[1] is False
    q.append("y")
    assert q.next() == ("y", True)
    assert q.next()[1] is False


def test_queue_empty_ported():
    # queue_test.go:482
    q = Queue("empty")
    q.reset()
    assert q.next() == (None, False)


def test_queue_durable_close_and_reopen_ported(tmp_path):
    # queue_test.go:501 — a reopened file-backed queue replays items
    p = str(tmp_path / "q.jsonl")
    q = Queue("jobs", path=p)
    q.append([{"id": 1}, {"id": 2}])
    q.close()
    q2 = Queue("jobs", path=p)
    q2.reset()
    assert q2.next() == ({"id": 1}, True)
    assert q2.next() == ({"id": 2}, True)
    assert q2.next()[1] is False


# -------------------------------------------- spec_test.go DAG vectors

CUSTOMER_INVOICE_SPEC = {
    "name": "Test API",
    "queues": ["customer_ids", "invoice_ids"],
    "endpoints": {
        "customer": {
            "request": {"url": "http://x/customers"},
            "response": {
                "records": {"jmespath": "data[]"},
                "processors": [
                    {"expression": "record.id",
                     "output": "queue.customer_ids"}]}},
        "customer_balance": {
            "iterate": {"over": "queue.customer_ids",
                        "into": "state.customer_id"},
            "request": {"url": "http://x/balance"},
            "response": {"records": {"jmespath": "data[]"}}},
        "invoice": {
            "request": {"url": "http://x/invoices"},
            "response": {
                "records": {"jmespath": "data[]"},
                "processors": [
                    {"expression": "record.id",
                     "output": "queue.invoice_ids"}]}},
        "invoice_line_item": {
            "iterate": {"over": "queue.invoice_ids",
                        "into": "state.invoice_id"},
            "request": {"url": "http://x/lines"},
            "response": {"records": {"jmespath": "data[]"}}},
        "charge": {
            "request": {"url": "http://x/charges"},
            "response": {"records": {"jmespath": "data[]"}}},
    },
}


def _conn(spec):
    return APIConnection(spec, {}, transport=lambda *a, **k: (200, {}))


def test_build_dependency_map_ported():
    # spec_test.go:442 — queue consumers depend on queue PRODUCERS
    c = _conn(CUSTOMER_INVOICE_SPEC)
    eps = CUSTOMER_INVOICE_SPEC["endpoints"]
    assert c._deps("customer_balance", eps["customer_balance"]) == \
        {"customer"}
    assert c._deps("invoice_line_item", eps["invoice_line_item"]) == \
        {"invoice"}
    assert c._deps("customer", eps["customer"]) == set()
    assert c._deps("charge", eps["charge"]) == set()


TOPO_CASES = [
    ("simple chain", ["a", "b", "c"],
     {"a": set(), "b": {"a"}, "c": {"b"}}, ["a", "b", "c"]),
    ("diamond dependency", ["a", "b", "c", "d"],
     {"a": set(), "b": {"a"}, "c": {"a"}, "d": {"b", "c"}},
     ["a", "b", "c", "d"]),
    ("no dependencies", ["z", "a", "m"],
     {"z": set(), "a": set(), "m": set()}, ["a", "m", "z"]),
    ("multiple roots", ["a", "b", "c", "d", "e"],
     {"a": set(), "b": set(), "c": {"a"}, "d": {"b"}, "e": {"c", "d"}},
     ["a", "b", "c", "d", "e"]),
]


@pytest.mark.parametrize("name,names,deps,expected", TOPO_CASES,
                         ids=[c[0] for c in TOPO_CASES])
def test_topological_sort_ported(name, names, deps, expected, monkeypatch):
    # spec_test.go:518 — Kahn's with alphabetical tie-break
    spec = {"endpoints": {n: {} for n in names}}
    c = _conn(spec)
    monkeypatch.setattr(type(c), "_deps",
                        lambda self, n, ep: deps.get(n, set()))
    assert c._topo_order(names) == expected


def test_topo_order_full_spec_and_circular():
    # spec_test.go:257/994 — consumers follow producers; a cycle appends
    # leftovers alphabetically instead of erroring
    c = _conn(CUSTOMER_INVOICE_SPEC)
    order = c._topo_order(list(CUSTOMER_INVOICE_SPEC["endpoints"]))
    assert order.index("customer") < order.index("customer_balance")
    assert order.index("invoice") < order.index("invoice_line_item")
    assert order == ["charge", "customer", "invoice",
                     "customer_balance", "invoice_line_item"]

    cyc = _conn({"endpoints": {
        "a": {"depends_on": ["b"]}, "b": {"depends_on": ["a"]},
        "c": {}}})
    assert cyc._topo_order(["a", "b", "c"]) == ["c", "a", "b"]


def test_multiple_producers_for_same_queue_ported():
    # spec_test.go:1019 — the consumer depends on EVERY producer
    spec = {"endpoints": {
        "p1": {"response": {"processors": [
            {"expression": "record.id", "output": "queue.shared"}]}},
        "p2": {"response": {"processors": [
            {"expression": "record.id", "output": "queue.shared"}]}},
        "consumer": {"iterate": {"over": "queue.shared"}},
    }}
    c = _conn(spec)
    assert c._deps("consumer", spec["endpoints"]["consumer"]) == \
        {"p1", "p2"}
    order = c._topo_order(["p1", "p2", "consumer"])
    assert order == ["p1", "p2", "consumer"]


def test_disabled_endpoints_skipped_ported():
    # spec_test.go:1094
    spec = {"endpoints": {
        "on": {"request": {"url": "http://x/on"},
               "response": {"records": {"jmespath": "data[]"}}},
        "off": {"disabled": True,
                "request": {"url": "http://x/off"},
                "response": {"records": {"jmespath": "data[]"}}},
    }}
    calls = []

    def transport(url, *a, **k):
        calls.append(url)
        return 200, {"data": [{"id": 1}]}

    out = APIConnection(spec, {}, transport=transport).run()
    assert "on" in out and "off" not in out
    assert all("off" not in u for u in calls)


def test_queue_producer_consumer_end_to_end():
    # the full producer->named-queue->consumer flow through run()
    hits = []

    def transport(url, params=None, headers=None, **k):
        hits.append((url, dict(params or {})))
        if "customers" in url:
            return 200, {"data": [{"id": 7}, {"id": 9}]}
        return 200, {"data": [{"cust": (params or {}).get("cid"),
                               "bal": 10}]}

    spec = {
        "endpoints": {
            "customer": {
                "request": {"url": "http://x/customers"},
                "response": {
                    "records": {"jmespath": "data[]"},
                    "processors": [{"expression": "record.id",
                                    "output": "queue.customer_ids"}]}},
            "customer_balance": {
                "iterate": {"over": "queue.customer_ids",
                            "into": "state.cid"},
                "request": {"url": "http://x/balance",
                            "parameters": {"cid": "{state.cid}"}},
                "response": {"records": {"jmespath": "data[]"}}},
        },
    }
    out = APIConnection(spec, {}, transport=transport).run()
    assert [r["cust"] for r in out["customer_balance"]] == [7, 9]


# --------------------------------------- dynamic endpoints (spec_test.go)

def test_dynamic_endpoints_basic_ported():
    # spec_test.go:1343 — one endpoint per item of a JSON-literal list
    hits = []

    def transport(url, params=None, headers=None, **k):
        hits.append(url)
        return 200, {"data": [{"u": url}]}

    spec = {
        "name": "Test Dynamic API",
        "defaults": {"state": {"base_url": "http://api"}},
        "dynamic_endpoints": [{
            "iterate": '["users", "orders", "products"]',
            "into": "state.resource_type",
            "endpoint": {
                "name": "{state.resource_type}",
                "description": "Endpoint for {state.resource_type}",
                "request": {"url": "{state.base_url}/{state.resource_type}"},
                "response": {"records": {"jmespath": "data[]"}}},
        }],
    }
    conn = APIConnection(spec, transport=transport)
    generated = conn.render_dynamic_endpoints()
    assert generated == ["users", "orders", "products"]
    eps = conn.spec["endpoints"]
    assert eps["users"]["description"] == "Endpoint for users"
    out = conn.run()
    assert set(out) == {"users", "orders", "products"}
    assert sorted(hits) == ["http://api/orders", "http://api/products",
                            "http://api/users"]


def test_dynamic_endpoints_with_setup_ported():
    # spec_test.go:1378 — setup request discovers the iterate list
    def transport(url, params=None, headers=None, **k):
        if url.endswith("/metadata/tables"):
            return 200, {"tables": [{"name": "t1"}, {"name": "t2"}]}
        return 200, {"rows": [{"id": 1, "src": url}]}

    spec = {
        "defaults": {"state": {"base_url": "http://api"}},
        "dynamic_endpoints": [{
            "setup": [{
                "request": {"url": "{state.base_url}/metadata/tables"},
                "response": {"processors": [{
                    "expression": "response.json.tables[].name",
                    "output": "state.available_tables",
                    "aggregation": "flatten"}]},
            }],
            "iterate": "state.available_tables",
            "into": "state.table_name",
            "endpoint": {
                "name": "table_{state.table_name}",
                "request": {"url": "{state.base_url}/tables/{state.table_name}"},
                "response": {"records": {"jmespath": "rows[]"}}},
        }],
    }
    conn = APIConnection(spec, transport=transport)
    out = conn.run()
    assert set(out) == {"table_t1", "table_t2"}
    assert out["table_t1"][0]["src"] == "http://api/tables/t1"


def test_dynamic_endpoints_duplicate_name_errors():
    spec = {"dynamic_endpoints": [{
        "iterate": '["x", "x"]', "into": "state.r",
        "endpoint": {"name": "{state.r}",
                     "request": {"url": "http://a/{state.r}"}}}]}
    conn = APIConnection(spec, {}, transport=lambda *a, **k: (200, {}))
    with pytest.raises(ValueError, match="duplicate endpoint name"):
        conn.render_dynamic_endpoints()


def test_dynamic_endpoints_mixed_with_static():
    # spec_test.go:1466 — dynamic endpoints join the static ones
    def transport(url, params=None, headers=None, **k):
        return 200, {"data": [{"u": url}]}

    spec = {
        "endpoints": {
            "static_one": {"request": {"url": "http://a/static"},
                           "response": {"records": {"jmespath": "data[]"}}}},
        "dynamic_endpoints": [{
            "iterate": ["d1", "d2"],  # native YAML list form
            "into": "state.n",
            "endpoint": {"name": "dyn_{state.n}",
                         "request": {"url": "http://a/{state.n}"},
                         "response": {"records": {"jmespath": "data[]"}}}}],
    }
    out = APIConnection(spec, {}, transport=transport).run()
    assert set(out) == {"static_one", "dyn_d1", "dyn_d2"}


# ----------------------------------------- HMAC auth (api_test.go:1820+)

def _hmac_sig(secret, algo, string_to_sign):
    import hashlib
    import hmac as _hmac

    digest = hashlib.sha256 if algo == "sha256" else hashlib.sha512
    return _hmac.new(secret, string_to_sign.encode(), digest).hexdigest()


def test_hmac_sha256_basic_ported():
    import hashlib

    from sling_cli_spark.sources.api_spec import HMACAuth

    a = HMACAuth("test_secret_key", algorithm="sha256",
                 signing_string="{http_method}{http_path}{http_body_sha256}",
                 request_headers={"X-Signature": "{signature}"})
    hdrs = a.sign("GET", "http://x/api/items", {"a": "1"})
    body_hash = hashlib.sha256(b"").hexdigest()
    want = _hmac_sig(b"test_secret_key", "sha256",
                     "GET/api/items?a=1" + body_hash)
    assert hdrs["X-Signature"] == want


def test_hmac_sha512_with_timestamp_ported():
    from sling_cli_spark.sources.api_spec import HMACAuth

    a = HMACAuth("test_secret_512", algorithm="sha512",
                 signing_string="{http_method}{http_path}{unix_time}",
                 request_headers={"X-Signature": "{signature}",
                                  "X-Timestamp": "{unix_time}"})
    hdrs = a.sign("GET", "http://x/v1/data", {})
    ts = hdrs["X-Timestamp"]
    assert ts.isdigit()
    want = _hmac_sig(b"test_secret_512", "sha512", "GET/v1/data" + ts)
    assert hdrs["X-Signature"] == want


def test_hmac_with_nonce_ported():
    from sling_cli_spark.sources.api_spec import HMACAuth

    a = HMACAuth("nonce_secret", algorithm="sha256",
                 signing_string="{http_method}{nonce}{unix_time}",
                 request_headers={"X-Signature": "{signature}",
                                  "X-Nonce": "{nonce}",
                                  "X-Timestamp": "{unix_time}"},
                 nonce_length=16)
    hdrs = a.sign("GET", "http://x/p", {})
    nonce = hdrs["X-Nonce"]
    assert len(nonce) == 32 and all(c in "0123456789abcdef" for c in nonce)
    want = _hmac_sig(b"nonce_secret", "sha256",
                     "GET" + nonce + hdrs["X-Timestamp"])
    assert hdrs["X-Signature"] == want
    # nonces are fresh per request
    assert a.sign("GET", "http://x/p", {})["X-Nonce"] != nonce


def test_hmac_secret_encodings_ported():
    from sling_cli_spark.sources.api_spec import HMACAuth

    raw = b"\x01\x02secret\xff"
    hex_a = HMACAuth(raw.hex(), secret_encoding="hex",
                     signing_string="{http_method}",
                     request_headers={"S": "{signature}"})
    import base64 as _b64
    b64_a = HMACAuth(_b64.b64encode(raw).decode(), secret_encoding="base64",
                     signing_string="{http_method}",
                     request_headers={"S": "{signature}"})
    want = _hmac_sig(raw, "sha256", "GET")
    assert hex_a.sign("GET", "http://x/", {})["S"] == want
    assert b64_a.sign("GET", "http://x/", {})["S"] == want
    # api_test.go TestHMACSecretEncodingErrors
    with pytest.raises(ValueError, match="hex-encoded"):
        HMACAuth("zz-not-hex", secret_encoding="hex")
    with pytest.raises(ValueError, match="base64-encoded"):
        HMACAuth("!!!", secret_encoding="base64")
    with pytest.raises(ValueError, match="secret_encoding"):
        HMACAuth("x", secret_encoding="rot13")
    # api_test.go TestHMACAuthenticationErrors: bad algorithm
    with pytest.raises(ValueError, match="algorithm"):
        HMACAuth("x", algorithm="md5")


def test_hmac_through_connection_request():
    # the signer fires per request via the authentication: block
    seen = {}

    def transport(url, params=None, headers=None, **k):
        seen.update(headers or {})
        return 200, {"data": [{"ok": 1}]}

    spec = {
        "authentication": {
            "type": "hmac", "secret": "k1",
            "signing_string": "{http_method}{http_path}",
            "request_headers": {"X-Sig": "{signature}"}},
        "endpoints": {
            "e": {"request": {"url": "http://h/api/e"},
                  "response": {"records": {"jmespath": "data[]"}}}},
    }
    out = APIConnection(spec, {}, transport=transport).run()
    assert out["e"] == [{"ok": 1}]
    assert seen["X-Sig"] == _hmac_sig(b"k1", "sha256", "GET/api/e")
