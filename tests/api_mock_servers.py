"""Local mock HTTP servers replaying the response SHAPES of the
reference's production API specs (github / stripe / shopify_graphql)
and its tests/specs scenarios. Fixture data is hand-written from the
public API docs' documented shapes — nothing fetched from live
services. Each server binds 127.0.0.1:0 (free port) in a daemon
thread; ``base_url`` is what the spec's state override points at."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


# ---------------------------------------------------------------------------
# GitHub fixtures: the repo object's public field census (~82 top-level
# fields, the real API's names) — enough for the select pipeline's
# ">= 80 columns" and alphabetical-remainder assertions.

_GH_OWNER = {
    "login": "slingdata-io", "id": 7671, "node_id": "O_kg", "type":
    "Organization", "site_admin": False,
    "avatar_url": "https://avatars.example/u/7671",
    "url": "https://api.github.example/users/slingdata-io",
    "html_url": "https://github.example/slingdata-io",
}

_GH_URL_FIELDS = [
    "forks_url", "keys_url", "collaborators_url", "teams_url",
    "hooks_url", "issue_events_url", "events_url", "assignees_url",
    "branches_url", "tags_url", "blobs_url", "git_tags_url",
    "git_refs_url", "trees_url", "statuses_url", "languages_url",
    "stargazers_url", "contributors_url", "subscribers_url",
    "subscription_url", "commits_url", "git_commits_url",
    "comments_url", "issue_comment_url", "contents_url", "compare_url",
    "merges_url", "archive_url", "downloads_url", "issues_url",
    "pulls_url", "milestones_url", "notifications_url", "labels_url",
    "releases_url", "deployments_url",
]


def gh_repo(idx: int = 0, name: str = "sling-cli") -> dict:
    r = {
        "id": 400000 + idx, "node_id": f"R_kg{idx}", "name": name,
        "full_name": f"slingdata-io/{name}", "private": False,
        "owner": dict(_GH_OWNER),
        "html_url": f"https://github.example/slingdata-io/{name}",
        "description": None if idx == 1 else f"data movement tool {idx}",
        "fork": False,
        "url": f"https://api.github.example/repos/slingdata-io/{name}",
    }
    for f in _GH_URL_FIELDS:
        r[f] = f"https://api.github.example/repos/slingdata-io/{name}/{f}"
    r.update({
        "created_at": "2021-01-01T00:00:00Z",
        "updated_at": "2026-08-01T00:00:00Z",
        "pushed_at": "2026-08-02T00:00:00Z",
        "git_url": f"git://github.example/slingdata-io/{name}.git",
        "ssh_url": f"git@github.example:slingdata-io/{name}.git",
        "clone_url": f"https://github.example/slingdata-io/{name}.git",
        "svn_url": f"https://github.example/slingdata-io/{name}",
        "homepage": "https://slingdata.example", "size": 4200 + idx,
        "stargazers_count": 900 - idx, "watchers_count": 900 - idx,
        "language": "Go", "has_issues": True, "has_projects": True,
        "has_downloads": True, "has_wiki": False, "has_pages": False,
        "has_discussions": True, "forks_count": 70, "mirror_url": None,
        "archived": False, "disabled": False, "open_issues_count": 12,
        "license": {"key": "gpl-3.0", "name": "GNU GPLv3",
                    "spdx_id": "GPL-3.0"},
        "allow_forking": True, "is_template": False,
        "web_commit_signoff_required": False,
        "topics": ["data", "elt"], "visibility": "public", "forks": 70,
        "open_issues": 12, "watchers": 900 - idx,
        "temp_clone_token": None, "network_count": 70,
        "subscribers_count": 30, "default_branch": "main",
    })
    return r


def _commit(i: int) -> dict:
    return {
        "sha": f"c{i:03d}" + "0" * 37,
        "node_id": f"C_kw{i}",
        "commit": {
            "message": f"commit {i}",
            "author": {"name": "dev", "email": "dev@example.test",
                       "date": f"2026-07-{i + 1:02d}T10:00:00Z"},
            "committer": {"name": "dev", "email": "dev@example.test",
                          "date": f"2026-07-{i + 1:02d}T10:05:00Z"},
        },
        "author": {"login": "dev", "id": 9},
        "committer": {"login": "dev", "id": 9},
    }


class _Handler(BaseHTTPRequestHandler):
    routes = {}  # {regex: callable(handler, match, qs) -> (status, obj)}

    def log_message(self, *a):  # silence
        pass

    def _respond(self, status: int, obj, headers=None):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _dispatch(self, payload=None):
        u = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(u.query).items()}
        for rx, fn in self.routes.items():
            m = re.fullmatch(rx, u.path)
            if m:
                res = fn(self, m, qs, payload) \
                    if fn.__code__.co_argcount >= 4 else fn(self, m, qs)
                status, obj = res[0], res[1]
                hdrs = res[2] if len(res) > 2 else None
                return self._respond(status, obj, hdrs)
        return self._respond(404, {"message": "Not Found"})

    def do_GET(self):
        self._dispatch()

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        try:
            payload = json.loads(raw) if raw else None
        except ValueError:
            payload = None
        self._dispatch(payload)


def start_server(routes: dict):
    """-> (base_url, shutdown_fn). routes: {path_regex: fn}."""
    handler = type("H", (_Handler,), {"routes": routes})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def shutdown():
        srv.shutdown()
        srv.server_close()

    return base, shutdown


# ---------------------------------------------------------------------------
# ready-made route tables


def github_routes() -> dict:
    search_items = [
        {"id": 500000 + i, "node_id": f"S{i}",
         "name": f"sling-{n}", "full_name": f"slingdata-io/sling-{n}",
         "owner": dict(_GH_OWNER),
         "html_url": f"https://github.example/slingdata-io/sling-{n}",
         "description": f"repo {n}", "language": "Go",
         "stargazers_count": 100 - i, "forks_count": i,
         "open_issues_count": i,
         "score": 1.0}
        for i, n in enumerate(["cli", "py", "go", "ui", "docs"])
    ]

    def repo(h, m, qs):
        return 200, gh_repo(0, m.group("repo"))

    def search(h, m, qs):
        return 200, {"total_count": len(search_items),
                     "incomplete_results": False, "items": search_items}

    def rate_limit(h, m, qs):
        rate = {"limit": 5000, "remaining": 4800, "reset": 1760000000,
                "used": 200, "resource": "core"}
        return 200, {"resources": {"core": rate}, "rate": rate}

    def user_orgs(h, m, qs):
        return 200, [{"id": 7671, "login": "slingdata-io",
                      "node_id": "O_kg", "description": "org"}]

    def user(h, m, qs):
        return 200, {"id": 7671, "login": m.group("who"), "name": "Sling",
                     "email": None, "type": "Organization",
                     "company": None, "blog": "", "location": None,
                     "bio": None, "public_repos": 10, "public_gists": 0,
                     "followers": 5, "following": 0,
                     "created_at": "2021-01-01T00:00:00Z",
                     "updated_at": "2026-08-01T00:00:00Z"}

    def branches(h, m, qs):
        if qs.get("page", "1") != "1":
            return 200, []
        return 200, [{"name": b, "commit": {"sha": f"b{i}" + "0" * 38},
                      "protected": b == "main"}
                     for i, b in enumerate(["main", "dev"])]

    def commits(h, m, qs):
        if qs.get("page", "1") != "1":
            return 200, []
        return 200, [_commit(i) for i in range(3)]

    def comments(h, m, qs):
        sha = m.group("sha")
        uid = int("".join(c for c in sha[:6] if c.isdigit()) or 0)
        return 200, [{"id": 9000 + uid, "body": f"lgtm {sha[:4]}",
                      "user": {"login": "dev", "id": 9},
                      "created_at": "2026-07-10T00:00:00Z",
                      "updated_at": "2026-07-10T00:00:00Z"}]

    return {
        r"/rate_limit": rate_limit,
        r"/user/orgs": user_orgs,
        r"/users/(?P<who>[^/]+)": user,
        r"/repos/[^/]+/(?P<repo>[^/]+)": repo,
        r"/repos/[^/]+/(?P<repo>[^/]+)/branches": branches,
        r"/repos/[^/]+/(?P<repo>[^/]+)/commits": commits,
        r"/repos/[^/]+/(?P<repo>[^/]+)/commits/(?P<sha>[^/]+)/comments":
            comments,
        r"/search/repositories": search,
    }


def stripe_routes(pages: int = 3, per_page: int = 2) -> dict:
    """/v1/charges (and /v1/customers) with the real starting_after
    cursor contract: has_more true until the last page."""
    charges = [{"id": f"ch_{i:04d}", "object": "charge",
                "amount": 1000 + i, "currency": "usd",
                "created": 1755000000 + i, "customer": f"cus_{i % 3}",
                "paid": True, "status": "succeeded"}
               for i in range(pages * per_page)]
    customers = [{"id": f"cus_{i}", "object": "customer",
                  "created": 1754000000 + i, "email": f"u{i}@ex.test",
                  "name": f"User {i}"} for i in range(3)]

    def _paged(items):
        def fn(h, m, qs):
            after = qs.get("starting_after")
            start = 0
            if after:
                ids = [x["id"] for x in items]
                start = ids.index(after) + 1 if after in ids else len(items)
            page = items[start:start + per_page]
            return 200, {"object": "list", "data": page,
                         "has_more": start + per_page < len(items),
                         "url": m.group(0)}
        return fn

    def account(h, m, qs):
        return 200, {"object": "list", "has_more": False,
                     "data": [{"id": "acct_1", "object": "account",
                               "country": "US",
                               "default_currency": "usd"}]}

    return {r"/v1/charges": _paged(charges),
            r"/v1/customers": _paged(customers),
            r"/v1/accounts": account}


def shopify_graphql_routes(n_products: int = 5, page_size: int = 2) -> dict:
    """One POST endpoint dispatching on the GraphQL query text —
    products / shop, with real cursor pageInfo."""
    products = [
        {"id": f"gid://shopify/Product/{100 + i}", "title": f"P{i}",
         "handle": f"p-{i}", "productType": "tool", "vendor": "sling",
         "status": "ACTIVE", "createdAt": "2026-01-01T00:00:00Z",
         "updatedAt": f"2026-08-0{i % 9 + 1}T00:00:00Z",
         "publishedAt": "2026-01-02T00:00:00Z", "tags": ["a"]}
        for i in range(n_products)]

    def graphql(h, m, qs, payload):
        q = (payload or {}).get("query") or ""
        variables = (payload or {}).get("variables") or {}
        if "shop {" in q or "shop {" in q.replace("\n", " "):
            return 200, {"data": {"shop": {
                "id": "gid://shopify/Shop/1", "name": "demo",
                "email": "s@ex.test", "myshopifyDomain": "d.example",
                "url": "https://d.example", "currencyCode": "USD"}}}
        if "products(" in q:
            first = int(variables.get("first") or page_size)
            first = min(first, page_size)
            cursor = variables.get("cursor")
            start = int(cursor.split(":")[1]) + 1 if cursor else 0
            sel = products[start:start + first]
            edges = [{"cursor": f"c:{start + j}", "node": p}
                     for j, p in enumerate(sel)]
            has_next = start + len(sel) < len(products)
            return 200, {"data": {"products": {
                "edges": edges,
                "pageInfo": {"hasNextPage": has_next,
                             "hasPreviousPage": start > 0}}}}
        return 200, {"data": {}}

    return {r"/admin/api/[^/]+/graphql\.json": graphql}


# ---------------------------------------------------------------------------
# tests/specs servers


def omdb_routes() -> dict:
    movies = {
        "tt0096895": {"Title": "Batman", "Year": "1989",
                      "imdbID": "tt0096895", "Type": "movie",
                      "Director": "Tim Burton"},
        "tt0103776": {"Title": "Batman Returns", "Year": "1992",
                      "imdbID": "tt0103776", "Type": "movie",
                      "Director": "Tim Burton"},
        "tt0118688": {"Title": "Batman & Robin", "Year": "1997",
                      "imdbID": "tt0118688", "Type": "movie",
                      "Director": "Joel Schumacher"},
    }

    def root(h, m, qs):
        if qs.get("s"):
            return 200, {"Search": [
                {"Title": v["Title"], "Year": v["Year"], "imdbID": k,
                 "Type": "movie"} for k, v in movies.items()],
                "totalResults": str(len(movies)), "Response": "True"}
        i = qs.get("i")
        if i in movies:
            return 200, {**movies[i], "Response": "True"}
        return 200, {"Response": "False", "Error": "Movie not found!"}

    return {r"/": root}


def queue_stream_routes(num_items: int = 30, fail_on_id: str = "",
                        fail_on_group: str = "") -> dict:
    """Python twin of tests/specs/queue_streaming_failfast/server.go."""

    def search(h, m, qs):
        return 200, {"results": [{"id": f"item-{i:03d}"}
                                 for i in range(1, num_items + 1)]}

    def detail(h, m, qs):
        iid, grp = qs.get("id", ""), qs.get("grp", "")
        if fail_on_id and iid == fail_on_id and \
                (not fail_on_group or grp == fail_on_group):
            return 422, {"error": f"injected failure for {iid} grp={grp}"}
        return 200, {"id": iid, "name": f"Name for {iid}",
                     "value": len(iid)}

    return {r"/search": search, r"/detail": detail,
            r"/health": lambda h, m, qs: (200, {"ok": True})}
