"""Iceberg REST catalog — stdlib client AND a serving twin.

Parity target: the reference's REST catalog connection
(``/root/reference/core/dbio/database/database_iceberg.go``
connectREST:90-250 — iceberg-go ``catalog/rest`` with bearer-token /
OAuth2 client-credential auth, warehouse location, and the same
LoadTable/ListNamespaces/ListTables surface the SQL catalog serves).
The wire format is the public Apache Iceberg REST Catalog OpenAPI
(rest-catalog-open-api.yaml): ``/v1/config``, ``/v1/oauth/tokens``,
``/v1/namespaces`` CRUD (multi-level namespaces joined with the
``0x1F`` unit separator in URLs), ``/v1/namespaces/{ns}/tables``
list/create/load/drop, ``/v1/namespaces/{ns}/register``,
``/v1/tables/rename``, and table commits as ``{requirements,
updates}`` with ``assert-table-uuid`` / ``assert-ref-snapshot-id``
validated server-side (CommitFailedException -> 409).

:class:`RestCatalog` implements the same duck-typed interface as
:class:`iceberg_catalog.SqlCatalog`, so every catalog-routed verb
(``create_table``/``write_table``/``read_table``/``max_value``/...)
works unchanged over HTTP. :class:`RestCatalogServer` wraps a
SqlCatalog behind the spec endpoints — the sandbox has no live REST
service (the reference needs one too), so the serving twin makes the
client testable end-to-end over a real socket.

Commit model: this engine's writers author the full next metadata
file on table storage (hint-tracked), so the server's commit applies
the spec handshake — validate ``requirements`` against its current
pointer, check the staged metadata really carries every
``add-snapshot`` from ``updates`` — then CAS-advances the pointer to
the staged file. Server and client must share table storage (true
here, and for any object-store deployment of this engine); the
request/response bodies stay spec-shaped throughout.
"""

from __future__ import annotations

import json
import re
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sling_cli_spark import fsio
from sling_cli_spark.sources.iceberg_catalog import (
    CatalogError, CommitConflict, NamespaceAlreadyExists,
    NamespaceNotEmpty, NoSuchNamespace, NoSuchTable, NoSuchView,
    SqlCatalog, TableAlreadyExists, ViewAlreadyExists, _hint_version,
    _meta_version, _read_meta, split_ident)

_SEP = "\x1f"  # the REST spec's multi-level namespace separator


def _ns_to_url(ns: str) -> str:
    return urllib.parse.quote(ns.replace(".", _SEP), safe="")


def _ns_from_url(raw: str) -> str:
    return urllib.parse.unquote(raw).replace(_SEP, ".")


_ERR_TYPES = {
    "NoSuchNamespaceException": NoSuchNamespace,
    "AlreadyExistsException": NamespaceAlreadyExists,
    "NamespaceNotEmptyException": NamespaceNotEmpty,
    "NoSuchTableException": NoSuchTable,
    "TableAlreadyExistsException": TableAlreadyExists,
    "NoSuchViewException": NoSuchView,
    "ViewAlreadyExistsException": ViewAlreadyExists,
    "CommitFailedException": CommitConflict,
}


# ---------------------------------------------------------------------------
# client

class RestCatalog:
    """Spec client over urllib (reference connectREST:90 — bearer
    token via ``token`` prop or OAuth2 ``credential`` exchange at
    ``/v1/oauth/tokens``, both supported here)."""

    def __init__(self, uri: str, token: str | None = None,
                 credential: str | None = None,
                 warehouse: str | None = None, name: str = "iceberg",
                 page_size: int | None = None):
        self.uri = uri.rstrip("/")
        self.name = name
        self.warehouse = warehouse
        self.page_size = page_size
        self.token = token
        if token is None and credential is not None:
            self.token = self._oauth(credential)
        cfg = self._req("GET", "/v1/config")
        self.warehouse = (cfg.get("defaults", {})
                          .get("warehouse", self.warehouse))

    def _oauth(self, credential: str) -> str:
        cid, _, secret = credential.partition(":")
        body = urllib.parse.urlencode({
            "grant_type": "client_credentials",
            "client_id": cid, "client_secret": secret}).encode()
        req = urllib.request.Request(
            self.uri + "/v1/oauth/tokens", data=body, method="POST",
            headers={"Content-Type":
                     "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())["access_token"]

    # transient statuses worth a backoff-and-retry (spec: servers
    # signal throttling with 429 + optional Retry-After; gateway 5xx
    # are transient). 500 retries only on GET — a POST that half
    # -applied must not blind-repeat (commits are CAS-guarded, but the
    # conflict error it would surface misleads).
    _RETRY_CODES = frozenset({429, 502, 503, 504})
    _MAX_RETRIES = 4

    def _req(self, method: str, path: str, body: dict | None = None):
        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        delay = 0.1
        for attempt in range(self._MAX_RETRIES + 1):
            req = urllib.request.Request(
                self.uri + path, method=method, headers=headers,
                data=json.dumps(body).encode() if body is not None
                else None)
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    data = r.read()
                    return json.loads(data) if data else {}
            except urllib.error.HTTPError as e:
                transient = e.code in self._RETRY_CODES or \
                    (e.code == 500 and method == "GET")
                if transient and attempt < self._MAX_RETRIES:
                    retry_after = e.headers.get("Retry-After") \
                        if e.headers else None
                    try:
                        wait = float(retry_after) if retry_after \
                            else delay
                    except ValueError:
                        wait = delay
                    time.sleep(min(wait, 10.0))
                    delay *= 2
                    continue
                try:
                    err = json.loads(e.read())["error"]
                except Exception:
                    raise CatalogError(
                        f"{method} {path}: HTTP {e.code}") from None
                exc = _ERR_TYPES.get(err.get("type"), CatalogError)
                raise exc(err.get("message", "")) from None

    # -- namespaces --

    def create_namespace(self, ns: str, properties: dict | None = None,
                         exists_ok: bool = False) -> None:
        try:
            self._req("POST", "/v1/namespaces", {
                "namespace": ns.split("."),
                "properties": properties or {}})
        except NamespaceAlreadyExists:
            if not exists_ok:
                raise

    def namespace_exists(self, ns: str) -> bool:
        try:
            self._req("GET", f"/v1/namespaces/{_ns_to_url(ns)}")
            return True
        except NoSuchNamespace:
            return False

    def _paged(self, path: str, key: str) -> list:
        """Drain a paginated list endpoint (spec: ``pageToken`` /
        ``pageSize`` query params; the server returns
        ``next-page-token`` while more pages remain — opaque, echoed
        back verbatim). Servers that ignore pagination return
        everything with no token: one round-trip, same result."""
        out: list = []
        token: str | None = None
        while True:
            q = {}
            if self.page_size is not None:
                q["pageSize"] = str(self.page_size)
            if token is not None:
                q["pageToken"] = token
            sep = "?" + urllib.parse.urlencode(q) if q else ""
            got = self._req("GET", path + sep)
            out += got.get(key) or []
            token = got.get("next-page-token")
            if not token:
                return out

    def list_namespaces(self) -> list[str]:
        return [".".join(n) for n in
                self._paged("/v1/namespaces", "namespaces")]

    def namespace_properties(self, ns: str) -> dict:
        return self._req(
            "GET", f"/v1/namespaces/{_ns_to_url(ns)}")["properties"]

    def drop_namespace(self, ns: str) -> None:
        self._req("DELETE", f"/v1/namespaces/{_ns_to_url(ns)}")

    def update_namespace_properties(
            self, ns: str, updates: dict | None = None,
            removals: list | None = None) -> dict:
        """Spec updateProperties (POST
        /v1/namespaces/{ns}/properties)."""
        got = self._req(
            "POST", f"/v1/namespaces/{_ns_to_url(ns)}/properties",
            {"updates": {k: str(v)
                         for k, v in (updates or {}).items()},
             "removals": list(removals or [])})
        return {"updated": got.get("updated") or [],
                "removed": got.get("removed") or [],
                "missing": got.get("missing") or []}

    # -- tables --

    def list_tables(self, ns: str | None = None) \
            -> list[tuple[str, str]]:
        spaces = [ns] if ns is not None else self.list_namespaces()
        out = []
        for space in spaces:
            got = self._paged(
                f"/v1/namespaces/{_ns_to_url(space)}/tables",
                "identifiers")
            out += [(".".join(i["namespace"]), i["name"])
                    for i in got]
        return sorted(out)

    def table_exists(self, ident) -> bool:
        try:
            self.load_table(ident)
            return True
        except NoSuchTable:
            return False

    def load_table(self, ident) -> str:
        ns, name = split_ident(ident)
        got = self._req(
            "GET", f"/v1/namespaces/{_ns_to_url(ns)}/tables/{name}")
        return got["metadata-location"]

    def register_table(self, ident, metadata_location: str) -> None:
        ns, name = split_ident(ident)
        self._req("POST", f"/v1/namespaces/{_ns_to_url(ns)}/register",
                  {"name": name,
                   "metadata-location": metadata_location})

    def create_table(self, ident, ice_schema: dict,
                     location: str | None = None,
                     format_version: int = 2,
                     properties: dict | None = None) -> str:
        """Server-side metadata authoring (spec createTable — what
        iceberg-go's catalog.CreateTable posts for the reference's
        CreateTable:1015). Returns the metadata location."""
        ns, name = split_ident(ident)
        got = self._req(
            "POST", f"/v1/namespaces/{_ns_to_url(ns)}/tables",
            {"name": name, "schema": ice_schema,
             "location": location, "format-version": format_version,
             "properties": properties or {}})
        return got["metadata-location"]

    def commit_many(self, changes) -> None:
        """Spec commitTransaction (POST /v1/transactions/commit):
        every table's requirements + updates in ONE request; the
        server applies all pointer swaps atomically or none.

        Creates (expected=None) have no REST transaction verb — the
        spec's registerTable is per-table — so they are registered
        first and ROLLED BACK (dropped, data left in place) if the
        transaction POST then fails, keeping the all-or-none contract
        the SqlCatalog twin gets from its single SQL transaction
        (r11 advice fix: previously a failed transaction left the
        registered creates behind)."""
        creates = [(i, n) for i, e, n in changes if e is None]
        for ident, new in creates:  # spec: register is per-table
            self.register_table(ident, new)
        body = {"table-changes": [
            self._table_change(ident, expected, new)
            for ident, expected, new in changes
            if expected is not None]}
        if body["table-changes"]:
            try:
                self._req("POST", "/v1/transactions/commit", body)
            except Exception:
                for ident, _ in creates:
                    try:  # best-effort unwind; original error wins
                        self.drop_table(ident)
                    except Exception:
                        pass
                raise

    def _table_change(self, ident, expected_metadata_location,
                      new_metadata_location) -> dict:
        """One CommitTableRequest: requirements + updates derived by
        diffing the staged metadata against the expected base (both
        on shared storage)."""
        ns, name = split_ident(ident)
        base = _read_meta(expected_metadata_location)
        new = _read_meta(new_metadata_location)
        have = {int(s["snapshot-id"])
                for s in base.get("snapshots") or []}
        updates = [
            {"action": "add-snapshot", "snapshot": s}
            for s in new.get("snapshots") or []
            if int(s["snapshot-id"]) not in have]
        cur = new.get("current-snapshot-id")
        if cur is not None and int(cur) != -1 and \
                cur != base.get("current-snapshot-id"):
            updates.append({"action": "set-snapshot-ref",
                            "ref-name": "main", "type": "branch",
                            "snapshot-id": int(cur)})
        if (new.get("properties") or {}) != \
                (base.get("properties") or {}):
            updates.append({"action": "set-properties",
                            "updates": new.get("properties") or {}})
        base_cur = base.get("current-snapshot-id")
        requirements = [
            {"type": "assert-table-uuid", "uuid": base["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": "main",
             "snapshot-id": None
             if base_cur is None or int(base_cur) == -1
             else int(base_cur)},
        ]
        return {
            "identifier": {"namespace": ns.split("."), "name": name},
            "requirements": requirements, "updates": updates}

    def commit_table(self, ident, expected_metadata_location,
                     new_metadata_location: str) -> None:
        """Spec commit: one CommitTableRequest, validated and
        CAS-advanced server-side."""
        ns, name = split_ident(ident)
        if expected_metadata_location is None:
            return self.register_table(ident, new_metadata_location)
        self._req(
            "POST", f"/v1/namespaces/{_ns_to_url(ns)}/tables/{name}",
            self._table_change(ident, expected_metadata_location,
                               new_metadata_location))

    def drop_table(self, ident) -> None:
        ns, name = split_ident(ident)
        self._req("DELETE",
                  f"/v1/namespaces/{_ns_to_url(ns)}/tables/{name}")

    def rename_table(self, src, dst) -> None:
        sns, sname = split_ident(src)
        dns, dname = split_ident(dst)
        self._req("POST", "/v1/tables/rename", {
            "source": {"namespace": sns.split("."), "name": sname},
            "destination": {"namespace": dns.split("."),
                            "name": dname}})

    def swap_tables(self, a, b) -> None:
        """Three renames through a temp name — exactly the reference's
        SwapTable:1185-1250 (REST has no atomic swap endpoint; the SQL
        catalog's single-transaction swap does better)."""
        ans, aname = split_ident(a)
        tmp = (ans, f"{aname}_swap_tmp")
        self.rename_table(a, tmp)
        try:
            self.rename_table(b, a)
        except CatalogError:
            self.rename_table(tmp, a)  # undo step 1
            raise
        self.rename_table(tmp, b)

    def default_location(self, ident) -> str:
        if not self.warehouse:
            raise CatalogError(
                "REST catalog exposes no warehouse; pass an explicit "
                "location (reference `rest_warehouse` prop)")
        ns, name = split_ident(ident)
        return fsio.join(self.warehouse, f"{ns}.db", name)

    # -- views (REST spec createView/loadView/replaceView/dropView/
    #    renameView; the SERVER authors + commits metadata) -----------

    def list_views(self, ns: str | None = None) \
            -> list[tuple[str, str]]:
        spaces = [ns] if ns is not None else self.list_namespaces()
        out = []
        for space in spaces:
            got = self._paged(
                f"/v1/namespaces/{_ns_to_url(space)}/views",
                "identifiers")
            out += [(".".join(i["namespace"]), i["name"])
                    for i in got]
        return sorted(out)

    def view_exists(self, ident) -> bool:
        try:
            self.load_view(ident)
            return True
        except NoSuchView:
            return False

    def load_view(self, ident) -> str:
        ns, name = split_ident(ident)
        got = self._req(
            "GET", f"/v1/namespaces/{_ns_to_url(ns)}/views/{name}")
        return got["metadata-location"]

    def post_create_view(self, ident, ice_schema: dict, version: dict,
                         location: str | None = None,
                         properties: dict | None = None) -> str:
        """Spec createView: the request carries the schema + the
        initial view-version; the server authors the metadata file."""
        ns, name = split_ident(ident)
        got = self._req(
            "POST", f"/v1/namespaces/{_ns_to_url(ns)}/views",
            {"name": name, "location": location,
             "schema": ice_schema, "view-version": version,
             "properties": properties or {}})
        return got["metadata-location"]

    def post_replace_view(self, ident, base_meta: dict,
                          ice_schema: dict, version: dict) -> str:
        """Spec replaceView (UpdateViewRequest): assert-view-uuid +
        add-schema / add-view-version / set-current-view-version,
        validated and applied server-side."""
        ns, name = split_ident(ident)
        got = self._req(
            "POST", f"/v1/namespaces/{_ns_to_url(ns)}/views/{name}",
            {"identifier": {"namespace": ns.split("."), "name": name},
             "requirements": [{"type": "assert-view-uuid",
                               "uuid": base_meta["view-uuid"]}],
             "updates": [
                 {"action": "add-schema",
                  "schema": {**ice_schema, "schema-id": -1}},
                 {"action": "add-view-version",
                  "view-version": {**version, "version-id": -1,
                                   "schema-id": -1}},
                 {"action": "set-current-view-version",
                  "view-version-id": -1}]})
        return got["metadata-location"]

    def drop_view(self, ident) -> None:
        ns, name = split_ident(ident)
        self._req("DELETE",
                  f"/v1/namespaces/{_ns_to_url(ns)}/views/{name}")

    def rename_view(self, src, dst) -> None:
        sns, sname = split_ident(src)
        dns, dname = split_ident(dst)
        self._req("POST", "/v1/views/rename", {
            "source": {"namespace": sns.split("."), "name": sname},
            "destination": {"namespace": dns.split("."),
                            "name": dname}})


# ---------------------------------------------------------------------------
# serving twin

class _Handler(BaseHTTPRequestHandler):
    server_version = "sling-iceberg-rest/1"

    # routes: (method, regex) -> handler name
    def log_message(self, *a):  # tests stay quiet
        pass

    @property
    def cat(self) -> SqlCatalog:
        return self.server.catalog  # type: ignore[attr-defined]

    def _send(self, code: int, body: dict | None = None):
        data = json.dumps(body).encode() if body is not None else b""
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(data)

    def _err(self, code: int, typ: str, msg: str):
        self._send(code, {"error": {
            "message": msg, "type": typ, "code": code}})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        if not raw:
            return {}
        ctype = self.headers.get("Content-Type") or ""
        if "x-www-form-urlencoded" in ctype:
            return {k: v[0] for k, v in
                    urllib.parse.parse_qs(raw.decode()).items()}
        return json.loads(raw)

    def _authed(self) -> bool:
        want = self.server.token  # type: ignore[attr-defined]
        if want is None:
            return True
        got = self.headers.get("Authorization") or ""
        return got == f"Bearer {want}"

    def _route(self):
        path = urllib.parse.urlparse(self.path).path
        if path == "/v1/oauth/tokens" and self.command == "POST":
            return self._oauth()
        if not self._authed():
            return self._err(401, "NotAuthorizedException",
                             "missing or bad bearer token")
        try:
            for pat, methods in _ROUTES:
                m = pat.match(path)
                if m:
                    fn = methods.get(self.command)
                    if fn is None:
                        return self._err(
                            405, "UnsupportedOperationException",
                            self.command)
                    return fn(self, *m.groups())
            self._err(404, "NotFoundException", path)
        except NoSuchNamespace as e:
            self._err(404, "NoSuchNamespaceException", str(e))
        except NoSuchTable as e:
            self._err(404, "NoSuchTableException", str(e))
        except NamespaceAlreadyExists as e:
            self._err(409, "AlreadyExistsException", str(e))
        except TableAlreadyExists as e:
            self._err(409, "TableAlreadyExistsException", str(e))
        except NoSuchView as e:
            self._err(404, "NoSuchViewException", str(e))
        except ViewAlreadyExists as e:
            self._err(409, "ViewAlreadyExistsException", str(e))
        except NamespaceNotEmpty as e:
            self._err(409, "NamespaceNotEmptyException", str(e))
        except CommitConflict as e:
            self._err(409, "CommitFailedException", str(e))
        except Exception as e:  # spec: 500 envelope, never a raw trace
            self._err(500, "InternalServerError", repr(e))

    do_GET = do_POST = do_DELETE = do_HEAD = _route

    # -- endpoint impls --

    def _oauth(self):
        form = self._body()
        cred = self.server.credential  # type: ignore[attr-defined]
        if cred is None:
            return self._err(400, "BadRequestException",
                             "token endpoint not enabled")
        cid, _, secret = cred.partition(":")
        if form.get("grant_type") != "client_credentials" or \
                form.get("client_id") != cid or \
                form.get("client_secret") != secret:
            return self._err(401, "NotAuthorizedException",
                             "invalid client credentials")
        self._send(200, {
            "access_token": self.server.token,  # type: ignore
            "token_type": "bearer", "expires_in": 3600})

    def _config(self):
        defaults = {}
        if self.cat.warehouse:
            defaults["warehouse"] = self.cat.warehouse
        self._send(200, {"defaults": defaults, "overrides": {}})

    def _page_params(self) -> tuple[int | None, int]:
        """(pageSize, start offset) from the request's query string.
        The served ``next-page-token`` is the next start offset as a
        decimal string — opaque to clients per spec (they echo it
        back verbatim); a malformed token reads as page one."""
        q = dict(urllib.parse.parse_qsl(
            urllib.parse.urlparse(self.path).query))
        try:
            size = int(q["pageSize"]) if "pageSize" in q else None
            if size is not None and size <= 0:
                size = None
        except ValueError:
            size = None
        try:
            start = int(q.get("pageToken") or 0)
        except ValueError:
            start = 0
        return size, max(0, start)

    def _send_page(self, key: str, items: list):
        """Serve one page of a deterministic listing: no pageSize =
        the whole list (pagination is spec-optional); otherwise the
        slice plus ``next-page-token`` while more remain."""
        size, start = self._page_params()
        if size is None:
            return self._send(200, {key: items})
        body = {key: items[start:start + size]}
        if start + size < len(items):
            body["next-page-token"] = str(start + size)
        self._send(200, body)

    def _list_ns(self):
        self._send_page("namespaces", [
            ns.split(".") for ns in sorted(self.cat.list_namespaces())])

    def _create_ns(self):
        body = self._body()
        ns = ".".join(body["namespace"])
        props = body.get("properties") or {}
        self.cat.create_namespace(ns, props)
        self._send(200, {"namespace": body["namespace"],
                         "properties": props})

    def _get_ns(self, raw):
        ns = _ns_from_url(raw)
        props = self.cat.namespace_properties(ns)
        self._send(200, {"namespace": ns.split("."),
                         "properties": props})

    def _drop_ns(self, raw):
        self.cat.drop_namespace(_ns_from_url(raw))
        self._send(204)

    def _update_ns_props(self, raw):
        body = self._body()
        got = self.cat.update_namespace_properties(
            _ns_from_url(raw), body.get("updates"),
            body.get("removals"))
        self._send(200, got)

    def _list_tables(self, raw):
        ns = _ns_from_url(raw)
        if not self.cat.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        self._send_page("identifiers", [
            {"namespace": tns.split("."), "name": name}
            for tns, name in sorted(self.cat.list_tables(ns))])

    def _create_table(self, raw):
        """Server-side metadata authoring (spec createTable): the
        request carries an iceberg schema; the server writes metadata
        v1 at the resolved location and registers the pointer."""
        import time as _time

        body = self._body()
        ns = _ns_from_url(raw)
        name = body["name"]
        ident = (ns, name)
        if self.cat.table_exists(ident):
            raise TableAlreadyExists(f"{ns}.{name}")
        location = body.get("location") or \
            self.cat.default_location(ident)
        schema = dict(body["schema"])
        schema.setdefault("schema-id", 0)
        import uuid as _uuid

        from sling_cli_spark.sources.iceberg_py import _max_field_id
        meta = {
            "format-version": int(body.get("format-version") or 2),
            "table-uuid": str(_uuid.uuid4()),
            "location": location,
            "last-updated-ms": int(_time.time() * 1000),
            "last-column-id": _max_field_id(schema),
            "schemas": [schema], "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "properties": body.get("properties") or {},
            "snapshots": [], "current-snapshot-id": -1,
            "last-sequence-number": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
        }
        fs = fsio.get_fs(location)
        fs.mkdirs(fsio.join(location, "metadata"))
        ml = fsio.join(location, "metadata", "v1.metadata.json")
        fs.create_exclusive(ml, json.dumps(meta).encode())
        fs.write_bytes(
            fsio.join(location, "metadata", "version-hint.text"), b"1")
        self.cat.register_table(ident, ml)
        self._send(200, {"metadata-location": ml, "metadata": meta})

    def _register(self, raw):
        body = self._body()
        ns = _ns_from_url(raw)
        ml = body["metadata-location"]
        self.cat.register_table((ns, body["name"]), ml)
        self._send(200, {"metadata-location": ml,
                         "metadata": _read_meta(ml)})

    def _load_table(self, raw, name):
        ml = self.cat.load_table((_ns_from_url(raw), name))
        self._send(200, {"metadata-location": ml,
                         "metadata": _read_meta(ml)})

    def _drop_table(self, raw, name):
        self.cat.drop_table((_ns_from_url(raw), name))
        self._send(204)

    def _commit_table(self, raw, name):
        body = self._body()
        ident = (_ns_from_url(raw), name)
        ml, new_ml, new = self._validated_change(ident, body)
        self.cat.commit_table(ident, ml, new_ml)
        self._send(200, {"metadata-location": new_ml, "metadata": new})

    def _commit_txn(self):
        """Spec commitTransaction: validate EVERY table-change against
        its current pointer, then apply all pointer swaps in the
        store's single atomic commit_many — all tables move or none
        (a failed requirement on the last table leaves the first
        untouched)."""
        body = self._body()
        validated = []
        for ch in body.get("table-changes") or []:
            ident_d = ch.get("identifier") or {}
            ident = (".".join(ident_d.get("namespace") or []),
                     ident_d.get("name"))
            ml, new_ml, _ = self._validated_change(ident, ch)
            validated.append((ident, ml, new_ml))
        self.cat.commit_many(validated)
        self._send(204)

    def _validated_change(self, ident, body):
        ml = self.cat.load_table(ident)
        cur = _read_meta(ml)
        for req in body.get("requirements") or []:
            t = req.get("type")
            if t == "assert-table-uuid":
                if req.get("uuid") != cur.get("table-uuid"):
                    raise CommitConflict(
                        f"table-uuid is {cur.get('table-uuid')}")
            elif t == "assert-ref-snapshot-id":
                cur_id = cur.get("current-snapshot-id")
                if req.get("ref", "main") == "main":
                    have = None if cur_id is None or int(cur_id) == -1 \
                        else int(cur_id)
                else:
                    r = (cur.get("refs") or {}).get(req["ref"]) or {}
                    have = r.get("snapshot-id")
                want = req.get("snapshot-id")
                if have != want:
                    raise CommitConflict(
                        f"ref {req.get('ref')} is at {have}, "
                        f"commit expected {want}")
            elif t == "assert-create":
                raise CommitConflict("table already exists")
            # unknown assertion types: spec says server may reject;
            # this twin ignores ones it cannot evaluate
        location = cur["location"]
        hint_v = _hint_version(location)
        if hint_v == _meta_version(ml):
            raise CommitConflict(
                "no staged metadata beyond the current pointer — "
                "stage the write on table storage first")
        new_ml = fsio.join(location, "metadata",
                           f"v{hint_v}.metadata.json")
        new = _read_meta(new_ml)
        staged = {int(s["snapshot-id"])
                  for s in new.get("snapshots") or []}
        for upd in body.get("updates") or []:
            if upd.get("action") == "add-snapshot" and \
                    int(upd["snapshot"]["snapshot-id"]) not in staged:
                raise CommitConflict(
                    f"staged metadata {new_ml} lacks snapshot "
                    f"{upd['snapshot']['snapshot-id']}")
        return ml, new_ml, new

    def _table_exists(self, raw, name):
        self.cat.load_table((_ns_from_url(raw), name))
        self._send(204)

    def _rename(self):
        body = self._body()
        s, d = body["source"], body["destination"]
        self.cat.rename_table(
            (".".join(s["namespace"]), s["name"]),
            (".".join(d["namespace"]), d["name"]))
        self._send(204)

    # -- view endpoints (REST spec createView/loadView/replaceView/
    #    dropView/renameView; server-side metadata authoring like
    #    _create_table) ------------------------------------------------

    def _list_views(self, raw):
        ns = _ns_from_url(raw)
        if not self.cat.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        self._send_page("identifiers", [
            {"namespace": vns.split("."), "name": name}
            for vns, name in sorted(self.cat.list_views(ns))])

    def _create_view(self, raw):
        from sling_cli_spark.sources.iceberg_views import (
            author_view_metadata, _view_metadata_path)

        body = self._body()
        ns = _ns_from_url(raw)
        name = body["name"]
        ident = (ns, name)
        if self.cat.view_exists(ident) or self.cat.table_exists(ident):
            raise ViewAlreadyExists(f"{ns}.{name}")
        location = body.get("location") or \
            self.cat.default_location(ident)
        schema = dict(body["schema"])
        if schema.get("schema-id", -1) == -1:
            schema["schema-id"] = 0
        meta = author_view_metadata(
            location, schema, dict(body["view-version"]),
            body.get("properties") or {})
        fs = fsio.get_fs(location)
        fs.mkdirs(fsio.join(location, "metadata"))
        ml = _view_metadata_path(location, 1)
        fs.create_exclusive(ml, json.dumps(meta).encode())
        self.cat.register_view(ident, ml)
        self._send(200, {"metadata-location": ml, "metadata": meta})

    def _load_view(self, raw, name):
        ml = self.cat.load_view((_ns_from_url(raw), name))
        self._send(200, {"metadata-location": ml,
                         "metadata": _read_meta(ml)})

    def _view_exists(self, raw, name):
        self.cat.load_view((_ns_from_url(raw), name))
        self._send(204)

    def _drop_view(self, raw, name):
        self.cat.drop_view((_ns_from_url(raw), name))
        self._send(204)

    def _commit_view(self, raw, name):
        """Spec replaceView: validate requirements against the current
        pointer, apply the update actions, write the next metadata
        file, CAS the pointer."""
        from sling_cli_spark.sources.iceberg_views import (
            _meta_seq, _view_metadata_path, apply_view_updates)

        body = self._body()
        ident = (_ns_from_url(raw), name)
        ml = self.cat.load_view(ident)
        cur = _read_meta(ml)
        for req in body.get("requirements") or []:
            if req.get("type") == "assert-view-uuid":
                if req.get("uuid") != cur.get("view-uuid"):
                    raise CommitConflict(
                        f"view-uuid is {cur.get('view-uuid')}")
            # unknown assertion types: ignored (same policy as tables)
        new = apply_view_updates(cur, body.get("updates") or [])
        location = new["location"]
        new_ml = _view_metadata_path(location, _meta_seq(ml) + 1)
        fsio.get_fs(location).create_exclusive(
            new_ml, json.dumps(new).encode())
        self.cat.commit_view(ident, ml, new_ml)
        self._send(200, {"metadata-location": new_ml, "metadata": new})

    def _rename_view(self):
        body = self._body()
        s, d = body["source"], body["destination"]
        self.cat.rename_view(
            (".".join(s["namespace"]), s["name"]),
            (".".join(d["namespace"]), d["name"]))
        self._send(204)


_NS = r"([^/]+)"
_ROUTES: list[tuple[re.Pattern, dict]] = [
    (re.compile(r"^/v1/config$"), {"GET": _Handler._config}),
    (re.compile(r"^/v1/namespaces$"),
     {"GET": _Handler._list_ns, "POST": _Handler._create_ns}),
    (re.compile(rf"^/v1/namespaces/{_NS}$"),
     {"GET": _Handler._get_ns, "HEAD": _Handler._get_ns,
      "DELETE": _Handler._drop_ns}),
    (re.compile(rf"^/v1/namespaces/{_NS}/properties$"),
     {"POST": _Handler._update_ns_props}),
    (re.compile(rf"^/v1/namespaces/{_NS}/tables$"),
     {"GET": _Handler._list_tables, "POST": _Handler._create_table}),
    (re.compile(rf"^/v1/namespaces/{_NS}/register$"),
     {"POST": _Handler._register}),
    (re.compile(rf"^/v1/namespaces/{_NS}/tables/([^/]+)$"),
     {"GET": _Handler._load_table, "HEAD": _Handler._table_exists,
      "DELETE": _Handler._drop_table, "POST": _Handler._commit_table}),
    (re.compile(r"^/v1/tables/rename$"), {"POST": _Handler._rename}),
    (re.compile(rf"^/v1/namespaces/{_NS}/views$"),
     {"GET": _Handler._list_views, "POST": _Handler._create_view}),
    (re.compile(rf"^/v1/namespaces/{_NS}/views/([^/]+)$"),
     {"GET": _Handler._load_view, "HEAD": _Handler._view_exists,
      "DELETE": _Handler._drop_view, "POST": _Handler._commit_view}),
    (re.compile(r"^/v1/views/rename$"), {"POST": _Handler._rename_view}),
    (re.compile(r"^/v1/transactions/commit$"),
     {"POST": _Handler._commit_txn}),
]


class RestCatalogServer:
    """Spec endpoints over a :class:`SqlCatalog` store. ``token``
    turns on bearer auth; ``credential`` ("id:secret") additionally
    enables the OAuth2 token exchange the reference's
    ``rest.WithCredential`` flow uses."""

    def __init__(self, catalog: SqlCatalog, host: str = "127.0.0.1",
                 port: int = 0, token: str | None = None,
                 credential: str | None = None):
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.catalog = catalog  # type: ignore[attr-defined]
        self._httpd.token = token  # type: ignore[attr-defined]
        self._httpd.credential = credential  # type: ignore
        self._thread: threading.Thread | None = None

    @property
    def uri(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "RestCatalogServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
