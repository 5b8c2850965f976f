"""Iceberg views: the public View Spec v1 (metadata JSON with
versioned SQL representations) over the repo's catalog pointer stores.

Reference parity: sling's Iceberg connection exposes tables only
(``/root/reference/core/dbio/database/database_iceberg.go`` GetTables:514
lists ``iceberg_tables`` rows) — views are a beyond-reference row, but
they are the standard way real warehouses ship derived queries, and the
formats are fully public:

- View Spec v1 (iceberg.apache.org/view-spec): ``view-uuid``,
  ``format-version: 1``, ``location``, ``schemas``,
  ``current-version-id``, ``versions`` (each with ``version-id``,
  ``schema-id``, ``timestamp-ms``, ``summary``, ``representations``
  [``{type: sql, sql, dialect}``], ``default-namespace``), and
  ``version-log``. Replacing a view APPENDS a version (history is
  retained up to ``version.history.num-entries``, spec default 10).
- REST spec view endpoints (createView / loadView / replaceView /
  dropView / renameView) — served + consumed by :mod:`iceberg_rest`.

Spark-first execution: ``read_view`` resolves the current version's
SQL representation against the catalog — every referenced table
becomes a registered temp view backed by the ordinary
``read_iceberg`` DataFrame scan (predicate pushdown, manifest pruning
and column projection all still apply because the substitution happens
BEFORE Catalyst sees the query), nested views recurse with a cycle
guard — then hands the rewritten text to ``spark.sql``. The view layer
adds zero execution machinery of its own; Catalyst plans the final
query exactly as if the user had written it against the temp views.

Identifier resolution contract (documented, not inferred): qualified
``ns.name`` references resolve against the whole catalog;
bare-name references resolve against the version's
``default-namespace`` only in FROM/JOIN position. String literals,
comments, and backtick-quoted identifiers are masked from resolution
(r11) — a catalog identifier appearing inside one is left verbatim.
"""

from __future__ import annotations

import json
import re
import time
import uuid

from sling_cli_spark import fsio

from sling_cli_spark.localframe import local_df
from sling_cli_spark.sources.iceberg_catalog import (
    CatalogError,
    NoSuchNamespace,
    ViewAlreadyExists,
    read_table,
    split_ident,
)

DEFAULT_HISTORY_ENTRIES = 10  # spec: version.history.num-entries


# ---------------------------------------------------------------------------
# metadata authoring

def _now_ms() -> int:
    return int(time.time() * 1000)


def _view_metadata_path(location: str, seq: int) -> str:
    # the Java reference implementation's naming: %05d-%s.metadata.json
    return fsio.join(location, "metadata",
                     f"{seq:05d}-{uuid.uuid4()}.metadata.json")


def _meta_seq(metadata_location: str) -> int:
    m = re.search(r"(\d{5})-[0-9a-f-]+\.metadata\.json$",
                  metadata_location)
    return int(m.group(1)) if m else 0


def new_view_version(sql: str, *, version_id: int, schema_id: int,
                     default_namespace: str, dialect: str = "spark",
                     operation: str = "create",
                     engine_version: str | None = None) -> dict:
    """One entry of ``versions`` per spec v1 — a single SQL
    representation (multiple dialects are legal; one is typical)."""
    summary = {"engine-name": "spark", "operation": operation}
    if engine_version:
        summary["engine-version"] = engine_version
    return {
        "version-id": version_id,
        "schema-id": schema_id,
        "timestamp-ms": _now_ms(),
        "summary": summary,
        "representations": [
            {"type": "sql", "sql": sql, "dialect": dialect}],
        "default-namespace": default_namespace.split("."),
    }


def author_view_metadata(location: str, ice_schema: dict,
                         version: dict,
                         properties: dict | None = None) -> dict:
    """A fresh (create) view metadata document, spec v1 shape."""
    version = dict(version)
    version["version-id"] = 1
    version["schema-id"] = ice_schema.get("schema-id", 0)
    return {
        "view-uuid": str(uuid.uuid4()),
        "format-version": 1,
        "location": location,
        "schemas": [ice_schema],
        "current-version-id": 1,
        "versions": [version],
        "version-log": [{"timestamp-ms": version["timestamp-ms"],
                         "version-id": 1}],
        "properties": {k: str(v)
                       for k, v in (properties or {}).items()},
    }


def apply_replace(meta: dict, ice_schema: dict, version: dict) -> dict:
    """Append a schema + version and move ``current-version-id`` —
    the spec's replace semantics, expressed as the REST spec's update
    actions so the SQL path and the REST serving twin run the SAME
    applier."""
    return apply_view_updates(meta, [
        {"action": "add-schema",
         "schema": {**ice_schema, "schema-id": -1}},
        {"action": "add-view-version",
         "view-version": {**version, "version-id": -1,
                          "schema-id": -1}},
        {"action": "set-current-view-version", "view-version-id": -1},
    ])


def apply_view_updates(meta: dict, updates: list[dict]) -> dict:
    """The REST spec's ``UpdateViewRequest`` update actions, applied
    in order (``-1`` ids mean "the one just added", per spec)."""
    meta = json.loads(json.dumps(meta))  # deep copy; never mutate input
    last_schema_id: int | None = None
    last_version_id: int | None = None
    for u in updates:
        a = u.get("action")
        if a == "add-schema":
            s = dict(u["schema"])
            have = {x.get("schema-id", 0) for x in meta["schemas"]}
            if s.get("schema-id", -1) == -1 or s["schema-id"] in have:
                s["schema-id"] = 1 + max(have, default=-1)
            meta["schemas"].append(s)
            last_schema_id = s["schema-id"]
        elif a == "add-view-version":
            v = dict(u["view-version"])
            have = {x["version-id"] for x in meta["versions"]}
            if v.get("version-id", -1) == -1 or \
                    v["version-id"] in have:
                v["version-id"] = 1 + max(have, default=0)
            if v.get("schema-id", -1) == -1:
                if last_schema_id is None:
                    raise CatalogError(
                        "add-view-version with schema-id -1 needs a "
                        "preceding add-schema")
                v["schema-id"] = last_schema_id
            meta["versions"].append(v)
            meta.setdefault("version-log", []).append(
                {"timestamp-ms": v["timestamp-ms"],
                 "version-id": v["version-id"]})
            last_version_id = v["version-id"]
        elif a == "set-current-view-version":
            vid = int(u["view-version-id"])
            if vid == -1:
                if last_version_id is None:
                    raise CatalogError(
                        "set-current-view-version -1 needs a "
                        "preceding add-view-version")
                vid = last_version_id
            if vid not in {x["version-id"] for x in meta["versions"]}:
                raise CatalogError(f"no view version {vid}")
            meta["current-version-id"] = vid
        elif a == "set-properties":
            meta.setdefault("properties", {}).update(
                {k: str(v) for k, v in (u.get("updates") or
                                        {}).items()})
        elif a == "remove-properties":
            for k in u.get("removals") or []:
                meta.get("properties", {}).pop(k, None)
        elif a == "set-location":
            meta["location"] = u["location"]
        else:
            raise CatalogError(f"unsupported view update action {a!r}")
    return _trim_history(meta)


def _trim_history(meta: dict) -> dict:
    keep_n = int((meta.get("properties") or {}).get(
        "version.history.num-entries", DEFAULT_HISTORY_ENTRIES))
    versions = sorted(meta["versions"], key=lambda v: v["version-id"])
    if len(versions) > keep_n:
        kept = versions[-keep_n:]
        cur = current_version(meta)
        if cur["version-id"] not in {v["version-id"] for v in kept}:
            kept = [cur] + kept[1:]  # current always survives
        meta["versions"] = kept
        keep_ids = {v["version-id"] for v in kept}
        meta["version-log"] = [e for e in meta.get("version-log", [])
                               if e["version-id"] in keep_ids]
        keep_schemas = {v["schema-id"] for v in kept}
        meta["schemas"] = [s for s in meta["schemas"]
                           if s.get("schema-id", 0) in keep_schemas]
    return meta


def current_version(meta: dict) -> dict:
    cur = meta["current-version-id"]
    for v in meta["versions"]:
        if v["version-id"] == cur:
            return v
    raise CatalogError(
        f"view metadata is corrupt: current-version-id {cur} not in "
        f"versions {[v['version-id'] for v in meta['versions']]}")


def sql_for(version: dict, dialect: str = "spark") -> str:
    """The SQL representation for ``dialect``; falls back to the only
    representation when a single one exists (spec: engines pick by
    dialect, erroring only on genuine ambiguity)."""
    reps = [r for r in version.get("representations", [])
            if r.get("type") == "sql"]
    for r in reps:
        if r.get("dialect") == dialect:
            return r["sql"]
    if len(reps) == 1:
        return reps[0]["sql"]
    raise CatalogError(
        f"no sql representation for dialect {dialect!r} among "
        f"{[r.get('dialect') for r in reps]}")


# ---------------------------------------------------------------------------
# catalog-routed lifecycle (works over SqlCatalog AND RestCatalog)

def _analyze_schema(catalog, spark, sql: str,
                    default_namespace: str) -> dict:
    """Iceberg schema of the view's output: resolve the SQL and let
    Spark ANALYZE it (``.schema`` — no job runs)."""
    from sling_cli_spark.sources.iceberg_py import _ice_schema_for

    df = _resolve_sql(catalog, spark, sql, default_namespace,
                      frozenset())
    return _ice_schema_for(df)


def create_view(catalog, spark, ident, sql: str, *,
                default_namespace: str | None = None,
                dialect: str = "spark", location: str | None = None,
                properties: dict | None = None) -> str:
    """CREATE VIEW through the catalog; returns the metadata
    location. The schema is derived by analyzing (not running) the
    resolved SQL — what Spark/Trino do on CREATE VIEW."""
    ns, _ = split_ident(ident)
    default_namespace = default_namespace or ns
    if not catalog.namespace_exists(ns):
        raise NoSuchNamespace(ns)
    if catalog.view_exists(ident) or catalog.table_exists(ident):
        raise ViewAlreadyExists(".".join(split_ident(ident)))
    ice_schema = _analyze_schema(catalog, spark, sql, default_namespace)
    version = new_view_version(
        sql, version_id=1, schema_id=ice_schema.get("schema-id", 0),
        default_namespace=default_namespace, dialect=dialect,
        operation="create", engine_version=spark.version)
    if hasattr(catalog, "post_create_view"):
        # REST: the SERVER authors metadata (spec createView)
        return catalog.post_create_view(
            ident, ice_schema, version, location=location,
            properties=properties)
    location = location or catalog.default_location(ident)
    meta = author_view_metadata(location, ice_schema, version,
                                properties)
    fs = fsio.get_fs(location)
    fs.mkdirs(fsio.join(location, "metadata"))
    ml = _view_metadata_path(location, 1)
    fs.create_exclusive(ml, json.dumps(meta).encode())
    catalog.register_view(ident, ml)
    return ml


def replace_view(catalog, spark, ident, sql: str, *,
                 default_namespace: str | None = None,
                 dialect: str = "spark") -> str:
    """CREATE OR REPLACE VIEW: append a new version + schema, CAS the
    pointer. Loses a concurrent race loudly (CommitConflict)."""
    ns, _ = split_ident(ident)
    default_namespace = default_namespace or ns
    ml = catalog.load_view(ident)
    meta = load_view_metadata(catalog, ident)
    ice_schema = _analyze_schema(catalog, spark, sql, default_namespace)
    version = new_view_version(
        sql, version_id=-1, schema_id=-1,
        default_namespace=default_namespace, dialect=dialect,
        operation="replace", engine_version=spark.version)
    if hasattr(catalog, "post_replace_view"):
        return catalog.post_replace_view(ident, meta, ice_schema,
                                         version)
    new_meta = apply_replace(meta, ice_schema, version)
    location = new_meta["location"]
    new_ml = _view_metadata_path(location, _meta_seq(ml) + 1)
    fsio.get_fs(location).create_exclusive(
        new_ml, json.dumps(new_meta).encode())
    catalog.commit_view(ident, ml, new_ml)
    return new_ml


def load_view_metadata(catalog, ident) -> dict:
    ml = catalog.load_view(ident)
    return json.loads(fsio.get_fs(ml).read_bytes(ml))


# ---------------------------------------------------------------------------
# read path

# SQL spans a catalog identifier must never be rewritten inside:
# quoted literals (with doubled-quote escapes), comments, and
# backtick-quoted identifiers (r11 advice fix — substitution used to
# run over the raw text, silently rewriting matches inside literals)
_PROTECTED = re.compile(
    r"'(?:[^']|'')*'"
    r'|"(?:[^"]|"")*"'
    r"|--[^\n]*"
    r"|/\*[\s\S]*?\*/"
    r"|`[^`]*`")


def _sub_code_spans(pattern: str, repl: str, text: str) -> str:
    """re.sub applied only OUTSIDE protected spans."""
    out, last = [], 0
    for m in _PROTECTED.finditer(text):
        out.append(re.sub(pattern, repl, text[last:m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(re.sub(pattern, repl, text[last:]))
    return "".join(out)


def _search_code_spans(pattern: str, text: str) -> bool:
    last = 0
    for m in _PROTECTED.finditer(text):
        if re.search(pattern, text[last:m.start()]):
            return True
        last = m.end()
    return bool(re.search(pattern, text[last:]))


def _resolve_sql(catalog, spark, sql: str, default_namespace: str,
                 seen: frozenset):
    """Rewrite catalog identifiers in ``sql`` to registered temp views
    and hand the text to ``spark.sql``. Longest identifiers substitute
    first so ``ns.orders_v2`` never half-matches ``ns.orders``;
    literals/comments/backticked identifiers are masked from both the
    match and the substitution. Temp-view names come from uuid4 —
    unique per resolution, safe under concurrent sessions threads."""
    refs = [(ns, name, "table") for ns, name in catalog.list_tables()]
    refs += [(ns, name, "view") for ns, name in catalog.list_views()]
    refs.sort(key=lambda r: -len(f"{r[0]}.{r[1]}"))

    rewritten = sql
    for ns, name, kind in refs:
        qualified = f"{ns}.{name}"
        pats = [r"(?<![\w.`])" + re.escape(qualified) + r"(?![\w.])"]
        if ns == default_namespace:
            # bare name resolves via default-namespace, FROM/JOIN
            # position only (a bare token elsewhere is likelier a
            # column)
            pats.append(r"(?i)(?<=\bfrom\s)" + r"\s*" +
                        re.escape(name) + r"(?![\w.])")
            pats.append(r"(?i)(?<=\bjoin\s)" + r"\s*" +
                        re.escape(name) + r"(?![\w.])")
        if not any(_search_code_spans(p, rewritten) for p in pats):
            continue
        if kind == "view":
            if (ns, name) in seen:
                raise CatalogError(
                    f"cyclic view reference through {ns}.{name}")
            df = read_view(catalog, spark, (ns, name),
                           _seen=seen | {(ns, name)})
        else:
            df = read_table(catalog, spark, (ns, name))
        tmp = f"__sling_view_ref_{uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(tmp)
        for p in pats:
            rewritten = _sub_code_spans(p, tmp, rewritten)
    return spark.sql(rewritten)


def read_view(catalog, spark, ident, version_id: int | None = None,
              as_of_timestamp_ms: int | None = None,
              _seen: frozenset | None = None):
    """SELECT * FROM the view — resolve the (current or pinned)
    version's SQL against the catalog and let Catalyst plan it.
    ``version_id`` time-travels across replaces (spec: versions are
    retained history); ``as_of_timestamp_ms`` picks the latest
    retained version at or before the instant (the table time-travel
    rule applied to view definitions)."""
    meta = load_view_metadata(catalog, ident)
    if version_id is None and as_of_timestamp_ms is not None:
        cands = [v for v in meta["versions"]
                 if int(v["timestamp-ms"]) <= as_of_timestamp_ms]
        if not cands:
            raise CatalogError(
                f"view {ident}: instant {as_of_timestamp_ms} predates "
                "every retained version")
        version_id = max(
            cands, key=lambda v: (int(v["timestamp-ms"]),
                                  v["version-id"]))["version-id"]
    if version_id is None:
        version = current_version(meta)
    else:
        matches = [v for v in meta["versions"]
                   if v["version-id"] == version_id]
        if not matches:
            raise CatalogError(
                f"view {ident}: no version {version_id} (history "
                f"holds {[v['version-id'] for v in meta['versions']]})")
        version = matches[0]
    default_ns = ".".join(version.get("default-namespace") or
                          [split_ident(ident)[0]])
    seen = (_seen if _seen is not None
            else frozenset()) | {tuple(split_ident(ident))}
    return _resolve_sql(catalog, spark, sql_for(version), default_ns,
                        seen)


def view_versions(catalog, spark, ident):
    """Metadata twin of Spark/Trino's view version history: one row
    per retained version."""
    meta = load_view_metadata(catalog, ident)
    cur = meta["current-version-id"]
    rows = [(int(v["version-id"]),
             int(v["schema-id"]),
             int(v["timestamp-ms"]),
             v.get("summary", {}).get("operation"),
             sql_for(v),
             ".".join(v.get("default-namespace") or []),
             v["version-id"] == cur)
            for v in sorted(meta["versions"],
                            key=lambda v: v["version-id"])]
    return local_df(spark, 
        rows, "version_id int, schema_id int, timestamp_ms long, "
              "operation string, sql string, default_namespace string, "
              "is_current boolean")
