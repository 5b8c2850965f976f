"""Iceberg catalogs: identifier -> metadata-pointer resolution with
transactional (CAS) commits, over a SQL store.

Parity target: the reference's catalog-backed Iceberg connection,
``/root/reference/core/dbio/database/database_iceberg.go`` (IcebergConn:
``catalog_type`` rest|glue|sql via iceberg-go — Connect:60-88,
connectSQL:336-452 [the pyiceberg/iceberg-go ``iceberg_tables`` SQL
schema], GetSchemas:478, GetTables:514, GetColumns:562,
GetMaxValue:671 [manifest upper bounds, no scan], CreateTable:1015,
TableExists:1111, DropTable:1123, CreateNamespaceIfNotExists:1162,
SwapTable:1185, BulkImportStream:1252, GetSchemata:1391).

Spark-first re-expression: the catalog is a *pointer store* — each
table row maps an identifier to its current ``metadata_location``; all
data-path work stays on the existing :mod:`iceberg_py` DataFrame
read/write machinery. A catalog write is therefore
(1) load the pointer, (2) run the ordinary ``write_iceberg`` commit on
the table location, (3) compare-and-swap the pointer from the expected
metadata file to the new one. A losing racer rolls the table's hint
back to its pre-write version and raises :class:`CommitConflict` —
the same optimistic protocol iceberg-go's SQL catalog uses (UPDATE ...
WHERE metadata_location = expected).

The SQL store is sqlite (stdlib) with the exact public table shapes
pyiceberg/iceberg-go define (``iceberg_tables``,
``iceberg_namespace_properties``) so a real JDBC/SQL catalog can be
pointed at the same rows. The REST flavor lives in
:mod:`iceberg_rest` and implements this module's same duck-typed
catalog interface over the public Iceberg REST OpenAPI.
"""

from __future__ import annotations

import json
import re
import sqlite3
import time

from sling_cli_spark import fsio

from sling_cli_spark.localframe import local_df


class CatalogError(Exception):
    pass


class NoSuchNamespace(CatalogError):
    pass


class NamespaceAlreadyExists(CatalogError):
    pass


class NamespaceNotEmpty(CatalogError):
    pass


class NoSuchTable(CatalogError):
    pass


class TableAlreadyExists(CatalogError):
    pass


class NoSuchView(CatalogError):
    pass


class ViewAlreadyExists(CatalogError):
    pass


class CommitConflict(CatalogError):
    """The pointer moved between load and commit (another committer
    won) — retry by reloading, like iceberg-go's CommitFailedException."""


def split_ident(ident) -> tuple[str, str]:
    """``"ns.table"`` / ``("ns", "table")`` -> (namespace, table). A
    dotted namespace keeps its dots: the LAST dot splits the table
    name (reference ParseTableName semantics for a 2-part ident)."""
    if isinstance(ident, (tuple, list)):
        if len(ident) < 2:
            raise ValueError(f"identifier needs namespace + name: {ident}")
        return ".".join(ident[:-1]), ident[-1]
    ns, _, name = str(ident).rpartition(".")
    if not ns or not name:
        raise ValueError(
            f"identifier must be namespace.table, got {ident!r}")
    return ns, name


_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.\-]*$")


def _check_name(kind: str, name: str) -> str:
    if not _NAME_RE.match(name or "") or \
            (kind == "table" and "." in name):
        raise ValueError(f"invalid {kind} name: {name!r}")
    return name


_KIND_TABLE = "(iceberg_type = 'TABLE' OR iceberg_type IS NULL)"
_KIND_VIEW = "iceberg_type = 'VIEW'"


class SqlCatalog:
    """SQL-backed catalog (reference connectSQL:336 — iceberg-go
    ``catalog/sql`` over Postgres/MySQL/SQLite/MSSQL/Oracle; here the
    stdlib sqlite driver, same table shapes). Safe for concurrent
    committers: the pointer swap is a single conditional UPDATE."""

    def __init__(self, uri: str, name: str = "sling",
                 warehouse: str | None = None, init: bool = True):
        self.uri = uri
        self.name = name
        self.warehouse = warehouse
        if init:  # reference `sql_catalog_init` -> init_catalog_tables
            with self._conn() as c:
                c.execute("""
                    CREATE TABLE IF NOT EXISTS iceberg_tables (
                        catalog_name TEXT NOT NULL,
                        table_namespace TEXT NOT NULL,
                        table_name TEXT NOT NULL,
                        metadata_location TEXT,
                        previous_metadata_location TEXT,
                        iceberg_type TEXT DEFAULT 'TABLE',
                        PRIMARY KEY (catalog_name, table_namespace,
                                     table_name))""")
                c.execute("""
                    CREATE TABLE IF NOT EXISTS
                    iceberg_namespace_properties (
                        catalog_name TEXT NOT NULL,
                        namespace TEXT NOT NULL,
                        property_key TEXT NOT NULL,
                        property_value TEXT,
                        PRIMARY KEY (catalog_name, namespace,
                                     property_key))""")
                # migrate stores created before the views feature: the
                # Java JDBC catalog ALTERs this column in when missing;
                # without it every list/load/commit on an old store
                # raises 'no such column: iceberg_type'
                cols = {r[1] for r in c.execute(
                    "PRAGMA table_info(iceberg_tables)")}
                if "iceberg_type" not in cols:
                    c.execute("ALTER TABLE iceberg_tables ADD COLUMN "
                              "iceberg_type TEXT DEFAULT 'TABLE'")

    def _conn(self):
        c = sqlite3.connect(self.uri, timeout=30)
        c.execute("PRAGMA busy_timeout = 30000")
        return c

    # -- namespaces (reference GetSchemas:478,
    #    CreateNamespaceIfNotExists:1162) --------------------------------

    def create_namespace(self, ns: str, properties: dict | None = None,
                         exists_ok: bool = False) -> None:
        _check_name("namespace", ns)
        props = dict(properties or {})
        props.setdefault("exists", "true")
        with self._conn() as c:
            cur = c.execute(
                "SELECT 1 FROM iceberg_namespace_properties "
                "WHERE catalog_name = ? AND namespace = ?",
                (self.name, ns))
            if cur.fetchone():
                if exists_ok:
                    return
                raise NamespaceAlreadyExists(ns)
            c.executemany(
                "INSERT INTO iceberg_namespace_properties VALUES "
                "(?, ?, ?, ?)",
                [(self.name, ns, k, str(v)) for k, v in props.items()])

    def namespace_exists(self, ns: str) -> bool:
        with self._conn() as c:
            return bool(c.execute(
                "SELECT 1 FROM iceberg_namespace_properties "
                "WHERE catalog_name = ? AND namespace = ? "
                "UNION SELECT 1 FROM iceberg_tables "
                "WHERE catalog_name = ? AND table_namespace = ?",
                (self.name, ns, self.name, ns)).fetchone())

    def list_namespaces(self) -> list[str]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT namespace FROM iceberg_namespace_properties "
                "WHERE catalog_name = ? UNION "
                "SELECT table_namespace FROM iceberg_tables "
                "WHERE catalog_name = ? ORDER BY 1",
                (self.name, self.name)).fetchall()
        return [r[0] for r in rows]

    def namespace_properties(self, ns: str) -> dict:
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        with self._conn() as c:
            rows = c.execute(
                "SELECT property_key, property_value FROM "
                "iceberg_namespace_properties WHERE catalog_name = ? "
                "AND namespace = ?", (self.name, ns)).fetchall()
        return dict(rows)

    def update_namespace_properties(
            self, ns: str, updates: dict | None = None,
            removals: list | None = None) -> dict:
        """The REST spec's updateProperties: set + remove namespace
        properties in one transaction; returns
        {"updated": [...], "removed": [...], "missing": [...]}."""
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        updates = {k: str(v) for k, v in (updates or {}).items()}
        removals = list(removals or [])
        overlap = set(updates) & set(removals)
        if overlap:
            raise CatalogError(
                f"properties both updated and removed: "
                f"{sorted(overlap)}")
        missing = []
        with self._conn() as c:
            for k in removals:
                cur = c.execute(
                    "DELETE FROM iceberg_namespace_properties WHERE "
                    "catalog_name = ? AND namespace = ? AND "
                    "property_key = ?", (self.name, ns, k))
                if cur.rowcount == 0:
                    missing.append(k)
            for k, v in updates.items():
                c.execute(
                    "INSERT INTO iceberg_namespace_properties VALUES "
                    "(?, ?, ?, ?) ON CONFLICT (catalog_name, "
                    "namespace, property_key) DO UPDATE SET "
                    "property_value = excluded.property_value",
                    (self.name, ns, k, v))
        return {"updated": sorted(updates), "removed":
                [k for k in removals if k not in missing],
                "missing": missing}

    def drop_namespace(self, ns: str) -> None:
        with self._conn() as c:
            n = c.execute(
                "SELECT COUNT(*) FROM iceberg_tables WHERE "
                "catalog_name = ? AND table_namespace = ?",
                (self.name, ns)).fetchone()[0]
            if n:
                raise NamespaceNotEmpty(f"{ns} holds {n} tables")
            cur = c.execute(
                "DELETE FROM iceberg_namespace_properties WHERE "
                "catalog_name = ? AND namespace = ?", (self.name, ns))
            if cur.rowcount == 0:
                raise NoSuchNamespace(ns)

    # -- tables (reference GetTables:514, TableExists:1111,
    #    DropTable:1123, SwapTable:1185) --------------------------------

    def list_tables(self, ns: str | None = None) -> list[tuple[str, str]]:
        q = ("SELECT table_namespace, table_name FROM iceberg_tables "
             "WHERE catalog_name = ? AND " + _KIND_TABLE)
        args: tuple = (self.name,)
        if ns is not None:
            q += " AND table_namespace = ?"
            args += (ns,)
        with self._conn() as c:
            return [tuple(r) for r in
                    c.execute(q + " ORDER BY 1, 2", args).fetchall()]

    def table_exists(self, ident) -> bool:
        ns, name = split_ident(ident)
        with self._conn() as c:
            return bool(c.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name = ? "
                "AND table_namespace = ? AND table_name = ? AND " +
                _KIND_TABLE, (self.name, ns, name)).fetchone())

    def load_table(self, ident) -> str:
        """Identifier -> current metadata_location (reference
        LoadTable callers: GetColumns:562, GetDataFiles:620)."""
        ns, name = split_ident(ident)
        with self._conn() as c:
            row = c.execute(
                "SELECT metadata_location FROM iceberg_tables WHERE "
                "catalog_name = ? AND table_namespace = ? AND "
                "table_name = ? AND " + _KIND_TABLE,
                (self.name, ns, name)).fetchone()
        if not row or not row[0]:
            raise NoSuchTable(f"{ns}.{name}")
        return row[0]

    def register_table(self, ident, metadata_location: str) -> None:
        """Adopt an existing table's CURRENT metadata file under this
        catalog (the REST spec's registerTable; how a hint-tracked
        path table enters catalog management)."""
        ns, name = split_ident(ident)
        _check_name("table", name)
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO iceberg_tables (catalog_name, "
                    "table_namespace, table_name, metadata_location, "
                    "previous_metadata_location, iceberg_type) VALUES "
                    "(?, ?, ?, ?, NULL, 'TABLE')",
                    (self.name, ns, name, metadata_location))
        except sqlite3.IntegrityError:
            raise TableAlreadyExists(f"{ns}.{name}") from None

    def commit_table(self, ident, expected_metadata_location: str | None,
                     new_metadata_location: str) -> None:
        """Pointer CAS — the catalog's whole transactional contract
        (iceberg-go sql catalog: conditional UPDATE on the previous
        location). ``expected=None`` asserts creation."""
        ns, name = split_ident(ident)
        if expected_metadata_location is None:
            return self.register_table(ident, new_metadata_location)
        with self._conn() as c:
            cur = c.execute(
                "UPDATE iceberg_tables SET metadata_location = ?, "
                "previous_metadata_location = ? WHERE catalog_name = ? "
                "AND table_namespace = ? AND table_name = ? AND "
                "metadata_location = ? AND " + _KIND_TABLE,
                (new_metadata_location, expected_metadata_location,
                 self.name, ns, name, expected_metadata_location))
            if cur.rowcount == 0:
                row = c.execute(
                    "SELECT metadata_location FROM iceberg_tables "
                    "WHERE catalog_name = ? AND table_namespace = ? "
                    "AND table_name = ?",
                    (self.name, ns, name)).fetchone()
                if not row:
                    raise NoSuchTable(f"{ns}.{name}")
                raise CommitConflict(
                    f"{ns}.{name}: expected {expected_metadata_location}"
                    f", catalog holds {row[0]}")

    def drop_table(self, ident) -> None:
        ns, name = split_ident(ident)
        with self._conn() as c:
            cur = c.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name = ? AND "
                "table_namespace = ? AND table_name = ? AND " +
                _KIND_TABLE, (self.name, ns, name))
            if cur.rowcount == 0:
                raise NoSuchTable(f"{ns}.{name}")

    def rename_table(self, src, dst) -> None:
        sns, sname = split_ident(src)
        dns, dname = split_ident(dst)
        _check_name("table", dname)
        try:
            with self._conn() as c:
                cur = c.execute(
                    "UPDATE iceberg_tables SET table_namespace = ?, "
                    "table_name = ? WHERE catalog_name = ? AND "
                    "table_namespace = ? AND table_name = ? AND " +
                    _KIND_TABLE, (dns, dname, self.name, sns, sname))
                if cur.rowcount == 0:
                    raise NoSuchTable(f"{sns}.{sname}")
        except sqlite3.IntegrityError:
            raise TableAlreadyExists(f"{dns}.{dname}") from None

    def swap_tables(self, a, b) -> None:
        """Atomic A<->B pointer exchange in ONE transaction — the
        reference's SwapTable:1185 does rename->temp/rename/rename
        (three commits, a crash window between them); a SQL catalog
        can do better, so this does."""
        ans, aname = split_ident(a)
        bns, bname = split_ident(b)
        with self._conn() as c:
            rows = {}
            for ns, name in ((ans, aname), (bns, bname)):
                r = c.execute(
                    "SELECT metadata_location, "
                    "previous_metadata_location FROM iceberg_tables "
                    "WHERE catalog_name = ? AND table_namespace = ? "
                    "AND table_name = ?",
                    (self.name, ns, name)).fetchone()
                if not r:
                    raise NoSuchTable(f"{ns}.{name}")
                rows[(ns, name)] = r
            for (ns, name), other in (
                    ((ans, aname), rows[(bns, bname)]),
                    ((bns, bname), rows[(ans, aname)])):
                c.execute(
                    "UPDATE iceberg_tables SET metadata_location = ?, "
                    "previous_metadata_location = ? WHERE "
                    "catalog_name = ? AND table_namespace = ? AND "
                    "table_name = ?",
                    (other[0], other[1], self.name, ns, name))

    def commit_many(self, changes) -> None:
        """ATOMIC multi-table pointer CAS (the REST spec's
        commitTransaction): every ``(ident, expected_ml, new_ml)``
        applies or none does — one SQL transaction, so a reader can
        never observe table A advanced while table B lags (the
        cross-table consistency a multi-stream replication commit
        needs). ``expected_ml=None`` registers a new table inside the
        same transaction."""
        with self._conn() as c:
            for ident, expected, new in changes:
                ns, name = split_ident(ident)
                if expected is None:
                    _check_name("table", name)
                    try:
                        c.execute(
                            "INSERT INTO iceberg_tables (catalog_name,"
                            " table_namespace, table_name, "
                            "metadata_location, "
                            "previous_metadata_location, iceberg_type)"
                            " VALUES (?, ?, ?, ?, NULL, 'TABLE')",
                            (self.name, ns, name, new))
                    except sqlite3.IntegrityError:
                        raise TableAlreadyExists(
                            f"{ns}.{name}") from None
                    continue
                cur = c.execute(
                    "UPDATE iceberg_tables SET metadata_location = ?,"
                    " previous_metadata_location = ? WHERE "
                    "catalog_name = ? AND table_namespace = ? AND "
                    "table_name = ? AND metadata_location = ? AND " +
                    _KIND_TABLE,
                    (new, expected, self.name, ns, name, expected))
                if cur.rowcount == 0:
                    row = c.execute(
                        "SELECT metadata_location FROM iceberg_tables"
                        " WHERE catalog_name = ? AND "
                        "table_namespace = ? AND table_name = ?",
                        (self.name, ns, name)).fetchone()
                    # raising inside the connection context rolls the
                    # whole transaction back — earlier CAS wins undo
                    if not row:
                        raise NoSuchTable(f"{ns}.{name}")
                    raise CommitConflict(
                        f"transaction: {ns}.{name} expected "
                        f"{expected}, catalog holds {row[0]} — no "
                        "table moved")

    # -- views (Iceberg View Spec v1 pointers; the pyiceberg/JDBC-
    #    catalog convention keeps them in iceberg_tables rows with
    #    iceberg_type='VIEW' — same CAS contract as tables) -----------

    def list_views(self, ns: str | None = None) -> list[tuple[str, str]]:
        q = ("SELECT table_namespace, table_name FROM iceberg_tables "
             "WHERE catalog_name = ? AND " + _KIND_VIEW)
        args: tuple = (self.name,)
        if ns is not None:
            q += " AND table_namespace = ?"
            args += (ns,)
        with self._conn() as c:
            return [tuple(r) for r in
                    c.execute(q + " ORDER BY 1, 2", args).fetchall()]

    def view_exists(self, ident) -> bool:
        ns, name = split_ident(ident)
        with self._conn() as c:
            return bool(c.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name = ? "
                "AND table_namespace = ? AND table_name = ? AND " +
                _KIND_VIEW, (self.name, ns, name)).fetchone())

    def load_view(self, ident) -> str:
        """Identifier -> current view metadata_location."""
        ns, name = split_ident(ident)
        with self._conn() as c:
            row = c.execute(
                "SELECT metadata_location FROM iceberg_tables WHERE "
                "catalog_name = ? AND table_namespace = ? AND "
                "table_name = ? AND " + _KIND_VIEW,
                (self.name, ns, name)).fetchone()
        if not row or not row[0]:
            raise NoSuchView(f"{ns}.{name}")
        return row[0]

    def register_view(self, ident, metadata_location: str) -> None:
        ns, name = split_ident(ident)
        _check_name("table", name)
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        try:
            with self._conn() as c:
                c.execute(
                    "INSERT INTO iceberg_tables (catalog_name, "
                    "table_namespace, table_name, metadata_location, "
                    "previous_metadata_location, iceberg_type) VALUES "
                    "(?, ?, ?, ?, NULL, 'VIEW')",
                    (self.name, ns, name, metadata_location))
        except sqlite3.IntegrityError:
            # the PK spans tables AND views: a same-named table also
            # collides (spec: view/table identifiers share a namespace)
            raise ViewAlreadyExists(f"{ns}.{name}") from None

    def commit_view(self, ident, expected_metadata_location: str | None,
                    new_metadata_location: str) -> None:
        """Pointer CAS for a view replace — same optimistic contract
        as :meth:`commit_table`."""
        ns, name = split_ident(ident)
        if expected_metadata_location is None:
            return self.register_view(ident, new_metadata_location)
        with self._conn() as c:
            cur = c.execute(
                "UPDATE iceberg_tables SET metadata_location = ?, "
                "previous_metadata_location = ? WHERE catalog_name = ? "
                "AND table_namespace = ? AND table_name = ? AND "
                "metadata_location = ? AND " + _KIND_VIEW,
                (new_metadata_location, expected_metadata_location,
                 self.name, ns, name, expected_metadata_location))
            if cur.rowcount == 0:
                row = c.execute(
                    "SELECT metadata_location FROM iceberg_tables "
                    "WHERE catalog_name = ? AND table_namespace = ? "
                    "AND table_name = ? AND " + _KIND_VIEW,
                    (self.name, ns, name)).fetchone()
                if not row:
                    raise NoSuchView(f"{ns}.{name}")
                raise CommitConflict(
                    f"view {ns}.{name}: expected "
                    f"{expected_metadata_location}, catalog holds "
                    f"{row[0]}")

    def drop_view(self, ident) -> None:
        ns, name = split_ident(ident)
        with self._conn() as c:
            cur = c.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name = ? AND "
                "table_namespace = ? AND table_name = ? AND " +
                _KIND_VIEW, (self.name, ns, name))
            if cur.rowcount == 0:
                raise NoSuchView(f"{ns}.{name}")

    def rename_view(self, src, dst) -> None:
        sns, sname = split_ident(src)
        dns, dname = split_ident(dst)
        _check_name("table", dname)
        try:
            with self._conn() as c:
                cur = c.execute(
                    "UPDATE iceberg_tables SET table_namespace = ?, "
                    "table_name = ? WHERE catalog_name = ? AND "
                    "table_namespace = ? AND table_name = ? AND " +
                    _KIND_VIEW, (dns, dname, self.name, sns, sname))
                if cur.rowcount == 0:
                    raise NoSuchView(f"{sns}.{sname}")
        except sqlite3.IntegrityError:
            raise ViewAlreadyExists(f"{dns}.{dname}") from None

    def default_location(self, ident) -> str:
        if not self.warehouse:
            raise CatalogError(
                "catalog has no warehouse location; pass an explicit "
                "table location (reference `sql_warehouse` prop)")
        ns, name = split_ident(ident)
        return fsio.join(self.warehouse, f"{ns}.db", name)


# ---------------------------------------------------------------------------
# catalog-routed table operations (work over SqlCatalog AND
# iceberg_rest.RestCatalog — any pointer store with this duck type)

def _meta_version(metadata_location: str) -> int:
    m = re.search(r"v(\d+)\.metadata\.json$", metadata_location)
    if not m:
        raise CatalogError(
            f"unrecognized metadata filename: {metadata_location}")
    return int(m.group(1))


def _read_meta(metadata_location: str) -> dict:
    return json.loads(
        fsio.get_fs(metadata_location).read_bytes(metadata_location))


def _hint_version(location: str) -> int:
    fs = fsio.get_fs(location)
    return int(fs.read_bytes(fsio.join(
        location, "metadata", "version-hint.text")).decode().strip())


def create_table(catalog, ident, schema, partition_by=None,
                 format_version: int = 2, location: str | None = None,
                 sort_by=None, properties: dict | None = None) -> str:
    """CREATE TABLE through the catalog (reference CreateTable:1015 —
    an EMPTY table: metadata v1, no snapshot). ``schema`` is a Spark
    StructType; returns the table location."""
    from sling_cli_spark.sources.iceberg_py import _init_meta

    ns, _ = split_ident(ident)
    if not catalog.namespace_exists(ns):
        raise NoSuchNamespace(ns)
    if catalog.table_exists(ident):
        raise TableAlreadyExists(".".join(split_ident(ident)))
    location = location or catalog.default_location(ident)

    class _Shim:  # _init_meta only touches .schema
        pass
    _Shim.schema = schema
    meta = _init_meta(_Shim, location, partition_by, format_version,
                      sort_by=sort_by)
    if properties:
        meta["properties"] = {k: str(v) for k, v in properties.items()}
    meta["last-updated-ms"] = int(time.time() * 1000)
    fs = fsio.get_fs(location)
    fs.mkdirs(fsio.join(location, "metadata"))
    ml = fsio.join(location, "metadata", "v1.metadata.json")
    fs.create_exclusive(ml, json.dumps(meta).encode())
    fs.write_bytes(
        fsio.join(location, "metadata", "version-hint.text"), b"1")
    catalog.commit_table(ident, None, ml)
    return location


_ACTIVE_TXN: list = []  # CatalogTransaction stack (with-block nesting)


class CatalogTransaction:
    """Defer every catalog pointer commit inside a ``with`` block and
    swap them ALL atomically at exit (:meth:`SqlCatalog.commit_many` /
    the REST spec's commitTransaction) — the cross-table consistency a
    multi-stream replication needs: no reader ever observes stream A
    landed while stream B lags, and a failure anywhere (a later
    stream, a failing WAP gate, the final CAS) withdraws every staged
    table. Operations on the SAME table chain (each stages on top of
    the previous hint); tables of ONE catalog only (atomicity cannot
    span stores). Table/namespace CREATION stays immediate — pointers
    are the transactional unit, like the REST spec."""

    def __init__(self):
        # (ns, name) -> [catalog, ident, expected_ml, location,
        #                pointer_v, new_v]
        self._staged: dict = {}
        self._catkey = None

    @staticmethod
    def current() -> "CatalogTransaction | None":
        return _ACTIVE_TXN[-1] if _ACTIVE_TXN else None

    def __enter__(self):
        _ACTIVE_TXN.append(self)
        return self

    def __exit__(self, exc_type, exc, tb):
        _ACTIVE_TXN.pop()
        if exc_type is not None:
            self.rollback()
            return False
        try:
            self.commit()
        except Exception:
            self.rollback()
            raise
        return False

    def _key_of(self, catalog):
        return (type(catalog).__name__,
                getattr(catalog, "uri", None),
                getattr(catalog, "name", None))

    def stage(self, catalog, ident, fn):
        """run_committed's staging half: run the hint-advancing op,
        record the pointer change for the transaction's commit."""
        key = self._key_of(catalog)
        if self._catkey is None:
            self._catkey = key
        elif key != self._catkey:
            raise CatalogError(
                "atomic transaction cannot span catalogs "
                f"({self._catkey} vs {key})")
        ns_name = tuple(split_ident(ident))
        prior = self._staged.get(ns_name)
        expected_ml = catalog.load_table(ident)
        meta = _read_meta(expected_ml)
        location = meta["location"]
        pointer_v = _meta_version(expected_ml)
        base_v = prior[5] if prior else pointer_v
        hint_v = _hint_version(location)
        if hint_v != base_v:
            raise CommitConflict(
                f"table at {location}: hint v{hint_v} != expected "
                f"v{base_v} — reconcile with repair_pointer()")
        out = fn(location)
        new_v = _hint_version(location)
        if new_v != base_v:
            if prior:
                prior[5] = new_v  # chain: same txn, one final CAS
            else:
                self._staged[ns_name] = [catalog, ident, expected_ml,
                                         location, pointer_v, new_v]
        return out

    def commit(self) -> None:
        if not self._staged:
            return
        catalog = next(iter(self._staged.values()))[0]
        catalog.commit_many([
            (ident, expected_ml,
             fsio.join(location, "metadata",
                       f"v{new_v}.metadata.json"))
            for _cat, ident, expected_ml, location, _pv, new_v
            in self._staged.values()])
        self._staged.clear()

    def rollback(self) -> None:
        for _cat, _ident, _exp, location, pointer_v, new_v \
                in self._staged.values():
            fs = fsio.get_fs(location)
            fs.write_bytes(
                fsio.join(location, "metadata", "version-hint.text"),
                str(pointer_v).encode())
            for v in range(pointer_v + 1, new_v + 1):
                try:
                    fs.delete(fsio.join(location, "metadata",
                                        f"v{v}.metadata.json"))
                except FileNotFoundError:
                    pass
        self._staged.clear()


def run_committed(catalog, ident, fn):
    """Run ANY hint-advancing table operation (write, merge,
    delete_missing, upsert, compaction...) under the catalog's
    pointer CAS. ``fn(location)`` performs the ordinary local commit;
    every metadata version it advances is then swapped into the
    catalog. On losing the race the table's hint rolls back to its
    pre-run version and the local metadata files are withdrawn, so
    path-readers never see the un-committed snapshots; data files
    stay as orphans for maintenance (exactly Iceberg's failed-commit
    contract). Returns ``fn``'s result.

    Inside an active :class:`CatalogTransaction` the pointer swap is
    DEFERRED to the transaction's atomic commit — every catalog commit
    path (plain write, merge, delete_missing, WAP publish) becomes
    transactional through this one seam."""
    txn = CatalogTransaction.current()
    if txn is not None:
        return txn.stage(catalog, ident, fn)
    expected_ml = catalog.load_table(ident)
    meta = _read_meta(expected_ml)
    location = meta["location"]
    expected_v = _meta_version(expected_ml)
    hint_v = _hint_version(location)
    if hint_v != expected_v:
        raise CommitConflict(
            f"table at {location}: hint v{hint_v} != catalog pointer "
            f"v{expected_v} — a prior catalog commit failed midway; "
            "reconcile with repair_pointer()")
    out = fn(location)
    new_v = _hint_version(location)
    if new_v == hint_v:  # idempotent txn skip: nothing committed
        return out
    new_ml = fsio.join(location, "metadata", f"v{new_v}.metadata.json")
    try:
        catalog.commit_table(ident, expected_ml, new_ml)
    except CommitConflict:
        fs = fsio.get_fs(location)
        fs.write_bytes(
            fsio.join(location, "metadata", "version-hint.text"),
            str(hint_v).encode())
        for v in range(hint_v + 1, new_v + 1):
            fs.delete(fsio.join(location, "metadata",
                                f"v{v}.metadata.json"))
        raise
    return out


def run_committed_many(catalog, ops):
    """Multi-table transaction: run each ``(ident, fn)`` hint-advancing
    operation on its table's storage, then swap EVERY advanced pointer
    in ONE atomic ``commit_many`` — all tables move or none do. On a
    lost race every staged table's hint rolls back and its
    uncommitted metadata files are withdrawn (the same failed-commit
    contract as :func:`run_committed`, applied to the whole set).
    Returns the list of ``fn`` results."""
    staged = []   # (ident, expected_ml, location, hint_v, new_v)
    results = []
    try:
        for ident, fn in ops:
            expected_ml = catalog.load_table(ident)
            meta = _read_meta(expected_ml)
            location = meta["location"]
            expected_v = _meta_version(expected_ml)
            hint_v = _hint_version(location)
            if hint_v != expected_v:
                raise CommitConflict(
                    f"table at {location}: hint v{hint_v} != catalog "
                    f"pointer v{expected_v} — reconcile with "
                    "repair_pointer()")
            results.append(fn(location))
            new_v = _hint_version(location)
            if new_v != hint_v:
                staged.append(
                    (ident, expected_ml, location, hint_v, new_v))
        catalog.commit_many([
            (ident, expected_ml,
             fsio.join(location, "metadata",
                       f"v{new_v}.metadata.json"))
            for ident, expected_ml, location, hint_v, new_v
            in staged])
        return results
    except Exception:
        for _ident, _exp, location, hint_v, new_v in staged:
            fs = fsio.get_fs(location)
            fs.write_bytes(
                fsio.join(location, "metadata", "version-hint.text"),
                str(hint_v).encode())
            for v in range(hint_v + 1, new_v + 1):
                try:
                    fs.delete(fsio.join(location, "metadata",
                                        f"v{v}.metadata.json"))
                except FileNotFoundError:
                    pass
        raise


def write_table(df, catalog, ident, mode: str = "append", **kw) -> int:
    """Append/overwrite THROUGH the catalog (reference
    BulkImportStream:1252 — parquet write + transaction AddFiles +
    catalog commit): ordinary :func:`iceberg_py.write_iceberg` on the
    table location under :func:`run_committed`. Returns the snapshot
    id."""
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    return run_committed(
        catalog, ident,
        lambda location: write_iceberg(df, location, mode=mode, **kw))


def read_table(catalog, spark, ident, **kw):
    """SELECT through the catalog: resolve the pointer, scan with the
    ordinary MoR read (reference StreamRowsContext:741 routes reads
    through LoadTable the same way). If the path's hint has advanced
    past the catalog pointer (a foreign path-writer), the read
    time-travels to the catalog's current snapshot — the catalog is
    authoritative for its readers."""
    from sling_cli_spark.sources.iceberg_py import (
        _spark_schema, read_iceberg)

    ml = catalog.load_table(ident)
    meta = _read_meta(ml)
    location = meta["location"]
    if _hint_version(location) == _meta_version(ml):
        return read_iceberg(spark, location, **kw)
    snap = meta.get("current-snapshot-id")
    if snap is None or int(snap) == -1:
        return local_df(spark, [], _spark_schema(meta))
    return read_iceberg(spark, location,
                        snapshot_id=int(snap), **kw)


def table_columns(catalog, ident) -> list[tuple[str, str, bool]]:
    """(name, iceberg type string, required) per column — reference
    GetColumns:562 (schema from LoadTable, no file I/O)."""
    from sling_cli_spark.sources.iceberg_py import _current_schema

    meta = _read_meta(catalog.load_table(ident))
    out = []
    for f in _current_schema(meta)["fields"]:
        t = f["type"]
        out.append((f["name"],
                    t if isinstance(t, str) else t.get("type"),
                    bool(f.get("required"))))
    return out


def max_value(catalog, ident, column: str):
    """Incremental watermark from MANIFEST upper bounds — zero data
    files read (reference GetMaxValue:671 folds
    dataFile.UpperBoundValues() the same way). At 100 TB this is the
    difference between a metadata read and a full-column scan.
    Decoded per the spec's single-value serialization (date -> epoch
    days, timestamp -> epoch micros, like the bounds it came from);
    None when no file carries a bound for the column."""
    from sling_cli_spark.sources.iceberg_py import (
        _active_entries, _bounds_map, _current_schema, _decode_bound)

    ml = catalog.load_table(ident)
    meta = _read_meta(ml)
    fld = next((f for f in _current_schema(meta)["fields"]
                if f["name"] == column), None)
    if fld is None:
        raise CatalogError(f"no column {column!r} in {ident}")
    if not isinstance(fld["type"], str):
        raise CatalogError(f"{column!r} is a nested type — no bounds")
    files, _, _ = _active_entries(meta["location"], meta, None)
    best = None
    for f in files:
        hi = (_bounds_map(f.get("upper_bounds")) or {}).get(
            str(fld["id"]))
        if hi is None:
            continue
        try:
            v = _decode_bound(fld["type"], hi)
        except Exception:
            continue
        if v is not None and (best is None or v > best):
            best = v
    return best


_CATALOG_SCHEME = "catalog://"


def is_catalog_url(s) -> bool:
    """``catalog://ns.table?db=...`` / ``?uri=...`` — the EL runner's
    routing scheme for catalog-managed tables (the reference routes
    via a named connection with catalog_* props instead; a URL keeps
    the single-string stream/object contract)."""
    return bool(s) and str(s).startswith(_CATALOG_SCHEME)


def open_catalog_url(url: str):
    """``catalog://ns.table?db=/path/c.db&warehouse=/wh`` (SQL) or
    ``catalog://ns.table?uri=http://host:8181&token=...`` (REST)
    -> (catalog, "ns.table"). Query keys mirror the reference's
    connection props (database_iceberg.go: catalog_type sql|rest,
    rest_uri, token, credential, *_warehouse)."""
    from urllib.parse import parse_qsl

    rest = url[len(_CATALOG_SCHEME):]
    ident, _, q = rest.partition("?")
    params = dict(parse_qsl(q))
    if not ident or "." not in ident:
        raise CatalogError(
            f"catalog url needs ns.table before '?': {url!r}")
    if params.get("uri"):
        from sling_cli_spark.sources.iceberg_rest import RestCatalog
        cat = RestCatalog(params["uri"], token=params.get("token"),
                          credential=params.get("credential"),
                          warehouse=params.get("warehouse"),
                          page_size=int(params["pageSize"])
                          if params.get("pageSize") else None)
    elif params.get("db"):
        cat = SqlCatalog(params["db"],
                         warehouse=params.get("warehouse"))
    else:
        raise CatalogError(
            f"catalog url needs db= (sqlite store) or uri= (REST "
            f"endpoint): {url!r}")
    return cat, ident


def repair_pointer(catalog, ident) -> str:
    """Roll the catalog pointer FORWARD to the table's current hint
    metadata (operator verb for the crash window where the table
    committed locally but the pointer CAS never ran). Returns the new
    metadata location."""
    ml = catalog.load_table(ident)
    location = _read_meta(ml)["location"]
    hint_v = _hint_version(location)
    if hint_v == _meta_version(ml):
        return ml
    new_ml = fsio.join(location, "metadata",
                       f"v{hint_v}.metadata.json")
    catalog.commit_table(ident, ml, new_ml)
    return new_ml
