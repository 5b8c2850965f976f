"""Reference regression-replication corpus harness — drives the
reference's OWN ``tests/replications/r.*.yaml`` configs (142 configs;
the named-feature regression suite for sling's replication lifecycle)
through this engine: ``plans/replication.py`` compile + ``run_db`` /
``runner.run`` execution + the reference's hook-engine assertions
(``plans/pipeline.py`` query/check/log/store steps over live
connections and the {store.*}/{execution.*} namespaces).

Backend substitutions (documented divergences — same policy as the r12
golden-suite port in tests/suite_harness.py):

- every named warehouse connection (postgres / MSSQL / mysql / oracle /
  snowflake / ...) → its own DuckDB database FILE under the case's tmp
  dir. The reference parametrizes the corpus over live warehouses; the
  in-process DuckDB twin runs the same lifecycle SQL. Dialect-rendered
  SQL for the real engines is covered by tests/test_dialects.py.
- ``target: local`` → file target (objects resolve under the tmp dir
  via ``{env.output_dir}``-style vars the cases already use).
- hook SQL written in a warehouse dialect is normalized to DuckDB with
  the ADAPT_SQL rules below (IF OBJECT_ID→DROP IF EXISTS, DATEADD →
  interval arithmetic, NVARCHAR/DATETIME/NUMBER/VARCHAR2/NCLOB type
  spellings, backtick quoting, SELECT INTO). Each rule is a spelling
  translation, never a semantics change.
- information_schema ``data_type`` strings differ per engine; cases
  asserting postgres type names get their probe query wrapped with
  ``_GENERAL_TYPE_SQL`` (a general-type fold, the same equivalence the
  reference harness applies per-dialect in sling_test.go:870-960).
"""

from __future__ import annotations

import os
import re

import yaml

REF_REPL = "/root/reference/tests/replications"

# ---------------------------------------------------------------------------
# dialect-spelling normalization (documented divergence: spelling only)

_ADAPT_SQL = [
    # MSSQL
    (re.compile(r"IF OBJECT_ID\('([^']+)',\s*'U'\)\s+IS NOT NULL\s+"
                r"DROP TABLE \1", re.I),
     r"DROP TABLE IF EXISTS \1"),
    # sign-aware: `now() - INTERVAL 30 DAY` parses in BOTH Spark SQL
    # (the keyset filter) and DuckDB (hook SQL); `INTERVAL (-30)` in
    # neither
    (re.compile(r"DATEADD\(\s*(\w+)\s*,\s*(-?\d+)\s*,\s*GETDATE\(\)\s*\)",
                re.I),
     lambda m: (f"(now() - INTERVAL {m.group(2)[1:]} {m.group(1)})"
                if m.group(2).startswith("-")
                else f"(now() + INTERVAL {m.group(2)} {m.group(1)})")),
    (re.compile(r"\bGETDATE\(\)", re.I), "now()"),
    (re.compile(r"\bSELECT\s+\*\s+INTO\s+(\S+)\s+FROM\b", re.I),
     r"CREATE TABLE \1 AS SELECT * FROM"),
    (re.compile(r"\bNVARCHAR\b", re.I), "VARCHAR"),
    # MSSQL identity columns + identity-insert brackets (r.61)
    (re.compile(r"\bINT\s+IDENTITY\(\d+\s*,\s*\d+\)\s+PRIMARY\s+KEY", re.I),
     "INTEGER PRIMARY KEY DEFAULT nextval('serial_seq')"),
    (re.compile(r"^\s*SET\s+IDENTITY_INSERT\s+.*?(ON|OFF)\s*;?\s*$",
                re.I | re.M), "SELECT 1"),
    # MSSQL unicode string literals: N'...' -> '...' (runs before the
    # literal-masking backtick pass; the N prefix is never data)
    (re.compile(r"\bN'"), "'"),
    # postgres hex-decode -> duckdb unhex (both return the blob type)
    (re.compile(r"\bdecode\(([^;]+?),\s*'hex'\)", re.I), r"unhex(\1)"),
    (re.compile(r"\bSERIAL PRIMARY KEY\b", re.I),
     "INTEGER PRIMARY KEY DEFAULT nextval('serial_seq')"),
    (re.compile(r"\bDATETIME2?\b", re.I), "TIMESTAMP"),
    # duckdb TIME takes no precision modifier (TIME(3) -> TIME, r.46)
    (re.compile(r"\bTIME\((\d+)\)", re.I), "TIME"),
    # MSSQL money types -> their documented decimal shapes (r.69)
    (re.compile(r"\bSMALLMONEY\b", re.I), "DECIMAL(10,4)"),
    (re.compile(r"\bMONEY\b", re.I), "DECIMAL(19,4)"),
    (re.compile(r"\bVARBINARY\(MAX\)", re.I), "BLOB"),
    (re.compile(r"\bN?VARCHAR\(MAX\)", re.I), "TEXT"),
    # MSSQL 0x... binary literals -> unhex (r.112)
    (re.compile(r"\b0x([0-9A-Fa-f]{8,})\b"), r"unhex('\1')"),
    # MSSQL BIT is a boolean (duckdb BIT is a bitstring — r.82/r.83)
    (re.compile(r"\bBIT\b", re.I), "BOOLEAN"),
    (re.compile(r"\bchar_length\(", re.I), "length("),
    # Oracle (both guard shapes: WHEN OTHERS THEN NULL and the
    # SQLCODE != -942 RAISE variant; PURGE folds away)
    (re.compile(r"BEGIN\s+EXECUTE IMMEDIATE\s+'DROP TABLE ([^']+?)"
                r"(?:\s+PURGE)?';\s*EXCEPTION\s+WHEN OTHERS THEN\s+"
                r"(?:NULL;|IF SQLCODE != -942 THEN RAISE;\s*END IF;)"
                r"\s*END;?", re.I | re.S),
     r"DROP TABLE IF EXISTS \1;"),
    (re.compile(r"\bNUMBER\((\d+)\)"), r"DECIMAL(\1,0)"),
    (re.compile(r"\bNUMBER\b(?!\()"), "DECIMAL(38,9)"),
    (re.compile(r"\bNUMBER\((\d+),\s*(\d+)\)"), r"DECIMAL(\1,\2)"),
    (re.compile(r"\bVARCHAR2\b", re.I), "VARCHAR"),
    (re.compile(r"\bNCLOB\b", re.I), "TEXT"),
    # MySQL backtick identifiers — rewritten by adapt_sql with string
    # literals MASKED (r13 nit #3): a backtick inside a '...' literal
    # must survive verbatim
    ("BACKTICKS", None),
    # Postgres artifacts DuckDB lacks
    (re.compile(r"\bCASCADE\b", re.I), ""),
    # a bare COMMIT without an open txn errors on duckdb (oracle
    # sources issue these after INSERTs)
    (re.compile(r"^\s*COMMIT\s*;?\s*$", re.I), "SELECT 1"),
]

# general-type fold for information_schema.data_type probes: maps each
# engine's native spelling onto the postgres names the corpus asserts
_GENERAL_TYPE_SQL = (
    "case when lower(data_type) like 'decimal%' "
    "       or lower(data_type) in ('numeric','hugeint') then 'numeric' "
    "     when lower(data_type) in ('bigint','int64','long') then 'bigint' "
    "     when lower(data_type) in ('integer','int','int32') then 'integer' "
    "     when lower(data_type) like 'varchar%' "
    "       or lower(data_type) in ('text','string') then 'text' "
    "     when lower(data_type) like 'timestamp%' then 'timestamp' "
    "     when lower(data_type) in ('boolean','bool') then 'boolean' "
    "     when lower(data_type) = 'time' "
    "       then 'time without time zone' "
    "     when lower(data_type) in ('blob','varbinary','binary') "
    "       then 'bytea' "
    "     when lower(data_type) in ('double','float8','float64') "
    "       then 'double precision' "
    "     else lower(data_type) end as data_type")


_BACKTICK_RE = re.compile(r"`([^`]+)`")
_SQL_STR_RE = re.compile(r"'(?:[^']|'')*'")


def _rewrite_backticks(text: str) -> str:
    """Backtick→double-quote identifier rewrite that leaves backticks
    inside single-quoted SQL string literals untouched (masked rewrite,
    same shape as iceberg_views._sub_code_spans)."""
    literals: list[str] = []

    def _mask(m):
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    masked = _SQL_STR_RE.sub(_mask, text)
    masked = _BACKTICK_RE.sub(r'"\1"', masked)
    return re.sub(r"\x00(\d+)\x00",
                  lambda m: literals[int(m.group(1))], masked)


def adapt_sql(text: str) -> str:
    for rx, repl in _ADAPT_SQL:
        if rx == "BACKTICKS":
            text = _rewrite_backticks(text)
        else:
            text = rx.sub(repl, text)
    return text


def adapt_type_probe(text: str) -> str:
    """Rewrite ``select column_name, data_type from
    information_schema.columns`` probes to fold data_type onto general
    type names (what the corpus asserts against postgres)."""
    if "information_schema.columns" not in text.lower():
        return text
    # collapse a self-alias first (`data_type as data_type`) so the
    # fold's own `end as data_type` doesn't double-alias
    text = re.sub(r"\bdata_type\s+as\s+data_type\b", "data_type", text,
                  flags=re.I)
    return re.sub(r"\bdata_type\b(?!\s*\))", _GENERAL_TYPE_SQL, text,
                  count=1, flags=re.I)


# ---------------------------------------------------------------------------
# case loading + connection remapping

_DB_CONN_RE = re.compile(r"^[A-Za-z][\w]*$")


def load_case(name: str, text_adapt=None) -> dict:
    path = os.path.join(REF_REPL, name)
    with open(path) as f:
        text = f.read()
    if text_adapt:
        text = text_adapt(text)
    return yaml.safe_load(text)


class ReplicationCase:
    """One compiled-and-executable corpus case.

    ``env`` entries default the case's own env block; extra entries
    (e.g. ``output_dir``) can be injected for ``{env.*}`` rendering.
    """

    def __init__(self, spark, doc: dict, tmp: str,
                 env: dict | None = None, adapt=True):
        from sling_cli_spark.plans.pipeline import PipelineRuntime
        from sling_cli_spark.sinks.db_load import DuckDBTarget

        self.spark = spark
        self.doc = doc
        self.tmp = str(tmp)
        self.adapt = adapt
        self.env = {**(doc.get("env") or {}), **(env or {})}

        self.conns: dict[str, object] = {}
        self.conn_urls: dict[str, str] = {}

        def register(name: str | None):
            if not name or name.lower() in ("local",) \
                    or "/" in name or "{" in name:
                # path-ish / env-templated targets are FILE targets
                return None
            key = name.lower()
            if key not in self.conn_urls:
                if key == "sqlite":
                    # a SQLITE conn runs on the REAL embedded sqlite
                    # (r.71) — not the duckdb twin
                    from sling_cli_spark.sinks.db_load import SQLiteTarget

                    path = os.path.join(self.tmp, f"{key}_twin.db")
                    self.conn_urls[key] = f"sqlite://{path}"
                    self.conns[key] = SQLiteTarget(path)
                    return self.conn_urls[key]
                # `_twin` suffix: the duckdb CATALOG takes the file's
                # basename, which must not collide with schema names
                # the cases use (e.g. a `mysql` schema on conn `mysql`)
                path = os.path.join(self.tmp, f"{key}_twin.duckdb")
                self.conn_urls[key] = f"duckdb://{path}"
                self.conns[key] = DuckDBTarget(path)
            return self.conn_urls[key]

        self.source_name = doc.get("source") or ""
        self.target_name = doc.get("target") or ""
        self.source_url = register(self.source_name)
        self.target_url = register(self.target_name)
        # hook-level connections (e.g. `connection: duckdb`)
        for stage in (doc.get("hooks") or {}).values():
            for step in stage or []:
                c = step.get("connection")
                if isinstance(c, str) and _DB_CONN_RE.match(c):
                    register(c)

        registry = dict(self.conns)
        for key, url in self.conn_urls.items():
            registry[url] = self.conns[key]
        # {source.name}/{target.name} render to the original names
        self.rt = PipelineRuntime(
            connections=registry,
            state={"execution": {"status": {"error": 0, "success": 0}},
                   "source": {"name": self.source_name},
                   "target": {"name": self.target_name}},
            env=self.env)

    # -- pieces ----------------------------------------------------------

    def _steps(self, stage: str) -> list[dict]:
        steps = (self.doc.get("hooks") or {}).get(stage) or []
        if not self.adapt:
            return steps
        return self._adapt_steps(steps)

    def _adapt_steps(self, steps: list[dict]) -> list[dict]:
        out = []
        for step in steps:
            step = dict(step)
            if step.get("type") == "query" and step.get("query"):
                q = adapt_sql(str(step["query"]))
                if step.get("into"):
                    q = adapt_type_probe(q)
                step["query"] = q
            if step.get("type") == "command":
                # shell helpers (mkdir) run as-is; anything else skips
                cmd = step.get("command")
                if isinstance(cmd, str):
                    step["command"] = ["bash", "-c", cmd]
            if step.pop("continue_on_error", None):
                # the corpus's per-step flag maps onto this engine's
                # on_failure: continue (same semantics: record, go on)
                step.setdefault("on_failure", "continue")
            out.append(step)
        return out

    def _ensure_schemas(self):
        """Pre-create every schema the case references (the reference's
        live warehouses have them provisioned)."""
        schemas = set(re.findall(
            r"\b(?:TABLE|EXISTS|INTO|FROM|into)\s+(\w+)\.\w+",
            yaml.safe_dump(self.doc)))
        schemas |= {"public", "dbo", "main"}
        for db in self.conns.values():
            try:
                db.execute("create sequence if not exists serial_seq")
            except Exception:
                pass  # sqlite twins have no sequences
            for s in schemas - {"main", "temp", "information_schema"}:
                try:
                    # lowercase: duckdb stores the creation-time case in
                    # information_schema, and the corpus's probes match
                    # lowercase names
                    db.execute(
                        f'create schema if not exists "{s.lower()}"')
                except Exception:
                    pass

    def _qualify(self, stream: str) -> str:
        """The reference resolves unqualified table streams against the
        connection's default schema (env.yaml ``schema:``; postgres =
        public, mssql = dbo). The DuckDB twin's default is main, so an
        unqualified name that lives in another schema is qualified from
        the live catalog — spelling resolution, not semantics."""
        if ("." in stream or "/" in stream or " " in stream
                or not self.source_url):
            return stream
        db = self.conns.get(self.source_name.lower())
        if db is None:
            return stream
        try:
            rows = db.fetch_all(
                "select table_schema from information_schema.tables "
                f"where table_name = '{stream}'")
        except Exception:
            return stream
        schemas = [r[0] for r in rows]
        if schemas and "main" not in schemas:
            return f"{schemas[0]}.{stream}"
        return stream

    def replication_config(self):
        from sling_cli_spark.expressions import Evaluator
        from sling_cli_spark.plans.replication import ReplicationConfig

        d = dict(self.doc)
        # `{env.*}` spans in streams/defaults render against the case
        # env (the reference renders the whole payload; from_yaml does
        # the same — the harness builds the config directly)
        # env keys render BOTH prefixed ({env.x}) and bare ({x}) — the
        # reference exposes replication env vars as bare spans too
        ev = Evaluator(state={"env": dict(self.env), **self.env},
                       keep_missing=True, allow_no_prefix=True)
        d = {"streams": ev.render(d.get("streams") or {}),
             "defaults": ev.render(d.get("defaults") or {})}
        streams = {}
        for k, v in (d.get("streams") or {}).items():
            k = self._qualify(str(ev.render(str(k))))
            if ("/" in k and not k.startswith(("/", "file://"))
                    and os.path.exists(os.path.join("/root/reference", k))):
                # corpus file streams are relative to the reference repo
                k = os.path.join("/root/reference", k)
            v = dict(v or {})
            if self.adapt:
                if v.get("hooks"):
                    # STREAM-level hooks get the same dialect-spelling
                    # pass as replication-level ones (r.61 pre_merge)
                    v["hooks"] = {
                        stage: self._adapt_steps(list(hs or []))
                        for stage, hs in v["hooks"].items()}
                if v.get("sql"):
                    v["sql"] = adapt_sql(str(v["sql"]))
                dm = (v.get("target_options") or {}).get("delete_missing")
                if isinstance(dm, dict):
                    dm = {kk: (adapt_sql(vv) if isinstance(vv, str) else vv)
                          for kk, vv in dm.items()}
                    v["target_options"] = {**v["target_options"],
                                           "delete_missing": dm}
            if not self.target_url:
                # sling semantics: an extension-named object on a file
                # target is ONE file; this engine's layout switch is the
                # `single` target option
                obj = str(v.get("object") or "")
                if re.search(r"\.(csv|tsv|json|jsonl|ndjson|parquet|xlsx)$",
                             obj):
                    to = dict(v.get("target_options") or {})
                    to.setdefault("single", True)
                    v["target_options"] = to
            streams[k] = v
        defaults = dict(d.get("defaults") or {})
        rc = ReplicationConfig(
            source=self.source_url or None,
            target=self.target_url or None,
            defaults=defaults,
            streams=streams,
            env={str(k): str(v) for k, v in self.env.items()},
            hooks={},  # hooks run through self.run_hooks with the registry
        )
        return rc

    def run_hooks(self, stage: str) -> None:
        from sling_cli_spark.plans.pipeline import run_pipeline

        steps = self._steps(stage)
        if steps:
            run_pipeline(self.spark, steps, env=self.rt.env,
                         runtime=self.rt)

    def run_streams(self) -> dict:
        from sling_cli_spark.plans.replication import run_replication

        rc = self.replication_config()
        return run_replication(
            self.spark, rc, base_output=self.tmp,
            runtime=self.rt, continue_on_error=True)

    # -- the whole lifecycle ----------------------------------------------

    def run(self) -> dict:
        """start hooks → streams → end hooks. Check steps raise
        ``CheckFailed`` on violation — that IS the assertion. Returns
        {stream: TaskResult|None}."""
        self._ensure_schemas()
        self.run_hooks("start")
        results = self.run_streams()
        self.run_hooks("end")
        return results

    @property
    def errors(self) -> int:
        return self.rt.state_extra["execution"]["status"]["error"]

    def close(self):
        for db in self.conns.values():
            try:
                db.close()
            except Exception:
                pass


def run_case(spark, name: str, tmp, env: dict | None = None,
             text_adapt=None) -> ReplicationCase:
    doc = load_case(name, text_adapt=text_adapt)
    case = ReplicationCase(spark, doc, tmp, env=env)
    try:
        case.run()
    finally:
        case.close()
    return case


# ---------------------------------------------------------------------------
# pipeline corpus (tests/pipelines/p.*.yaml) — same substitution policy

REF_PIPE = "/root/reference/tests/pipelines"


class PipelineCase:
    """One reference pipeline config driven through
    ``plans/pipeline.run_pipeline`` with live DuckDB twins for every
    named connection and ``aws_s3/``-style cloud prefixes remapped under
    the case tmp dir (documented divergence: cloud filesystems are
    environmental; the step semantics are what the corpus pins)."""

    def __init__(self, spark, name: str, tmp, env: dict | None = None,
                 text_adapt=None):
        from sling_cli_spark.plans.pipeline import PipelineRuntime
        from sling_cli_spark.sinks.db_load import DuckDBTarget

        self.spark = spark
        self.tmp = str(tmp)
        path = os.path.join(REF_PIPE, name)
        with open(path) as f:
            text = f.read()
        # `{env.X}` conn-name spans render from the case's own env
        # block BEFORE the conn scan (p.14/p.17: `connection:
        # '{env.SOURCE}'` must register the named twin)
        try:
            _pre = yaml.safe_load(text) or {}
        except Exception:
            _pre = {}
        for _k, _v in {**(_pre.get("env") or {}), **(env or {})}.items():
            text = text.replace("{env.%s}" % _k, str(_v))
        # cloud conn prefixes -> local dirs under tmp
        for cloud in ("aws_s3", "azure_storage", "sftp"):
            text = text.replace(f"{cloud}/", f"local/{self.tmp}/{cloud}/")
        # reference-repo-relative fixture paths
        text = text.replace("file://tests/", "file:///root/reference/tests/")
        if text_adapt:
            text = text_adapt(text)
        doc = yaml.safe_load(text)
        self.doc = doc
        self.env = {**{str(k): str(v)
                       for k, v in (doc.get("env") or {}).items()},
                    **(env or {})}

        # connection registry: every `connection:` name + inline
        # replication source/target names -> DuckDB twins
        names = set()

        def scan(v):
            if isinstance(v, dict):
                c = v.get("connection")
                if isinstance(c, str) and _DB_CONN_RE.match(c):
                    names.add(c.lower())
                r = v.get("replication")
                if isinstance(r, dict):
                    for key in ("source", "target"):
                        n = r.get(key)
                        if isinstance(n, str) and _DB_CONN_RE.match(n) \
                                and n.lower() != "local":
                            names.add(n.lower())
                for x in v.values():
                    scan(x)
            elif isinstance(v, list):
                for x in v:
                    scan(x)

        scan(doc)
        self.conns, conn_urls = {}, {}
        for n in names:
            p = os.path.join(self.tmp, f"{n}_twin.duckdb")
            self.conns[n] = DuckDBTarget(p)
            conn_urls[n] = f"duckdb://{p}"
        registry = dict(self.conns)
        for n, url in conn_urls.items():
            registry[url] = self.conns[n]
        self.rt = PipelineRuntime(
            connections=registry, conn_urls=conn_urls,
            state={"execution": {"status": {"error": 0, "success": 0}}},
            env=self.env)

    def steps(self) -> list[dict]:
        def adapt_step(step: dict) -> dict:
            step = dict(step)
            if step.get("query"):
                q = adapt_sql(str(step["query"]))
                if step.get("into") or step.get("id"):
                    q = adapt_type_probe(q)
                step["query"] = q
            if isinstance(step.get("steps"), list):
                # group/routine bodies get the same dialect pass (p.10)
                step["steps"] = [adapt_step(s) for s in step["steps"]]
            return step

        return [adapt_step(s) for s in self.doc.get("steps") or []]

    def run(self):
        from sling_cli_spark.plans.pipeline import run_pipeline

        # the corpus schemas (public/dbo/...) are provisioned in CI
        schemas = {"public", "dbo", "demo", "system", "oracle",
                   "mysql", "mariadb", "starrocks"}
        schemas |= {s.lower() for s in re.findall(
            r"\b(?:TABLE|EXISTS|INTO|FROM)\s+(\w+)\.\w+",
            yaml.safe_dump(self.doc))}
        for db in self.conns.values():
            db.execute("create sequence if not exists serial_seq")
            for s in schemas - {"main", "temp", "information_schema"}:
                try:
                    db.execute(f'create schema if not exists "{s}"')
                except Exception:
                    pass
        return run_pipeline(self.spark, self.steps(), env=self.env,
                            runtime=self.rt)

    def close(self):
        for db in self.conns.values():
            try:
                db.close()
            except Exception:
                pass


def run_pipeline_case(spark, name: str, tmp, env: dict | None = None,
                      text_adapt=None) -> PipelineCase:
    case = PipelineCase(spark, name, tmp, env=env, text_adapt=text_adapt)
    try:
        case.run()
    finally:
        case.close()
    return case
