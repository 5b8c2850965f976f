"""Pipeline steps & hooks.

Reference surface: ``core/sling/hooks.go:11-137`` (hook kinds: query,
http, copy, delete, log, inspect, command, replication, check) and
``core/sling/pipeline.go:18-123`` (step list + retry/on_failure/id).
The execution engine there is closed-source; the observable contract is
the YAML surface plus ordering/retry semantics, re-expressed here as
plain Python steps around Spark actions.

    steps:
      - type: log
        message: "starting {stream}"
      - type: query
        sql: "SELECT count(*) FROM t"
      - type: copy
        from: /tmp/a.parquet
        to: /tmp/b.parquet
      - type: replication
        path: repl.yaml
      - type: check
        expr: "rows > 0"
        vars: {rows: 1}
      - type: delete
        path: /tmp/stale
    on_failure: abort | continue
    retries: 2
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any

from sling_cli_spark.config import render_vars

log = logging.getLogger("sling_cli_spark.pipeline")


class StepError(RuntimeError):
    pass


class CheckFailed(StepError):
    """A ``check`` step's expression evaluated false."""


class PipelineRuntime:
    """Shared state for one pipeline run — the reference's hook-engine
    namespaces (hooks.go): ``store`` (values set by ``into:`` /
    ``type: store``), ``execution`` (run status the caller injects),
    ``source``/``target`` (connection descriptors), plus the live
    connection registry used by ``type: query`` steps with a
    ``connection:`` key.

    ``connections`` maps lower-cased connection names (or URLs) to
    objects exposing ``execute(sql)`` / ``fetch_dicts(sql)``. An
    unknown name resolves to a scratch in-memory DuckDB (the
    reference resolves from env.yaml; tests inject live twins).
    """

    def __init__(self, connections=None, state=None, env=None,
                 conn_urls=None):
        self.connections = {}
        for k, v in (connections or {}).items():
            self.connections[str(k)] = v
            self.connections[str(k).lower()] = v
        # name -> duckdb:// URL, for rewriting conn NAMES inside inline
        # replication configs to live twins
        self.conn_urls = {str(k).lower(): v
                          for k, v in (conn_urls or {}).items()}
        self.store: dict[str, Any] = {}
        self.state_extra = dict(state or {})
        self.env = dict(env or {})
        self.broke = False          # a check with on_failure: break fired
        self.evaluator = None       # set by run_pipeline
        self._scratch = None
        # v2 (pipeline corpus): shared typed state across nested groups/
        # routines, the {loop.*} namespace, warn counting for status
        # propagation, and deferred failures (on_failure: defer)
        self.state_ns: dict[str, Any] = {}
        self.loop_ns: dict[str, Any] = {}
        self.warn_count = 0
        self.deferred: list[str] = []
        self._routines: dict | None = None

    def routines(self) -> dict:
        """Named step groups from $SLING_ROUTINES_DIR/routines.yaml
        (reference: routine hooks; tests/pipelines/routines.yaml is the
        executable spec)."""
        if self._routines is None:
            import yaml as _yaml

            d = self.env.get("SLING_ROUTINES_DIR") \
                or os.environ.get("SLING_ROUTINES_DIR") or ""
            path = os.path.join(d, "routines.yaml")
            if d and os.path.exists(path):
                with open(path) as f:
                    self._routines = (_yaml.safe_load(f) or {}) \
                        .get("routines") or {}
            else:
                self._routines = {}
        return self._routines

    def resolve_conn(self, name: str):
        name = str(name or "")
        key = name if name in self.connections else name.lower()
        if key in self.connections:
            return self.connections[key]
        if self._scratch is None:
            from sling_cli_spark.sinks.db_load import DuckDBTarget

            self._scratch = DuckDBTarget()
        return self._scratch


def _step_log(spark, step, ctx, rt=None):
    msg = render_vars(str(step.get("message", "")), ctx)
    log.info(msg)
    return msg


def _generate_data_sql(params: dict) -> str:
    """The reference's ``operation: generate_data`` query op
    (database/transaction.go:754-890): a table of synthetic rows from a
    {name: general_type} map, columns SORTED alphabetically, per-type
    fake values. Deterministic here (seeded by row index) — the corpus
    only asserts counts/NULL handling, never the fake values."""
    table = str(params.get("table") or "")
    n = int(params.get("rows") or 100)
    cols = dict(params.get("columns") or {})
    if not table or not cols:
        raise ValueError("generate_data: 'table' and 'columns' required")
    names = sorted(cols)
    ddl_types = {
        "bigint": "BIGINT", "integer": "INTEGER", "smallint": "SMALLINT",
        "decimal": "DECIMAL(24,9)", "float": "DOUBLE", "bool": "BOOLEAN",
        "boolean": "BOOLEAN", "date": "DATE", "datetime": "TIMESTAMP",
        "timestamp": "TIMESTAMP", "timestampz": "TIMESTAMPTZ",
        "string": "VARCHAR", "text": "VARCHAR", "json": "JSON",
        "uuid": "UUID", "binary": "BLOB", "time": "TIME",
    }

    def val(t: str, i: int) -> str:
        t = str(t).lower()
        if t == "bigint":
            return str(1000000 + i * 9973)
        if t == "integer":
            return str(1 + i * 37 % 1000000)
        if t == "smallint":
            return str(1 + i % 32767)
        if t in ("decimal", "float"):
            return f"{(i * 117.13) % 10000:.2f}"
        if t in ("bool", "boolean"):
            return "true" if i % 2 else "false"
        if t == "date":
            return f"DATE '2024-01-01' + INTERVAL {i % 365} DAY"
        if t in ("datetime", "timestamp", "timestampz"):
            return (f"TIMESTAMP '2024-01-01 00:00:00' "
                    f"+ INTERVAL {i % 86400} SECOND")
        if t == "time":
            return f"TIME '00:00:00' + INTERVAL {i % 86400} SECOND"
        if t == "uuid":
            return f"'00000000-0000-4000-8000-{i:012d}'"
        if t == "json":
            return f"""'{{"id": {i}, "name": "row {i}"}}'"""
        if t == "text":
            return f"'lorem ipsum row {i},\twith text'"
        return f"'value {i}'"

    col_defs = ", ".join(
        f'"{c}" {ddl_types.get(str(cols[c]).lower(), "VARCHAR")}'
        for c in names)
    rows_sql = ",\n".join(
        "(" + ", ".join(val(cols[c], i) for c in names) + ")"
        for i in range(n))
    return (f"CREATE OR REPLACE TABLE {table} ({col_defs});\n"
            f"INSERT INTO {table} (" +
            ", ".join(f'"{c}"' for c in names) +
            f") VALUES\n{rows_sql}")


def _step_query(spark, step, ctx, rt=None):
    if step.get("operation") == "generate_data" and rt is not None:
        db = rt.resolve_conn(step["connection"])
        from sling_cli_spark.dialects import parse_sql_multi_statements

        for s in parse_sql_multi_statements(
                _generate_data_sql(step.get("params") or {})):
            if s.strip():
                db.execute(s)
        return None
    if step.get("connection") is not None and rt is not None:
        # reference hook kind `query` with a named connection
        # (hooks.go; tests/replications/r.*.yaml): run the (possibly
        # multi-statement) SQL on that connection; `into:` captures the
        # LAST statement's rows into {store.<name>}
        from sling_cli_spark.dialects import parse_sql_multi_statements

        db = rt.resolve_conn(step["connection"])
        sql = render_vars(str(step.get("query") or step.get("sql")), ctx)
        stmts = [s for s in parse_sql_multi_statements(sql) if s.strip()]
        rows = None
        for i, s in enumerate(stmts):
            if step.get("into") and i == len(stmts) - 1:
                rows = _fetch_dicts(db, s)
            else:
                db.execute(s)
        if step.get("into") is not None:
            rt.store[str(step["into"])] = rows
        return rows
    df = spark.sql(render_vars(step["sql"], ctx))
    if step.get("into"):
        df.createOrReplaceTempView(step["into"])
        return step["into"]
    # small result by contract (hooks run scalar checks); collect is the point
    return [r.asDict() for r in df.limit(int(step.get("limit", 100))).collect()]


def _fetch_dicts(db, sql: str) -> list[dict]:
    """Rows as dicts with the connection's own column names (what the
    reference's store records carry)."""
    if hasattr(db, "fetch_dicts"):
        return db.fetch_dicts(sql)
    cur = db.con.execute(sql)
    names = [d[0] for d in cur.description or []]
    return [dict(zip(names, r)) for r in cur.fetchall()]


def _step_store(spark, step, ctx, rt=None):
    """`type: store` (reference hooks.go kind ``store``): stash a value
    under {store.<key>} for later steps / stream-SQL rendering. The
    ``map:`` form sets several keys at once; ``env.X`` keys write into
    the runtime env (p.17 defines connections that way)."""
    if rt is None:
        return step.get("value")
    if isinstance(step.get("map"), dict):
        for k, v in step["map"].items():
            k = str(k)
            if k.startswith("env."):
                rt.env[k[4:]] = v
            else:
                rt.store[k] = v
        return dict(step["map"])
    rt.store[str(step["key"])] = step.get("value")
    return step.get("value")


def _step_read(spark, step, ctx, rt=None):
    """read hook: file contents into {store.<into>} (p.07/p.33)."""
    frm = render_vars(str(step["from"]), ctx).removeprefix("local/")
    with open(frm) as f:
        body = f.read()
    if rt is not None and step.get("into"):
        rt.store[str(step["into"])] = body
    return body


def _step_copy(spark, step, ctx, rt=None):
    # `local/<path>` connection prefix = local filesystem (hooks.go)
    src = render_vars(step["from"], ctx).removeprefix("local/")
    dst = render_vars(step["to"], ctx).removeprefix("local/")
    if os.path.isdir(src):
        shutil.copytree(src, dst, dirs_exist_ok=True)
    else:
        os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
        shutil.copy2(src, dst)
    return dst


def _step_delete(spark, step, ctx, rt=None):
    p = render_vars(str(step.get("path") or step.get("location")), ctx)
    p = p.removeprefix("local/")
    if os.path.isdir(p):
        shutil.rmtree(p, ignore_errors=True)
    elif os.path.exists(p):
        os.unlink(p)
    return p


def _step_inspect(spark, step, ctx, rt=None):
    """inspect hook: `location: <conn>/<table>` probes a DB table's
    catalog (exists/schema/columns incl. precision+scale/column_map/
    fdqn); `local/<path>` (or a bare path) stats a file. Executable
    spec: tests/pipelines/p.04.test_inspect_hook.yaml."""
    loc = render_vars(str(step.get("location") or step.get("path")), ctx)
    conn, _, rest = loc.partition("/")
    if rt is not None and conn and conn.lower() in rt.connections \
            and conn.lower() not in ("local",):
        return _inspect_db(rt.resolve_conn(conn), rest)
    if conn.lower() == "local":
        p = rest
        exists = os.path.exists(p)
        out = {"exists": exists, "path": p, "uri": f"file://{p}",
               "name": os.path.basename(p.rstrip("/")),
               "size": os.path.getsize(p) if os.path.isfile(p) else 0,
               "is_dir": os.path.isdir(p)}
        if os.path.isdir(p):
            files = dirs = total = 0
            if step.get("recursive"):
                for root, ds, fs in os.walk(p):
                    dirs += len(ds)
                    files += len(fs)
                    total += sum(os.path.getsize(os.path.join(root, f))
                                 for f in fs)
            else:
                for child in os.listdir(p):
                    cp = os.path.join(p, child)
                    if os.path.isdir(cp):
                        dirs += 1
                    else:
                        files += 1
                        total += os.path.getsize(cp)
            out.update({"size": total, "file_count": files,
                        "folder_count": dirs,
                        "node_count": files + dirs})
        return out
    p = loc
    from sling_cli_spark.sources.files import list_file_nodes

    nodes = list_file_nodes(spark, p).collect()
    return {"exists": bool(nodes), "files": len(nodes),
            "bytes": sum(r["size"] for r in nodes)}


def _inspect_db(db, table: str) -> dict:
    from sling_cli_spark.dialects import parse_table_name

    p = parse_table_name(table, db.dialect.name)
    schema = p["schema"] or "main"
    exists = db.table_exists(table)
    cols = []
    if exists:
        rows = db.fetch_all(
            "select column_name, data_type, numeric_precision, "
            "numeric_scale from information_schema.columns "
            f"where table_schema = '{schema}' "
            f"and table_name = '{p['name']}' order by ordinal_position")
        cols = [{"name": r[0], "type": str(r[1]).lower(),
                 "precision": r[2], "scale": r[3]} for r in rows]
    return {"exists": exists, "database": "", "schema": schema,
            "name": p["name"],
            "fdqn": db.dialect.quote_table(table),
            "columns": cols,
            "column_map": {c["name"]: c for c in cols}}


def _step_check(spark, step, ctx, rt=None):
    if "check" in step and rt is not None:
        # reference check kind (hooks.go; suite/replication yamls):
        # the expression runs through the Evaluator's goval-style
        # language over {env, state, store, execution, ...} — e.g.
        # `int_parse(store.cnt[0].n) == 3`, `execution.status.error != 0`
        rt.evaluator.fill_missing_keys(
            rt.evaluator.state,
            rt.evaluator.extract_vars(str(step["check"])))
        ok = bool(rt.evaluator.evaluate(str(step["check"])))
        if not ok:
            msg = step.get("failure_message") or step.get("message") \
                or step["check"]
            raise CheckFailed(f"check failed: {msg}")
        return True
    vars_ = {**ctx, **{k: v for k, v in (step.get("vars") or {}).items()}}
    # evaluate via Spark SQL on a literal row — same expression language
    # as everywhere else, no Python eval
    cols = ", ".join(
        f"{_sql_lit(v)} AS `{k}`" for k, v in vars_.items()) or "1 AS __one"
    ok = spark.sql(
        f"SELECT ({step['expr']}) AS ok FROM (SELECT {cols})"
    ).collect()[0]["ok"]
    if not ok:
        raise StepError(f"check failed: {step['expr']!r}")
    return True


def _sql_lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _step_http(spark, step, ctx, rt=None):
    """http hook (reference hooks.go kind ``http``): one request, the
    JSON/status lands in step state. ``transport`` is injectable via the
    step dict for tests; the default uses the api source's urllib
    transport."""
    from sling_cli_spark.sources.api import _default_transport

    transport = step.get("transport") or _default_transport
    url = render_vars(step["url"], ctx)
    status, body = transport(url, step.get("params") or {},
                             step.get("headers") or {})
    ok_codes = step.get("expect_status") or range(200, 300)
    if status not in ok_codes:
        raise StepError(f"http step got {status} from {url}")
    if step.get("write_to"):
        import json as _json

        to = render_vars(str(step["write_to"]), ctx).removeprefix("local/")
        os.makedirs(os.path.dirname(os.path.abspath(to)), exist_ok=True)
        with open(to, "w") as f:
            f.write(body if isinstance(body, str) else _json.dumps(body))
    return {"status": status, "json": body}


def _step_list(spark, step, ctx, rt=None):
    """list hook (reference hooks.go kind ``list``): file listing at a
    location; ``only: files`` filters directories out. The reference's
    `local/` connection prefix maps to the local filesystem."""
    import glob as _glob

    loc = render_vars(str(step.get("location") or step.get("path")), ctx)
    loc = loc.removeprefix("local/")
    if os.path.isdir(loc):
        paths = sorted(_glob.glob(os.path.join(loc, "*")))
    else:
        paths = sorted(_glob.glob(loc))
    if step.get("only") == "files":
        paths = [p for p in paths if os.path.isfile(p)]
    # the reference's list-hook state shape: {state.<id>.result} with
    # RICH entries — p.02/p.03 loop over {loop.value.location}/.name
    entries = [{
        "location": p, "path": p, "name": os.path.basename(p),
        "size": os.path.getsize(p) if os.path.isfile(p) else 0,
        "type": "file" if os.path.isfile(p) else "directory",
    } for p in paths]
    return {"result": entries, "count": len(entries),
            "paths": paths}


def _step_write(spark, step, ctx, rt=None):
    """write hook (reference hooks.go kind ``write``): write literal
    content to a file; `local/` prefix = local filesystem."""
    to = render_vars(str(step["to"]), ctx).removeprefix("local/")
    os.makedirs(os.path.dirname(os.path.abspath(to)), exist_ok=True)
    with open(to, "w") as f:
        f.write(str(step.get("content", "")))
    return to


def _step_command(spark, step, ctx, rt=None):
    """command hook (reference hooks.go kind ``command``): run a local
    process, capture output. Commands come from the user's own pipeline
    YAML — same trust model as the reference. A string command runs
    through the shell (the corpus's `command: rm -rf ...` form)."""
    import subprocess

    raw = step["command"]
    if isinstance(raw, str):
        raw = ["bash", "-c", raw]
    cmd = [render_vars(str(c), ctx) for c in raw]
    proc = subprocess.run(
        cmd, capture_output=True, text=True,
        timeout=int(step.get("timeout", 300)), check=False)
    if proc.returncode != 0 and not step.get("ignore_error"):
        raise StepError(
            f"command {cmd!r} exited {proc.returncode}: {proc.stderr[:500]}")
    if step.get("print"):
        # output routes through the LOGGER, never raw stdout — so log
        # sinks capture it (p.42.command_print_log_sink contract)
        for line in proc.stdout.splitlines():
            log.info(line)
        for line in proc.stderr.splitlines():
            log.info(line)
    capture = step.get("capture", True)
    return {"returncode": proc.returncode,
            "stdout": proc.stdout.strip() if capture else "",
            "output": {"stdout": proc.stdout if capture else "",
                       "stderr": proc.stderr if capture else ""}}


def _step_replication(spark, step, ctx, rt=None):
    """replication hook: `path:` (or shorthand `replication: <path>`)
    loads a YAML file; `replication: {inline dict}` runs an embedded
    config (p.01/p.12 shapes). A step-level `env:` overlays the
    replication env."""
    import yaml as _yaml

    from sling_cli_spark.plans.replication import (
        ReplicationConfig, run_replication)

    conf = step.get("replication") if "path" not in step else None
    if isinstance(conf, dict):
        # sort_keys=False: safe_dump alphabetizes mappings by default,
        # which would corrupt declaration-order-sensitive blocks
        # (`columns:` drives @columns expansion ORDER — the
        # api_select_columns case-9 contract)
        rc = ReplicationConfig.from_yaml(
            _yaml.safe_dump(conf, sort_keys=False))
    else:
        path = str(step.get("path") or conf or "")
        path = render_vars(path, ctx).removeprefix("file://")
        rc = ReplicationConfig.from_yaml(path)
    if step.get("env"):
        rc.env = {**rc.env, **{str(k): str(v)
                               for k, v in step["env"].items()}}
    if rt is not None:
        rc.env = {**{k: str(v) for k, v in rt.env.items()}, **rc.env}
        # conn NAMES referenced by inline configs resolve to the
        # runtime's live twins — unless the env DEFINES them as local
        # base-path connections (run_replication resolves those)
        from sling_cli_spark.plans.replication import _local_conn_base

        if rc.source and rc.source.lower() in rt.conn_urls \
                and not _local_conn_base(rc.source, rc.env):
            rc.source = rt.conn_urls[rc.source.lower()]
        if rc.target and rc.target.lower() in rt.conn_urls \
                and not _local_conn_base(rc.target, rc.env):
            rc.target = rt.conn_urls[rc.target.lower()]
    out = run_replication(
        spark, rc, step.get("base_output", ""),
        connections=(rt.connections if rt is not None else None),
        runtime=rt if rt is not None else None)
    return {k: (r.rows if r else None) for k, r in out.items()}


def _step_group(spark, step, ctx, rt=None):
    """group hook: nested step list, optional `loop:` (a literal list or
    a state expression) exposing {loop.value}/{loop.index}. A group
    whose substep WARNED reports status "warning"; substep failures
    with on_failure: defer run every remaining step/iteration and raise
    once at group end (p.35/p.38 contracts)."""
    steps = step.get("steps") or []
    loop = step.get("loop")
    if isinstance(loop, str) and rt is not None:
        rt.evaluator.fill_missing_keys(
            rt.evaluator.state, rt.evaluator.extract_vars(loop))
        loop = rt.evaluator.evaluate(loop)
    iters = loop if isinstance(loop, list) else [None]
    has_loop = isinstance(loop, list)
    warn_before = rt.warn_count if rt else 0
    defer_before = len(rt.deferred) if rt else 0
    prev_loop = dict(rt.loop_ns) if rt else {}
    concurrency = int(step.get("concurrency", 1))
    try:
        if concurrency > 1 and has_loop and rt is not None:
            # parallel iterations (p.36.group_concurrency): each gets
            # its OWN loop namespace + evaluator view; store/state/
            # connections stay shared (dict writes are GIL-atomic, and
            # Spark driver calls are thread-safe)
            import copy as _copy
            from concurrent.futures import ThreadPoolExecutor

            def run_iter(pair):
                idx, val = pair
                sub = _copy.copy(rt)
                sub.loop_ns = {"value": val, "index": idx}
                run_pipeline(spark, steps, env=rt.env, runtime=sub,
                             _nested=True)
                rt.warn_count = max(rt.warn_count, sub.warn_count)

            with ThreadPoolExecutor(max_workers=concurrency) as ex:
                list(ex.map(run_iter, list(enumerate(iters))))
        else:
            for idx, val in enumerate(iters):
                if has_loop and rt is not None:
                    rt.loop_ns.clear()
                    rt.loop_ns.update({"value": val, "index": idx})
                run_pipeline(spark, steps, env=rt.env if rt else None,
                             runtime=rt, _nested=True)
    finally:
        if rt is not None:
            rt.loop_ns.clear()
            rt.loop_ns.update(prev_loop)
    if rt is not None and len(rt.deferred) > defer_before:
        msgs = rt.deferred[defer_before:]
        del rt.deferred[defer_before:]
        raise StepError("deferred failure(s): " + "; ".join(msgs))
    warned = rt is not None and rt.warn_count > warn_before
    return {"status": "warning" if warned else "success"}


def _step_routine(spark, step, ctx, rt=None):
    """routine hook: a named reusable step group from
    $SLING_ROUTINES_DIR/routines.yaml with a {params.*} namespace
    (p.37; tests/pipelines/routines.yaml is the executable spec)."""
    if rt is None:
        raise StepError("routine steps need a PipelineRuntime")
    name = str(step.get("routine") or step.get("name"))
    routines = rt.routines()
    if name not in routines:
        raise StepError(f"unknown routine: {name!r}")
    warn_before = rt.warn_count
    prev = rt.state_extra.get("params")
    rt.state_extra["params"] = step.get("params") or {}
    try:
        run_pipeline(spark, routines[name], env=rt.env, runtime=rt,
                     _nested=True)
    finally:
        if prev is None:
            rt.state_extra.pop("params", None)
        else:
            rt.state_extra["params"] = prev
    return {"status": "warning" if rt.warn_count > warn_before
            else "success"}


_STEP_TYPES = {
    "log": _step_log,
    "store": _step_store,
    "query": _step_query,
    "copy": _step_copy,
    "delete": _step_delete,
    "inspect": _step_inspect,
    "check": _step_check,
    "http": _step_http,
    "command": _step_command,
    "list": _step_list,
    "write": _step_write,
    "replication": _step_replication,
    "group": _step_group,
    "routine": _step_routine,
    "read": _step_read,
}


def _normalize_step(step: dict) -> dict:
    """Accept the reference's SHORTHAND step forms (hooks.go unmarshal:
    the kind may BE the key) — ``- check: expr``, ``- log: msg``,
    ``- query: sql`` normalize to the explicit ``type:`` form."""
    if step.get("type"):
        return step
    for kind in ("check", "log", "query", "store", "copy", "delete",
                 "inspect", "http", "command", "replication", "list",
                 "write", "routine", "group", "read"):
        if kind in step:
            step = {**step, "type": kind}
            if kind == "log" and isinstance(step.get("log"), str):
                step["message"] = step.pop("log")
            return step
    return step


def load_pipeline(text_or_path: str) -> list[dict[str, Any]]:
    """Pipeline YAML -> step list (reference: tests/pipelines/*.yaml —
    top-level ``steps:`` plus optional ``env:``)."""
    import yaml

    text = text_or_path
    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            text = f.read()
    from sling_cli_spark.config import render_env

    d = render_env(yaml.safe_load(text))
    if isinstance(d, list):
        return d
    return d.get("steps") or []


def _fill_step_vars(evaluator, payload: Any) -> None:
    """FillMissingKeys over every expression span in the step payload
    (reference: transforms.go RenderAny runs ExtractVars + FillMissingKeys
    when KeepMissingExpr is off) — missing env/state refs become nil
    leaves so functions like coalesce see them instead of erroring."""
    from sling_cli_spark.expressions import find_matches

    def walk(v: Any) -> None:
        if isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, (list, tuple)):
            for x in v:
                walk(x)
        elif isinstance(v, str):
            for expr in find_matches(v):
                evaluator.fill_missing_keys(
                    evaluator.state, evaluator.extract_vars(expr))

    walk(payload)


def _state_entry(kind: str, step: dict, out: Any) -> Any:
    """The reference's per-step state shapes (routines.yaml /
    p.35/p.42 contracts): connection queries expose {state.<id>.result},
    logs {state.<id>.message}; dict results (command/inspect/list/group/
    routine/http) pass through; the legacy Spark-SQL query form keeps
    its raw value for existing templates."""
    if kind == "query" and step.get("connection") is not None:
        # reference step metadata: {state.<id>.status} renders even for
        # into-steps (r.116 asserts it inside stream SQL)
        return {"result": out, "status": "success"}
    if kind == "log":
        return {"message": out}
    return out


def run_pipeline(
    spark, steps: list[dict[str, Any]], env: dict[str, str] | None = None,
    runtime: PipelineRuntime | None = None, _nested: bool = False,
) -> list[Any]:
    """Execute steps in order with per-step retry / on_failure semantics
    (reference: pipeline.go:18-123 — retries, continue/break/abort, step
    ids; hooks.go step kinds).

    Step results land in the context as ``{state.<id>}`` strings for
    downstream ``render_vars`` templating, and typed under
    ``{state.<id>}`` / ``{store.<key>}`` for expression rendering. Pass
    a :class:`PipelineRuntime` to supply live connections and the
    ``execution``/``source``/``target`` namespaces (the replication
    harness path); without one the Spark-SQL step forms run as before.
    """
    from sling_cli_spark.expressions import Evaluator

    rt = runtime or PipelineRuntime(env=env)
    ctx: dict[str, str] = {**rt.env, **(env or {})}
    state_ns = rt.state_ns  # TYPED step results, keyed by step id —
    # SHARED across nested groups/routines so {state.<id>} from a group
    # substep resolves at the top level (p.35)
    # keep_missing=False + fill-missing-first is the reference's render
    # mode for owned namespaces (transforms.go RenderAny: `if
    # !e.KeepMissingExpr { stateMap = e.FillMissingKeys(...) }`) — a
    # missing env/state var evaluates as nil so `coalesce(env.X, "d")`
    # falls back instead of keeping the span. Unprefixed runtime vars
    # ({stream_table}) are non-renderable and stay intact regardless.
    evaluator = Evaluator(
        state={"env": {**rt.env, **(env or {})}, "state": state_ns,
               "store": rt.store, "loop": rt.loop_ns, **rt.state_extra},
    )
    rt.evaluator = evaluator
    results: list[Any] = []
    for i, step in enumerate(steps):
        # `if:` gate (reference hook field `If`): skipped steps record
        # None and the pipeline moves on
        cond = step.get("if")
        if cond is not None:
            # missing refs fill to nil first (the reference's
            # FillMissingKeys pass), so `!is_empty(stream.table)` with
            # no stream namespace gates false instead of erroring
            evaluator.fill_missing_keys(
                evaluator.state, evaluator.extract_vars(str(cond)))
            if not bool(evaluator.evaluate(str(cond))):
                results.append(None)
                state_ns[str(step.get("id", i))] = None
                continue
        # `{ expr }` rendering over env/state namespaces (reference routes
        # every hook payload through the Evaluator, transforms.go:729+);
        # flat `{state.N}` render_vars below stays for legacy templates
        # nested `steps:` (group/routine bodies) and the `loop:`
        # expression render INSIDE _step_group per iteration — an outer
        # render would bake {loop.*} spans to nil before the loop
        # namespace exists (p.03: copy from {loop.value.location})
        raw_nested = step.get("steps")
        raw_loop = step.get("loop")
        _fill_step_vars(evaluator, step)
        step = evaluator.render(step)
        if raw_nested is not None:
            step["steps"] = raw_nested
        if raw_loop is not None:
            step["loop"] = raw_loop
        step = _normalize_step(step)
        kind = step.get("type")
        if kind not in _STEP_TYPES:
            raise ValueError(f"unknown step type: {kind!r}")
        retries = int(step.get("retries", 0))
        attempt = 0
        failed_entry = None
        while True:
            try:
                out = _STEP_TYPES[kind](spark, step, ctx, rt)
                break
            except Exception as e:
                attempt += 1
                if attempt <= retries:
                    continue
                of = step.get("on_failure")
                if of == "continue":
                    out = None
                    failed_entry = {"status": "error", "error": str(e)}
                    break
                if of == "warn":
                    # warning status propagates up through groups
                    # (p.35.on_failure_warn_status contract)
                    rt.warn_count += 1
                    out = None
                    failed_entry = {"status": "warning",
                                    "error": str(e)}
                    break
                if of == "defer":
                    # keep running; the enclosing group (or this
                    # pipeline's end) raises the collected failures
                    # (p.38.on_failure_defer contract)
                    rt.deferred.append(str(e))
                    out = None
                    failed_entry = {"status": "error", "error": str(e)}
                    break
                if of == "break":
                    # stop the pipeline without erroring (the reference's
                    # guard pattern: `check: execution.status.error == 0 /
                    # on_failure: break` skips verification after a failed
                    # run; the caller reads runtime.broke)
                    rt.broke = True
                    return results
                raise
        results.append(out)
        ex = rt.state_extra.get("execution")
        if isinstance(ex, dict) and isinstance(ex.get("status"), dict):
            # executed-step counter (p.41: execution.status.count > 0)
            ex["status"]["count"] = ex["status"].get("count", 0) + 1
        sid = str(step.get("id", i))
        state_ns[sid] = failed_entry if failed_entry is not None \
            else _state_entry(kind, step, out)
        ctx[f"state.{sid}"] = str(out)
    if not _nested and rt.deferred:
        msgs = list(rt.deferred)
        rt.deferred.clear()
        raise StepError("deferred failure(s): " + "; ".join(msgs))
    return results
