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

    def __init__(self, connections=None, state=None, env=None):
        self.connections = {}
        for k, v in (connections or {}).items():
            self.connections[str(k)] = v
            self.connections[str(k).lower()] = v
        self.store: dict[str, Any] = {}
        self.state_extra = dict(state or {})
        self.env = dict(env or {})
        self.broke = False          # a check with on_failure: break fired
        self.evaluator = None       # set by run_pipeline
        self._scratch = None

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


def _step_query(spark, step, ctx, rt=None):
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
    under {store.<key>} for later steps / stream-SQL rendering."""
    if rt is not None:
        rt.store[str(step["key"])] = step.get("value")
    return step.get("value")


def _step_copy(spark, step, ctx, rt=None):
    src = render_vars(step["from"], ctx)
    dst = render_vars(step["to"], ctx)
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
    p = render_vars(step["path"], ctx)
    from sling_cli_spark.sources.files import list_file_nodes

    nodes = list_file_nodes(spark, p).collect()
    return {"exists": bool(nodes), "files": len(nodes),
            "bytes": sum(r["size"] for r in nodes)}


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
    # the reference's list-hook state shape: {state.<id>.result}
    return {"result": paths, "count": len(paths)}


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
    return {"returncode": proc.returncode, "stdout": proc.stdout.strip()}


def _step_replication(spark, step, ctx, rt=None):
    from sling_cli_spark.plans.replication import (
        ReplicationConfig, run_replication)

    rc = ReplicationConfig.from_yaml(render_vars(step["path"], ctx))
    return {k: r.rows for k, r in
            run_replication(spark, rc, step.get("base_output", "")).items()}


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
}


def _normalize_step(step: dict) -> dict:
    """Accept the reference's SHORTHAND step forms (hooks.go unmarshal:
    the kind may BE the key) — ``- check: expr``, ``- log: msg``,
    ``- query: sql`` normalize to the explicit ``type:`` form."""
    if step.get("type"):
        return step
    for kind in ("check", "log", "query", "store", "copy", "delete",
                 "inspect", "http", "command", "replication", "list",
                 "write"):
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


def run_pipeline(
    spark, steps: list[dict[str, Any]], env: dict[str, str] | None = None,
    runtime: PipelineRuntime | None = None,
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
    state_ns: dict[str, Any] = {}  # TYPED step results, keyed by step id
    # keep_missing=False + fill-missing-first is the reference's render
    # mode for owned namespaces (transforms.go RenderAny: `if
    # !e.KeepMissingExpr { stateMap = e.FillMissingKeys(...) }`) — a
    # missing env/state var evaluates as nil so `coalesce(env.X, "d")`
    # falls back instead of keeping the span. Unprefixed runtime vars
    # ({stream_table}) are non-renderable and stay intact regardless.
    evaluator = Evaluator(
        state={"env": {**rt.env, **(env or {})}, "state": state_ns,
               "store": rt.store, **rt.state_extra},
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
        _fill_step_vars(evaluator, step)
        step = evaluator.render(step)
        step = _normalize_step(step)
        kind = step.get("type")
        if kind not in _STEP_TYPES:
            raise ValueError(f"unknown step type: {kind!r}")
        retries = int(step.get("retries", 0))
        attempt = 0
        while True:
            try:
                out = _STEP_TYPES[kind](spark, step, ctx, rt)
                break
            except Exception:
                attempt += 1
                if attempt <= retries:
                    continue
                if step.get("on_failure") == "continue":
                    out = None
                    break
                if step.get("on_failure") == "break":
                    # stop the pipeline without erroring (the reference's
                    # guard pattern: `check: execution.status.error == 0 /
                    # on_failure: break` skips verification after a failed
                    # run; the caller reads runtime.broke)
                    rt.broke = True
                    return results
                raise
        results.append(out)
        state_ns[str(step.get("id", i))] = out
        ctx[f"state.{step.get('id', i)}"] = str(out)
    return results
