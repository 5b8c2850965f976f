"""Replication compile: one YAML -> N task configs -> N runs.

Re-expresses the reference's replication lifecycle
(``core/sling/replication.go:1117-1354`` UnmarshalReplication/Compile,
``:293-518`` wildcard expansion, ``:1503-1594`` stream ordering) as a
driver-side loop that builds one ``Config`` per stream and executes them
sequentially with ``runner.run``. Each stream's DataFrame plan is still
fully distributed — the loop only sequences job submission.

YAML shape (same surface as the reference):

    source: local
    target: local
    defaults:
      mode: full-refresh
      target_options: {format: parquet}
    streams:
      /data/in/orders.parquet: {}
      /data/in/events_*.jsonl:          # wildcard -> N streams
        mode: incremental
        update_key: ts
      /data/in/skipme.csv: {disabled: true}
    env:
      MY_VAR: x
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass, field
from typing import Any

import yaml

from sling_cli_spark.config import (
    Config, Mode, Source, Target, render_env, render_vars, runtime_vars)


@dataclass
class ReplicationConfig:
    source: str | None
    target: str | None
    defaults: dict[str, Any] = field(default_factory=dict)
    streams: dict[str, dict[str, Any] | None] = field(default_factory=dict)
    env: dict[str, str] = field(default_factory=dict)

    hooks: dict[str, list] = field(default_factory=dict)
    # atomic: true -> every stream's catalog pointer commit defers to
    # ONE commit_many at the end (all streams land or none); requires
    # every target to be a catalog:// URL
    atomic: bool = False

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "ReplicationConfig":
        text = text_or_path
        if os.path.exists(text_or_path):
            with open(text_or_path) as f:
                text = f.read()
        d = render_env(yaml.safe_load(text))
        # `{ expr }` rendering over the env namespace (reference renders
        # the whole replication payload through the Evaluator); runtime
        # vars like {stream_table} are unprefixed and stay for
        # compile_replication's render_vars pass
        from sling_cli_spark.expressions import Evaluator

        env = dict(os.environ)
        env.update(d.get("env") or {})
        d = Evaluator(state={"env": env}, keep_missing=True).render(d)
        return cls(
            source=d.get("source"),
            target=d.get("target"),
            defaults=d.get("defaults") or {},
            streams=d.get("streams") or {},
            env=d.get("env") or {},
            hooks=d.get("hooks") or {},
            atomic=bool(d.get("atomic")),
        )


def expand_wildcards(streams: dict[str, Any]) -> dict[str, Any]:
    """Expand glob patterns to concrete file streams (reference:
    replication.go:293-518 — DB `schema.*` uses schemata queries; file
    globs use the filesystem listing; both fan out to N streams with the
    pattern's own overrides)."""
    out: dict[str, Any] = {}
    for pattern, overrides in streams.items():
        if any(ch in pattern for ch in "*?[") and not (
            overrides or {}
        ).get("no_expand"):
            matches = sorted(_glob.glob(pattern))
            if matches:
                for m in matches:
                    out[m] = dict(overrides or {})
                continue  # unmatched glob -> stream dropped, like the ref
        out[pattern] = dict(overrides or {})
    return out


def expand_db_wildcards(
    streams: dict[str, Any],
    run_sql,
    dialect_name: str = "duckdb",
) -> dict[str, Any]:
    """Expand ``schema.*`` / ``schema.prefix*`` patterns against a
    database's catalog (reference: replication.go:293-518 — the DB
    branch runs the dialect's schemata query and fans out to N
    table streams carrying the pattern's overrides).

    ``run_sql(sql) -> iterable of rows`` executes on the source
    database — over JDBC on a cluster; tests inject an in-process
    DuckDB executor. The discovery SQL comes from the dialect pack's
    ``metadata`` templates, so each engine's catalog quirks live with
    its other templates.
    """
    import fnmatch

    from sling_cli_spark.dialects import get_dialect

    d = get_dialect(dialect_name)
    out: dict[str, Any] = {}
    for pattern, overrides in streams.items():
        parts = pattern.split(".")
        tbl_pat = parts[-1]
        if len(parts) == 2 and any(ch in tbl_pat for ch in "*?[") \
                and not (overrides or {}).get("no_expand"):
            schema = parts[0]
            rows = list(run_sql(d.metadata_sql("tables", schema=schema)))
            names = [r[1] if not isinstance(r, str) else r for r in rows]
            matched = [n for n in names
                       if fnmatch.fnmatchcase(n.lower(), tbl_pat.lower())]
            for n in sorted(matched):
                out[f"{schema}.{n}"] = dict(overrides or {})
            continue  # unmatched pattern -> dropped, like the reference
        out[pattern] = dict(overrides or {})
    return out


def _merged(defaults: dict[str, Any], overrides: dict[str, Any]) -> dict[str, Any]:
    """defaults <- overrides, one level deep for the *_options dicts
    (reference merges stream config over defaults the same way,
    replication.go:1223-1310)."""
    merged = dict(defaults)
    for k, v in overrides.items():
        if k in ("source_options", "target_options") and isinstance(v, dict):
            base = dict(defaults.get(k) or {})
            base.update(v)
            merged[k] = base
        else:
            merged[k] = v
    return merged


def compile_replication(rc: ReplicationConfig) -> list[Config]:
    """YAML defaults+streams -> one Config per enabled stream."""
    cfgs: list[Config] = []
    for stream, overrides in expand_wildcards(rc.streams).items():
        o = _merged(rc.defaults, overrides or {})
        if o.get("disabled"):
            continue
        # default object = the stream's basename WITH extension (the
        # {stream_file_name} var itself now excludes the extension, per
        # the reference's var semantics — config.go:1230-1239)
        object_tmpl = o.get("object") or (
            os.path.basename((stream or "").rstrip("/")) or
            "{stream_file_name}")
        # a stream-level `sql:` makes the SOURCE a query (reference:
        # ReplicationStreamConfig.SQL -> Source.Query,
        # replication_test.go "sql_query"); the stream keeps its NAME
        # for {stream_*} runtime vars
        source_stream = o.get("sql") or stream
        cfg = Config.from_dict({
            "source": {
                "conn": rc.source,
                "stream": source_stream,
                "primary_key": o.get("primary_key"),
                "update_key": o.get("update_key"),
                "select": o.get("select"),
                "where": o.get("where"),
                "limit": o.get("limit"),
                "options": o.get("source_options") or {},
            },
            "target": {
                "conn": rc.target,
                "object": object_tmpl,
                "options": o.get("target_options") or {},
            },
            "mode": o.get("mode") or "full-refresh",
            "env": rc.env,
        })
        if o.get("sql"):
            # {stream_*} vars derive from the stream NAME, not the query
            import copy

            vcfg = copy.copy(cfg)
            vcfg.source = copy.copy(cfg.source)
            vcfg.source.stream = stream
            cfg.target.object = render_vars(
                cfg.target.object, runtime_vars(vcfg))
        else:
            cfg.target.object = render_vars(
                cfg.target.object, runtime_vars(cfg))
        cfgs.append(cfg)
    return cfgs


def run_replication(spark, rc: ReplicationConfig, base_output: str = ""):
    """Execute every compiled stream; returns {stream: TaskResult}.

    Sequential like the reference's default (it parallelizes with a
    worker-pool limit; on Spark, per-stream parallelism already comes from
    the cluster, and sequential submission keeps memory bounded).

    Replication-level hooks (reference: HookMap, ``hooks.go:49-56`` +
    ``replication.go:518-560``): ``start`` runs before the first stream,
    ``end`` after the last, ``pre``/``post`` around every stream — each a
    pipeline-step list sharing one expression state, with per-stream
    runtime vars exposed as ``{stream_name}``/``{object_name}`` and the
    finished stream's rows as ``{state.<id>}``.
    """
    from sling_cli_spark.plans.pipeline import run_pipeline
    from sling_cli_spark.runner import run

    hooks = rc.hooks or {}

    def run_hooks(stage: str, extra_env: dict | None = None):
        steps = hooks.get(stage) or []
        if steps:
            run_pipeline(spark, steps, env={**rc.env, **(extra_env or {})})

    run_hooks("start")
    results = {}
    compiled = list(compile_replication(rc))
    if rc.atomic:
        # atomic replications defer every stream's catalog pointer
        # commit to ONE commit_many (iceberg_catalog.CatalogTransaction
        # — routed through run_committed, so merges, WAP publishes and
        # plain loads all participate). Non-catalog targets have no
        # pointer to defer — refuse loudly rather than silently
        # landing them stream-by-stream.
        from sling_cli_spark.sources.iceberg_catalog import (
            CatalogTransaction, is_catalog_url)

        bad = [c.target.object for c in compiled
               if not is_catalog_url(c.target.object or "")]
        if bad:
            raise ValueError(
                f"atomic replication needs catalog:// targets for "
                f"every stream; got {bad[:3]}")
        # per-stream 'post' hooks report COMMITTED state, so they fire
        # only after the transaction's single commit_many lands (r11
        # advice fix: they used to fire inside the with-block, claiming
        # success for streams whose pointer never moved if the final
        # atomic commit then failed)
        post_envs = []
        with CatalogTransaction():
            for cfg in compiled:
                stream_env = {
                    "stream_name": cfg.source.stream or "",
                    "object_name": cfg.target.object or ""}
                run_hooks("pre", stream_env)
                result = run(spark, cfg)
                results[cfg.source.stream] = result
                post_envs.append({**stream_env,
                                  "rows": str(result.rows)})
        for env in post_envs:
            run_hooks("post", env)
        run_hooks("end")
        return results
    for cfg in compiled:
        if base_output and not os.path.isabs(cfg.target.object or ""):
            cfg.target.object = os.path.join(base_output, cfg.target.object)
        stream_env = {"stream_name": cfg.source.stream or "",
                      "object_name": cfg.target.object or ""}
        run_hooks("pre", stream_env)
        result = run(spark, cfg)
        results[cfg.source.stream] = result
        run_hooks("post", {**stream_env, "rows": str(result.rows)})
    run_hooks("end")
    return results
