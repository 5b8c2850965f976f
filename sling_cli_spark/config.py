"""Task configuration model: Source / Target / Mode / options.

Mirrors the reference's ``Config{Source, Target, Mode, Options}``
(``core/sling/config.go:1362-1762``) as plain dataclasses, with YAML/dict
loading, env-var rendering, and the runtime-variable surface
(``{stream_table}``, ``{run_timestamp}`` etc., ``config.go:1046-1313``)
implemented as str.format-style substitution on the driver.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any


class Mode(str, Enum):
    """Load modes (reference: core/sling/config.go:32-49)."""

    FULL_REFRESH = "full-refresh"
    INCREMENTAL = "incremental"
    TRUNCATE = "truncate"
    SNAPSHOT = "snapshot"
    BACKFILL = "backfill"
    DEFINITION_ONLY = "definition-only"
    CHANGE_CAPTURE = "change-capture"


class MergeStrategy(str, Enum):
    """SQL merge strategies (reference: templates/base.yaml:52-126)."""

    INSERT = "insert"
    UPDATE = "update"
    UPDATE_INSERT = "update_insert"  # default
    DELETE_INSERT = "delete_insert"
    HISTORY_INSERT = "history_insert"
    CHANGE_CAPTURE = "change_capture"
    CHANGE_CAPTURE_SOFT = "change_capture_soft"


def decode_json_if_base64(val: str) -> str:
    """DecodeJSONIfBase64 port (reference env/connection handling;
    vectors in datatype_test.go:774-851): connection properties like
    Google service-account keys may arrive base64-wrapped — if the
    string is valid base64 whose decoded bytes are valid JSON, return
    the decoded JSON; otherwise the input passes through verbatim
    (already-JSON, not-base64, and base64-of-non-JSON all no-op)."""
    import base64
    import binascii

    if not val:
        return val
    s = val.strip()
    if s.startswith("{") or s.startswith("["):
        try:
            json.loads(s)
            return val
        except (ValueError, TypeError):
            pass
    try:
        decoded = base64.b64decode(val, validate=True).decode("utf-8")
        json.loads(decoded)
        return decoded
    except (ValueError, TypeError, binascii.Error,
            UnicodeDecodeError):
        return val


@dataclass
class SourceOptions:
    """File/stream reader options (reference: config.go:1690-1720)."""

    format: str | None = None           # csv | json | jsonl | parquet | avro | xml
    header: bool = True
    # None = not configured -> delimiter auto-detection runs on a sample
    # (csv.go:243-256: detection only assigns when c.Delimiter == "").
    # Any configured value — including "," — is authoritative and is
    # never overridden by the sample.
    delimiter: str | None = None
    quote: str = '"'
    escape: str = '"'
    encoding: str = "utf-8"
    multi_line: bool = False            # quoted embedded newlines (unsplittable!)
    skip_lines: int = 0
    null_if: str | None = None
    empty_field_as_null: bool = True    # "" -> NULL (stream_processor.go)
    clean_header: bool = True           # CleanHeaderRow on csv headers
    compression: str | None = None
    datetime_format: str | None = None  # ISO-8601 tokens (DD-MM-YYYY ...)
    flatten: bool | int = False         # False | True (full) | max depth
    jmespath: str | None = None         # record-extraction path for JSON
    jq: str | None = None               # jq-style alias (p.12: ".data[]")
    sheet: str | None = None            # excel "Sheet1!A1:C100"
    row_tag: str = "row"                # xml element per record
    chunk_size: str | None = None
    chunk_count: int | None = None
    columns: dict[str, str] = field(default_factory=dict)  # name -> type [modifiers] [| constraint]
    constraint_mode: str | None = None  # None (warn-only) | "skip" (drop rows)
    transforms: Any = None
    infer_schema: bool = True           # sample-classify text sources
    merge_schemas: bool = False         # reconcile drift across files
    change_feed: bool = False           # delta/iceberg: read change rows
    range: str | None = None            # backfill bounds "start,end"
                                        # (config.go source options range)
    incremental_by_lineage: bool = False  # delta/iceberg INCREMENTAL
    #   sources consume by ROW LINEAGE (iceberg v3 _row_id /
    #   _last_updated_sequence_number; delta row tracking _row_id /
    #   _row_commit_version) instead of an update_key — files at or
    #   below the watermark prune from manifest/log METADATA, no
    #   change-data files needed; update_key defaults to the lineage
    #   sequence column so state-backed runs advance automatically
    starting_version: int | None = None  # delta change_feed range start
    starting_snapshot_id: int | None = None  # iceberg changelog start
    starting_timestamp: int | None = None  # delta CDF start (epoch ms,
    #   resolved to the first commit at or after — ICT-aware)
    ending_timestamp: int | None = None    # delta CDF end (epoch ms)


@dataclass
class TargetOptions:
    """Writer options (reference: config.go:1733-1762)."""

    format: str | None = None
    compression: str | None = None
    header: bool = True                 # csv header row (config.go:1734)
    delimiter: str = ","                # csv field delimiter (:1740)
    datetime_format: str | None = None  # csv/json timestamp layout (:1739)
    max_decimals: int | None = None     # round doubles on write (:1744)
    file_max_rows: int | None = None
    file_max_bytes: int | None = None
    file_bytes_per_row: int | None = None  # sizing hint for file_max_bytes
    # stream_config single (reference): exactly ONE output file at the
    # exact target path. Deliberately opt-in — one task writes
    # everything, an anti-scale shape; the default stays the
    # distributed directory layout
    single: bool = False
    batch_limit: int | None = None
    add_new_columns: bool = True
    replace_where: str | None = None    # delta/iceberg selective
    #   overwrite: delete rows matching this predicate + insert the
    #   batch, one commit (delta-spark replaceWhere / iceberg
    #   overwrite-by-filter)
    adjust_column_type: bool = False
    column_casing: str | None = None    # source|target|snake|upper|lower|camel
    table_keys: dict[str, list[str]] = field(default_factory=dict)
    pre_sql: str | None = None
    post_sql: str | None = None
    # None = not configured: file/lake targets default to update_insert;
    # DATABASE targets use the dialect's default_merge_strategy
    # (reference: database.go:3186 variable.default_merge_strategy —
    # duckdb/mysql default delete_insert, postgres update_insert)
    merge_strategy: MergeStrategy | None = None
    # custom CREATE TABLE template for DB targets (reference
    # TargetOptions.TableDDL, config.go:1757; r.57 uses it with
    # {object.full_name}/{col_types} placeholders, multi-statement)
    table_ddl: str | None = None
    # None | "hard" | "soft" | extended dict {type, where, source_where,
    # target_where} (reference DeleteMissingConfig, config.go:1837-1905;
    # scoped-deletion contract pinned by r.104.delete_missing_where.yaml)
    delete_missing: str | dict | None = None
    # output charset for text formats (reference target_options.encoding,
    # r.33.encoding_target_test.yaml); accepts the reference spellings
    encoding: str | None = None
    eq_upsert: bool = False  # iceberg: equality-delete upsert, no scan
    column_typing: dict | None = None   # string/decimal/boolean/json policy
    json_columns: list[str] = field(default_factory=list)  # inline raw JSON
    file_granular_merge: bool = True    # rewrite only touched parquet files
    partition_by: list[str] = field(default_factory=list)
    bucket_by: list[str] = field(default_factory=list)  # co-located joins
    bucket_count: int | None = None     # buckets per bucket_by table
    ignore_existing: bool = False       # skip the load if target has data
    # accepted for config parity: the staged parquet ingest IS the bulk
    # path here (reference use_bulk switches loader implementations);
    # direct_insert skips the temp-table swap in the reference — here
    # the swap is a metadata-cheap atomic rename, same end state (r.65)
    use_bulk: bool = True
    direct_insert: bool = False
    # accepted for parity: per-txn isolation is a live-driver knob
    # (reference database.go transaction options)
    isolation_level: str | None = None
    txn_app_id: str | None = None       # delta idempotent writes (r9):
    txn_version: int | None = None      # a re-run committed batch no-ops
    audit_branch: str | None = None     # iceberg WAP: stage the load here
    audit_sql: str | None = None        # rows returned = violations; the
    #                                     `_audit` view is the branch read


@dataclass
class Source:
    conn: str | None = None             # connection name (jdbc url / fs scheme)
    stream: str | None = None           # table, path, glob, or SQL
    primary_key: list[str] = field(default_factory=list)
    update_key: str | None = None
    select: list[str] = field(default_factory=list)
    where: str | None = None
    limit: int | None = None
    offset: int | None = None
    options: SourceOptions = field(default_factory=SourceOptions)

    @property
    def is_sql(self) -> bool:
        return bool(self.stream) and bool(
            re.search(r"\bselect\b[\s\S]+\bfrom\b", self.stream, re.IGNORECASE)
        )


@dataclass
class Target:
    conn: str | None = None
    object: str | None = None           # table name or file path/mask
    options: TargetOptions = field(default_factory=TargetOptions)


@dataclass
class Config:
    source: Source
    target: Target
    mode: Mode = Mode.FULL_REFRESH
    env: dict[str, str] = field(default_factory=dict)

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        d = render_env(d)
        src = d.get("source", {})
        tgt = d.get("target", {})
        return cls(
            source=Source(
                conn=src.get("conn"),
                stream=src.get("stream"),
                primary_key=_as_list(src.get("primary_key")),
                update_key=src.get("update_key"),
                select=_as_list(src.get("select")),
                where=src.get("where"),
                limit=src.get("limit"),
                offset=src.get("offset"),
                options=SourceOptions(**src.get("options", {})),
            ),
            target=Target(
                conn=tgt.get("conn"),
                object=tgt.get("object"),
                options=_target_options(tgt.get("options", {})),
            ),
            mode=Mode(d.get("mode", "full-refresh")),
            env=d.get("env", {}),
        )

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "Config":
        import yaml

        if os.path.exists(text_or_path):
            with open(text_or_path) as f:
                text = f.read()
        else:
            text = text_or_path
        return cls.from_dict(yaml.safe_load(text))


def _target_options(d: dict[str, Any]) -> TargetOptions:
    d = dict(d)
    if "merge_strategy" in d:
        d["merge_strategy"] = MergeStrategy(d["merge_strategy"])
    return TargetOptions(**d)


def _as_list(v: Any) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# ----------------------------------------------------------------------
# runtime variable rendering (reference: config.go:1046-1313)
_ENV_RE = re.compile(r"\$\{?([A-Z_][A-Z0-9_]*)\}?")


def render_env(obj: Any) -> Any:
    """Substitute ``$VAR`` / ``${VAR}`` from os.environ, recursively."""
    if isinstance(obj, str):
        return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), obj)
    if isinstance(obj, dict):
        return {k: render_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [render_env(v) for v in obj]
    return obj


def runtime_vars(cfg: Config, now: datetime | None = None) -> dict[str, str]:
    """The ``{stream_table}`` / ``{run_timestamp}`` substitution map
    (reference: config.go:1046-1313 — table vars with case variants,
    file vars with extension handling, object-side names)."""
    now = now or datetime.now(timezone.utc)
    stream = cfg.source.stream or ""
    is_file = "/" in stream or "://" in stream
    out = {
        "stream_name": stream.lower() if is_file else stream,
        "object_name": cfg.target.object or "",
        "run_timestamp": now.strftime("%Y_%m_%d_%H%M%S"),
        "YYYY": now.strftime("%Y"),
        "MM": now.strftime("%m"),
        "DD": now.strftime("%d"),
        "HH": now.strftime("%H"),
    }
    if is_file:
        # file stream: path/folder/name/ext vars (config.go:1185-1240);
        # stream_file_name EXCLUDES the extension, compression double
        # extensions (csv.gz) collapse into it as "csv_gz"
        path = stream.split("://", 1)[-1].strip("/")
        out["stream_full_name"] = stream
        out["stream_file_path"] = path
        parts = path.split("/")
        file_name = parts[-1]
        if len(parts) > 1:
            out["stream_file_folder"] = parts[-2]
        bits = file_name.split(".")
        if len(bits) > 1:
            ext = bits[-1]
            if len(bits) >= 3 and ext in ("gz", "zst", "snappy"):
                ext = bits[-2] + "_" + bits[-1]
            out["stream_file_ext"] = ext
            file_name = file_name[: -len("." + ext.replace("_", "."))]
        out["stream_file_name"] = file_name
    else:
        parts = stream.replace("`", "").replace('"', "").split(".")
        table = parts[-1]
        schema = parts[-2] if len(parts) > 1 else ""
        out.update({
            "stream_schema": schema,
            "stream_schema_lower": schema.lower(),
            "stream_schema_upper": schema.upper(),
            "stream_table": table,
            "stream_table_lower": table.lower(),
            "stream_table_upper": table.upper(),
            "stream_full_name": f"{schema}.{table}" if schema else table,
            "stream_file_name": "",
        })
    obj = (cfg.target.object or "").replace("`", "").replace('"', "")
    if obj and "/" not in obj and "://" not in obj and "{" not in obj:
        o_parts = obj.split(".")
        out["object_table"] = o_parts[-1]
        out["object_schema"] = o_parts[-2] if len(o_parts) > 1 else ""
        out["object_full_name"] = obj
        out["target_table"] = o_parts[-1]  # legacy alias
    # CleanName every var VALUE except the full-name/path carriers
    # (config.go:945-963: `test1.result.csv` -> stream_file_name
    # `test1_result`, so a rendered object never grows extra dots)
    keep_raw = {"stream_full_name", "object_full_name", "object_name",
                "stream_name", "stream_file_path"}
    for k, v in out.items():
        if k not in keep_raw and isinstance(v, str):
            cleaned = re.sub(r"[^0-9a-zA-Z_]+", "_", v.strip())
            if cleaned and cleaned[0].isdigit():
                cleaned = "_" + cleaned
            out[k] = cleaned
    return out


def render_vars(text: str, vars: dict[str, str]) -> str:
    for k, v in vars.items():
        # env blocks may carry native YAML scalars (SLING_THREADS: 3)
        text = text.replace("{" + k + "}", str(v))
    return text


def delete_missing_config(v) -> dict | None:
    """Normalize ``target_options.delete_missing`` (reference
    GetDeleteMissingConfig, config.go:1861-1905): a bare string is the
    type; the dict form adds scoping — ``where`` applies to both sides
    unless ``source_where``/``target_where`` override it."""
    if not v:
        return None
    if isinstance(v, str):
        return {"type": v, "source_where": "", "target_where": ""}
    w = v.get("where") or ""
    return {"type": v.get("type") or "soft",
            "source_where": v.get("source_where") or w,
            "target_where": v.get("target_where") or w}
