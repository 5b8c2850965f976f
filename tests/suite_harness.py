"""Golden e2e suite harness — drives the reference's OWN suite configs
(`/root/reference/tests/suite.db.template.yaml`, 29 cases;
`suite.file.template.yaml`, 19 cases) through this engine with the
reference's assertion semantics (cmd/sling/sling_test.go:643-900):

- ``validation_stream_row_count`` — rows the task moved (exact / ">N")
- ``validation_row_count``       — target row count (exact / ">N");
  full-refresh into a DB defaults to target == stream count
- ``validation_file`` + ``validation_cols`` — target contents ordered
  by the source PK compared value-by-value against a fixture CSV on
  the given column indexes, after StreamProcessor-style value parsing
- ``validation_types``           — discovered target column GENERAL
  types (datetime/timestamp treated as one class, like the per-dialect
  correction table in sling_test.go:870-960)
- ``validation_contains`` / ``level`` — discover-mode output

Backend substitutions (documented divergences):
- ``[conn]``   → a DuckDB database file (the reference parametrizes the
  same template over 20+ warehouses; DuckDB is the in-process twin)
- ``postgres`` → a SECOND DuckDB database file (no live postgres in the
  sandbox; the dialect-rendered SQL for postgres is covered by
  tests/test_dialects.py)
- ``use_bulk`` → always on (the staged parquet ingest IS the bulk path)
- ``{drop_view}`` etc. → rendered from the dialect templates with the
  same base-name suffix-stripping as the reference harness
"""

from __future__ import annotations

import csv
import io
import json
import os
import re
from datetime import datetime
from decimal import Decimal

import yaml

REF_TESTS = "/root/reference/tests"

# ---------------------------------------------------------------------------
# loading + placeholder compilation


def load_suite(name: str) -> list[dict]:
    with open(os.path.join(REF_TESTS, name)) as f:
        text = f.read()
    return yaml.safe_load(text)


def _clean_json(s: str) -> dict:
    """The templates carry human-edited JSON (a double comma in case
    15's env); tolerate exactly that class of typo like g.Unmarshal."""
    if not s or not s.strip() or s.strip() in ("{}", '""'):
        return {}
    s = re.sub(r",\s*,", ",", s)
    s = re.sub(r"\{\s*,", "{", s)
    return json.loads(s)


def substitute(text: str, ctx: dict) -> str:
    for k, v in ctx.items():
        text = text.replace(f"[{k}]", v)
    return text


def compile_case(case: dict, ctx: dict) -> dict:
    """Substitute [conn]/[schema]/[table]/[folder] + file:// fixture
    paths and parse the JSON option blobs."""
    out = dict(case)
    for key in ("source_conn", "source_stream", "target_conn",
                "target_object"):
        out[key] = substitute(str(case.get(key) or ""), ctx)
    for key in ("source_options", "target_options", "env",
                "stream_config"):
        raw = substitute(str(case.get(key) or ""), ctx)
        out[key] = _clean_json(raw)
    # file://tests/files/x -> absolute reference fixture path
    for key in ("source_stream",):
        out[key] = out[key].replace("file://tests/",
                                    os.path.join(REF_TESTS, "") )
    env = out["env"]
    if isinstance(env.get("validation_file"), str):
        env["validation_file"] = env["validation_file"].replace(
            "file://tests/", os.path.join(REF_TESTS, ""))
    return out


def render_sql_hooks(options: dict, table: str, dialect) -> dict:
    """The reference harness substitutes {drop_view} /
    {drop_table_merge_*} into pre/post_sql from the case's BASE table
    name (suffixes stripped) — sling_test.go:655-712."""
    from sling_cli_spark.dialects import render

    base = table
    for suffix in ("_pg", "_merge_ins", "_merge_ui", "_merge_di"):
        base = base.removesuffix(suffix)
    schema = base.rsplit(".", 1)[0] if "." in base else ""
    name = base.rsplit(".", 1)[-1]

    def full(n: str) -> str:
        return f"{schema}.{n}" if schema else n

    subs = {
        "drop_view": render(dialect.template("drop_view"),
                            {"view": full(name + "_vw")}),
        "drop_table_merge_ins": render(dialect.template("drop_table"),
                                       {"table": full(name + "_merge_ins")}),
        "drop_table_merge_ui": render(dialect.template("drop_table"),
                                      {"table": full(name + "_merge_ui")}),
        "drop_table_merge_di": render(dialect.template("drop_table"),
                                      {"table": full(name + "_merge_di")}),
    }
    out = dict(options)
    for key in ("pre_sql", "post_sql"):
        if out.get(key):
            s = out[key]
            for k, v in subs.items():
                s = s.replace("{" + k + "}", v)
            out[key] = s
    return out


def build_config(case: dict, env_tokens: dict | None = None):
    """Compiled case -> sling_cli_spark Config (+ the validation env)."""
    from sling_cli_spark.config import Config

    src_opts = dict(case["source_options"])
    transforms = src_opts.get("transforms")
    if isinstance(transforms, list) and transforms \
            and isinstance(transforms[0], dict):
        merged: dict = {}
        for t in transforms:
            merged.update(t)
        src_opts["transforms"] = merged
    stream = case["source_stream"]
    # runtime env tokens in SQL streams ({seq_num} — config.go runtime
    # variables; the reference substitutes from the replication env)
    for k, v in (env_tokens or {}).items():
        stream = stream.replace("{" + k + "}", str(v))
    limit = src_opts.pop("limit", None)
    offset = src_opts.pop("offset", None)
    where = src_opts.pop("where", None)
    d = {
        "source": {
            "conn": case["source_conn"] or None,
            "stream": stream,
            "primary_key": [p for p in
                            str(case.get("source_primary_key") or "")
                            .split(",") if p],
            "update_key": case.get("source_update_key") or None,
            "limit": limit, "offset": offset, "where": where,
            "options": src_opts,
        },
        "target": {
            "conn": case["target_conn"] or None,
            "object": case["target_object"] or None,
            "options": case["target_options"],
        },
        "mode": case["mode"],
        "env": case["env"],
    }
    # use_bulk is the reference's loader-path switch; the staged ingest
    # IS the bulk path here, so the option is accepted and dropped
    d["target"]["options"].pop("use_bulk", None)
    return Config.from_dict(d)


# ---------------------------------------------------------------------------
# value normalization (the reference compares through
# StreamProcessor.ParseString on both sides — sling_test.go:820-838)

_DT_LAYOUTS = (
    "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d",
)


def parse_string(v):
    """StreamProcessor-style scalar normalization: '' -> None,
    bool words, ints, decimals (trailing zeros dropped), datetimes
    (tz stripped; both sides normalize identically)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int,)):
        return Decimal(v)
    if isinstance(v, float):
        return Decimal(str(v)).normalize()
    if isinstance(v, Decimal):
        return v.normalize()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if hasattr(v, "isoformat") and not isinstance(v, str):  # date
        return datetime(v.year, v.month, v.day)
    s = str(v)
    if s == "":
        return None
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return Decimal(s).normalize()
    except Exception:
        pass
    for fmt in _DT_LAYOUTS:
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=None)
        except ValueError:
            continue
    return s


def values_equal(a, b) -> bool:
    pa, pb = parse_string(a), parse_string(b)
    # bool-as-number correction (sling_test.go:826-829)
    if isinstance(pa, bool) and isinstance(pb, Decimal) and pb in (0, 1):
        pb = bool(pb)
    if isinstance(pb, bool) and isinstance(pa, Decimal) and pa in (0, 1):
        pa = bool(pa)
    if isinstance(pa, Decimal) and isinstance(pb, Decimal):
        return pa == pb
    return pa == pb


def read_fixture_csv(path: str) -> list[list[str]]:
    with open(path, newline="") as f:
        return list(csv.reader(f))


# ---------------------------------------------------------------------------
# assertions


def check_count(expected, actual: int, what: str) -> None:
    expected = str(expected)
    if expected.startswith(">"):
        assert actual > int(expected[1:]), \
            f"{what}: expected > {expected[1:]}, got {actual}"
    else:
        assert actual == int(expected), \
            f"{what}: expected {expected}, got {actual}"


def check_validation_file(db, table: str, pk: list[str], env: dict) -> None:
    fixture = read_fixture_csv(env["validation_file"])
    order_by = ", ".join(pk) if pk else "1"
    rows = db.fetch_all(f"select * from {table} order by {order_by}")
    val_cols = [int(c) for c in str(env["validation_cols"]).split(",")]
    n_file, n_db = len(fixture) - 1, len(rows)  # fixture row 0 = header
    assert n_file == n_db, \
        f"validation_file: {n_file} fixture rows vs {n_db} target rows"
    for ci in val_cols:
        for ri in range(n_db):
            vf, vd = fixture[ri + 1][ci], rows[ri][ci]
            assert values_equal(vf, vd), (
                f"validation_file: row {ri + 1} col {ci} "
                f"fixture={vf!r} target={vd!r}")


# general-type equivalence classes (sling_test.go's correction table
# folds datetime/timestamp per-dialect; duckdb TIMESTAMP discovers as
# 'timestamp' and the reference's 'datetime' names the same thing)
_TYPE_EQUIV = {
    "timestamp": {"timestamp", "datetime"},
    "datetime": {"timestamp", "datetime"},
}


def check_validation_types(db, table: str, env: dict) -> None:
    from sling_cli_spark.sinks.db_load import discover_db

    want = env["validation_types"]
    got = {c["column_name"].lower(): c["general_type"]
           for c in discover_db(db, table, level="column")}
    dialect = db.dialect.name
    for col, expected in want.items():
        actual = got.get(col.lower())
        assert actual is not None, f"validation_types: {col} missing"
        accepted = set(_TYPE_EQUIV.get(expected, {expected}))
        if dialect in ("sqlite", "d1") and expected in (
                "timestamp", "timestampz", "datetime", "date"):
            # sqlite's temporal DDL IS text (sqlite.yaml:280-296 text
            # affinity) — discovery cannot see through it
            accepted |= {"string", "text"}
        ok = actual in accepted
        assert ok, f"validation_types: {col} expected {expected}, got {actual}"


def check_contains(items: list[str], env: dict, ctx: dict) -> None:
    contains = substitute(str(env.get("validation_contains", "")), ctx)
    joined = ",".join(str(i) for i in items)
    for needle in [c for c in contains.split(",") if c]:
        assert needle in joined, \
            f"validation_contains: {needle!r} not in {joined!r}"
    not_contains = substitute(
        str(env.get("validation_not_contains", "")), ctx)
    for needle in [c for c in not_contains.split(",") if c]:
        assert needle not in joined, \
            f"validation_not_contains: {needle!r} IS in {joined!r}"
