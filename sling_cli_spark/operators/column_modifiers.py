"""Column modifier DSL: ``<type> [<modifier> ...] [| <constraint>]``.

Reference: ``core/dbio/iop/column_modifiers.go:44-151`` (ParseModifiers)
+ the ``|`` runtime-constraint split (SetConstraint). A replication
``columns:`` value like::

    amount: "decimal(18,4) not_null | value >= 0"
    id:     "bigint primary_key"
    name:   "string(100) unique description('customer name')"

parses into a :class:`ColumnSpec` carrying the Spark type, nullability,
key/unique flags, description, inline index defs, and the runtime
constraint expression. Consumers:

- type casts feed the ``columns`` override surface (read-side coercion)
- ``primary_key`` columns default the stream's primary key
- constraints feed ``operators/constraints.check_constraints``
- nullability / sizing / indexes feed dialect DDL generation

Reserved-but-unsupported modifiers (default / check / auto_increment /
identity) error clearly, matching the reference's forward-compatible
tokenizer (column_modifiers.go:46-53).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from sling_cli_spark.types import ColumnType, to_spark_type

_RESERVED = {"default", "check", "auto_increment", "identity"}

# type aliases seen across the reference's dialect packs
_TYPE_ALIASES = {
    "varchar": "string", "char": "string", "nvarchar": "string",
    "int": "integer", "int4": "integer", "int8": "bigint",
    "long": "bigint", "number": "decimal", "numeric": "decimal",
    "double": "float", "real": "float", "boolean": "bool",
    "timestamp_ntz": "datetime", "timestamptz": "timestampz",
}


@dataclass
class IndexDef:
    """column_modifiers.go:13-34 — inline index metadata for DDL."""
    name: str = ""
    unique: bool = False
    kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class ColumnSpec:
    name: str
    type: ColumnType = ColumnType.STRING
    length: int | None = None          # string(100)
    precision: int | None = None       # decimal(18,4)
    scale: int | None = None
    nullable: bool | None = None       # None = unspecified
    primary_key: bool = False
    unique: bool = False
    description: str | None = None
    indexes: list[IndexDef] = field(default_factory=list)
    constraint: str | None = None      # after the '|' split

    def spark_type(self):
        return to_spark_type(self.type, self.precision, self.scale)


def _tokenize(s: str) -> list[str]:
    """Whitespace split keeping balanced parens and quoted runs intact
    (column_modifiers.go tokenizeModifiers)."""
    tokens: list[str] = []
    buf: list[str] = []
    depth, quote = 0, ""
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = ""
            continue
        if ch in "'\"`":
            quote = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
            buf.append(ch)
            continue
        if ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in: {s!r}")
            buf.append(ch)
            continue
        if ch.isspace() and depth == 0:
            if buf:
                tokens.append("".join(buf))
                buf = []
            continue
        buf.append(ch)
    if quote:
        raise ValueError(f"unclosed quote in: {s!r}")
    if depth:
        raise ValueError(f"unbalanced '(' in: {s!r}")
    if buf:
        tokens.append("".join(buf))
    return tokens


_CALL_RE = re.compile(r"^([A-Za-z_][\w]*)\((.*)\)$", re.S)


def _split_modifier(tok: str) -> tuple[str, str | None]:
    m = _CALL_RE.match(tok)
    if m:
        return m.group(1), m.group(2)
    return tok, None


def _parse_type(tok: str, spec: ColumnSpec) -> None:
    name, payload = _split_modifier(tok)
    base = _TYPE_ALIASES.get(name.lower(), name.lower())
    try:
        spec.type = ColumnType(base)
    except ValueError:
        raise ValueError(f"column {spec.name}: unknown type {name!r}")
    if payload is not None:
        parts = [p.strip() for p in payload.split(",") if p.strip()]
        nums = [int(p) for p in parts]
        if spec.type == ColumnType.DECIMAL:
            spec.precision = nums[0] if nums else None
            spec.scale = nums[1] if len(nums) > 1 else 0
        elif nums:
            spec.length = nums[0]


def _parse_string_payload(payload: str) -> str:
    p = payload.strip()
    if len(p) >= 2 and p[0] == p[-1] and p[0] in "'\"`":
        return p[1:-1]
    return p


def parse_modifiers(name: str, value: str) -> ColumnSpec:
    """One column's type slot -> ColumnSpec (ParseModifiers port)."""
    spec = ColumnSpec(name=name)
    raw = (value or "").strip()
    if not raw:
        return spec
    # '|' splits the runtime constraint off the type slot (SetConstraint)
    if "|" in raw:
        raw, constraint = raw.split("|", 1)
        spec.constraint = constraint.strip() or None
        raw = raw.strip()
    tokens = _tokenize(raw)
    if not tokens:
        return spec
    _parse_type(tokens[0], spec)
    saw_not_null = saw_nullable = False
    for tok in tokens[1:]:
        mod, payload = _split_modifier(tok)
        lmod = mod.lower()
        if lmod in _RESERVED:
            raise ValueError(
                f"column {name}: modifier {lmod!r} is not yet supported")
        if lmod == "not_null":
            _no_payload(name, lmod, payload)
            saw_not_null, spec.nullable = True, False
        elif lmod == "nullable":
            _no_payload(name, lmod, payload)
            saw_nullable, spec.nullable = True, True
        elif lmod == "primary_key":
            _no_payload(name, lmod, payload)
            spec.primary_key = True
        elif lmod == "unique":
            _no_payload(name, lmod, payload)
            spec.unique = True
        elif lmod == "description":
            if payload is None:
                raise ValueError(
                    f"column {name}: description requires a value")
            spec.description = _parse_string_payload(payload)
        elif lmod in ("index", "unique_index"):
            kwargs: dict[str, Any] = {}
            if payload:
                for kv in payload.split(","):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        kwargs[k.strip()] = _parse_string_payload(v.strip())
                    elif kv.strip():
                        kwargs["name"] = _parse_string_payload(kv.strip())
            spec.indexes.append(IndexDef(
                name=str(kwargs.pop("name", "")),
                unique=lmod == "unique_index", kwargs=kwargs))
        else:
            raise ValueError(f"column {name}: unknown modifier {mod!r}")
    if saw_not_null and saw_nullable:
        raise ValueError(
            f"column {name}: conflicting modifiers not_null and nullable")
    return spec


def _no_payload(col: str, mod: str, payload: str | None) -> None:
    if payload is not None:
        raise ValueError(f"column {col}: modifier {mod} does not take arguments")


def parse_columns(columns: dict[str, str] | None) -> list[ColumnSpec]:
    """The whole ``columns:`` mapping -> specs."""
    return [parse_modifiers(k, v) for k, v in (columns or {}).items()]


def specs_primary_key(specs: list[ColumnSpec]) -> list[str]:
    return [s.name for s in specs if s.primary_key]


def specs_constraints(specs: list[ColumnSpec]) -> dict[str, str]:
    """Constraint expressions (``value``-relative, like the reference's
    runtime constraints) keyed by column."""
    out = {s.name: s.constraint for s in specs if s.constraint}
    for s in specs:
        if s.nullable is False:
            out.setdefault(s.name, "value is not null")
    return out


def apply_column_specs(df, specs: list[ColumnSpec]):
    """Cast DataFrame columns to the spec types (read-side coercion, the
    same single-projection shape as the ``columns`` override surface)."""
    from pyspark.sql import functions as F

    by_name = {s.name: s for s in specs}
    exprs = []
    changed = False
    for f in df.schema.fields:
        col = F.col(f"`{f.name}`")
        s = by_name.get(f.name)
        if s is not None:
            t = s.spark_type()
            if t != f.dataType:
                col = col.cast(t)
                changed = True
        exprs.append(col.alias(f.name))
    return df.select(*exprs) if changed else df
