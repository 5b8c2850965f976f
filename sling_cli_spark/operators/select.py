"""Column selection / exclusion / rename / glob + column casing.

Re-implements the reference's ``ApplySelect`` semantics
(``core/dbio/iop/datatype.go:2172-2505``):

- ``"col"``            include as-is (pins position in given order)
- ``"col as alias"``   include renamed
- ``"col:type"``       include with a general-type cast
- ``"-col"``           exclude
- ``"pre*"`` / ``"-pre*"``  glob include / exclude
- ``"*"``              everything not otherwise pinned, in source order

If only exclusions (and/or ``*``) are given, the result is source order minus
exclusions. If any positive entry exists, positive entries pin order and a
``*`` expands the remainder at its position.

Column casing (``datatype.go:1808-1906``): snake / upper / lower / camel /
normalize, applied as a ``toDF`` rename so it stays metadata-only (no shuffle,
no projection cost).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sling_cli_spark.types import to_spark_type

_AS_RE = re.compile(r"^(.+?)\s+as\s+(.+)$", re.IGNORECASE)


def parse_select_expr(expr: str) -> tuple[str, str | None, str | None, bool]:
    """-> (name_or_glob, alias, cast_type, is_exclude)"""
    expr = expr.strip()
    exclude = expr.startswith("-")
    if exclude:
        expr = expr[1:].strip()
    alias = None
    m = _AS_RE.match(expr)
    if m:
        expr, alias = m.group(1).strip(), m.group(2).strip()
    cast = None
    if "::" in expr and not expr.startswith("*"):
        expr, cast = expr.rsplit("::", 1)
        expr, cast = expr.strip(), cast.strip()
    elif ":" in expr and not expr.startswith("*"):
        expr, cast = expr.rsplit(":", 1)
        expr, cast = expr.strip(), cast.strip()
    return expr, alias, cast, exclude


def apply_select(df: DataFrame, select: list[str]) -> DataFrame:
    """Apply sling select semantics; returns df unchanged for empty select."""
    if not select:
        return df
    cols = df.columns
    lower_map = {c.lower(): c for c in cols}

    excludes: set[str] = set()
    positives: list[tuple[str, str | None, str | None]] = []  # (name, alias, cast)
    saw_star = False
    for raw in select:
        name, alias, cast, exc = parse_select_expr(raw)
        if name == "*" and not exc:
            saw_star = True
            positives.append(("*", None, None))
            continue
        matched = _glob_match(name, cols, lower_map)
        if exc:
            excludes.update(matched)
        else:
            if "*" in name or "?" in name:
                for c in matched:
                    positives.append((c, None, cast))
            else:
                if not matched:
                    raise ValueError(f"select: column not found: {name!r}")
                positives.append((matched[0], alias, cast))

    only_exclusions = not [p for p in positives if p[0] != "*"]
    out: list[Column] = []
    pinned = {p[0] for p in positives if p[0] != "*"}

    def col_expr(name: str, alias: str | None, cast: str | None) -> Column:
        c = F.col(f"`{name}`")
        if cast:
            c = c.cast(to_spark_type(cast))
        return c.alias(alias or name)

    if only_exclusions:
        keep = [c for c in cols if c not in excludes]
        return df.select(*[F.col(f"`{c}`") for c in keep])

    for name, alias, cast in positives:
        if name == "*":
            for c in cols:
                if c not in pinned and c not in excludes:
                    out.append(F.col(f"`{c}`"))
        elif name not in excludes:
            out.append(col_expr(name, alias, cast))
    if not saw_star and excludes and not positives:
        out = [F.col(f"`{c}`") for c in cols if c not in excludes]
    return df.select(*out)


def _glob_match(pattern: str, cols: list[str], lower_map: dict[str, str]) -> list[str]:
    if "*" in pattern or "?" in pattern:
        return [c for c in cols if fnmatch.fnmatchcase(c.lower(), pattern.lower())]
    hit = lower_map.get(pattern.lower())
    return [hit] if hit else []


# ----------------------------------------------------------------------
# column casing


def _snake(name: str) -> str:
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"[^0-9a-zA-Z_]+", "_", s)
    return re.sub(r"_+", "_", s).lower().strip("_")


def _camel(name: str) -> str:
    parts = re.split(r"[_\W]+", name)
    return parts[0].lower() + "".join(p.title() for p in parts[1:] if p)


def _normalize(name: str) -> str:
    s = re.sub(r"[^0-9a-zA-Z_]+", "_", name)
    return re.sub(r"_+", "_", s).strip("_")


def clean_name(name: str) -> str:
    """Exact CleanName port (datatype.go:871-878): trim, collapse each
    run of non-[_0-9a-zA-Z] to one underscore, prefix a leading digit
    with '_'. Unlike ``_normalize`` (the 'normalize' casing policy,
    which also strips edge underscores), this is the header cleaner
    CSV ingestion applies."""
    s = re.sub(r"[^_0-9a-zA-Z]+", "_", name.strip())
    return "_" + s if re.match(r"^\d", s) else s


def apply_casing(df: DataFrame, casing: str | None) -> DataFrame:
    """snake | upper | lower | camel | normalize | source (no-op)."""
    if not casing or casing in ("source", "target"):
        return df
    fn = {
        "snake": _snake,
        "upper": str.upper,
        "lower": str.lower,
        "camel": _camel,
        "normalize": _normalize,
    }.get(casing)
    if fn is None:
        raise ValueError(f"unknown column casing: {casing!r}")
    renamed = [fn(c) for c in df.columns]
    # disambiguate collisions deterministically
    seen: dict[str, int] = {}
    final = []
    for c in renamed:
        if c in seen:
            seen[c] += 1
            final.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 0
            final.append(c)
    return df.toDF(*final)
