"""``{ expr }`` expression evaluator — the reference's template language.

Reference: ``core/dbio/iop/transforms.go:729-1310`` (Evaluator:
FindMatches / ExtractVars / RenderAny / RenderPayload / Check) and the
function census exercised by ``core/dbio/api/api_test.go:148-214`` and
``transforms_test.go:1600-1760``. Every advanced replication YAML and
API spec routes strings through this: ``{env.VAR}``, ``{state.cursor}``,
``{response.data[-1].id}``, ``{if(env.X, env.X, "default")}``.

Semantics preserved from the reference:

- Expressions are ``{...}`` spans. JSON object keys (``{"key": ...``)
  are NOT expressions — the brace scanner skips them and still finds
  template spans nested inside JSON values.
- When the ENTIRE input is one expression, the TYPED value is returned
  (``"{state.limit}"`` with limit=100 -> int 100). Embedded expressions
  render to strings: nil -> ``""``, dicts/lists -> JSON.
- Simple dotted paths resolve jmespath-style against the state map;
  anything with operators or function calls goes through the expression
  evaluator, falling back to the path lookup on error.
- Missing variables under a known prefix evaluate to nil, not an error
  (FillMissingKeys). With ``keep_missing=True`` the ``{expr}`` text is
  left untouched instead (used when a later stage owns the namespace).
- String concatenation with nil renders ``"nil"`` (api_test.go:161:
  ``"state.missing = " + state.missing`` -> ``"state.missing = nil"``).
- Strings use DOUBLE quotes; a single-quoted string is a hard error
  (transforms.go Check()).
- Unprefixed spans like ``{stream_table}`` are left for the runtime-var
  renderer (config.render_vars) unless they call a function / use
  operators — mirrors the reference's canRender gate.

The expression grammar is compiled through Python's ``ast`` after a
small operator translation (``&&``/``||``/``!``/ternary/null), and
interpreted by a whitelist walker — no ``eval()``, no attribute access
on real objects, only dict/list navigation over the state map.
"""

from __future__ import annotations

import ast
import datetime as _dt
import json
import re
import uuid as _uuid
from typing import Any, Callable, Mapping

_NIL_STR = "nil"  # how nil renders inside string concatenation

DEFAULT_PREFIXES = (
    "env", "state", "secrets", "auth", "response", "request", "sync",
    "store", "source", "target", "stream", "object", "run", "runs",
    "timestamp", "execution", "loop", "params",
)


# ---------------------------------------------------------------- matches

class _Span:
    """One ``{...}`` span: [start, end) includes the braces; ``raw`` is
    the interior verbatim (un-stripped, transforms.go returns it raw);
    ``nested`` means the interior contains a ``{`` OUTSIDE double quotes
    — the reference recurses into such spans (GraphQL bodies) instead of
    treating them as one expression."""

    __slots__ = ("start", "end", "raw", "nested")

    def __init__(self, start: int, end: int, raw: str, nested: bool):
        self.start, self.end, self.raw, self.nested = start, end, raw, nested


def _scan_spans(text: str, strict: bool = False) -> list[_Span]:
    """Spans for each ``{...}`` in ``text``: skips JSON object-key braces,
    honors nesting and double quotes (transforms.go FindMatches). With
    ``strict`` an unterminated ``{`` raises (reference behavior); the
    lenient mode treats it as literal text (render paths see arbitrary
    SQL/YAML where a stray brace must not be fatal)."""
    out: list[_Span] = []
    n, i = len(text), 0
    while i < n:
        if text[i] != "{":
            i += 1
            continue
        # JSON-object detection: { "key": ...  -> not an expression
        j = i + 1
        while j < n and text[j] in " \t\r\n":
            j += 1
        if j < n and text[j] == '"':
            k = j + 1
            while k < n and text[k] != '"':
                k += 2 if text[k] == "\\" else 1
            k += 1
            while k < n and text[k] in " \t\r\n":
                k += 1
            if k < n and text[k] == ":":
                i += 1  # scan inside the JSON object for nested spans
                continue
        depth, k, in_str, nested = 1, i + 1, False, False
        while k < n and depth:
            c = text[k]
            if c == "\\" and k + 1 < n:
                k += 2
                continue
            if c == '"':
                in_str = not in_str
            elif not in_str:
                if c == "{":
                    depth += 1
                    nested = True
                elif c == "}":
                    depth -= 1
            k += 1
        if depth == 0:
            out.append(_Span(i, k, text[i + 1:k - 1], nested))
            i = k
        elif strict:
            raise ExpressionError(f"unclosed bracket in: {text}")
        else:
            i += 1
    return out


def _find_spans(text: str) -> list[tuple[int, int, str]]:
    """Back-compat view: ``(start, end, stripped_expr)`` per span,
    empty expressions dropped (lenient render-path contract)."""
    return [(sp.start, sp.end, sp.raw.strip())
            for sp in _scan_spans(text) if sp.raw.strip()]


def find_matches(text: str) -> list[str]:
    return [expr for _, _, expr in _find_spans(text)]


# ------------------------------------------------------------ path lookup

_IDENT = r"[A-Za-z_]\w*"
_PATH_RE = re.compile(
    rf"^{_IDENT}(\.{_IDENT}|\[-?\d+\]|\[\*\]|\[\]|\[\?[^\]]+\])*$")
_FILTER_RE = re.compile(r"^(\w+)\s*(==|!=)\s*(.+?)\s*$")


def _filter_literal(tok: str) -> Any:
    """JMESPath filter RHS: `json` backtick literal, 'raw' string, or a
    bare number/identifier."""
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == "`" and tok[-1] == "`":
        try:
            return json.loads(tok[1:-1])
        except ValueError:
            return tok[1:-1]
    if len(tok) >= 2 and tok[0] == "'" and tok[-1] == "'":
        return tok[1:-1]
    try:
        return json.loads(tok)
    except ValueError:
        return tok


def search_path(path: str, state: Mapping) -> Any:
    """jmespath-subset lookup: dotted keys, ``[n]`` indexing (negative
    ok), ``[*]`` projection, ``[?field == `lit`]`` filters (the subset
    the reference's specs/tests exercise). Returns None on any miss
    (jmespath contract), never raises."""
    toks = re.findall(rf"{_IDENT}|\[-?\d+\]|\[\*\]|\[\]|\[\?[^\]]+\]",
                      path)
    cur: Any = state

    def descend(node: Any, toks: list[str]) -> Any:
        for t_i, t in enumerate(toks):
            if node is None:
                return None
            if t == "[]":
                # JMESPath flatten-projection: flatten one level, then
                # project the rest over the elements
                if not isinstance(node, list):
                    return None
                flat: list = []
                for x in node:
                    flat.extend(x) if isinstance(x, list) \
                        else flat.append(x)
                rest = toks[t_i + 1:]
                vals = [descend(x, rest) for x in flat]
                return [v for v in vals if v is not None]
            if t == "[*]" or t.startswith("[?"):
                if not isinstance(node, list):
                    return None
                items = node
                if t.startswith("[?"):
                    m = _FILTER_RE.match(t[2:-1])
                    if not m:
                        return None
                    key, op, rhs = m.group(1), m.group(2), \
                        _filter_literal(m.group(3))
                    items = [x for x in node if isinstance(x, Mapping)
                             and ((x.get(key) == rhs) == (op == "=="))]
                rest = toks[t_i + 1:]
                vals = [descend(x, rest) for x in items]
                return [v for v in vals if v is not None]
            if t.startswith("["):
                if not isinstance(node, (list, tuple)):
                    return None
                try:
                    node = node[int(t[1:-1])]
                except IndexError:
                    return None
                continue
            node = node.get(t) if isinstance(node, Mapping) else None
        return node

    return descend(cur, toks)


# ----------------------------------------------------------- function map

def _json_compact(v: Any) -> str:
    """Go ``json.Marshal`` shape: no spaces, map keys sorted."""
    return json.dumps(v, separators=(",", ":"), sort_keys=True, default=str)


def _to_str(v: Any) -> str:
    if v is None:
        return _NIL_STR
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return _json_compact(v)
    return str(v)


def _parse_dt(v: Any) -> _dt.datetime:
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, (int, float)):
        return _dt.datetime.fromtimestamp(v, tz=_dt.timezone.utc)
    return _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))


_FMT_TOKENS = [  # friendly tokens -> strftime (longest first)
    ("YYYY", "%Y"), ("MMM", "%b"), ("MM", "%m"), ("DD", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"), ("YY", "%y"),
]


def _date_format(v: Any, fmt: str) -> str:
    d = _parse_dt(v)
    if "%" not in fmt:
        for tok, rep in _FMT_TOKENS:
            fmt = fmt.replace(tok, rep)
    return d.strftime(fmt)


def _date_diff_fn(a: Any, b: Any, unit: str = "s") -> float:
    """date_diff(later, earlier, unit) in s/m/h/d."""
    secs = (_parse_dt(a) - _parse_dt(b)).total_seconds()
    return secs / {"s": 1, "m": 60, "h": 3600, "d": 86400}.get(unit, 1)


class RequireError(ValueError):
    """Raised by the ``require()`` spec function when a mandatory input
    or secret is missing (api.go: spec `require(inputs.x, "msg")`)."""


def _require_fn(v: Any, msg: str | None = None) -> Any:
    if v is None or v == "":
        raise RequireError(msg or "required value is missing")
    return v


def _object_rename_fn(obj: Any, old: str, new: str) -> Any:
    """object_rename(record, "a", "b"): rename a key preserving the
    record's key order (the reference's processor function used by
    tests/specs/api_select_columns — the renamed key keeps its slot)."""
    if not isinstance(obj, Mapping):
        return obj
    return {(new if k == old else k): v for k, v in obj.items()}


def _date_add_fn(v: Any, n, unit: str = "day") -> str:
    """date_add(value, n, unit) — calendar-aware for year/month (Go
    AddDate semantics the stripe/github specs rely on:
    ``date_add(now(), -1, "year")``), timedelta for day/hour/…"""
    d = _parse_dt(v)
    n = int(n)
    if unit in ("year", "month"):
        months = n * 12 if unit == "year" else n
        mo = d.month - 1 + months
        year, month = d.year + mo // 12, mo % 12 + 1
        import calendar as _cal

        day = min(d.day, _cal.monthrange(year, month)[1])
        return d.replace(year=year, month=month, day=day).isoformat()
    return (d + _dt.timedelta(**{
        {"day": "days", "hour": "hours", "minute": "minutes",
         "second": "seconds", "week": "weeks"}[unit]: n})).isoformat()


def _date_parse_fn(v: Any, fmt: str | None = None) -> Any:
    """date_parse(value[, layout]) -> datetime (layout optional: the
    shared _parse_dt sniffer covers the corpus's ISO shapes). A null
    input returns null (the specs wrap it in coalesce())."""
    if v is None or v == "":
        return None
    if fmt:
        import datetime as _dt

        if "%" not in fmt:
            for tok, rep in _FMT_TOKENS:
                fmt = fmt.replace(tok, rep)
        return _dt.datetime.strptime(str(v), fmt)
    return _parse_dt(v)


def default_functions() -> dict[str, Callable]:
    """The GlobalFunctionMap census (observed across api_test.go and the
    reference docs; exact Go implementations are not in the public tree,
    so these follow the documented/tested behavior)."""
    return {
        "if": lambda c, a, b=None: a if _truthy(c) else b,
        "if_": lambda c, a, b=None: a if _truthy(c) else b,  # parsed alias
        "coalesce": lambda *a: next(
            (x for x in a if x is not None and x != ""), None),
        "value": lambda *a: next((x for x in a if x is not None), None),
        "now": lambda: _dt.datetime.now(_dt.timezone.utc)
                        .isoformat(timespec="seconds"),
        "timestamp": lambda *a: int(_parse_dt(a[0]).timestamp()) if a
                        else int(_dt.datetime.now(_dt.timezone.utc).timestamp()),
        "today": lambda: _dt.datetime.now(_dt.timezone.utc)
                        .strftime("%Y-%m-%d"),
        "date_format": _date_format,
        "date_add": _date_add_fn,
        "int_range": lambda a, b, step=1: list(range(int(a), int(b) + (1 if step > 0 else -1), int(step))),
        "length": lambda v: len(v) if v is not None else 0,
        "log": _to_str,  # returns its rendering; callers print via logging
        "jmespath": _jmespath_on,
        "contains": lambda hay, needle: needle in hay if hay is not None else False,
        "upper": lambda s: _to_str(s).upper(),
        "lower": lambda s: _to_str(s).lower(),
        "trim": lambda s: _to_str(s).strip(),
        "replace": lambda s, old, new: _to_str(s).replace(old, new),
        "split": lambda s, sep: _to_str(s).split(sep),
        "join": lambda xs, sep: sep.join(_to_str(x) for x in xs or []),
        "substring": lambda s, a, b=None: _to_str(s)[int(a):None if b is None else int(b)],
        "int_parse": lambda v: int(float(v)),
        "float_parse": float,
        # bool_parse / date_parse: goval casts used across the
        # reference's replication corpus checks (r.75, r.120)
        "bool_parse": lambda v: (
            v if isinstance(v, bool)
            else str(v).strip().lower() in ("true", "1", "t", "yes")),
        "date_parse": _date_parse_fn,
        "require": _require_fn,
        "json_parse": lambda s: (
            s if not isinstance(s, (str, bytes)) else json.loads(s)),
        "object_rename": _object_rename_fn,
        # object("k1", v1, "k2", v2) -> dict (github.yaml queue payloads)
        "object": lambda *a: {str(a[i]): a[i + 1]
                              for i in range(0, len(a) - 1, 2)},
        "uuid": lambda: str(_uuid.uuid4()),
        "is_null": lambda v: v is None,
        "is_empty": lambda v: v is None or v == "" or v == [] or v == {},
        "get": lambda obj, key, default=None: (
            obj.get(key, default) if isinstance(obj, Mapping) else default),
        "keys": lambda obj: sorted(obj.keys()) if isinstance(obj, Mapping) else [],
        # pluck(rows, "col") -> [row[col], ...] (p.32 ordinal checks)
        "pluck": lambda rows, key: [
            r.get(key) if isinstance(r, Mapping) else None
            for r in (rows or [])],
        "values": lambda obj: list(obj.values()) if isinstance(obj, Mapping) else [],
        "min": lambda *a: min(a[0] if len(a) == 1 else a),
        "max": lambda *a: max(a[0] if len(a) == 1 else a),
        "sum": lambda xs: sum(xs or []),
        "abs": abs,
        "greatest": lambda *a: max(a),
        "least": lambda *a: min(a),
        "pretty_table": lambda rows: json.dumps(rows, indent=2, default=str),
        # pipeline-corpus functions (p.33 regex assertions, p.36 timing)
        "regex_match": lambda s, pat: bool(
            re.search(pat, "" if s is None else str(s))),
        "date_diff": _date_diff_fn,
        "type_of": lambda v: (
            "nil" if v is None else
            "bool" if isinstance(v, bool) else
            "int64" if isinstance(v, int) else
            "float64" if isinstance(v, float) else
            "string" if isinstance(v, str) else
            type(v).__name__),
        "encode_url": lambda s: __import__("urllib.parse", fromlist=["quote"]).quote(_to_str(s), safe=""),
        "encode_base64": lambda s: __import__("base64").b64encode(
            _to_str(s).encode()).decode(),
        "decode_base64": lambda s: __import__("base64").b64decode(
            _to_str(s)).decode(),
        "cast": _cast,
        "concat": lambda *a: "".join(_to_str(x) for x in a),
        "format": _format,
    }


def _cast(v: Any, typ: str) -> Any:
    """cast(value, "string"|"int"|"float"|"bool") — transforms_test.go's
    ``cast(state.limit, "string")`` census."""
    t = str(typ).lower()
    if t in ("string", "str", "text"):
        return _to_str(v) if v is not None else None
    if t in ("int", "integer", "bigint"):
        return int(float(v))
    if t in ("float", "double", "decimal", "number"):
        return float(v)
    if t in ("bool", "boolean"):
        return _truthy(v) if not isinstance(v, str) else \
            v.strip().lower() in ("true", "1", "yes", "y", "t")
    raise ExpressionError(f"cast: unknown type {typ!r}")


def _format(fmt: Any, *args: Any) -> str:
    """Go-style ``format("a {} b", x)``: positional ``{}`` fill-ins."""
    out = _to_str(fmt)
    for a in args:
        out = out.replace("{}", _to_str(a), 1)
    return out


def _jmespath_on(obj: Any, path: str) -> Any:
    root = {"r": obj}
    p = path.lstrip(".")
    if p.startswith("["):
        return search_path("r" + p, root)
    return search_path("r." + p, root)


def _truthy(v: Any) -> bool:
    if v is None or v == "" or v is False:
        return False
    return True


# -------------------------------------------------------- expression eval

class ExpressionError(ValueError):
    pass


_TERNARY_SPLIT = re.compile(r"[?:]")


def _translate(expr: str) -> str:
    """goval-ish operators -> Python-parsable source, leaving double-
    quoted strings untouched."""
    out, i, n = [], 0, len(expr)
    while i < n:
        c = expr[i]
        if c == "'":
            raise ExpressionError(
                "cannot use single quotes (') for strings in expression, "
                f'use double quotes ("): {expr}')
        if c == '"':  # copy the string literal verbatim
            j = i + 1
            while j < n and expr[j] != '"':
                j += 2 if expr[j] == "\\" else 1
            out.append(expr[i:j + 1])
            i = j + 1
            continue
        two = expr[i:i + 2]
        if two == "&&":
            out.append(" and ")
            i += 2
        elif two == "||":
            out.append(" or ")
            i += 2
        elif c == "!" and two != "!=":
            out.append(" not ")
            i += 1
        else:
            out.append(c)
            i += 1
    s = "".join(out)
    s = _sub_outside_strings(s, r"\bnull\b", "None")
    s = _sub_outside_strings(s, r"\bnil\b", "None")
    s = _sub_outside_strings(s, r"\btrue\b", "True")
    s = _sub_outside_strings(s, r"\bfalse\b", "False")
    # function names that are Python keywords: if(...) -> if_(...)
    s = _sub_outside_strings(s, r"\bif\s*\(", "if_(")
    return _rewrite_ternary(s)


def _sub_outside_strings(s: str, pattern: str, repl: str) -> str:
    parts = re.split(r'("(?:\\.|[^"\\])*")', s)
    return "".join(p if i % 2 else re.sub(pattern, repl, p)
                   for i, p in enumerate(parts))


def _rewrite_ternary(s: str) -> str:
    """``cond ? a : b`` -> ``(a) if (cond) else (b)``, outside quotes,
    innermost-first via recursion on the branches."""
    depth, in_str, q_pos = 0, False, -1
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':
            in_str = not in_str
        elif not in_str:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif c == "?" and depth == 0:
                q_pos = i
                break
        i += 1
    if q_pos < 0:
        # no top-level '?' — but a PARENTHESIZED ternary hides its '?'
        # at depth>0 (`a ? b : (c ? d : e)`): rewrite inside each
        # top-level paren group (corpus r.44 nested-ternary transforms)
        return _rewrite_ternary_in_groups(s)
    # find the matching top-level ':'
    depth, in_str = 0, False
    j = q_pos + 1
    while j < n:
        c = s[j]
        if c == '"':
            in_str = not in_str
        elif not in_str:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif c == ":" and depth == 0:
                break
        j += 1
    if j >= n:
        raise ExpressionError(f"ternary '?' without ':' in: {s}")
    cond = s[:q_pos].strip()
    a = _rewrite_ternary(s[q_pos + 1:j].strip())
    b = _rewrite_ternary(s[j + 1:].strip())
    return f"(({a}) if ({_rewrite_ternary_in_groups(cond)}) else ({b}))"


def _rewrite_ternary_in_groups(s: str) -> str:
    """Apply :func:`_rewrite_ternary` inside every top-level ``(...)``
    group of ``s`` (quote-aware); no-op when no '?' is present."""
    if "?" not in s:
        return s
    out, i, n = [], 0, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if c == '"':
            in_str = not in_str
            out.append(c)
            i += 1
            continue
        if c == "(" and not in_str:
            depth, j = 1, i + 1
            q = False
            while j < n and depth:
                cj = s[j]
                if cj == '"':
                    q = not q
                elif not q:
                    if cj == "(":
                        depth += 1
                    elif cj == ")":
                        depth -= 1
                j += 1
            inner = s[i + 1:j - 1]
            out.append("(" + _rewrite_ternary(inner) + ")")
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare,
    ast.Call, ast.IfExp, ast.Name, ast.Attribute, ast.Subscript,
    ast.Constant, ast.List, ast.Dict, ast.Tuple, ast.Slice, ast.Load,
    ast.And, ast.Or, ast.Not, ast.USub, ast.UAdd,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.FloorDiv,
    ast.Pow, ast.BitOr, ast.BitAnd, ast.BitXor, ast.LShift, ast.RShift,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn, ast.keyword,
)


def _loose_eq(a, b) -> bool:
    """goval-style coerced equality: database records surface as typed
    OR stringly values depending on the driver, and the corpus compares
    both ways (`store.x[0].cnt == 0` vs `int_parse(store.x[0].cnt)`,
    `exec_rendered == "true"` on a bool) — bool<->"true"/"false" and
    number<->numeric-string coerce before comparing."""
    if a == b:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        def as_bool(v):
            if isinstance(v, bool):
                return v
            if isinstance(v, str) and v.strip().lower() in (
                    "true", "false"):
                return v.strip().lower() == "true"
            if isinstance(v, (int, float)) and v in (0, 1):
                return bool(v)
            return None
        ab, bb = as_bool(a), as_bool(b)
        if ab is not None and bb is not None:
            return ab == bb
        return False
    if isinstance(a, (int, float)) != isinstance(b, (int, float)):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return False


class _Interp(ast.NodeVisitor):
    """Whitelist interpreter over the translated AST: names resolve in
    the state map (missing -> None), attributes navigate dicts,
    ``+`` string-concats with nil -> "nil" (reference behavior)."""

    def __init__(self, state: Mapping, functions: Mapping[str, Callable]):
        self.state = state
        self.functions = functions

    def run(self, node: ast.AST) -> Any:
        for sub in ast.walk(node):
            if not isinstance(sub, _ALLOWED_NODES):
                raise ExpressionError(
                    f"disallowed syntax {type(sub).__name__} in expression")
        return self.visit(node)

    def visit_Expression(self, node):
        return self.visit(node.body)

    def visit_Constant(self, node):
        return node.value

    def visit_Name(self, node):
        if node.id in self.functions:
            return self.functions[node.id]
        return self.state.get(node.id) if isinstance(self.state, Mapping) else None

    def visit_Attribute(self, node):
        base = self.visit(node.value)
        if isinstance(base, Mapping):
            return base.get(node.attr)
        return None

    def visit_Subscript(self, node):
        base = self.visit(node.value)
        if base is None:
            raise ExpressionError("index into nil")
        if isinstance(node.slice, ast.Slice):
            lo = self.visit(node.slice.lower) if node.slice.lower else None
            hi = self.visit(node.slice.upper) if node.slice.upper else None
            return base[lo:hi]
        idx = self.visit(node.slice)
        if isinstance(base, Mapping):
            return base.get(idx)
        return base[idx]  # IndexError propagates (jmespath fallback catches)

    def visit_Call(self, node):
        fn = self.visit(node.func)
        if not callable(fn):
            name = getattr(node.func, "id", getattr(node.func, "attr", "?"))
            raise ExpressionError(f"unknown function: {name}")
        args = [self.visit(a) for a in node.args]
        kwargs = {k.arg: self.visit(k.value) for k in node.keywords}
        return fn(*args, **kwargs)

    def visit_BoolOp(self, node):
        if isinstance(node.op, ast.And):
            v = True
            for x in node.values:
                v = self.visit(x)
                if not _truthy(v):
                    return v
            return v
        v = None
        for x in node.values:
            v = self.visit(x)
            if _truthy(v):
                return v
        return v

    def visit_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.Not):
            return not _truthy(v)
        if isinstance(node.op, ast.USub):
            return -v
        return +v

    def visit_IfExp(self, node):
        return self.visit(node.body) if _truthy(self.visit(node.test)) \
            else self.visit(node.orelse)

    def visit_BinOp(self, node):
        lhs, rhs = self.visit(node.left), self.visit(node.right)
        op = node.op
        if isinstance(op, ast.Add):
            if isinstance(lhs, str) or isinstance(rhs, str):
                return _to_str(lhs) + _to_str(rhs)
            if lhs is None or rhs is None:
                raise ExpressionError("arithmetic on nil")
            return lhs + rhs
        if lhs is None or rhs is None:
            raise ExpressionError("arithmetic on nil")
        if isinstance(op, ast.Sub):
            return lhs - rhs
        if isinstance(op, ast.Mult):
            return lhs * rhs
        if isinstance(op, ast.Div):
            return lhs / rhs
        if isinstance(op, ast.Mod):
            return lhs % rhs
        if isinstance(op, ast.FloorDiv):
            return lhs // rhs
        if isinstance(op, ast.Pow):
            return lhs ** rhs
        if isinstance(op, ast.BitOr):
            return lhs | rhs
        if isinstance(op, ast.BitAnd):
            return lhs & rhs
        if isinstance(op, ast.BitXor):
            return lhs ^ rhs
        if isinstance(op, ast.LShift):
            return lhs << rhs
        return lhs >> rhs

    def visit_Compare(self, node):
        lhs = self.visit(node.left)
        for op, cmp_node in zip(node.ops, node.comparators):
            rhs = self.visit(cmp_node)
            if isinstance(op, ast.Eq):
                ok = _loose_eq(lhs, rhs)
            elif isinstance(op, ast.NotEq):
                ok = not _loose_eq(lhs, rhs)
            elif isinstance(op, ast.In):
                ok = rhs is not None and lhs in rhs
            elif isinstance(op, ast.NotIn):
                ok = rhs is None or lhs not in rhs
            else:
                if lhs is None or rhs is None:
                    return False
                if isinstance(op, ast.Lt):
                    ok = lhs < rhs
                elif isinstance(op, ast.LtE):
                    ok = lhs <= rhs
                elif isinstance(op, ast.Gt):
                    ok = lhs > rhs
                else:
                    ok = lhs >= rhs
            if not ok:
                return False
            lhs = rhs
        return True

    def visit_List(self, node):
        return [self.visit(x) for x in node.elts]

    def visit_Tuple(self, node):
        return tuple(self.visit(x) for x in node.elts)

    def visit_Dict(self, node):
        return {self.visit(k): self.visit(v)
                for k, v in zip(node.keys, node.values)}

    def generic_visit(self, node):
        raise ExpressionError(f"disallowed syntax {type(node).__name__}")


# -------------------------------------------------------------- evaluator

_OPS_HINT = re.compile(
    r"==|!=|<=|>=|&&|\|\||[<>+\-*/%?\[!]| in ")
_FUNC_HINT = re.compile(rf"\b({_IDENT})\s*\(")


class Evaluator:
    """RenderAny / RenderPayload / Evaluate over a namespaced state map.

    ``state`` maps namespace -> dict (``{"env": {...}, "state": {...}}``)
    plus any root-level values. ``extras`` passed per-call override.
    """

    def __init__(
        self,
        state: Mapping | None = None,
        var_prefixes: tuple[str, ...] = DEFAULT_PREFIXES,
        functions: Mapping[str, Callable] | None = None,
        keep_missing: bool = False,
        allow_no_prefix: bool | None = None,
    ):
        self.state = dict(state or {})
        self.prefixes = tuple(var_prefixes)
        self.functions = dict(default_functions())
        if functions:
            self.functions.update(functions)
        self.keep_missing = keep_missing
        # AllowNoPrefix (transforms.go): True renders bare `{MY_VAR}`
        # spans from root state (missing -> nil); False never renders
        # bare-identifier spans. None = auto: render only when the bare
        # name is present in state (the engine's internal contract —
        # `{stream_table}` runtime vars stay intact for config.render_vars).
        self.allow_no_prefix = allow_no_prefix

    # -- public -----------------------------------------------------------

    def evaluate(self, expr: str, extras: Mapping | None = None) -> Any:
        state = self._merged(extras)
        # pure path? jmespath lookup first (fast, never raises)
        if _PATH_RE.match(expr) and not self._calls_function(expr):
            return search_path(expr, state)
        try:
            tree = ast.parse(_translate(expr).strip(), mode="eval")
        except SyntaxError as e:
            raise ExpressionError(f"could not parse expression: {expr}") from e
        try:
            return _Interp(state, self.functions).run(tree)
        except ExpressionError:
            # goval-failure -> jmespath fallback (transforms.go:1125-1140)
            val = search_path(expr, state) if _PATH_RE.match(expr) else None
            if val is not None:
                return val
            raise

    def render(self, value: Any, extras: Mapping | None = None) -> Any:
        """RenderPayload: recurse into dict/list; strings get expression
        spans rendered (typed when the whole string is one span).
        Non-string map keys stringify (Go round-trips payloads through
        json.Marshal, so ``123``/``true`` keys become ``"123"``/``"true"``)."""
        if isinstance(value, Mapping):
            # string KEYS render too (replication stream keys like
            # `file://{env.WORK}/src.json`, p.33); non-renderable spans
            # ({part_*} masks, runtime vars) stay intact as always
            return {(self.render_string(k, extras) if isinstance(k, str)
                     and "{" in k else
                     k if isinstance(k, str) else _to_str(k)):
                    self.render(v, extras) for k, v in value.items()}
        if isinstance(value, (list, tuple)):
            return [self.render(v, extras) for v in value]
        if not isinstance(value, str):
            return value
        return self._render_str(value, extras)

    def render_string(self, value: Any, extras: Mapping | None = None) -> str:
        out = self.render(value, extras)
        if out is None:
            return ""
        if isinstance(out, (dict, list)):
            return _json_compact(out)
        if isinstance(out, bool):
            return "true" if out else "false"
        return str(out)

    def check(self, expression: str) -> None:
        """transforms.go Check(): reject single-quoted strings, unclosed
        double quotes, and unbalanced parentheses. Quote errors win over
        parenthesis errors (the reference validates quotes first)."""
        in_str, depth = False, 0
        i, n = 0, len(expression)
        while i < n:
            c = expression[i]
            if in_str:
                if c == "\\":
                    i += 2
                    continue
                if c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "'":
                raise ExpressionError(
                    "cannot use single quotes (') for strings in "
                    f'expression, use double quotes ("): {expression}')
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    raise ExpressionError(
                        f"unmatched closing parenthesis in: {expression}")
            i += 1
        if in_str:
            raise ExpressionError(
                f"unclosed double quote in: {expression}")
        if depth > 0:
            raise ExpressionError(f"unclosed parenthesis in: {expression}")

    def find_matches(self, text: str) -> list[str]:
        """transforms.go Evaluator.FindMatches: raw (un-stripped) span
        interiors; spans whose interior holds an unquoted ``{`` are
        recursed into instead of returned whole (GraphQL bodies); raises
        on an unclosed ``{``."""
        out: list[str] = []

        def walk(t: str) -> None:
            for sp in _scan_spans(t, strict=True):
                if sp.nested:
                    walk(sp.raw)
                else:
                    out.append(sp.raw)

        walk(text)
        return out

    def extract_vars(self, expr: str) -> list[str]:
        """transforms.go ExtractVars: dotted references under a known
        prefix (duplicates preserved), skipping string-literal contents;
        with ``allow_no_prefix`` also bare identifiers that are not
        prefixes, functions, keywords, or call heads."""
        masked = re.sub(r'"(?:\\.|[^"\\])*"', '""', expr)
        out: list[str] = []
        for m in re.finditer(rf"\b({_IDENT})((?:\.{_IDENT})*)", masked):
            head, rest = m.group(1), m.group(2)
            if rest:
                if head in self.prefixes:
                    out.append(head + rest)
                continue
            if not self.allow_no_prefix:
                continue
            if head in self.prefixes or head in self.functions or \
                    head in ("true", "false", "null", "nil"):
                continue
            if re.match(r"\s*\(", masked[m.end():]):
                continue  # function-call head
            out.append(head)
        return out

    def fill_missing_keys(
        self, initial_state: Mapping | None, vars_to_check: list[str],
    ) -> dict:
        """transforms.go FillMissingKeys: ensure every referenced var
        resolves (missing leaves -> None) so evaluation sees nil instead
        of erroring. Unknown prefixes and non-map intermediates skip."""
        state = initial_state if initial_state is not None else {}
        for var in vars_to_check:
            parts = var.split(".")
            if len(parts) == 1:
                if self.allow_no_prefix and parts[0] not in self.prefixes:
                    state.setdefault(parts[0], None)
                continue
            if parts[0] not in self.prefixes:
                continue
            node = state
            ok = True
            for p in parts[:-1]:
                nxt = node.get(p)
                if nxt is None:
                    nxt = {}
                    node[p] = nxt
                elif not isinstance(nxt, dict):
                    ok = False
                    break
                node = nxt
            if ok and parts[-1] not in node:
                node[parts[-1]] = None
        return state

    # -- internals --------------------------------------------------------

    def _merged(self, extras: Mapping | None) -> dict:
        state = dict(self.state)
        if extras:
            state.update(extras)
        state.setdefault("null", None)
        return state

    def _calls_function(self, expr: str) -> bool:
        return any(m.group(1) in self.functions
                   for m in _FUNC_HINT.finditer(expr))

    def _renderable(self, expr: str) -> bool:
        """canRender: known prefix usage, a registered function call, or
        evaluation operators. Bare ``{stream_table}`` spans are left for
        the runtime-var renderer unless ``allow_no_prefix`` is True
        (then every bare identifier renders, missing -> nil) or auto
        (None: render only names present in state)."""
        for p in self.prefixes:
            if re.search(rf"\b{p}\.", expr):
                return True
        if self._calls_function(expr):
            return True
        head = expr.split(".", 1)[0]
        if head in self.prefixes:
            return True
        if self.allow_no_prefix is False:
            pass  # bare identifiers never render
        elif self.allow_no_prefix and re.fullmatch(_IDENT, expr):
            return True
        elif self.allow_no_prefix is None and head in self.state:
            return True
        return bool(_OPS_HINT.search(_strip_strings(expr)))

    def _has_missing_var(self, expr: str, extras: Mapping | None) -> bool:
        """KeepMissingExpr gate: does the expression reference a
        prefixed variable absent from (or nil in) the state? The
        reference keeps the whole span intact in that case, even when
        the expression would evaluate (``{ upper(state.email) }``)."""
        state = self._merged(extras)
        return any(search_path(var, state) is None
                   for var in self.extract_vars(expr))

    def _render_str(self, text: str, extras: Mapping | None) -> Any:
        spans = _scan_spans(text)
        if not spans:
            return text
        whole = (len(spans) == 1 and not spans[0].nested
                 and text.strip() == text[spans[0].start:spans[0].end])
        pieces: list[str] = []
        last = 0
        for sp in spans:
            if sp.nested:
                # unquoted nested braces (GraphQL bodies): recurse into
                # the interior, preserve the outer braces verbatim
                inner = self._render_str(sp.raw, extras)
                pieces.append(text[last:sp.start])
                pieces.append("{" + _render_piece(inner) + "}")
                last = sp.end
                continue
            expr = sp.raw.strip()
            if not expr or not self._renderable(expr):
                continue
            if self.keep_missing and self._has_missing_var(expr, extras):
                continue
            try:
                value = self.evaluate(expr, extras)
            except ExpressionError as e:
                if self.keep_missing:
                    continue
                if "could not parse expression" in str(e) and not any(
                        re.search(rf"\b{p}\.", expr)
                        for p in self.prefixes):
                    # non-expression braces WITHOUT namespace refs (a
                    # yaml/json-ish literal like `{ type: local, url:
                    # file:///base }`, p.17) stay verbatim; a broken
                    # expression that DOES reference state/env still
                    # errors (transforms_test.go invalid_expression
                    # vector)
                    continue
                raise
            if whole:
                return value  # typed passthrough
            pieces.append(text[last:sp.start])
            pieces.append("" if value is None else _render_piece(value))
            last = sp.end
        pieces.append(text[last:])
        return "".join(pieces)


def _render_piece(value: Any) -> str:
    """String form of a rendered value inside a larger string."""
    if isinstance(value, (dict, list)):
        return _json_compact(value)
    if value is True:
        return "true"
    if value is False:
        return "false"
    return str(value)


def _strip_strings(expr: str) -> str:
    return re.sub(r'"(\\.|[^"\\])*"', '""', expr)


def render(value: Any, state: Mapping | None = None, **kw) -> Any:
    """One-shot convenience: ``render("{state.x}", {"state": {"x": 1}})``."""
    return Evaluator(state=state, **kw).render(value)
