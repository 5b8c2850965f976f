"""goval-expression → Catalyst Column compiler.

The reference's STAGED stream transforms (`transforms:` as a LIST of
stages, each mapping column → goval expression over ``value`` /
``record.<col>`` — config surface pinned by the corpus cases
r.44.staged_transforms_test.yaml and
r.97.delete_missing_with_transforms.yaml; the OSS build stubs the
executor, transforms.go:126) evaluate one expression per output column
per row. Here each expression COMPILES to a Catalyst Column — the whole
stage is one ``select`` projection, JVM-side, codegen'd, zero Python in
the row path. At 100 TB a stage is a narrow map over the scan exactly
like any built-in projection.

Pipeline: ``expressions._translate`` normalizes the goval operators
(&&/||/!/ternary/null) into a Python-parsable string; ``ast.parse``
gives the tree; :class:`_ColumnCompiler` folds it into Columns.

String ``+`` is concatenation when either operand is string-typed
(string literal, a string column per the input schema, or a
string-producing function) — goval's `record.a + " " + record.b`;
numeric operands keep arithmetic ``+``.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExprCompileError(ValueError):
    pass


# strftime → java.time tokens (the date_format function surface)
_STRFTIME = [
    ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"), ("%H", "HH"),
    ("%M", "mm"), ("%S", "ss"), ("%f", "SSSSSS"), ("%y", "yy"),
    ("%j", "DDD"), ("%z", "xx"),
]


def _java_fmt(fmt: str) -> str:
    if "%" in fmt:
        for a, b in _STRFTIME:
            fmt = fmt.replace(a, b)
    return fmt


_CAST_TYPES = {
    "string": "string", "text": "string", "integer": "bigint",
    "int": "bigint", "bigint": "bigint", "float": "double",
    "double": "double", "decimal": "decimal(24,6)", "bool": "boolean",
    "boolean": "boolean", "timestamp": "timestamp", "datetime": "timestamp",
    "date": "date",
}

_STRINGY_FNS = {
    "upper", "lower", "trim_space", "trim", "date_format", "hash",
    "concat", "replace", "substring", "remove_diacritics", "cast_string",
}


def _is_stringy(node: ast.AST, str_cols: set[str]) -> bool:
    if isinstance(node, ast.Constant):
        return isinstance(node.value, str)
    if isinstance(node, ast.Attribute):  # record.x
        return node.attr in str_cols
    if isinstance(node, ast.Name):
        return node.id in str_cols or node.id == "value_str"
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        name = node.func.id
        if name == "cast":
            t = node.args[1].value if len(node.args) > 1 and isinstance(
                node.args[1], ast.Constant) else ""
            return str(t) in ("string", "text")
        if name in ("coalesce", "value", "if_", "first_valid"):
            return any(_is_stringy(a, str_cols) for a in node.args)
        return name in _STRINGY_FNS
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        return (_is_stringy(node.left, str_cols)
                or _is_stringy(node.right, str_cols))
    if isinstance(node, ast.IfExp):
        return (_is_stringy(node.body, str_cols)
                or _is_stringy(node.orelse, str_cols))
    return False


class _ColumnCompiler:
    """One expression → one Column, against a known input schema."""

    def __init__(self, df: DataFrame, value_col: str | None):
        self.columns = {c.lower(): c for c in df.columns}
        self._dtypes = df.dtypes
        self.str_cols = {f.name for f in df.schema.fields
                         if f.dataType.typeName() == "string"}
        self.str_cols |= {f.name.lower() for f in df.schema.fields
                          if f.dataType.typeName() == "string"}
        self.value_col = value_col
        if value_col and value_col in self.str_cols:
            self.str_cols.add("value")

    def compile(self, expr: str) -> Column:
        from sling_cli_spark.expressions import _translate

        try:
            tree = ast.parse(_translate(expr).strip(), mode="eval")
        except SyntaxError as e:
            raise ExprCompileError(
                f"could not parse transform expression: {expr}") from e
        return self._walk(tree.body)

    # -- node handlers ----------------------------------------------------

    def _col(self, name: str) -> Column:
        actual = self.columns.get(name.lower())
        if actual is None:
            raise ExprCompileError(f"unknown column in transform: {name!r}")
        return F.col(f"`{actual}`")

    def _walk(self, n: ast.AST) -> Column:
        if isinstance(n, ast.Constant):
            return F.lit(n.value)
        if isinstance(n, ast.Name):
            if n.id == "value":
                return (self._col(self.value_col) if self.value_col
                        and self.value_col.lower() in self.columns
                        else F.lit(None))
            return self._col(n.id)
        if isinstance(n, ast.Attribute):
            # record.x / env.x — record resolves to the stage's input row
            base = n.value
            if isinstance(base, ast.Name) and base.id == "record":
                return self._col(n.attr)
            raise ExprCompileError(
                f"unsupported reference: {ast.dump(n)[:60]}")
        if isinstance(n, ast.BoolOp):
            cols = [self._as_bool(self._walk(v)) for v in n.values]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if isinstance(n.op, ast.And) else (out | c)
            return out
        if isinstance(n, ast.UnaryOp):
            v = self._walk(n.operand)
            if isinstance(n.op, ast.Not):
                return ~self._as_bool(v)
            if isinstance(n.op, ast.USub):
                return -v
            raise ExprCompileError("unsupported unary op")
        if isinstance(n, ast.Compare):
            if len(n.ops) != 1:
                raise ExprCompileError("chained comparisons unsupported")
            left, op, right = self._walk(n.left), n.ops[0], self._walk(
                n.comparators[0])
            if isinstance(op, ast.Eq):
                return left == right
            if isinstance(op, ast.NotEq):
                return left != right
            if isinstance(op, ast.Gt):
                return left > right
            if isinstance(op, ast.GtE):
                return left >= right
            if isinstance(op, ast.Lt):
                return left < right
            if isinstance(op, ast.LtE):
                return left <= right
            if isinstance(op, ast.In):
                items = n.comparators[0]
                if isinstance(items, (ast.List, ast.Tuple)):
                    return left.isin(*[self._const(e) for e in items.elts])
            raise ExprCompileError("unsupported comparison")
        if isinstance(n, ast.BinOp):
            if isinstance(n.op, ast.Add) and _is_stringy(n, self.str_cols):
                return F.concat(self._as_str(self._walk(n.left)),
                                self._as_str(self._walk(n.right)))
            left, right = self._walk(n.left), self._walk(n.right)
            if isinstance(n.op, ast.Add):
                return left + right
            if isinstance(n.op, ast.Sub):
                return left - right
            if isinstance(n.op, ast.Mult):
                return left * right
            if isinstance(n.op, ast.Div):
                return left / right
            if isinstance(n.op, ast.Mod):
                return left % right
            raise ExprCompileError("unsupported operator")
        if isinstance(n, ast.IfExp):
            body, orelse = self._walk(n.body), self._walk(n.orelse)
            sb = _is_stringy(n.body, self.str_cols)
            so = _is_stringy(n.orelse, self.str_cols)
            if sb != so:
                # goval ternaries are untyped; Spark's branch coercion
                # would promote string-vs-decimal to DOUBLE and mangle
                # values ("1" -> "1.0") — cast both branches to string
                # explicitly (transform results are text in the
                # reference's stream processor)
                body, orelse = body.cast("string"), orelse.cast("string")
            return F.when(self._as_bool(self._walk(n.test)),
                          body).otherwise(orelse)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name):
            return self._call(n.func.id, n)
        raise ExprCompileError(
            f"unsupported expression node: {type(n).__name__}")

    @staticmethod
    def _const(n: ast.AST):
        if not isinstance(n, ast.Constant):
            raise ExprCompileError("list items must be literals")
        return n.value

    @staticmethod
    def _as_bool(c: Column) -> Column:
        return c.cast("boolean")

    @staticmethod
    def _as_str(c: Column) -> Column:
        return F.coalesce(c.cast("string"), F.lit(""))

    def _static_type_of(self, node: ast.AST) -> str:
        """goval type names for the operand's compile-time Spark type."""
        name = None
        if isinstance(node, ast.Name):
            name = self.value_col if node.id == "value" else node.id
        elif isinstance(node, ast.Attribute) and isinstance(
                node.value, ast.Name) and node.value.id == "record":
            name = node.attr
        if name is None:
            return "string"
        actual = self.columns.get(name.lower())
        if actual is None:
            return "nil"
        from pyspark.sql import functions as _F  # noqa: F401
        t = dict(self._dtypes).get(actual, "string")
        if t in ("bigint", "int", "smallint", "tinyint", "long"):
            return "int64"
        if t in ("double", "float") or t.startswith("decimal"):
            return "float64"
        if t == "boolean":
            return "bool"
        if t.startswith("timestamp") or t == "date":
            return "time"
        return "string"

    # -- function registry --------------------------------------------------

    def _call(self, name: str, n: ast.Call) -> Column:
        a = [self._walk(x) for x in n.args]

        def lit_arg(i: int, default=None):
            if len(n.args) > i and isinstance(n.args[i], ast.Constant):
                return n.args[i].value
            return default

        if name in ("coalesce", "first_valid", "value"):
            return F.coalesce(*a)
        if name == "if_":
            return F.when(self._as_bool(a[0]), a[1]).otherwise(
                a[2] if len(a) > 2 else F.lit(None))
        if name == "upper":
            return F.upper(a[0])
        if name == "lower":
            return F.lower(a[0])
        if name in ("trim", "trim_space"):
            return F.trim(a[0])
        if name == "length":
            return F.length(a[0].cast("string"))
        if name == "abs":
            return F.abs(a[0])
        if name == "greatest":
            return F.greatest(*a)
        if name == "least":
            return F.least(*a)
        if name == "now":
            return F.current_timestamp()
        if name == "today":
            return F.current_date()
        if name == "int_parse":
            return a[0].cast("double").cast("bigint")
        if name == "float_parse":
            return a[0].cast("double")
        if name == "bool_parse":
            return F.lower(a[0].cast("string")).isin(
                "true", "1", "t", "yes")
        if name == "date_parse":
            return a[0].cast("timestamp")
        if name == "date_format":
            return F.date_format(a[0].cast("timestamp"),
                                 _java_fmt(str(lit_arg(1, "%Y-%m-%d"))))
        if name == "cast":
            t = _CAST_TYPES.get(str(lit_arg(1, "string")).lower())
            if not t:
                raise ExprCompileError(f"cast: unknown type {lit_arg(1)!r}")
            return a[0].cast(t)
        if name == "hash":
            algo = str(lit_arg(1, "md5")).lower()
            s = a[0].cast("string")
            if algo == "md5":
                return F.md5(s)
            if algo in ("sha256", "sha-256"):
                return F.sha2(s, 256)
            if algo in ("sha512", "sha-512"):
                return F.sha2(s, 512)
            raise ExprCompileError(f"hash: unknown algo {algo!r}")
        if name == "type_of":
            # STATIC: the operand's Spark type is known at compile time,
            # so the branch folds to a literal — goval's non-short-
            # circuit ternary bug (p.23.ternary_length_mixed_types)
            # cannot reproduce: the dead branch never runs
            return F.lit(self._static_type_of(n.args[0]))
        if name == "is_null":
            return a[0].isNull()
        if name == "is_empty":
            return a[0].isNull() | (a[0].cast("string") == "")
        if name == "contains":
            return a[0].cast("string").contains(a[1])
        if name == "replace":
            return F.replace(a[0].cast("string"), a[1].cast("string"),
                             a[2].cast("string"))
        if name == "split":
            import re as _re

            return F.split(a[0].cast("string"),
                           _re.escape(str(lit_arg(1, ","))))
        if name == "substring":
            return F.substring(a[0].cast("string"),
                               int(lit_arg(1, 0)) + 1, int(lit_arg(2, 1 << 30)))
        if name == "remove_diacritics":
            from sling_cli_spark.operators.transforms import (
                _ACCENT_DST, _ACCENT_SRC)

            return F.translate(a[0].cast("string"), _ACCENT_SRC, _ACCENT_DST)
        if name == "concat":
            return F.concat(*[self._as_str(x) for x in a])
        raise ExprCompileError(f"unknown transform function: {name!r}")


def compile_expr(df: DataFrame, expr: str, value_col: str | None) -> Column:
    """``expr`` (goval surface) → Column over ``df``'s schema;
    ``value_col`` is what ``value`` refers to (None for new columns)."""
    return _ColumnCompiler(df, value_col).compile(expr)


def apply_staged_transforms(df: DataFrame, stages: list[dict]) -> DataFrame:
    """The LIST-of-dicts transform form: each dict is ONE stage — every
    expression in it reads the STAGE-INPUT row (that is why the corpus
    chains ``text_field`` across three consecutive stages), outputs
    replace/append in declaration order, ``"*"`` applies the expression
    to every column with ``value`` bound per column. One ``select`` per
    stage; Catalyst collapses the chain."""
    from sling_cli_spark.operators.transforms import transform_column

    for stage in stages:
        exprs: dict[str, Column] = {}
        for col, spec in (stage or {}).items():
            if col == "*":
                for c in df.columns:
                    # wildcard outputs are STRINGS (the reference's
                    # stream processor passes transform results as
                    # text; p.23 asserts int columns read back as '1')
                    exprs[c] = _stage_expr(df, c, str(spec)) \
                        .cast("string")
                continue
            actual = next((c for c in df.columns
                           if c.lower() == str(col).lower()), str(col))
            exprs[actual] = _stage_expr(df, actual, str(spec))
        out = [exprs.get(c, F.col(f"`{c}`")).alias(c) for c in df.columns]
        out += [e.alias(c) for c, e in exprs.items() if c not in df.columns]
        df = df.select(*out)
    return df


def _stage_expr(df: DataFrame, col: str, spec: str) -> Column:
    """Named transform (``upper`` / ``trim_space(value)``) when the
    registry knows it; goval compilation otherwise."""
    from sling_cli_spark.operators.transforms import (
        _ARG_REGISTRY, _CALL_RE, _REGISTRY, _split_call_args,
        transform_column)

    s = spec.strip()
    value_col = col if col in df.columns else None
    base = (F.col(f"`{col}`") if value_col else F.lit(None))
    if s in _REGISTRY:
        return transform_column(base, s)
    m = _CALL_RE.match(s)
    if m:
        args = _split_call_args(m.group(2))
        # the registry owns fn(value, ...) shapes; anything referencing
        # record.* or other columns goes to the goval compiler (which
        # also knows upper/lower/trim — over arbitrary operands)
        if (args[:1] == ["value"] or not args) and (
                m.group(1) in _ARG_REGISTRY
                or (m.group(1) in _REGISTRY and args == ["value"])):
            return transform_column(base, s)
    return compile_expr(df, s, value_col)
