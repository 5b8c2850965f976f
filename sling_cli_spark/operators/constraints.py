"""Row constraints: per-column check expressions.

Reference: ``core/dbio/iop/datatype.go:76-83`` (Constraint on Column),
eval hook ``datatype.go:25``, violation warn ``task_run.go:140-147``.
There, each row is checked as it streams and failures are counted (and
optionally dropped). Here the checks are Catalyst boolean expressions and
the violation counts ride the write via ``observe`` — zero extra passes.

Constraint expressions use ``value`` as the placeholder for the column
(same surface as the reference: ``value > 0``, ``length(value) < 20``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VALUE_RE = re.compile(r"\bvalue\b")


def constraint_expr(col_name: str, expr: str) -> Column:
    """``value > 0`` -> boolean Column for col_name (null passes, like the
    reference which only counts explicit failures)."""
    rendered = _VALUE_RE.sub(f"`{col_name}`", expr)
    return F.coalesce(F.expr(rendered), F.lit(True))


def check_constraints(
    df: DataFrame, constraints: dict[str, str], drop_failures: bool = False,
):
    """Returns (df_out, observation) — violation counts per column are
    collected by the Observation when df_out is materialized.

    With ``drop_failures`` the failing rows are filtered out (the
    reference's skip mode); otherwise they pass through and are only
    counted (warn mode).
    """
    from pyspark.sql import Observation

    checks = {name: constraint_expr(name, e) for name, e in constraints.items()}
    obs = Observation("constraints")
    aggs = [
        F.sum(F.when(~c, 1).otherwise(0)).alias(f"violations_{name}")
        for name, c in checks.items()
    ]
    df = df.observe(obs, *aggs)
    if drop_failures:
        keep = None
        for c in checks.values():
            keep = c if keep is None else (keep & c)
        df = df.filter(keep)
    return df, obs


def constraint_violations(
    df: DataFrame, constraints: dict[str, str],
) -> dict[str, int]:
    """Eager variant: one aggregate pass, returns {column: n_violations}."""
    aggs = [
        F.sum(F.when(~constraint_expr(name, e), 1).otherwise(0)).alias(name)
        for name, e in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {k: int(v or 0) for k, v in row.asDict().items()}


def constraints_report(
    df: DataFrame, constraints: dict[str, str],
) -> DataFrame:
    """Violation counts as a DataFrame (one aggregate pass, then a tiny
    unpivot of the 1-row result — SQL-expressible for the oracle)."""
    aggs = [
        F.sum(F.when(~constraint_expr(name, e), 1).otherwise(0))
        .cast("long").alias(name)
        for name, e in constraints.items()
    ]
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("field"),
                 F.col(f"`{name}`").alias("violations"))
        for name in constraints
    ])
    return wide.select(F.explode(pairs).alias("p")) \
        .select("p.field", "p.violations")
