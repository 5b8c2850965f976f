"""Dataflow utility operators.

Reference (``core/dbio/iop/dataflow.go``): Map / MapParallel (per-row
projection fns), Chunk/Split (fan a stream into N sub-streams), and
Collect(limit). On Spark each is a one-liner over the distributed plan —
they exist as named operators so replication/pipeline configs can call
them by name:

- map_columns: named-expression projection (the Map surface, but
  Catalyst-compiled instead of per-row Go closures; MapParallel is
  implicit — every projection already runs on all cores)
- chunk: repartition to N sub-streams (Split); ``by`` keys co-locate rows
- collect_rows: bounded driver collect (Collect(limit)) — hard-capped so
  a config typo can't OOM the driver
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COLLECT_HARD_CAP = 1_000_000


def map_columns(df: DataFrame, exprs: dict[str, str]) -> DataFrame:
    """{new_or_existing_col: SQL expr} applied as ONE projection."""
    out = df
    for name, e in exprs.items():
        out = out.withColumn(name, F.expr(e))
    return out


def chunk(df: DataFrame, n: int, by: list[str] | None = None) -> DataFrame:
    """Split into n sub-streams; with ``by``, rows sharing keys co-locate
    (hash partitioning) so downstream per-chunk processing sees whole
    groups."""
    if by:
        return df.repartition(n, *[F.col(f"`{c}`") for c in by])
    return df.repartition(n)


def collect_rows(df: DataFrame, limit: int = 10_000) -> list:
    """Driver-side collect with a hard cap (the reference's Collect takes
    an explicit limit for the same reason)."""
    limit = min(int(limit), COLLECT_HARD_CAP)
    return df.limit(limit).collect()
