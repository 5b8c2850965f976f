"""Incremental / backfill filters and watermark lookup.

Reference semantics:
- incremental: ``update_key > {max value at target}`` (``>=`` when gte),
  ``core/sling/task_run_read.go:141-261``, template ``core.incremental_where``
  (``templates/base.yaml:45-48``); max-value probe ``database.go:1874-1909``.
- backfill: ``update_key >= start AND update_key <= end``
  (``base.yaml:49``, ``task_run_read.go:173-204``).
- file sources skip rows ``<= watermark`` client-side
  (``datastream.go:3144-3237``) — on Spark the same ``filter`` is pushed into
  parquet row-group stats / JDBC automatically.

At scale these filters are the difference between scanning 100 TB and
scanning a day's partition: expressed as Catalyst predicates they reach the
scan (PushedFilters) and prune partitions/row-groups for free.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_watermark(target_df: DataFrame, update_key: str) -> Any:
    """max(update_key) on the target — the incremental watermark probe."""
    row = target_df.agg(F.max(F.col(update_key)).alias("w")).collect()[0]
    return row["w"]


def incremental_filter(
    df: DataFrame, update_key: str, watermark: Any, gte: bool = False
) -> DataFrame:
    """Keep rows after the watermark. None watermark -> full load."""
    if watermark is None:
        return df
    key = F.col(update_key)
    return df.filter(key >= F.lit(watermark) if gte else key > F.lit(watermark))


def backfill_filter(df: DataFrame, update_key: str, start: Any, end: Any) -> DataFrame:
    return df.filter(F.col(update_key).between(F.lit(start), F.lit(end)))


def apply_limit_offset(
    df: DataFrame, limit: int | None, offset: int | None = None
) -> DataFrame:
    """limit/offset pushdown (reference: base.yaml:28-33).

    Spark's offset() requires a deterministic order upstream to be
    meaningful; callers sort first (as the reference's limit templates
    ``order by {update_key}`` do).
    """
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df
