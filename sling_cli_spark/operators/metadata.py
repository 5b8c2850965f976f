"""Injected ``_sling_*`` metadata columns.

Reference: ``core/dbio/iop/datastream.go:121-129``, ``core/sling/task.go:335``.

| column              | reference source            | Spark expression              |
|---------------------|-----------------------------|-------------------------------|
| _sling_stream_url   | source file url             | input_file_name()             |
| _sling_loaded_at    | load unix ts                | lit(run ts) (driver-stamped)  |
| _sling_row_num      | 1-based row counter         | row_number window (ordered)   |
| _sling_row_id       | stable surrogate id         | monotonically_increasing_id   |
| _sling_exec_id      | execution uuid              | lit(exec id)                  |

``_sling_row_num`` in the reference is a single-stream counter; a faithful
global counter on Spark requires a total order — we take an explicit order
spec, so it stays deterministic and distributed (zipWithIndex-style tricks
would break pushdown and repeatability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_stream_url(df: DataFrame, col: str = "_sling_stream_url") -> DataFrame:
    return df.withColumn(col, F.input_file_name())


def with_loaded_at(df: DataFrame, run_ts, col: str = "_sling_loaded_at") -> DataFrame:
    """Stamp the load timestamp; pass an explicit value for determinism."""
    return df.withColumn(col, F.lit(run_ts))


def with_row_num(
    df: DataFrame, order_by: list[str], col: str = "_sling_row_num"
) -> DataFrame:
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(col, F.row_number().over(w))


def with_row_id(df: DataFrame, col: str = "_sling_row_id") -> DataFrame:
    return df.withColumn(col, F.monotonically_increasing_id())


def with_exec_id(df: DataFrame, exec_id: str, col: str = "_sling_exec_id") -> DataFrame:
    return df.withColumn(col, F.lit(exec_id))
