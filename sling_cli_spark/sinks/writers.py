"""File / table writers implementing the reference's load modes.

Mode mapping (reference: ``core/sling/task_run_write.go:915-1032``):

| mode            | Spark writer                                        |
|-----------------|-----------------------------------------------------|
| full-refresh    | ``mode("overwrite")``                               |
| truncate        | ``mode("overwrite")`` (+ truncate=true on JDBC)     |
| incremental/+pk | append, or merge plan (operators/merge.py)          |
| snapshot        | append + ``_sling_loaded_at`` stamp                 |
| definition-only | ``limit(0)`` write (schema only)                    |

File options (reference: ``config.go:1733-1762``, ``fs.go:855-1113``):
``file_max_rows`` -> ``maxRecordsPerFile`` (per-task split, no shuffle);
compression -> codec option; ``{part_*}`` URI masks -> ``partitionBy`` on
derived date-part columns — i.e. Hive-style layout Spark prunes natively.

Scale note: partitioned writes never funnel through the driver; each task
writes its own files. ``maxRecordsPerFile`` splits inside a task without a
repartition, so no extra shuffle is introduced by file sizing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sling_cli_spark.config import Mode, Target, TargetOptions

# {part_*} mask -> (derived column name, expression builder)
_PART_FUNCS = {
    "part_year": lambda c: F.date_format(c, "yyyy"),
    "part_month": lambda c: F.date_format(c, "MM"),
    "part_day": lambda c: F.date_format(c, "dd"),
    "part_hour": lambda c: F.date_format(c, "HH"),
    "part_minute": lambda c: F.date_format(c, "mm"),
    "part_year_month": lambda c: F.date_format(c, "yyyy-MM"),
    "part_date": lambda c: F.date_format(c, "yyyy-MM-dd"),
    "part_week": lambda c: F.weekofyear(c).cast("string"),
}

_MASK_RE = re.compile(r"\{(part_[a-z_]+)\(([^)]+)\)\}|\{(part_[a-z_]+)\}")


def parse_partition_mask(object_uri: str, update_key: str | None = None):
    """Extract ``{part_*}`` masks from a target URI (reference:
    iop/partition.go:13-124). Returns (clean_uri, [(mask, source_col)])."""
    parts: list[tuple[str, str]] = []
    for m in _MASK_RE.finditer(object_uri):
        mask = m.group(1) or m.group(3)
        col = m.group(2) or update_key
        if not col:
            raise ValueError(f"partition mask {mask} needs a column")
        parts.append((mask, col))
    clean = _MASK_RE.sub("", object_uri).rstrip("/")
    return clean, parts


def write_files(df: DataFrame, target: Target, mode: Mode, fmt: str | None = None):
    opts = target.options
    uri, masks = parse_partition_mask(target.object or "", None)
    fmt = fmt or opts.format or _detect_format(uri)

    part_cols: list[str] = list(opts.partition_by)
    for mask, col in masks:
        df = df.withColumn(mask, _PART_FUNCS[mask](F.col(col)))
        part_cols.append(mask)

    writer = df.write.mode(_spark_mode(mode))
    if opts.file_max_rows:
        writer = writer.option("maxRecordsPerFile", str(opts.file_max_rows))
    if opts.compression:
        writer = writer.option("compression", opts.compression)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, _WRITERS[fmt])(uri)


_WRITERS = {"parquet": "parquet", "csv": "csv", "json": "json", "orc": "orc"}


def _detect_format(uri: str) -> str:
    for ext in ("parquet", "csv", "json", "orc"):
        if uri.endswith(f".{ext}") or uri.endswith(f".{ext}/"):
            return ext
    return "parquet"


def _spark_mode(mode: Mode) -> str:
    if mode in (Mode.FULL_REFRESH, Mode.TRUNCATE):
        return "overwrite"
    if mode == Mode.DEFINITION_ONLY:
        return "overwrite"
    return "append"


def prepare_for_mode(df: DataFrame, mode: Mode, run_ts=None) -> DataFrame:
    """Mode-specific row shaping before the physical write."""
    if mode == Mode.DEFINITION_ONLY:
        # create schema, zero rows (reference: WHERE 1=0 probe)
        return df.limit(0)
    if mode == Mode.SNAPSHOT:
        from sling_cli_spark.operators.metadata import with_loaded_at

        return with_loaded_at(df, run_ts)
    return df
