"""File sources with sling option names.

Maps the reference's per-format readers (``core/dbio/iop/{csv,json,xml,
parquet,arrow,avro}.go`` + the multi-file Dataflow ``filesys/fs.go``) onto
``spark.read``:

- format detection by extension (reference: filesys path sniffing)
- CSV: header/delimiter/quote/escape/encoding/skip-lines/null_if; gzip/zstd
  codecs are native to Spark's text sources
- JSON/JSONL: multiLine for arrays-of-objects, flatten to ``__`` columns
- multi-file globs: Spark reads globs natively, one task per split — this
  replaces the reference's one-Datastream-per-file + column-merge machinery
  (``dataflow.go:305-512``); schema drift across files is handled by
  ``mergeSchema``/permissive string read + inference
- SQL-on-files (the reference's embedded-DuckDB kernel,
  ``filesys/fs.go:1280-1349``): temp view + ``spark.sql`` — Spark *is* the
  compute kernel here.

Excel/SAS need libraries not present in this container; they are gated and
raise with a clear message (plumbing is real: pandas -> createDataFrame).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.config import Source, SourceOptions
from sling_cli_spark.operators.flatten import flatten

_EXT_FORMAT = {
    ".csv": "csv", ".tsv": "csv", ".json": "json", ".jsonl": "jsonl",
    ".ndjson": "jsonl", ".parquet": "parquet", ".avro": "avro",
    ".xml": "xml", ".xlsx": "excel", ".sas7bdat": "sas7bdat",
}


def detect_format(path: str, opts: SourceOptions) -> str:
    if opts.format:
        return opts.format
    base = path.rstrip("/*")
    for ext, fmt in _EXT_FORMAT.items():
        if base.endswith(ext) or f"{ext}" in os.path.basename(base):
            return fmt
    # directory of parquet is the common lake layout
    return "parquet"


def read_files(spark: SparkSession, path: str, opts: SourceOptions) -> DataFrame:
    fmt = detect_format(path, opts)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        reader = (
            spark.read.option("header", str(opts.header).lower())
            .option("sep", opts.delimiter)
            .option("quote", opts.quote)
            .option("escape", opts.escape)
            .option("encoding", opts.encoding)
            .option("multiLine", "true")        # embedded newlines in quotes
            .option("mode", "PERMISSIVE")
        )
        if opts.skip_lines:
            reader = reader.option("skipRows", str(opts.skip_lines))
        if opts.null_if is not None:
            reader = reader.option("nullValue", opts.null_if)
        if opts.datetime_format:
            reader = reader.option("timestampFormat", opts.datetime_format)
        # read as strings; operators/inference.py supplies the casts
        # (reference: 900-row sample classifier, dataset.go:422-610)
        reader = reader.option("inferSchema", "false")
        return reader.csv(path)
    if fmt in ("json", "jsonl"):
        reader = spark.read.option("multiLine", "true" if fmt == "json" else "false")
        df = reader.json(path)
        if opts.flatten:
            depth = 0 if opts.flatten is True else int(opts.flatten)
            df = flatten(df, max_depth=depth)
        return df
    if fmt == "avro":
        return spark.read.format("avro").load(path)
    if fmt == "xml":
        return spark.read.format("xml").option("rowTag", "row").load(path)
    if fmt in ("excel", "sas7bdat"):
        return _read_via_pandas(spark, path, fmt, opts)
    raise ValueError(f"unsupported source format: {fmt!r}")


def _read_via_pandas(
    spark: SparkSession, path: str, fmt: str, opts: SourceOptions
) -> DataFrame:
    """Driver-side staging for formats without a Spark reader (small files)."""
    import pandas as pd  # noqa: F401

    try:
        if fmt == "excel":
            import openpyxl  # noqa: F401
            pdf = pd.read_excel(path, sheet_name=opts.sheet or 0)
        else:
            pdf = pd.read_sas(path)
    except ImportError as e:
        raise NotImplementedError(
            f"{fmt} source requires a reader library not present in this "
            f"environment ({e}); plumbing: pandas -> spark.createDataFrame"
        ) from e
    return spark.createDataFrame(pdf)


def sql_on_files(
    spark: SparkSession, sql: str, tables: dict[str, str],
    opts: SourceOptions | None = None,
) -> DataFrame:
    """Arbitrary SQL over file globs (reference's DuckDB kernel -> Spark SQL)."""
    opts = opts or SourceOptions()
    for name, path in tables.items():
        read_files(spark, path, opts).createOrReplaceTempView(name)
    return spark.sql(sql)


def read_source(spark: SparkSession, source: Source, base_dir: str = "") -> DataFrame:
    """Entry used by the task runner: stream may be a path, glob, or SQL."""
    stream = source.stream or ""
    if source.is_sql:
        return spark.sql(stream)
    path = stream if os.path.isabs(stream) else os.path.join(base_dir, stream)
    return read_files(spark, path, source.options)


def list_file_nodes(spark: SparkSession, path: str) -> DataFrame:
    """File-node metadata scan (reference: filesys/fs_file_node.go) —
    list files as a table (path, size, modified) for discovery/incremental."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    rows = []
    if fs.exists(p):
        it = fs.listFiles(p, True)
        while it.hasNext():
            s = it.next()
            rows.append((
                s.getPath().toString(), int(s.getLen()),
                int(s.getModificationTime()),
            ))
    return spark.createDataFrame(rows, "path string, size bigint, modified_ms bigint")
