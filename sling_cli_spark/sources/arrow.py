"""Arrow IPC (Feather v2 / stream) source + sink.

Reference: ``core/dbio/iop/arrow.go`` reads/writes a single Arrow IPC
stream. Arrow files aren't Spark-splittable, so like the reference this
is a single-stream path: fine for the interchange use-case (handing
results to/from Arrow-native tools), wrong for bulk data — the runner
never routes bulk loads here.

Spark 4 natively converts pyarrow Tables both ways
(``spark.createDataFrame(pa.Table)`` / ``df.toArrow()``), so the IPC
layer is only file framing.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame, SparkSession


def read_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Read one or many ``.arrow``/``.feather`` IPC files."""
    paths = sorted(_glob.glob(path)) if any(c in path for c in "*?[") \
        else [path]
    tables = []
    for p in paths:
        try:
            with ipc.open_file(p) as r:       # random-access (file) format
                tables.append(r.read_all())
        except pa.ArrowInvalid:
            with ipc.open_stream(p) as r:     # stream format fallback
                tables.append(r.read_all())
    if not tables:
        raise FileNotFoundError(f"no arrow files at {path!r}")
    return spark.createDataFrame(pa.concat_tables(tables))


def write_arrow(df: DataFrame, path: str, stream: bool = False) -> None:
    """Write the DataFrame as one Arrow IPC file (driver-collected via
    Arrow batches — interchange-sized results only)."""
    table = df.toArrow()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if stream:
        with ipc.new_stream(path, table.schema) as w:
            w.write_table(table)
    else:
        with ipc.new_file(path, table.schema) as w:
            w.write_table(table)
