"""Small literal row sets as true LocalRelations (optimization r14).

``spark.createDataFrame(rows, schema)`` in classic PySpark routes ANY
local collection through a pickled Python RDD with
``defaultParallelism`` slices (``applySchemaToPythonRDD`` over
``ExistingRDD``). Two measured consequences on local[32] (guide §4 —
eliminate the Python boundary):

- every consumer pays one Python-worker round trip *per slice*: a plain
  scan of a 2-row frame is ~32 parallel worker hops (~0.7 s);
- a downstream ``coalesce(1)`` — the single-file lake-write pattern —
  evaluates all 32 parent slices SERIALLY inside one task: **5.3 s to
  write 2 rows**, growing linearly with core count.

Routing the same rows through a pandas DataFrame + Arrow instead yields
a JVM ``LocalTableScan``: zero Python at execution, the same write in
0.17 s, and broadcast builds over such frames (the row-id attach maps in
delta_py/iceberg_py) never touch a Python worker.

Values ride in OBJECT-dtype pandas columns so pandas never coerces
(no int→float NaN widening, no >2^53 precision loss); Arrow converts
straight from the Python objects under the explicit schema. Anything
the Arrow path can't express falls back to the classic
``createDataFrame`` verbatim, so behaviour is value-identical by
construction — the fast path is an execution detail.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession


def _container_naive_dt(v) -> bool:
    """A NAIVE datetime nested inside a container value — the one shape
    the Arrow fast path cannot reproduce classic semantics for (classic
    interprets naive as OS-local; Arrow as the session tz)."""
    if isinstance(v, _dt.datetime):
        return v.tzinfo is None
    if isinstance(v, (list, tuple)):
        return any(_container_naive_dt(x) for x in v)
    if isinstance(v, dict):
        return any(_container_naive_dt(x) for x in v.values())
    return False


def local_df(spark: SparkSession, rows: Iterable[Any], schema) -> DataFrame:
    """Build a DataFrame from a small in-memory row collection.

    Drop-in for ``spark.createDataFrame(rows, schema)`` for positional
    rows (tuples / lists / Rows) with an explicit schema. Produces a
    ``LocalTableScan`` when the values are Arrow-expressible; falls back
    to the classic path otherwise (dict rows, inferred schemas, exotic
    nesting).

    Naive datetimes (ADVICE r14): classic ``createDataFrame`` interprets
    a naive datetime under TimestampType in the OS-LOCAL tz
    (``TimestampType.toInternal`` -> ``time.mktime``), while the
    Arrow/pandas path uses the SESSION tz — different instants on a
    non-UTC driver. To keep the documented value-identity, a naive
    datetime at a top-level TimestampType position is localized
    (``astimezone()`` attaches the OS tz, preserving the classic
    instant) before the Arrow conversion; TimestampNTZ positions are
    wall-time on both paths and stay untouched; any other naive-datetime
    shape (nested in a container, non-timestamp field) falls back to the
    classic path verbatim.
    """
    rows = list(rows)
    if schema is not None and (not rows or not isinstance(rows[0], dict)):
        try:
            import pandas as pd

            if rows:
                tuples = [tuple(r) for r in rows]
                ncols = len(tuples[0])
                naive_cols: set[int] = set()
                nested_naive = False
                for t in tuples:
                    for i, v in enumerate(t):
                        if isinstance(v, _dt.datetime):
                            if v.tzinfo is None:
                                naive_cols.add(i)
                        elif isinstance(v, (list, tuple, dict)) \
                                and _container_naive_dt(v):
                            nested_naive = True
                if nested_naive:
                    raise ValueError("naive datetime in container")
                if naive_cols:
                    from pyspark.sql.types import (
                        StructType, TimestampNTZType, TimestampType,
                        _parse_datatype_string)

                    st = schema if isinstance(schema, StructType) \
                        else _parse_datatype_string(schema)
                    if len(st.fields) != ncols:
                        raise ValueError("schema width mismatch")
                    conv = set()
                    for i in naive_cols:
                        dt = st.fields[i].dataType
                        if isinstance(dt, TimestampType):
                            conv.add(i)  # localize to the classic instant
                        elif not isinstance(dt, TimestampNTZType):
                            raise ValueError(
                                "naive datetime under non-timestamp type")
                    if conv:
                        tuples = [tuple(
                            v.astimezone() if i in conv
                            and isinstance(v, _dt.datetime)
                            and v.tzinfo is None else v
                            for i, v in enumerate(t)) for t in tuples]
                pdf = pd.DataFrame({
                    i: pd.Series([t[i] for t in tuples], dtype=object)
                    for i in range(ncols)
                })
                return spark.createDataFrame(pdf, schema=schema)
            # empty frame: pyspark's pandas path still builds an RDD for
            # zero rows — an empty Range + typed null projection is a
            # pure-JVM empty relation instead (only when nullability
            # matches createDataFrame's all-nullable default)
            from pyspark.sql import functions as F
            from pyspark.sql.types import StructType

            st = schema if isinstance(schema, StructType) else None
            if st is None:
                from pyspark.sql.types import _parse_datatype_string

                st = _parse_datatype_string(schema)
            if all(f.nullable and not f.metadata for f in st.fields):
                return spark.range(0).select(*[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in st.fields])
        except Exception:
            pass  # fall through to the classic path
    return spark.createDataFrame(rows, schema)
