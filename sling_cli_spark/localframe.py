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

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable[Any], schema) -> DataFrame:
    """Build a DataFrame from a small in-memory row collection.

    Drop-in for ``spark.createDataFrame(rows, schema)`` for positional
    rows (tuples / lists / Rows) with an explicit schema. Produces a
    ``LocalTableScan`` when the values are Arrow-expressible; falls back
    to the classic path otherwise (dict rows, inferred schemas, exotic
    nesting).
    """
    rows = list(rows)
    if schema is not None and (not rows or not isinstance(rows[0], dict)):
        try:
            import pandas as pd

            if rows:
                tuples = [tuple(r) for r in rows]
                ncols = len(tuples[0])
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
