"""Post-load validation: row counts and per-column checksums.

The reference's strongest correctness oracle: after a load it compares
stream-side accumulated per-column checksums against a SQL aggregate on the
target (``core/dbio/database/database.go:3576-3692``; expressions
``templates/base.yaml:447-453``). Same expressions here, as one Spark
aggregate — a single scan, map-side combined, no shuffle beyond the final
1-row reduce:

| general type | checksum expression            |
|--------------|--------------------------------|
| string       | sum(length(col))               |
| json         | sum(length(replace(col,' ',''))) |
| integer      | sum(abs(col))                  |
| decimal      | sum(abs(trunc(col)))           |
| datetime     | 0 (excluded)                   |
| boolean      | sum(length(cast(col as string))) |

``validate(src_df, tgt_df)`` computes both sides and returns per-column
booleans — the Spark twin of the reference's post-load check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def checksum_col(name: str, dtype: T.DataType) -> Column | None:
    """base.yaml:447-453 checksum expression for one column (None=skip)."""
    c = F.col(f"`{name}`")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.sum(F.abs(c))
    if isinstance(dtype, (T.DecimalType, T.DoubleType, T.FloatType)):
        # abs(trunc(x)) == floor(abs(x)) — checksum_decimal semantics
        return F.sum(F.floor(F.abs(c)))
    if isinstance(dtype, T.BooleanType):
        return F.sum(F.length(c.cast("string")))
    if isinstance(dtype, T.StringType):
        return F.sum(F.length(c))
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return None  # checksum_datetime: '0'
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        return F.sum(F.length(F.regexp_replace(F.to_json(c), " ", "")))
    if isinstance(dtype, T.BinaryType):
        return F.sum(F.length(c))
    return None


def checksums(df: DataFrame) -> dict[str, int]:
    """One-pass per-column checksum aggregate (plus ``_row_count``)."""
    aggs = [F.count(F.lit(1)).alias("_row_count")]
    for f in df.schema.fields:
        e = checksum_col(f.name, f.dataType)
        if e is not None:
            aggs.append(e.cast("decimal(38,0)").alias(f.name))
    row = df.agg(*aggs).collect()[0]
    return {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}


def checksum_df(df: DataFrame) -> DataFrame:
    """Same aggregate as a DataFrame (for the oracle comparison path).

    Aggregates in decimal(38,0) (overflow-safe at scale), emits bigint —
    the reference compares checksums as int64 strings too.
    """
    aggs = [F.count(F.lit(1)).alias("_row_count")]
    for f in df.schema.fields:
        e = checksum_col(f.name, f.dataType)
        if e is not None:
            aggs.append(e.cast("decimal(38,0)").cast("long").alias(f.name))
    return df.agg(*aggs)


def validate(src: DataFrame, tgt: DataFrame) -> dict[str, bool]:
    """Compare checksums source-vs-target per shared column.

    Returns {column: match} plus ``_row_count``. The reference runs this
    after every load when ``SLING_CHECKSUM_ROWS`` is set
    (task_run_write.go:381-431); here it's always cheap enough.
    """
    s, t = checksums(src), checksums(tgt)
    return {k: s[k] == t.get(k) for k in s if k == "_row_count" or k in t}


def count_validation(expected: int, actual: int) -> bool:
    """Row-count validation (reference: database.go:1426-1437)."""
    return expected == actual
