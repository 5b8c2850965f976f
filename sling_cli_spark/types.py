"""General column type system mapped onto Spark SQL types.

Re-expresses the reference's 18 general column types
(``core/dbio/iop/datatype.go:53-74``) as a Spark type mapping. The reference
keeps rows dynamically typed and re-casts per value; on Spark the schema is
static per DataFrame, so the general types exist for

- config surfaces (``columns: {name: type}`` coercion),
- DDL generation for JDBC targets,
- the sample-based inference of dirty text sources (operators/inference.py),
- column typing policy (string length / decimal precision adjustments,
  ``datatype.go:2508-2664``).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class ColumnType(str, Enum):
    BIGINT = "bigint"
    INTEGER = "integer"
    SMALLINT = "smallint"
    DECIMAL = "decimal"
    FLOAT = "float"
    BOOL = "bool"
    STRING = "string"
    TEXT = "text"
    JSON = "json"
    UUID = "uuid"
    BINARY = "binary"
    DATE = "date"
    DATETIME = "datetime"
    TIMESTAMP = "timestamp"
    TIMESTAMPZ = "timestampz"
    TIME = "time"
    TIMEZ = "timez"
    GEOMETRY = "geometry"

    @property
    def is_number(self) -> bool:
        return self in _NUMBERS

    @property
    def is_string_like(self) -> bool:
        return self in (
            ColumnType.STRING, ColumnType.TEXT, ColumnType.JSON,
            ColumnType.UUID, ColumnType.TIME, ColumnType.TIMEZ,
            ColumnType.GEOMETRY,
        )

    @property
    def is_temporal(self) -> bool:
        return self in (ColumnType.DATE, ColumnType.DATETIME,
                        ColumnType.TIMESTAMP, ColumnType.TIMESTAMPZ)


_NUMBERS = {
    ColumnType.BIGINT, ColumnType.INTEGER, ColumnType.SMALLINT,
    ColumnType.DECIMAL, ColumnType.FLOAT,
}

# general type -> Spark type constructor (reference: datatype.go:53-74;
# time/timez/geometry have no Spark type and stay strings)
DEFAULT_DECIMAL = (38, 9)


def to_spark_type(
    ctype: ColumnType | str,
    precision: int | None = None,
    scale: int | None = None,
) -> T.DataType:
    ctype = ColumnType(ctype)
    if ctype == ColumnType.BIGINT:
        return T.LongType()
    if ctype == ColumnType.INTEGER:
        return T.IntegerType()
    if ctype == ColumnType.SMALLINT:
        return T.ShortType()
    if ctype == ColumnType.DECIMAL:
        p, s = precision or DEFAULT_DECIMAL[0], scale if scale is not None else DEFAULT_DECIMAL[1]
        return T.DecimalType(min(p, 38), min(s, 37))
    if ctype == ColumnType.FLOAT:
        return T.DoubleType()
    if ctype == ColumnType.BOOL:
        return T.BooleanType()
    if ctype == ColumnType.BINARY:
        return T.BinaryType()
    if ctype == ColumnType.DATE:
        return T.DateType()
    if ctype in (ColumnType.DATETIME, ColumnType.TIMESTAMP):
        return T.TimestampNTZType()
    if ctype == ColumnType.TIMESTAMPZ:
        return T.TimestampType()
    return T.StringType()


def from_spark_type(dt: T.DataType) -> ColumnType:
    """Inverse mapping used by DDL generation and stats typing."""
    if isinstance(dt, T.LongType):
        return ColumnType.BIGINT
    if isinstance(dt, T.IntegerType):
        return ColumnType.INTEGER
    if isinstance(dt, (T.ShortType, T.ByteType)):
        return ColumnType.SMALLINT
    if isinstance(dt, T.DecimalType):
        return ColumnType.DECIMAL
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return ColumnType.FLOAT
    if isinstance(dt, T.BooleanType):
        return ColumnType.BOOL
    if isinstance(dt, T.BinaryType):
        return ColumnType.BINARY
    if isinstance(dt, T.DateType):
        return ColumnType.DATE
    if isinstance(dt, T.TimestampNTZType):
        return ColumnType.DATETIME
    if isinstance(dt, T.TimestampType):
        return ColumnType.TIMESTAMPZ
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return ColumnType.JSON
    return ColumnType.STRING


# widening lattice for inference fallback (reference widens
# int -> decimal -> string on cast failure, stream_processor.go:812-837)
_WIDEN_ORDER = [
    ColumnType.BOOL,
    ColumnType.SMALLINT,
    ColumnType.INTEGER,
    ColumnType.BIGINT,
    ColumnType.DECIMAL,
    ColumnType.FLOAT,
    ColumnType.STRING,
]


def widen(a: ColumnType, b: ColumnType) -> ColumnType:
    """Least common widened type of two observed general types."""
    if a == b:
        return a
    if a.is_temporal and b.is_temporal:
        order = [ColumnType.DATE, ColumnType.DATETIME, ColumnType.TIMESTAMP,
                 ColumnType.TIMESTAMPZ]
        return order[max(order.index(a), order.index(b))]
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        # bool does not widen into numbers: bool+int -> string
        if ColumnType.BOOL in (a, b):
            return ColumnType.STRING
        return _WIDEN_ORDER[max(_WIDEN_ORDER.index(a), _WIDEN_ORDER.index(b))]
    return ColumnType.STRING
