"""Flatten nested structures to ``parent__child`` columns.

The reference flattens nested JSON records into ``__``-delimited columns,
depth-limited, and serializes arrays to JSON strings
(``core/dbio/iop/json.go:309-402``). Spark keeps nested types natively, so
flatten becomes a pure projection: ``col("a.b").alias("a__b")`` with
``to_json`` for arrays/maps — no UDF, fully codegen'd.

Also provides ``extract_json_fields`` for string columns carrying JSON (the
reference's jmespath/jq record extraction on JSON sources) via
``get_json_object`` / ``from_json``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DELIM = "__"


def _clean(name: str) -> str:
    """Header cleanup matching the reference's key normalization
    (json.go preserves key CASE — camelCase survives flatten so a
    downstream `column_casing: snake` can see the humps and emit
    user_id, the r.67 contract; only invalid chars fold to _)."""
    return re.sub(r"[^0-9a-zA-Z_]+", "_", name)


def flatten(df: DataFrame, max_depth: int = 0) -> DataFrame:
    """Flatten struct fields to ``parent__child`` columns.

    max_depth=0 means unlimited. Arrays and maps serialize with to_json
    (matching the reference's array->JSON-string behavior).
    """
    cols = _flatten_fields(df.schema, prefix="", depth=1, max_depth=max_depth)
    return df.select(*cols)


def _flatten_fields(
    schema: T.StructType, prefix: str, depth: int, max_depth: int
) -> list[Column]:
    out: list[Column] = []
    for f in schema.fields:
        path = f"{prefix}`{f.name}`" if not prefix else f"{prefix}.`{f.name}`"
        flat_name = (_clean(f.name) if not prefix
                     else f"{_strip(prefix)}{DELIM}{_clean(f.name)}")
        if isinstance(f.dataType, T.StructType) and (
            max_depth == 0 or depth < max_depth
        ):
            out.extend(
                _flatten_struct(f.dataType, path, flat_name, depth + 1, max_depth)
            )
        elif isinstance(f.dataType, (T.ArrayType, T.MapType)):
            out.append(F.to_json(F.col(path)).alias(flat_name))
        elif isinstance(f.dataType, T.StructType):
            out.append(F.to_json(F.col(path)).alias(flat_name))
        else:
            out.append(F.col(path).alias(flat_name))
    return out


def _strip(prefix: str) -> str:
    # prefix is a backticked column path; rebuild the flat name
    return DELIM.join(_clean(p) for p in prefix.replace("`", "").split("."))


def _flatten_struct(
    st: T.StructType, path: str, flat_prefix: str, depth: int, max_depth: int
) -> list[Column]:
    out: list[Column] = []
    for f in st.fields:
        sub_path = f"{path}.`{f.name}`"
        sub_name = f"{flat_prefix}{DELIM}{_clean(f.name)}"
        if isinstance(f.dataType, T.StructType) and (
            max_depth == 0 or depth < max_depth
        ):
            out.extend(_flatten_struct(f.dataType, sub_path, sub_name,
                                       depth + 1, max_depth))
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            out.append(F.to_json(F.col(sub_path)).alias(sub_name))
        else:
            out.append(F.col(sub_path).alias(sub_name))
    return out


def extract_json_fields(
    df: DataFrame, json_col: str, fields: dict[str, str], keep: bool = False
) -> DataFrame:
    """Extract ``{new_col: '$.path'}`` from a JSON string column.

    Equivalent of the reference's jmespath extraction on JSON sources;
    get_json_object stays JVM-side and codegen-friendly.
    """
    out = df
    for new_col, path in fields.items():
        out = out.withColumn(new_col, F.get_json_object(F.col(json_col), path))
    if not keep:
        out = out.drop(json_col)
    return out
