"""Schema evolution: column add + type widening between batch and target.

Reference: ``add_new_columns`` / ``adjust_column_type`` target options
(``core/sling/config.go:1744-1747``) — when a new batch drifts from the
target table, the reference ALTERs the target (add column / widen type).
On Spark the same reconciliation is a pair of cast/align projections
applied before the union/merge — no DDL, one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sling_cli_spark.types import from_spark_type, to_spark_type, widen


def reconcile_schemas(
    target: DataFrame, src: DataFrame,
    add_new_columns: bool = True, adjust_column_type: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Align target/src for a merge.

    - columns only in src: kept if ``add_new_columns`` (target gets NULLs),
      else dropped from src (reference drops unknown columns unless the
      option is on)
    - columns in both with different types: if ``adjust_column_type``,
      both cast to the widened general type; else src is cast to the
      target's type (try-cast semantics: drift degrades to NULL, the job
      survives)
    """
    t_fields = {f.name.lower(): f for f in target.schema.fields}
    s_fields = {f.name.lower(): f for f in src.schema.fields}

    src_cols = []
    for f in src.schema.fields:
        tf = t_fields.get(f.name.lower())
        if tf is None:
            if add_new_columns:
                src_cols.append(F.col(f"`{f.name}`"))
            continue  # drop unknown column
        if tf.dataType != f.dataType:
            if adjust_column_type:
                wide = widen(from_spark_type(tf.dataType),
                             from_spark_type(f.dataType))
                src_cols.append(
                    F.col(f"`{f.name}`").try_cast(to_spark_type(wide))
                    .alias(tf.name))
            else:
                src_cols.append(
                    F.col(f"`{f.name}`").try_cast(tf.dataType).alias(tf.name))
        else:
            src_cols.append(F.col(f"`{f.name}`").alias(tf.name))
    src_out = src.select(*src_cols)

    tgt_cols = []
    for f in target.schema.fields:
        sf = s_fields.get(f.name.lower())
        if sf is not None and f.dataType != sf.dataType and adjust_column_type:
            wide = widen(from_spark_type(f.dataType),
                         from_spark_type(sf.dataType))
            tgt_cols.append(
                F.col(f"`{f.name}`").try_cast(to_spark_type(wide))
                .alias(f.name))
        else:
            tgt_cols.append(F.col(f"`{f.name}`"))
    tgt_out = target.select(*tgt_cols)
    return tgt_out, src_out
