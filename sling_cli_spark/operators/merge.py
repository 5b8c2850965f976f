"""Merge strategies as DataFrame plans.

Re-expresses the reference's SQL merge templates
(``core/dbio/templates/base.yaml:52-126``; dispatch
``core/sling/task_run_write.go:997-1179``) as join-based DataFrame plans
suitable for file/lake targets. JDBC targets would push the same SQL to the
database; here the target is a DataFrame and the result replaces it.

| strategy              | template (base.yaml)  | DataFrame plan                     |
|-----------------------|-----------------------|------------------------------------|
| insert                | :52-57 NOT EXISTS     | src anti target -> union           |
| update                | :59-63 UPDATE on PK   | target anti src ∪ src semi target  |
| update_insert (deflt) | :65-70 MERGE          | target anti src ∪ src              |
| delete_insert         | :72-79 DELETE+INSERT  | target anti src ∪ src              |
| history_insert        | database.go:2918-2929 | plain append                       |
| change_capture[_soft] | :81-126 rn=1 last-op  | window dedup + anti/filter union   |

Scale posture: the incoming batch (``src``) is typically small relative to
the accumulated target, so every anti/semi join here broadcasts the batch
side automatically under ``spark.sql.autoBroadcastJoinThreshold`` (64 MB in
session.py) — the target side streams through without a shuffle. With a
large batch, AQE falls back to a sort-merge join on the PK; both sides
shuffle once on the same key, which is the minimum possible for PK merge.
No driver-side materialization anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sling_cli_spark.config import MergeStrategy

# metadata column names used by CDC merge (reference: datastream.go:121-129)
OP_COL = "_sling_synced_op"
SEQ_COL = "_sling_synced_seq"


def _pk(primary_key) -> list[str]:
    return [primary_key] if isinstance(primary_key, str) else list(primary_key)


def dedup_last(df: DataFrame, primary_key, order_col) -> DataFrame:
    """Keep the latest row per PK: ``row_number() over (partition by pk
    order by order_col desc) = 1`` (reference: base.yaml:84-101).
    ``order_col`` may be a list for deterministic tie-breaks.

    Partitioned window -> one hash shuffle on the PK, never a global sort.
    """
    pk = _pk(primary_key)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*pk).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_insert(target: DataFrame, src: DataFrame, primary_key) -> DataFrame:
    """INSERT … WHERE NOT EXISTS: append only rows whose PK is new."""
    pk = _pk(primary_key)
    new_rows = src.join(target.select(*pk), on=pk, how="left_anti")
    return target.unionByName(new_rows, allowMissingColumns=True)


def merge_update(target: DataFrame, src: DataFrame, primary_key) -> DataFrame:
    """UPDATE matched rows from src; unmatched src rows are dropped."""
    pk = _pk(primary_key)
    kept = target.join(src.select(*pk), on=pk, how="left_anti")
    updated = src.join(target.select(*pk), on=pk, how="left_semi")
    return kept.unionByName(updated, allowMissingColumns=True)


def merge_update_insert(target: DataFrame, src: DataFrame, primary_key) -> DataFrame:
    """MERGE matched-update / not-matched-insert (the default strategy)."""
    pk = _pk(primary_key)
    kept = target.join(src.select(*pk), on=pk, how="left_anti")
    return kept.unionByName(src, allowMissingColumns=True)


def merge_delete_insert(target: DataFrame, src: DataFrame, primary_key) -> DataFrame:
    """DELETE all target rows matching src PKs, then INSERT all src rows."""
    return merge_update_insert(target, src, primary_key)


def merge_history_insert(target: DataFrame, src: DataFrame, primary_key) -> DataFrame:
    """SCD-ish append: keep all history, just add the new batch."""
    return target.unionByName(src, allowMissingColumns=True)


def merge_change_capture(
    target: DataFrame,
    src: DataFrame,
    primary_key,
    seq_col: str = SEQ_COL,
    op_col: str = OP_COL,
    soft: bool = False,
) -> DataFrame:
    """CDC merge: last-op-wins per PK by sequence, then apply.

    Reference template base.yaml:81-126: dedup the batch with
    ``row_number() over (partition by pk order by seq desc)``, delete rows
    whose final op is 'D' (or, soft variant, keep them flagged ``'D'``),
    upsert the rest.
    """
    pk = _pk(primary_key)
    last = dedup_last(src, pk, seq_col)
    kept = target.join(last.select(*pk), on=pk, how="left_anti")
    if soft:
        return kept.unionByName(last, allowMissingColumns=True)
    survivors = last.filter(
        F.coalesce(F.col(op_col), F.lit("")) != F.lit("D"))
    return kept.unionByName(survivors, allowMissingColumns=True)


def delete_missing(
    target: DataFrame, src: DataFrame, primary_key, soft: bool = False,
    op_col: str = OP_COL, where: str | None = None,
) -> DataFrame:
    """Remove (or soft-flag) target rows whose PK is absent from the source
    snapshot (reference: core/sling/config.go:1838-1876, templates
    ``core.delete_where_not_exist`` base.yaml:13-27). ``where`` scopes
    which TARGET rows are delete candidates (the extended
    delete_missing config's target_where, config.go:1854-1860 — rows
    outside the scope are never touched even when their PK is missing,
    r.104.delete_missing_where.yaml)."""
    pk = _pk(primary_key)
    scope = F.expr(where) if where else F.lit(True)
    missing_flag = target.join(
        src.select(*pk).dropDuplicates(pk).withColumn("__present", F.lit(1)),
        on=pk, how="left",
    )
    gone = F.col("__present").isNull() & F.coalesce(scope, F.lit(False))
    if not soft:
        cols = [F.col(f"`{c}`") for c in target.columns]
        return missing_flag.filter(~gone).select(*cols)
    cols = [c for c in target.columns if c != op_col]
    return missing_flag.select(
        *[F.col(f"`{c}`") for c in cols],
        F.when(gone, F.lit("D"))
        .otherwise(F.col(f"`{op_col}`") if op_col in target.columns
                   else F.lit(None).cast("string"))
        .alias(op_col),
    )


def merge_dataframes(
    target: DataFrame,
    src: DataFrame,
    primary_key,
    strategy: MergeStrategy = MergeStrategy.UPDATE_INSERT,
    update_key: str | None = None,
    seq_col: str = SEQ_COL,
    op_col: str = OP_COL,
) -> DataFrame:
    """Dispatch by strategy (reference: task_run_write.go:1152-1179).

    When ``update_key`` is set, the batch is first deduped to the latest row
    per PK (the reference's temp table holds at most one row per PK by
    construction; a Spark batch may not, so we enforce it the same way the
    CDC template does).
    """
    pk = _pk(primary_key)
    if update_key and strategy in (
        MergeStrategy.UPDATE, MergeStrategy.UPDATE_INSERT,
        MergeStrategy.DELETE_INSERT,
    ):
        src = dedup_last(src, pk, update_key)
    if strategy == MergeStrategy.INSERT:
        return merge_insert(target, src, pk)
    if strategy == MergeStrategy.UPDATE:
        return merge_update(target, src, pk)
    if strategy == MergeStrategy.UPDATE_INSERT:
        return merge_update_insert(target, src, pk)
    if strategy == MergeStrategy.DELETE_INSERT:
        return merge_delete_insert(target, src, pk)
    if strategy == MergeStrategy.HISTORY_INSERT:
        return merge_history_insert(target, src, pk)
    if strategy == MergeStrategy.CHANGE_CAPTURE:
        return merge_change_capture(target, src, pk,
                                    seq_col=seq_col, op_col=op_col)
    if strategy == MergeStrategy.CHANGE_CAPTURE_SOFT:
        return merge_change_capture(target, src, pk, soft=True,
                                    seq_col=seq_col, op_col=op_col)
    raise ValueError(f"unknown merge strategy: {strategy!r}")
