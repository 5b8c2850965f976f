"""File-granular merge for parquet targets: rewrite only touched files.

The reference's whole value on incremental+PK loads is in-place merge
(``templates/base.yaml:52-126``, ``task_run_write.go:997-1179``) — the
database touches only matched rows. A parquet-directory target has no
MERGE, and the naive plan (this repo's previous posture) rewrites the
ENTIRE target per batch: at 100 TB an incremental run that changes 0.1%
of rows still writes 100 TB. This module is the copy-on-write-at-file-
granularity fix, the same mechanism Delta/Iceberg/Hudi CoW use, minus
the transaction log (no lake-format jars ship in this sandbox):

1. scan the target with ``_metadata.file_path``, PK columns only
   (column-pruned scan — reads two columns, not the table)
2. semi-join against the batch PK set -> the set of TOUCHED files
   (file paths only on the driver; bounded by file count, never rows)
3. merge = merge_dataframes(rows-of-touched-files, batch) — the same
   strategy plans operators/merge.py already proves correct
4. write replacement files to a temp dir, hide the touched originals
   (dot-prefix: parquet readers skip hidden files), move replacements
   in, delete hidden

Write amplification drops from O(target) to O(touched files + batch).
With batch PKs spread uniformly this degrades to all files touched (same
cost as before, plus one cheap PK scan); with time-clustered update keys
— the common incremental shape — it is a tiny fraction.

Hive-partitioned targets (``k=v`` subdir layout, reference
``iop/partition.go:13-124``) keep the O(touched) property: the partition
columns are detected from the directory chain, the probe is pre-filtered
to the partitions PRESENT IN THE BATCH (a driver-built predicate on
partition columns — Catalyst prunes the directory scan, so untouched
partitions are never opened), and replacements are written back through
``partitionBy`` preserving the layout.

Crash safety (documented contract, weaker than a real table format):
replacements are fully written before any original is hidden, and
originals are deleted only after replacements are in place, so no
committed row is ever lost; a crash mid-promote can leave matched rows
temporarily missing for concurrent readers (recover: un-hide ``.stale``
files or re-run the merge). Concurrent-reader isolation needs a log —
that is exactly what Delta adds; swap this module for ``MERGE INTO``
when the delta-spark jars are on the classpath.

Limits: schema drift between batch and target falls back to the
full-rewrite swap path (the caller checks — new columns force rewriting
every file anyway).
"""

from __future__ import annotations

import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.localframe import local_df
from pyspark.sql import functions as F

from sling_cli_spark.config import MergeStrategy
from sling_cli_spark.operators.merge import merge_dataframes


def _pk(primary_key) -> list[str]:
    return [primary_key] if isinstance(primary_key, str) else list(primary_key)


def _fs(spark: SparkSession, uri: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(uri)
    return jvm, p.getFileSystem(conf), p


def touched_files(
    target: DataFrame, src: DataFrame, primary_key,
) -> list[str]:
    """Files of ``target`` holding at least one row whose PK appears in
    ``src``. The scan is pruned to PK + _metadata; the batch side of the
    semi-join broadcasts under the threshold. Driver materializes file
    PATHS only."""
    pk = _pk(primary_key)
    paths = (
        target.select(F.col("_metadata.file_path").alias("__file"), *pk)
        .join(src.select(*pk).distinct(), on=pk, how="left_semi")
        .select("__file").distinct().collect()
    )
    return sorted(r["__file"] for r in paths)


def has_subdirs(spark: SparkSession, path: str) -> bool:
    """True when the target uses a (hive-partitioned) subdir layout."""
    _, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        if st.isDirectory():
            return True
    return False


def partition_columns(spark: SparkSession, path: str) -> list[str]:
    """Partition column names from the ``k=v`` directory chain (empty
    for a flat layout)."""
    _, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    cols: list[str] = []
    cur = p
    while True:
        nxt = None
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name \
                    and not name.startswith((".", "_")):
                nxt = st.getPath()
                col = name.split("=", 1)[0]
                break
        if nxt is None:
            return cols
        cols.append(col)
        cur = nxt


def _batch_partition_filter(src: DataFrame, part_cols: list[str]):
    """Predicate limiting a partitioned target scan to the partitions
    present in the batch. The distinct-collect is bounded by the number
    of partitions a batch touches (small by construction); Catalyst
    turns the predicate into partition pruning, so untouched partitions
    are never read."""
    parts = src.select(*part_cols).distinct().collect()
    if not parts:
        return F.lit(False)
    clauses = []
    for r in parts:
        eqs = [F.col(c).isNull() if r[c] is None else (F.col(c) == F.lit(r[c]))
               for c in part_cols]
        clauses.append(reduce(lambda a, b: a & b, eqs))
    return reduce(lambda a, b: a | b, clauses)


def merge_files(
    spark: SparkSession,
    target_path: str,
    src: DataFrame,
    primary_key,
    strategy: MergeStrategy = MergeStrategy.UPDATE_INSERT,
    update_key: str | None = None,
) -> dict:
    """Merge ``src`` into the parquet directory at ``target_path``,
    rewriting only the files that contain matched PKs.

    Returns ``{"touched": n_rewritten, "kept": n_untouched}`` so callers
    (and tests) can assert the write amplification.
    """
    pk = _pk(primary_key)
    part_cols = partition_columns(spark, target_path)

    def _read(*paths: str) -> DataFrame:
        reader = spark.read
        if part_cols:
            reader = reader.option("basePath", target_path)
        df = reader.parquet(*paths)
        # partition-dir type inference (bucket=1 -> int) may disagree
        # with the batch's declared types; the batch wins so join/union
        # keys line up and replacements carry the caller's types
        src_types = dict(src.dtypes)
        mis = [c for c in part_cols
               if c in src_types and dict(df.dtypes).get(c) != src_types[c]]
        if mis:
            df = df.select(
                *[F.col(c).cast(src_types[c]).alias(c) if c in mis
                  else F.col(c) for c in df.columns])
        return df

    target = _read(target_path)

    touched: list[str] = []
    if strategy == MergeStrategy.INSERT:
        # append-only: new-PK rows only, zero rewrites — but the anti-join
        # must see the FULL target PK set (an anti against just the
        # touched files would re-insert existing PKs)
        replacement = src.join(
            target.select(*pk), on=pk, how="left_anti")
    elif strategy == MergeStrategy.HISTORY_INSERT:
        # keep-all-history append: zero rewrites
        replacement = src
    else:
        probe = target
        if part_cols and all(c in src.columns for c in part_cols):
            probe = target.filter(_batch_partition_filter(src, part_cols))
        touched = touched_files(probe, src, pk)
        if touched:
            touched_rows = _read(*touched)
        else:
            touched_rows = local_df(spark, [], target.schema)
        replacement = merge_dataframes(
            touched_rows, src, pk, strategy=strategy, update_key=update_key)

    jvm, fs, target_p = _fs(spark, target_path)
    tmp_uri = target_path.rstrip("/") + f"__merge_{uuid.uuid4().hex[:8]}"
    writer = replacement.write
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp_uri)

    # promote: hide originals (readers skip dot-files), move replacements
    # in (part-file names carry job UUIDs — no collisions), drop hidden
    hidden: list = []
    for f in touched:
        src_p = jvm.org.apache.hadoop.fs.Path(f)
        hid_p = jvm.org.apache.hadoop.fs.Path(
            src_p.getParent(), "." + src_p.getName() + ".stale")
        if not fs.rename(src_p, hid_p):
            raise IOError(f"merge_files: could not retire {f}")
        hidden.append(hid_p)

    def _promote(src_dir, dst_dir) -> int:
        n = 0
        for st in fs.listStatus(src_dir):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isDirectory():
                sub_dst = jvm.org.apache.hadoop.fs.Path(dst_dir, name)
                fs.mkdirs(sub_dst)
                n += _promote(st.getPath(), sub_dst)
                continue
            if not fs.rename(st.getPath(),
                             jvm.org.apache.hadoop.fs.Path(dst_dir, name)):
                raise IOError(f"merge_files: could not promote {name}")
            n += 1
        return n

    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp_uri)
    n_new = _promote(tmp_p, target_p)
    for hid_p in hidden:
        fs.delete(hid_p, False)
    fs.delete(tmp_p, True)

    def _count_files(d) -> int:
        n = 0
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            n += _count_files(st.getPath()) if st.isDirectory() else 1
        return n

    total_files = _count_files(target_p)
    return {"touched": len(touched), "new_files": n_new,
            "kept": total_files - n_new}
