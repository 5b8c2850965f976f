"""File / table writers implementing the reference's load modes.

Mode mapping (reference: ``core/sling/task_run_write.go:915-1032``):

| mode            | Spark writer                                        |
|-----------------|-----------------------------------------------------|
| full-refresh    | ``mode("overwrite")``                               |
| truncate        | ``mode("overwrite")`` (+ truncate=true on JDBC)     |
| incremental/+pk | append, or merge plan (operators/merge.py)          |
| snapshot        | append + ``_sling_loaded_at`` stamp                 |
| definition-only | ``limit(0)`` write (schema only)                    |

File options (reference: ``config.go:1733-1762``, ``fs.go:855-1113``):
``file_max_rows`` -> ``maxRecordsPerFile`` (per-task split, no shuffle);
compression -> codec option; ``{part_*}`` URI masks -> ``partitionBy`` on
derived date-part columns — i.e. Hive-style layout Spark prunes natively.

Scale note: partitioned writes never funnel through the driver; each task
writes its own files. ``maxRecordsPerFile`` splits inside a task without a
repartition, so no extra shuffle is introduced by file sizing.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sling_cli_spark.config import Mode, Target, TargetOptions

# {part_*} mask -> (derived column name, expression builder)
_PART_FUNCS = {
    "part_year": lambda c: F.date_format(c, "yyyy"),
    "part_month": lambda c: F.date_format(c, "MM"),
    "part_day": lambda c: F.date_format(c, "dd"),
    "part_hour": lambda c: F.date_format(c, "HH"),
    "part_minute": lambda c: F.date_format(c, "mm"),
    "part_year_month": lambda c: F.date_format(c, "yyyy-MM"),
    "part_date": lambda c: F.date_format(c, "yyyy-MM-dd"),
    "part_week": lambda c: F.weekofyear(c).cast("string"),
}

_MASK_RE = re.compile(r"\{(part_[a-z_]+)\(([^)]+)\)\}|\{(part_[a-z_]+)\}")


def parse_partition_mask(object_uri: str, update_key: str | None = None):
    """Extract ``{part_*}`` masks from a target URI (reference:
    iop/partition.go:13-124). Returns (clean_uri, [(mask, source_col)])."""
    parts: list[tuple[str, str]] = []
    for m in _MASK_RE.finditer(object_uri):
        mask = m.group(1) or m.group(3)
        col = m.group(2) or update_key
        if not col:
            raise ValueError(f"partition mask {mask} needs a column")
        parts.append((mask, col))
    clean = _MASK_RE.sub("", object_uri).rstrip("/")
    return clean, parts


def _ensure_catalog_table(cat, ident, df: DataFrame, opts):
    """Auto-create the namespace and an EMPTY table on first load —
    like a DB target auto-creating schema.table (reference
    CreateNamespaceIfNotExists:1162 + CreateTable:1015)."""
    from sling_cli_spark.sources.iceberg_catalog import (
        create_table, split_ident)

    if not cat.table_exists(ident):
        ns, _ = split_ident(ident)
        cat.create_namespace(ns, exists_ok=True)
        create_table(cat, ident, df.schema,
                     partition_by=list(opts.partition_by) or None)


def _write_catalog(df: DataFrame, url: str, mode: Mode, opts):
    """Catalog-routed sink (reference BulkImportStream:1252): commit
    the batch under the pointer CAS. Idempotent txn ids ride the
    snapshot summary exactly as for path targets."""
    from sling_cli_spark.sources.iceberg_catalog import (
        open_catalog_url, write_table)

    cat, ident = open_catalog_url(url)
    _ensure_catalog_table(cat, ident, df, opts)
    kw = {}
    if opts.txn_app_id is not None:
        kw = {"txn_app_id": opts.txn_app_id,
              "txn_version": opts.txn_version}
    write_table(df, cat, ident, mode=_spark_mode(mode), **kw)


class AuditFailed(RuntimeError):
    """The WAP audit gate returned violations — the staged branch is
    left intact for inspection; nothing published to main."""


def _write_audit_publish(df, uri: str, mode, opts, part_cols):
    """Write-audit-publish (Iceberg's WAP workflow — the audit-branch
    pattern behind write.wap.enabled): the load lands on an AUDIT
    branch, invisible to main readers; ``audit_sql`` inspects the
    branch through the ``_audit`` temp view (rows returned =
    violations, dbt-test style); only a passing load PUBLISHES —
    fast-forward when main hasn't moved (any operation kind), falling
    back to cherry-pick for appends onto a moved head. A failing audit
    raises :class:`AuditFailed` and leaves the branch for inspection
    (drop-ref discards it; the next staged load otherwise publishes on
    top of it)."""
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    if opts.bucket_by:
        raise ValueError(
            "audit_branch + bucket_by is not supported (iceberg "
            "clustering goes through partition transforms, not Spark "
            "bucketed tables) — refusing beats silently dropping the "
            "bucket layout")
    spark = df.sparkSession
    branch = opts.audit_branch
    sid = write_iceberg(df, uri, mode=_spark_mode(mode),
                        partition_by=part_cols or None, branch=branch,
                        txn_app_id=opts.txn_app_id,
                        txn_version=opts.txn_version)
    audit_gate_and_publish(
        spark, uri, branch, opts.audit_sql, staged_sid=sid,
        allow_cherry_pick=_spark_mode(mode) == "append")


def audit_gate_and_publish(spark, uri: str, branch: str,
                           audit_sql: str | None,
                           staged_sid: int | None = None,
                           allow_cherry_pick: bool = False) -> None:
    """The audit + publish half of WAP, shared by the plain-write and
    the lake-merge load paths: run ``audit_sql`` against the branch
    (the ``_audit`` name in the SQL is the contract; the session view
    is per-call unique so concurrent loads never gate against each
    other's branch), then publish — fast-forward, with a cherry-pick
    fallback only for appends onto a moved head."""
    import re as _re
    import uuid as _uuid

    from sling_cli_spark.sources.iceberg_py import (
        cherry_pick_snapshot, fast_forward, read_iceberg)

    if audit_sql:
        view = f"_audit_{_uuid.uuid4().hex[:12]}"
        read_iceberg(spark, uri, ref=branch).createOrReplaceTempView(view)
        try:
            gate = _re.sub(r"\b_audit\b", view, audit_sql)
            if spark.sql(gate).limit(1).count() > 0:
                raise AuditFailed(
                    f"WAP audit failed for branch {branch!r} at {uri}: "
                    "audit_sql returned violations; the staged load is "
                    "left unpublished (lake drop-ref discards it)")
        finally:
            spark.catalog.dropTempView(view)
    try:
        fast_forward(uri, branch)
    except ValueError:
        if not (allow_cherry_pick and staged_sid is not None):
            raise
        cherry_pick_snapshot(uri, staged_sid)  # append onto moved head


def audit_gate_and_publish_catalog(
    spark, cat, ident, branch: str, audit_sql: str | None,
    staged_sid: int | None = None,
    allow_cherry_pick: bool = False,
) -> None:
    """Catalog twin of :func:`audit_gate_and_publish`: the gate runs
    against the pointed-at location's branch ref, and the PUBLISH
    (fast-forward / cherry-pick — the only metadata it advances) lands
    under the catalog's pointer CAS. A failing audit raises BEFORE any
    metadata write, so main and the pointer stay untouched while the
    staged branch remains catalog-visible for inspection; a lost
    publish CAS withdraws the local publish metadata (run_committed's
    contract) and leaves the staged branch intact for the retry."""
    from sling_cli_spark.sources.iceberg_catalog import run_committed

    run_committed(cat, ident, lambda location: audit_gate_and_publish(
        spark, location, branch, audit_sql, staged_sid=staged_sid,
        allow_cherry_pick=allow_cherry_pick))


def _write_catalog_wap(df: DataFrame, url: str, mode: Mode, opts):
    """Write-audit-publish for a ``catalog://`` target (VERDICT r9 ask
    #3; lifts the r8/r9 refusal): TWO pointer commits. First the load
    stages on the audit branch under the pointer CAS — spec-faithful:
    a branch write IS a table commit, just invisible to main readers
    (the pointed-at metadata gains the branch ref while main's head is
    unchanged). Then the gate runs and a passing load publishes —
    fast-forward (cherry-pick fallback for appends onto a moved head)
    — under a second CAS. AuditFailed leaves main and the pointer's
    main head untouched with the branch staged for inspection."""
    from sling_cli_spark.sources.iceberg_catalog import (
        open_catalog_url, run_committed)
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    if opts.bucket_by:
        raise ValueError(
            "audit_branch + bucket_by is not supported (iceberg "
            "clustering goes through partition transforms, not Spark "
            "bucketed tables) — refusing beats silently dropping the "
            "bucket layout")
    cat, ident = open_catalog_url(url)
    _ensure_catalog_table(cat, ident, df, opts)
    sid = run_committed(cat, ident, lambda location: write_iceberg(
        df, location, mode=_spark_mode(mode),
        partition_by=list(opts.partition_by) or None,
        branch=opts.audit_branch, txn_app_id=opts.txn_app_id,
        txn_version=opts.txn_version))
    audit_gate_and_publish_catalog(
        df.sparkSession, cat, ident, opts.audit_branch, opts.audit_sql,
        staged_sid=sid,
        allow_cherry_pick=_spark_mode(mode) == "append")


def write_files(
    df: DataFrame, target: Target, mode: Mode, fmt: str | None = None,
    update_key: str | None = None,
):
    """Physical write. ``update_key`` resolves bare ``{part_*}`` masks
    (the reference defaults partition masks to the stream's update_key,
    iop/partition.go:13-124)."""
    opts = target.options
    from sling_cli_spark.sources.iceberg_catalog import is_catalog_url

    if is_catalog_url(target.object):
        if opts.audit_branch:
            return _write_catalog_wap(df, target.object, mode, opts)
        return _write_catalog(df, target.object, mode, opts)
    uri, masks = parse_partition_mask(target.object or "", update_key)
    fmt = fmt or opts.format or _detect_format(uri)
    if opts.single and fmt in ("csv", "json", "jsonl", "parquet",
                               "orc", "xml", "avro"):
        return _write_single(df, uri, fmt, mode, target, update_key)

    part_cols: list[str] = list(opts.partition_by)
    for mask, col in masks:
        # hive-style dirs named <source_col>_<level>=<value> — exactly
        # the reference's GetPartitionDateMap layout (partition.go:431),
        # so paths written here parse back with
        # partitions.extract_partition_time_value
        part_col = f"{col}_{mask[len('part_'):]}"
        df = df.withColumn(part_col, _PART_FUNCS[mask](F.col(col)))
        part_cols.append(part_col)

    if fmt in ("json", "jsonl") and opts.json_columns:
        from sling_cli_spark.sinks.formats import json_inline_columns

        df = json_inline_columns(df, list(opts.json_columns))

    if fmt == "iceberg" and opts.audit_branch:
        return _write_audit_publish(df, uri, mode, opts, part_cols)

    if opts.bucket_by:
        return _write_bucketed(df, uri, fmt or "parquet", mode, opts)

    writer = df.write.mode(_spark_mode(mode))
    max_rows = opts.file_max_rows
    if not max_rows and opts.batch_limit:
        # batch_limit splits the write into batches of N rows — it never
        # drops rows (reference: SetBatchLimit, task_run_write.go:347)
        max_rows = int(opts.batch_limit)
    if opts.file_max_bytes and not max_rows:
        max_rows = _rows_for_bytes(df, opts.file_max_bytes,
                                   hint=opts.file_bytes_per_row)
    if max_rows:
        writer = writer.option("maxRecordsPerFile", str(max_rows))
    if opts.compression:
        writer = writer.option("compression", opts.compression)
    if opts.max_decimals is not None:
        # round float columns on write (config.go:1744 MaxDecimals)
        from pyspark.sql import types as T

        df = df.select(*[
            F.round(F.col(f"`{f.name}`"), opts.max_decimals).alias(f.name)
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)) else
            F.col(f"`{f.name}`")
            for f in df.schema.fields])
        writer = df.write.mode(_spark_mode(mode))
        if max_rows:
            writer = writer.option("maxRecordsPerFile", str(max_rows))
        if opts.compression:
            writer = writer.option("compression", opts.compression)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if fmt == "csv":
        # escape = quote: standard RFC-4180 quote DOUBLING ("") — Spark's
        # default backslash-escape writes \" which the reference's (and
        # our own) readers would mis-parse. Whitespace is DATA: Spark's
        # write default trims leading/trailing whitespace (the reference
        # writes values verbatim), so both trims are off.
        writer = writer.option("header", str(opts.header).lower()) \
            .option("sep", opts.delimiter or ",") \
            .option("quote", '"').option("escape", '"') \
            .option("ignoreLeadingWhiteSpace", "false") \
            .option("ignoreTrailingWhiteSpace", "false")
        if getattr(opts, "encoding", None):
            # output charset (target_options.encoding, r.33) — the
            # reference's encoding spellings normalize to JVM names.
            # Spark's CSV writer accepts a FIXED charset set; anything
            # else (windows-1252 etc.) writes utf-8 here and transcodes
            # in the single-file assembly (_write_single)
            from sling_cli_spark.sources.files import normalize_encoding

            enc = normalize_encoding(opts.encoding)
            if enc.lower() in _SPARK_CSV_CHARSETS:
                writer = writer.option("encoding", enc)
        if opts.datetime_format:
            # datetime_format is the reference's ISO-8601 token layout
            # (DD-MM-YYYY …); Spark's timestampFormat is a Java
            # DateTimeFormatter pattern where DD = day-of-YEAR — convert
            # on write exactly like the read path does
            from sling_cli_spark.partitions import iso8601_to_spark_layout

            writer = writer.option(
                "timestampFormat",
                iso8601_to_spark_layout(opts.datetime_format))
    if fmt in ("json", "jsonl"):
        # reference JSON writer shape (datastream.go
        # encodeRowAsJSONObject): null fields are EXPLICIT, and
        # json-typed columns inline raw (valid JSON embeds, anything
        # else stays a quoted string)
        writer = writer.option("ignoreNullFields", "false")
        if opts.datetime_format:
            from sling_cli_spark.partitions import iso8601_to_spark_layout

            writer = writer.option(
                "timestampFormat",
                iso8601_to_spark_layout(opts.datetime_format))
    if fmt in ("delta", "iceberg"):
        from sling_cli_spark.sources.files import is_missing_datasource

        if getattr(opts, "replace_where", None):
            # selective overwrite: the target range the batch covers
            # is deleted + replaced in ONE commit (delta-spark
            # replaceWhere / iceberg overwrite-by-filter) — the
            # backfill-target shape. A missing target degenerates to
            # a plain create (nothing to replace), like delta-spark.
            if fmt == "delta":
                from sling_cli_spark.sources.delta_py import (
                    is_delta_table, replace_where_delta, write_delta)

                if not is_delta_table(uri):
                    write_delta(df, uri, partition_by=part_cols or None)
                else:
                    replace_where_delta(df.sparkSession, uri, df,
                                        opts.replace_where)
            else:
                from sling_cli_spark.sources.iceberg_py import (
                    is_iceberg_table, overwrite_where_iceberg,
                    write_iceberg)

                if not is_iceberg_table(uri):
                    write_iceberg(df, uri,
                                  partition_by=part_cols or None)
                else:
                    overwrite_where_iceberg(df.sparkSession, uri, df,
                                            opts.replace_where)
            return
        if opts.txn_app_id is not None:
            # idempotent EL retry (delta: PROTOCOL.md §Transaction
            # Identifiers; iceberg: snapshot summary keys) needs the
            # marker in the SAME commit as the data — only the
            # spec-level writers thread it
            if fmt == "delta":
                from sling_cli_spark.sources.delta_py import write_delta

                write_delta(df, uri, mode=_spark_mode(mode),
                            partition_by=part_cols or None,
                            txn_app_id=opts.txn_app_id,
                            txn_version=opts.txn_version)
            else:
                from sling_cli_spark.sources.iceberg_py import (
                    write_iceberg)

                write_iceberg(df, uri, mode=_spark_mode(mode),
                              partition_by=part_cols or None,
                              txn_app_id=opts.txn_app_id,
                              txn_version=opts.txn_version)
            return
        try:
            writer.format(fmt).save(uri)
        except Exception as e:
            # only the jar-absent case falls back; a genuine native-write
            # failure re-raises (the fallback could double-write rows the
            # failed native attempt already committed)
            if not is_missing_datasource(e):
                raise
            # spec-level fallbacks when the jars are absent
            if fmt == "delta":
                from sling_cli_spark.sources.delta_py import write_delta

                write_delta(df, uri, mode=_spark_mode(mode),
                            partition_by=part_cols or None)
            else:
                from sling_cli_spark.sources.iceberg_py import write_iceberg

                write_iceberg(df, uri, mode=_spark_mode(mode),
                              partition_by=part_cols or None)
            return
        return
    if fmt == "arrow":
        from sling_cli_spark.sources.arrow import write_arrow

        write_arrow(df, uri)
        return
    if fmt == "xml":
        writer.format("xml").option("rowTag", "row") \
            .option("rootTag", "rows").save(uri)
        return
    if fmt == "avro":
        from sling_cli_spark.sources.files import is_missing_datasource

        try:
            writer.format("avro").save(uri)
        except Exception as e:
            if not is_missing_datasource(e):
                raise
            # stdlib OCF fallback (sources/avro_py.py) when the
            # spark-avro jar is absent
            from sling_cli_spark.sources.avro_py import write_avro_df

            write_avro_df(df, uri)
        return
    if fmt == "geojsonl":
        from sling_cli_spark.sinks.formats import write_geojsonl

        write_geojsonl(df, uri, mode=_spark_mode(mode))
        return
    if fmt == "excel":
        from sling_cli_spark.sinks.formats import write_excel

        write_excel(df, uri)
        return
    getattr(writer, _WRITERS[fmt])(uri)


# the CSV writer's charset whitelist (Spark CSVOptions)
_SPARK_CSV_CHARSETS = {"iso-8859-1", "us-ascii", "utf-16", "utf-16be",
                       "utf-16le", "utf-32", "utf-8"}


def _write_single(df, uri: str, fmt: str, mode: Mode, target,
                  update_key) -> None:
    """``single: true``: exactly ONE file at the exact target path
    (reference stream_config single; extension-named DB-export targets
    like ``folder/table.csv``). coalesce(1) + directory write + rename
    — one task writes everything, so this is opt-in, never the
    default."""
    import dataclasses
    import glob as _glob
    import shutil

    tmp = uri.rstrip("/") + ".__single_tmp__"
    # Spark accepts the file:// form; the local rename/glob below needs
    # plain paths
    ltmp = tmp.removeprefix("file://")
    luri = uri.rstrip("/").removeprefix("file://")
    shutil.rmtree(ltmp, ignore_errors=True)
    t2 = dataclasses.replace(
        target, object=tmp,
        options=dataclasses.replace(target.options, single=False))
    write_files(df.coalesce(1), t2, mode, fmt=fmt, update_key=update_key)
    parts = [p for p in sorted(_glob.glob(os.path.join(ltmp, "part-*")))
             if not p.endswith(".crc")]
    if not parts:
        shutil.rmtree(ltmp, ignore_errors=True)
        raise FileNotFoundError(f"single-file write produced no part: {tmp}")
    parent = os.path.dirname(luri)
    if parent:
        os.makedirs(parent, exist_ok=True)
    if os.path.isdir(luri):
        shutil.rmtree(luri)
    elif os.path.exists(luri):
        os.remove(luri)
    shutil.move(parts[0], luri)
    shutil.rmtree(ltmp, ignore_errors=True)
    enc = getattr(target.options, "encoding", None)
    if fmt == "csv" and enc:
        from sling_cli_spark.sources.files import normalize_encoding

        jvm_enc = normalize_encoding(enc)
        if jvm_enc.lower() not in _SPARK_CSV_CHARSETS:
            # charsets outside Spark's CSV whitelist (windows-1252,
            # latin5/9 ... — r.33): the part wrote utf-8; transcode the
            # assembled single file driver-side
            with open(luri, encoding="utf-8") as fin:
                text = fin.read()
            with open(luri, "w", encoding=jvm_enc,
                      errors="replace") as fout:
                fout.write(text)
    if fmt == "json":
        # a .json FILE is a JSON ARRAY document in the reference
        # (datastream.go NewJsonWriter wraps rows in [...]); Spark's
        # json source emits JSONL — wrap the single file (streaming
        # line rewrite; single-file writes are driver-bound by
        # contract). .jsonl keeps lines. Pinned by p.33.
        tmp2 = luri + ".__arr__"
        with open(luri) as fin, open(tmp2, "w") as fout:
            fout.write("[")
            first = True
            for line in fin:
                line = line.strip()
                if not line:
                    continue
                if not first:
                    fout.write(",")
                fout.write(line)
                first = False
            fout.write("]")
        os.replace(tmp2, luri)


def _write_bucketed(df, uri: str, fmt: str, mode: Mode, opts) -> None:
    """Hash-bucketed write (``bucket_by`` + ``bucket_count``): rows land
    in a fixed bucket file by key hash, and two tables bucketed the same
    way join WITHOUT a shuffle — the pre-partitioning the reference
    can't express but Spark rewards at 100 TB (co-located merge/join on
    PK). Bucket layout requires the session catalog (saveAsTable); the
    table name derives from the target path's basename, the files land
    AT the path. On a cluster, back the catalog with a metastore so the
    bucketing metadata outlives the session."""
    name = re.sub(r"\W+", "_", os.path.basename(uri.rstrip("/"))) \
        .strip("_") or "sling_bucketed"
    n = opts.bucket_count or 8
    spark = df.sparkSession
    if _spark_mode(mode) == "overwrite":
        spark.sql(f"drop table if exists `{name}`")
    (df.write.mode(_spark_mode(mode))
     .format(fmt if fmt in _WRITERS else "parquet")
     .option("path", uri)
     .bucketBy(n, *opts.bucket_by)
     .sortBy(*opts.bucket_by)
     .saveAsTable(name))


_WRITERS = {"parquet": "parquet", "csv": "csv", "json": "json",
            "jsonl": "json", "orc": "orc"}


# Catalyst-style default width per type (JVM defaultSize, strings bumped to
# a realistic payload width). Good enough for file-size budgeting.
_TYPE_BYTES = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "long": 8,
    "float": 4, "double": 8, "date": 4, "timestamp": 8,
    "timestamp_ntz": 8, "decimal": 16, "string": 24, "binary": 64,
}


def _rows_for_bytes(df: DataFrame, max_bytes: int, hint: int | None = None) -> int:
    """file_max_bytes -> maxRecordsPerFile from a schema-width estimate
    (reference sizes output files as bytes budget / avg row size,
    task_run_write.go:1110).

    Deliberately ZERO Spark actions: the caller may already have attached
    an ``Observation`` to this plan, and any probe action here would
    fulfill it with sample-sized metrics (wrong row counts, partial
    watermarks) besides re-scanning the source. ``file_bytes_per_row``
    overrides the estimate when the user knows better."""
    per_row = hint or sum(
        _TYPE_BYTES.get(f.dataType.typeName(), 48) for f in df.schema.fields
    )
    return max(1, int(max_bytes) // max(1, per_row))


def write_swap(
    df: DataFrame, target: Target, fmt: str | None = None,
    update_key: str | None = None,
) -> None:
    """Overwrite a path that ``df``'s plan may still be reading from.

    A lazy merge plan reads the current target files; a direct
    ``mode("overwrite")`` would delete them mid-recompute (data loss). The
    reference stages into a temp table then atomically swaps
    (``database.go:2955-2992`` SwapTable); we do the same with paths:
    write to ``<uri>__swap``, then rename over the target. The rename is a
    metadata operation on HDFS/local (object stores: per-file copy, still
    safe because the write completed first).
    """
    uri, _ = parse_partition_mask(target.object or "", update_key)
    tmp_uri = uri.rstrip("/") + "__swap"
    tmp_target = Target(conn=target.conn, object=tmp_uri, options=target.options)
    write_files(df, tmp_target, Mode.FULL_REFRESH, fmt=fmt, update_key=update_key)
    promote_swap(df.sparkSession, uri, tmp_uri)


def promote_swap(spark, uri: str, tmp_uri: str) -> None:
    """Promote a fully-written ``tmp_uri`` over ``uri`` without a window
    where the target is missing.

    The reference's SwapTable renames the live table ASIDE before
    promoting (``database.go:2955-2992``); delete-then-rename instead
    would leave the target empty if the process dies between the two.
    Sequence: target -> ``__old``, swap -> target, delete ``__old``; on a
    failed promote the ``__old`` copy is restored."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    final_p = jvm.org.apache.hadoop.fs.Path(uri)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp_uri)
    old_p = jvm.org.apache.hadoop.fs.Path(uri.rstrip("/") + "__old")
    fs = final_p.getFileSystem(conf)
    if fs.exists(old_p):
        fs.delete(old_p, True)
    had_target = bool(fs.exists(final_p))
    if had_target and not fs.rename(final_p, old_p):
        raise IOError(f"swap: could not stage {uri} aside")
    try:
        if not fs.rename(tmp_p, final_p):
            raise IOError(f"swap: could not promote {tmp_uri} over {uri}")
    except Exception:
        if had_target and fs.exists(old_p) and not fs.exists(final_p):
            fs.rename(old_p, final_p)  # restore the previous target
        raise
    if had_target:
        fs.delete(old_p, True)


def _detect_format(uri: str) -> str:
    # longest first so .jsonl never half-matches as .json
    for ext, fmt in (("parquet", "parquet"), ("jsonl", "jsonl"),
                     ("ndjson", "jsonl"), ("tsv", "csv"),
                     ("csv", "csv"), ("json", "json"), ("orc", "orc")):
        if uri.endswith(f".{ext}") or uri.endswith(f".{ext}/"):
            return fmt
    return "parquet"


def _spark_mode(mode: Mode) -> str:
    if mode in (Mode.FULL_REFRESH, Mode.TRUNCATE):
        return "overwrite"
    if mode == Mode.DEFINITION_ONLY:
        return "overwrite"
    return "append"


def prepare_for_mode(df: DataFrame, mode: Mode, run_ts=None) -> DataFrame:
    """Mode-specific row shaping before the physical write."""
    if mode == Mode.DEFINITION_ONLY:
        # create schema, zero rows (reference: WHERE 1=0 probe)
        return df.limit(0)
    if mode == Mode.SNAPSHOT:
        from sling_cli_spark.operators.metadata import with_loaded_at

        return with_loaded_at(df, run_ts)
    return df
