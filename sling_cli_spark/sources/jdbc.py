"""JDBC source/sink: the reference's DB<->DB movement on Spark.

Reference surface: ``core/dbio/database/database.go:926-1084`` (stream
query), ``:2437-2503`` (generic batched insert), chunked parallel reads
``core/sling/replication.go:688-933`` (min/max probe -> N range
predicates). On Spark all three map to the built-in JDBC DataSource:

- stream query    -> ``spark.read.jdbc(query)`` (predicate pushdown via
  the dbtable subquery; Catalyst prunes columns into the SELECT)
- chunked read    -> ``partitionColumn/lowerBound/upperBound/
  numPartitions`` — N concurrent range scans, the exact plan the
  reference builds by hand
- batched insert  -> ``df.write.jdbc(batchsize=...)`` executed per
  partition (distributed, not a driver loop); reference batch size is
  2000 (templates/base.yaml:461-462)

No postgres/mysql/... driver jars ship in this container, but Apache
Derby (pure Java, embedded) lives in Spark's own ``jars/`` — so the
whole path executes LIVE against a real JDBC database in
``tests/test_jdbc_live.py`` (write, scan, pushed-down subquery, chunked
partitionColumn read with min/max probe, and the staged temp-table
MERGE). Vendor-specific options stay covered by the
``build_read_options``/``build_write_options`` unit tests.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.config import Mode, Source, Target

REFERENCE_BATCH_SIZE = 2000  # templates/base.yaml:461-462


def _as_query(stream: str) -> str | None:
    """A stream that is SQL becomes a pushed-down subquery.

    The alias deliberately has no leading underscore: SQL-standard
    engines (Derby among them) reject unquoted identifiers that don't
    start with a letter."""
    import re

    if re.search(r"\bselect\b[\s\S]+\bfrom\b", stream, re.IGNORECASE):
        return f"({stream}) AS sling_src"
    return None


def dialect_from_url(url: str) -> str:
    """jdbc:postgresql://… -> postgres (reference: connection URL sniffing)."""
    m = re.match(r"jdbc:([a-z0-9]+)", url or "")
    scheme = m.group(1) if m else ""
    return {"postgresql": "postgres", "mysql": "mysql", "mariadb": "mysql",
            "duckdb": "duckdb"}.get(scheme, scheme or "postgres")


def build_read_options(
    url: str, source: Source,
    bounds: tuple[Any, Any] | None = None,
    watermark: Any = None,
    mode: Mode | None = None,
    backfill_range: tuple[Any, Any] | None = None,
) -> dict[str, str]:
    """JDBC reader options incl. the chunked-parallel-read mapping.

    ``chunk_count``/``chunk_size`` (reference: replication.go:688-933)
    become partitionColumn/numPartitions; ``bounds`` carries the min/max
    probe result (run ``probe_bounds`` first — the reference issues the
    same probe query). A ``watermark`` (or ``backfill_range``) renders the
    dialect's incremental/backfill SELECT so the filter executes IN the
    source database (reference: core.incremental_select,
    templates/base.yaml:45-49) — at scale this is the difference between
    moving a day and moving the table.
    """
    opts: dict[str, str] = {"url": url}
    stream = source.stream or ""
    q = _as_query(stream)
    opts["dbtable"] = q if q else stream
    if not q and source.update_key and (
        watermark is not None or backfill_range is not None
    ):
        from sling_cli_spark.dialects import (
            backfill_where_sql, get_dialect, incremental_select_sql)

        d = get_dialect(dialect_from_url(url))
        if backfill_range is not None:
            cond = backfill_where_sql(
                d, source.update_key, *backfill_range)
            where = f" and ({source.where})" if source.where else ""
            sql = f"select * from {stream} where ({cond}){where}"
        else:
            sql = incremental_select_sql(
                d, stream, source.update_key, watermark,
                where=source.where)
        opts["dbtable"] = f"({sql}) AS sling_src"

    chunk_col = source.update_key
    n = source.options.chunk_count
    if source.options.chunk_size and not n:
        # chunk_size is a range width (e.g. numeric span or days);
        # resolve to a partition count from the probed bounds
        if bounds is not None and all(
            isinstance(b, (int, float)) for b in bounds
        ):
            span = float(bounds[1]) - float(bounds[0])
            width = float(source.options.chunk_size)
            n = max(1, int(span / width) + 1) if width > 0 else 1
    if chunk_col and n and n > 1 and bounds is not None:
        opts.update({
            "partitionColumn": chunk_col,
            "lowerBound": str(bounds[0]),
            "upperBound": str(bounds[1]),
            "numPartitions": str(n),
        })
    if source.options.datetime_format:
        opts["sessionInitStatement"] = ""
    return opts


def probe_bounds(
    spark: SparkSession, url: str, source: Source,
) -> tuple[Any, Any] | None:
    """min/max probe for the chunk column (reference issues
    ``SELECT min(k), max(k) FROM t`` before splitting)."""
    if not source.update_key:
        return None
    probe = (f"(SELECT min({source.update_key}) AS lo, "
             f"max({source.update_key}) AS hi FROM {source.stream}) AS sling_probe")
    row = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", probe).load().collect()[0]
    # positional access: case-normalizing engines (Derby and other
    # SQL-standard databases uppercase unquoted aliases) rename lo/hi
    if row[0] is None:
        return None
    return (row[0], row[1])


def read_jdbc(
    spark: SparkSession, url: str, source: Source,
    probe: bool = True,
) -> DataFrame:
    wants_chunks = bool(
        source.options.chunk_count or source.options.chunk_size)
    bounds = (probe_bounds(spark, url, source)
              if probe and wants_chunks else None)
    reader = spark.read.format("jdbc")
    for k, v in build_read_options(url, source, bounds).items():
        reader = reader.option(k, v)
    return reader.load()


def build_write_options(
    url: str, target: Target, mode: Mode,
    batch_size: int = REFERENCE_BATCH_SIZE,
) -> dict[str, str]:
    opts = {
        "url": url,
        "dbtable": target.object or "",
        "batchsize": str(batch_size),
    }
    if mode == Mode.TRUNCATE:
        # reuse the table definition, delete rows (reference TRUNCATE path)
        opts["truncate"] = "true"
    return opts


def staged_db_load(
    execute,
    fetch_one,
    dialect_name: str,
    target_table: str,
    columns: list[str],
    primary_key: list[str],
    write_stage,
    strategy: str | None = None,
    expect_count: int | None = None,
    delete_missing: str | None = None,
    keyset_table: str | None = None,
    delete_where: str | None = None,
    soft_fields: str | None = None,
) -> dict:
    """Temp-table transactional staging for DB targets (reference:
    ``task_run_write.go:228-498``): bulk-load a temp table, validate the
    landed row count, render+run the merge in a second transaction, then
    drop the temp table — the failure path never touches the final table.

    Driver-side SQL goes through caller-supplied ``execute(sql)`` /
    ``fetch_one(sql)`` so the same orchestration runs over a JDBC
    connection in production and over DuckDB in tests (no driver jar in
    this sandbox). ``write_stage(temp_table)`` performs the bulk load —
    in production that is ``df.write.jdbc(mode="append")`` executed from
    the executors, which is why it is a callable and not a DataFrame
    argument here.
    """
    from sling_cli_spark.dialects import (
        delete_missing_sql, generate_merge_sql, get_dialect)

    d = get_dialect(dialect_name)
    temp = re.sub(r"\W", "_", target_table) + "_sling_tmp"
    execute(f"drop table if exists {temp}")
    write_stage(temp)  # tx 1: bulk stage
    landed = fetch_one(f"select count(*) from {temp}")
    landed = landed[0] if isinstance(landed, (tuple, list)) else landed
    if expect_count is not None and landed != expect_count:
        execute(f"drop table if exists {temp}")
        raise ValueError(
            f"staged count {landed} != expected {expect_count}; "
            f"aborting before merge (final table untouched)")
    try:
        # tx 2: merge rendered for the dialect — multi-statement
        # strategies (delete_insert, change_capture: DELETE then
        # INSERT) split at top-level semicolons because JDBC
        # Statement.execute takes ONE statement (the DuckDB twin
        # tolerates batches; live drivers do not)
        for stmt in split_sql_statements(generate_merge_sql(
                d, temp, target_table, columns, primary_key, strategy)):
            execute(stmt)
        if delete_missing:
            for stmt in split_sql_statements(delete_missing_sql(
                    d, target_table, keyset_table or temp, primary_key,
                    soft=delete_missing == "soft",
                    where=delete_where or "1=1",
                    soft_fields=soft_fields)):
                execute(stmt)
    finally:
        execute(f"drop table if exists {temp}")
    return {"temp_table": temp, "staged_rows": landed}


def split_sql_statements(sql: str) -> list[str]:
    """Split rendered SQL on semicolons OUTSIDE single-quoted literals
    (the dialect templates join multi-statement strategies with ';')."""
    out, buf, in_str = [], [], False
    for ch in sql:
        if ch == "'":
            in_str = not in_str
            buf.append(ch)
        elif ch == ";" and not in_str:
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


def write_jdbc(
    df: DataFrame, url: str, target: Target, mode: Mode,
    batch_size: int = REFERENCE_BATCH_SIZE,
) -> None:
    spark_mode = ("overwrite" if mode in (Mode.FULL_REFRESH, Mode.TRUNCATE)
                  else "append")
    writer = df.write.format("jdbc").mode(spark_mode)
    for k, v in build_write_options(url, target, mode, batch_size).items():
        writer = writer.option(k, v)
    writer.save()
