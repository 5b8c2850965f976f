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

No JDBC driver jars ship in this container, so everything is exercised
through ``build_read_options``/``build_write_options`` unit tests; the
``read_jdbc``/``write_jdbc`` entry points are thin layers over
``spark.read/write`` with those options.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.config import Mode, Source, Target

REFERENCE_BATCH_SIZE = 2000  # templates/base.yaml:461-462


def _as_query(stream: str) -> str | None:
    """A stream that is SQL becomes a pushed-down subquery."""
    import re

    if re.search(r"\bselect\b[\s\S]+\bfrom\b", stream, re.IGNORECASE):
        return f"({stream}) AS __sling_src"
    return None


def build_read_options(
    url: str, source: Source,
    bounds: tuple[Any, Any] | None = None,
) -> dict[str, str]:
    """JDBC reader options incl. the chunked-parallel-read mapping.

    ``chunk_count``/``chunk_size`` (reference: replication.go:688-933)
    become partitionColumn/numPartitions; ``bounds`` carries the min/max
    probe result (run ``probe_bounds`` first — the reference issues the
    same probe query).
    """
    opts: dict[str, str] = {"url": url}
    stream = source.stream or ""
    q = _as_query(stream)
    opts["dbtable"] = q if q else stream

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
             f"max({source.update_key}) AS hi FROM {source.stream}) AS __p")
    row = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", probe).load().collect()[0]
    if row["lo"] is None:
        return None
    return (row["lo"], row["hi"])


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
