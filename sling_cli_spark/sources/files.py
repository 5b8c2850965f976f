"""File sources with sling option names.

Maps the reference's per-format readers (``core/dbio/iop/{csv,json,xml,
parquet,arrow,avro}.go`` + the multi-file Dataflow ``filesys/fs.go``) onto
``spark.read``:

- format detection by extension (reference: filesys path sniffing)
- CSV: header/delimiter/quote/escape/encoding/skip-lines/null_if; gzip/zstd
  codecs are native to Spark's text sources
- JSON/JSONL: multiLine for arrays-of-objects, flatten to ``__`` columns
- multi-file globs: Spark reads globs natively, one task per split — this
  replaces the reference's one-Datastream-per-file + column-merge machinery
  (``dataflow.go:305-512``); schema drift across files is handled by
  ``mergeSchema``/permissive string read + inference
- SQL-on-files (the reference's embedded-DuckDB kernel,
  ``filesys/fs.go:1280-1349``): temp view + ``spark.sql`` — Spark *is* the
  compute kernel here.

Excel/SAS need libraries not present in this container; they are gated and
raise with a clear message (plumbing is real: pandas -> createDataFrame).
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.localframe import local_df

from sling_cli_spark.config import Source, SourceOptions
from sling_cli_spark.operators.flatten import flatten

_EXT_FORMAT = {
    ".csv": "csv", ".tsv": "csv", ".json": "json", ".jsonl": "jsonl",
    ".ndjson": "jsonl", ".parquet": "parquet", ".avro": "avro",
    ".xml": "xml", ".xlsx": "excel", ".xlsm": "excel",
    ".sas7bdat": "sas7bdat",
    ".arrow": "arrow", ".feather": "arrow", ".arrows": "arrow",
    ".orc": "orc",
}


_COMPRESS_EXTS = (".gz", ".bz2", ".zst", ".snappy", ".zip")

# Markers that a Spark DataSource is simply absent from the classpath —
# the ONLY condition under which the spec-level driver fallbacks engage.
# Any other failure (corrupt data, permissions, partial write) re-raises:
# silently re-running it through the fallback could double-apply work.
_MISSING_DS_MARKERS = (
    "Failed to find data source",
    "Failed to find the data source",
    "DATA_SOURCE_NOT_FOUND",
    "ClassNotFoundException",
    "Multiple sources found",  # conflicting jars: also a classpath issue
)


def is_missing_datasource(e: Exception) -> bool:
    """True iff ``e`` means the format's connector jar is not on the
    classpath (vs. a genuine read/write failure)."""
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in _MISSING_DS_MARKERS)


def detect_format(path: str, opts: SourceOptions) -> str:
    if opts.format:
        return opts.format
    base = re.sub(r"^file://", "", path).rstrip("/*")
    # strip compression suffixes so data.csv.gz detects as csv
    for cext in _COMPRESS_EXTS:
        if base.endswith(cext):
            base = base[: -len(cext)]
            break
    # longest extension first so .jsonl beats .json
    for ext, fmt in sorted(_EXT_FORMAT.items(), key=lambda kv: -len(kv[0])):
        if base.endswith(ext):
            return fmt
    # table-format dirs MUST be detected: reading a delta dir as plain
    # parquet would include removed (tombstoned) data files
    if os.path.isdir(os.path.join(base, "_delta_log")):
        return "delta"
    if os.path.isfile(os.path.join(base, "metadata", "version-hint.text")):
        return "iceberg"
    # plain directory: the first child file's extension decides (the
    # reference streams folder sources per-file by extension)
    if os.path.isdir(base):
        import glob as _glob

        # bounded scan: markers (_SUCCESS, .crc) skip, first recognized
        # data extension decides; cap the walk so a huge extension-less
        # directory costs O(50), not O(children)
        for child in sorted(_glob.glob(os.path.join(base, "*")))[:50]:
            if not os.path.isfile(child):
                continue
            c = child
            for cext in _COMPRESS_EXTS:
                if c.endswith(cext):
                    c = c[: -len(cext)]
                    break
            for ext, fmt in sorted(_EXT_FORMAT.items(),
                                   key=lambda kv: -len(kv[0])):
                if c.endswith(ext):
                    return fmt
    # directory of parquet is the common lake layout
    return "parquet"


def _sample_head(spark: SparkSession, path: str,
                 encoding: str = "utf-8", nbytes: int = 16384) -> str:
    """First ``nbytes`` of the first file under ``path`` (file, dir, or
    glob) decoded for delimiter sniffing. Compressed files refuse (the
    caller falls back to the configured delimiter)."""
    import glob as _glob

    if any(path.endswith(e) for e in _COMPRESS_EXTS) \
            and not path.endswith(".gz"):
        raise ValueError("compressed sample")
    def _is_data_file(f: str) -> bool:
        # skip write markers (_SUCCESS, .crc) and empty files — an
        # empty sample would silently disable both sniffs
        b = os.path.basename(f)
        return (os.path.isfile(f) and not b.startswith(("_", "."))
                and os.path.getsize(f) > 0)

    if "://" not in path or path.startswith("file:"):
        p = path.removeprefix("file:")
        cands = ([p] if os.path.isfile(p) else
                 sorted(f for f in _glob.glob(p) if _is_data_file(f)) or
                 sorted(f for f in _glob.glob(os.path.join(p, "*"))
                        if _is_data_file(f)))
        if not cands:
            raise FileNotFoundError(path)
        if cands[0].endswith(".gz"):
            # gzip head decompresses driver-side so gz CSVs keep both
            # sniffs (delimiter + quoted-newline) — other codecs refuse
            import gzip as _gzip

            with _gzip.open(cands[0], "rb") as f:
                raw = f.read(nbytes)
        else:
            with open(cands[0], "rb") as f:
                raw = f.read(nbytes)
    else:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(conf)
        statuses = fs.globStatus(hp) or []
        target = None
        for st in statuses:
            if st.isFile():
                target = st.getPath()
                break
            for sub in fs.listStatus(st.getPath()):
                if sub.isFile():
                    target = sub.getPath()
                    break
            if target:
                break
        if target is None:
            raise FileNotFoundError(path)
        # Py4J passes a Python bytearray to Java BY VALUE: the JVM fills
        # its own copy and the Python buffer stays zeroed, so
        # stream.read(buf) can never work across the gateway. Read via a
        # Java helper that RETURNS byte[] (converted to Python bytes):
        # BoundedInputStream caps the read at nbytes so a multi-GB file
        # is never slurped.
        stream = fs.open(target)
        try:
            bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
                stream, nbytes)
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(bounded))
        finally:
            stream.close()
    if b"\x00" in raw:
        raise ValueError("binary sample")
    return raw.decode(encoding or "utf-8", "replace")


def _first_parquet_file(path: str) -> str | None:
    """First physical .parquet file under ``path`` (local paths only;
    None for remote/unreadable), for driver-side footer inspection."""
    import glob as _glob

    p = path.removeprefix("file:")
    if os.path.isfile(p):
        return p
    return next(
        iter(sorted(_glob.glob(os.path.join(p, "**", "*.parquet"),
                               recursive=True)
                    or _glob.glob(p))), None)


def _parquet_nano_fields(path: str) -> list[tuple[str, bool]]:
    """``(column, is_adjusted_to_utc)`` for every top-level INT64
    TIMESTAMP(NANOS) column in the parquet footer of the first file
    under ``path`` — empty for non-nano (or remote/unreadable) inputs.
    Footer-based routing means the nano-conversion path runs on EVERY
    ns read, not just the first one in a session (the exception-based
    route stops firing once ``nanosAsLong`` has been set). Checked at
    the PARQUET schema level, not arrow's: pyarrow reports legacy INT96
    timestamps (Spark's own default output) as timestamp[ns] too, and
    those Spark reads natively."""
    first = _first_parquet_file(path)
    if not first or not os.path.isfile(first):
        return []
    import pyarrow.parquet as pq

    try:
        sch = pq.ParquetFile(first).schema
    except Exception:
        return []
    out = []
    for i in range(len(sch)):
        col = sch.column(i)
        lt = col.logical_type
        if (col.physical_type == "INT64" and lt.type == "TIMESTAMP"
                and "timeUnit=nanoseconds" in str(lt)
                and "." not in col.path):
            out.append((col.name,
                        "isAdjustedToUTC=true" in str(lt)))
    return out


def _read_parquet_nanos(spark: SparkSession, path: str) -> DataFrame:
    """Parquet with TIMESTAMP(NANOS) columns — Spark has no nano
    precision, so read them as longs (``legacy.parquet.nanosAsLong``)
    and convert to µs timestamps (adjusted-UTC nanos → timestamp,
    local-semantics nanos → timestamp_ntz), exactly the truncation the
    reference's Arrow bridge applies.

    The conf is intentionally NOT restored after the read: the returned
    DataFrame is lazy, and the parquet scan re-consults the conf at
    action time — flipping it back would make the scan fail (or
    mis-type) when the caller finally materializes. Leaving it set is
    safe because routing is footer-based (``_parquet_nano_fields``), so
    every ns read goes through this conversion and non-ns reads are
    unaffected by the flag."""
    from pyspark.sql import functions as F

    nano_fields = _parquet_nano_fields(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    long_types = dict(df.dtypes)
    for name, adjusted_utc in nano_fields:
        if long_types.get(name) != "bigint":
            continue  # already a native read (defensive)
        micros = F.timestamp_micros((F.col(name) / 1000).cast("long"))
        df = df.withColumn(
            name, micros if adjusted_utc else micros.cast("timestamp_ntz"))
    return df


# the reference's Encoding enum names (transforms.go:130-146) mapped to
# the charset names the JVM CSV reader accepts
_ENCODING_ALIASES = {
    "utf8": "UTF-8", "utf-8": "UTF-8", "utf8_bom": "UTF-8",
    "utf16": "UTF-16", "utf-16": "UTF-16",
    "latin1": "ISO-8859-1", "latin5": "ISO-8859-9",
    "latin9": "ISO-8859-15",
    "windows1250": "windows-1250", "windows1252": "windows-1252",
    "ascii": "US-ASCII",
}


def normalize_encoding(enc: str | None) -> str:
    """Accept the reference's encoding spellings (``utf8``, ``latin1``,
    transforms.go:130-146) anywhere a JVM charset name is needed."""
    if not enc:
        return "UTF-8"
    return _ENCODING_ALIASES.get(enc.strip().lower(), enc)


def sample_has_quoted_newlines(sample: str, quote: str = '"') -> bool:
    """True when a physical line of the sample carries an ODD number of
    quote chars — a quoted field is spanning the line break (escaped
    quotes double up, so they count even). Conservative: the truncated
    final line is dropped before counting."""
    lines = sample.split("\n")
    if len(lines) > 1:
        lines = lines[:-1]
    return any(ln.count(quote) % 2 == 1 for ln in lines)


def detect_delimiter(specified: str | None, sample: str) -> tuple[str, int]:
    """Pick the delimiter whose CSV parse of the sample yields the
    highest average column count (csv.go detectDelimiter). The
    configured delimiter is tried FIRST (wins ties) but a clearly
    better candidate overrides it. Returns (delimiter, max_columns);
    raises when nothing splits the sample into >1 column."""
    import csv as _csv
    import io

    cands = [",", "\t", "|", ";"]
    if specified:
        cands = [specified[0]] + cands
    lines = sample.split("\n")
    if len(lines) > 2:  # drop the (possibly truncated) last line
        sample = "\n".join(lines[:-1])
    best, best_avg, num_cols, failures = cands[0], 0.0, 0, 0
    for d in cands:
        total = count = mx = 0
        try:
            for row in _csv.reader(io.StringIO(sample), delimiter=d):
                total += len(row)
                count += 1
                mx = max(mx, len(row))
        except _csv.Error:
            failures += 1
            continue
        if count and total / count > best_avg:
            best_avg, best, num_cols = total / count, d, mx
    if num_cols <= 1 or failures == len(cands):
        raise ValueError("could not detect delimiter")
    return best, num_cols


def read_files(
    spark: SparkSession, path: str, opts: SourceOptions,
    skip_filters=None,
) -> DataFrame:
    fmt = detect_format(path, opts)
    if fmt == "parquet":
        if opts.merge_schemas:
            # drift across files: union of all file schemas
            # (reference: dataflow MergeColumns on multi-file streams)
            return spark.read.option("mergeSchema", "true").parquet(path)
        # footer-based nano routing: once nanosAsLong has been set for
        # the session, a second ns read no longer raises — it would
        # silently return raw longs, so the exception can't be the
        # router (ADVICE r12). The footer check is authoritative; the
        # exception fallback only covers remote paths the driver-side
        # pyarrow probe can't reach.
        if _parquet_nano_fields(path):
            return _read_parquet_nanos(spark, path)
        try:
            df = spark.read.parquet(path)
            df.schema  # force footer read so nano timestamps fail HERE
            return df
        except Exception as e:
            if "PARQUET_TYPE_ILLEGAL" not in str(e):
                raise
            return _read_parquet_nanos(spark, path)
    if fmt == "orc":
        # native columnar twin of the parquet path: same pushdown/pruning
        # (ORC bloom/min-max indexes), splittable scans
        if opts.merge_schemas:
            return spark.read.option("mergeSchema", "true").orc(path)
        return spark.read.orc(path)
    if fmt == "csv":
        # driver-side head sample serves two sniffs (csv.go:243-256):
        # 1. delimiter detection — ONLY when none was configured
        #    (c.Delimiter == ""); a configured delimiter, including ',',
        #    is authoritative and never overridden (a pipe-delimited
        #    file with comma-laden text must not re-parse on ',')
        # 2. quoted embedded newlines — the reference's streaming Go
        #    csv reader handles them by DEFAULT; Spark needs multiLine,
        #    which costs scan splittability, so it auto-enables only
        #    when the sample proves a quoted field spans lines
        # Compressed or unreadable samples fall back to the configured
        # values.
        sep = opts.delimiter or ","
        multi_line = opts.multi_line
        sample = None
        try:
            sample = _sample_head(spark, path, opts.encoding)
        except Exception:
            pass
        if sample is not None:
            if not opts.delimiter:
                try:
                    sep, _ = detect_delimiter(None, sample)
                except Exception:
                    pass
            if not multi_line and sample_has_quoted_newlines(
                    sample, opts.quote):
                multi_line = True
        reader = (
            spark.read.option("header", str(opts.header).lower())
            .option("sep", sep)
            .option("quote", opts.quote)
            .option("escape", opts.escape)
            .option("encoding", normalize_encoding(opts.encoding))
            # multiLine makes each file a single unsplittable task — at scale
            # this serializes the scan. Off unless configured OR the head
            # sample proves quoted embedded newlines (reference parses
            # those by default, but pays the same single-reader price).
            .option("multiLine", str(multi_line).lower())
            .option("mode", "PERMISSIVE")
        )
        if opts.null_if is not None:
            reader = reader.option("nullValue", opts.null_if)
        if opts.datetime_format:
            from sling_cli_spark.partitions import iso8601_to_spark_layout

            reader = reader.option(
                "timestampFormat",
                iso8601_to_spark_layout(opts.datetime_format))
        # read as strings; operators/inference.py supplies the casts
        # (reference: 900-row sample classifier, dataset.go:422-610)
        reader = reader.option("inferSchema", "false")
        if opts.skip_lines:
            # Spark CSV has no skip-rows option: drop the first N physical
            # lines per file from a text read, then parse the remainder.
            df = _read_csv_skip_lines(spark, path, opts, reader, sep)
        else:
            df = reader.csv(path)
        if opts.header and opts.clean_header:
            # csv.go:350 — every CSV header row passes CleanHeaderRow
            from sling_cli_spark.operators.select import clean_header_row

            df = df.toDF(*clean_header_row(list(df.columns)))
        if not opts.header:
            # headerless files get the reference's dummy names col_001..
            # (csv.go:299 CreateDummyFields), not Spark's _c0..
            df = df.toDF(*[f"col_{i + 1:03d}"
                           for i in range(len(df.columns))])
        if not opts.empty_field_as_null and opts.null_if is None:
            # empty_field_as_null=false (stream_processor.go): an empty
            # CSV field IS the empty string, not NULL — and in CSV text
            # every absent value is an empty field, so the string-typed
            # read coalesces nulls back to ""
            df = df.na.fill("")
        return df
    if fmt in ("json", "jsonl"):
        reader = spark.read.option("multiLine", "true" if fmt == "json" else "false")
        df = reader.json(path)
        rec_path = opts.jmespath or (
            # jq alias: ".data[]" spells the same record extraction
            # (leading dot drops; "[]" stays — _apply_record_path
            # explodes it)
            (opts.jq or "").strip().lstrip(".")
            if getattr(opts, "jq", None) else None)
        if rec_path:
            df = _apply_record_path(df, rec_path)
        if opts.flatten:
            depth = 0 if opts.flatten is True else int(opts.flatten)
            df = flatten(df, max_depth=depth)
        return _reorder_to_source_keys(df, path)
    if fmt == "avro":
        try:
            return spark.read.format("avro").load(path)
        except Exception as e:
            if not is_missing_datasource(e):
                raise
            # spark-avro jar absent (external since Spark 2.4): stdlib
            # OCF parser on the driver (sources/avro_py.py) — native
            # distributed reader preferred when the jar is present
            from sling_cli_spark.sources.avro_py import read_avro_df

            return read_avro_df(spark, path)
    if fmt == "arrow":
        from sling_cli_spark.sources.arrow import read_arrow

        return read_arrow(spark, path)
    if getattr(opts, "incremental_by_lineage", False) \
            and fmt in ("delta", "iceberg"):
        # lineage-incremental EL (r11): the source is the rows created
        # or updated past the lineage watermark — the runner threads
        # the state watermark in as a skip-filter conjunct on the
        # lineage sequence column; the incremental readers prune files
        # at or below it from manifest/log METADATA (never opened)
        since = 0
        for c, op, v in (skip_filters or []):
            if op == ">" and c in ("_last_updated_sequence_number",
                                   "_row_commit_version"):
                since = int(v)
        if fmt == "iceberg":
            from sling_cli_spark.sources.iceberg_py import (
                read_iceberg_incremental)

            return read_iceberg_incremental(spark, path, since)
        from sling_cli_spark.sources.delta_py import (
            read_delta_incremental)

        return read_delta_incremental(spark, path, since)
    if getattr(opts, "change_feed", False) and fmt in ("delta", "iceberg"):
        # CDC-style EL: the source is the table's CHANGE FEED, not its
        # state — rows arrive with _change_type (+ version/snapshot
        # stamps), the shape a change_capture replication consumes
        if fmt == "delta":
            from sling_cli_spark.sources.delta_py import read_change_feed

            return read_change_feed(
                spark, path,
                starting_version=getattr(
                    opts, "starting_version", None) or 0,
                starting_timestamp_ms=getattr(
                    opts, "starting_timestamp", None),
                ending_timestamp_ms=getattr(
                    opts, "ending_timestamp", None))
        from sling_cli_spark.sources.iceberg_py import iceberg_changelog

        return iceberg_changelog(
            spark, path,
            from_snapshot_id=getattr(opts, "starting_snapshot_id", None))
    if fmt in ("delta", "iceberg"):
        # table formats prefer their connector jars (stock DataSource
        # API, distributed); without them, Delta falls back to the
        # protocol-level log replay in sources/delta_py.py
        try:
            return spark.read.format(fmt).load(path)
        except Exception as e:
            if not is_missing_datasource(e):
                raise
            if fmt == "delta":
                from sling_cli_spark.sources.delta_py import read_delta

                return read_delta(spark, path, skip_filters=skip_filters)
            # iceberg: spec-level reader (sources/iceberg_py.py)
            from sling_cli_spark.sources.iceberg_py import read_iceberg

            return read_iceberg(spark, path, skip_filters=skip_filters)
    if fmt == "xml":
        # native in Spark 4 (SPARK-44265). The reference's XML reader
        # auto-detects the record element (xml.go walks the doc); Spark
        # needs an explicit rowTag — sniff the repeated depth-2 element
        # when the configured tag yields nothing (r.51: <data><element>)
        df = spark.read.format("xml") \
            .option("rowTag", opts.row_tag).load(path)
        if not df.columns or df.columns == ["_corrupt_record"]:
            tag = _sniff_xml_row_tag(path)
            if tag and tag != opts.row_tag:
                df = spark.read.format("xml") \
                    .option("rowTag", tag).load(path)
        return df
    if fmt in ("excel", "sas7bdat"):
        return _read_via_pandas(spark, path, fmt, opts)
    raise ValueError(f"unsupported source format: {fmt!r}")


def _sniff_xml_row_tag(path: str, nbytes: int = 65536) -> str | None:
    """First repeated child element under the XML root — the record tag
    the reference's reader infers implicitly. Driver-side head peek,
    same budget as the JSON key-order sniff."""
    import glob as _glob
    import re as _re

    p = path.removeprefix("file:")
    first = p if os.path.isfile(p) else next(
        iter(sorted(_glob.glob(os.path.join(p, "*"))
                    or _glob.glob(p))), None)
    if not first or not os.path.isfile(first):
        return None
    try:
        with open(first, "rb") as f:
            raw = f.read(nbytes).decode("utf-8", "replace")
    except OSError:
        return None
    tags = _re.findall(r"<([A-Za-z_][\w.-]*)[\s>]", raw)
    if len(tags) < 2:
        return None
    root, depth2 = tags[0], tags[1] if len(tags) > 1 else None
    if not depth2:
        return None
    # confirm repetition (a single child is ambiguous but still the
    # best guess for a record element)
    return depth2 if depth2 != root else None


def _first_object_keys(path: str, nbytes: int = 65536) -> list[str]:
    """Top-level keys of the FIRST JSON object in source order, from a
    driver-side head peek (the reference's jsonStream peeks raw bytes
    via RawMessage + FirstObjectKeysInOrder before unmarshaling —
    Spark's schema inference sorts keys alphabetically, losing the
    order `*` expansion must keep; pinned by p.33). Empty on remote or
    unparseable inputs (callers keep Spark's order)."""
    import glob as _glob
    import json as _json

    p = path.removeprefix("file:")
    first = p if os.path.isfile(p) else next(
        iter(sorted(f for f in _glob.glob(os.path.join(p, "*"))
                    if os.path.isfile(f))
             or sorted(_glob.glob(p))), None)
    if not first or not os.path.isfile(first):
        return []
    try:
        with open(first, "rb") as f:
            raw = f.read(nbytes).decode("utf-8", "replace")
    except OSError:
        return []
    start = raw.find("{")
    if start < 0:
        return []
    # object_pairs_hook fires INNERMOST-first: the OUTERMOST (= last)
    # call carries the record's top-level keys
    calls: list[list[str]] = []

    def hook(pairs):
        calls.append([k for k, _ in pairs])
        return dict(pairs)

    dec = _json.JSONDecoder(object_pairs_hook=hook)
    try:
        dec.raw_decode(raw, start)
    except ValueError:
        # truncated head: only nested objects decoded — their keys
        # would be WRONG for the record; keep Spark's order instead
        return []
    return calls[-1] if calls else []


def _reorder_to_source_keys(df: DataFrame, path: str) -> DataFrame:
    """Project ``df``'s columns into the source's first-object key
    order (flattened children follow their parent; unknown columns
    keep Spark's order at the end). A pure projection — Catalyst
    collapses it into the scan."""
    keys = _first_object_keys(path)
    if not keys:
        return df
    pos = {k.lower(): i for i, k in enumerate(keys)}

    def rank(c: str):
        base = c.split("__", 1)[0].lower()
        return (pos.get(base, len(pos)),)

    ordered = sorted(df.columns, key=lambda c: (rank(c),
                                                df.columns.index(c)))
    if ordered == list(df.columns):
        return df
    return df.select(*[f"`{c}`" for c in ordered])


def _apply_record_path(df: DataFrame, path: str) -> DataFrame:
    """Record extraction for JSON sources (reference's jmespath/jq option,
    ``core/dbio/iop/json.go:44-120``). Supports dotted paths where a
    segment suffixed ``[]`` explodes an array: ``data[].record`` selects
    each element of ``data`` then projects ``record.*``."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for seg in path.split("."):
        explode_it = seg.endswith("[]")
        name = seg[:-2] if explode_it else seg
        if name:
            if name not in df.columns:
                raise ValueError(f"jmespath: field not found: {name!r}")
            df = df.select(F.col(f"`{name}`").alias("__rec"))
        if explode_it:
            df = df.select(F.explode(F.col("__rec" if name else "`__rec`"))
                           .alias("__rec"))
        if isinstance(df.schema["__rec"].dataType, T.StructType):
            df = df.select("__rec.*")
    return df


def _read_csv_skip_lines(
    spark: SparkSession, path: str, opts, reader, sep: str | None = None,
) -> DataFrame:
    """Skip the first ``skip_lines`` physical lines of each file.

    All-JVM plan: text scan -> per-file window filter -> ``from_csv``
    projection. Line position within a file is recovered by ordering on
    ``(_metadata.file_block_start, monotonically_increasing_id)``: ids
    increase with read order inside a partition, and blocks of one file
    are ordered by their start offset — a documented file-source column,
    unlike bare monotonic ids across partitions. No global sort (the
    window filter is enough; row order of the parsed body is irrelevant)
    and no RDD/Python hop (the old ``reader.csv(rdd)`` round-tripped
    every row through Python). The one driver action is a single-row
    header sniff — the same cost as any header read.
    """
    import csv as _csv

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    txt = (
        spark.read.text(path)
        .select(
            F.col("_metadata.file_path").alias("__f"),
            F.col("_metadata.file_block_start").alias("__b"),
            F.monotonically_increasing_id().alias("__i"),
            "value",
        )
    )
    w = Window.partitionBy("__f").orderBy("__b", "__i")
    kept = (
        txt.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > int(opts.skip_lines))
    )
    first_data = int(opts.skip_lines) + 1
    head = kept.filter(F.col("__rn") == first_data).select("value").limit(1).collect()
    if not head:
        return spark.range(0).drop("id")
    sep = sep or opts.delimiter or ","
    fields = next(_csv.reader(
        [head[0]["value"]], delimiter=sep, quotechar=opts.quote))
    if opts.header:
        names = fields
        body = kept.filter(F.col("__rn") > first_data)
    else:
        names = [f"col_{i + 1:03d}" for i in range(len(fields))]
        body = kept
    schema = ", ".join(f"`{n}` string" for n in names)
    csv_opts = {"sep": sep, "quote": opts.quote,
                "escape": opts.escape, "mode": "PERMISSIVE"}
    if opts.null_if is not None:
        csv_opts["nullValue"] = opts.null_if
    return body.select(
        F.from_csv(F.col("value"), schema, csv_opts).alias("__r")
    ).select("__r.*")


def _read_via_pandas(
    spark: SparkSession, path: str, fmt: str, opts: SourceOptions
) -> DataFrame:
    """Driver-side staging for formats without a Spark reader (small files)."""
    import pandas as pd  # noqa: F401

    path = re.sub(r"^file://", "", path)
    try:
        if fmt == "excel":
            try:
                import openpyxl  # noqa: F401
                pdf = pd.read_excel(path, sheet_name=opts.sheet or 0)
            except ImportError:
                # stdlib fallback: zero-dependency xlsx parser with the
                # reference's Sheet1!A1:C100 range syntax (sources/xlsx.py)
                from sling_cli_spark.sources.xlsx import read_xlsx

                header, rows = read_xlsx(path, opts.sheet)
                pdf = pd.DataFrame(rows, columns=header)
        else:
            pdf = pd.read_sas(path, encoding="infer")
            # readers without an in-file encoding hint return bytes cells
            for c in pdf.columns:
                if pdf[c].dtype == object and pdf[c].map(
                        lambda v: isinstance(v, bytes)).any():
                    pdf[c] = pdf[c].map(
                        lambda v: v.decode("utf-8", "replace")
                        if isinstance(v, bytes) else v)
    except ImportError as e:
        raise NotImplementedError(
            f"{fmt} source requires a reader library not present in this "
            f"environment ({e}); plumbing: pandas -> spark.createDataFrame"
        ) from e
    return spark.createDataFrame(pdf)


def sql_on_files(
    spark: SparkSession, sql: str, tables: dict[str, str],
    opts: SourceOptions | None = None,
) -> DataFrame:
    """Arbitrary SQL over file globs (reference's DuckDB kernel -> Spark SQL)."""
    opts = opts or SourceOptions()
    for name, path in tables.items():
        read_files(spark, path, opts).createOrReplaceTempView(name)
    return spark.sql(sql)


def read_source(
    spark: SparkSession, source: Source, base_dir: str = "",
    skip_filters=None,
) -> DataFrame:
    """Entry used by the task runner: stream may be a path, glob, SQL, or
    a remote URI (http/https/ftp/sftp/gdrive — staged locally first,
    sources/remote.py). ``skip_filters`` (``(col, op, value)`` conjuncts,
    e.g. the incremental watermark) reach Delta-log sources as
    stats-based FILE pruning; other formats ignore them (parquet gets
    row-group skipping from the pushed row filter instead)."""
    stream = source.stream or ""
    if (source.conn or "").startswith("api://"):
        # spec-driven API connection: stream = endpoint name (reference
        # task_run_read.go API-source path; sources/api_spec bridge)
        from sling_cli_spark.sources.api_spec import read_api_source

        return read_api_source(spark, source)
    if (source.conn or "").startswith(("duckdb:", "sqlite:")):
        # database SOURCE: SELECT rendered with incremental/backfill
        # pushdown, exported via the dialect's file-direct COPY TO
        # staged parquet, scanned distributed (sinks/db_load.py)
        from sling_cli_spark.sinks.db_load import read_db_source

        return read_db_source(spark, source, skip_filters=skip_filters)
    if source.is_sql:
        return spark.sql(stream)
    from sling_cli_spark.sources.iceberg_catalog import is_catalog_url

    if is_catalog_url(stream):
        # catalog-managed iceberg table (reference
        # database_iceberg.go StreamRowsContext:741): resolve the
        # pointer, scan MoR; the watermark skip-filter prunes via
        # manifest bounds exactly like the path case
        from sling_cli_spark.sources.iceberg_catalog import (
            open_catalog_url, read_table)

        cat, ident = open_catalog_url(stream)
        if hasattr(cat, "view_exists") and cat.view_exists(ident):
            # catalog VIEW as an EL source (r10): resolve + run its
            # SQL; the underlying table scans prune through their own
            # reads, and the caller's incremental row filter pushes
            # into the view's plan wherever Catalyst can
            from sling_cli_spark.sources.iceberg_views import read_view
            return read_view(cat, spark, ident)
        return read_table(cat, spark, ident, skip_filters=skip_filters)
    from sling_cli_spark.sources.remote import is_remote, stage_remote

    if is_remote(stream):
        staged = stage_remote(stream)
        return read_files(spark, staged, source.options,
                          skip_filters=skip_filters)
    path = stream if os.path.isabs(stream) else os.path.join(base_dir, stream)
    return read_files(spark, path, source.options,
                      skip_filters=skip_filters)


def _path_exists(spark: SparkSession, uri: str) -> bool:
    if "://" not in uri or uri.startswith("file:"):
        return os.path.exists(uri.removeprefix("file:"))
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(uri)
    return p.getFileSystem(conf).exists(p)


# every mask token the reference's partition layer understands
# (partition.go): named {part_*} tokens plus bare time-format tokens.
# Order matters: longer alternatives first so {MMM} never half-matches
# as {MM}.
_MASK_TOKEN_RE = (
    r"\{(part_[^}]+|YYYY|YY|MMM|MM|DDD|DD|HH|hh|mm|ss)\}")


def has_mask_tokens(path: str) -> bool:
    """True when ``path`` carries any partition-mask token — the gate
    ``runner.build_read_plan`` uses to route reads through
    :func:`read_masked_source` (a '{part_'-only gate would leave pure
    time-token masks as literal braces that Hadoop globbing treats as
    alternation)."""
    return re.search(_MASK_TOKEN_RE, path or "") is not None


def read_masked_source(
    spark: SparkSession, source: Source, base_dir: str = "",
    time_range: tuple | None = None,
) -> DataFrame:
    """Read a ``{part_*}``-masked file source (reference:
    GeneratePartURIsFromRange consumers in task_run_read.go).

    With a ``time_range`` (backfill bounds, or watermark..now for
    incremental runs) the mask expands to the exact partition URI list
    and ONLY those directories are opened — at 100 TB the prefix
    listing alone is the bottleneck, so pruning happens before any
    filesystem walk; the row-level watermark/backfill filters applied
    downstream stay authoritative. Without a range the mask degrades
    to a glob over all partitions."""
    from sling_cli_spark.partitions import generate_part_uris_from_range

    stream = source.stream or ""
    if not os.path.isabs(stream) and "://" not in stream:
        stream = os.path.join(base_dir, stream)
    if time_range is None:
        # full-refresh over a masked source: rewrite EVERY mask token —
        # {part_*} AND bare time tokens ({YYYY}/{MM}/…) — to '*'. A
        # literal {...} left in the path would be parsed by Hadoop
        # globbing as alternation and match nothing.
        return read_files(
            spark, re.sub(_MASK_TOKEN_RE, "*", stream),
            source.options)
    uris = generate_part_uris_from_range(
        stream, source.update_key or "", *time_range)
    existing = [u for u in uris if _path_exists(spark, u)]
    if not existing:
        raise FileNotFoundError(
            f"no partition URIs exist for {stream} in "
            f"[{time_range[0]}, {time_range[1]}] "
            f"({len(uris)} candidates)")
    fmt = detect_format(existing[0], source.options)
    if fmt == "parquet":
        return spark.read.parquet(*existing)
    if fmt == "orc":
        return spark.read.orc(*existing)
    # option-bearing formats reuse the single-path reader per URI
    out = None
    for u in existing:
        part = read_files(spark, u, source.options)
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True)
    return out


def list_file_nodes(spark: SparkSession, path: str) -> DataFrame:
    """File-node metadata scan (reference: filesys/fs_file_node.go) —
    list files as a table (path, size, modified) for discovery/incremental."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    rows = []
    if fs.exists(p):
        it = fs.listFiles(p, True)
        while it.hasNext():
            s = it.next()
            rows.append((
                s.getPath().toString(), int(s.getLen()),
                int(s.getModificationTime()),
            ))
    return local_df(spark, rows, "path string, size bigint, modified_ms bigint")
