"""Sample-based schema inference for dirty text sources (CSV/JSON-strings).

The reference buffers 900 rows (``SampleSize``, datatype.go:22) and decides
each column's general type from per-column value-class counts
(``dataset.go:422-610`` classification, ``datatype.go:922-1010``
InferFromStats decision rules). On Spark the schema must be fixed before the
full scan, so we do exactly the same thing pre-flight:

1. read the source with all-string schema (files.py does this for CSV),
2. pull a ≤900-row sample to the driver (tiny, matches the reference),
3. classify every value: null/int/decimal/bool/date/datetime/json/string,
4. apply the reference's decision rules -> a general type per column,
5. emit cast expressions (one ``select`` projection, codegen'd JVM-side).

The full 100 TB scan then runs once with the final schema — the reference's
mid-stream widening (pause, rewrite schema, new batch) is unnecessary
because the sample decided types before the scan, and any stray unparsable
value degrades to NULL under the same cast the database load would apply.

Decision rules mirrored from InferFromStats (datatype.go:934-1000):
- any string-classified value -> string (text if maxlen > 255)
- all json (+nulls)          -> json (kept as string column in Spark)
- all bool (+nulls)          -> bool
- all int (+nulls)           -> integer, bigint if out of int32 range
- dec+int (+nulls)           -> decimal(maxlen, maxdeclen)
- all date (+nulls)          -> date
- datetime/tz (+date,nulls)  -> timestamp (tz variant if any zone seen)
- mixed/unknown              -> string
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sling_cli_spark.types import ColumnType, to_spark_type

SAMPLE_SIZE = 900  # reference: datatype.go:22

# integer: optional sign, digits, no leading zero (except "0") — the
# reference's ParseString keeps zero-padded digits as string
_INT_RE = re.compile(r"^[-+]?(0|[1-9]\d*)$")
_DEC_RE = re.compile(r"^[-+]?(\d+)\.(\d+)$")
_BOOL = {"true", "false"}

# (regex, spark datetime pattern, kind) — kinds: date | datetime | datetimez
_DT_LAYOUTS: list[tuple[re.Pattern, str, str]] = [
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), "yyyy-MM-dd", "date"),
    (re.compile(r"^\d{4}/\d{2}/\d{2}$"), "yyyy/MM/dd", "date"),
    (re.compile(r"^\d{2}-\d{2}-\d{4}$"), "dd-MM-yyyy", "date"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"),
     "yyyy-MM-dd HH:mm:ss", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"),
     "yyyy-MM-dd'T'HH:mm:ss", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{1,6}$"),
     "yyyy-MM-dd HH:mm:ss.SSSSSS", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{1,6}$"),
     "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "datetime"),
    # zulu / zero-offset suffix is plain DATETIME (dataset_test.go: an
    # offset of 0 carries no zone information — only a NONZERO offset
    # types as timestampz)
    (re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d{1,6})?"
                r"(Z|[+-]00:?00)$"), "", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d{1,6})?"
                r"(Z|[+-]\d{2}:?\d{2})$"), "", "datetimez"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4} \d{2}:\d{2}:\d{2}$"),
     "M/d/yyyy HH:mm:ss", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}$"),
     "yyyy-MM-dd HH:mm", "datetime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}$"),
     "yyyy-MM-dd'T'HH:mm", "datetime"),
    # r11, ported from the reference's dateLayouts
    # (stream_processor.go:216-276) after its datatype_test.go vectors:
    # Oracle exports (dd-MON-yy, with and without the 07.01.59.000000 PM
    # time), US slash dates, and DuckDB's hour-only-offset zone form
    (re.compile(r"^\d{2}-[A-Za-z]{3}-\d{2}$"), "dd-MMM-yy", "date"),
    (re.compile(r"^\d{2}-[A-Za-z]{3}-\d{2} \d{2}\.\d{2}\.\d{2}\.\d{6}"
                r" [AP]M$"), "dd-MMM-yy hh.mm.ss.SSSSSS a", "datetime"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{2}$"), "M/d/yy", "date"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$"), "M/d/yyyy", "date"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6} [+-]\d{2}$"),
     "yyyy-MM-dd HH:mm:ss.SSSSSS X", "datetimez"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} [+-]\d{2}$"),
     "yyyy-MM-dd HH:mm:ss X", "datetimez"),
]

# Spark's datetime parser is case-sensitive for month names ("OCT"
# fails where "Oct" parses); Oracle exports scream. One chained
# replace per month keeps the fix inside codegen.
_MONTHS_UC = ("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
              "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")


def _titlecase_months(col: Column) -> Column:
    for mo in _MONTHS_UC:
        col = F.replace(col, F.lit(mo), F.lit(mo.title()))
    return col


def count_digits(number: str) -> tuple[int, int]:
    """StreamProcessor.CountDigits port (stream_processor.go:1069-1081):
    precision = characters excluding the dots, scale = characters after
    the FIRST dot — intentionally naive (non-digits count; the caller
    classified the value as numeric first)."""
    precision = scale = 0
    in_dec = False
    for c in number:
        if c == ".":
            in_dec = True
            continue
        if in_dec:
            scale += 1
        precision += 1
    return precision, scale


def truncate_decimal_string(number: str, dec_count: int) -> str:
    """StreamProcessor.TruncateDecimalString port
    (stream_processor.go:1084-1117): cut the decimal part to
    ``dec_count`` digits WITHOUT numeric conversion (no rounding —
    value-preserving prefix). A second decimal point ends the value; a
    non-digit (other than sign) returns the input verbatim."""
    in_dec = False
    scale = 0
    for i, c in enumerate(number):
        if c in "0123456789":
            if in_dec:
                scale += 1
                if scale > dec_count:
                    return number[:i]
        elif c == "-":
            pass
        elif c == ".":
            if in_dec:
                return number[:i]
            in_dec = True
            if dec_count <= 0:
                return number[:i]
        else:
            return number
    return number


def _looks_like_json(s: str) -> bool:
    # reference: dataset.go:611 looksLikeJson
    s = s.strip()
    return (s.startswith("{") and s.endswith("}")) or (
        s.startswith("[") and s.endswith("]"))


@dataclass
class ColStats:
    """Per-column value-class tallies (reference: ColumnStats,
    datatype.go:222-260 subset needed for inference)."""

    total: int = 0
    nulls: int = 0
    ints: int = 0
    decs: int = 0
    bools: int = 0
    dates: int = 0
    datetimes: int = 0
    datetimezs: int = 0
    jsons: int = 0
    strings: int = 0
    max_len: int = 0
    max_dec_len: int = 0
    min_val: int = 0
    max_val: int = 0
    dt_formats: dict = field(default_factory=dict)  # spark pattern -> count


_ISO_TOKEN_RX = {
    "YYYY": r"\d{4}", "YY": r"\d{2}", "MMM": "[A-Za-z]{3}",
    "MM": r"\d{2}", "DD": r"\d{2}", "DDD": r"\d{3}",
    "HH": r"\d{2}", "hh": r"\d{2}", "mm": r"\d{2}",
    ".ss": r"\.\d+", "ss": r"\d{2}", ".s": r"\.\d+",
}


def custom_layout(datetime_format: str):
    """Build a (regex, spark-pattern, kind) classification layout from a
    config ``datetime_format`` in ISO-8601 tokens (the reference feeds
    the configured layout into its date parser ahead of the built-in
    table — stream_processor.go SetConfig 'datetime_format')."""
    from sling_cli_spark.partitions import iso8601_to_spark_layout

    fmt = datetime_format.strip()
    rx, i = "", 0
    while i < len(fmt):
        for tok in (".ss", ".s", "YYYY", "YY", "MMM", "MM", "DDD", "DD",
                    "HH", "hh", "mm", "ss"):
            if fmt.startswith(tok, i):
                rx += _ISO_TOKEN_RX[tok]
                i += len(tok)
                break
        else:
            if fmt[i] == "Z":  # zulu or offset suffix
                rx += r"(Z|[+-]\d{2}:?\d{2})"
                m = re.match(r"Z\d\d:?\d\d", fmt[i:])
                i += len(m.group(0)) if m else 1
            else:
                rx += re.escape(fmt[i])
                i += 1
    has_time = "HH" in fmt or "hh" in fmt
    has_tz = "Z" in fmt or "TZD" in fmt
    kind = "datetimez" if has_tz else ("datetime" if has_time else "date")
    return (re.compile("^" + rx + "$"),
            iso8601_to_spark_layout(datetime_format), kind)


def classify_value(v: str | None, st: ColStats, null_if: str | None = None,
                   layouts=None) -> None:
    st.total += 1
    if v is None or v == "" or (null_if is not None and v == null_if):
        st.nulls += 1
        return
    s = v.strip()
    st.max_len = max(st.max_len, len(v))
    if _INT_RE.match(s):
        st.ints += 1
        iv = int(s)
        st.min_val = min(st.min_val, iv)
        st.max_val = max(st.max_val, iv)
        return
    m = _DEC_RE.match(s)
    if m:
        st.decs += 1
        st.max_dec_len = max(st.max_dec_len, len(m.group(2)))
        iv = int(m.group(1).lstrip("+-") or 0)
        st.min_val = min(st.min_val, -iv if s.lstrip().startswith("-") else iv)
        st.max_val = max(st.max_val, iv)
        return
    if s.lower() in _BOOL:
        st.bools += 1
        return
    for rx, pattern, kind in (layouts if layouts is not None
                              else _DT_LAYOUTS):
        if rx.match(s):
            if kind == "date":
                st.dates += 1
            elif kind == "datetime":
                st.datetimes += 1
            else:
                st.datetimezs += 1
            if pattern:
                st.dt_formats[pattern] = st.dt_formats.get(pattern, 0) + 1
            return
    if _looks_like_json(s):
        try:
            json.loads(s)
            st.jsons += 1
            return
        except (ValueError, TypeError):
            pass
    st.strings += 1


def decide_type(st: ColStats) -> ColumnType:
    """The InferFromStats decision ladder (datatype.go:934-1000)."""
    if st.total == 0 or st.nulls == st.total:
        return ColumnType.STRING
    nn = st.total - st.nulls  # non-null
    if st.strings > 0 and (st.bools + st.ints + st.decs + st.dates
                           + st.datetimes + st.datetimezs + st.jsons) == 0:
        return ColumnType.TEXT if st.max_len > 255 else ColumnType.STRING
    if st.jsons > 0 and st.jsons == nn:
        return ColumnType.JSON
    if st.bools > 0 and st.bools == nn:
        return ColumnType.BOOL
    if st.ints > 0 and st.ints == nn:
        if st.min_val < -2147483648 or st.max_val > 2147483647:
            return ColumnType.BIGINT
        return ColumnType.INTEGER
    if st.decs > 0 and st.decs + st.ints == nn:
        return ColumnType.DECIMAL
    if st.dates > 0 and st.dates == nn:
        return ColumnType.DATE
    if (st.datetimes + st.datetimezs) > 0 and (
        st.datetimes + st.datetimezs + st.dates == nn
    ):
        return (ColumnType.TIMESTAMPZ if st.datetimezs > 0
                else ColumnType.DATETIME)
    return ColumnType.TEXT if st.max_len >= 4000 else ColumnType.STRING


def infer_schema(
    df: DataFrame, sample_size: int = SAMPLE_SIZE, null_if: str | None = None,
    datetime_format: str | None = None,
) -> dict[str, tuple[ColumnType, ColStats]]:
    """Classify a driver-side sample; returns per-column (type, stats).
    A configured ``datetime_format`` (ISO-8601 tokens) classifies ahead
    of the built-in layout table."""
    layouts = ([custom_layout(datetime_format)] + _DT_LAYOUTS
               if datetime_format else None)
    sample = df.limit(sample_size).collect()
    stats = {c: ColStats() for c in df.columns}
    for row in sample:
        for c in df.columns:
            v = row[c]
            classify_value(None if v is None else str(v), stats[c],
                           null_if, layouts)
    return {c: (decide_type(st), st) for c, st in stats.items()}


def cast_expr(name: str, ctype: ColumnType, st: ColStats) -> Column:
    """Build the cast for one inferred column.

    Every cast is a try_cast: the type decision comes from a SAMPLE
    (900 rows, like the reference), so a malformed value past the sample
    must degrade to NULL — under Spark's ANSI default a plain cast would
    fail the whole job (reference behavior: failed parse -> null warn,
    stream_processor.go CastVal error accounting).
    """
    c = F.col(f"`{name}`")
    if ctype == ColumnType.DECIMAL:
        # precision from observed digits (datatype.go:973-975): maxlen covers
        # sign+dot+digits, so it's a safe upper bound; scale = max observed
        prec = min(max(st.max_len, st.max_dec_len + 1), 38)
        scale = min(st.max_dec_len, prec - 1) if prec > 1 else 0
        return c.try_cast(
            to_spark_type(ColumnType.DECIMAL, prec, scale)).alias(name)
    def _src(fmt: str) -> Column:
        # month-name formats get the SCREAMING-month normalization
        return _titlecase_months(c) if "MMM" in fmt else c

    def _parse(fmt: str) -> Column:
        ts = F.try_to_timestamp(_src(fmt), F.lit(fmt))
        if "yy" in fmt and "yyyy" not in fmt:
            # two-digit years: Java's 'yy' resolves into 2000-2099;
            # the reference (Go '06', POSIX) maps 69-99 to 19xx —
            # '31-DEC-99' is 1999, not 2099
            ts = F.when(F.year(ts) >= 2069,
                        ts - F.make_interval(F.lit(100))).otherwise(ts)
        return ts

    if ctype in (ColumnType.DATETIME, ColumnType.TIMESTAMP):
        fmts = sorted(st.dt_formats, key=st.dt_formats.get, reverse=True)
        # try the sampled formats first; final try_cast fallback handles
        # variant fraction lengths (e.g. '.000' vs '.000000')
        attempts = [_parse(f).cast("timestamp_ntz") for f in fmts]
        attempts.append(c.try_cast("timestamp_ntz"))
        return F.coalesce(*attempts).alias(name)
    if ctype == ColumnType.TIMESTAMPZ:
        fmts = sorted(st.dt_formats, key=st.dt_formats.get, reverse=True)
        attempts = [_parse(f) for f in fmts]
        attempts.append(c.try_cast("timestamp"))
        return F.coalesce(*attempts).alias(name)
    if ctype == ColumnType.DATE:
        fmts = sorted(st.dt_formats, key=st.dt_formats.get, reverse=True)
        attempts = [_parse(f).cast("date") for f in fmts]
        attempts.append(c.try_cast("date"))
        return F.coalesce(*attempts).alias(name)
    if ctype in (ColumnType.STRING, ColumnType.TEXT, ColumnType.JSON,
                 ColumnType.UUID):
        return c.alias(name)
    return c.try_cast(to_spark_type(ctype)).alias(name)


def infer_and_cast(
    df: DataFrame, sample_size: int = SAMPLE_SIZE, null_if: str | None = None,
    overrides: dict[str, str] | None = None,
    datetime_format: str | None = None,
) -> DataFrame:
    """Full pipeline: sample -> classify -> one cast projection.

    ``overrides`` is the config ``columns: {name: type}`` coercion surface
    (reference: Columns.Coerce, applied after inference).
    """
    inferred = infer_schema(df, sample_size, null_if, datetime_format)
    overrides = {k.lower(): v for k, v in (overrides or {}).items()}
    exprs = []
    for name in df.columns:
        ctype, st = inferred[name]
        if name.lower() in overrides:
            ctype = ColumnType(overrides[name.lower()])
        exprs.append(cast_expr(name, ctype, st))
    return df.select(*exprs)
