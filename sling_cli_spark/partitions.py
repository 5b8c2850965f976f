"""Partition URI masks — levels, truncation, parsing, range generation.

Re-expresses the reference's partition machinery
(``core/dbio/iop/partition.go:13-648``): ``{part_year}``-style masks in
source/target URIs, ``{YYYY}/{MM}``-style ISO-8601 time tokens, and the
driver-side helpers that make partitioned FILE sources incrementally
readable — given a watermark range, :func:`generate_part_uris_from_range`
expands a mask into the exact list of partition URIs to scan, so a
backfill over ``s3://b/{part_year}/{part_month}`` reads only the matching
directories instead of listing the whole prefix (at 100 TB the listing
alone is the bottleneck; Spark's own hive-partition pruning then applies
within each URI).

Pure driver-side string/time logic — no Spark, no data reads.

Deliberate divergence from the reference: year-level URI ranges advance
by CALENDAR year (``partition.go:640`` adds a fixed 365-day duration,
which drifts across leap years and can emit a duplicate year URI);
month-level ranges use calendar months exactly like the reference.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re

# ordered ASCENDING by duration (partition.go PartitionLevelsAscending)
PART_LEVELS_ASC = (
    "second", "minute", "hour", "day", "week", "month", "year_month",
    "year",
)
PART_LEVELS_DESC = tuple(reversed(PART_LEVELS_ASC))

# ISO-8601 time tokens, ascending (partition.go TimeLevelAscending)
TIME_LEVELS_ASC = ("ss", "mm", "hh", "HH", "DDD", "DD", "MM", "MMM",
                   "YY", "YYYY")
TIME_LEVELS_DESC = tuple(reversed(TIME_LEVELS_ASC))

_SEC = dt.timedelta(seconds=1)
_MIN = dt.timedelta(minutes=1)
_HOUR = dt.timedelta(hours=1)
_DAY = dt.timedelta(days=1)

_PART_UNIT = {
    "second": _SEC, "minute": _MIN, "hour": _HOUR, "day": _DAY,
    "week": 7 * _DAY, "month": 31 * _DAY, "year_month": 31 * _DAY,
    "year": 365 * _DAY,
}
_TIME_UNIT = {
    "ss": _SEC, "mm": _MIN, "hh": _HOUR, "HH": _HOUR,
    "DDD": _DAY, "DD": _DAY, "MM": 31 * _DAY, "MMM": 31 * _DAY,
    "YY": 365 * _DAY, "YYYY": 365 * _DAY,
}
_TIME_AS_PART = {
    "YYYY": "year", "YY": "year", "MMM": "month", "MM": "month",
    "DD": "day", "DDD": "day", "HH": "hour", "hh": "hour",
    "mm": "minute", "ss": "second",
}

_TIME_TOKEN_RE = re.compile(r"\{(YYYY|YY|MMM|MM|DD|DDD|HH|hh|mm|ss)\}")
_PART_TOKEN_RE = re.compile(
    r"\{part_(second|minute|hour|day|week|year_month|month|year)\}")
_ANY_PART_RE = re.compile(r"\{(part_[^}]+)\}")

_STRFTIME = {
    "YYYY": "%Y", "YY": "%y", "MMM": "%b", "MM": "%m", "DD": "%d",
    "DDD": "%j", "HH": "%H", "hh": "%I", "mm": "%M", "ss": "%S",
}


def iso8601_to_spark_layout(date_format: str) -> str:
    """ISO-8601 layout tokens -> a Spark ``DateTimeFormatter`` pattern —
    the Spark twin of ``Iso8601ToGoLayout`` (partition.go:548-571), so
    config layouts like ``DD-MM-YYYY HH:mm:ss.s`` work verbatim. Same
    replacement order as the reference; offsets map to Spark's
    ``XX``/``xx`` (``Z``-or-``+hhmm`` / signed ``+hhmm``), a trailing
    bare ``Z`` parses-and-prints as ``XX``."""
    s = date_format.strip()
    s = s.replace("TZD", "XXX")
    s = s.replace("ISO8601", "yyyy-MM-dd'T'HH:mm:ssXX")
    s = s.replace("DDTHH", "DD'T'HH")  # quote the ISO 'T' separator
    s = s.replace("YYYY", "yyyy").replace("YY", "yy")
    s = s.replace("DD", "dd")
    s = s.replace(".ss", ".SSS").replace(".s", ".SSS")
    s = re.sub(r"Z\d\d:?\d\d$", "XX", s)
    s = re.sub(r"-\d\d:?\d\d$", "xx", s)
    s = re.sub(r"\+\d\d:?\d\d$", "xx", s)
    s = re.sub(r"Z$", "XX", s)
    return s


def is_valid_level(level: str) -> bool:
    return level in PART_LEVELS_ASC


def truncate_time(level: str, t: dt.datetime) -> dt.datetime:
    """Truncate ``t`` to the start of its partition (week -> Monday)."""
    if level == "year":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if level in ("month", "year_month"):
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if level == "week":
        monday = t - dt.timedelta(days=t.weekday())
        return monday.replace(hour=0, minute=0, second=0, microsecond=0)
    if level == "day":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if level == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if level == "minute":
        return t.replace(second=0, microsecond=0)
    if level == "second":
        return t.replace(microsecond=0)
    raise ValueError(f"invalid partition level: {level}")


def extract_partition_fields(path: str) -> list[str]:
    """Levels named by ``{part_*}`` tokens, in path order; unknown
    tokens are skipped (the reference warns and drops them)."""
    out = []
    for m in _ANY_PART_RE.finditer(path):
        level = m.group(1)[len("part_"):].strip()
        if is_valid_level(level):
            out.append(level)
    return out


def get_lowest_part_time_unit(mask: str) -> dt.timedelta:
    """Smallest time step named by any token in the mask."""
    t_unit = next((_TIME_UNIT[tl] for tl in TIME_LEVELS_ASC
                   if "{%s}" % tl in mask), None)
    p_unit = next((_PART_UNIT[pl] for pl in PART_LEVELS_ASC
                   if "{part_%s}" % pl in mask), None)
    unit = min((u for u in (t_unit, p_unit) if u is not None),
               default=None)
    if unit is None:
        raise ValueError(f"no valid time unit found in mask: {mask}")
    return unit


def get_lowest_part_time_level(mask: str) -> str:
    t_level = next((_TIME_AS_PART[tl] for tl in TIME_LEVELS_ASC
                    if "{%s}" % tl in mask), None)
    p_level = next((pl for pl in PART_LEVELS_ASC
                    if "{part_%s}" % pl in mask), None)
    for level in PART_LEVELS_ASC:
        if level in (t_level, p_level):
            return level
    raise ValueError(f"did not find a partition level in path: {mask}")


def _segment_pattern(mask_part: str):
    """Compile one mask segment into a regex + ordered token list."""
    tokens = []  # ("time"|"part", name) in capture-group order
    pattern = re.escape(mask_part)
    for m in _TIME_TOKEN_RE.finditer(mask_part):
        tokens.append(("time", m.group(1)))
    for m in _PART_TOKEN_RE.finditer(mask_part):
        tokens.append(("part", m.group(1)))
    for kind, name in tokens:
        tok = re.escape("{%s}" % name if kind == "time"
                        else "{part_%s}" % name)
        repl = r"(\d+|[A-Za-z]+)" if kind == "time" else r"([^/]+)"
        pattern = pattern.replace(tok, repl, 1)
    return re.compile("^" + pattern + "$"), tokens


def matched_partition_mask(mask: str, path: str) -> bool:
    """Do ``mask`` and ``path`` share the same partition STRUCTURE?
    (values are not validated — partition.go MatchedPartitionMask)"""
    mask_parts = mask.strip("/").split("/")
    path_parts = path.strip("/").split("/")
    if len(mask_parts) != len(path_parts):
        return False
    for mask_part, path_part in zip(mask_parts, path_parts):
        if "{" not in mask_part:
            if mask_part != path_part:
                return False
            continue
        rx, _ = _segment_pattern(mask_part)
        if not rx.match(path_part):
            return False
    return True


_MONTHS = ("jan", "feb", "mar", "apr", "may", "jun",
           "jul", "aug", "sep", "oct", "nov", "dec")


def extract_partition_time_value(mask: str, path: str) -> dt.datetime:
    """Parse a concrete partition path back into its timestamp
    (partition.go ExtractPartitionTimeValue): ``data/{YYYY}/{MM}/{DD}``
    + ``data/2024/12/21`` -> 2024-12-21. Hive-style ``key_level=value``
    segments are accepted for ``{part_*}`` tokens. Returns a naive UTC
    datetime."""
    mask_parts = mask.strip("/").split("/")
    path_parts = path.strip("/").split("/")
    if len(mask_parts) != len(path_parts):
        raise ValueError(
            "mask and path have different number of segments")

    comp = {"YYYY": 0, "YY": 0, "MM": 1, "MMM": 1, "DDD": 1, "DD": 1,
            "hh": 0, "HH": 0, "mm": 0}
    week_num = 0
    seconds = 0

    for mask_part, path_part in zip(mask_parts, path_parts):
        if "{" not in mask_part:
            if mask_part != path_part:
                raise ValueError(
                    f"static path segment mismatch: expected "
                    f"{mask_part}, got {path_part}")
            continue
        rx, tokens = _segment_pattern(mask_part)
        m = rx.match(path_part)
        if m is None:
            raise ValueError(
                f"failed to match path part pattern: {rx.pattern} "
                f"with {path_part}")
        values = list(m.groups())
        idx = 0
        for kind, name in tokens:
            if kind == "time":
                if name not in comp:
                    # mirror the reference: unknown time tokens ({ss})
                    # do not consume a captured value
                    continue
                value = values[idx]
                idx += 1
                if name == "MMM":
                    low = value.lower()
                    if low not in _MONTHS:
                        raise ValueError(f"invalid month name: {value}")
                    comp["MM"] = _MONTHS.index(low) + 1
                else:
                    comp[name] = int(value)
                continue
            # part token; clean hive-style "key_level=value" prefix
            value = values[idx]
            idx += 1
            if value.count("=") == 1:
                value = value.split("=")[1]
            if name == "second":
                seconds = int(value)
            elif name == "minute":
                comp["mm"] = int(value)
            elif name == "hour":
                comp["HH"] = int(value)
            elif name == "day":
                comp["DD"] = int(value)
            elif name == "week":
                try:
                    week_num = int(value)
                except ValueError:
                    raise ValueError(f"invalid week format: {value}")
            elif name == "year_month":
                bits = value.split("-")
                if len(bits) != 2:
                    raise ValueError(
                        f"invalid year_month format: {value}")
                comp["YYYY"], comp["MM"] = int(bits[0]), int(bits[1])
            elif name == "month":
                comp["MM"] = int(value)
            elif name == "year":
                comp["YYYY"] = int(value)

    if week_num > 0:
        if comp["YYYY"] == 0:
            raise ValueError(
                f"missing year to parse week number component {week_num}")
        first = dt.datetime(comp["YYYY"], 1, 1)
        while first.weekday() != 0:  # first Monday of the year
            first += _DAY
        monday = first + dt.timedelta(days=(week_num - 1) * 7)
        comp["MM"], comp["DD"] = monday.month, monday.day

    return dt.datetime(comp["YYYY"], comp["MM"], comp["DD"],
                       comp["HH"], comp["mm"], seconds)


def get_partition_date_map(part_key_prefix: str,
                           t: dt.datetime) -> dict[str, str]:
    """``{part_year} -> "<prefix>_year=2024"`` etc. — the hive-style
    directory names the reference writes (partition.go
    GetPartitionDateMap; week is ISO week, zero-padded)."""
    prefix = part_key_prefix.strip().strip("\"'`[] ").lower()
    vals = {
        "year": t.strftime("%Y"), "month": t.strftime("%m"),
        "year_month": t.strftime("%Y-%m"),
        "week": "%02d" % t.isocalendar()[1],
        "day": t.strftime("%d"), "hour": t.strftime("%H"),
        "minute": t.strftime("%M"), "second": t.strftime("%S"),
    }
    return {f"part_{lvl}": f"{prefix}_{lvl}={v}"
            for lvl, v in vals.items()}


def get_iso8601_date_map(t: dt.datetime) -> dict[str, str]:
    return {tl: t.strftime(_STRFTIME[tl]) for tl in TIME_LEVELS_DESC}


def _render(mask: str, mapping: dict[str, str]) -> str:
    for k, v in mapping.items():
        mask = mask.replace("{%s}" % k, v)
    return mask


def _add_months(t: dt.datetime, n: int) -> dt.datetime:
    m = t.month - 1 + n
    year, month = t.year + m // 12, m % 12 + 1
    day = min(t.day, calendar.monthrange(year, month)[1])
    return t.replace(year=year, month=month, day=day)


def generate_part_uris_from_range(
    mask: str, update_key: str, start: dt.datetime, end: dt.datetime,
) -> list[str]:
    """Expand a partition mask over [start, end] into concrete URIs —
    the incremental/backfill scan list for partitioned file sources
    (partition.go GeneratePartURIsFromRange). Month and year levels
    advance by calendar unit (see module docstring on the year-level
    divergence)."""
    if end < start:
        raise ValueError(f"range end ({end}) is before start ({start})")
    level = get_lowest_part_time_level(mask)
    unit = get_lowest_part_time_unit(mask)
    current = truncate_time(level, start)
    uris: list[str] = []
    while current <= end:
        uri = _render(mask, get_iso8601_date_map(current))
        uri = _render(uri, get_partition_date_map(update_key, current))
        uris.append(uri)
        if level in ("month", "year_month"):
            current = _add_months(current, 1)
        elif level == "year":
            current = current.replace(year=current.year + 1)
        else:
            current = current + unit
    return uris
