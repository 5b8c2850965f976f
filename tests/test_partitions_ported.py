"""partition_test.go vectors, ported 1:1 against sling_cli_spark.partitions.

Source tables (reference: ``core/dbio/iop/partition_test.go``):

- TestPartitionLevel_IsValid     (:10)
- TestPartitionLevel_TruncateTime (:35)  — week truncates to Monday
- TestPartitionExtractFields     (:109)
- TestExtractPartitionTimeValue  (:163)  — incl. hive-prefix and week paths
- TestGetLowestPartTimeUnit      (:282)
- TestMatchedPartitionMask       (:371)
- TestGeneratePartURIsFromRange  (:461)  — hive-style <key>_<level>=<v> URIs

Pure driver-side logic — no Spark session needed.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sling_cli_spark.partitions import (
    extract_partition_fields, extract_partition_time_value,
    generate_part_uris_from_range, get_lowest_part_time_unit,
    is_valid_level, matched_partition_mask, truncate_time,
)

D = dt.datetime


# ------------------------------------------------------------- IsValid

@pytest.mark.parametrize("level,want", [
    ("minute", True), ("hour", True), ("day", True), ("week", True),
    ("month", True), ("year_month", True), ("year", True),
    ("invalid", False), ("", False),
])
def test_partition_level_is_valid(level, want):
    assert is_valid_level(level) is want


# -------------------------------------------------------- TruncateTime

BASE = D(2024, 3, 15, 14, 30, 45, 123)

TRUNCATE_CASES = [
    ("minute truncation", "minute", D(2024, 3, 15, 14, 30)),
    ("hour truncation", "hour", D(2024, 3, 15, 14)),
    ("day truncation", "day", D(2024, 3, 15)),
    # March 15, 2024 is a Friday -> truncates to Monday the 11th
    ("week truncation", "week", D(2024, 3, 11)),
    ("month truncation", "month", D(2024, 3, 1)),
    ("year_month truncation", "year_month", D(2024, 3, 1)),
    ("year truncation", "year", D(2024, 1, 1)),
]


@pytest.mark.parametrize("name,level,want", TRUNCATE_CASES,
                         ids=[c[0] for c in TRUNCATE_CASES])
def test_truncate_time(name, level, want):
    assert truncate_time(level, BASE) == want


def test_truncate_time_invalid_level():
    with pytest.raises(ValueError):
        truncate_time("invalid", BASE)


def test_truncate_week_sunday_goes_back_to_monday():
    # Go's Weekday math: Sunday belongs to the week starting the PRIOR
    # Monday (daysToMonday += 7 adjustment)
    assert truncate_time("week", D(2024, 3, 17, 5)) == D(2024, 3, 11)


# ------------------------------------------------------- ExtractFields

EXTRACT_FIELD_CASES = [
    ("single partition", "/data/{part_year}/file.csv", ["year"]),
    ("multiple partitions", "/data/{part_year}/{part_month}/{part_day}/file.csv",
     ["year", "month", "day"]),
    ("mixed content", "/data/{part_year}/static/{part_month}/file.csv",
     ["year", "month"]),
    ("invalid partition", "/data/{part_invalid}/file.csv", []),
    ("no partitions", "/data/static/file.csv", []),
    ("all partition levels",
     "/data/{part_year}/{part_year_month}/{part_month}/{part_week}/"
     "{part_day}/{part_hour}/{part_minute}/file.csv",
     ["year", "year_month", "month", "week", "day", "hour", "minute"]),
]


@pytest.mark.parametrize("name,path,want", EXTRACT_FIELD_CASES,
                         ids=[c[0] for c in EXTRACT_FIELD_CASES])
def test_extract_partition_fields(name, path, want):
    assert extract_partition_fields(path) == want


# ---------------------------------------------- ExtractPartitionTimeValue

EXTRACT_TIME_CASES = [
    ("basic date format", "data/{YYYY}/{MM}/{DD}", "data/2024/03/21",
     D(2024, 3, 21), None),
    ("partition format year_month", "data/{part_year_month}/files",
     "data/2024-03/files", D(2024, 3, 1), None),
    ("partition format with prefix", "data/{part_year}/files",
     "data/created_dt_year=2024/files", D(2024, 1, 1), None),
    ("mixed format", "data/{YYYY}/{part_month}/{DD}", "data/2024/03/21",
     D(2024, 3, 21), None),
    ("with time components", "data/{YYYY}/{MM}/{DD}/{HH}/{mm}",
     "data/2024/03/21/15/30", D(2024, 3, 21, 15, 30), None),
    ("with time components 2", "data/y{YYYY}-m{MM}/{DD}/{HH}/{mm}",
     "data/y2024-m03/21/15/30", D(2024, 3, 21, 15, 30), None),
    ("week partition", "data/{YYYY}/{part_week}", "data/2024/12",
     D(2024, 3, 18), None),  # week 12 of 2024
    ("week partition 2", "data/y{YYYY}/{part_week}", "data/y2024/12",
     D(2024, 3, 18), None),
    ("mismatched segments", "data/{YYYY}/{MM}", "data/2024", None,
     "different number of segments"),
    ("invalid year_month format", "data/{part_year_month}", "data/2024",
     None, "invalid year_month format"),
    ("invalid week without year", "data/{part_week}", "data/12", None,
     "missing year to parse week"),
    ("static path mismatch", "data/static/{YYYY}", "data/wrong/2024",
     None, "static path segment mismatch"),
    ("with month name format", "data/{YYYY}/{MMM}/{DD}",
     "data/2024/Mar/21", D(2024, 3, 21), None),
    ("with lowercase month name", "data/{YYYY}/{MMM}/{DD}",
     "data/2024/mar/21", D(2024, 3, 21), None),
    ("with invalid month name", "data/{YYYY}/{MMM}/{DD}",
     "data/2024/Invalid/21", None, "invalid month name"),
]


@pytest.mark.parametrize("name,mask,path,want,err", EXTRACT_TIME_CASES,
                         ids=[c[0] for c in EXTRACT_TIME_CASES])
def test_extract_partition_time_value(name, mask, path, want, err):
    if err:
        with pytest.raises(ValueError) as exc:
            extract_partition_time_value(mask, path)
        assert err in str(exc.value)
    else:
        assert extract_partition_time_value(mask, path) == want


# ------------------------------------------------ GetLowestPartTimeUnit

LOWEST_UNIT_CASES = [
    ("minute partition", "data/{part_minute}/file.csv",
     dt.timedelta(minutes=1)),
    ("hour partition", "data/{part_hour}/file.csv",
     dt.timedelta(hours=1)),
    ("day partition", "data/{part_day}/file.csv", dt.timedelta(days=1)),
    ("week partition", "data/{part_week}/file.csv", dt.timedelta(days=7)),
    ("month partition", "data/{part_month}/file.csv",
     dt.timedelta(days=31)),
    ("year_month partition", "data/{part_year_month}/file.csv",
     dt.timedelta(days=31)),
    ("year partition", "data/{part_year}/file.csv",
     dt.timedelta(days=365)),
    ("multiple partitions - lowest wins",
     "data/{part_year}/{part_month}/{part_day}/file.csv",
     dt.timedelta(days=1)),
    ("time format second", "data/{YYYY}/{MM}/{DD}/{ss}",
     dt.timedelta(seconds=1)),
    ("time format minute", "data/{YYYY}/{MM}/{DD}/{mm}",
     dt.timedelta(minutes=1)),
    ("time format hour", "data/{YYYY}/{MM}/{DD}/{HH}",
     dt.timedelta(hours=1)),
    ("mixed formats - lowest wins", "data/{part_year}/{MM}/{part_minute}",
     dt.timedelta(minutes=1)),
]


@pytest.mark.parametrize("name,mask,want", LOWEST_UNIT_CASES,
                         ids=[c[0] for c in LOWEST_UNIT_CASES])
def test_get_lowest_part_time_unit(name, mask, want):
    assert get_lowest_part_time_unit(mask) == want


def test_get_lowest_part_time_unit_no_units():
    with pytest.raises(ValueError, match="no valid time unit"):
        get_lowest_part_time_unit("data/static/file.csv")


# ----------------------------------------------- MatchedPartitionMask

MATCH_CASES = [
    ("basic date format match", "data/{YYYY}/{MM}/{DD}",
     "data/2024/03/21", True),
    ("partition format match", "data/{part_year}/{part_month}",
     "data/2024/03", True),
    ("partition format with prefix match", "data/{part_year}/files",
     "data/created_dt_year=2024/files", True),
    ("mixed format match", "data/{YYYY}/{part_month}/{DD}",
     "data/2024/03/21", True),
    ("with time components match", "data/{YYYY}/{MM}/{DD}/{HH}/{mm}",
     "data/2024/03/21/15/30", True),
    ("with static segments match", "data/static/{YYYY}/{MM}",
     "data/static/2024/03", True),
    ("mismatched segments", "data/{YYYY}/{MM}", "data/2024", False),
    ("static path mismatch", "data/static/{YYYY}", "data/wrong/2024",
     False),
    ("complex pattern match",
     "data/{part_year}/{part_month}/logs_{YYYY}-{MM}-{DD}_{HH}",
     "data/2024/03/logs_2024-03-21_15", True),
    ("all partition levels match",
     "data/{part_year}/{part_month}/{part_day}/{part_hour}/{part_minute}",
     "data/2024/03/21/15/30", True),
    # structure only, not value validity (the reference notes this)
    ("invalid format in path", "data/{YYYY}/{MM}", "data/invalid/13",
     True),
    ("empty segments", "data///{YYYY}", "data///2024", True),
]


@pytest.mark.parametrize("name,mask,path,want", MATCH_CASES,
                         ids=[c[0] for c in MATCH_CASES])
def test_matched_partition_mask(name, mask, path, want):
    assert matched_partition_mask(mask, path) is want


# ------------------------------------------ GeneratePartURIsFromRange

GEN_CASES = [
    ("year partitions", "data/{part_year}/files", "created_dt",
     D(2022, 1, 1), D(2024, 1, 1),
     ["data/created_dt_year=2022/files",
      "data/created_dt_year=2023/files",
      "data/created_dt_year=2024/files"]),
    ("month partitions", "data/{part_month}/files", "created_dt",
     D(2024, 1, 1), D(2024, 3, 1),
     ["data/created_dt_month=01/files",
      "data/created_dt_month=02/files",
      "data/created_dt_month=03/files"]),
    ("day partitions", "data/{part_day}/files", "created_dt",
     D(2024, 3, 1), D(2024, 3, 3),
     ["data/created_dt_day=01/files",
      "data/created_dt_day=02/files",
      "data/created_dt_day=03/files"]),
    ("hour partitions", "data/{part_hour}/files", "created_dt",
     D(2024, 3, 1, 22), D(2024, 3, 2),
     ["data/created_dt_hour=22/files",
      "data/created_dt_hour=23/files",
      "data/created_dt_hour=00/files"]),
    ("minute partitions", "data/{part_minute}/files", "created_dt",
     D(2024, 3, 1, 0, 58), D(2024, 3, 1, 1, 0),
     ["data/created_dt_minute=58/files",
      "data/created_dt_minute=59/files",
      "data/created_dt_minute=00/files"]),
    ("complex nested partitions",
     "data/{part_year}/{part_month}/{part_day}/files", "created_dt",
     D(2024, 3, 31), D(2024, 4, 2),
     ["data/created_dt_year=2024/created_dt_month=03/created_dt_day=31/files",
      "data/created_dt_year=2024/created_dt_month=04/created_dt_day=01/files",
      "data/created_dt_year=2024/created_dt_month=04/created_dt_day=02/files"]),
    ("year_month partitions", "data/{part_year_month}/files",
     "created_dt", D(2023, 11, 1), D(2024, 1, 1),
     ["data/created_dt_year_month=2023-11/files",
      "data/created_dt_year_month=2023-12/files",
      "data/created_dt_year_month=2024-01/files"]),
    ("mixed ISO8601 and partition format",
     "data/{YYYY}/{part_month}/dt={DD}/files", "created_dt",
     D(2024, 3, 1), D(2024, 3, 3),
     ["data/2024/created_dt_month=03/dt=01/files",
      "data/2024/created_dt_month=03/dt=02/files",
      "data/2024/created_dt_month=03/dt=03/files"]),
]


@pytest.mark.parametrize("name,mask,key,start,end,want", GEN_CASES,
                         ids=[c[0] for c in GEN_CASES])
def test_generate_part_uris_from_range(name, mask, key, start, end, want):
    assert generate_part_uris_from_range(mask, key, start, end) == want


def test_generate_part_uris_invalid_level_errors():
    with pytest.raises(ValueError):
        generate_part_uris_from_range(
            "data/{part_invalid}/files", "created_dt",
            D(2024, 1, 1), D(2024, 1, 2))


def test_generate_part_uris_end_before_start_errors():
    with pytest.raises(ValueError, match="before start"):
        generate_part_uris_from_range(
            "data/{part_day}/files", "created_dt",
            D(2024, 1, 2), D(2024, 1, 1))


def test_generate_part_uris_year_is_calendar_correct_across_leap():
    # deliberate divergence from partition.go:640 (fixed 365-day step
    # drifts across leap years); documented in the module docstring
    uris = generate_part_uris_from_range(
        "d/{part_year}", "k", D(2024, 2, 1), D(2026, 1, 1))
    assert uris == ["d/k_year=2024", "d/k_year=2025", "d/k_year=2026"]
