"""ApplySelect vectors PORTED from the reference's
core/dbio/iop/datatype_test.go TestApplySelect (:853-1046) — r11,
continuing VERDICT r10 ask #5's test-corpus porting. Run over the
DataFrame implementation (operators/select.py apply_select), asserting
the RESULT COLUMN NAMES against the Go table verbatim.

Key semantics the vectors pin: renames don't pin position (``[*, a as
b]`` renames in place) while bare names do (``[id, *, email]`` pins
email to the back); missing bare names error only without ``*``;
missing renames error even with ``*``; exclusions are silent when
missing; duplicates dedupe; matching is case-insensitive with source
casing preserved.
"""

import pytest

from sling_cli_spark.operators.select import apply_select

FIELDS = ["id", "firstName", "lastName", "email", "password",
          "user_internal", "temp_data", "created_at"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [tuple(str(i) for i in range(len(FIELDS)))],
        " string, ".join(FIELDS) + " string")


@pytest.mark.parametrize("name,select,expected", [
    ("EmptySelect", [], FIELDS),
    ("ExcludeSingleField", ["*", "-password"],
     ["id", "firstName", "lastName", "email", "user_internal",
      "temp_data", "created_at"]),
    ("IncludeByPrefix", ["user_*"], ["user_internal"]),
    ("ExcludeBySuffix", ["*", "-*_internal"],
     ["id", "firstName", "lastName", "email", "password", "temp_data",
      "created_at"]),
    ("RenameOnly", ["firstName as first_name"], ["first_name"]),
    ("SelectAllWithRename", ["*", "firstName as first_name"],
     ["id", "first_name", "lastName", "email", "password",
      "user_internal", "temp_data", "created_at"]),
    ("SelectAllRenameExclude",
     ["*", "firstName as first_name", "-password"],
     ["id", "first_name", "lastName", "email", "user_internal",
      "temp_data", "created_at"]),
    ("MultipleIncludes", ["id", "email"], ["id", "email"]),
    ("MultipleExcludes", ["*", "-password", "-email"],
     ["id", "firstName", "lastName", "user_internal", "temp_data",
      "created_at"]),
    ("GlobIncludePrefix", ["temp_*"], ["temp_data"]),
    ("GlobExcludePrefix", ["*", "-temp_*"],
     ["id", "firstName", "lastName", "email", "password",
      "user_internal", "created_at"]),
    ("CaseInsensitivity",
     ["FIRSTNAME as first_name", "LASTNAME as last_name"],
     ["first_name", "last_name"]),
    ("OrderPreservation", ["email", "id", "lastName"],
     ["email", "id", "lastName"]),
    ("ComplexSelect",
     ["*", "firstName as first_name", "lastName as last_name",
      "-password", "-*_internal"],
     ["id", "first_name", "last_name", "email", "temp_data",
      "created_at"]),
    ("IncludeBySuffix", ["*_at"], ["created_at"]),
    ("ExcludeNonexistentSilent", ["*", "-nonexistent"], FIELDS),
    ("DuplicateSelection", ["id", "email", "id"], ["id", "email"]),
    ("ContainsGlob", ["*Name*"], ["firstName", "lastName"]),
    # Reordering: explicit names pin position; `*` and globs expand in
    # place, in source order, skipping pins.
    ("ReorderFrontWithStar", ["id", "email", "*"],
     ["id", "email", "firstName", "lastName", "password",
      "user_internal", "temp_data", "created_at"]),
    ("ReorderFrontAndBackWithStar",
     ["id", "firstName", "*", "created_at", "user_internal"],
     ["id", "firstName", "lastName", "email", "password", "temp_data",
      "created_at", "user_internal"]),
    ("ReorderWithGlobsAndStar", ["id", "user_*", "*", "*_at"],
     ["id", "user_internal", "firstName", "lastName", "email",
      "password", "temp_data", "created_at"]),
    ("ReorderExactAfterStarPinsToBack", ["id", "*", "email"],
     ["id", "firstName", "lastName", "password", "user_internal",
      "temp_data", "created_at", "email"]),
    ("ReorderGlobsExplicitMode", ["id", "user_*", "*_at"],
     ["id", "user_internal", "created_at"]),
    ("ReorderFrontRenameWithStar",
     ["firstName as first_name", "id", "*"],
     ["first_name", "id", "lastName", "email", "password",
      "user_internal", "temp_data", "created_at"]),
    ("ReorderExplicitNoStar", ["id", "email", "created_at"],
     ["id", "email", "created_at"]),
])
def test_apply_select_vectors(df, name, select, expected):
    assert apply_select(df, select).columns == expected


def test_error_field_not_found(df):
    with pytest.raises(ValueError, match="nonexistent"):
        apply_select(df, ["nonexistent"])


def test_error_rename_with_exclusion(df):
    with pytest.raises(ValueError, match="cannot combine"):
        apply_select(df, ["-firstName as first_name"])


def test_error_rename_not_found_all_mode(df):
    with pytest.raises(ValueError):
        apply_select(df, ["*", "nonexistent as new_name"])


def test_values_follow_renames(df):
    """Positions must carry VALUES, not just names — the in-place
    rename keeps firstName's data under the new name."""
    row = apply_select(
        df, ["*", "firstName as first_name", "-password"]).collect()[0]
    assert row["first_name"] == "1"   # firstName's value
    assert row["id"] == "0" and row["created_at"] == "7"
