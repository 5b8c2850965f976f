"""Select / casing semantics (reference: core/dbio/iop select handling,
datatype_test.go ApplySelect coverage)."""

from pyspark.sql import Row

from sling_cli_spark.operators.select import (
    apply_casing, apply_select, parse_select_expr)


def test_parse_plain():
    assert parse_select_expr("col_a") == ("col_a", None, None, False)


def test_parse_exclude():
    assert parse_select_expr("-col_a") == ("col_a", None, None, True)


def test_parse_alias():
    name, alias, cast, neg = parse_select_expr("col_a as b")
    assert (name, alias, neg) == ("col_a", "b", False)


def test_parse_cast():
    name, alias, cast, neg = parse_select_expr("col_a::int")
    assert (name, cast, neg) == ("col_a", "int", False)


def _df(spark):
    return spark.createDataFrame(
        [Row(a=1, b="x", cc=2.0), Row(a=2, b="y", cc=3.0)])


def test_include_only(spark):
    assert apply_select(_df(spark), ["a", "b"]).columns == ["a", "b"]


def test_exclude(spark):
    assert apply_select(_df(spark), ["-b"]).columns == ["a", "cc"]


def test_rename_and_star(spark):
    out = apply_select(_df(spark), ["a as a2", "*"])
    assert out.columns[0] == "a2" and "b" in out.columns and "cc" in out.columns


def test_cast_select(spark):
    out = apply_select(_df(spark), ["a::string", "b"])
    assert dict(out.dtypes)["a"] == "string"


def test_glob_select(spark):
    df = spark.createDataFrame([Row(col_a=1, col_b=2, other=3)])
    assert apply_select(df, ["col_*"]).columns == ["col_a", "col_b"]


def test_casing_upper(spark):
    assert apply_casing(_df(spark), "upper").columns == ["A", "B", "CC"]


def test_casing_snake(spark):
    df = spark.createDataFrame([Row(MyCol=1, other_col=2)])
    assert apply_casing(df, "snake").columns == ["my_col", "other_col"]


def test_casing_none_is_identity(spark):
    df = _df(spark)
    assert apply_casing(df, None).columns == df.columns


def test_column_casing_dialect_aware_ported(spark):
    """config_test.go TestColumnCasing vectors (core/sling/:43-86)."""
    def one(name, casing, dialect):
        df = spark.createDataFrame([(1,)], f"`{name}` int")
        return apply_casing(df, casing, dialect).columns[0]

    assert one("myCol", "source", "snowflake") == "myCol"
    assert one("myCol", "snake", "snowflake") == "MY_COL"
    assert one("hey-hey", "snake", "snowflake") == "HEY_HEY"
    assert one("myCol", "normalize", "snowflake") == "myCol"
    assert one("hey-hey", "normalize", "snowflake") == "hey-hey"
    assert one("myCol", "target", "snowflake") == "MYCOL"
    assert one("DHL OriginalTracking-Number", "target", "duckdb") == \
        "dhl_originaltracking_number"
    assert one("DHL OriginalTracking-Number", "snake", "duckdb") == \
        "dhl_original_tracking_number"
    assert one("DHL OriginalTracking-Number", "normalize", "duckdb") == \
        "DHL OriginalTracking-Number"
    assert one("HAPPY", "normalize", "duckdb") == "happy"
    assert one("HAPPY", "normalize", "snowflake") == "HAPPY"
