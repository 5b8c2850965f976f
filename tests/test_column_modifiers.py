"""Column modifier DSL (column_modifiers.go:44-151 ParseModifiers)."""

import pytest
from pyspark.sql import types as T

from sling_cli_spark.operators.column_modifiers import (
    apply_column_specs, parse_columns, parse_modifiers, specs_constraints,
    specs_primary_key,
)
from sling_cli_spark.types import ColumnType


def test_plain_type():
    s = parse_modifiers("a", "bigint")
    assert s.type == ColumnType.BIGINT and s.nullable is None
    assert not s.primary_key


def test_type_with_params():
    s = parse_modifiers("a", "string(100)")
    assert s.type == ColumnType.STRING and s.length == 100
    d = parse_modifiers("b", "decimal(18,4)")
    assert d.type == ColumnType.DECIMAL
    assert (d.precision, d.scale) == (18, 4)
    assert d.spark_type() == T.DecimalType(18, 4)


def test_modifier_combo():
    s = parse_modifiers(
        "name", "string(100) not_null unique description('customer name')")
    assert s.length == 100 and s.nullable is False and s.unique
    assert s.description == "customer name"


def test_primary_key_and_aliases():
    s = parse_modifiers("id", "int8 primary_key")
    assert s.type == ColumnType.BIGINT and s.primary_key
    assert parse_modifiers("v", "varchar(50)").type == ColumnType.STRING
    assert parse_modifiers("n", "numeric(10,2)").type == ColumnType.DECIMAL


def test_constraint_split():
    s = parse_modifiers("amt", "decimal(18,4) not_null | value >= 0")
    assert (s.precision, s.scale) == (18, 4)
    assert s.nullable is False
    assert s.constraint == "value >= 0"


def test_index_modifiers():
    s = parse_modifiers("ts", "timestamp index")
    assert len(s.indexes) == 1 and not s.indexes[0].unique
    s2 = parse_modifiers("code", "string unique_index(name=ix_code)")
    assert s2.indexes[0].unique and s2.indexes[0].name == "ix_code"


def test_reserved_modifiers_error():
    for bad in ("bigint auto_increment", "int identity",
                "string default('x')", "int check(value>0)"):
        with pytest.raises(ValueError, match="not yet supported"):
            parse_modifiers("c", bad)


def test_conflicting_nullability_errors():
    with pytest.raises(ValueError, match="conflicting"):
        parse_modifiers("c", "int not_null nullable")


def test_unknown_modifier_and_type_error():
    with pytest.raises(ValueError, match="unknown modifier"):
        parse_modifiers("c", "int sparkly")
    with pytest.raises(ValueError, match="unknown type"):
        parse_modifiers("c", "blorbo")


def test_payload_on_flag_modifier_errors():
    with pytest.raises(ValueError, match="does not take arguments"):
        parse_modifiers("c", "int not_null(1)")


def test_specs_helpers():
    specs = parse_columns({
        "id": "bigint primary_key",
        "amt": "decimal(10,2) | value > 0",
        "name": "string not_null",
    })
    assert specs_primary_key(specs) == ["id"]
    cons = specs_constraints(specs)
    assert cons["amt"] == "value > 0"
    assert cons["name"] == "value is not null"


def test_apply_column_specs_casts(spark):
    df = spark.createDataFrame([("1", "2.345")], "id string, amt string")
    specs = parse_columns({"id": "bigint", "amt": "decimal(10,2)"})
    out = apply_column_specs(df, specs)
    assert dict(out.dtypes) == {"id": "bigint", "amt": "decimal(10,2)"}
    r = out.collect()[0]
    assert r["id"] == 1 and str(r["amt"]) == "2.35"


# --- end-to-end through the runner --------------------------------------

def test_runner_dsl_pk_and_constraints(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = tmp_path / "s.csv"
    src.write_text("id,amt\n1,5.0\n2,-3.0\n3,9.5\n")
    out = str(tmp_path / "o.parquet")
    cfg = Config.from_dict({
        "source": {"stream": str(src),
                   "options": {
                       "columns": {"id": "bigint primary_key",
                                   "amt": "decimal(10,2) | value >= 0"},
                       "constraint_mode": "skip"}},
        "target": {"object": out},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert cfg.source.primary_key == ["id"]  # defaulted from the DSL
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["amt"] == "decimal(10,2)"
    assert r.rows == 2  # the amt<0 row was skipped
    assert sorted(x["id"] for x in back.collect()) == [1, 3]
