"""schemata_test.go vectors, ported (reference: core/dbio/database/).

- TestParseTableName          (:15)  -> dialects.parse_table_name
- TestParseSQLMultiStatements (:206) -> dialects.parse_sql_multi_statements
- TestTrimSQLComments         (:430) -> dialects.trim_sql_comments

Pure driver-side logic — no Spark needed.
"""

from __future__ import annotations

import pytest

from sling_cli_spark.dialects import (
    parse_sql_multi_statements, parse_table_name, trim_sql_comments)

PTN_CASES = [
    ("schema.table", "snowflake",
     {"schema": "SCHEMA", "name": "TABLE"}),
    ("schema.*", "snowflake", {"schema": "SCHEMA", "name": "*"}),
    ("*", "snowflake", {"name": "*"}),
    ('"ScheMa".table', "snowflake", {"schema": "ScheMa", "name": "TABLE"}),
    ('"ScheMa Name".table', "snowflake",
     {"schema": "ScheMa Name", "name": "TABLE"}),
    ("`db-4`.table", "mysql", {"schema": "db-4", "name": "table"}),
    ("DB-4.table", "mysql", {"schema": "DB-4", "name": "table"}),
    ("`DB-4`.table", "mysql", {"schema": "DB-4", "name": "table"}),
    ("schema.`Table Name`", "mysql",
     {"schema": "schema", "name": "Table Name"}),
    ('"ScheMa Name"."Table Name"', "snowflake",
     {"schema": "ScheMa Name", "name": "Table Name"}),
    ('ScheMa-Name."Table Name"', "snowflake",
     {"schema": "ScheMa-Name", "name": "Table Name"}),
    ("select 1 from table ", "snowflake",
     {"sql": "select 1 from table"}),
]


@pytest.mark.parametrize("text,dialect,want", PTN_CASES,
                         ids=[c[0] for c in PTN_CASES])
def test_parse_table_name_ported(text, dialect, want):
    got = parse_table_name(text, dialect)
    full = {"database": "", "schema": "", "name": "", "sql": ""}
    full.update(want)
    assert got == full


MULTI_CASES = [
    ("simple single statement", "SELECT * FROM users", "postgres",
     ["SELECT * FROM users"]),
    ("simple multiple statements",
     "SELECT * FROM users; INSERT INTO logs VALUES (1);", "postgres",
     ["SELECT * FROM users", "INSERT INTO logs VALUES (1)"]),
    ("with trailing whitespace", "SELECT * FROM users;  \n  ",
     "postgres", ["SELECT * FROM users"]),
    ("statements with comments",
     "SELECT * FROM users; -- Get all users\n"
     "INSERT INTO logs VALUES (1); /* Add log */", "postgres",
     ["SELECT * FROM users",
      "-- Get all users\nINSERT INTO logs VALUES (1)", "/* Add log */"]),
    ("semicolon in quoted string",
     "SELECT * FROM users WHERE name = 'user;name';", "postgres",
     ["SELECT * FROM users WHERE name = 'user;name'"]),
    ("semicolon in comments",
     "SELECT * FROM users /* ; */ WHERE id = 1;", "postgres",
     ["SELECT * FROM users /* ; */ WHERE id = 1"]),
    ("sql server with trailing semicolon", "SELECT * FROM users;",
     "sqlserver", ["SELECT * FROM users;"]),
    ("begin end block",
     "BEGIN UPDATE users SET active = 1; "
     "INSERT INTO logs VALUES (1); END;", "postgres",
     ["BEGIN UPDATE users SET active = 1; "
      "INSERT INTO logs VALUES (1); END;"]),
    ("declare begin end block",
     "DECLARE v_x NUMBER; BEGIN v_x := 1; "
     "INSERT INTO logs VALUES (v_x); END;", "oracle",
     ["DECLARE v_x NUMBER; BEGIN v_x := 1; "
      "INSERT INTO logs VALUES (v_x); END;"]),
    ("prepare execute statement",
     "PREPARE stmt AS SELECT * FROM users; EXECUTE stmt;", "postgres",
     ["PREPARE stmt AS SELECT * FROM users; EXECUTE stmt;"]),
    ("create procedure",
     "CREATE PROCEDURE get_users() BEGIN SELECT * FROM users; END;",
     "postgres",
     ["CREATE PROCEDURE get_users() BEGIN SELECT * FROM users; END;"]),
    ("create function",
     "CREATE FUNCTION get_user_count() RETURNS INT BEGIN RETURN "
     "(SELECT COUNT(*) FROM users); END;", "postgres",
     ["CREATE FUNCTION get_user_count() RETURNS INT BEGIN RETURN "
      "(SELECT COUNT(*) FROM users); END;"]),
    ("single quotes with escape",
     "SELECT * FROM users WHERE name = 'O''Connor'; "
     "SELECT * FROM logs;", "postgres",
     ["SELECT * FROM users WHERE name = 'O''Connor'",
      "SELECT * FROM logs"]),
    ("empty statements should be skipped",
     ";;SELECT * FROM users;;;;SELECT * FROM logs;;;", "postgres",
     ["SELECT * FROM users", "SELECT * FROM logs"]),
]


@pytest.mark.parametrize("name,sql,dialect,want", MULTI_CASES,
                         ids=[c[0] for c in MULTI_CASES])
def test_parse_sql_multi_statements_ported(name, sql, dialect, want):
    assert parse_sql_multi_statements(sql, dialect) == want


TRIM_CASES = [
    ("no comments", "SELECT * FROM users WHERE id = 1",
     "SELECT * FROM users WHERE id = 1", False),
    ("line comment at end", "SELECT * FROM users -- This is a comment",
     "SELECT * FROM users ", False),
    ("line comment in middle", "SELECT * -- Get all users\nFROM users",
     "SELECT * \nFROM users", False),
    ("block comment at end",
     "SELECT * FROM users /* This is a block comment */",
     "SELECT * FROM users ", False),
    ("block comment in middle", "SELECT * /* Get all users */ FROM users",
     "SELECT *  FROM users", False),
    ("mixed comments",
     "SELECT * /* Block comment */ FROM users -- Line comment\n"
     "WHERE id = 1",
     "SELECT *  FROM users \nWHERE id = 1", False),
    ("comment inside quoted string",
     "SELECT * FROM users WHERE comment = '-- Not a comment'",
     "SELECT * FROM users WHERE comment = '-- Not a comment'", False),
    ("escaped quotes",
     "SELECT * FROM users WHERE name = 'O''Connor' -- Comment",
     "SELECT * FROM users WHERE name = 'O''Connor' ", False),
    ("unterminated quote", "SELECT * FROM users WHERE name = 'O",
     None, True),
    ("unterminated block comment",
     "SELECT * FROM users /* Comment without end", None, True),
    ("nested-looking comments",
     "SELECT * /* outer /* inner */ comment */ FROM users",
     "SELECT *  comment */ FROM users", False),
    ("empty input", "", "", False),
]


@pytest.mark.parametrize("name,sql,want,err", TRIM_CASES,
                         ids=[c[0] for c in TRIM_CASES])
def test_trim_sql_comments_ported(name, sql, want, err):
    if err:
        with pytest.raises(ValueError):
            trim_sql_comments(sql)
    else:
        assert trim_sql_comments(sql) == want


def test_pre_post_sql_multi_statements_e2e(spark, tmp_path):
    """pre_sql/post_sql accept ;-separated statements with comments
    (wired through runner._exec_sql)."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .write.parquet(src)
    out = str(tmp_path / "out.parquet")
    run(spark, Config.from_dict({
        "source": {"stream": src},
        "target": {"object": out, "options": {
            "pre_sql": ("CREATE OR REPLACE TEMP VIEW presql_probe AS "
                        "SELECT 1 AS one; -- a comment\n"
                        "CREATE OR REPLACE TEMP VIEW presql_probe2 AS "
                        "SELECT 2 AS two; /* trailing comment */"),
        }},
        "mode": "full-refresh"}))
    assert spark.table("presql_probe").collect()[0]["one"] == 1
    assert spark.table("presql_probe2").collect()[0]["two"] == 2


PCN_CASES = [
    ("schema.table.col1", "snowflake", "COL1"),
    ("schema.*", "snowflake", "*"),
    ("*", "snowflake", "*"),
    ('"ScheMa".table', "snowflake", "TABLE"),
    ("table", "snowflake", "TABLE"),
    ("table", "mysql", "table"),
    ("TABLE", "mysql", "table"),
    ("TaBLE", "mysql", "TaBLE"),
    ('"ScheMa Name".table', "snowflake", "TABLE"),
    ("`table-4`", "mysql", "table-4"),
    ("TABLE-4", "mysql", "table-4"),
    ("TABLe-4", "mysql", "TABLe-4"),
    ("schema.`Table Name`", "mysql", "Table Name"),
    ('"ScheMa Name"."Table Name"', "snowflake", "Table Name"),
    ("ScheMa-Name.Table-Name", "snowflake", "Table-Name"),
]


@pytest.mark.parametrize("text,dialect,want", PCN_CASES,
                         ids=[f"{c[0]}|{c[1]}" for c in PCN_CASES])
def test_parse_column_name_ported(text, dialect, want):
    from sling_cli_spark.dialects import parse_column_name

    assert parse_column_name(text, dialect) == want


PK_DDL_CASES = [
    ("simple DDL without WITH clause", "sqlserver",
     'create table "dbo"."test" ("col1" nvarchar(10), "col2" nvarchar(6))',
     ["col1", "col2"],
     'create table "dbo"."test" ("col1" nvarchar(10), "col2" nvarchar(6)'
     ', primary key ("col1", "col2"))'),
    ("DDL with WITH clause (GitHub issue 694)", "sqlserver",
     'create table "dbo"."test" ("col1" nvarchar(10), "col2" nvarchar(6))'
     ' WITH (data_compression=page)',
     ["col1", "col2"],
     'create table "dbo"."test" ("col1" nvarchar(10), "col2" nvarchar(6)'
     ', primary key ("col1", "col2")) WITH (data_compression=page)'),
    ("DDL with multiple WITH options", "sqlserver",
     'create table "dbo"."test" ("col1" int, "col2" int)'
     ' WITH (PAD_INDEX = ON, FILLFACTOR = 90)',
     ["col1"],
     'create table "dbo"."test" ("col1" int, "col2" int'
     ', primary key ("col1")) WITH (PAD_INDEX = ON, FILLFACTOR = 90)'),
    ("DDL with nested parentheses in column type", "sqlserver",
     'create table "dbo"."test" ("col1" decimal(10,2), "col2" varchar(100))'
     ' WITH (LOCK_ESCALATION = TABLE)',
     ["col1"],
     'create table "dbo"."test" ("col1" decimal(10,2), "col2" varchar(100)'
     ', primary key ("col1")) WITH (LOCK_ESCALATION = TABLE)'),
    ("Postgres DDL without suffix", "postgres",
     'create table if not exists "public"."test" ("col1" integer, "col2" text)',
     ["col1"],
     'create table if not exists "public"."test" ("col1" integer, "col2" text'
     ', primary key ("col1"))'),
    ("Postgres DDL with PARTITION BY clause", "postgres",
     'create table if not exists "public"."test" ("col1" integer, "col2" date)'
     ' PARTITION BY RANGE (col2)',
     ["col1"],
     'create table if not exists "public"."test" ("col1" integer, "col2" date'
     ', primary key ("col1")) PARTITION BY RANGE (col2)'),
    ("Oracle DDL with named constraint", "oracle",
     'create table "SCHEMA"."TEST" ("COL1" NUMBER, "COL2" VARCHAR2(100))',
     ["COL1"],
     'create table "SCHEMA"."TEST" ("COL1" NUMBER, "COL2" VARCHAR2(100)'
     ', constraint test_pkey primary key ("COL1"))'),
    ("no primary key columns", "sqlserver",
     'create table "dbo"."test" ("col1" int, "col2" int)'
     ' WITH (FILLFACTOR = 90)',
     [],
     'create table "dbo"."test" ("col1" int, "col2" int)'
     ' WITH (FILLFACTOR = 90)'),
]


@pytest.mark.parametrize("name,dialect,ddl,pk,want", PK_DDL_CASES,
                         ids=[c[0] for c in PK_DDL_CASES])
def test_add_primary_key_to_ddl_ported(name, dialect, ddl, pk, want):
    from sling_cli_spark.dialects import add_primary_key_to_ddl

    assert add_primary_key_to_ddl(ddl, pk, dialect, "test") == want


def test_create_table_ddl_with_primary_key():
    from pyspark.sql import types as T

    from sling_cli_spark.dialects import create_table_ddl, get_dialect

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType())])
    ddl = create_table_ddl(get_dialect("postgres"), "public.t", schema,
                           primary_key=["id"])
    assert ddl.endswith(', primary key ("id"))')
