"""Dialect template packs: render-and-assert (like the reference's suite,
cmd/sling/sling_test.go:620-629) plus EXECUTION of the rendered DuckDB SQL
against an in-process DuckDB, with parity checked against the Spark-side
merge plans in operators/merge.py."""

import duckdb
import pytest

from sling_cli_spark.dialects import (
    backfill_where_sql, create_table_ddl, delete_missing_sql,
    generate_merge_sql, get_dialect, incremental_select_sql, render,
)

COLS = ["id", "v", "ts"]


def test_render_strict_raises_on_missing():
    with pytest.raises(KeyError):
        render("select {fields} from {table}", {"fields": "*"})


def test_render_fills_everything():
    out = render("select {fields} from {table}", {"fields": "*", "table": "t"})
    assert out == "select * from t"


def test_duckdb_update_insert_two_statement():
    # the reference nulls duckdb update_insert (duckdb.yaml:52-54:
    # INSERT OR REPLACE needs a PK constraint); beyond-reference, this
    # engine composes UPDATE..FROM + anti-INSERT (r.100 corpus parity)
    d = get_dialect("duckdb")
    sql = generate_merge_sql(d, "src", "tgt", COLS, ["id"], "update_insert")
    assert "UPDATE tgt" in sql and "NOT EXISTS" in sql
    # ducklake keeps it off: no UPDATE..FROM over lake storage
    with pytest.raises(ValueError):
        generate_merge_sql(get_dialect("ducklake"), "src", "tgt", COLS,
                           ["id"], "update_insert")


def test_mysql_update_unsupported():
    d = get_dialect("mysql")
    with pytest.raises(ValueError):
        generate_merge_sql(d, "src", "tgt", COLS, ["id"], "update")
    with pytest.raises(ValueError):
        generate_merge_sql(d, "src", "tgt", COLS, ["id"], "update_insert")


def test_mysql_quoting_and_default_strategy():
    d = get_dialect("mysql")
    sql = generate_merge_sql(d, "src_t", "tgt_t", COLS, ["id"])
    # default strategy delete_insert, backtick quoting, no subquery on the
    # insert target (error 1093)
    assert "DELETE FROM tgt_t" in sql and "`id`" in sql
    assert "{" not in sql


def test_postgres_update_insert_renders_temp_table_dance():
    d = get_dialect("postgres")
    sql = generate_merge_sql(d, "stage.src", "public.tgt", COLS, ["id"],
                             "update_insert")
    assert "create temporary table" in sql
    assert "returning tgt.*" in sql
    assert "upd." in sql          # src_upd_pk_equal resolved
    assert "{" not in sql         # every placeholder filled


def test_composite_pk_and_pk_only_table():
    d = get_dialect("postgres")
    sql = generate_merge_sql(d, "s", "t", ["a", "b"], ["a", "b"], "update")
    # PK spans all columns -> set_fields falls back to all columns
    assert '"a" = src."a"' in sql and '"b" = src."b"' in sql


def test_incremental_select_literals():
    import datetime

    d = get_dialect("duckdb")
    sql = incremental_select_sql(
        d, "events", "ts", datetime.datetime(2026, 1, 2, 3, 4, 5),
        fields=["id", "ts"], where="kind = 'click'")
    assert '"ts" > \'2026-01-02 03:04:05\'' in sql
    assert "and (kind = 'click')" in sql
    sql2 = incremental_select_sql(d, "t", "id", 42, gte=True, limit=10)
    assert '"id" >= 42' in sql2 and "limit 10" in sql2
    # string watermark quotes are escaped
    sql3 = incremental_select_sql(d, "t", "name", "O'Brien")
    assert "'O''Brien'" in sql3


def test_backfill_where():
    d = get_dialect("postgres")
    assert backfill_where_sql(d, "id", 5, 10) == '"id" >= 5 and "id" <= 10'


def test_delete_missing_sql_hard_and_soft():
    d = get_dialect("postgres")
    hard = delete_missing_sql(d, "tgt", "keys", ["id"])
    assert hard.startswith("delete from tgt")
    assert 'tgt."id" = keys."id"' in hard
    soft = delete_missing_sql(d, "tgt", "keys", ["id"], soft=True)
    assert "_sling_synced_op = 'D'" in soft and soft.startswith("update tgt")


def test_create_table_ddl_types_and_sizing(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("note", T.StringType()),
        T.StructField("amt", T.DecimalType(12, 2)),
        T.StructField("ok", T.BooleanType()),
    ])
    pg = create_table_ddl(get_dialect("postgres"), "public.t", schema,
                          max_lens={"name": 40, "note": 9000})
    assert '"id" bigint' in pg
    assert '"name" varchar(60)' in pg      # 40 * 1.5 factor
    assert '"note" text' in pg             # beyond 4000 -> text
    assert '"amt" numeric(12,2)' in pg
    my = create_table_ddl(get_dialect("mysql"), "t", schema)
    assert "`ok` tinyint(1)" in my and "`name` varchar(255)" in my


# ---------------------------------------------------------------------------
# executable twin: rendered DuckDB SQL vs the Spark merge plans


def _duck_with_tables():
    con = duckdb.connect()
    con.execute("""
        create table tgt(id bigint, v varchar, ts bigint);
        insert into tgt values (1,'a',1),(2,'b',1),(3,'c',1);
        create table src(id bigint, v varchar, ts bigint);
        insert into src values (2,'B',2),(3,'C',2),(4,'D',2);
    """)
    return con


def _spark_frames(spark):
    t = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id long, v string, ts long")
    s = spark.createDataFrame(
        [(2, "B", 2), (3, "C", 2), (4, "D", 2)], "id long, v string, ts long")
    return t, s


@pytest.mark.parametrize("strategy,spark_fn", [
    ("insert", "merge_insert"),
    ("update", "merge_update"),
    ("delete_insert", "merge_delete_insert"),
])
def test_rendered_duckdb_merge_matches_spark_plan(spark, strategy, spark_fn):
    import sling_cli_spark.operators.merge as M

    con = _duck_with_tables()
    sql = generate_merge_sql(
        get_dialect("duckdb"), "src", "tgt", COLS, ["id"], strategy)
    con.execute(sql)
    duck = sorted(map(tuple, con.execute("select * from tgt").fetchall()))

    t, s = _spark_frames(spark)
    via_spark = sorted(
        tuple(r) for r in getattr(M, spark_fn)(t, s, "id").collect())
    assert duck == via_spark


def test_rendered_delete_missing_executes():
    con = _duck_with_tables()
    con.execute("create table keys as select id from src")
    sql = delete_missing_sql(get_dialect("duckdb"), "tgt", "keys", ["id"])
    con.execute(sql)
    assert sorted(r[0] for r in con.execute("select id from tgt").fetchall()) \
        == [2, 3]  # id=1 absent from keyset -> deleted


def test_rendered_incremental_select_executes():
    con = _duck_with_tables()
    sql = incremental_select_sql(
        get_dialect("duckdb"), "src", "ts", 1, fields=["id", "ts"])
    rows = con.execute(sql).fetchall()
    assert sorted(r[0] for r in rows) == [2, 3, 4]


def test_rendered_ddl_executes():
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(10, 2)),
    ])
    con = duckdb.connect()
    con.execute(create_table_ddl(get_dialect("duckdb"), "t", schema))
    cols = con.execute(
        "select column_name, data_type from information_schema.columns "
        "where table_name='t' order by ordinal_position").fetchall()
    assert cols[0] == ("id", "BIGINT")
    assert cols[2][1] == "DECIMAL(10,2)"


# ---------------------------------------------------------------------------
# staged transactional load orchestration (task_run_write.go:228-498),
# exercised against DuckDB in place of a JDBC connection


def _staged_env():
    con = duckdb.connect()
    con.execute("""
        create table tgt(id bigint, v varchar, ts bigint);
        insert into tgt values (1,'a',1),(2,'b',1),(3,'c',1);
    """)
    return con


def test_staged_db_load_merges_and_cleans_up():
    from sling_cli_spark.sources.jdbc import staged_db_load

    con = _staged_env()

    def write_stage(temp):
        con.execute(f"create table {temp}(id bigint, v varchar, ts bigint)")
        con.execute(
            f"insert into {temp} values (2,'B',2),(3,'C',2),(4,'D',2)")

    out = staged_db_load(
        execute=con.execute,
        fetch_one=lambda s: con.execute(s).fetchone(),
        dialect_name="duckdb", target_table="tgt",
        columns=COLS, primary_key=["id"],
        write_stage=write_stage, expect_count=3)
    assert out["staged_rows"] == 3
    rows = sorted(map(tuple, con.execute("select * from tgt").fetchall()))
    assert rows == [(1, "a", 1), (2, "B", 2), (3, "C", 2), (4, "D", 2)]
    # temp table dropped
    left = con.execute(
        "select count(*) from information_schema.tables "
        "where table_name like '%_sling_tmp'").fetchone()[0]
    assert left == 0


def test_staged_db_load_count_mismatch_aborts_before_merge():
    from sling_cli_spark.sources.jdbc import staged_db_load

    con = _staged_env()

    def write_stage(temp):
        con.execute(f"create table {temp}(id bigint, v varchar, ts bigint)")
        con.execute(f"insert into {temp} values (9,'X',9)")

    with pytest.raises(ValueError, match="staged count"):
        staged_db_load(
            execute=con.execute,
            fetch_one=lambda s: con.execute(s).fetchone(),
            dialect_name="duckdb", target_table="tgt",
            columns=COLS, primary_key=["id"],
            write_stage=write_stage, expect_count=5)
    # final table untouched, temp cleaned
    assert con.execute("select count(*) from tgt").fetchone()[0] == 3
    left = con.execute(
        "select count(*) from information_schema.tables "
        "where table_name like '%_sling_tmp'").fetchone()[0]
    assert left == 0


def test_jdbc_incremental_pushdown_renders_dialect_sql():
    from sling_cli_spark.config import Source
    from sling_cli_spark.sources.jdbc import build_read_options, dialect_from_url

    assert dialect_from_url("jdbc:postgresql://h/db") == "postgres"
    assert dialect_from_url("jdbc:mysql://h/db") == "mysql"
    src = Source(stream="public.events", update_key="ts", where="k='a'")
    opts = build_read_options("jdbc:postgresql://h/db", src, watermark=100)
    assert opts["dbtable"].startswith("(select * from public.events")
    assert '"ts" > 100' in opts["dbtable"]
    assert "(k='a')" in opts["dbtable"]
    # backfill variant
    opts2 = build_read_options(
        "jdbc:mysql://h/db", src, backfill_range=(5, 9))
    assert "`ts` >= 5 and `ts` <= 9" in opts2["dbtable"]


# --- per-DB fast loaders ------------------------------------------------

def test_fast_load_sql_renders_per_dialect():
    from sling_cli_spark.dialects import fast_load_sql, get_dialect

    d = fast_load_sql(get_dialect("duckdb"), "t", ["id", "v"],
                      "/stage/b.parquet", fmt="parquet")
    assert d == "COPY t FROM '/stage/b.parquet' (format 'parquet')"

    p = fast_load_sql(get_dialect("postgres"), "t", ["id", "v"])
    assert p.startswith('COPY t ("id", "v") FROM STDIN')

    m = fast_load_sql(get_dialect("mysql"), "t", ["id", "v"],
                      "/stage/b.csv")
    assert "LOAD DATA LOCAL INFILE '/stage/b.csv'" in m
    assert "(`id`, `v`)" in m


def test_fast_load_executes_in_duckdb(tmp_path):
    """The duckdb fast loader is executable end-to-end: stage a parquet
    file, COPY it into a table, read it back."""
    import duckdb

    from sling_cli_spark.dialects import fast_load_sql, get_dialect

    import pandas as pd
    staged = str(tmp_path / "batch.parquet")
    pd.DataFrame({"id": [1, 2, 3], "v": ["a", "b", "c"]}).to_parquet(staged)

    con = duckdb.connect()
    con.execute("create table t (id bigint, v varchar)")
    con.execute(fast_load_sql(
        get_dialect("duckdb"), "t", ["id", "v"], staged, fmt="parquet"))
    assert con.execute("select count(*), max(v) from t").fetchone() == (3, "c")


def test_table_keys_ddl_renders_and_executes():
    import duckdb

    from sling_cli_spark.dialects import get_dialect, table_keys_ddl
    from sling_cli_spark.operators.column_modifiers import parse_columns

    specs = parse_columns({"code": "string unique_index(name=ix_code)"})
    stmts = table_keys_ddl(
        get_dialect("duckdb"), "t",
        {"index": ["a", ["b", "c"]], "unique": [["a", "b"]]},
        column_specs=specs)
    assert stmts == [
        'create index "idx_t_a" on t ("a")',
        'create index "idx_t_b_c" on t ("b", "c")',
        'create unique index "idx_t_a_b" on t ("a", "b")',
        'create unique index "ix_code" on t ("code")',
    ]
    con = duckdb.connect()
    con.execute("create table t (a int, b int, c int, code varchar)")
    for s in stmts:
        con.execute(s)
    # the unique index is enforced
    con.execute("insert into t values (1, 1, 1, 'x')")
    import pytest as _pytest
    with _pytest.raises(duckdb.ConstraintException):
        con.execute("insert into t values (1, 1, 2, 'y')")


# ------------------------------------------------------- round 4: new packs

from sling_cli_spark.dialects import dialect_names, fast_load_plan


def test_new_dialects_registered():
    assert {"snowflake", "sqlserver", "bigquery", "oracle"} <= \
        set(dialect_names())


@pytest.mark.parametrize("name,strategies", [
    # parity with the reference templates: all four support every strategy
    # (snowflake.yaml:127, sqlserver.yaml:50, bigquery.yaml:41,
    # oracle.yaml:89 — "supports all 4 merge strategies")
    ("snowflake", {"insert", "update", "update_insert", "delete_insert",
                   "change_capture"}),
    ("sqlserver", {"insert", "update", "update_insert", "delete_insert",
                   "change_capture"}),
    ("bigquery", {"insert", "update", "update_insert", "delete_insert",
                  "change_capture"}),
    ("oracle", {"insert", "update", "update_insert", "delete_insert",
                "change_capture"}),
    ("mysql", {"insert", "delete_insert", "change_capture"}),
    # duckdb adds the beyond-reference two-statement update_insert
    # (reference duckdb.yaml nulls it; see dialects.py duckdb core)
    ("duckdb", {"insert", "update", "update_insert", "delete_insert",
                "change_capture"}),
])
def test_supported_merge_strategy_parity(name, strategies):
    assert set(get_dialect(name).supported_merge_strategies()) == strategies


@pytest.mark.parametrize("name", ["snowflake", "sqlserver", "bigquery",
                                  "oracle"])
@pytest.mark.parametrize("strategy", ["insert", "update", "update_insert",
                                      "delete_insert"])
def test_new_dialect_merges_render_fully(name, strategy):
    d = get_dialect(name)
    sql = generate_merge_sql(d, "stg.src", "db.tgt", COLS, ["id"], strategy)
    assert "{" not in sql and "}" not in sql  # no unresolved placeholders
    assert "db.tgt" in sql and "stg.src" in sql


def test_sqlserver_dialect_shapes():
    d = get_dialect("sqlserver")
    up = generate_merge_sql(d, "s", "t", COLS, ["id"], "update")
    assert "INNER JOIN" in up  # no UPDATE..FROM..WHERE on sqlserver
    di = generate_merge_sql(d, "s", "t", COLS, ["id"], "delete_insert")
    assert di.startswith("DELETE tgt FROM")  # T-SQL alias-delete form
    lim = render(d.template("limit"), {
        "limit": "10", "fields": "*", "table": "t", "where_clause": ""})
    assert lim.startswith("select top 10")


def test_oracle_dialect_shapes():
    d = get_dialect("oracle")
    up = generate_merge_sql(d, "s", "t", COLS, ["id"], "update")
    assert up.startswith("MERGE INTO")  # no UPDATE..FROM on oracle
    assert "WHEN NOT MATCHED" not in up  # update-only MERGE
    lim = render(d.template("limit"), {
        "limit": "5", "fields": "*", "table": "t", "where_and": ""})
    assert "rownum <= 5" in lim


def test_snowflake_fast_load_plan_is_stage_put_copy():
    d = get_dialect("snowflake")
    plan = fast_load_plan(d, "db.t", COLS, "/tmp/batch.csv")
    assert len(plan) == 3
    assert plan[0].startswith("CREATE STAGE IF NOT EXISTS")
    assert plan[1].startswith("PUT 'file:///tmp/batch.csv'")
    assert "COPY INTO db.t" in plan[2] and "SKIP_HEADER = 1" in plan[2]
    # parquet variant matches by column name instead of positions
    pq = fast_load_plan(d, "db.t", COLS, "/tmp/b.parquet", fmt="parquet")
    assert "MATCH_BY_COLUMN_NAME" in pq[2]


def test_sqlserver_bigquery_oracle_fast_load_plans():
    assert "BULK INSERT db.t" in fast_load_plan(
        get_dialect("sqlserver"), "db.t", COLS, "/tmp/b.csv")[0]
    bq = fast_load_plan(get_dialect("bigquery"), "db.t", COLS,
                        "gs://bkt/b.csv")[0]
    assert bq.startswith("LOAD DATA INTO db.t") and "gs://bkt/b.csv" in bq
    ctl = fast_load_plan(get_dialect("oracle"), "db.t", COLS,
                         "/tmp/b.csv")[0]
    assert ctl.startswith("LOAD DATA") and "APPEND INTO TABLE db.t" in ctl


def test_dialect_type_maps(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(12, 2)),
        T.StructField("ok", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("blob", T.BinaryType()),
    ])
    sf = create_table_ddl(get_dialect("snowflake"), "t", schema)
    assert "timestamp_tz" in sf and "boolean" in sf
    ms = create_table_ddl(get_dialect("sqlserver"), "t", schema,
                          max_lens={"name": 50})
    assert "nvarchar(75)" in ms and "bit" in ms and "datetimeoffset" in ms
    bq = create_table_ddl(get_dialect("bigquery"), "t", schema)
    assert "int64" in bq and "numeric" in bq and "bytes" in bq
    ora = create_table_ddl(get_dialect("oracle"), "t", schema)
    assert "number(19)" in ora and "number(12,2)" in ora \
        and "varchar2(5)" in ora


def test_snowflake_long_string_stays_varchar():
    # snowflake's 16 MB varchar cap: a 100k-char column still renders as
    # varchar (sqlserver would fall to nvarchar(max))
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("body", T.StringType())])
    sf = create_table_ddl(get_dialect("snowflake"), "t", schema,
                          max_lens={"body": 100_000})
    assert "varchar(150000)" in sf
    ms = create_table_ddl(get_dialect("sqlserver"), "t", schema,
                          max_lens={"body": 100_000})
    assert "nvarchar(max)" in ms


@pytest.mark.parametrize("name,strategies", [
    ("clickhouse", {"insert", "delete_insert", "change_capture"}),
    ("redshift", {"insert", "delete_insert", "change_capture"}),
    ("athena", {"insert"}),
    ("mariadb", {"insert", "delete_insert", "change_capture"}),
    ("starrocks", {"insert", "update_insert", "delete_insert",
                   "change_capture"}),
])
def test_round4_extra_dialect_strategy_parity(name, strategies):
    assert set(get_dialect(name).supported_merge_strategies()) == strategies


@pytest.mark.parametrize("name", ["clickhouse", "redshift", "athena",
                                  "mariadb", "starrocks"])
def test_round4_extra_dialects_render(name):
    d = get_dialect(name)
    for strat in d.supported_merge_strategies():
        if strat == "change_capture":
            continue  # rendered via the cdc path, distinct placeholders
        sql = generate_merge_sql(d, "stg.src", "db.tgt", COLS, ["id"], strat)
        assert "{" not in sql and "db.tgt" in sql


def test_clickhouse_mutation_delete_shape():
    sql = generate_merge_sql(get_dialect("clickhouse"), "s", "t", COLS,
                             ["id"], "delete_insert")
    assert sql.startswith("ALTER TABLE t DELETE")
    assert "mutations_sync = 1" in sql


def test_redshift_no_alias_delete_shape():
    sql = generate_merge_sql(get_dialect("redshift"), "s", "t", COLS,
                             ["id"], "delete_insert")
    assert sql.startswith("DELETE FROM t\nUSING")
    with pytest.raises(ValueError):
        generate_merge_sql(get_dialect("redshift"), "s", "t", COLS,
                           ["id"], "update_insert")


def test_athena_insert_only():
    d = get_dialect("athena")
    for strat in ("update", "update_insert", "delete_insert"):
        with pytest.raises(ValueError):
            generate_merge_sql(d, "s", "t", COLS, ["id"], strat)


def test_redshift_fast_load_is_s3_copy():
    sql = fast_load_plan(get_dialect("redshift"), "db.t", COLS,
                         "s3://bkt/stage/batch.csv")[0]
    assert sql.startswith("COPY db.t") and "s3://bkt/stage/batch.csv" in sql


@pytest.mark.parametrize("name,strategies", [
    ("sqlite", {"insert", "update", "update_insert", "delete_insert",
                "change_capture"}),
    ("databricks", {"insert", "update", "update_insert", "delete_insert",
                    "change_capture"}),
])
def test_sqlite_databricks_strategy_parity(name, strategies):
    assert set(get_dialect(name).supported_merge_strategies()) == strategies


def test_sqlite_upsert_is_on_conflict():
    sql = generate_merge_sql(get_dialect("sqlite"), "s", "t", COLS,
                             ["id"], "update_insert")
    assert "ON CONFLICT" in sql and "excluded." in sql
    assert "WHERE true" in sql  # upsert/join parser disambiguation


def test_databricks_copy_into_plan():
    plan = fast_load_plan(get_dialect("databricks"), "cat.sch.t", COLS,
                          "/Volumes/stage/batch", fmt="parquet")
    assert plan[0].startswith("COPY INTO cat.sch.t")
    assert "FILEFORMAT = PARQUET" in plan[0]


def test_sqlite_rendered_merges_execute():
    """sqlite ships in the stdlib — execute the rendered SQL for real,
    like the duckdb executable-twin tests."""
    import sqlite3

    d = get_dialect("sqlite")
    con = sqlite3.connect(":memory:")
    con.execute("create table tgt (id integer primary key, v text, ts int)")
    con.execute("create table src (id integer, v text, ts int)")
    con.executemany("insert into tgt values (?,?,?)",
                    [(1, "a", 10), (2, "b", 10)])
    con.executemany("insert into src values (?,?,?)",
                    [(2, "B2", 20), (3, "c", 20)])
    sql = generate_merge_sql(d, "src", "tgt", ["id", "v", "ts"], ["id"],
                             "update_insert")
    con.executescript(sql)
    got = dict((r[0], r[1]) for r in con.execute(
        "select id, v from tgt order by id"))
    assert got == {1: "a", 2: "B2", 3: "c"}

    # delete_insert twin
    con2 = sqlite3.connect(":memory:")
    con2.execute("create table tgt (id integer primary key, v text)")
    con2.execute("create table src (id integer, v text)")
    con2.executemany("insert into tgt values (?,?)", [(1, "a"), (2, "b")])
    con2.executemany("insert into src values (?,?)", [(2, "B"), (4, "d")])
    con2.executescript(generate_merge_sql(
        d, "src", "tgt", ["id", "v"], ["id"], "delete_insert"))
    got2 = dict(con2.execute("select id, v from tgt order by id"))
    assert got2 == {1: "a", 2: "B", 4: "d"}


# --- round-4 packs: trino/exasol/db2/hive + T-SQL family + inherited -----

R4_DIALECTS = ["trino", "exasol", "db2", "hive", "azuresql", "azuredwh",
               "fabric", "motherduck", "ducklake", "d1", "firebird",
               "proton"]


def test_r4_dialects_registered():
    from sling_cli_spark.dialects import dialect_names

    assert set(R4_DIALECTS) <= set(dialect_names())
    assert len(dialect_names()) >= 26


@pytest.mark.parametrize("name,strategies", [
    # parity with the reference templates' merge sections
    ("trino", {"insert", "update", "update_insert", "delete_insert",
               "change_capture"}),          # trino.yaml inherits base
    ("exasol", {"insert", "update", "update_insert", "delete_insert",
                "change_capture"}),         # exasol.yaml:55-128
    ("db2", {"insert", "update", "update_insert", "delete_insert",
             "change_capture"}),            # db2.yaml:37-100
    ("hive", {"insert"}),                   # hive.yaml: no ACID merges
    ("azuresql", {"insert", "update", "update_insert", "delete_insert",
                  "change_capture"}),       # azuresql.yaml:51-80
    ("fabric", {"insert", "update", "update_insert", "delete_insert",
                "change_capture"}),         # fabric.yaml:68-96
    ("motherduck", {"insert", "update", "update_insert", "delete_insert",
                    "change_capture"}),     # duckdb-inherited (incl. the
                                            # beyond-reference update_insert)
    ("ducklake", {"insert", "delete_insert",
                  "change_capture"}),       # ducklake: no complex UPDATE
    ("d1", {"insert", "update", "update_insert", "delete_insert",
            "change_capture"}),             # d1.yaml:27-60 (sqlite set)
    ("firebird", {"insert", "update", "update_insert", "delete_insert",
                  "change_capture"}),       # firebird.yaml:23-40 MERGE
    ("proton", {"insert"}),                 # proton.yaml:24-33 insert-only
])
def test_r4_merge_strategy_parity(name, strategies):
    assert set(get_dialect(name).supported_merge_strategies()) == strategies


@pytest.mark.parametrize("name", R4_DIALECTS)
def test_r4_supported_merges_render_fully(name):
    d = get_dialect(name)
    for strategy in d.supported_merge_strategies():
        sql = generate_merge_sql(d, "stg.src", "db.tgt", COLS, ["id"],
                                 strategy)
        assert "{" not in sql and "}" not in sql, (name, strategy)
        assert "db.tgt" in sql and "stg.src" in sql


def test_r4_dialect_shapes():
    # trino: OFFSET precedes LIMIT (trino.yaml:15)
    lim = render(get_dialect("trino").template("limit"), {
        "limit": "10", "offset": "0", "fields": "*", "table": "t",
        "where_clause": ""})
    assert "offset 0 limit 10" in lim
    # db2: fetch-first limit + handler-guarded drop (db2.yaml:2-6)
    d2 = get_dialect("db2")
    assert "fetch first 7 rows only" in render(
        d2.template("limit"),
        {"limit": "7", "fields": "*", "table": "t", "where_clause": ""})
    assert "SQLSTATE '42704'" in d2.template("drop_table")
    # firebird: select first..skip (firebird grammar)
    fb = render(get_dialect("firebird").template("limit"), {
        "limit": "5", "offset": "2", "fields": "*", "table": "t",
        "where_clause": ""})
    assert fb.startswith("select first 5 skip 2")
    # proton: streams, not tables (proton.yaml:2-5)
    pr = get_dialect("proton")
    assert pr.template("drop_table").startswith("drop stream")
    ins = generate_merge_sql(pr, "s", "t", COLS, ["id"], "insert")
    assert "FROM table(s)" in ins
    # hive: parquet-stored create, purge drop (hive.yaml:2-3)
    hv = get_dialect("hive")
    assert hv.template("create_table").endswith("stored as parquet")
    assert hv.template("drop_table").endswith("purge")


def test_r4_inheritance_resolves():
    # motherduck rides the duckdb pack (motherduck.yaml duplicates it)
    md, dd = get_dialect("motherduck"), get_dialect("duckdb")
    assert md.template("truncate_table") == dd.template("truncate_table")
    assert md.types == dd.types
    # ducklake overrides update off while keeping duckdb's surface
    dl = get_dialect("ducklake")
    assert dl.template("merge_update") is None
    assert dl.template("truncate_table") == dd.template("truncate_table")
    # azuresql/fabric ride the sqlserver statement shapes
    az = get_dialect("azuresql")
    assert generate_merge_sql(az, "s", "t", COLS, ["id"],
                              "delete_insert").startswith("DELETE tgt FROM")
    fb = get_dialect("fabric")
    assert "varchar" in fb.types["string"] and "nvarchar" not in \
        fb.types["string"]
    # d1 carries sqlite's upsert
    d1 = get_dialect("d1")
    assert "ON CONFLICT" in d1.template("merge_update_insert")


def test_r4_create_table_ddl_renders(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amt", T.DecimalType(18, 2)),
        T.StructField("at", T.TimestampType()),
    ])
    for name in R4_DIALECTS:
        ddl = create_table_ddl(get_dialect(name), "db.t", schema,
                               max_lens={"name": 80})
        assert "{" not in ddl and "}" not in ddl, name
        assert "db.t" in ddl, name


# --- round-4 batch 2: NoSQL/generic packs --------------------------------

def test_nosql_generic_packs_registered():
    from sling_cli_spark.dialects import dialect_names

    assert {"scylladb", "mongodb", "elasticsearch", "azuretable",
            "bigtable", "prometheus", "vertica", "adbc", "odbc",
            "spark", "iceberg"} <= set(dialect_names())
    # every real DB template in the reference pack dir has a twin here
    assert len(dialect_names()) >= 37


def test_mongodb_incremental_renders_json_condition():
    from sling_cli_spark.dialects import incremental_select_sql

    d = get_dialect("mongodb")
    sql = render(d.template("incremental_where"),
                 {"update_key": "ts", "value": "5"})
    assert sql == '{ "update_key": "ts", "value": "5" }'
    bf = render(d.template("backfill_where"),
                {"update_key": "ts", "start_value": "1",
                 "end_value": "9"})
    assert '"start_value": "1"' in bf and bf.startswith("{ ")
    # elasticsearch/azuretable ride the same JSON-condition surface
    assert get_dialect("elasticsearch").template("incremental_where") == \
        d.template("incremental_where")


def test_scylla_shapes():
    d = get_dialect("scylladb")
    assert d.supported_merge_strategies() == ["insert"]
    ks = render(d.template("create_schema"), {"schema": "ks1"})
    assert ks.startswith("create keyspace if not exists ks1") and \
        "'NetworkTopologyStrategy'" in ks
    tables = d.metadata_sql("tables", schema="ks1")
    assert "system_schema.tables" in tables and "ks1" in tables


def test_bigtable_prometheus_vertica_generic():
    bt = get_dialect("bigtable")
    assert render(bt.template("drop_table"), {"table": "t1"}) == \
        '{"action": "delete_table", "table": "t1"}'
    assert get_dialect("prometheus").supported_merge_strategies() == []
    # vertica/adbc/odbc: base pass-through — full base merge set
    for name in ("vertica", "adbc", "odbc"):
        d = get_dialect(name)
        assert set(d.supported_merge_strategies()) == {
            "insert", "update", "update_insert", "delete_insert",
            "change_capture"}
        sql = generate_merge_sql(d, "s", "t", COLS, ["id"],
                                 "update_insert")
        assert "{" not in sql and "}" not in sql


def test_general_type_from_native_classifier():
    # reverse of the per-dialect types map (r12: validation_types +
    # add_new_columns comparisons in sinks/db_load)
    from sling_cli_spark.dialects import general_type_from_native as g

    assert g("TIMESTAMP WITH TIME ZONE") == "timestampz"
    assert g("timestamptz") == "timestampz"
    assert g("TIMESTAMP") == "timestamp"
    assert g("datetime2") == "timestamp"
    assert g("DATE") == "date"
    assert g("TIME") == "time"
    assert g("BOOLEAN") == "bool"
    assert g("DECIMAL(18,4)") == "decimal"
    assert g("NUMERIC") == "decimal"
    assert g("DOUBLE PRECISION") == "float"
    assert g("BIGINT") == "bigint"
    assert g("INT2") == "smallint"
    assert g("JSON") == "json"
    assert g("BYTEA") == "binary"
    assert g("CLOB") == "text"
    assert g("VARCHAR(100)") == "string"
    assert g("UUID") == "uuid"
    assert g("made_up_type") == "string"


def test_duckdb_drop_view_and_modify_column_templates():
    d = get_dialect("duckdb")
    assert render(d.template("drop_view"), {"view": "s.v"}) == \
        "drop view if exists s.v"
    assert render(d.template("modify_column"),
                  {"table": "t", "column": '"c"', "type": "varchar"}) == \
        'alter table t alter column "c" set data type varchar'
    # base keeps the reference's bare drop (base.yaml:3)
    assert render(get_dialect("vertica").template("drop_view"),
                  {"view": "v1"}) == "drop view v1"


def test_create_table_ddl_general_overrides_json():
    from pyspark.sql import types as T

    from sling_cli_spark.dialects import create_table_ddl

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])
    d = get_dialect("duckdb")
    ddl = create_table_ddl(d, "t1", schema,
                           general_overrides={"payload": "json"})
    assert '"payload" json' in ddl
    # string/decimal overrides defer to sized native_type_for
    ddl2 = create_table_ddl(d, "t1", schema,
                            general_overrides={"payload": "string"})
    assert "varchar" in ddl2
