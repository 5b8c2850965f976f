"""replication_test.go vectors, ported (reference: core/sling/).

- TestExpandSelectColumns (:822) -> operators.select.expand_select_columns
- TestReplicationCompile  (:213) -> plans.replication.compile_replication
  (the DB-identifier cases; the reference renders quoted FDQNs through a
  live dialect — our objects stay unquoted strings, so the expectations
  are the unquoted twins)
- TestReplicationConfig   (:14)  -> YAML defaults parse + wildcard streams

Wildcard-listing tests against live sftp/s3/postgres fixtures are
environmental and not portable.
"""

from __future__ import annotations

import pytest

from sling_cli_spark.operators.select import expand_select_columns
from sling_cli_spark.plans.replication import ReplicationConfig

COLS = ["full_name", "id", "html_url"]

EXPAND_CASES = [
    ("no token passes through unchanged", ["id", "name"], COLS,
     ["id", "name"], False),
    ("empty select passes through", None, COLS, None, False),
    ("token alone expands to columns in declared order", ["@columns"],
     COLS, ["full_name", "id", "html_url"], False),
    ("token then wildcard pins columns first", ["@columns", "*"], COLS,
     ["full_name", "id", "html_url", "*"], False),
    ("expansion dedupes a name listed again after the token",
     ["@columns", "id", "extra"], COLS,
     ["full_name", "id", "html_url", "extra"], False),
    ("token not first is an error", ["id", "@columns"], COLS, None, True),
    ("token with no columns is an error", ["@columns"], None, None, True),
]


@pytest.mark.parametrize("name,select_list,columns,want,want_err",
                         EXPAND_CASES, ids=[c[0] for c in EXPAND_CASES])
def test_expand_select_columns(name, select_list, columns, want, want_err):
    if want_err:
        with pytest.raises(ValueError):
            expand_select_columns(select_list, columns)
    else:
        assert expand_select_columns(select_list, columns) == want


def test_expand_select_columns_through_apply_select(spark):
    from pyspark.sql import Row

    from sling_cli_spark.operators.select import apply_select

    df = spark.createDataFrame(
        [Row(full_name="a", id=1, html_url="u", extra="e")])
    out = apply_select(df, ["@columns"])
    assert out.columns == ["full_name", "id", "html_url", "extra"]


# ------------------------------------------------- TestReplicationCompile

def _compile(yaml_body):
    from sling_cli_spark.plans.replication import compile_replication

    return compile_replication(ReplicationConfig.from_yaml(yaml_body))


COMPILE_CASES = [
    ("simple_stream_table_variable", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: public.{stream_table}_copy
streams:
  public.users:
""", [("public.users", "public.users_copy")]),
    ("stream_schema_and_table", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: backup.{stream_schema}_{stream_table}
streams:
  public.customers:
""", [("public.customers", "backup.public_customers")]),
    ("case_transformation_upper", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: "{stream_schema_upper}.{stream_table_upper}"
streams:
  public.orders:
""", [("public.orders", "PUBLIC.ORDERS")]),
    ("case_transformation_lower", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: "{stream_schema_lower}.{stream_table_lower}"
streams:
  PUBLIC.PRODUCTS:
""", [("PUBLIC.PRODUCTS", "public.products")]),
    ("multiple_streams", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: backup.{stream_table}
streams:
  public.users:
  public.orders:
  public.products:
""", [("public.users", "backup.users"),
      ("public.orders", "backup.orders"),
      ("public.products", "backup.products")]),
    ("select_columns", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: public.{stream_table}_subset
streams:
  public.users:
    select: [id, email, created_at]
""", [("public.users", "public.users_subset")]),
    ("where_clause", """
source: postgres
target: postgres
defaults:
  mode: full-refresh
  object: public.{stream_table}_filtered
streams:
  public.logs:
    where: "created_at > '2024-01-01'"
""", [("public.logs", "public.logs_filtered")]),
]


@pytest.mark.parametrize("name,yaml_body,expected", COMPILE_CASES,
                         ids=[c[0] for c in COMPILE_CASES])
def test_replication_compile_objects(name, yaml_body, expected):
    cfgs = _compile(yaml_body)
    got = [(c.source.stream, c.target.object) for c in cfgs]
    for pair in expected:
        assert pair in got
    assert len(got) == len(expected)


def test_replication_compile_sql_stream():
    cfgs = _compile("""
source: postgres
target: postgres
streams:
  analytics_summary:
    sql: SELECT * FROM public.analytics WHERE year = 2024
    object: public.analytics_2024
""")
    assert len(cfgs) == 1
    # reference: Source.Query carries the SQL; the stream keeps its name
    assert cfgs[0].target.object == "public.analytics_2024"
    sql = (getattr(cfgs[0].source, "query", None)
           or cfgs[0].source.stream)
    assert "SELECT * FROM public.analytics" in sql


def test_replication_defaults_parse_and_flatten():
    # TestReplicationConfig (:14): defaults.source_options.flatten
    rc = ReplicationConfig.from_yaml("""
source: BIGQUERY
target: AWS_S3
defaults:
  object: s3://bkt/{stream_schema}/{stream_table}/{run_timestamp}.csv
  mode: full-refresh
  source_options:
    flatten: true
streams:
  public.users:
""")
    cfgs = __import__(
        "sling_cli_spark.plans.replication",
        fromlist=["compile_replication"]).compile_replication(rc)
    assert cfgs[0].source.options.flatten is True
    obj = cfgs[0].target.object
    assert obj.startswith("s3://bkt/public/users/")
    assert obj.endswith(".csv")


def test_runtime_vars_file_stream_extension_handling():
    # config.go:1185-1240 — stream_file_name excludes the extension,
    # csv.gz collapses to ext "csv_gz"
    from sling_cli_spark.config import Config, runtime_vars

    cfg = Config.from_dict({
        "source": {"stream": "/data/in/events.csv.gz"},
        "target": {"object": "/out/x"}, "mode": "full-refresh"})
    v = runtime_vars(cfg)
    assert v["stream_file_name"] == "events"
    assert v["stream_file_ext"] == "csv_gz"
    assert v["stream_file_folder"] == "in"
    assert v["stream_file_path"] == "data/in/events.csv.gz"


def test_runtime_vars_object_side_names():
    from sling_cli_spark.config import Config, runtime_vars

    cfg = Config.from_dict({
        "source": {"stream": "public.users"},
        "target": {"object": "backup.users_copy"},
        "mode": "full-refresh"})
    v = runtime_vars(cfg)
    assert v["object_schema"] == "backup"
    assert v["object_table"] == "users_copy"
    assert v["object_full_name"] == "backup.users_copy"
    assert v["target_table"] == "users_copy"
    assert v["stream_full_name"] == "public.users"
