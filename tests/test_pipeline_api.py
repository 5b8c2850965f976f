"""Pipeline steps, schema evolution, FK discovery, API source."""

import os

import pytest
from pyspark.sql import Row

from sling_cli_spark.operators.evolution import reconcile_schemas
from sling_cli_spark.operators.profile import discover_fks, fk_order
from sling_cli_spark.plans.pipeline import StepError, run_pipeline
from sling_cli_spark.sources.api import iter_records, read_api


# --- pipeline steps -----------------------------------------------------

def test_pipeline_log_query_check(spark):
    out = run_pipeline(spark, [
        {"type": "log", "message": "hello {who}", "id": "greet"},
        {"type": "query", "sql": "SELECT 1 AS one"},
        {"type": "check", "expr": "rows > 0", "vars": {"rows": 5}},
    ], env={"who": "world"})
    assert out[0] == "hello world"
    assert out[1] == [{"one": 1}]
    assert out[2] is True


def test_pipeline_check_fails(spark):
    with pytest.raises(StepError):
        run_pipeline(spark, [
            {"type": "check", "expr": "rows > 10", "vars": {"rows": 5}}])


def test_pipeline_on_failure_continue(spark):
    out = run_pipeline(spark, [
        {"type": "check", "expr": "false", "on_failure": "continue"},
        {"type": "log", "message": "still here"},
    ])
    assert out == [None, "still here"]


def test_pipeline_copy_inspect_delete(spark, tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("data")
    dst = tmp_path / "b.txt"
    out = run_pipeline(spark, [
        {"type": "copy", "from": str(src), "to": str(dst)},
        {"type": "inspect", "path": str(dst)},
        {"type": "delete", "path": str(dst)},
    ])
    assert out[1]["exists"] and out[1]["files"] == 1
    assert not dst.exists()


# --- schema evolution ---------------------------------------------------

def test_reconcile_add_new_column(spark):
    t = spark.createDataFrame([Row(id=1, v="a")])
    s = spark.createDataFrame([Row(id=2, v="b", extra=1)])
    t2, s2 = reconcile_schemas(t, s, add_new_columns=True)
    assert "extra" in s2.columns
    t2, s2 = reconcile_schemas(t, s, add_new_columns=False)
    assert "extra" not in s2.columns


def test_reconcile_cast_to_target_type(spark):
    t = spark.createDataFrame([Row(id=1, v=10)])
    s = spark.createDataFrame([Row(id=2, v="20")])
    _, s2 = reconcile_schemas(t, s, adjust_column_type=False)
    assert dict(s2.dtypes)["v"] == "bigint"
    assert s2.collect()[0]["v"] == 20


def test_reconcile_widen_types(spark):
    t = spark.createDataFrame([Row(id=1, v=10)])
    s = spark.createDataFrame([Row(id=2, v=1.5)])
    t2, s2 = reconcile_schemas(t, s, adjust_column_type=True)
    # int vs double widens to a common numeric type on both sides
    assert dict(t2.dtypes)["v"] == dict(s2.dtypes)["v"]
    assert dict(s2.dtypes)["v"] != "bigint"


def test_reconcile_bad_value_degrades_to_null(spark):
    t = spark.createDataFrame([Row(id=1, v=10)])
    s = spark.createDataFrame([Row(id=2, v="oops")])
    _, s2 = reconcile_schemas(t, s)
    assert s2.collect()[0]["v"] is None


# --- FK discovery -------------------------------------------------------

def test_discover_fks_on_star_schema(spark, sf_dir):
    tables = {
        "orders": spark.read.parquet(os.path.join(sf_dir, "orders.parquet")),
        "customer": spark.read.parquet(
            os.path.join(sf_dir, "customer.parquet")),
    }
    fks = discover_fks(tables)
    assert any(fk["table"] == "orders" and fk["ref_table"] == "customer"
               and fk["column"] == "o_custkey" for fk in fks)


def test_fk_order_topological():
    fks = [{"table": "orders", "column": "o_custkey",
            "ref_table": "customer", "ref_column": "c_custkey"},
           {"table": "lineitem", "column": "l_orderkey",
            "ref_table": "orders", "ref_column": "o_orderkey"}]
    order = fk_order(fks, ["lineitem", "orders", "customer"])
    assert order.index("customer") < order.index("orders") < \
        order.index("lineitem")


# --- API source ---------------------------------------------------------

def _fake_transport(pages):
    calls = []

    def transport(url, params, headers):
        calls.append(dict(params))
        page = int(params.get("offset", 0)) // int(params.get("limit", 2)) \
            if "offset" in params else len(calls) - 1
        if page < len(pages):
            return 200, pages[page]
        return 200, {"items": []}

    transport.calls = calls
    return transport


def test_api_offset_pagination():
    pages = [
        {"items": [{"id": 1}, {"id": 2}]},
        {"items": [{"id": 3}]},
    ]
    t = _fake_transport(pages)
    spec = {"url": "http://x/api", "records_path": "items",
            "pagination": {"type": "offset", "page_size": 2}}
    recs = list(iter_records(spec, t))
    assert [r["id"] for r in recs] == [1, 2, 3]


def test_api_cursor_pagination():
    pages = {
        None: {"data": [{"id": 1}], "next": "c1"},
        "c1": {"data": [{"id": 2}], "next": None},
    }

    def t(url, params, headers):
        return 200, pages[params.get("cursor")]

    spec = {"url": "http://x", "records_path": "data",
            "pagination": {"type": "cursor", "cursor_path": "next"}}
    assert [r["id"] for r in list(iter_records(spec, t))] == [1, 2]


def test_api_error_raises():
    def t(url, params, headers):
        return 500, {}

    with pytest.raises(RuntimeError):
        list(iter_records({"url": "http://x"}, t))


def test_read_api_dataframe(spark):
    def t(url, params, headers):
        return 200, {"items": [{"id": 1, "meta": {"k": "a"}},
                               {"id": 2, "meta": {"k": "b"}}]}

    df = read_api(spark, {"url": "http://x", "records_path": "items"}, t)
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    assert "meta__k" in df.columns  # nested objects flattened


def test_api_processors(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=5.0), Row(id=2, v=9.0), Row(id=3, v=2.0)])
    from sling_cli_spark.sources.api import apply_processors

    state = apply_processors(df, [
        {"expression": "id", "aggregation": "maximum", "output": "max_id"},
        {"expression": "v", "aggregation": "minimum", "output": "min_v"},
        {"expression": "id", "aggregation": "collect", "output": "ids"},
    ])
    assert state["max_id"] == 3 and state["min_v"] == 2.0
    assert sorted(state["ids"]) == [1, 2, 3]


def test_load_pipeline_yaml(tmp_path):
    from sling_cli_spark.plans.pipeline import load_pipeline

    p = tmp_path / "p.yaml"
    p.write_text("steps:\n  - type: log\n    message: hi\n  - type: check\n"
                 "    expr: 1 = 1\n")
    steps = load_pipeline(str(p))
    assert [s["type"] for s in steps] == ["log", "check"]


def test_pipeline_expression_rendering(spark):
    """Steps render `{ expr }` spans over env/state namespaces
    (reference: every hook payload goes through the Evaluator)."""
    out = run_pipeline(spark, [
        {"type": "query", "sql": "SELECT 21 AS n", "id": "probe"},
        {"type": "log", "id": "msg",
         "message": 'n is { jmespath(state.probe, "[0].n") }, '
                    'env says {coalesce(env.MISSING, "fallback")}'},
        {"type": "check", "expr": "{ length(state.probe) } > 0"},
    ], env={})
    assert out[1] == "n is 21, env says fallback"
    assert out[2] is True


def test_discover_fks_batches_uniqueness_probes(spark, sf_dir, monkeypatch):
    """One uniqueness aggregate per referenced table (not per pair)."""
    import sling_cli_spark.operators.profile as prof

    calls = []
    real = prof._unique_cols

    def counting(df, cols):
        calls.append(tuple(cols))
        return real(df, cols)

    monkeypatch.setattr(prof, "_unique_cols", counting)
    tables = {
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "nation": spark.read.parquet(f"{sf_dir}/nation.parquet"),
    }
    fks = prof.discover_fks(tables)
    # one probe call per table that has candidate referenced columns
    assert len(calls) <= len(tables)
    pairs = {(f["table"], f["column"], f["ref_table"]) for f in fks}
    assert ("orders", "o_custkey", "customer") in pairs
    assert ("customer", "c_nationkey", "nation") in pairs


def test_pipeline_http_and_command_steps(spark):
    def fake_transport(url, params, headers):
        return 200, {"rows": 7, "url": url}

    out = run_pipeline(spark, [
        {"type": "http", "id": "probe", "url": "https://x/health",
         "transport": fake_transport},
        {"type": "check", "expr": "{ state.probe.json.rows } > 0"},
        {"type": "command", "id": "ver",
         "command": ["python", "-c", "print('ok-{who}')"]},
    ], env={"who": "world"})
    assert out[0] == {"status": 200, "json": {"rows": 7, "url": "https://x/health"}}
    assert out[1] is True
    assert out[2]["returncode"] == 0 and out[2]["stdout"] == "ok-world"


def test_pipeline_http_step_bad_status(spark):
    with pytest.raises(StepError, match="503"):
        run_pipeline(spark, [
            {"type": "http", "url": "https://x/down",
             "transport": lambda *a: (503, {})}])


def test_pipeline_command_step_failure(spark):
    with pytest.raises(StepError, match="exited 3"):
        run_pipeline(spark, [
            {"type": "command",
             "command": ["python", "-c", "import sys; sys.exit(3)"]}])


def test_field_stat_approx_mode(spark, sf_dir):
    from sling_cli_spark.operators.profile import field_stat

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = field_stat(df, ["o_orderkey"]).collect()[0]
    approx = field_stat(df, ["o_orderkey"], approx=True).collect()[0]
    assert exact["uniq_cnt"] == exact["total_cnt"]
    # HLL default rsd is 5%; allow 3 sigma
    assert abs(approx["uniq_cnt"] - exact["uniq_cnt"]) <= exact["uniq_cnt"] * 0.15


def test_field_stat_len(spark):
    from sling_cli_spark.operators.profile import field_stat_len

    df = spark.createDataFrame(
        [("a", "xx"), ("bbb", None), ("cc", "yyyy")], "s string, t string")
    got = {r["field"]: r for r in field_stat_len(df).collect()}
    assert set(got) == {"s", "t"}  # defaults to string columns
    assert (got["s"]["f_min_len"], got["s"]["f_max_len"]) == (1, 3)
    assert (got["t"]["f_min_len"], got["t"]["f_max_len"]) == (2, 4)
    assert got["s"]["tot_cnt"] == 3


def test_distro_field_group(spark):
    from sling_cli_spark.operators.profile import distro_field_group

    df = spark.createDataFrame(
        [("O", "HI"), ("O", "HI"), ("O", "LO"), ("F", "HI")],
        "st string, pr string")
    rows = {(r["group_exp"], r["value"]): (r["cnt"], r["prct"])
            for r in distro_field_group(df, "pr", "st").collect()}
    assert rows[("O", "HI")] == (2, 50.0)
    assert rows[("O", "LO")] == (1, 25.0)
    assert rows[("F", "HI")] == (1, 25.0)
    # top_k keeps the most frequent buckets only
    top = distro_field_group(df, "pr", "st", top_k=1).collect()
    assert len(top) == 1 and top[0]["cnt"] == 2


def test_distro_field_date(spark):
    import datetime

    from sling_cli_spark.operators.profile import distro_field_date

    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 5),), (datetime.date(2024, 1, 9),),
         (datetime.date(2024, 3, 1),), (datetime.date(2025, 1, 1),)],
        "d date")
    rows = {(r["year"], r["month"]): (r["cnt"], r["prct"])
            for r in distro_field_date(df, "d").collect()}
    assert rows[(2024, 1)] == (2, 50.0)
    assert rows[(2024, 3)] == (1, 25.0)
    assert rows[(2025, 1)] == (1, 25.0)


def test_distro_field_date_wide(spark):
    import datetime

    from sling_cli_spark.operators.profile import distro_field_date_wide

    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 5), 10.0), (datetime.date(2024, 1, 9), 30.0),
         (datetime.date(2024, 3, 1), 5.0)], "d date, amt double")
    rows = {(r["year"], r["month"]): r
            for r in distro_field_date_wide(df, "d", ["amt"]).collect()}
    r = rows[(2024, 1)]
    assert (r["cnt"], r["sum_amt"], r["min_amt"], r["max_amt"]) \
        == (2, 40.0, 10.0, 30.0)
    assert rows[(2024, 3)]["cnt"] == 1
    assert r["date_field"] == "d"


def test_percentile_stat_exact_order_statistics(spark):
    from sling_cli_spark.operators.profile import percentile_stat

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "x double")
    out = {(r["field"], r["prob"]): r["value"]
           for r in percentile_stat(df, ["x"]).collect()}
    assert out[("x", 0.0)] == 1.0 and out[("x", 1.0)] == 100.0
    assert out[("x", 0.5)] == 50.5  # linear interpolation, exact
    assert out[("x", 0.25)] == 25.75
    assert len(out) == 6
