"""Replication compile + wildcard expansion + state store + constraints
+ JDBC option building (reference: core/sling/replication.go,
task_func.go state, datatype.go constraints)."""

import os

from pyspark.sql import Row

from sling_cli_spark.config import Config, Mode, Source, SourceOptions, Target
from sling_cli_spark.operators.constraints import (
    check_constraints, constraint_violations, constraints_report)
from sling_cli_spark.plans.replication import (
    ReplicationConfig, compile_replication, expand_wildcards,
    run_replication)
from sling_cli_spark.sources.jdbc import (
    build_read_options, build_write_options)
from sling_cli_spark.state import StateStore


def test_expand_wildcards(tmp_path):
    for n in ("a.csv", "b.csv", "c.json"):
        (tmp_path / n).write_text("x\n1\n")
    out = expand_wildcards({str(tmp_path / "*.csv"): {"mode": "incremental"}})
    assert len(out) == 2
    assert all(v == {"mode": "incremental"} for v in out.values())


def test_expand_non_glob_passthrough():
    out = expand_wildcards({"/data/x.csv": None})
    assert out == {"/data/x.csv": {}}


REPL_YAML = """
source: local
target: local
defaults:
  mode: full-refresh
  target_options: {format: parquet}
streams:
  BASE/orders.parquet: {}
  BASE/nation.parquet:
    mode: incremental
    update_key: n_nationkey
    target_options: {compression: snappy}
  BASE/region.parquet: {disabled: true}
"""


def test_compile_replication(sf_dir):
    rc = ReplicationConfig.from_yaml(REPL_YAML.replace("BASE", sf_dir))
    cfgs = compile_replication(rc)
    assert len(cfgs) == 2  # disabled stream dropped
    by_stream = {os.path.basename(c.source.stream): c for c in cfgs}
    assert by_stream["orders.parquet"].mode == Mode.FULL_REFRESH
    nat = by_stream["nation.parquet"]
    assert nat.mode == Mode.INCREMENTAL and nat.source.update_key == "n_nationkey"
    # defaults merged under stream override
    assert nat.target.options.format == "parquet"
    assert nat.target.options.compression == "snappy"
    # runtime vars rendered into the target object
    assert nat.target.object == "nation.parquet"


def test_run_replication_moves_tables(spark, sf_dir, tmp_path):
    rc = ReplicationConfig.from_yaml(REPL_YAML.replace("BASE", sf_dir))
    results = run_replication(spark, rc, base_output=str(tmp_path))
    assert len(results) == 2
    out = spark.read.parquet(str(tmp_path / "orders.parquet"))
    assert out.count() == results[os.path.join(sf_dir, "orders.parquet")].rows
    assert out.count() > 0


def test_state_store_roundtrip(tmp_path):
    st = StateStore(str(tmp_path / "state.json"))
    assert st.get("s1") is None
    st.set("s1", 42)
    st.set("s2", "2024-01-01")
    assert st.get("s1") == 42 and st.get("s2") == "2024-01-01"
    st.clear("s1")
    assert st.get("s1") is None and st.get("s2") == "2024-01-01"


def test_state_store_datetime(tmp_path):
    import datetime

    st = StateStore(str(tmp_path / "state.json"))
    ts = datetime.datetime(2024, 5, 1, 12, 30)
    st.set("s", ts)
    assert StateStore(st.path).get("s") == ts


def _cdf(spark):
    return spark.createDataFrame(
        [Row(id=1, qty=5), Row(id=2, qty=-1), Row(id=3, qty=0),
         Row(id=None, qty=None)])


def test_constraint_violations(spark):
    out = constraint_violations(
        _cdf(spark), {"qty": "value >= 0", "id": "value is not null"})
    assert out == {"qty": 1, "id": 1}


def test_constraints_report_df(spark):
    rows = {r["field"]: r["violations"]
            for r in constraints_report(
                _cdf(spark), {"qty": "value >= 0"}).collect()}
    assert rows == {"qty": 1}


def test_check_constraints_drop(spark):
    df, obs = check_constraints(
        _cdf(spark), {"qty": "value >= 0"}, drop_failures=True)
    assert df.count() == 3  # qty=-1 dropped; nulls pass
    assert obs.get["violations_qty"] == 1


def test_jdbc_read_options_chunked():
    src = Source(stream="public.orders", update_key="o_orderkey",
                 options=SourceOptions(chunk_count=8))
    opts = build_read_options("jdbc:postgresql://h/db", src, bounds=(1, 1000))
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "8"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "1000"


def test_jdbc_read_options_chunk_size():
    src = Source(stream="t", update_key="k",
                 options=SourceOptions(chunk_size="100"))
    opts = build_read_options("jdbc:x", src, bounds=(0, 999))
    assert opts["numPartitions"] == "10"


def test_jdbc_sql_stream_becomes_subquery():
    src = Source(stream="SELECT a, b FROM t WHERE a > 5")
    opts = build_read_options("jdbc:x", src)
    assert opts["dbtable"].startswith("(SELECT")


def test_jdbc_write_options_truncate():
    t = Target(object="public.out")
    opts = build_write_options("jdbc:x", t, Mode.TRUNCATE)
    assert opts["truncate"] == "true" and opts["batchsize"] == "2000"


def test_run_with_state_incremental(spark, tmp_path):
    from sling_cli_spark.runner import run_with_state
    from sling_cli_spark.state import StateStore

    src = tmp_path / "in.csv"
    src.write_text("id,v\n" + "".join(f"{i},{i}\n" for i in range(20)))
    out1 = str(tmp_path / "out1.parquet")
    st = StateStore(str(tmp_path / "state.json"))

    cfg = Config.from_dict({
        "source": {"stream": str(src), "update_key": "id"},
        "target": {"object": out1},
        "mode": "incremental"})
    r1 = run_with_state(spark, cfg, st)
    assert r1.rows == 20
    assert st.get(str(src)) == 19  # watermark advanced

    # second run: only rows past the stored watermark move
    src.write_text("id,v\n" + "".join(f"{i},{i}\n" for i in range(25)))
    cfg2 = Config.from_dict({
        "source": {"stream": str(src), "update_key": "id"},
        "target": {"object": str(tmp_path / "out2.parquet")},
        "mode": "incremental"})
    r2 = run_with_state(spark, cfg2, st)
    assert r2.rows == 5
    assert st.get(str(src)) == 24


def test_api_retry_on_5xx():
    from sling_cli_spark.sources.api import iter_records

    calls = []

    def flaky(url, params, headers):
        calls.append(1)
        if len(calls) < 3:
            return 503, {}
        return 200, {"items": [{"id": 1}]}

    recs = list(iter_records(
        {"url": "http://x", "records_path": "items", "retries": 3}, flaky))
    assert [r["id"] for r in recs] == [1]
    assert len(calls) == 3


def test_replication_hooks_run_in_order(spark, tmp_path, sf_dir):
    """Replication-level hooks: start / pre / post / end around streams
    (reference HookMap, hooks.go:49-56)."""
    from sling_cli_spark.plans.replication import (
        ReplicationConfig, run_replication)

    marker = tmp_path / "hooklog"
    yaml_text = f"""
source: local
target: local
hooks:
  start:
    - type: command
      command: [python, -c, 'open("{marker}", "a").write("start" + chr(10))']
  pre:
    - type: command
      command: [python, -c, 'open("{marker}", "a").write("pre {{stream_name}}" + chr(10))']
  post:
    - type: command
      command: [python, -c, 'open("{marker}", "a").write("post {{rows}}" + chr(10))']
  end:
    - type: command
      command: [python, -c, 'open("{marker}", "a").write("end" + chr(10))']
streams:
  {sf_dir}/region.parquet:
    object: "{tmp_path}/out/region.parquet"
"""
    res = run_replication(
        spark, ReplicationConfig.from_yaml(yaml_text))
    assert list(res.values())[0].rows == 5
    lines = marker.read_text().strip().split("\n")
    assert lines[0] == "start" and lines[-1] == "end"
    assert lines[1].startswith("pre ") and "region.parquet" in lines[1]
    assert lines[2] == "post 5"


def test_expand_db_wildcards_via_duckdb_catalog():
    """DB `schema.*` expansion (replication.go:293-518): the dialect's
    metadata SQL runs on the source DB; DuckDB is the in-process twin."""
    import duckdb

    from sling_cli_spark.plans.replication import expand_db_wildcards

    con = duckdb.connect()
    con.execute("""
        create schema fin;
        create table fin.accounts(id int);
        create table fin.act_log(id int);
        create table fin.users(id int);
        create view fin.v_users as select * from fin.users;
    """)

    def run_sql(sql):
        return con.execute(sql).fetchall()

    out = expand_db_wildcards(
        {"fin.*": {"mode": "incremental"}}, run_sql, "duckdb")
    assert set(out) == {"fin.accounts", "fin.act_log", "fin.users"}
    assert all(v == {"mode": "incremental"} for v in out.values())
    # prefix patterns narrow the fan-out
    out2 = expand_db_wildcards({"fin.ac*": {}}, run_sql, "duckdb")
    assert set(out2) == {"fin.accounts", "fin.act_log"}
    # non-patterns and no_expand pass through
    out3 = expand_db_wildcards(
        {"fin.users": {"k": 1}, "fin.x*": {"no_expand": True}},
        run_sql, "duckdb")
    assert out3 == {"fin.users": {"k": 1}, "fin.x*": {"no_expand": True}}


def test_metadata_sql_renders_for_all_dialects():
    from sling_cli_spark.dialects import dialect_names, get_dialect

    for name in dialect_names():
        d = get_dialect(name)
        for key, kw in (("schemas", {}), ("tables", {"schema": "s"}),
                        ("views", {"schema": "s"}),
                        ("columns", {"schema": "s", "table": "t"})):
            sql = d.metadata_sql(key, **kw)
            assert "{" not in sql and "}" not in sql, (name, key)


def test_atomic_replication_all_or_nothing(spark, sf_dir, tmp_path):
    """r10: `atomic: true` — every stream's catalog pointer commit
    defers to ONE commit_many; a failing later stream withdraws the
    earlier streams' staged commits (pointers AND table storage)."""
    import pytest as _pytest

    from sling_cli_spark.sources.iceberg_catalog import (
        SqlCatalog, read_table)

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    cat = SqlCatalog(db, warehouse=wh)
    cat.create_namespace("db")
    url = f"db={db}&warehouse={wh}"
    yaml_ok = f"""
source: LOCAL
target: CAT
atomic: true
streams:
  {sf_dir}/nation.parquet:
    object: catalog://db.nation?{url}
  {sf_dir}/region.parquet:
    object: catalog://db.region?{url}
"""
    rc = ReplicationConfig.from_yaml(yaml_ok)
    assert rc.atomic
    results = run_replication(spark, rc)
    assert len(results) == 2
    assert read_table(cat, spark, "db.nation").count() == 25
    assert read_table(cat, spark, "db.region").count() == 5
    n_ml = cat.load_table("db.nation")

    # second stream fails -> the first stream's append must NOT land
    yaml_bad = f"""
source: LOCAL
target: CAT
atomic: true
streams:
  {sf_dir}/nation.parquet:
    object: catalog://db.nation?{url}
    mode: incremental
  {tmp_path}/nope.parquet:
    object: catalog://db.broken?{url}
"""
    with _pytest.raises(Exception):
        run_replication(spark, ReplicationConfig.from_yaml(yaml_bad))
    assert cat.load_table("db.nation") == n_ml  # pointer unmoved
    assert read_table(cat, spark, "db.nation").count() == 25

    # non-catalog target refuses loudly instead of silently
    # committing stream-by-stream
    yaml_mixed = f"""
source: LOCAL
target: CAT
atomic: true
streams:
  {sf_dir}/region.parquet:
    object: {tmp_path}/plain.parquet
"""
    with _pytest.raises(ValueError, match="catalog://"):
        run_replication(spark,
                        ReplicationConfig.from_yaml(yaml_mixed))


def test_atomic_replication_post_hooks_report_committed_state(
        spark, sf_dir, tmp_path):
    """r11 advice fix: in an atomic replication, per-stream 'post'
    hooks report rows LANDED — they must fire only after the deferred
    commit_many moves the pointers. A failing later stream therefore
    suppresses every post hook; a successful transaction fires them
    all (after the with-block, in stream order)."""
    import pytest as _pytest

    from sling_cli_spark.sources.iceberg_catalog import SqlCatalog

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    SqlCatalog(db, warehouse=wh).create_namespace("db")
    url = f"db={db}&warehouse={wh}"
    marker = tmp_path / "hooklog"
    hooks = f"""
hooks:
  post:
    - type: command
      command: [python, -c, 'open("{marker}", "a").write("post {{stream_name}} {{rows}}" + chr(10))']
"""
    yaml_bad = f"""
source: LOCAL
target: CAT
atomic: true
{hooks}
streams:
  {sf_dir}/nation.parquet:
    object: catalog://db.nation?{url}
  {tmp_path}/nope.parquet:
    object: catalog://db.broken?{url}
"""
    with _pytest.raises(Exception):
        run_replication(spark, ReplicationConfig.from_yaml(yaml_bad))
    assert not marker.exists(), \
        "post hook fired for a stream whose commit never landed"

    yaml_ok = f"""
source: LOCAL
target: CAT
atomic: true
{hooks}
streams:
  {sf_dir}/nation.parquet:
    object: catalog://db.nation?{url}
  {sf_dir}/region.parquet:
    object: catalog://db.region?{url}
"""
    run_replication(spark, ReplicationConfig.from_yaml(yaml_ok))
    lines = marker.read_text().strip().split("\n")
    assert len(lines) == 2
    assert "nation.parquet" in lines[0] and lines[0].endswith(" 25")
    assert "region.parquet" in lines[1] and lines[1].endswith(" 5")


def test_incremental_by_lineage_el(spark, sf_dir, tmp_path):
    """r11: source.options.incremental_by_lineage — state-backed EL
    consumption of a v3 iceberg table by ROW LINEAGE (and the Delta
    row-tracking twin): run 1 loads everything and records the lineage
    watermark; after a merge + append, run 2 moves ONLY the updated +
    inserted rows; a no-change run 3 moves nothing."""
    from pyspark.sql import functions as F

    from sling_cli_spark.runner import run_with_state
    from sling_cli_spark.sources.delta_py import (
        set_table_properties, write_delta)
    from sling_cli_spark.sources.iceberg_py import (
        merge_iceberg, write_iceberg)

    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name", F.col("n_regionkey").cast("long").alias("n_regionkey"))

    # --- iceberg v3 ---
    t = str(tmp_path / "ice")
    write_iceberg(n.coalesce(1), t, format_version=3)
    store = StateStore(str(tmp_path / "state.json"))
    cfg = Config.from_dict({
        "source": {"stream": t,
                   "options": {"incremental_by_lineage": True}},
        "target": {"object": str(tmp_path / "out_ice.parquet")},
        "mode": "incremental"})
    r1 = run_with_state(spark, cfg, store)
    assert r1.rows == 25 and r1.watermark is not None
    merge_iceberg(
        spark, t,
        n.filter("n_nationkey < 3")
        .withColumn("n_name", F.concat("n_name", F.lit("_u"))),
        "n_nationkey", use_dvs=False)
    write_iceberg(spark.createDataFrame(
        [(90, "NEW", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
        .coalesce(1), t, mode="append")
    cfg.target.object = str(tmp_path / "out_ice2.parquet")
    r2 = run_with_state(spark, cfg, store)
    assert r2.rows == 4  # 3 updated + 1 inserted
    got = spark.read.parquet(cfg.target.object)
    assert {r.n_nationkey for r in got.collect()} == {0, 1, 2, 90}
    assert "_row_id" in got.columns
    cfg.target.object = str(tmp_path / "out_ice3.parquet")
    assert run_with_state(spark, cfg, store).rows == 0

    # --- delta row-tracking twin ---
    td = str(tmp_path / "dl")
    write_delta(n.coalesce(1), td)
    set_table_properties(td, {"delta.enableRowTracking": "true"})
    cfg_d = Config.from_dict({
        "source": {"stream": td,
                   "options": {"incremental_by_lineage": True}},
        "target": {"object": str(tmp_path / "out_dl.parquet")},
        "mode": "incremental"})
    r1 = run_with_state(spark, cfg_d, store)
    assert r1.rows == 25
    write_delta(spark.createDataFrame(
        [(91, "NEWD", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
        .coalesce(1), td, mode="append")
    cfg_d.target.object = str(tmp_path / "out_dl2.parquet")
    r2 = run_with_state(spark, cfg_d, store)
    assert r2.rows == 1
    assert spark.read.parquet(cfg_d.target.object) \
        .collect()[0].n_nationkey == 91
