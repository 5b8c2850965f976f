"""CLI surface (__main__.py): run / conns / pipeline — the reference's
``sling`` command twins (cmd/sling/sling_cli.go:45-238)."""

import io
import json
import os
import sys

import pytest

from sling_cli_spark.__main__ import (
    build_parser, cmd_conns, load_connections, main, resolve_conn,
    save_connections,
)


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("SLING_HOME_DIR", str(tmp_path / "slinghome"))
    return tmp_path


def test_conns_set_list_test(home, capsys):
    assert main(["conns", "set", "LANDING", "type=local",
                 f"url={home}"]) == 0
    assert main(["conns", "list"]) == 0
    out = capsys.readouterr().out
    assert "LANDING" in out and "local" in out
    assert load_connections()["LANDING"]["url"] == str(home)
    assert main(["conns", "test", "LANDING"]) == 0
    # output contract matches the reference ("success!", suite.cli 28)
    assert "success!" in capsys.readouterr().out
    # unknown connection
    assert main(["conns", "test", "NOPE"]) == 1


def test_resolve_conn_prefixes_file_paths(home):
    save_connections({"L": {"type": "local", "url": str(home / "data")}})
    s, jdbc = resolve_conn("L", "in.csv")
    assert s == str(home / "data" / "in.csv") and jdbc is None
    # absolute paths pass through untouched
    s2, _ = resolve_conn("L", "/abs/x.csv")
    assert s2 == "/abs/x.csv"


def test_resolve_conn_jdbc_passthrough(home):
    save_connections({"PG": {"type": "postgres",
                             "url": "jdbc:postgresql://h/db"}})
    s, jdbc = resolve_conn("PG", "public.users")
    assert s == "public.users" and jdbc == "jdbc:postgresql://h/db"


def test_run_full_refresh_via_cli(home, spark):
    src = home / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n")
    tgt = str(home / "out.parquet")
    rc = main(["run", "--src-stream", str(src), "--tgt-object", tgt,
               "--mode", "full-refresh"])
    assert rc == 0
    got = {r["id"] for r in spark.read.parquet(tgt).collect()}
    assert got == {1, 2}


def test_run_stdout_streams_csv(home, spark, capsys):
    src = home / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n3,c\n")
    rc = main(["run", "--src-stream", str(src), "--stdout",
               "--select", "id", "--where", "id > 1"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "id" and set(out[1:]) == {"2", "3"}


def test_run_replication_via_cli(home, spark, capsys):
    (home / "a.csv").write_text("id,v\n1,a\n")
    (home / "b.csv").write_text("id,v\n2,b\n")
    repl = home / "repl.yaml"
    repl.write_text(f"""
source: local
target: local
defaults:
  mode: full-refresh
streams:
  {home}/a.csv:
    object: {home}/out_a.parquet
  {home}/b.csv:
    object: {home}/out_b.parquet
""")
    assert main(["run", "-r", str(repl)]) == 0
    assert spark.read.parquet(str(home / "out_a.parquet")).count() == 1
    assert spark.read.parquet(str(home / "out_b.parquet")).count() == 1


def test_run_requires_stream(home, capsys):
    assert main(["run"]) == 2


def test_parser_rejects_bad_mode(home):
    with pytest.raises(SystemExit):
        build_parser().parse_args(["run", "--mode", "bogus"])


def test_conns_discover_files(home, capsys):
    d = home / "landing"
    d.mkdir()
    (d / "a.csv").write_text("x\n1\n")
    (d / "b.parquet").write_text("")
    (d / "c.csv").write_text("x\n2\n")
    save_connections({"L": {"type": "local", "url": str(d)}})
    assert main(["conns", "discover", "L"]) == 0
    assert capsys.readouterr().out.split() == ["a.csv", "b.parquet", "c.csv"]
    assert main(["conns", "discover", "L", "--pattern", "*.csv"]) == 0
    assert capsys.readouterr().out.split() == ["a.csv", "c.csv"]
    assert main(["conns", "discover", "NOPE"]) == 1


def test_conns_discover_db_renders_catalog_sql(home, capsys):
    save_connections({"PG": {"type": "postgres",
                             "url": "jdbc:postgresql://h/db"}})
    assert main(["conns", "discover", "PG", "--pattern", "fin"]) == 0
    out = capsys.readouterr().out
    assert "information_schema.tables" in out and "fin" in out


def test_pipeline_via_cli(home, spark, capsys, tmp_path):
    src = home / "p.csv"
    src.write_text("id,v\n1,a\n")
    repl = home / "repl.yaml"
    repl.write_text(f"""
defaults:
  mode: full-refresh
streams:
  {src}:
    object: {home}/p_out.parquet
""")
    pipe = home / "pipe.yaml"
    pipe.write_text(f"""
steps:
  - type: log
    message: starting
  - type: replication
    id: load
    path: {repl}
""")
    rc = main(["pipeline", str(pipe)])
    assert rc == 0
    assert spark.read.parquet(str(home / "p_out.parquet")).count() == 1


def test_cli_lake_maintenance(spark, tmp_path, capsys):
    """`lake` subcommand: optimize/vacuum on Delta, expire-snapshots on
    Iceberg, `changes` streams the CDF as CSV."""
    import json as _json

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import (
        merge_delta, set_table_properties, write_delta)
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    d = str(tmp_path / "d")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), d)
    write_delta(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), d, mode="append")
    assert main(["lake", "optimize", d]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] >= 2 or out.get("new_files", 0) >= 1

    assert main(["lake", "vacuum", d]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed_files"] >= 1

    set_table_properties(d, {"delta.enableChangeDataFeed": "true"})
    stats = merge_delta(spark, d, spark.createDataFrame(
        [(1, "X")], "id long, v string"), "id")
    assert main(["lake", "changes", d,
                 "--starting-version", str(stats["version"])]) == 0
    csv = capsys.readouterr().out
    assert "update_preimage" in csv and "update_postimage" in csv

    i = str(tmp_path / "i")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), i)
    write_iceberg(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), i)
    assert main(["lake", "expire-snapshots", i, "--keep", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out  # stats dict printed

    # wrong-format guards
    assert main(["lake", "vacuum", i]) == 2
    assert main(["lake", "expire-snapshots", d]) == 2


def test_cli_lake_guards(spark, tmp_path, capsys):
    """Review fixes: not-a-table paths exit 2 with a diagnostic (never
    a traceback), cross-format start options error instead of silently
    streaming the full history, `changes` defaults to the LATEST
    commit (vacuum-safe), and trailing -d parses."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import (
        merge_delta, set_table_properties, write_delta)

    assert main(["lake", "optimize", str(tmp_path / "nope")]) == 2
    assert "not a Delta or Iceberg table" in capsys.readouterr().err

    d = str(tmp_path / "d")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").coalesce(1), d)
    set_table_properties(d, {"delta.enableChangeDataFeed": "true"})
    merge_delta(spark, d, spark.createDataFrame(
        [(2, "X")], "id long, v string"), "id")
    # wrong-format start option -> loud error
    assert main(["lake", "changes", d, "--from-snapshot", "1"]) == 2
    capsys.readouterr()
    # no start option -> the latest commit's changes only
    assert main(["lake", "changes", d]) == 0
    csv = capsys.readouterr().out
    assert "update_postimage" in csv and csv.count("insert") == 0
    # trailing -d now parses like every other subcommand
    assert main(["lake", "optimize", d, "-d"]) == 0


def test_stream_csv_stdout_chunked_constant_memory(spark, capsys):
    """_stream_csv_stdout (r8): toLocalIterator-chunked emission — one
    header, every row, correct CSV quoting across chunk boundaries, no
    toPandas of the whole result (the pre-r8 driver-memory shape)."""
    from sling_cli_spark.__main__ import _stream_csv_stdout

    df = spark.range(25).selectExpr(
        "id", "concat('x,', id) AS v")  # embedded comma forces quoting
    _stream_csv_stdout(df, chunk_rows=7)  # 4 chunks, uneven tail
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "id,v"
    assert len(out) == 26 and out.count("id,v") == 1
    assert '0,"x,0"' in out and '24,"x,24"' in out


def test_stream_csv_stdout_empty_result_prints_header(spark, capsys):
    from sling_cli_spark.__main__ import _stream_csv_stdout

    _stream_csv_stdout(spark.range(5).filter("id < 0"))
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["id"]


def test_cli_lake_refs(spark, tmp_path, capsys):
    """`lake tag/branch/drop-ref`: metadata-only ref management on an
    Iceberg table, plus `lake history` on both verbs' output shape."""
    import json as _json

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, write_iceberg)

    i = str(tmp_path / "i")
    s1 = write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string"), i)
    write_iceberg(spark.createDataFrame(
        [(2, "b")], "id long, v string"), i)

    assert main(["lake", "tag", i, "v1", "--snapshot", str(s1)]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"ref": "v1", "type": "tag", "snapshot_id": s1}
    assert main(["lake", "branch", i, "dev"]) == 0
    capsys.readouterr()
    refs = _current_metadata(i)[1]["refs"]
    assert refs["v1"]["type"] == "tag" and refs["dev"]["type"] == "branch"
    assert main(["lake", "drop-ref", i, "dev"]) == 0
    capsys.readouterr()
    assert "dev" not in _current_metadata(i)[1]["refs"]

    d = str(tmp_path / "d")
    from sling_cli_spark.sources.delta_py import write_delta
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string"), d)
    assert main(["lake", "tag", d, "x"]) == 2  # delta has no refs


def test_cli_lake_detail_and_files(spark, tmp_path, capsys):
    """`lake detail` (Delta DESCRIBE DETAIL twin) and `lake files`
    (Iceberg files metadata table) stream table facts as CSV."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import write_delta
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    d = str(tmp_path / "d")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), d)
    assert main(["lake", "detail", d]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    hdr, row = out[0].split(","), out[1]
    assert "num_files" in hdr and "min_writer_version" in hdr
    assert ",1," in row  # one file

    i = str(tmp_path / "i")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), i)
    assert main(["lake", "files", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("content,file_path")
    assert len(out) == 2 and out[1].startswith("data,")
    assert main(["lake", "files", d]) == 2
    capsys.readouterr()


def test_cli_lake_column_ddl(spark, tmp_path, capsys):
    """`lake enable-mapping / rename-column / add-column / drop-column`:
    metadata-only Delta DDL, no Spark session spun up."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    d = str(tmp_path / "d")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string"), d)
    assert main(["lake", "enable-mapping", d]) == 0
    assert main(["lake", "rename-column", d, "v", "val"]) == 0
    assert main(["lake", "add-column", d, "score", "double"]) == 0
    assert main(["lake", "drop-column", d, "score"]) == 0
    capsys.readouterr()
    assert read_delta(spark, d).columns == ["id", "val"]

    i = str(tmp_path / "i")
    from sling_cli_spark.sources.iceberg_py import write_iceberg
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string"), i)
    assert main(["lake", "rename-column", i, "v", "val"]) == 2
    capsys.readouterr()


def test_cli_lake_sync_delta(spark, tmp_path, capsys):
    import json
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    t = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, v string"), t)
    assert main(["lake", "sync-delta", t]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"delta_version": 0}
    from sling_cli_spark.sources.delta_py import read_delta
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 2}


def test_cli_lake_metadata_tables(spark, tmp_path, capsys):
    """r9: `lake snapshots / manifests / entries` stream the Iceberg
    metadata-table twins as CSV; Delta targets refuse with guidance."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import write_delta
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    i = str(tmp_path / "i")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), i)
    write_iceberg(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), i, mode="append")

    assert main(["lake", "snapshots", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("committed_at_ms,snapshot_id,parent_id")
    assert len(out) == 3  # header + 2 snapshots

    assert main(["lake", "manifests", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("content,path,length,partition_spec_id")
    assert len(out) == 3  # fast-append: 1 new + 1 reused manifest

    assert main(["lake", "entries", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("status,snapshot_id,sequence_number")
    assert len(out) == 3  # one ADDED entry per manifest

    d = str(tmp_path / "d")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), d)
    assert main(["lake", "snapshots", d]) == 2
    capsys.readouterr()


def test_cli_lake_refs_metadata_table(spark, tmp_path, capsys):
    """r9: `lake refs` streams the refs metadata-table twin — main +
    tags + branches with retention knobs."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        create_branch, create_tag, write_iceberg)

    i = str(tmp_path / "i")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), i)
    create_tag(i, "v1")
    create_branch(i, "dev")
    assert main(["lake", "refs", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("name,type,snapshot_id")
    body = {ln.split(",")[0]: ln.split(",")[1] for ln in out[1:]}
    assert body == {"main": "BRANCH", "dev": "BRANCH", "v1": "TAG"}


def test_cli_lake_checkpoint_and_cleanup_logs(spark, tmp_path, capsys):
    """r9: `lake checkpoint --v2` + `lake cleanup-logs` run the
    metadata-retention lifecycle end-to-end."""
    import os as _os

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    t = str(tmp_path / "t")
    for i in range(5):
        write_delta(spark.createDataFrame(
            [(i, "x")], "id long, v string").coalesce(1), t,
            mode="append")
    assert main(["lake", "checkpoint", t, "--v2"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["checkpointed_version"] == 5  # +1 protocol commit
    assert main(["lake", "cleanup-logs", t, "--keep", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["removed_log_files"] >= 3
    log = _os.path.join(t, "_delta_log")
    assert not any(n == f"{0:020d}.json" for n in _os.listdir(log))
    assert read_delta(spark, t).count() == 5


def test_cli_lake_compact_log(spark, tmp_path, capsys):
    """r9: `lake compact-log` writes a minor log-compaction object the
    reader substitutes for the covered per-version commits."""
    import os as _os

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    t = str(tmp_path / "t")
    for i in range(4):
        write_delta(spark.createDataFrame(
            [(i, "x")], "id long, v string").coalesce(1), t,
            mode="append")
    assert main(["lake", "compact-log", t]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["compacted_log"] == f"{0:020d}.{3:020d}.compacted.json"
    for v in range(3):
        _os.remove(_os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert read_delta(spark, t).count() == 4


def test_cli_lake_rewrite_manifests(spark, tmp_path, capsys):
    """r9: `lake rewrite-manifests` consolidates fast-append manifest
    growth into one data manifest."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import read_iceberg, write_iceberg

    t = str(tmp_path / "t")
    for i in range(3):
        write_iceberg(spark.createDataFrame(
            [(i, "x")], "id long, v string").coalesce(1), t)
    assert main(["lake", "rewrite-manifests", t]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["replaced"] == 3 and out["created"] == 1
    assert read_iceberg(spark, t).count() == 3


def test_cli_lake_all_meta_and_cherry_pick(spark, tmp_path, capsys):
    """r9: `lake all-manifests` / `lake all-files` stream the
    cross-snapshot twins; `lake cherry-pick` publishes a staged
    branch append."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        create_branch, read_iceberg, write_iceberg)

    t = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), t)
    create_branch(t, "audit")
    staged = write_iceberg(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), t, branch="audit")
    assert main(["lake", "all-manifests", t]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("content,path,length")
    assert len(out) >= 3  # main's manifest + branch's two rows
    assert main(["lake", "all-files", t]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3  # header + both files (branch incl.)
    assert main(["lake", "cherry-pick", t, str(staged)]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["published_snapshot_id"]
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == {1, 2}


def test_cli_lake_convert_and_migrate(spark, tmp_path, capsys):
    """r9: `lake convert` / `lake migrate` adopt plain parquet dirs."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import read_delta
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    p1 = str(tmp_path / "p1")
    p2 = str(tmp_path / "p2")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.coalesce(1).write.parquet(p1)
    df.coalesce(1).write.parquet(p2)
    assert main(["lake", "convert", p1]) == 0
    assert json.loads(capsys.readouterr().out)["converted"] == "delta"
    assert read_delta(spark, p1).count() == 2
    assert main(["lake", "migrate", p2]) == 0
    assert json.loads(capsys.readouterr().out)["converted"] == "iceberg"
    assert read_iceberg(spark, p2).count() == 2


def test_cli_lake_detail_iceberg_and_cleanup_metadata(spark, tmp_path,
                                                      capsys):
    """r9: `lake detail` serves Iceberg facts; `lake cleanup-logs` on
    Iceberg drops old vN.metadata.json past the retention window."""
    import os as _os

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        read_iceberg, write_iceberg)

    i = str(tmp_path / "i")
    for k in range(5):
        write_iceberg(spark.createDataFrame(
            [(k, "x")], "id long, v string").coalesce(1), i,
            mode="append")
    assert main(["lake", "detail", i]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    hdr = out[0].split(",")
    row = dict(zip(hdr, out[1].split(",")))
    assert row["format"] == "iceberg" and row["num_files"] == "5"
    assert row["num_snapshots"] == "5" and row["num_records"] == "5"
    assert main(["lake", "cleanup-logs", i, "--keep", "2"]) == 0
    n = json.loads(capsys.readouterr().out.strip())["removed_log_files"]
    assert n == 3  # v1..v5 metadata; keep v4,v5
    md = _os.path.join(i, "metadata")
    assert not _os.path.exists(_os.path.join(md, "v1.metadata.json"))
    assert read_iceberg(spark, i).count() == 5  # history intact


def test_cli_lake_sort_order_analyze_stats(spark, orders, tmp_path,
                                           capsys):
    """r9 continuation: `lake sort-order` sets WRITE ORDERED BY
    metadata-only; `lake analyze` writes Puffin NDV statistics;
    `lake stats` streams the registered blobs; `lake optimize --sort`
    rewrites range-partitioned by the order."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        iceberg_ndv, read_iceberg, write_iceberg)

    t = str(tmp_path / "t")
    write_iceberg(orders.select("o_orderkey", "o_orderstatus")
                  .limit(500), t)
    assert main(["lake", "sort-order", t, "o_orderkey desc"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) \
        == {"default_sort_order_id": 1}
    assert main(["lake", "analyze", t,
                 "--columns", "o_orderstatus"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) \
        == {"o_orderstatus": 3}
    assert iceberg_ndv(t) == {"o_orderstatus": 3}
    assert main(["lake", "stats", t]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert any("apache-datasketches-theta-v1" in ln for ln in out)
    assert main(["lake", "optimize", t, "--sort",
                 "--target-mb", "1"]) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["compacted"] >= 1
    assert read_iceberg(spark, t).count() == 500
    # delta tables refuse the iceberg-only verbs
    d = str(tmp_path / "d")
    from sling_cli_spark.sources.delta_py import write_delta
    write_delta(orders.limit(5), d)
    assert main(["lake", "analyze", d]) == 2
    assert main(["lake", "sort-order", d, "o_orderkey"]) == 2


def test_cli_lake_set_property_both_formats(spark, orders, tmp_path,
                                            capsys):
    """`lake set-property` sets/unsets table properties on both
    formats (bare key unsets)."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import (
        _replay_state, write_delta)
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    i = str(tmp_path / "i")
    write_iceberg(orders.limit(5), i)
    assert main(["lake", "set-property", i,
                 "write.distribution-mode=hash", "custom.k=v"]) == 0
    props = json.loads(capsys.readouterr().out.strip())
    assert props["write.distribution-mode"] == "hash"
    assert main(["lake", "set-property", i, "custom.k"]) == 0
    assert "custom.k" not in json.loads(capsys.readouterr().out.strip())

    d = str(tmp_path / "d")
    write_delta(orders.limit(5), d)
    assert main(["lake", "set-property", d, "custom.x=1"]) == 0
    json.loads(capsys.readouterr().out.strip())
    meta, _, _ = _replay_state(d)
    assert meta["configuration"]["custom.x"] == "1"
    assert main(["lake", "set-property", d, "custom.x"]) == 0
    capsys.readouterr()
    meta, _, _ = _replay_state(d)
    assert "custom.x" not in (meta.get("configuration") or {})


def test_cli_catalog_verbs_sql_and_serve(spark, tmp_path, capsys):
    """`catalog` verbs over a sqlite store, then the same store served
    over REST (reference database_iceberg.go catalog_type sql|rest)."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    loc = str(tmp_path / "ext")
    write_iceberg(spark.range(9).selectExpr(
        "id", "cast(id as double) as x"), loc)

    assert main(["catalog", "create-namespace", "db", "--db", db,
                 "--warehouse", wh]) == 0
    assert main(["catalog", "ls-namespaces", "--db", db]) == 0
    assert capsys.readouterr().out.split() == ["db"]
    ml = os.path.join(loc, "metadata", "v1.metadata.json")
    assert main(["catalog", "register", "db.ext", ml, "--db", db]) == 0
    assert main(["catalog", "ls", "--db", db]) == 0
    assert capsys.readouterr().out.split() == ["db.ext"]
    assert main(["catalog", "columns", "db.ext", "--db", db]) == 0
    out = capsys.readouterr().out
    assert "id\tlong" in out and "x\tdouble" in out
    assert main(["catalog", "max-value", "db.ext", "x",
                 "--db", db]) == 0
    assert json.loads(capsys.readouterr().out)["max"] == 8.0
    assert main(["catalog", "rename", "db.ext", "db.ext2",
                 "--db", db]) == 0
    assert main(["catalog", "load", "db.ext2", "--db", db]) == 0
    assert capsys.readouterr().out.strip() == ml

    # same store behind the REST twin
    from sling_cli_spark.sources.iceberg_catalog import SqlCatalog
    from sling_cli_spark.sources.iceberg_rest import RestCatalogServer
    srv = RestCatalogServer(SqlCatalog(db), token="t").start()
    try:
        assert main(["catalog", "ls", "--uri", srv.uri,
                     "--token", "t"]) == 0
        assert capsys.readouterr().out.split() == ["db.ext2"]
        assert main(["catalog", "max-value", "db.ext2", "id",
                     "--uri", srv.uri, "--token", "t"]) == 0
        assert json.loads(capsys.readouterr().out)["max"] == 8
        assert main(["catalog", "drop", "db.ext2", "--uri", srv.uri,
                     "--token", "t"]) == 0
        assert main(["catalog", "drop-namespace", "db", "--uri",
                     srv.uri, "--token", "t"]) == 0
    finally:
        srv.stop()


def test_cli_catalog_view_verbs(spark, tmp_path, capsys):
    """r10: view lifecycle through the CLI (create-view analyzes the
    SQL against catalog tables, read-view resolves + runs it,
    --or-replace appends a retained version)."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    db = str(tmp_path / "c.db")
    wh = str(tmp_path / "wh")
    loc = str(tmp_path / "t")
    write_iceberg(spark.range(6).selectExpr(
        "id", "id % 2 as k"), loc)
    assert main(["catalog", "create-namespace", "db", "--db", db,
                 "--warehouse", wh]) == 0
    ml = os.path.join(loc, "metadata", "v1.metadata.json")
    assert main(["catalog", "register", "db.t", ml, "--db", db]) == 0

    assert main(["catalog", "create-view", "db.agg",
                 "SELECT k, COUNT(*) AS n FROM db.t GROUP BY k",
                 "--db", db, "--warehouse", wh]) == 0
    assert json.loads(capsys.readouterr().out)["view"] == "db.agg"
    assert main(["catalog", "ls-views", "--db", db]) == 0
    assert capsys.readouterr().out.split() == ["db.agg"]
    assert main(["catalog", "read-view", "db.agg", "--db", db]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.splitlines()]
    assert sorted((r["k"], r["n"]) for r in rows) == [(0, 3), (1, 3)]
    assert main(["catalog", "create-view", "db.agg",
                 "SELECT MAX(id) AS mx FROM db.t", "--or-replace",
                 "--db", db]) == 0
    capsys.readouterr()
    assert main(["catalog", "read-view", "db.agg", "--db", db]) == 0
    assert json.loads(capsys.readouterr().out)["mx"] == 5
    # the replaced version is retained, pinnable history
    assert main(["catalog", "read-view", "db.agg", "--version", "1",
                 "--db", db]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.splitlines()]
    assert sorted((r["k"], r["n"]) for r in rows) == [(0, 3), (1, 3)]
    assert main(["catalog", "view-versions", "db.agg", "--db",
                 db]) == 0
    vv = [json.loads(line) for line in
          capsys.readouterr().out.splitlines()]
    assert [v["version_id"] for v in vv] == [1, 2]
    assert main(["catalog", "rename-view", "db.agg", "db.agg2",
                 "--db", db]) == 0
    assert main(["catalog", "load-view", "db.agg2", "--db", db]) == 0
    assert capsys.readouterr().out.strip().endswith(".metadata.json")
    assert main(["catalog", "drop-view", "db.agg2", "--db", db]) == 0
    assert main(["catalog", "ls-views", "--db", db]) == 0
    assert capsys.readouterr().out.split() == []


def test_cli_lake_checksum(spark, tmp_path, capsys):
    """r9: `lake checksum` verifies the {v}.crc chain; exit 3 on
    mismatch."""
    import os as _os

    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.delta_py import write_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), t)
    write_delta(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), t, mode="append")
    assert main(["lake", "checksum", t]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] and not out["seeded"] and out["version"] == 1
    crc = _os.path.join(t, "_delta_log", f"{1:020d}.crc")
    bad = json.load(open(crc)); bad["tableSizeBytes"] = 1
    open(crc, "w").write(json.dumps(bad))
    assert main(["lake", "checksum", t]) == 3
    capsys.readouterr()


def test_cli_lake_fast_forward(spark, tmp_path, capsys):
    """r9: `lake fast-forward` publishes a branch head onto main when
    main is an ancestor."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_py import (
        create_branch, read_iceberg, write_iceberg)

    t = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), t)
    create_branch(t, "audit")
    write_iceberg(spark.createDataFrame(
        [(2, "b")], "id long, v string").coalesce(1), t, branch="audit")
    assert read_iceberg(spark, t).count() == 1
    assert main(["lake", "fast-forward", t, "audit"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ref"] == "main" and out["head_snapshot_id"]
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == {1, 2}


def test_cli_catalog_update_namespace(tmp_path, capsys):
    """r10: `catalog update-namespace --set K=V --remove K` over the
    SQL store and the REST twin."""
    from sling_cli_spark.__main__ import main
    from sling_cli_spark.sources.iceberg_catalog import SqlCatalog
    from sling_cli_spark.sources.iceberg_rest import RestCatalogServer

    db = str(tmp_path / "c.db")
    store = SqlCatalog(db)
    store.create_namespace("db", {"owner": "etl"})
    assert main(["catalog", "update-namespace", "db",
                 "--set", "tier=gold", "--remove", "owner",
                 "--db", db]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["updated"] == ["tier"] and got["removed"] == ["owner"]
    assert store.namespace_properties("db") == {
        "exists": "true", "tier": "gold"}
    srv = RestCatalogServer(store, token="t").start()
    try:
        assert main(["catalog", "update-namespace", "db",
                     "--set", "tier=silver", "--uri", srv.uri,
                     "--token", "t"]) == 0
        assert json.loads(
            capsys.readouterr().out)["updated"] == ["tier"]
        assert store.namespace_properties("db")["tier"] == "silver"
    finally:
        srv.stop()
    # malformed --set refuses
    assert main(["catalog", "update-namespace", "db",
                 "--set", "oops", "--db", db]) == 2
