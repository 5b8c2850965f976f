"""CLI surface (__main__.py): run / conns / pipeline — the reference's
``sling`` command twins (cmd/sling/sling_cli.go:45-238)."""

import io
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
    assert "reachable" in capsys.readouterr().out
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
