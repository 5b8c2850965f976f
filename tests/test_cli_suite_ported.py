"""CLI-level scenarios sampled from the reference's suite.cli.yaml
(2,611 lines) — stdin pipes, --select / exclusion, option parsing,
empty-stream contract, ignore_existing, headerless dummy columns —
pinned against ``sling_cli_spark/__main__.py`` with the reference's
own fixture files. Case ids cite suite.cli.yaml. The POSTGRES target
twin is a DuckDB database connection (no live postgres in sandbox)."""

import io
import os

import pytest

from sling_cli_spark.__main__ import main, save_connections

REF_FILES = "/root/reference/tests/files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_FILES), reason="reference fixtures absent")


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("SLING_HOME_DIR", str(tmp_path / "slinghome"))
    return tmp_path


@pytest.fixture()
def pgtwin(home):
    url = f"duckdb://{home}/pg.db"
    save_connections({"POSTGRES": {"type": "duckdb", "url": url}})
    return url


class _FakeStdin:
    def __init__(self, data: bytes):
        self.buffer = io.BytesIO(data)

    def isatty(self) -> bool:
        return False


def _pipe(monkeypatch, data: bytes) -> None:
    import sys

    monkeypatch.setattr(sys, "stdin", _FakeStdin(data))


def _count(home, table: str) -> int:
    import duckdb

    con = duckdb.connect(f"{home}/pg.db")
    try:
        return con.execute(f"select count(*) from {table}").fetchone()[0]
    finally:
        con.close()


def test_cli1_bare_sling_prints_help(capsys):
    assert main([]) == 0
    assert "sling" in capsys.readouterr().out.lower()


def test_cli2_run_help_describes_run(capsys):
    with pytest.raises(SystemExit) as e:
        main(["run", "--help"])
    assert e.value.code == 0
    assert "run" in capsys.readouterr().out.lower()


def test_cli4_stdin_csv_to_db(home, pgtwin, spark, monkeypatch, capsys):
    # cat test1.1.csv | sling run --tgt-conn POSTGRES ... -> 18 rows
    _pipe(monkeypatch, open(f"{REF_FILES}/test1.1.csv", "rb").read())
    rc = main(["run", "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.my_table") == 18
    assert "execution succeeded" in capsys.readouterr().out


def test_cli5_csv_file_to_db(home, pgtwin, spark, capsys):
    rc = main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.my_table") == 18


def test_cli7_custom_delimiter_escape_stdout(home, spark, capsys):
    # test4.csv: '|' delimited, backslash escape -> 4 rows
    rc = main(["run", "--src-stream", f"{REF_FILES}/test4.csv",
               "--src-options", '{ delimiter: "|", escape: "\\\\" }',
               "--stdout"])
    assert rc == 0
    import csv as _csv
    recs = list(_csv.reader(io.StringIO(capsys.readouterr().out)))
    assert len(recs) == 5  # header + 4 rows (one spans lines)
    assert recs[0][0] == "col1"


def test_cli8_stdin_gzip_csv_to_db(home, pgtwin, spark, monkeypatch):
    _pipe(monkeypatch, open(f"{REF_FILES}/test1.1.csv.gz", "rb").read())
    rc = main(["run", "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table1",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.my_table1") == 18


def test_cli10_json_flatten_to_db(home, pgtwin, spark):
    rc = main(["run", "--src-stream", f"{REF_FILES}/test3.json",
               "--src-options", "flatten: true",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table2",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.my_table2") == 1


def test_cli12_headerless_dummy_columns(home, spark, capsys):
    # test6.csv: no header, ';' auto-detected, reference dummy names
    rc = main(["run", "--src-stream", f"{REF_FILES}/test6.csv",
               "--src-options", "{ header: false }", "--stdout"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("col_001,col_002")  # csv.go:299
    assert len(out) == 3  # header + 2 rows


def test_cli13_empty_stream_contract(home, spark, monkeypatch, capsys):
    # header-only stdin: refused without SLING_ALLOW_EMPTY (warn +
    # nothing written), loads an empty target with it
    tgt = str(home / "empty_out.csv")
    _pipe(monkeypatch, b"a,b,c\n")
    monkeypatch.delenv("SLING_ALLOW_EMPTY", raising=False)
    rc = main(["run", "--tgt-object", tgt])
    captured = capsys.readouterr()
    assert rc == 0
    assert "Nothing to do" in captured.err
    assert not os.path.exists(tgt)

    _pipe(monkeypatch, b"a,b,c\n")
    monkeypatch.setenv("SLING_ALLOW_EMPTY", "true")
    rc = main(["run", "--tgt-object", tgt])
    captured = capsys.readouterr()
    assert rc == 0
    assert "execution succeeded" in captured.out
    assert os.path.exists(tgt)


def test_cli14_db_source_to_stdout(home, pgtwin, spark, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    capsys.readouterr()
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table", "--stdout"])
    assert rc == 0
    import csv as _csv
    recs = list(_csv.reader(io.StringIO(capsys.readouterr().out)))
    assert len(recs) == 19  # header + 18 (one record spans lines)


def test_cli16_select_columns_limit(home, pgtwin, spark, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    capsys.readouterr()
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table", "--stdout",
               "--select", "id,email", "-l", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "id,email"
    assert len(out) == 3


def test_cli17_select_exclusion(home, pgtwin, spark, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    capsys.readouterr()
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table", "--stdout",
               "--select=-id", "-l", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert "id" not in out[0].split(",")
    assert "email" in out[0].split(",")


def test_cli18_ignore_existing_moves_nothing(home, pgtwin, spark,
                                             monkeypatch, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    capsys.readouterr()
    tgt = str(home / "exists.csv")
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table",
               "--tgt-object", tgt])
    assert rc == 0
    capsys.readouterr()
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table",
               "--tgt-object", tgt,
               "--tgt-options", "ignore_existing: true"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "0 rows" in out and "execution succeeded" in out


def test_cli_error_exit_unknown_conn(home, spark):
    with pytest.raises(SystemExit):
        main(["run", "--src-stream", "x.csv",
              "--tgt-conn", "NOPE", "--tgt-object", "t"])


def test_cli_error_exit_bad_mode(home):
    with pytest.raises(SystemExit) as e:
        main(["run", "--src-stream", "x", "--mode", "bogus"])
    assert e.value.code == 2


# ---------------------------------------------------------------------------
# round-13 additions (VERDICT r12 ask #5): `run -r` multi-stream /
# wildcard, `run -p`, live `conns discover --pattern`, and the
# error-exit contracts of bad YAML (suite.cli.yaml:2569-2596 shapes)


def _write(p, text):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)
    return str(p)


def test_cli_run_r_multistream(home, pgtwin, spark, capsys, tmp_path):
    # sling run -r replication.yaml with TWO streams into the DB twin
    _write(tmp_path / "in" / "a.csv", "id,v\n1,x\n2,y\n")
    _write(tmp_path / "in" / "b.csv", "id,v\n3,z\n")
    repl = _write(tmp_path / "r.yaml", f"""
source: local
target: POSTGRES
defaults:
  mode: full-refresh
streams:
  {tmp_path}/in/a.csv:
    object: public.tbl_a
  {tmp_path}/in/b.csv:
    object: public.tbl_b
""")
    assert main(["run", "-r", repl]) == 0
    out = capsys.readouterr().out
    assert "execution succeeded" in out
    assert _count(home, "public.tbl_a") == 2
    assert _count(home, "public.tbl_b") == 1


def test_cli_run_r_wildcard_stream(home, pgtwin, spark, capsys, tmp_path):
    # file wildcard fans out to N streams (replication.go:293-518)
    for i in range(3):
        _write(tmp_path / "w" / f"part{i}.csv", f"id\n{i}\n")
    repl = _write(tmp_path / "rw.yaml", f"""
source: local
target: local
defaults:
  mode: full-refresh
  object: {tmp_path}/out/{{stream_file_name}}.parquet
streams:
  {tmp_path}/w/part*.csv: {{}}
""")
    assert main(["run", "-r", repl]) == 0
    out = capsys.readouterr().out
    assert out.count("rows (full-refresh)") == 3
    import glob

    assert len(glob.glob(f"{tmp_path}/out/part*.parquet")) == 3


def test_cli_run_p_pipeline(home, pgtwin, spark, capsys, tmp_path):
    # sling run -p pipeline.yaml (the suite.cli drive shape)
    pl = _write(tmp_path / "p.yaml", """
steps:
  - type: query
    sql: SELECT 41 + 1 AS answer
    id: probe
  - type: check
    expr: '{ jmespath(state.probe, "[0].answer") } = 42'
""")
    assert main(["run", "-p", pl]) == 0
    assert "execution succeeded" in capsys.readouterr().out


def test_cli_run_p_failing_check_exits_1(home, spark, capsys, tmp_path):
    pl = _write(tmp_path / "pf.yaml",
                "steps:\n  - type: check\n    expr: 1 = 2\n")
    assert main(["run", "-p", pl]) == 1
    assert "execution failed" in capsys.readouterr().err


def test_cli_run_r_bad_yaml_exits_1(home, capsys, tmp_path):
    bad = _write(tmp_path / "bad.yaml", "streams: [:::\n  - {broken\n")
    assert main(["run", "-r", bad]) == 1
    assert "invalid replication config" in capsys.readouterr().err


def test_cli_run_r_no_streams_exits_1(home, capsys, tmp_path):
    empty = _write(tmp_path / "empty.yaml", "source: local\ntarget: local\n")
    assert main(["run", "-r", empty]) == 1
    assert "invalid replication config" in capsys.readouterr().err


def test_cli_run_r_missing_file_exits_1(home, capsys):
    assert main(["run", "-r", "/nope/missing.yaml"]) == 1
    assert "not found" in capsys.readouterr().err


def test_cli_run_p_missing_file_exits_1(home, capsys):
    assert main(["run", "-p", "/nope/missing.yaml"]) == 1
    assert "not found" in capsys.readouterr().err


def test_cli_conns_discover_db_pattern(home, pgtwin, spark, capsys):
    # live table discovery with a glob pattern (reference
    # `conns discover NAME --pattern schema.tbl_v*`)
    import duckdb

    con = duckdb.connect(f"{home}/pg.db")
    con.execute("create schema if not exists disco")
    con.execute("create table disco.tbl_v1 (id int)")
    con.execute("create table disco.tbl_v2 (id int)")
    con.execute("create table disco.other (id int)")
    con.close()
    assert main(["conns", "discover", "POSTGRES",
                 "--pattern", "disco.tbl_v*"]) == 0
    out = capsys.readouterr().out
    assert "tbl_v1" in out and "tbl_v2" in out and "other" not in out


def test_cli_conns_discover_columns(home, pgtwin, spark, capsys):
    import duckdb

    con = duckdb.connect(f"{home}/pg.db")
    con.execute("create schema if not exists disco2")
    con.execute("create table disco2.t (id int, name varchar)")
    con.close()
    assert main(["conns", "discover", "POSTGRES",
                 "--pattern", "disco2.t"]) == 0
    out = capsys.readouterr().out
    assert "id" in out and "name" in out


def test_cli_conns_discover_unknown_exits_1(home, capsys):
    assert main(["conns", "discover", "NOPE"]) == 1
    assert "connection not found" in capsys.readouterr().err
