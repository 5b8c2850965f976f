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
