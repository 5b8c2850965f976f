"""File sources: format detection, CSV skip_lines, JSONL, sql_on_files,
file-node listing (reference: core/dbio/filesys)."""

import os

from pyspark.sql import Row

from sling_cli_spark.config import SourceOptions
from sling_cli_spark.sources.files import (
    detect_format, list_file_nodes, read_files, sql_on_files)


def test_detect_format_extensions():
    o = SourceOptions()
    assert detect_format("/a/b.parquet", o) == "parquet"
    assert detect_format("/a/b.csv", o) == "csv"
    assert detect_format("/a/b.jsonl", o) == "jsonl"
    assert detect_format("/a/b.ndjson", o) == "jsonl"
    assert detect_format("/a/b.json", o) == "json"
    assert detect_format("/a/b.csv.gz", o) == "csv"


def test_detect_format_option_wins():
    assert detect_format("/a/b.whatever", SourceOptions(format="csv")) == "csv"


def test_csv_skip_lines(spark, tmp_path):
    p = tmp_path / "junk.csv"
    p.write_text("garbage line\nanother junk\nid,v\n1,a\n2,b\n")
    df = read_files(spark, str(p), SourceOptions(format="csv", skip_lines=2))
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert df.columns == ["id", "v"]
    assert rows == [("1", "a"), ("2", "b")]


def test_csv_plain_header(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,v\n1,a\n2,b\n")
    df = read_files(spark, str(p), SourceOptions(format="csv"))
    assert df.count() == 2 and df.columns == ["id", "v"]


def test_jsonl(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
    df = read_files(spark, str(p), SourceOptions(format="jsonl"))
    assert df.count() == 2
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_sql_on_files(spark, tmp_path):
    p = str(tmp_path / "nums.parquet")
    spark.createDataFrame([Row(x=i) for i in range(10)]).write.parquet(p)
    out = sql_on_files(
        spark, "SELECT count(*) AS n, sum(x) AS s FROM t", {"t": p})
    r = out.collect()[0]
    assert r["n"] == 10 and r["s"] == 45


def test_list_file_nodes(spark, sf_dir):
    nodes = list_file_nodes(spark, sf_dir).collect()
    names = {os.path.basename(r["path"]) for r in nodes}
    assert "lineitem.parquet" in names and "orders.parquet" in names
    assert all(r["size"] > 0 for r in nodes)


def test_runner_infers_csv_types(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = tmp_path / "in.csv"
    src.write_text("id,amount,when\n1,2.5,2024-01-02\n2,3.75,2024-02-03\n")
    out = str(tmp_path / "out.parquet")
    cfg = Config.from_dict({
        "source": {"stream": str(src)},
        "target": {"object": out},
        "mode": "full-refresh"})
    run(spark, cfg)
    back = spark.read.parquet(out)
    dt = dict(back.dtypes)
    assert dt["id"] in ("int", "bigint")
    assert dt["amount"].startswith("decimal") or dt["amount"] == "double"
    assert dt["when"] == "date"


def test_runner_column_override_wins(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = tmp_path / "in2.csv"
    src.write_text("id,code\n1,0042\n2,0043\n")
    out = str(tmp_path / "out2.parquet")
    cfg = Config.from_dict({
        "source": {"stream": str(src),
                   "options": {"columns": {"code": "string"}}},
        "target": {"object": out},
        "mode": "full-refresh"})
    run(spark, cfg)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["code"] == "string"
    assert sorted(r["code"] for r in back.collect()) == ["0042", "0043"]


def test_merge_schemas_across_drifting_files(spark, tmp_path):
    base = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .write.parquet(base + "/f1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double") \
        .write.parquet(base + "/f2")
    df = read_files(spark, base + "/*", SourceOptions(
        format="parquet", merge_schemas=True))
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[2] == 9.5 and rows[1] is None


def test_write_gsheet_builds_values_update(spark):
    from sling_cli_spark.sources.gsheet import write_gsheet

    seen = {}

    def transport(method, url, headers, body):
        seen.update(method=method, url=url, headers=headers, body=body)
        return 200, {"updatedCells": 6}

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    out = write_gsheet(df, "https://docs.google.com/spreadsheets/d/SHEETID99/edit",
                       token="tok", transport=transport)
    assert out == {"updatedCells": 6}
    assert seen["method"] == "PUT"
    assert "/spreadsheets/SHEETID99/values/" in seen["url"]
    assert "valueInputOption=RAW" in seen["url"]
    assert seen["headers"]["Authorization"] == "Bearer tok"
    assert seen["body"]["values"][0] == ["id", "v"]
    assert seen["body"]["values"][1:] == [[1, "a"], [2, ""]]


# ----------------------------------------------- round 4: sas7bdat active

def test_sas7bdat_roundtrip(spark, tmp_path):
    """Generate a sas7bdat with the stdlib writer (public format spec),
    read it back through the engine's source path (pandas reader)."""
    from sling_cli_spark.config import SourceOptions
    from sling_cli_spark.sources.files import read_files
    from sling_cli_spark.sources.sas7bdat_py import write_sas7bdat

    p = str(tmp_path / "t.sas7bdat")
    write_sas7bdat(p, ["id", "score", "name"], [
        (1, 9.5, "alpha"), (2, 8.25, "bravo"), (3, None, "charlie"),
    ])
    df = read_files(spark, p, SourceOptions())
    rows = {int(r["id"]): (r["score"], r["name"]) for r in df.collect()}
    assert rows[1] == (9.5, "alpha")
    assert rows[2] == (8.25, "bravo")
    assert rows[3][0] is None or rows[3][0] != rows[3][0]  # NaN
    assert rows[3][1] == "charlie"


def test_sas7bdat_multi_page(spark, tmp_path):
    """More rows than fit one page -> multiple data pages."""
    import pandas as pd

    from sling_cli_spark.sources.sas7bdat_py import write_sas7bdat

    p = str(tmp_path / "big.sas7bdat")
    rows = [(i, f"v{i}") for i in range(5000)]
    write_sas7bdat(p, ["id", "v"], rows, page_size=4096)
    pdf = pd.read_sas(p, encoding="infer")
    assert len(pdf) == 5000
    assert pdf["id"].iloc[-1] == 4999.0


def test_sas7bdat_df_writer_capped(spark, tmp_path, monkeypatch):
    import pytest

    from sling_cli_spark.limits import DriverSizeError
    from sling_cli_spark.sources.sas7bdat_py import write_sas7bdat_df

    monkeypatch.setenv("SLING_DRIVER_ROW_CAP", "10")
    with pytest.raises(DriverSizeError):
        write_sas7bdat_df(spark.range(100).selectExpr("id"),
                          str(tmp_path / "x.sas7bdat"))
    write_sas7bdat_df(spark.range(5).selectExpr("id"),
                      str(tmp_path / "ok.sas7bdat"))
    import pandas as pd
    assert len(pd.read_sas(str(tmp_path / "ok.sas7bdat"))) == 5
