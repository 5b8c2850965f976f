"""Zero-dependency xlsx reader/writer (sources/xlsx.py) + the Excel
source/sink paths it activates."""

import pytest

from sling_cli_spark.sources.xlsx import (
    _col_index, _col_letter, parse_range, read_xlsx, write_xlsx,
)


def test_col_letters_roundtrip():
    for i in (0, 1, 25, 26, 27, 51, 52, 701, 702):
        assert _col_index(_col_letter(i)) == i
    assert _col_letter(0) == "A" and _col_letter(26) == "AA"


def test_parse_range():
    assert parse_range("Sheet1!A1:C100") == ("Sheet1", 0, 0, 99, 2)
    assert parse_range("B2:D4") == (None, 1, 1, 3, 3)
    assert parse_range("Data") == ("Data", None, None, None, None)
    assert parse_range(None) == (None, None, None, None, None)
    with pytest.raises(ValueError):
        parse_range("Sheet1!notarange:")


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    header = ["id", "name", "score", "ok"]
    rows = [[1, "alice", 9.5, True],
            [2, "bob & <carol>", -3.0, False],
            [3, None, 0, True]]
    write_xlsx(rows, header, p)
    h, r = read_xlsx(p)
    assert h == header
    assert r[0] == [1, "alice", 9.5, True]
    assert r[1][1] == "bob & <carol>" and r[1][2] == -3.0
    assert r[2][1] is None and r[2][3] is True


def test_read_with_range_window(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx([[i, f"v{i}"] for i in range(10)], ["id", "v"], p)
    # rows 1-4 (A1:B4): header row + 3 data rows
    h, r = read_xlsx(p, "Sheet1!A1:B4")
    assert h == ["id", "v"] and len(r) == 3
    assert r[-1] == [2, "v2"]
    # single-column window
    h2, r2 = read_xlsx(p, "B1:B3")
    assert h2 == ["v"] and [x[0] for x in r2] == ["v0", "v1"]


def test_spark_excel_sink_source_roundtrip(spark, tmp_path):
    from sling_cli_spark.config import Source, SourceOptions
    from sling_cli_spark.sinks.formats import write_excel
    from sling_cli_spark.sources.files import read_source

    p = str(tmp_path / "out.xlsx")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 3.5)], "id long, v string, x double")
    write_excel(df, p)
    back = read_source(spark, Source(
        stream=p, options=SourceOptions(format="excel")))
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [(1, "a", 2.5), (2, "b", 3.5)]


def test_excel_via_runner_el_task(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    xlsx = str(tmp_path / "in.xlsx")
    write_xlsx([[1, "x"], [2, "y"]], ["id", "v"], xlsx)
    out = str(tmp_path / "o.parquet")
    cfg = Config.from_dict({
        "source": {"stream": xlsx},
        "target": {"object": out},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 2
    assert {x["v"] for x in spark.read.parquet(out).collect()} == {"x", "y"}
