"""Zero-dependency Avro OCF reader/writer (sources/avro_py.py)."""

import io

import pytest

from sling_cli_spark.sources.avro_py import (
    _read_long, _write_long, read_avro, read_avro_df, write_avro,
    write_avro_df,
)


@pytest.mark.parametrize("n", [0, 1, -1, 63, 64, -64, -65, 2**31,
                               -(2**31), 2**62, -(2**62), 12345678901234])
def test_varint_zigzag_roundtrip(n):
    buf = io.BytesIO()
    _write_long(buf, n)
    buf.seek(0)
    assert _read_long(buf) == n


SCHEMA = {
    "type": "record", "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ],
}

RECORDS = [
    {"id": 1, "name": "a", "score": 1.5, "ok": True, "raw": b"\x00\x01",
     "tags": ["x", "y"], "attrs": {"k": 7}},
    {"id": 2, "name": None, "score": -2.25, "ok": False, "raw": None,
     "tags": [], "attrs": {}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_avro(p, RECORDS, SCHEMA, codec=codec)
    schema, recs = read_avro(p)
    assert schema["fields"][0]["name"] == "id"
    assert recs == RECORDS


def test_multi_block_roundtrip(tmp_path):
    p = str(tmp_path / "big.avro")
    rows = [{"id": i, "name": f"n{i}", "score": i / 2, "ok": i % 2 == 0,
             "raw": None, "tags": [], "attrs": {}} for i in range(2500)]
    write_avro(p, rows, SCHEMA, block_records=1000)
    _, recs = read_avro(p)
    assert len(recs) == 2500 and recs[-1]["id"] == 2499


def test_spark_df_roundtrip(spark, tmp_path):
    p = str(tmp_path / "df.avro")
    df = spark.createDataFrame(
        [(1, "a", 2.5, True), (2, None, -1.0, False)],
        "id long, v string, x double, ok boolean")
    write_avro_df(df, p)
    back = read_avro_df(spark, p)
    assert dict(back.dtypes) == {
        "id": "bigint", "v": "string", "x": "double", "ok": "boolean"}
    assert sorted(tuple(r) for r in back.collect()) == \
        [(1, "a", 2.5, True), (2, None, -1.0, False)]


def test_avro_el_task_roundtrip(spark, tmp_path):
    """Full EL lifecycle: parquet -> avro sink -> avro source -> parquet."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    avro_path = str(tmp_path / "r.avro")
    cfg = Config.from_dict({
        "source": {"stream": "/root/testdata/sf0.001/region.parquet"},
        "target": {"object": avro_path, "options": {"format": "avro"}},
        "mode": "full-refresh"})
    run(spark, cfg)
    out = str(tmp_path / "back.parquet")
    cfg2 = Config.from_dict({
        "source": {"stream": avro_path, "options": {"format": "avro"}},
        "target": {"object": out},
        "mode": "full-refresh"})
    r = run(spark, cfg2)
    assert r.rows == 5
    back = spark.read.parquet(out)
    assert sorted(x["r_name"] for x in back.collect()) == \
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


# ---------------------------------------------------------------- round 4

def test_logical_types_roundtrip(spark, tmp_path):
    """timestamp/date/decimal survive the fallback writer as Avro
    logical types (not degraded to strings)."""
    import datetime
    from decimal import Decimal

    from sling_cli_spark.sources.avro_py import (
        read_avro, read_avro_df, write_avro_df)

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 12, 30, 45, 123456),
          datetime.date(2024, 3, 1), Decimal("1234.56"))],
        "id long, ts timestamp, d date, amt decimal(10,2)")
    p = str(tmp_path / "lt.avro")
    write_avro_df(df, p)

    schema, records = read_avro(p)
    by_name = {f["name"]: f["type"] for f in schema["fields"]}

    def branch(t):
        return next(x for x in t if x != "null")

    assert branch(by_name["ts"])["logicalType"] == "timestamp-micros"
    assert branch(by_name["d"])["logicalType"] == "date"
    dec = branch(by_name["amt"])
    assert dec["logicalType"] == "decimal" and dec["scale"] == 2
    assert isinstance(records[0]["ts"], int)

    back = read_avro_df(spark, p)
    types = dict(back.dtypes)
    assert types["ts"] == "timestamp" and types["d"] == "date"
    assert types["amt"] == "decimal(10,2)"
    r = back.collect()[0]
    assert r["ts"] == datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert r["d"] == datetime.date(2024, 3, 1)
    assert r["amt"] == Decimal("1234.56")
