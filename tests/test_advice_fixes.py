"""Regression tests for the round-2 advisory findings.

Each test pins the FIXED behavior of a bug that produced wrong results or
fragile state:

1. delete_missing on an incremental run must compare against the FULL
   source keyset, never the watermark-filtered batch (reference:
   core.delete_where_not_exist runs its own source scan,
   core/sling/config.go:1838-1876).
2. batch_limit splits the write, never drops rows (covered in
   test_writers.py).
3. file_max_bytes sizing must not run an action over the observed plan.
4. write_swap must never leave a window where the target path is missing
   (reference SwapTable renames aside first, database.go:2955-2992).
5. run() observes max(update_key) so state-backed callers advance their
   store even on the target_df path.
6. skip_lines CSV parses JVM-side: no RDD scan, no global sort.
"""

import pytest

from sling_cli_spark.config import Config


def _write_csv(path, ids_vals):
    path.write_text("id,ts,v\n" + "".join(
        f"{i},{t},{v}\n" for i, t, v in ids_vals))


def test_delete_missing_incremental_uses_full_source_keyset(spark, tmp_path):
    from sling_cli_spark.runner import run

    src = tmp_path / "src.csv"
    out = str(tmp_path / "tgt.parquet")

    # initial full load: ids 1..6
    _write_csv(src, [(i, i, f"v{i}") for i in range(1, 7)])
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": out},
        "mode": "full-refresh"})
    run(spark, cfg)

    # source evolves: id 3 deleted, id 7 added (ts=7 > watermark=6);
    # ids 1,2,4,5,6 unchanged -> filtered out of the incremental batch
    _write_csv(src, [(i, i, f"v{i}") for i in (1, 2, 4, 5, 6, 7)])
    cfg2 = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": out,
                   "options": {"delete_missing": "hard"}},
        "mode": "incremental"})
    run(spark, cfg2, target_df=spark.read.parquet(out))

    back = spark.read.parquet(out)
    ids = sorted(r["id"] for r in back.collect())
    # the five unchanged pre-watermark rows MUST survive; only the
    # genuinely-missing id 3 is deleted and id 7 is added
    assert ids == [1, 2, 4, 5, 6, 7]


def test_rows_for_bytes_runs_no_action(spark):
    """The sizing estimate must not touch the (possibly observed) plan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sling_cli_spark.sinks.writers import _rows_for_bytes

    df = spark.range(1000).selectExpr("id", "cast(id as string) as s")
    obs = Observation("probe_guard")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    n = _rows_for_bytes(observed, 32_000)
    assert n >= 1
    # the Observation must still be unfulfilled: a real write sees all rows
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 1000


def test_rows_for_bytes_hint_overrides():
    from sling_cli_spark.sinks.writers import _rows_for_bytes

    class _Fake:
        class schema:
            fields = []

    assert _rows_for_bytes(_Fake(), 1000, hint=100) == 10


def test_promote_swap_replaces_and_cleans(spark, tmp_path):
    from sling_cli_spark.sinks.writers import promote_swap

    tgt = str(tmp_path / "t.parquet")
    swp = tgt + "__swap"
    spark.range(5).write.parquet(tgt)
    spark.range(10).write.parquet(swp)
    promote_swap(spark, tgt, swp)
    assert spark.read.parquet(tgt).count() == 10
    assert not (tmp_path / "t.parquet__old").exists()
    assert not (tmp_path / "t.parquet__swap").exists()


def test_promote_swap_failure_restores_target(spark, tmp_path):
    from sling_cli_spark.sinks.writers import promote_swap

    tgt = str(tmp_path / "t.parquet")
    spark.range(5).write.parquet(tgt)
    # swap path does not exist -> promote fails -> target must come back
    with pytest.raises(Exception):
        promote_swap(spark, tgt, tgt + "__swap")
    assert spark.read.parquet(tgt).count() == 5


def test_run_with_state_advances_on_target_df_path(spark, tmp_path):
    from sling_cli_spark.runner import run_with_state
    from sling_cli_spark.state import StateStore

    src = tmp_path / "in.csv"
    src.write_text("id,v\n" + "".join(f"{i},x\n" for i in range(10)))
    out = str(tmp_path / "out.parquet")
    spark.createDataFrame([(0, "x")], "id bigint, v string") \
        .write.parquet(out)
    st = StateStore(str(tmp_path / "state.json"))
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "id",
                   "options": {"columns": {"id": "bigint"}}},
        "target": {"object": out},
        "mode": "incremental"})
    r = run_with_state(spark, cfg, st, target_df=spark.read.parquet(out))
    assert r.watermark == 9
    assert st.get(str(src)) == 9  # store advanced, not silently stale


def test_skip_lines_plan_stays_jvm_side(spark, tmp_path):
    from sling_cli_spark.config import SourceOptions
    from sling_cli_spark.sources.files import read_files

    p = tmp_path / "junk.csv"
    p.write_text("garbage\nmore garbage\nid,v\n1,a\n2,b\n3,c\n")
    df = read_files(spark, str(p), SourceOptions(format="csv", skip_lines=2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan          # no RDD/Python round-trip
    assert "rangepartitioning" not in plan    # no global sort
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert rows == [("1", "a"), ("2", "b"), ("3", "c")]


# ------------------------------------------------- round 4: fallback caps

def test_avro_write_fallback_refuses_oversized(spark, tmp_path, monkeypatch):
    from sling_cli_spark.limits import DriverSizeError
    from sling_cli_spark.sources.avro_py import write_avro_df

    monkeypatch.setenv("SLING_DRIVER_ROW_CAP", "100")
    df = spark.range(0, 200).selectExpr("id", "cast(id as string) v")
    with pytest.raises(DriverSizeError, match="spark-avro"):
        write_avro_df(df, str(tmp_path / "big.avro"))
    # under the cap: works
    write_avro_df(df.limit(50), str(tmp_path / "ok.avro"))


def test_avro_read_fallback_refuses_oversized(spark, tmp_path, monkeypatch):
    from sling_cli_spark.limits import DriverSizeError
    from sling_cli_spark.sources.avro_py import read_avro_df, write_avro_df

    p = str(tmp_path / "r.avro")
    write_avro_df(spark.range(5).selectExpr("id"), p)
    monkeypatch.setenv("SLING_DRIVER_BYTE_CAP", "10")
    with pytest.raises(DriverSizeError, match="spark-avro"):
        read_avro_df(spark, p)


def test_xlsx_write_refuses_oversized(spark, tmp_path, monkeypatch):
    from sling_cli_spark.limits import DriverSizeError
    from sling_cli_spark.sinks.formats import write_excel

    monkeypatch.setenv("SLING_DRIVER_ROW_CAP", "100")
    with pytest.raises(DriverSizeError, match="1,048,576"):
        write_excel(spark.range(0, 200).selectExpr("id"),
                    str(tmp_path / "big.xlsx"))


def test_gsheet_write_refuses_oversized(spark, monkeypatch):
    from sling_cli_spark.limits import DriverSizeError
    from sling_cli_spark.sources.gsheet import write_gsheet

    monkeypatch.setenv("SLING_DRIVER_ROW_CAP", "100")
    calls = []
    with pytest.raises(DriverSizeError):
        write_gsheet(spark.range(0, 200).selectExpr("id"), "sheetid",
                     transport=lambda *a: calls.append(a) or (200, {}))
    assert not calls  # refused before any network call


def test_gsheet_write_serializes_temporal_and_decimal(spark):
    """ADVICE r3: datetime/Decimal cells must not blow up json.dumps."""
    import datetime
    from decimal import Decimal

    from sling_cli_spark.sources.gsheet import write_gsheet

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5),
          datetime.date(2024, 1, 2), Decimal("12.50"))],
        "id long, ts timestamp, d date, amt decimal(10,2)")
    sent = {}

    def transport(method, url, headers, body):
        import json as j
        j.dumps(body)  # must be JSON-serializable
        sent.update(body)
        return 200, {"updatedCells": 8}

    write_gsheet(df, "abc123", transport=transport)
    row = sent["values"][1]
    assert row[1] == "2024-01-02 03:04:05"
    assert row[2] == "2024-01-02"
    assert row[3] == "12.50"
