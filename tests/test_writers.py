"""Partition masks + physical writes + mode shaping (reference:
core/dbio/iop/partition.go:13-124, task_run_write.go)."""

import datetime
import os

import pytest
from pyspark.sql import Row

from sling_cli_spark.config import Mode, Target, TargetOptions
from sling_cli_spark.sinks.writers import (
    parse_partition_mask, prepare_for_mode, write_files)


def test_mask_explicit_column():
    uri, parts = parse_partition_mask("/data/out/{part_year(ts)}")
    assert uri == "/data/out"
    assert parts == [("part_year", "ts")]


def test_bare_mask_uses_update_key():
    uri, parts = parse_partition_mask("/data/out/{part_month}", "updated_at")
    assert parts == [("part_month", "updated_at")]


def test_bare_mask_without_update_key_raises():
    with pytest.raises(ValueError):
        parse_partition_mask("/data/out/{part_year}", None)


def test_no_mask_passthrough():
    uri, parts = parse_partition_mask("/data/out.parquet")
    assert uri == "/data/out.parquet" and parts == []


def _events(spark):
    return spark.createDataFrame([
        Row(id=1, ts=datetime.datetime(2024, 1, 5), v="a"),
        Row(id=2, ts=datetime.datetime(2024, 2, 6), v="b"),
    ])


def test_partitioned_write_layout(spark, tmp_path):
    out = str(tmp_path / "events" / "{part_year_month(ts)}")
    target = Target(conn="local", object=out, options=TargetOptions())
    write_files(_events(spark), target, Mode.FULL_REFRESH, fmt="parquet")
    base = str(tmp_path / "events")
    # hive dirs are <source_col>_<level>=<value> — the reference's
    # GetPartitionDateMap layout (partition.go:431), parseable back via
    # partitions.extract_partition_time_value
    dirs = sorted(d for d in os.listdir(base) if d.startswith("ts_year_month="))
    assert dirs == ["ts_year_month=2024-01", "ts_year_month=2024-02"]
    back = spark.read.parquet(base)
    assert back.count() == 2
    from sling_cli_spark.partitions import extract_partition_time_value
    got = extract_partition_time_value(
        base + "/{part_year_month}", base + "/" + dirs[0])
    assert got == datetime.datetime(2024, 1, 1)


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out.csv")
    target = Target(conn="local", object=out, options=TargetOptions())
    write_files(_events(spark).drop("ts"), target, Mode.FULL_REFRESH, fmt="csv")
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2 and set(back.columns) == {"id", "v"}


def test_definition_only_writes_schema_no_rows(spark):
    df = prepare_for_mode(_events(spark), Mode.DEFINITION_ONLY)
    assert df.count() == 0 and df.columns == ["id", "ts", "v"]


def test_snapshot_stamps_loaded_at(spark):
    ts = datetime.datetime(2026, 1, 1)
    df = prepare_for_mode(_events(spark), Mode.SNAPSHOT, run_ts=ts)
    assert "_sling_loaded_at" in df.columns
    assert df.filter("_sling_loaded_at is null").count() == 0


def test_batch_limit_splits_write_never_drops_rows(spark, tmp_path):
    # reference: batch_limit splits the write into batches
    # (SetBatchLimit, task_run_write.go:347); it must NOT cap rows moved —
    # a row cap combined with the '>' watermark filter silently skips
    # boundary rows on the next run.
    import glob

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = tmp_path / "in.csv"
    src.write_text("id,v\n" + "".join(f"{i},{i}\n" for i in range(100)))
    out = str(tmp_path / "out.parquet")
    cfg = Config.from_dict({
        "source": {"stream": str(src), "update_key": "id"},
        "target": {"object": out, "options": {"batch_limit": 10}},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 100
    back = spark.read.parquet(out)
    assert sorted(x["id"] for x in back.collect()) == list(range(100))
    # the batches became separate files of <= 10 rows
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 10
    for f in files:
        assert spark.read.parquet(f).count() <= 10


def test_csv_target_options(spark, tmp_path):
    """Target-side csv shaping: delimiter, header off, max_decimals
    (config.go:1733-1744 TargetOptions)."""
    from sling_cli_spark.config import Mode, Target, TargetOptions
    from sling_cli_spark.sinks.writers import write_files

    df = spark.createDataFrame([(1, 2.123456, "x")],
                               "id long, amt double, v string")
    out = str(tmp_path / "o.csv")
    write_files(df, Target(object=out, options=TargetOptions(
        format="csv", delimiter="|", header=False, max_decimals=2)),
        Mode.FULL_REFRESH)
    import glob as g
    text = "".join(open(p).read() for p in
                   sorted(g.glob(out + "/part-*.csv"))).strip()
    assert text == "1|2.12|x"


def test_bucketed_write_joins_without_shuffle(spark, tmp_path):
    """bucket_by targets: two tables bucketed the same way on the join
    key sort-merge-join with NO Exchange — the co-located-join layout
    for 100 TB PK merges."""
    from sling_cli_spark.config import Mode, Target, TargetOptions
    from sling_cli_spark.sinks.writers import write_files

    a = spark.range(0, 1000).selectExpr("id", "id * 2 as va")
    b = spark.range(0, 1000).selectExpr("id", "id * 3 as vb")
    for df, sub in ((a, "bkt_a"), (b, "bkt_b")):
        write_files(df, Target(
            object=str(tmp_path / sub),
            options=TargetOptions(format="parquet", bucket_by=["id"],
                                  bucket_count=4)), Mode.FULL_REFRESH)
    ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
    # force SMJ (tiny test tables would broadcast, which sidesteps
    # bucketing); at fact-scale SMJ is what the planner picks anyway
    joined = ta.hint("merge").join(tb.hint("merge"), "id")
    assert joined.count() == 1000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan.replace(
        "ShuffleExchangeExec", "") and "Exchange hashpartitioning" \
        not in plan  # bucket layout co-locates the join
    # files actually live at the target path
    import glob as g
    assert g.glob(str(tmp_path / "bkt_a" / "*.parquet"))
    spark.sql("drop table if exists bkt_a")
    spark.sql("drop table if exists bkt_b")


def test_el_delta_write_idempotent_txn(spark, tmp_path):
    """r9: target.options.txn_app_id/txn_version make the EL delta
    write a no-op on re-run (task retry after an uncertain commit)."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.delta_py import read_delta

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").write.parquet(src)
    t = str(tmp_path / "t")
    cfg = {
        "source": {"stream": src},
        "target": {"object": t,
                   "options": {"format": "delta", "txn_app_id": "job7",
                               "txn_version": 1}},
        "mode": "incremental",
    }
    run(spark, Config.from_dict(cfg))
    run(spark, Config.from_dict(cfg))  # the retry: must not double
    assert read_delta(spark, t).count() == 2
    cfg["target"]["options"]["txn_version"] = 2
    run(spark, Config.from_dict(cfg))  # a new batch id commits
    assert read_delta(spark, t).count() == 4


def test_el_iceberg_write_idempotent_txn(spark, tmp_path):
    """r9: the same retry contract on an Iceberg target — snapshot
    summary keys, the mechanism the streaming sink shares."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").write.parquet(src)
    t = str(tmp_path / "t")
    cfg = {
        "source": {"stream": src},
        "target": {"object": t,
                   "options": {"format": "iceberg",
                               "txn_app_id": "job8",
                               "txn_version": 1}},
        "mode": "incremental",
    }
    run(spark, Config.from_dict(cfg))
    r = run(spark, Config.from_dict(cfg))  # the retry
    assert r.rows == 0
    assert read_iceberg(spark, t).count() == 2
    cfg["target"]["options"]["txn_version"] = 2
    run(spark, Config.from_dict(cfg))
    assert read_iceberg(spark, t).count() == 4


def test_el_write_audit_publish(spark, tmp_path):
    """WAP EL load: the batch stages on the audit branch, the audit_sql
    gate decides publication — a pass fast-forwards main, a failure
    leaves main untouched with the branch intact for inspection."""
    import pytest as _pytest

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sinks.writers import AuditFailed
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, read_iceberg)

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").write.parquet(src)
    t = str(tmp_path / "t")

    cfg = Config.from_dict({
        "source": {"stream": src},
        "target": {"object": t, "options": {
            "format": "iceberg", "audit_branch": "audit",
            "audit_sql": "SELECT * FROM _audit WHERE id IS NULL"}},
        "mode": "full-refresh"})
    res = run(spark, cfg)
    assert res.rows == 2
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == {1, 2}
    _, meta = _current_metadata(t)
    assert "audit" in (meta.get("refs") or {})

    # failing audit: violations surface, main keeps the published state
    src2 = str(tmp_path / "src2.parquet")
    spark.createDataFrame(
        [(None, "BAD"), (3, "c")], "id long, v string").write.parquet(src2)
    cfg2 = Config.from_dict({
        "source": {"stream": src2},
        "target": {"object": t, "options": {
            "format": "iceberg", "audit_branch": "audit",
            "audit_sql": "SELECT * FROM _audit WHERE id IS NULL"}},
        "mode": "incremental"})
    cfg2.source.primary_key = ["id"]
    with _pytest.raises(AuditFailed, match="unpublished"):
        run(spark, cfg2)
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == {1, 2}
    # the staged rows are inspectable on the branch
    staged = read_iceberg(spark, t, ref="audit")
    assert staged.filter("id IS NULL").count() == 1


def test_el_wap_catalog_target(spark, tmp_path):
    """WAP through a catalog:// target (r10 — lifts the r8/r9
    refusal): the stage lands as a pointer-CAS commit whose main head
    is unchanged (branch-only), the gate decides publication, and the
    publish fast-forward is a second pointer CAS. A failing audit
    leaves the catalog's main view untouched with the staged branch
    inspectable THROUGH the pointer."""
    import pytest as _pytest

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sinks.writers import AuditFailed
    from sling_cli_spark.sources.iceberg_catalog import (
        _hint_version, _meta_version, _read_meta, open_catalog_url,
        read_table)
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    url = (f"catalog://ns.t?db={tmp_path}/cat.db"
           f"&warehouse={tmp_path}/wh")
    gate = "SELECT * FROM _audit WHERE id IS NULL"

    def cfg_for(src_path, mode="incremental"):
        c = Config.from_dict({
            "source": {"stream": src_path},
            "target": {"object": url, "options": {
                "format": "iceberg", "audit_branch": "audit",
                "audit_sql": gate}},
            "mode": mode})
        if mode == "incremental":
            c.source.primary_key = ["id"]
        return c

    src = str(tmp_path / "s.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .write.parquet(src)
    run(spark, cfg_for(src, mode="full-refresh"))
    cat, ident = open_catalog_url(url)
    assert {r["id"] for r in read_table(cat, spark, ident).collect()} \
        == {1, 2}
    ml = cat.load_table(ident)
    meta = _read_meta(ml)
    assert "audit" in (meta.get("refs") or {})
    # pointer and path hint agree after the two-CAS flow
    assert _hint_version(meta["location"]) == _meta_version(ml)

    # failing audit: pointer's MAIN head keeps the published state,
    # the staged branch is pointer-visible for inspection
    src2 = str(tmp_path / "s2.parquet")
    spark.createDataFrame(
        [(None, "BAD"), (3, "c")], "id long, v string").write.parquet(src2)
    with _pytest.raises(AuditFailed, match="unpublished"):
        run(spark, cfg_for(src2, mode="full-refresh"))
    assert {r["id"] for r in read_table(cat, spark, ident).collect()} \
        == {1, 2}
    meta2 = _read_meta(cat.load_table(ident))
    assert _hint_version(meta2["location"]) == \
        _meta_version(cat.load_table(ident))
    staged = read_iceberg(spark, meta2["location"], ref="audit")
    assert staged.filter("id IS NULL").count() == 1


def test_el_wap_catalog_merge_path(spark, tmp_path):
    """WAP + catalog on the lake-MERGE path: the branch-threaded merge
    commits under the pointer CAS, then the gate + fast-forward
    publish as a second CAS; a violating batch leaves the catalog main
    view at the published state."""
    import pytest as _pytest

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sinks.writers import AuditFailed
    from sling_cli_spark.sources.iceberg_catalog import (
        open_catalog_url, read_table)

    url = (f"catalog://ns.m?db={tmp_path}/cat.db"
           f"&warehouse={tmp_path}/wh")
    gate = "SELECT * FROM _audit WHERE v = 'BAD'"

    def cfg_for(src_path):
        return Config.from_dict({
            "source": {"stream": src_path, "primary_key": ["id"]},
            "target": {"object": url, "options": {
                "format": "iceberg", "audit_branch": "audit",
                "audit_sql": gate}},
            "mode": "incremental"})

    s1 = str(tmp_path / "m1.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").write.parquet(s1)
    run(spark, cfg_for(s1))
    cat, ident = open_catalog_url(url)
    assert {r["id"]: r["v"]
            for r in read_table(cat, spark, ident).collect()} \
        == {1: "a", 2: "b"}

    s2 = str(tmp_path / "m2.parquet")  # update + insert, passes gate
    spark.createDataFrame(
        [(2, "B2"), (3, "c")], "id long, v string").write.parquet(s2)
    res = run(spark, cfg_for(s2),
              target_df=read_table(cat, spark, ident))
    assert res.merge_stats is not None, "expected the lake-merge path"
    assert {r["id"]: r["v"]
            for r in read_table(cat, spark, ident).collect()} \
        == {1: "a", 2: "B2", 3: "c"}

    s3 = str(tmp_path / "m3.parquet")  # violating batch
    spark.createDataFrame(
        [(4, "BAD")], "id long, v string").write.parquet(s3)
    with _pytest.raises(AuditFailed):
        run(spark, cfg_for(s3), target_df=read_table(cat, spark, ident))
    assert {r["id"]: r["v"]
            for r in read_table(cat, spark, ident).collect()} \
        == {1: "a", 2: "B2", 3: "c"}


def test_el_wap_merge_path(spark, tmp_path):
    """WAP on the lake-MERGE path: an incremental upsert stages on the
    audit branch (merge_iceberg(branch=...) merges against the branch
    head), the gate passes, fast-forward publishes; a violating batch
    leaves main at the published state."""
    import pytest as _pytest

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sinks.writers import AuditFailed
    from sling_cli_spark.sources.iceberg_py import read_iceberg

    t = str(tmp_path / "t")
    gate = "SELECT * FROM _audit WHERE v = 'BAD'"

    def cfg_for(src_path):
        return Config.from_dict({
            "source": {"stream": src_path, "primary_key": ["id"]},
            "target": {"object": t, "options": {
                "format": "iceberg", "audit_branch": "audit",
                "audit_sql": gate}},
            "mode": "incremental"})

    s1 = str(tmp_path / "s1.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").write.parquet(s1)
    run(spark, cfg_for(s1))
    assert {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()} \
        == {1: "a", 2: "b"}

    s2 = str(tmp_path / "s2.parquet")  # update + insert, passes gate
    spark.createDataFrame(
        [(2, "B2"), (3, "c")], "id long, v string").write.parquet(s2)
    res = run(spark, cfg_for(s2), target_df=read_iceberg(spark, t))
    assert res.merge_stats is not None, "expected the lake-merge path"
    assert {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()} \
        == {1: "a", 2: "B2", 3: "c"}

    s3 = str(tmp_path / "s3.parquet")  # violating batch
    spark.createDataFrame(
        [(4, "BAD")], "id long, v string").write.parquet(s3)
    with _pytest.raises(AuditFailed):
        run(spark, cfg_for(s3), target_df=read_iceberg(spark, t))
    assert {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()} \
        == {1: "a", 2: "B2", 3: "c"}
    assert read_iceberg(spark, t, ref="audit") \
        .filter("v = 'BAD'").count() == 1


def test_el_replace_where_backfill_shape(spark, tmp_path):
    """r10: target option replace_where — a backfill reload of one
    range replaces exactly that range in ONE commit; a missing target
    degenerates to a plain create."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.delta_py import (
        latest_version, read_delta)

    src1 = str(tmp_path / "s1.parquet")
    spark.createDataFrame(
        [(i, i % 3, f"old{i}") for i in range(9)],
        "id long, day long, v string").write.parquet(src1)
    t = str(tmp_path / "t")
    # create through the replace_where path (no table yet)
    run(spark, Config.from_dict({
        "source": {"stream": src1},
        "target": {"object": t,
                   "options": {"format": "delta",
                               "replace_where": "day >= 0"}},
        "mode": "full-refresh"}))
    assert read_delta(spark, t).count() == 9
    # reload ONLY day=1 from a corrected source
    src2 = str(tmp_path / "s2.parquet")
    spark.createDataFrame(
        [(100, 1, "fixed")], "id long, day long, v string") \
        .write.parquet(src2)
    v_before = latest_version(t)
    run(spark, Config.from_dict({
        "source": {"stream": src2},
        "target": {"object": t,
                   "options": {"format": "delta",
                               "replace_where": "day = 1"}},
        "mode": "full-refresh"}))
    assert latest_version(t) == v_before + 1  # ONE commit
    got = {(r.id, r.day) for r in read_delta(spark, t).collect()}
    assert (100, 1) in got
    assert len([g for g in got if g[1] == 1]) == 1  # old day-1 gone
    assert len([g for g in got if g[1] != 1]) == 6  # others intact


def test_masked_source_backfill_prunes_partitions(spark, tmp_path):
    """{part_*}-masked SOURCE reads (runner.build_read_plan +
    files.read_masked_source): a backfill range expands the mask via
    generate_part_uris_from_range and opens ONLY matching partition
    dirs; row-level backfill_filter stays authoritative inside them."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import build_read_plan

    base = str(tmp_path / "events")
    out = base + "/{part_year_month(ts)}"
    df = spark.createDataFrame([
        Row(id=1, ts=datetime.datetime(2024, 1, 5), v="a"),
        Row(id=2, ts=datetime.datetime(2024, 2, 6), v="b"),
        Row(id=3, ts=datetime.datetime(2024, 3, 7), v="c"),
    ])
    write_files(df, Target(conn="local", object=out,
                           options=TargetOptions()),
                Mode.FULL_REFRESH, fmt="parquet")
    assert sorted(d for d in os.listdir(base)
                  if d.startswith("ts_year_month=")) == [
        "ts_year_month=2024-01", "ts_year_month=2024-02",
        "ts_year_month=2024-03"]

    cfg = Config.from_dict({
        "source": {"stream": base + "/{part_year_month}",
                   "update_key": "ts"},
        "target": {"object": str(tmp_path / "never")},
        "mode": "backfill"})
    plan = build_read_plan(
        spark, cfg,
        backfill_range=(datetime.datetime(2024, 1, 1),
                        datetime.datetime(2024, 2, 28)))
    rows = sorted(r["id"] for r in plan.collect())
    assert rows == [1, 2]
    # the March partition never appears in the scan
    scan = plan._jdf.queryExecution().executedPlan().toString()
    assert "2024-03" not in scan

    # no range (full read): mask degrades to a glob over every partition
    cfg2 = Config.from_dict({
        "source": {"stream": base + "/{part_year_month}"},
        "target": {"object": str(tmp_path / "never2")},
        "mode": "full-refresh"})
    assert build_read_plan(spark, cfg2).count() == 3


def test_json_target_inlines_declared_json_columns(spark, tmp_path):
    """datastream_test.go:68 TestEncodeRowAsJSONObject, through the EL
    surface: a `columns: {payload: json}` spec + JSON target inlines
    valid JSON raw, keeps invalid values quoted, literal 'null' and SQL
    NULL write as explicit JSON nulls, column order preserved."""
    import glob
    import json as _json

    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, '{"k":1}', "tail"), (2, "[1,2,3]", "t2"),
         (3, "null", "t3"), (4, None, "t4"), (5, "hello", "t5"),
         (6, "{not-json", "t6")],
        "id long, payload string, tag string").write.parquet(src)
    out = str(tmp_path / "o.jsonl")
    run(spark, Config.from_dict({
        "source": {"stream": src,
                   "options": {"columns": {"payload": "json"}}},
        "target": {"object": out, "options": {"format": "jsonl"}},
        "mode": "full-refresh"}))
    lines = []
    for p in sorted(glob.glob(out + "/part-*")):
        lines += [ln for ln in open(p).read().splitlines() if ln]
    by_id = {}
    for ln in lines:
        rec = _json.loads(ln)
        by_id[rec["id"]] = (rec, ln)
    assert by_id[1][0]["payload"] == {"k": 1}
    assert '"payload":{"k":1}' in by_id[1][1]          # inlined raw
    assert by_id[2][0]["payload"] == [1, 2, 3]
    assert by_id[3][0]["payload"] is None
    assert '"payload":null' in by_id[4][1]             # explicit null
    assert by_id[5][0]["payload"] == "hello"           # quoted
    assert by_id[6][0]["payload"] == "{not-json"       # malformed quoted
    # declared order preserved (not alphabetical)
    assert by_id[1][1].index('"id"') < by_id[1][1].index('"payload"') \
        < by_id[1][1].index('"tag"')
