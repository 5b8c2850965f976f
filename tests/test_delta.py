"""Protocol-level Delta table layer (sources/delta_py.py): log replay,
atomic commits, time travel, copy-on-write MERGE, vacuum."""

import glob
import json
import os

import pytest

from sling_cli_spark.config import MergeStrategy
from sling_cli_spark.sources.delta_py import (
    is_delta_table, latest_version, merge_delta, read_delta, replay_log,
    vacuum, write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_write_read_append_overwrite(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    assert v0 == 0 and is_delta_table(t)
    v1 = write_delta(_df(spark, [(3, "c")]), t, mode="append")
    assert v1 == 1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    write_delta(_df(spark, [(9, "z")]), t, mode="overwrite")
    assert {r["id"] for r in read_delta(spark, t).collect()} == {9}


def test_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    write_delta(_df(spark, [(3, "c")]), t, mode="overwrite")
    assert {r["id"] for r in read_delta(spark, t, version=0).collect()} == {1}
    assert {r["id"] for r in read_delta(spark, t, version=1).collect()} == {1, 2}
    assert {r["id"] for r in read_delta(spark, t).collect()} == {3}


def test_first_commit_has_protocol_and_metadata(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(x) for x in open(log0) if x.strip()]
    # commitInfo (timestamp, r7) leads, as delta-spark writes it
    assert actions[0]["commitInfo"]["timestamp"] > 0
    assert actions[1]["protocol"]["minReaderVersion"] == 1
    md = actions[2]["metaData"]
    assert md["format"]["provider"] == "parquet"
    assert "id" in json.loads(md["schemaString"])["fields"][0]["name"] \
        or json.loads(md["schemaString"])["fields"][0]["name"] == "id"


def test_concurrent_commit_conflict(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    from sling_cli_spark.sources.delta_py import _commit

    with pytest.raises(FileExistsError):
        _commit(t, 0, [{"add": {"path": "x", "size": 1,
                                "partitionValues": {},
                                "modificationTime": 0,
                                "dataChange": True}}])


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    t = str(tmp_path / "t")
    # 4 data files, ids clustered per file
    for lo in (0, 100, 200, 300):
        write_delta(
            spark.range(lo, lo + 100)
            .selectExpr("id", "cast(id as string) v").coalesce(1), t,
            mode="append")
    before = set(glob.glob(os.path.join(t, "part-*.parquet")))

    batch = spark.createDataFrame(
        [(150, "X"), (151, "X"), (999, "new")], "id long, v string")
    stats = merge_delta(spark, t, batch, "id")
    assert stats["touched"] == 1 and stats["version"] == 4
    after_active = set(replay_log(t)[1])
    # 3 of 4 original files still active, untouched on disk
    surviving = {os.path.basename(p) for p in before} & after_active
    assert len(surviving) == 3
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[150] == "X" and got[151] == "X" and got[999] == "new"
    assert len(got) == 401
    # old snapshot still readable (isolation)
    assert len(read_delta(spark, t, version=3).collect()) == 400


def test_merge_insert_strategy_appends_only(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    stats = merge_delta(
        spark, t, _df(spark, [(2, "DUP"), (3, "c")]), "id",
        strategy=MergeStrategy.INSERT)
    assert stats["touched"] == 0
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # no dup, 2 kept original


def test_vacuum_removes_unreferenced(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(_df(spark, [(2, "b")]), t, mode="overwrite")
    n_parquet = len(glob.glob(os.path.join(t, "*.parquet")))
    active = set(replay_log(t)[1])
    deleted = vacuum(t, keep_versions=1)
    assert len(deleted) == n_parquet - len(active) > 0
    assert len(glob.glob(os.path.join(t, "*.parquet"))) == len(active)
    assert {r["id"] for r in read_delta(spark, t).collect()} == {2}


def test_runner_routes_delta_merge(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    t = str(tmp_path / "dt")
    for lo in (0, 100):
        write_delta(
            spark.range(lo, lo + 100)
            .selectExpr("id", "cast(id as string) v", "id as ts")
            .coalesce(1), t, mode="append")

    src = tmp_path / "batch.csv"
    src.write_text("id,v,ts\n150,VX,2000\n")
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": t, "options": {"format": "delta"}},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=read_delta(spark, t))
    assert r.merge_stats is not None and r.merge_stats["touched"] == 1
    got = {x["id"]: x["v"] for x in read_delta(spark, t).collect()}
    assert got[150] == "VX" and len(got) == 200
    assert latest_version(t) == 2


def test_el_task_writes_delta_target(spark, tmp_path):
    from sling_cli_spark.config import Config, Source, SourceOptions
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.files import read_source

    t = str(tmp_path / "out_delta")
    cfg = Config.from_dict({
        "source": {"stream": "/root/testdata/sf0.001/region.parquet"},
        "target": {"object": t, "options": {"format": "delta"}},
        "mode": "full-refresh"})
    r = run(spark, cfg)
    assert r.rows == 5 and is_delta_table(t)
    back = read_source(spark, Source(
        stream=t, options=SourceOptions(format="delta")))
    assert back.count() == 5


def test_detect_format_table_dirs(spark, tmp_path):
    """A delta/iceberg dir read WITHOUT an explicit format must not be
    scanned as plain parquet (removed files would resurface)."""
    from sling_cli_spark.config import Source, SourceOptions
    from sling_cli_spark.sources.files import detect_format, read_source
    from sling_cli_spark.sources.iceberg_py import write_iceberg

    dt = str(tmp_path / "dt")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), dt)
    write_delta(_df(spark, [(9, "z")]), dt, mode="overwrite")
    assert detect_format(dt, SourceOptions()) == "delta"
    # auto-detected read sees only the live snapshot, not tombstoned files
    got = {r["id"] for r in read_source(spark, Source(stream=dt)).collect()}
    assert got == {9}

    it = str(tmp_path / "it")
    write_iceberg(_df(spark, [(5, "e")]), it)
    assert detect_format(it, SourceOptions()) == "iceberg"
    assert {r["id"] for r in read_source(spark, Source(stream=it)).collect()} == {5}


def test_cdc_stream_into_delta_target(spark, tmp_path):
    """Streaming CDC foreachBatch routes into the versioned delta merge."""
    import json as _json

    from pyspark.sql import types as T2

    from sling_cli_spark.streaming.cdc import read_file_stream, run_cdc_stream

    t = str(tmp_path / "dt")
    write_delta(spark.createDataFrame(
        [(1, "a", "I", 0), (2, "b", "I", 0)],
        "id long, v string, _sling_synced_op string, _sling_synced_seq long",
    ), t)

    src_dir = str(tmp_path / "cdc_in")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "b1.json"), "w") as f:
        for r in [
            {"id": 2, "v": "b2", "_sling_synced_op": "U",
             "_sling_synced_seq": 1},
            {"id": 1, "v": None, "_sling_synced_op": "D",
             "_sling_synced_seq": 1},
            {"id": 3, "v": "c", "_sling_synced_op": "I",
             "_sling_synced_seq": 1},
        ]:
            f.write(_json.dumps(r) + "\n")

    schema = T2.StructType([
        T2.StructField("id", T2.LongType()),
        T2.StructField("v", T2.StringType()),
        T2.StructField("_sling_synced_op", T2.StringType()),
        T2.StructField("_sling_synced_seq", T2.LongType()),
    ])
    stream = read_file_stream(spark, src_dir, schema, fmt="json")
    run_cdc_stream(spark, stream, t, "id",
                   checkpoint=str(tmp_path / "ckpt"))

    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {2: "b2", 3: "c"}  # 1 deleted, 2 updated, 3 inserted
    assert latest_version(t) >= 1  # the merge landed as a log commit
    # pre-stream snapshot still readable
    v0 = {r["id"] for r in read_delta(spark, t, version=0).collect()}
    assert v0 == {1, 2}


# ---------------------------------------------------------------- round 4

def test_partitioned_write_and_read(spark, tmp_path):
    t = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(1, "a", "2024-01"), (2, "b", "2024-01"), (3, "c", "2024-02")],
        "id long, v string, month string")
    write_delta(df, t, partition_by=["month"])
    # hive layout on disk + partitionValues in the log
    assert os.path.isdir(os.path.join(t, "month=2024-01"))
    _, files = replay_log(t)
    assert all(a["partitionValues"].get("month") for a in files.values())
    got = read_delta(spark, t)
    assert dict(got.dtypes)["month"] == "string"
    assert {(r["id"], r["month"]) for r in got.collect()} == {
        (1, "2024-01"), (2, "2024-01"), (3, "2024-02")}


def test_partitioned_merge_prunes_untouched_partitions(spark, tmp_path):
    t = str(tmp_path / "pt")
    df = spark.range(0, 300).selectExpr(
        "id", "cast(id as string) v", "cast(id % 3 as string) bucket") \
        .repartition(3, "bucket")
    write_delta(df, t, partition_by=["bucket"])
    _, before = replay_log(t)
    untouched_before = {p for p, a in before.items()
                       if a["partitionValues"]["bucket"] != "1"}

    batch = spark.createDataFrame(
        [(1, "X", "1"), (4, "Y", "1")], "id long, v string, bucket string")
    stats = merge_delta(spark, t, batch, "id")
    # only bucket=1 files rewritten; other partitions' files untouched
    _, after = replay_log(t)
    assert untouched_before <= set(after)
    for p in stats and after:
        if after[p]["partitionValues"]["bucket"] != "1":
            assert p in before
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[1] == "X" and got[4] == "Y" and len(got) == 300


def test_checkpoint_written_and_used(spark, tmp_path):
    from sling_cli_spark.sources import delta_py

    t = str(tmp_path / "cp")
    for i in range(12):
        write_delta(_df(spark, [(i, f"v{i}")]), t, mode="append")
    cp = os.path.join(t, "_delta_log", f"{10:020d}.checkpoint.parquet")
    last = os.path.join(t, "_delta_log", "_last_checkpoint")
    assert os.path.isfile(cp) and os.path.isfile(last)
    assert json.loads(open(last).read())["version"] == 10

    # replay equals full-json state and only reads the tail
    meta, files = replay_log(t)
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == set(range(12))

    # tamper: hide the pre-checkpoint json commits; replay must still work
    # (checkpoint + tail is sufficient -> proves the cp is actually used)
    for v in range(10):
        os.rename(os.path.join(t, "_delta_log", f"{v:020d}.json"),
                  os.path.join(t, "_delta_log", f"{v:020d}.json.bak"))
    meta2, files2 = delta_py.replay_log(t)
    assert set(files2) == set(files)
    for v in range(10):
        os.rename(os.path.join(t, "_delta_log", f"{v:020d}.json.bak"),
                  os.path.join(t, "_delta_log", f"{v:020d}.json"))


def test_time_travel_before_checkpoint(spark, tmp_path):
    t = str(tmp_path / "cp2")
    for i in range(12):
        write_delta(_df(spark, [(i, f"v{i}")]), t, mode="append")
    assert {r["id"] for r in read_delta(spark, t, version=4).collect()} \
        == set(range(5))


def test_file_uri_via_hadoop_fs_route(spark, tmp_path):
    """The whole delta lifecycle through JvmFS (file: URI => Hadoop
    FileSystem API), proving the fallback layer works off plain os.*."""
    from sling_cli_spark.fsio import JvmFS, get_fs

    t = "file://" + str(tmp_path / "uri_t")
    assert isinstance(get_fs(t), JvmFS)
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    assert is_delta_table(t)
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    stats = merge_delta(
        spark, t, _df(spark, [(2, "X"), (9, "new")]), "id")
    assert stats["touched"] >= 1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[2] == "X" and got[9] == "new" and got[1] == "a"
    # and the exclusive-create commit guard holds over JvmFS too
    from sling_cli_spark.sources.delta_py import _commit
    with pytest.raises(FileExistsError):
        _commit(t, 0, [{"add": {"path": "x", "size": 1,
                                "partitionValues": {},
                                "modificationTime": 0,
                                "dataChange": True}}])


def test_delete_missing_hard_touches_only_vanished_files(spark, tmp_path):
    """delete_missing as a CoW commit: only files holding a PK absent
    from the keyset rewrite; fully-present files carry forward."""
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = str(tmp_path / "t")
    for lo in (0, 100, 200, 300):
        write_delta(
            spark.range(lo, lo + 100)
            .selectExpr("id", "cast(id as string) v").coalesce(1), t,
            mode="append")
    before = set(glob.glob(os.path.join(t, "part-*.parquet")))
    # keyset covers 0..249 -> files [0,100) and [100,200) untouched;
    # [200,300) partially gone, [300,400) entirely gone
    keyset = spark.range(0, 250).selectExpr("id")
    stats = delete_missing_delta(spark, t, keyset, "id")
    assert stats["touched"] == 2
    after_active = set(replay_log(t)[1])
    surviving = {os.path.basename(p) for p in before} & after_active
    assert len(surviving) == 2
    ids = {r["id"] for r in read_delta(spark, t).collect()}
    assert ids == set(range(250))


def test_delete_missing_soft_flags_rows(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    keyset = _df(spark, [(1, "_"), (3, "_")])
    stats = delete_missing_delta(spark, t, keyset, "id", soft=True)
    assert stats["touched"] == 1
    got = {r["id"]: r["_sling_synced_op"]
           for r in read_delta(spark, t).collect()}
    assert got[2] == "D" and len(got) == 3


def test_runner_routes_lake_delete_missing(spark, tmp_path):
    """An incremental+merge run with delete_missing on a Delta target
    commits the delete as a second CoW action (no swap rewrite)."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run

    src = str(tmp_path / "src.parquet")
    tgt = str(tmp_path / "tgt")
    spark.range(0, 100).selectExpr("id", "cast(id as string) v") \
        .write.parquet(src)
    write_delta(
        spark.range(0, 120).selectExpr("id", "cast(id as string) v"), tgt)
    cfg = Config.from_dict({
        "source": {"stream": src, "primary_key": ["id"]},
        "target": {"object": tgt,
                   "options": {"format": "delta",
                               "delete_missing": "hard"}},
        "mode": "incremental",
    })
    res = run(spark, cfg, target_df=read_delta(spark, tgt))
    assert res.merge_stats["delete_missing"]["touched"] >= 1
    ids = {r["id"] for r in read_delta(spark, tgt).collect()}
    assert ids == set(range(100))


def test_merge_batch_with_new_column_evolves_schema(spark, tmp_path):
    """A merge batch carrying a new column widens the table schema in
    the same commit; untouched files read the column as null (delta
    mergeSchema semantics)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    batch = spark.createDataFrame(
        [(2, "B", "x"), (9, "new", "y")], "id long, v string, extra string")
    merge_delta(spark, t, batch, "id")
    got = {r["id"]: (r["v"], r["extra"])
           for r in read_delta(spark, t).collect()}
    assert got[2] == ("B", "x") and got[9] == ("new", "y")
    assert got[1] == ("a", None)  # pre-evolution file null-fills


def test_append_with_new_column_evolves_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(
        spark.createDataFrame([(2, "b", 7)], "id long, v string, n long"),
        t, mode="append")
    got = {r["id"]: r["n"] for r in read_delta(spark, t).collect()}
    assert got[2] == 7 and got[1] is None


def test_overwrite_replaces_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(
        spark.createDataFrame([(5, 1.5)], "id long, score double"),
        t, mode="overwrite")
    out = read_delta(spark, t)
    assert set(out.columns) == {"id", "score"}
    assert out.collect()[0]["score"] == 1.5


def test_concurrent_append_retries_to_next_version(spark, tmp_path):
    """Two appends race for the same version: the loser re-claims the
    next one instead of failing (pure appends never conflict)."""
    from sling_cli_spark.sources.delta_py import _commit, _stage_data_files

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    # simulate a racer claiming version 1 between read and commit
    _commit(t, 1, _stage_data_files(_df(spark, [(50, "r")]), t, None))
    # this append computed version 1 internally but must land at 2
    v = write_delta(_df(spark, [(2, "b")]), t, mode="append")
    assert v == 2
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {1, 2, 50}


def test_concurrent_rewrite_conflict_raises(spark, tmp_path):
    """A merge whose touched file was concurrently rewritten must raise
    ConcurrentModificationError, not silently drop the other commit."""
    from sling_cli_spark.sources.delta_py import (
        ConcurrentModificationError, _commit_with_retry, replay_log)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    _, active = replay_log(t)
    victim = sorted(active)[0]
    # racer rewrites the file first (remove+add at version 1)
    merge_delta(spark, t, _df(spark, [(1, "RACER")]), "id")
    with pytest.raises(ConcurrentModificationError):
        _commit_with_retry(t, 1, [
            {"remove": {"path": victim, "deletionTimestamp": 0,
                        "dataChange": True}}])


def test_optimize_compacts_small_files(spark, tmp_path):
    """OPTIMIZE twin: many per-commit small files bin-pack into few,
    rows identical, commit is dataChange=false, history intact."""
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = str(tmp_path / "t")
    for i in range(6):  # CDC-cadence: one small file per commit
        write_delta(_df(spark, [(i, f"v{i}")]).coalesce(1), t,
                    mode="append")
    before_active = set(replay_log(t)[1])
    assert len(before_active) == 6
    stats = optimize_delta(spark, t, target_file_bytes=1 << 20)
    assert stats["compacted"] == 6 and stats["new_files"] == 1
    _, after = replay_log(t)
    assert len(after) == 1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {i: f"v{i}" for i in range(6)}
    # pre-optimize version still readable (time travel)
    assert len(read_delta(spark, t, version=5).collect()) == 6
    # the compaction commit carries dataChange: false
    log = os.path.join(t, "_delta_log", f"{stats['version']:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    assert all(a[k]["dataChange"] is False
               for a in acts for k in a if k in ("add", "remove"))


def test_optimize_partitioned_compacts_within_partition(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = str(tmp_path / "t")
    for i in range(4):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b")], "id long, cat string")
        write_delta(df, t, mode="append",
                    partition_by=["cat"] if i == 0 else None)
    stats = optimize_delta(spark, t, target_file_bytes=1 << 20)
    assert stats["compacted"] == 4
    _, files = replay_log(t)
    parts = {tuple(sorted(a.get("partitionValues", {}).items()))
             for a in files.values()}
    assert parts == {(("cat", "a"),), (("cat", "b"),)}
    got = {(r["id"], r["cat"]) for r in read_delta(spark, t).collect()}
    assert got == {(0, "a"), (1, "b"), (2, "a"), (3, "b")}


def test_reader_protocol_v3_refused(spark, tmp_path):
    """A foreign table requiring a reader v3 feature we don't implement
    (e.g. collations) must refuse loudly — replaying anyway would
    return wrong rows (PROTOCOL.md Reader Requirements). deletionVectors,
    columnMapping, timestampNtz, and variantType are supported and no
    longer refuse."""
    from sling_cli_spark.sources.delta_py import UnsupportedTableFeature

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    # foreign writer upgrades the table protocol in a later commit
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["collations"],
        }}) + "\n")
    with pytest.raises(UnsupportedTableFeature, match="collations"):
        read_delta(spark, t)
    with pytest.raises(UnsupportedTableFeature):
        replay_log(t)
    # time travel to BEFORE the upgrade still works
    assert {r["id"] for r in read_delta(spark, t, version=0).collect()} \
        == {1, 2}


def test_column_mapping_name_mode_read(spark, tmp_path):
    """A foreign name-mapped table (reader protocol v2): parquet files
    store physical names (col-xxxx) at every nesting level; the read
    projects them back to logical names, including nested structs."""
    t = str(tmp_path / "t")
    os.makedirs(t)
    # physical data file
    spark.createDataFrame(
        [(1, "a", (10, "x")), (2, "b", (20, "y"))],
        "`col-aa` long, `col-bb` string, "
        "`col-cc` struct<`col-dd`: long, `col-ee`: string>",
    ).coalesce(1).write.parquet(t + "/files")
    part = [f for f in os.listdir(t + "/files") if f.endswith(".parquet")][0]
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aa"}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bb"}},
            {"name": "nested", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "n", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "col-dd"}},
                 {"name": "s", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 5,
                               "delta.columnMapping.physicalName": "col-ee"}},
             ]},
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-cc"}},
        ],
    }
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "files/" + part, "size": 1, "partitionValues": {},
            "modificationTime": 0, "dataChange": True}}) + "\n")

    got = read_delta(spark, t)
    assert got.columns == ["id", "v", "nested"]
    assert got.schema["nested"].dataType.fieldNames() == ["n", "s"]
    rows = {r["id"]: (r["v"], r["nested"]["n"], r["nested"]["s"])
            for r in got.collect()}
    assert rows == {1: ("a", 10, "x"), 2: ("b", 20, "y")}


def _write_id_mode_table(spark, t, file_col_names=True):
    """Fixture: an ``id``-mapped table whose parquet column NAMES match
    neither the logical nor the recorded physical names — only the
    parquet field ids line up with ``delta.columnMapping.id``, so a
    correct read MUST resolve by id (PROTOCOL.md Column Mapping)."""
    from pyspark.sql import types as T

    os.makedirs(t)
    fields = T.StructType([
        T.StructField("junk-a", T.LongType(), True, {"parquet.field.id": 1}),
        T.StructField("junk-b", T.StringType(), True,
                      {"parquet.field.id": 2}),
        T.StructField("junk-c", T.StructType([
            T.StructField("junk-d", T.LongType(), True,
                          {"parquet.field.id": 4}),
            T.StructField("junk-e", T.StringType(), True,
                          {"parquet.field.id": 5}),
        ]), True, {"parquet.field.id": 3}),
    ])
    spark.createDataFrame(
        [(1, "a", (10, "x")), (2, "b", (20, "y"))], fields,
    ).coalesce(1).write.parquet(t + "/files")
    part = [f for f in os.listdir(t + "/files") if f.endswith(".parquet")][0]
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-nope1"}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-nope2"}},
            {"name": "nested", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "n", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "col-n4"}},
                 {"name": "s", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 5,
                               "delta.columnMapping.physicalName": "col-n5"}},
             ]},
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-nope3"}},
        ],
    }
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "files/" + part, "size": 1, "partitionValues": {},
            "modificationTime": 0, "dataChange": True}}) + "\n")
    return schema


def test_column_mapping_id_mode_read(spark, tmp_path):
    """id-mapped table: columns resolve by parquet FIELD ID even when
    every name (logical, physical, on-disk) disagrees — the resolution
    PROTOCOL.md mandates for id mode, via Spark's native
    fieldId.read path. Nested struct fields resolve by id too."""
    t = str(tmp_path / "t")
    _write_id_mode_table(spark, t)
    got = read_delta(spark, t)
    assert got.columns == ["id", "v", "nested"]
    assert got.schema["nested"].dataType.fieldNames() == ["n", "s"]
    rows = {r["id"]: (r["v"], r["nested"]["n"], r["nested"]["s"])
            for r in got.collect()}
    assert rows == {1: ("a", 10, "x"), 2: ("b", 20, "y")}


def test_column_mapping_id_mode_incomplete_refuses(spark, tmp_path):
    """A field without delta.columnMapping.id in an id-mapped table is
    a broken mapping -> loud refusal, never a silent null column."""
    from sling_cli_spark.sources.delta_py import UnsupportedTableFeature

    t = str(tmp_path / "a")
    _write_id_mode_table(spark, t)
    # strip the id from one field in a new metadata commit
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(ln) for ln in open(log0)]
    md = next(a for a in actions if "metaData" in a)["metaData"]
    schema = json.loads(md["schemaString"])
    del schema["fields"][1]["metadata"]["delta.columnMapping.id"]
    md["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": md}) + "\n")
    with pytest.raises(UnsupportedTableFeature, match="no delta.column"):
        read_delta(spark, t).collect()


def test_column_mapping_partitioned_read(spark, tmp_path):
    """Partitioned + column-mapped: partition values come from
    add.partitionValues (physical keys), attached as typed literals —
    data files hold no partition column and live in opaque dirs."""
    t = str(tmp_path / "t")
    os.makedirs(t)
    # two physical data files, NO partition column inside
    for sub, vals in (("f1", [(1, "a"), (2, "b")]), ("f2", [(3, "c")])):
        spark.createDataFrame(vals, "`col-aa` long, `col-bb` string") \
            .coalesce(1).write.parquet(f"{t}/{sub}")
    parts = {sub: [f for f in os.listdir(f"{t}/{sub}")
                   if f.endswith(".parquet")][0] for sub in ("f1", "f2")}
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-aa"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-bb"}},
        {"name": "day", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-pp"}},
    ]}
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["day"],
            "configuration": {"delta.columnMapping.mode": "name"},
        }}) + "\n")
        for sub, day in (("f1", "7"), ("f2", "9")):
            f.write(json.dumps({"add": {
                "path": f"{sub}/{parts[sub]}", "size": 1,
                "partitionValues": {"col-pp": day},
                "modificationTime": 0, "dataChange": True}}) + "\n")

    got = read_delta(spark, t)
    assert got.columns == ["id", "v", "day"]
    rows = {r["id"]: (r["v"], r["day"]) for r in got.collect()}
    assert rows == {1: ("a", 7), 2: ("b", 7), 3: ("c", 9)}


def test_column_mapping_id_mode_partitioned_read(spark, tmp_path):
    """Partitioned + id-mapped: data columns resolve by parquet field
    id, partition values still come from add.partitionValues under the
    physical key."""
    from pyspark.sql import types as T

    t = str(tmp_path / "t")
    os.makedirs(t)
    dfields = T.StructType([
        T.StructField("junk-a", T.LongType(), True, {"parquet.field.id": 1}),
        T.StructField("junk-b", T.StringType(), True,
                      {"parquet.field.id": 2}),
    ])
    for sub, vals in (("f1", [(1, "a"), (2, "b")]), ("f2", [(3, "c")])):
        spark.createDataFrame(vals, dfields) \
            .coalesce(1).write.parquet(f"{t}/{sub}")
    parts = {sub: [f for f in os.listdir(f"{t}/{sub}")
                   if f.endswith(".parquet")][0] for sub in ("f1", "f2")}
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-x1"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-x2"}},
        {"name": "day", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-pp"}},
    ]}
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["day"],
            "configuration": {"delta.columnMapping.mode": "id"},
        }}) + "\n")
        for sub, day in (("f1", "7"), ("f2", "9")):
            f.write(json.dumps({"add": {
                "path": f"{sub}/{parts[sub]}", "size": 1,
                "partitionValues": {"col-pp": day},
                "modificationTime": 0, "dataChange": True}}) + "\n")

    got = read_delta(spark, t)
    assert got.columns == ["id", "v", "day"]
    rows = {r["id"]: (r["v"], r["day"]) for r in got.collect()}
    assert rows == {1: ("a", 7), 2: ("b", 7), 3: ("c", 9)}


def test_reader_v3_with_column_mapping_feature_allowed(spark, tmp_path):
    """v3 protocol whose readerFeatures list only columnMapping is
    readable; unsupported features still refuse (see
    test_reader_protocol_v3_refused)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["columnMapping"]}}) + "\n")
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1}


def test_multipart_checkpoint_read(spark, tmp_path):
    """Foreign writers split big checkpoints into
    NNN.checkpoint.<part>.<parts>.parquet; the parts union to one
    state. The JSON logs at/before the checkpoint are deleted, so a
    fallback replay CANNOT reconstruct the rows — only the multi-part
    read can."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sling_cli_spark.sources.delta_py import replay_log

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    meta, files = replay_log(t)
    assert len(files) >= 2
    adds = [files[p] for p in sorted(files)]

    log = os.path.join(t, "_delta_log")
    meta_t = pa.struct([
        ("id", pa.string()), ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string()))])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_())])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])

    def add_cell(a):
        return {"path": a["path"],
                "partitionValues": a.get("partitionValues") or {},
                "size": a.get("size", 0), "modificationTime": 0,
                "dataChange": False}

    # part 1: protocol + metaData + first add; part 2: remaining adds
    part1 = pa.table({
        "protocol": pa.array(
            [{"minReaderVersion": 1, "minWriterVersion": 2}, None, None],
            type=proto_t),
        "metaData": pa.array([None, {
            "id": "m", "schemaString": meta["schemaString"],
            "partitionColumns": []}, None], type=meta_t),
        "add": pa.array([None, None, add_cell(adds[0])], type=add_t)})
    part2 = pa.table({
        "protocol": pa.array([None] * len(adds[1:]), type=proto_t),
        "metaData": pa.array([None] * len(adds[1:]), type=meta_t),
        "add": pa.array([add_cell(a) for a in adds[1:]], type=add_t)})
    v = 1  # checkpoint at the latest version
    pq.write_table(part1, os.path.join(
        log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(part2, os.path.join(
        log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": 3 + len(adds[1:]), "parts": 2}, f)
    for j in (0, 1):  # force the checkpoint path
        os.remove(os.path.join(log, f"{j:020d}.json"))

    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b"}


def test_writer_protocol_gating(spark, tmp_path):
    """Appends/merges to a foreign table with an unsupported writer
    protocol refuse; v7 with only supported writerFeatures is fine."""
    from sling_cli_spark.sources.delta_py import UnsupportedTableFeature

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
    with pytest.raises(UnsupportedTableFeature, match="writer protocol v4"):
        write_delta(_df(spark, [(2, "b")]), t, mode="append")
    with pytest.raises(UnsupportedTableFeature):
        merge_delta(spark, t, _df(spark, [(1, "x")]), "id")
    # reads still fine (reader protocol v1)
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1}

    # v7 whose writerFeatures are all supported -> append allowed
    with open(log, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly"]}}) + "\n")
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 2}


def test_append_only_table_refuses_removes(spark, tmp_path):
    """delta.appendOnly=true: appends fine; overwrite/merge/optimize
    (anything committing removes) refuses."""
    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, optimize_delta, replay_log)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    meta, _ = replay_log(t)
    new_meta = dict(meta)
    new_meta["configuration"] = {"delta.appendOnly": "true"}
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")

    write_delta(_df(spark, [(2, "b")]), t, mode="append")  # ok
    with pytest.raises(UnsupportedTableFeature, match="append-only"):
        write_delta(_df(spark, [(9, "z")]), t, mode="overwrite")
    with pytest.raises(UnsupportedTableFeature, match="append-only"):
        merge_delta(spark, t, _df(spark, [(1, "x")]), "id")
    with pytest.raises(UnsupportedTableFeature, match="append-only"):
        optimize_delta(spark, t, target_file_bytes=1 << 20)
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 2}


# ---------------------------------------------------------- deletion vectors

def test_dv_codec_roundtrip():
    """z85 + RoaringBitmapArray serialize/parse roundtrip across array,
    bitmap, and multi-key (high-bits) containers."""
    from sling_cli_spark.sources import delta_dv as dv

    raw = bytes(range(16))
    assert dv.z85_decode(dv.z85_encode(raw)) == raw
    for idxs in ([], [0], [5, 1, 7, 5], list(range(5000)),
                 [2 ** 32 + 5, 3, 70000], list(range(0, 200000, 3))):
        got = dv.deserialize_bitmap(dv.serialize_bitmap(idxs)).tolist()
        assert got == sorted(set(idxs))


def test_dv_parses_run_containers():
    """Foreign writers may emit run containers (cookie 12347); the parser
    must read them even though our writer never produces them."""
    import struct

    import numpy as np

    from sling_cli_spark.sources import delta_dv as dv

    # hand-build: 1 bitmap, 1 run container [10, 14] (5 values)
    rb = struct.pack("<i", (0 << 16) | 12347)  # cookie, n-1=0
    rb += b"\x01"  # run bitset: container 0 is a run
    rb += struct.pack("<HH", 0, 4)  # key 0, card-1 = 4
    rb += struct.pack("<H", 1)  # 1 run
    rb += struct.pack("<HH", 10, 4)  # start 10, len-1 = 4
    data = struct.pack("<iq", 1681511377, 1) + rb
    assert dv.deserialize_bitmap(data).tolist() == [10, 11, 12, 13, 14]


def test_dv_read_applies_deletes(spark, tmp_path):
    """End-to-end merge-on-read: attach a DV, deleted ordinals vanish,
    time travel to the pre-DV version still sees them."""
    from sling_cli_spark.sources import delta_dv as dv

    t = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "cast(id as string) v")
    write_delta(df.coalesce(1), t)
    (rel,) = replay_log(t)[1].keys()
    dv.add_deletion_vectors(t, {rel: [0, 3, 50, 99]})
    ids = {r["id"] for r in read_delta(spark, t).collect()}
    assert len(ids) == 96 and not ids & {0, 3, 50, 99}
    assert read_delta(spark, t, version=0).count() == 100


def test_dv_checkpoint_roundtrips_descriptor_and_protocol(spark, tmp_path):
    """A checkpoint of a DV-bearing table must carry the descriptors AND
    the v3/v7 feature protocol — dropping either silently corrupts the
    table for checkpoint-based readers (r6 ADVICE)."""
    import sling_cli_spark.fsio as fsio
    from sling_cli_spark.sources import delta_dv as dv
    from sling_cli_spark.sources.delta_py import (
        _read_checkpoint, _write_checkpoint, latest_version)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, "x") for i in range(10)]).coalesce(1), t)
    (rel,) = replay_log(t)[1].keys()
    dv.add_deletion_vectors(t, {rel: [1, 2]})
    v = latest_version(t)
    fs = fsio.get_fs(t)
    _write_checkpoint(t, fs, v)
    meta, files, protocol = _read_checkpoint(t, fs, v)
    assert protocol["minReaderVersion"] == 3
    assert protocol["readerFeatures"] == ["deletionVectors"]
    assert files[rel]["deletionVector"]["cardinality"] == 2
    # and a reader that starts from the checkpoint applies the DV
    ids = {r["id"] for r in read_delta(spark, t).collect()}
    assert ids == set(range(10)) - {1, 2}


def test_dv_checkpoint_roundtrips_configuration(spark, tmp_path):
    """metaData.configuration (delta.appendOnly etc.) must survive a
    checkpoint (r6 ADVICE: it was dropped, disabling the gates)."""
    import sling_cli_spark.fsio as fsio
    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, _read_checkpoint, _write_checkpoint,
        latest_version)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    meta, _ = replay_log(t)
    new_meta = dict(meta)
    new_meta["configuration"] = {"delta.appendOnly": "true"}
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    fs = fsio.get_fs(t)
    _write_checkpoint(t, fs, latest_version(t))
    meta2, _, _ = _read_checkpoint(t, fs, latest_version(t))
    assert meta2["configuration"] == {"delta.appendOnly": "true"}
    with pytest.raises(UnsupportedTableFeature, match="append-only"):
        write_delta(_df(spark, [(9, "z")]), t, mode="overwrite")


def test_dv_corrupt_checksum_fails_loudly(spark, tmp_path):
    """A DV whose bytes don't match its CRC must raise, not silently
    under-delete."""
    from sling_cli_spark.sources import delta_dv as dv

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, "x") for i in range(10)]).coalesce(1), t)
    (rel,) = replay_log(t)[1].keys()
    dv.add_deletion_vectors(t, {rel: [1, 2]})
    binp = glob.glob(os.path.join(t, "ab", "deletion_vector_*.bin"))[0]
    blob = bytearray(open(binp, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the checksum
    open(binp, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="checksum|cardinality"):
        read_delta(spark, t).collect()


def test_dv_with_column_mapping_reads(spark, tmp_path):
    """DV + column mapping combined (the default Databricks table
    shape: columnMapping=name AND deletionVectors enabled): the DV
    anti-join runs on the raw physical scan, then the projection maps
    back to logical names. The DV commit's protocol upgrade carries
    the implicit columnMapping requirement forward as a v3 feature."""
    from sling_cli_spark.sources import delta_dv as dv
    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    os.makedirs(t)
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)],
        "`col-aa` long, `col-bb` string",
    ).orderBy("`col-aa`").coalesce(1).write.parquet(t + "/files")
    part = [f for f in os.listdir(t + "/files") if f.endswith(".parquet")][0]
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aa"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bb"}},
    ]}
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "files/" + part, "size": 1, "partitionValues": {},
            "modificationTime": 0, "dataChange": True}}) + "\n")
    # sanity: mapped read before the DV
    assert {r["id"] for r in read_delta(spark, t).collect()} == set(range(10))

    dv.add_deletion_vectors(t, {"files/" + part: [0, 3, 7]})
    prot = D._replay_state(t)[2]
    assert set(prot["readerFeatures"]) >= {"columnMapping",
                                           "deletionVectors"}
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert set(got) == set(range(10)) - {0, 3, 7}
    assert got[1] == "v1"


def test_writer_enforces_column_invariants(spark, tmp_path):
    """Writer v2 obliges invariant enforcement (PROTOCOL.md §Column
    Invariants; refusal upgraded to enforcement in r8): a passing batch
    commits, a violating batch fails BEFORE commit with the typed
    error, and NULL passes (SQL CHECK semantics)."""
    from sling_cli_spark.sources.delta_py import (
        InvariantViolation, read_delta)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    schema["fields"][0]["metadata"] = {
        "delta.invariants": '{"expression":{"expression":"id > 0"}}'}
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    # passing batch commits
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    # NULL invariant result passes (null > 0 -> null, not FALSE)
    write_delta(spark.createDataFrame([(None, "n")], "id long, v string"),
                t, mode="append")
    v_before = latest_version(t)
    with pytest.raises(InvariantViolation, match="id > 0"):
        write_delta(_df(spark, [(-3, "bad")]), t, mode="append")
    assert latest_version(t) == v_before, "violating batch must not commit"
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {1, 2, None}


def test_physical_fields_recurse_into_array_and_map():
    """Column-mapping physical names nested under array<struct> and
    map<...,struct> must be applied (r6 ADVICE: only direct struct
    nesting recursed, nested fields read as null)."""
    from sling_cli_spark.sources.delta_py import _physical_fields

    fields = [
        {"name": "arr", "type": {
            "type": "array", "containsNull": True,
            "elementType": {"type": "struct", "fields": [
                {"name": "x", "type": "long", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.physicalName": "col-x"}}]}},
         "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-arr"}},
        {"name": "m", "type": {
            "type": "map", "valueContainsNull": True, "keyType": "string",
            "valueType": {"type": "struct", "fields": [
                {"name": "y", "type": "string", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.physicalName": "col-y"}}]}},
         "nullable": True, "metadata": {}},
    ]
    out = _physical_fields(fields)
    assert out[0]["name"] == "col-arr"
    assert out[0]["type"]["elementType"]["fields"][0]["name"] == "col-x"
    assert out[1]["type"]["valueType"]["fields"][0]["name"] == "col-y"


def test_dv_read_via_file_uri(spark, tmp_path):
    """DV-bearing table addressed by a file:// URI (the JvmFS path):
    the table-relative join key and the driver-side fsio blob pre-read
    must line up — a path-normalization mismatch would silently
    resurrect every deleted row (r7 review)."""
    from sling_cli_spark.sources import delta_dv as dv

    local = str(tmp_path / "t")
    df = spark.range(0, 50).selectExpr("id", "cast(id as string) v")
    write_delta(df.coalesce(1), local)
    (rel,) = replay_log(local)[1].keys()
    dv.add_deletion_vectors(local, {rel: [7, 8, 9]})

    uri = "file://" + local
    got = {r["id"] for r in read_delta(spark, uri).collect()}
    assert len(got) == 47 and not got & {7, 8, 9}


def test_dv_merge_no_resurrection_and_kept_file_mor(spark, tmp_path):
    """merge into a DV-bearing table (writer feature deletionVectors):
    the replacement is computed from the DV-applied scan (a deleted row
    must not resurrect into the rewrite), the KEPT file's DV survives
    the commit, and the remove action carries the descriptor."""
    import json as _json

    from sling_cli_spark.sources import delta_dv as dv
    from sling_cli_spark.sources.delta_py import merge_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string").coalesce(1), t)
    write_delta(spark.createDataFrame(
        [(10, "j"), (11, "k")], "id long, v string").coalesce(1), t)
    _, files = replay_log(t)
    # find per-file victims by reading each file's ids
    by_rel = {rel: {r["id"] for r in
                    spark.read.parquet(str(tmp_path / "t" / rel)).collect()}
              for rel in files}
    rel_a = next(r for r, ids in by_rel.items() if 2 in ids)
    rel_b = next(r for r, ids in by_rel.items() if 11 in ids)
    # positions: id order == write order within each coalesced file
    dv.add_deletion_vectors(t, {rel_a: [1], rel_b: [1]})  # deletes 2, 11
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 3, 10}

    batch = spark.createDataFrame([(3, "X"), (9, "n")], "id long, v string")
    stats = merge_delta(spark, t, batch, "id")
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    # 2 must NOT resurrect (its file was rewritten DV-applied);
    # 11 stays deleted via the kept file's carried DV
    assert got == {1: "a", 3: "X", 9: "n", 10: "j"}
    assert stats["touched"] == 1
    # the commit's remove carried the descriptor
    log_files = sorted((tmp_path / "t" / "_delta_log").glob("*.json"))
    last = log_files[-1].read_text().splitlines()
    removes = [_json.loads(l)["remove"] for l in last
               if '"remove"' in l and "remove" in _json.loads(l)]
    assert any(r.get("deletionVector") for r in removes)


def test_dv_delete_missing_applies_dvs(spark, tmp_path):
    from sling_cli_spark.sources import delta_dv as dv
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = str(tmp_path / "t")
    write_delta(spark.range(0, 10).selectExpr(
        "id", "cast(id as string) v").coalesce(1), t)
    (rel,) = replay_log(t)[1].keys()
    dv.add_deletion_vectors(t, {rel: [0]})  # id 0 deleted
    keyset = spark.range(0, 5).selectExpr("id")
    delete_missing_delta(spark, t, keyset, "id")
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {1, 2, 3, 4}  # 0 stays gone, 5..9 removed


def test_dv_optimize_materializes_logical_rows(spark, tmp_path):
    from sling_cli_spark.sources import delta_dv as dv
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").coalesce(1), t)
    write_delta(spark.createDataFrame(
        [(3, "c")], "id long, v string").coalesce(1), t)
    _, files = replay_log(t)
    rel = next(r for r in files
               if 1 in {x["id"] for x in
                        spark.read.parquet(str(tmp_path / "t" / r)).collect()})
    dv.add_deletion_vectors(t, {rel: [0]})  # id 1 deleted
    res = optimize_delta(spark, t, min_files=2)
    assert res["compacted"] >= 2
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {2, 3}
    # compaction dropped every descriptor (logical rows materialized)
    _, active = replay_log(t)
    assert not any(a.get("deletionVector") for a in active.values())


def test_dv_append_preserves_foreign_dvs(spark, tmp_path):
    from sling_cli_spark.sources import delta_dv as dv

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").coalesce(1), t)
    (rel,) = replay_log(t)[1].keys()
    dv.add_deletion_vectors(t, {rel: [0]})
    write_delta(spark.createDataFrame(
        [(9, "z")], "id long, v string").coalesce(1), t)  # append allowed
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {2, 9}


def test_add_stats_written_and_checkpointed(spark, tmp_path):
    """Every add carries per-file skipping stats (numRecords, min/max,
    nullCount) and a checkpoint round-trips them."""
    import json as _json

    import sling_cli_spark.fsio as fsio
    from sling_cli_spark.sources.delta_py import (
        _read_checkpoint, _write_checkpoint, latest_version)

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0)], "id long, v string, x double")
    write_delta(df.coalesce(1), t)
    _, files = replay_log(t)
    (add,) = files.values()
    s = _json.loads(add["stats"])
    assert s["numRecords"] == 2
    assert s["minValues"]["id"] == 1 and s["maxValues"]["id"] == 2
    assert s["minValues"]["v"] == "a" and s["maxValues"]["v"] == "b"
    assert s["nullCount"]["x"] == 1
    fs = fsio.get_fs(t)
    _write_checkpoint(t, fs, latest_version(t))
    _, cfiles, _ = _read_checkpoint(t, fs, latest_version(t))
    (cadd,) = cfiles.values()
    assert _json.loads(cadd["stats"]) == s


def test_prune_files_by_stats_semantics():
    import json as _json

    from sling_cli_spark.sources.delta_py import prune_files_by_stats

    def f(mn, mx, nrec=10, nnull=0):
        return {"stats": _json.dumps({
            "numRecords": nrec,
            "minValues": {"k": mn} if mn is not None else {},
            "maxValues": {"k": mx} if mx is not None else {},
            "nullCount": {"k": nnull}})}

    files = {
        "lo": f(0, 10), "mid": f(11, 20), "hi": f(21, 30),
        "nostats": {},
        "allnull": f(None, None, nrec=5, nnull=5),
    }
    got = prune_files_by_stats(files, [("k", ">", 15)])
    # lo provably disjoint; allnull provably no match; nostats kept
    assert set(got) == {"mid", "hi", "nostats"}
    assert set(prune_files_by_stats(files, [("k", "<=", 10)])) \
        == {"lo", "nostats"}
    assert set(prune_files_by_stats(files, [("k", "=", 25)])) \
        == {"hi", "nostats"}
    # type mismatch -> conservative keep for bounded files; the
    # all-null file still prunes (NULL satisfies no comparison of any
    # type)
    assert set(prune_files_by_stats(files, [("k", ">", "zzz")])) \
        == set(files) - {"allnull"}


def test_read_delta_skip_filters_prunes_scan(spark, tmp_path):
    """A watermark-style filter prunes FILES (inputFiles shrinks), and
    result rows match the plain filtered read."""
    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    write_delta(df.repartitionByRange(4, "id"), t)
    full = read_delta(spark, t)
    assert len(full.inputFiles()) >= 4
    pruned = read_delta(spark, t, skip_filters=[("id", ">", 800)])
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {r["id"] for r in pruned.filter("id > 800").collect()}
    assert got == set(range(801, 1000))


def test_runner_incremental_delta_source_prunes(spark, tmp_path):
    """End-to-end: an incremental run whose SOURCE is a delta-log table
    applies the watermark as a stats skip-filter and still produces
    exactly the post-watermark rows."""
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import run
    from sling_cli_spark.sources.delta_py import write_delta

    src_t = str(tmp_path / "src")
    write_delta(spark.range(0, 100).selectExpr(
        "id", "id AS ts").repartitionByRange(4, "id"), src_t)
    tgt = str(tmp_path / "tgt.parquet")
    spark.range(0, 50).selectExpr("id", "id AS ts").write.parquet(tgt)
    cfg = Config.from_dict({
        "source": {"stream": src_t, "primary_key": "id",
                   "update_key": "ts"},
        "target": {"object": tgt},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=spark.read.parquet(tgt))
    assert r.rows == 50  # ids 50..99 past the watermark 49
    got = {x["id"] for x in spark.read.parquet(tgt).collect()}
    assert got == set(range(100))


def test_optimize_preserves_evolved_columns(spark, tmp_path):
    """Compaction across schema-evolved files must read with the TABLE
    schema: bare footer inference from the pre-evolution file would
    null the evolved column for every row, permanently (r7 review)."""
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string").coalesce(1), t)
    write_delta(spark.createDataFrame(
        [(2, "b", 7.5)], "id long, v string, score double").coalesce(1), t)
    res = optimize_delta(spark, t, min_files=2)
    assert res["compacted"] == 2
    got = {r["id"]: r["score"] for r in read_delta(spark, t).collect()}
    assert got == {1: None, 2: 7.5}


def test_nan_bounds_never_prune(spark, tmp_path):
    """A double column containing NaN (Spark sorts it greatest, so it
    surfaces as max) must yield NO min/max stats for that column, and
    the pruner must keep the file (r7 review)."""
    import json as _json

    from sling_cli_spark.sources.delta_py import read_delta, write_delta

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 1.0), (2, 999.0), (3, float("nan"))], "id long, d double")
    write_delta(df.coalesce(1), t)
    _, files = replay_log(t)
    (add,) = files.values()
    s = _json.loads(add["stats"])
    assert "d" not in s["minValues"] and "d" not in s["maxValues"]
    assert s["minValues"]["id"] == 1  # clean columns keep bounds
    pruned = read_delta(spark, t, skip_filters=[("d", ">", 500.0)])
    assert len(pruned.inputFiles()) == 1  # kept: 999.0 must survive
    assert pruned.filter("d > 500").count() >= 1


def test_bounds_disprove_timestamp_formats():
    """Timestamp strings from different writers (' ' vs 'T', 'Z',
    millis vs micros) compare as instants, not bytes (r7 review)."""
    from sling_cli_spark.sources.delta_py import bounds_disprove

    # lexicographically ' ' < 'T', but 23:59 is AFTER the watermark —
    # byte comparison would wrongly disprove '>'
    assert not bounds_disprove(
        "2024-01-01 00:00:00", "2024-01-01 23:59:00",
        ">", "2024-01-01T12:00:00.000000")
    assert bounds_disprove(
        "2024-01-01 00:00:00", "2024-01-01 11:00:00",
        ">", "2024-01-01T12:00:00.000000")
    # aware vs naive: incomparable -> keep
    assert not bounds_disprove(
        "2024-01-01T00:00:00Z", "2024-01-01T01:00:00Z",
        ">", "2024-01-02T00:00:00.000000")
    # NaN anywhere -> keep
    assert not bounds_disprove(1.0, float("nan"), ">", 500.0)
    # plain strings still compare
    assert bounds_disprove("a", "c", ">", "x")


def test_partition_value_pruning(spark, tmp_path):
    """Filters on a partition column prune from add.partitionValues
    (partition cols never carry data-file stats); the NULL sentinel
    satisfies no comparison; unparseable values keep the file."""
    from sling_cli_spark.sources.delta_py import (
        partition_value_disprove, read_delta, write_delta)

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01"), (3, None)],
        "id long, day string")
    write_delta(df, t, partition_by=["day"])
    full = read_delta(spark, t)
    pruned = read_delta(
        spark, t, skip_filters=[("day", ">", "2024-01-15")])
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {r["id"] for r in pruned.filter("day > '2024-01-15'").collect()}
    assert got == {2}

    import datetime
    assert partition_value_disprove("2024-01-01", ">",
                                    datetime.date(2024, 6, 1))
    assert not partition_value_disprove("2024-01-01", "<",
                                        datetime.date(2024, 6, 1))
    assert partition_value_disprove("__HIVE_DEFAULT_PARTITION__", ">", 1)
    assert not partition_value_disprove("garbage", ">",
                                        datetime.date(2024, 6, 1))
    assert partition_value_disprove("10", ">", 99)   # int domain: 10<99
    assert not partition_value_disprove("100", ">", 99)


def test_partition_filter_falls_through_to_stats(spark, tmp_path):
    """An inconclusive partition-value parse must not disable stats
    pruning for the same column (r7 review): the staged scan restores
    partition columns, so their stats exist."""
    import json as _json

    from sling_cli_spark.sources.delta_py import prune_files_by_stats

    add = {
        "partitionValues": {"f": "1.5"},
        "stats": _json.dumps({
            "numRecords": 10,
            "minValues": {"f": 1.5}, "maxValues": {"f": 1.5},
            "nullCount": {"f": 0}})}
    # int literal: partition parse (int("1.5")) fails -> inconclusive;
    # stats still disprove f > 99
    got = prune_files_by_stats({"a": add}, [("f", ">", 99)],
                               part_cols=("f",))
    assert got == {}


def test_optimize_partitioned_no_fanout(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = str(tmp_path / "t")
    for batch in ([(1, "x"), (2, "y")], [(3, "x"), (4, "y")]):
        write_delta(spark.createDataFrame(
            batch, "id long, cat string"), t, partition_by=["cat"])
    res = optimize_delta(spark, t, target_file_bytes=10 ** 9, min_files=2)
    assert res["compacted"] >= 4
    _, files = replay_log(t)
    per_part = {}
    for rel, add in files.items():
        c = add["partitionValues"]["cat"]
        per_part[c] = per_part.get(c, 0) + 1
    assert per_part == {"x": 1, "y": 1}


def test_timestamp_time_travel(spark, tmp_path):
    """timestampAsOf semantics: the latest version committed at or
    before the instant; commitInfo.timestamp is authoritative (survives
    mtime-resetting copies), an instant before v0 reads empty."""
    from sling_cli_spark.sources.delta_py import (
        commit_timestamp_ms, read_delta, version_at_timestamp, write_delta)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    t0 = commit_timestamp_ms(t, 0)
    t1 = commit_timestamp_ms(t, 1)
    assert t0 <= t1
    # rewrite v1's commitInfo to a far-future instant: the commitInfo
    # path (not mtime) must drive the choice
    log1 = os.path.join(t, "_delta_log", f"{1:020d}.json")
    lines = [json.loads(ln) for ln in open(log1) if ln.strip()]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["timestamp"] = t1 + 10_000_000
    with open(log1, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")

    assert version_at_timestamp(t, t0 - 1) is None
    assert read_delta(spark, t, as_of_timestamp_ms=t0 - 1).count() == 0
    assert {r["id"] for r in read_delta(
        spark, t, as_of_timestamp_ms=t1 + 1).collect()} == {1}  # v1 moved
    assert {r["id"] for r in read_delta(
        spark, t, as_of_timestamp_ms=t1 + 20_000_000).collect()} == {1, 2}


def _write_v2_checkpoint(t, version):
    """Fixture: rewrite the table state at ``version`` as a foreign V2
    checkpoint — UUID-named top-level JSON (checkpointMetadata +
    protocol + metaData + sidecar actions) with the add actions in a
    parquet sidecar under _delta_log/_sidecars/ — then point
    _last_checkpoint at it."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sling_cli_spark.sources import delta_py as D

    meta, files, protocol = D._replay_state(t, version)
    side_dir = os.path.join(t, "_delta_log", "_sidecars")
    os.makedirs(side_dir, exist_ok=True)
    add_t = pa.struct([
        ("path", pa.string()), ("size", pa.int64()),
        ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
        ("partitionValues", pa.map_(pa.string(), pa.string()))])
    adds = [{"path": a["path"], "size": a.get("size", 0),
             "modificationTime": a.get("modificationTime", 0),
             "dataChange": True,
             "partitionValues": list((a.get("partitionValues")
                                      or {}).items())}
            for a in files.values()]
    side_name = f"{_uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.table({"add": pa.array(adds, type=add_t)}),
        os.path.join(side_dir, side_name))
    ssize = os.path.getsize(os.path.join(side_dir, side_name))

    top = os.path.join(
        t, "_delta_log",
        f"{version:020d}.checkpoint.{_uuid.uuid4().hex}.json")
    with open(top, "w") as f:
        f.write(json.dumps({"checkpointMetadata": {
            "version": version, "tags": {}}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint"]}}) + "\n")
        f.write(json.dumps({"metaData": meta}) + "\n")
        f.write(json.dumps({"sidecar": {
            "path": side_name, "sizeInBytes": ssize,
            "modificationTime": 0}}) + "\n")
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": version, "size": len(adds) + 3}))


def test_v2_checkpoint_read(spark, tmp_path):
    """A foreign table whose history was checkpointed in V2 form (and
    whose pre-checkpoint JSON commits were cleaned up) replays from the
    UUID-named checkpoint + sidecar; the v2Checkpoint reader feature no
    longer refuses."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), t)
    write_delta(_df(spark, [(2, "b")]).coalesce(1), t, mode="append")
    _write_v2_checkpoint(t, 1)
    write_delta(_df(spark, [(3, "c")]).coalesce(1), t, mode="append")
    # expire the pre-checkpoint commits: only the checkpoint can
    # reconstruct v0/v1 state now
    for v in (0, 1):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # time travel TO the checkpointed version also works
    assert {r["id"] for r in read_delta(spark, t, version=1).collect()} \
        == {1, 2}


def test_v2_checkpoint_write(spark, tmp_path):
    """On a v2Checkpoint table this engine's own checkpointer emits the
    V2 form (UUID top file + parquet sidecar), never a classic one."""
    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), t)
    write_delta(_df(spark, [(2, "b")]).coalesce(1), t, mode="append")
    _write_v2_checkpoint(t, 1)          # adopt the v2 protocol
    write_delta(_df(spark, [(3, "c")]).coalesce(1), t, mode="append")
    from sling_cli_spark import fsio
    D._write_checkpoint(t, fsio.get_fs(t), 2)
    log = os.listdir(os.path.join(t, "_delta_log"))
    assert not any(n.endswith(".checkpoint.parquet") for n in log)
    v2s = [n for n in log if n.startswith(f"{2:020d}.checkpoint.")
           and n.endswith(".json")]
    assert len(v2s) == 1
    # the new checkpoint alone reconstructs the state
    for v in (0, 1, 2):
        p = os.path.join(t, "_delta_log", f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_in_commit_timestamp_precedence(tmp_path, spark):
    """commitInfo.inCommitTimestamp (the ICT feature's monotonic field)
    outranks the wall-clock timestamp field."""
    from sling_cli_spark.sources.delta_py import (
        commit_timestamp_ms, write_delta)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(ln) for ln in open(log0) if ln.strip()]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = 123456789
    with open(log0, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")
    assert commit_timestamp_ms(t, 0) == 123456789


def test_type_widening_read(spark, tmp_path):
    """A foreign typeWidening table: old files carry the narrower
    parquet type (int), the table schema the widened one (long);
    the explicit-schema scan promotes old files natively, new files
    read as-is, and appends still work (this writer never widens, so
    the feature's write obligation never triggers)."""
    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id int, v string"), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    # foreign engine widens id to long and stamps the feature
    schema["fields"][0]["type"] = "long"
    schema["fields"][0]["metadata"] = {"delta.typeChanges": [
        {"fromType": "integer", "toType": "long"}]}
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    v = latest_version(t) + 1
    with open(os.path.join(t, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"]}}) + "\n")
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    got = read_delta(spark, t)
    assert dict(got.dtypes)["id"] == "bigint"
    assert {r["id"] for r in got.collect()} == {1}
    # append post-widening data
    write_delta(spark.createDataFrame(
        [(5_000_000_000, "b")], "id long, v string"), t, mode="append")
    rows = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert rows == {1: "a", 5_000_000_000: "b"}


def test_change_data_feed_merge(spark, tmp_path):
    """CDF on a rewriting MERGE: the commit stages _change_data files
    holding exactly the row-level diff (update pre/post images +
    inserts; unchanged rewritten rows produce nothing), and
    read_change_feed returns them stamped with version/timestamp."""
    from sling_cli_spark.sources.delta_py import (
        merge_delta, read_change_feed, set_table_properties, write_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string").coalesce(1), t)
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    batch = spark.createDataFrame([(2, "X"), (99, "new")],
                                  "id long, v string")
    stats = merge_delta(spark, t, batch, "id")
    v = stats["version"]
    assert os.path.isdir(os.path.join(t, "_change_data"))
    cdf = read_change_feed(spark, t, starting_version=v)
    rows = {(r["_change_type"], r["id"]): r["v"] for r in cdf.collect()}
    assert rows == {
        ("update_preimage", 2): "b",
        ("update_postimage", 2): "X",
        ("insert", 99): "new",
    }
    assert {r["_commit_version"] for r in cdf.collect()} == {v}
    assert all(r["_commit_timestamp"] > 0 for r in cdf.collect())


def test_change_data_feed_derived_and_deletes(spark, tmp_path):
    """Commits without cdc files derive: dataChange adds -> insert
    rows (blind appends write NO change files); delete_missing on a
    CDF table records per-row deletes in change files."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, read_change_feed, set_table_properties,
        write_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").coalesce(1), t)
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    write_delta(spark.createDataFrame(
        [(3, "c")], "id long, v string").coalesce(1), t, mode="append")
    assert not os.path.isdir(os.path.join(t, "_change_data"))
    cdf0 = read_change_feed(spark, t)
    ins = {r["id"]: r["_change_type"] for r in cdf0.collect()}
    assert ins == {1: "insert", 2: "insert", 3: "insert"}  # all derived

    keep = spark.createDataFrame([(1,), (3,)], "id long")
    stats = delete_missing_delta(spark, t, keep, "id")
    cdf = read_change_feed(spark, t, starting_version=stats["version"])
    got = [(r["_change_type"], r["id"]) for r in cdf.collect()]
    assert got == [("delete", 2)]


def test_change_feed_as_el_source(spark, tmp_path):
    """The EL surface reads a CDF-enabled Delta table's CHANGE FEED via
    SourceOptions(change_feed=True) — the CDC-replication source
    shape (rows + _change_type/_commit_version)."""
    from sling_cli_spark.config import Source, SourceOptions
    from sling_cli_spark.sources.delta_py import (
        merge_delta, set_table_properties, write_delta)
    from sling_cli_spark.sources.files import read_source

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string").coalesce(1), t)
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    stats = merge_delta(spark, t, spark.createDataFrame(
        [(2, "X")], "id long, v string"), "id")
    got = read_source(spark, Source(
        stream=t, options=SourceOptions(
            format="delta", change_feed=True,
            starting_version=stats["version"])))
    rows = {(r["_change_type"], r["id"]): r["v"] for r in got.collect()}
    assert rows == {("update_preimage", 2): "b",
                    ("update_postimage", 2): "X"}


def test_change_data_feed_partitioned(spark, tmp_path):
    """CDF on a PARTITIONED table: change rows carry their partition
    column values (attached from the actions' partitionValues — the
    staged files hold no partition columns)."""
    from sling_cli_spark.sources.delta_py import (
        merge_delta, read_change_feed, set_table_properties, write_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, "c", 9)],
        "id long, v string, day int"), t, partition_by=["day"])
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    stats = merge_delta(spark, t, spark.createDataFrame(
        [(2, "X", 7)], "id long, v string, day int"), "id")
    cdf = read_change_feed(spark, t, starting_version=stats["version"])
    rows = {(r["_change_type"], r["id"]): (r["v"], r["day"])
            for r in cdf.collect()}
    assert rows == {("update_preimage", 2): ("b", 7),
                    ("update_postimage", 2): ("X", 7)}
    # derived branch too: an append commit's insert rows carry day
    write_delta(spark.createDataFrame(
        [(9, "z", 11)], "id long, v string, day int"), t,
        mode="append", partition_by=["day"])
    tail = read_change_feed(spark, t,
                            starting_version=stats["version"] + 1)
    assert [(r["_change_type"], r["id"], r["day"])
            for r in tail.collect()] == [("insert", 9, 11)]


def test_replace_where_partial_files(spark, tmp_path):
    """r10: replaceWhere on an UNPARTITIONED table — files with no
    matching row carry forward untouched, partially-matching files
    rewrite only non-matching rows, row-tracking ids survive the
    rewrite (pure rearrangement), validation refuses out-of-range
    batches."""
    import pytest as _pytest

    from sling_cli_spark.sources.delta_py import (
        read_delta, replace_where_delta, replay_log, write_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")],
        "id long, bucket long, v string").coalesce(1), t)
    write_delta(spark.createDataFrame(
        [(3, 20, "c"), (4, 30, "d")],
        "id long, bucket long, v string").coalesce(1), t,
        mode="append")
    from sling_cli_spark.sources.delta_py import set_table_properties
    set_table_properties(t, {"delta.enableRowTracking": "true"})

    new = spark.createDataFrame([(9, 20, "NEW")],
                                "id long, bucket long, v string")
    with _pytest.raises(ValueError, match="not matching"):
        replace_where_delta(spark, t, new.union(spark.createDataFrame(
            [(8, 10, "x")], "id long, bucket long, v string")),
            "bucket = 20")
    before = {r.id: r._row_id for r in read_delta(
        spark, t, with_row_ids=True).collect()}
    stats = replace_where_delta(spark, t, new, "bucket = 20")
    # file 1 (buckets 10) untouched; file 2 (20,30) rewritten to (30)
    assert stats["touched"] == 1
    got = {(r.id, r.bucket, r.v)
           for r in read_delta(spark, t).collect()}
    assert got == {(1, 10, "a"), (2, 10, "b"), (4, 30, "d"),
                   (9, 20, "NEW")}
    after = {r.id: r._row_id for r in read_delta(
        spark, t, with_row_ids=True).collect()}
    assert after[4] == before[4]  # rewritten survivor keeps its id
    assert after[1] == before[1]  # untouched file trivially keeps ids
    # untouched file really carried forward (same physical path)
    _, files = replay_log(t)
    assert any("bucket" not in "" and p in files for p in files)
    # skip_filters prunes candidates without changing results
    stats2 = replace_where_delta(
        spark, t, spark.createDataFrame(
            [(7, 30, "B")], "id long, bucket long, v string"),
        "bucket = 30", skip_filters=[("bucket", "=", 30)])
    got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    assert (7, "B") in got and (4, "d") not in got


def test_change_feed_timestamp_range(spark, tmp_path):
    """r10: CDF by TIMESTAMP bounds (delta-spark startingTimestamp/
    endingTimestamp) — resolved through the monotonic
    inCommitTimestamp on an ICT table: start = first commit at or
    after, end = last commit at or before; out-of-range instants
    refuse loudly."""
    import pytest as _pytest

    from sling_cli_spark.sources.delta_py import (
        commit_timestamp_ms, read_change_feed, set_table_properties,
        write_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame(
        [(1, "a")], "id long, v string"), t)
    set_table_properties(t, {
        "delta.enableChangeDataFeed": "true",
        "delta.enableInCommitTimestamps": "true"})       # v1
    write_delta(spark.createDataFrame(
        [(2, "b")], "id long, v string"), t, mode="append")  # v2
    write_delta(spark.createDataFrame(
        [(3, "c")], "id long, v string"), t, mode="append")  # v3
    t2, t3 = (commit_timestamp_ms(t, 2), commit_timestamp_ms(t, 3))
    got = read_change_feed(spark, t, starting_timestamp_ms=t2,
                           ending_timestamp_ms=t3 - 1)
    assert [(r["id"], r["_change_type"], r["_commit_version"])
            for r in got.collect()] == [(2, "insert", 2)]
    # start instant between commits rounds FORWARD, end rounds BACK
    got = read_change_feed(spark, t, starting_timestamp_ms=t2 + 1)
    assert {r["id"] for r in got.collect()} == {3}
    with _pytest.raises(ValueError, match="after the latest"):
        read_change_feed(spark, t, starting_timestamp_ms=t3 + 10_000)
    with _pytest.raises(ValueError, match="predates the first"):
        read_change_feed(spark, t, starting_version=2,
                         ending_timestamp_ms=0)
    # the EL surface carries the same bounds
    from sling_cli_spark.config import Source, SourceOptions
    from sling_cli_spark.sources.files import read_source
    got = read_source(spark, Source(
        stream=t, options=SourceOptions(
            format="delta", change_feed=True,
            starting_timestamp=t2, ending_timestamp=t2)))
    assert [(r["id"], r["_commit_version"])
            for r in got.collect()] == [(2, 2)]


def test_cdf_enable_upgrades_protocol(spark, tmp_path):
    """Enabling delta.enableChangeDataFeed on a legacy-protocol table
    commits a conforming v7 protocol listing the changeDataFeed writer
    feature (plus the legacy-implied appendOnly); writes still work."""
    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    D.write_delta(_df(spark, [(1, "a")]), t)
    D.set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    prot = D._replay_state(t)[2]
    assert prot["minWriterVersion"] == 7
    assert {"appendOnly", "changeDataFeed"} <= set(prot["writerFeatures"])
    D.write_delta(_df(spark, [(2, "b")]), t, mode="append")
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 2}


# ------------------------------------------------ DV production (round 8)

def _dv_table(spark, tmp_path, name="dvt"):
    """Two single-file commits + the DV-production property."""
    from sling_cli_spark.sources.delta_py import set_table_properties

    t = str(tmp_path / name)
    write_delta(_df(spark, [(i, f"v{i}") for i in range(10)])
                .coalesce(1), t)
    write_delta(_df(spark, [(i, f"v{i}") for i in range(10, 20)])
                .coalesce(1), t, mode="append")
    set_table_properties(t, {"delta.enableDeletionVectors": "true"})
    return t


def test_delete_missing_produces_dv_no_rewrite(spark, tmp_path):
    """Sparse delete on a DV-enabled table commits deletion vectors:
    same data files before and after, descriptors attached, rows gone
    (PROTOCOL.md §Deletion Vectors, write side — r8)."""
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = _dv_table(spark, tmp_path)
    before = set(replay_log(t)[1])
    keep = _df(spark, [(i, "") for i in range(20) if i % 4 != 0]) \
        .select("id")
    res = delete_missing_delta(spark, t, keep, "id")
    assert res["dv_files"] == 2 and res["new_files"] == 0
    files = replay_log(t)[1]
    assert set(files) == before
    descs = {r: a["deletionVector"] for r, a in files.items()}
    assert all(d["cardinality"] > 0 for d in descs.values())
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {i for i in range(20) if i % 4 != 0}


def test_merge_dv_deletes_in_place_and_appends(spark, tmp_path):
    """DV merge: matched rows DV-delete from their file, the merge
    output appends as new files, original files never rewrite; a second
    merge UNIONS the existing DV positions (one DV per file)."""
    from sling_cli_spark.sources.delta_py import merge_delta

    t = _dv_table(spark, tmp_path)
    before = set(replay_log(t)[1])
    res = merge_delta(spark, t, _df(spark, [(3, "u3"), (99, "new")]), "id")
    assert res["dv_files"] == 1 and res["new_files"] >= 1
    files = replay_log(t)[1]
    assert before <= set(files)
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[3] == "u3" and got[99] == "new" and got[4] == "v4"
    # second merge touching the same file: positions union
    merge_delta(spark, t, _df(spark, [(5, "u5")]), "id")
    files = replay_log(t)[1]
    first = next(r for r in before
                 if files[r].get("deletionVector"))
    assert files[first]["deletionVector"]["cardinality"] == 2  # ids 3+5
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[5] == "u5" and got[3] == "u3" and len(got) == 21


def test_dv_fully_dead_file_becomes_plain_remove(spark, tmp_path):
    """When every physical row of a file dies, the commit drops the
    file instead of attaching a full DV."""
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = _dv_table(spark, tmp_path)
    keep = _df(spark, [(i, "") for i in range(10, 19)]).select("id")
    res = delete_missing_delta(spark, t, keep, "id")
    # file 1 (ids 0-9) fully dead -> removed; file 2 keeps a DV for 19
    assert res["dv_files"] == 1 and res["touched"] == 2
    files = replay_log(t)[1]
    assert len(files) == 1
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == set(range(10, 19))


def test_dv_dense_delete_falls_back_to_cow(spark, tmp_path):
    """A delete denser than max_dv_rows rewrites copy-on-write — DVs
    are the sparse-delete path, not a mandate."""
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = _dv_table(spark, tmp_path)
    keep = _df(spark, [(i, "") for i in range(20) if i % 2 == 0]) \
        .select("id")
    res = delete_missing_delta(spark, t, keep, "id", max_dv_rows=3)
    assert res.get("dv_files") is None and res["new_files"] >= 1
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {i for i in range(20) if i % 2 == 0}


def test_dv_produce_respects_cdf(spark, tmp_path):
    """DV-path deletes on a CDF table still write change files: the
    doomed rows appear as _change_type='delete'."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, read_change_feed, set_table_properties)

    t = _dv_table(spark, tmp_path)
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    v_before = latest_version(t)
    keep = _df(spark, [(i, "") for i in range(1, 20)]).select("id")
    res = delete_missing_delta(spark, t, keep, "id")
    assert res["dv_files"] == 1
    cdf = read_change_feed(spark, t, starting_version=v_before + 1)
    changes = [(r["id"], r["_change_type"]) for r in cdf.collect()]
    assert changes == [(0, "delete")]


def test_optimize_purge_dvs_rewrites_heavy_files(spark, tmp_path):
    """REORG/PURGE equivalent (r8): purge_dvs=True rewrites files whose
    DV covers >= dv_purge_ratio of rows — dropping the descriptor and
    materializing live rows — while a lightly-deleted file keeps its
    DV. Visible rows identical, dataChange stays false."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, optimize_delta)

    t = _dv_table(spark, tmp_path)
    # file 1 (0-9): delete 6 of 10 rows (heavy); file 2: delete 1 of 10
    keep = _df(spark, [(i, "") for i in (0, 1, 2, 3) ]
               + [(i, "") for i in range(10, 19)]).select("id")
    res = delete_missing_delta(spark, t, keep, "id")
    assert res["dv_files"] == 2
    before_rows = {r["id"] for r in read_delta(spark, t).collect()}
    stats = optimize_delta(spark, t, target_file_bytes=1, purge_dvs=True,
                           dv_purge_ratio=0.5)
    assert stats["compacted"] == 1  # only the 60%-deleted file
    files = replay_log(t)[1]
    heavy = [a for a in files.values() if a.get("deletionVector")]
    assert len(heavy) == 1  # light file keeps its DV; heavy one purged
    assert {r["id"] for r in read_delta(spark, t).collect()} == before_rows


def test_dv_produce_on_partitioned_table(spark, tmp_path):
    """DV production on a Hive-partitioned table: positions resolve
    against the basePath scan, re-added files keep partitionValues,
    partition pruning still binds."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, merge_delta, set_table_properties,
        write_delta)

    t = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 2) for i in range(20)],
        "id long, v string, p int")
    write_delta(df.repartition(2, "p"), t, partition_by=["p"])
    set_table_properties(t, {"delta.enableDeletionVectors": "true"})
    before = set(replay_log(t)[1])
    keep = spark.createDataFrame(
        [(i,) for i in range(20) if i % 5 != 0], "id long")
    res = delete_missing_delta(spark, t, keep, "id")
    assert res["dv_files"] >= 1 and res["new_files"] == 0
    files = replay_log(t)[1]
    assert set(files) == before
    for rel, a in files.items():
        if a.get("deletionVector"):
            assert a["partitionValues"], "DV re-add lost partitionValues"
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {i for i in range(20) if i % 5 != 0}
    # partition-pruned DV merge: batch only touches p=1
    res = merge_delta(spark, t,
                      spark.createDataFrame([(3, "u3", 1)], df.schema),
                      "id")
    assert res["dv_files"] == 1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[3] == "u3" and got[4] == "v4"


def test_writer_honors_generated_columns(spark, tmp_path):
    """Generated columns (PROTOCOL.md, r8 refusal->support): a batch
    missing the column gets it computed from
    delta.generationExpression; a batch providing a WRONG value fails
    before commit; a correct provided value passes."""
    from sling_cli_spark.sources.delta_py import (
        InvariantViolation, read_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a", 1)],
                                      "id long, v string, id2 long"), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    assert schema["fields"][2]["name"] == "id2"
    schema["fields"][2]["metadata"] = {
        "delta.generationExpression": "id * 1"}
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    # batch WITHOUT the generated column: computed on write
    write_delta(spark.createDataFrame([(2, "b")], "id long, v string"),
                t, mode="append")
    # batch WITH a correct value: passes validation
    write_delta(spark.createDataFrame([(3, "c", 3)],
                                      "id long, v string, id2 long"),
                t, mode="append")
    v_before = latest_version(t)
    with pytest.raises(InvariantViolation, match="generated column"):
        write_delta(spark.createDataFrame([(4, "d", 99)],
                                          "id long, v string, id2 long"),
                    t, mode="append")
    assert latest_version(t) == v_before
    got = {r["id"]: r["id2"] for r in read_delta(spark, t).collect()}
    assert got == {1: 1, 2: 2, 3: 3}
    # merge path: batch missing the column gets it computed too
    from sling_cli_spark.sources.delta_py import merge_delta
    merge_delta(spark, t,
                spark.createDataFrame([(2, "B2"), (5, "e")],
                                      "id long, v string"), "id")
    got = {r["id"]: (r["v"], r["id2"])
           for r in read_delta(spark, t).collect()}
    assert got[2] == ("B2", 2) and got[5] == ("e", 5)


def test_writer_honors_identity_columns(spark, tmp_path):
    """Identity columns (PROTOCOL.md §Identity Columns, r8
    refusal->support): batches missing the column get fresh values
    beyond the high watermark, the watermark advances in the same
    commit, values stay unique and aligned to start + k*step, and
    explicit inserts refuse without allowExplicitInsert."""
    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, _identity_fields, read_delta)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([("seed", 100)],
                                      "v string, uid long"), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    assert schema["fields"][1]["name"] == "uid"
    schema["fields"][1]["metadata"] = {
        "delta.identity.start": 100,
        "delta.identity.step": 10,
        "delta.identity.highWaterMark": 100,
    }
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    write_delta(spark.createDataFrame([("a",), ("b",)], "v string")
                .coalesce(1), t, mode="append")
    rows = {r["v"]: r["uid"] for r in read_delta(spark, t).collect()}
    assert rows["seed"] == 100
    assigned = {rows["a"], rows["b"]}
    assert len(assigned) == 2
    assert all(u > 100 and (u - 100) % 10 == 0 for u in assigned)
    meta2, _ = replay_log(t)
    hwm = next(d for d in _identity_fields(meta2)
               if d["name"] == "uid")["hwm"]
    assert int(hwm) == max(assigned), "watermark must advance in-commit"
    # second batch: fresh values strictly beyond the new watermark
    write_delta(spark.createDataFrame([("c",)], "v string"), t,
                mode="append")
    rows2 = {r["v"]: r["uid"] for r in read_delta(spark, t).collect()}
    assert rows2["c"] > max(assigned)
    assert len(set(rows2.values())) == 4  # all unique
    # explicit insert refuses (allowExplicitInsert unset)
    with pytest.raises(UnsupportedTableFeature, match="explicit"):
        write_delta(spark.createDataFrame([("x", 999)],
                                          "v string, uid long"), t,
                    mode="append")


def test_vacuum_reclaims_superseded_dv_files(spark, tmp_path):
    """vacuum (r8): deletion_vector_*.bin files referenced by no
    retained version are reclaimed; the live vector survives."""
    import glob as _glob

    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, vacuum)

    t = _dv_table(spark, tmp_path)
    # two successive sparse deletes: the second supersedes file DVs
    delete_missing_delta(
        spark, t, _df(spark, [(i, "") for i in range(20) if i != 3])
        .select("id"), "id")
    delete_missing_delta(
        spark, t, _df(spark, [(i, "") for i in range(20)
                              if i not in (3, 7)]).select("id"), "id")
    bins = _glob.glob(os.path.join(t, "**", "deletion_vector_*.bin"),
                      recursive=True)
    assert len(bins) == 2  # superseded + live
    dropped = vacuum(t, keep_versions=1)
    bins_after = _glob.glob(
        os.path.join(t, "**", "deletion_vector_*.bin"), recursive=True)
    assert len(bins_after) == 1
    assert any(d.endswith(".bin") for d in dropped)
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == set(range(20)) - {3, 7}


def test_optimize_zorder_improves_multidim_skipping(spark, tmp_path):
    """OPTIMIZE ZORDER BY (r8): after re-clustering on (a, b), a
    point-ish filter on EITHER column prunes most files via stats
    (a linear layout only ever helps its leading sort column), rows
    identical, dataChange stays false."""
    from sling_cli_spark.sources.delta_py import (
        optimize_delta, prune_files_by_stats, write_delta)

    t = str(tmp_path / "zt")
    # (a, b) uniform grid, written in round-robin order so every file
    # initially spans the whole range of BOTH columns (worst case)
    df = spark.range(4096).selectExpr(
        "id", "CAST(id % 64 AS LONG) AS a",
        "CAST(CAST(id / 64 AS LONG) % 64 AS LONG) AS b")
    write_delta(df.repartition(8), t)
    meta, files0 = replay_log(t)
    pruned0a = prune_files_by_stats(files0, [("a", ">=", 48)])
    pruned0b = prune_files_by_stats(files0, [("b", "<", 8)])
    # worst-case layout: stats prune nothing
    assert len(pruned0a) == len(files0) and len(pruned0b) == len(files0)
    before = df.count()

    # 4 KiB target: staged files are zstd since r15 (~25-35% smaller
    # than the snappy this threshold was tuned for), so the same data
    # needs a lower target to still bin into >= 4 files
    stats = optimize_delta(spark, t, target_file_bytes=4 * 1024,
                           zorder_by=["a", "b"])
    assert stats["compacted"] == 8 and stats["new_files"] >= 4
    meta, files1 = replay_log(t)
    pruned1a = prune_files_by_stats(files1, [("a", ">=", 48)])
    pruned1b = prune_files_by_stats(files1, [("b", "<", 8)])
    assert len(pruned1a) < len(files1), "zorder must enable a-pruning"
    assert len(pruned1b) < len(files1), "zorder must enable b-pruning"
    got = read_delta(spark, t)
    assert got.count() == before
    assert got.filter("a >= 48").count() == \
        df.filter("a >= 48").count()


def test_identity_watermark_monotone_across_writers(spark, tmp_path):
    """Two writers appending in turn each read the watermark the prior
    commit advanced — allocations never collide and stay monotone."""
    from sling_cli_spark.sources.delta_py import read_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([("seed", 0)],
                                      "v string, uid long"), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    schema["fields"][1]["metadata"] = {
        "delta.identity.start": 1, "delta.identity.step": 1,
        "delta.identity.highWaterMark": 0}
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    seen: set = {0}
    for k in range(4):  # alternating "writers" (fresh metadata reads)
        write_delta(spark.createDataFrame(
            [(f"w{k}a",), (f"w{k}b",)], "v string").coalesce(1),
            t, mode="append")
        ids = {r["uid"] for r in read_delta(spark, t).collect()}
        assert len(ids) == 1 + 2 * (k + 1), "collision detected"
        assert max(ids) > max(seen)
        seen = ids


def test_writer_enforces_check_constraints(spark, tmp_path):
    """CHECK constraints (PROTOCOL.md, writer-v3 feature — r8): setting
    delta.constraints.* upgrades the protocol, passing batches commit,
    a violating batch fails typed before commit; NULL passes."""
    from sling_cli_spark.sources.delta_py import (
        InvariantViolation, read_delta, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 5)], "id long, qty long"), t)
    set_table_properties(t, {"delta.constraints.qty_pos": "qty > 0"})
    from sling_cli_spark.sources import delta_py as D
    prot = D._replay_state(t)[2]
    assert "checkConstraints" in set(prot.get("writerFeatures") or ())
    write_delta(spark.createDataFrame([(2, 7)], "id long, qty long"),
                t, mode="append")
    write_delta(spark.createDataFrame([(4, None)], "id long, qty long"),
                t, mode="append")  # NULL passes (SQL CHECK)
    v = latest_version(t)
    with pytest.raises(InvariantViolation, match="qty_pos"):
        write_delta(spark.createDataFrame([(3, -1)],
                                          "id long, qty long"),
                    t, mode="append")
    assert latest_version(t) == v
    got = {r["id"]: r["qty"] for r in read_delta(spark, t).collect()}
    assert got == {1: 5, 2: 7, 4: None}


def test_timestamp_ntz_feature_roundtrip(spark, tmp_path):
    """timestampNtz (PROTOCOL.md feature — r8): a table created with a
    TIMESTAMP_NTZ column announces the reader+writer feature, reads
    back exactly, and the featured table is writable."""
    from sling_cli_spark.sources.delta_py import read_delta

    t = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(1 AS LONG) AS id, "
        "TIMESTAMP_NTZ'2024-03-01 10:00:00' AS ts")
    write_delta(df, t)
    from sling_cli_spark.sources import delta_py as D
    prot = D._replay_state(t)[2]
    assert "timestampNtz" in set(prot.get("readerFeatures") or ())
    assert "timestampNtz" in set(prot.get("writerFeatures") or ())
    write_delta(spark.sql(
        "SELECT CAST(2 AS LONG) AS id, "
        "TIMESTAMP_NTZ'2024-03-02 11:30:00' AS ts"), t, mode="append")
    got = {r["id"]: str(r["ts"]) for r in read_delta(spark, t).collect()}
    assert got == {1: "2024-03-01 10:00:00", 2: "2024-03-02 11:30:00"}


def test_writer_honors_column_defaults(spark, tmp_path):
    """Column DEFAULT values (PROTOCOL.md §Default Columns, r8): a
    batch missing the column gets CURRENT_DEFAULT computed; a provided
    value — including explicit NULL — stays verbatim (defaults never
    validate, unlike generated columns)."""
    from sling_cli_spark.sources.delta_py import read_delta

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "eu")],
                                      "id long, region string"), t)
    meta, _ = replay_log(t)
    schema = json.loads(meta["schemaString"])
    schema["fields"][1]["metadata"] = {"CURRENT_DEFAULT": "'us'"}
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    write_delta(spark.createDataFrame([(2,)], "id long"), t,
                mode="append")  # missing -> default
    write_delta(spark.createDataFrame([(3, None)],
                                      "id long, region string"), t,
                mode="append")  # explicit NULL stays
    got = {r["id"]: r["region"] for r in read_delta(spark, t).collect()}
    assert got == {1: "eu", 2: "us", 3: None}
    # merge path fills too
    from sling_cli_spark.sources.delta_py import merge_delta
    merge_delta(spark, t, spark.createDataFrame([(9,)], "id long"), "id")
    got = {r["id"]: r["region"] for r in read_delta(spark, t).collect()}
    assert got[9] == "us"


def test_vacuum_reclaims_expired_cdf_files(spark, tmp_path):
    """vacuum (r8): _change_data files of versions older than the
    retention window are reclaimed; retained versions' change files
    survive and read_change_feed still serves them."""
    import glob as _glob

    from sling_cli_spark.sources.delta_py import (
        latest_version, merge_delta, read_change_feed,
        set_table_properties, vacuum)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    merge_delta(spark, t, _df(spark, [(1, "a2")]), "id")
    merge_delta(spark, t, _df(spark, [(2, "b2")]), "id")
    v_last = latest_version(t)
    n0 = len(_glob.glob(os.path.join(t, "_change_data", "*")))
    assert n0 >= 2
    vacuum(t, keep_versions=1)
    n1 = len(_glob.glob(os.path.join(t, "_change_data", "*")))
    assert 0 < n1 < n0, "old change files reclaimed, last kept"
    changes = {(r["id"], r["_change_type"])
               for r in read_change_feed(
                   spark, t, starting_version=v_last).collect()}
    assert ("2", "update_postimage") in {(str(i), c) for i, c in changes} \
        or (2, "update_postimage") in changes


def test_variant_type_feature_roundtrip(spark, tmp_path):
    """variantType (PROTOCOL.md feature — r8): a table created with a
    VARIANT column announces the reader+writer feature and semi-
    structured values round-trip exactly (Spark 4 native parquet
    variant encoding)."""
    from sling_cli_spark.sources.delta_py import read_delta

    t = str(tmp_path / "t")
    df = spark.sql(
        'SELECT CAST(1 AS LONG) AS id, '
        'PARSE_JSON(\'{"a": 1, "b": [1, 2]}\') AS v')
    write_delta(df, t)
    from sling_cli_spark.sources import delta_py as D
    prot = D._replay_state(t)[2]
    assert "variantType" in set(prot.get("readerFeatures") or ())
    write_delta(spark.sql(
        'SELECT CAST(2 AS LONG) AS id, '
        'PARSE_JSON(\'{"c": null}\') AS v'), t, mode="append")
    got = {r["id"]: r["j"] for r in read_delta(spark, t)
           .selectExpr("id", "to_json(v) AS j").collect()}
    assert got == {1: '{"a":1,"b":[1,2]}', 2: '{"c":null}'}


def test_merge_pure_insert_on_dv_table(spark, tmp_path):
    """A pure-insert merge batch on a DV-enabled table appends through
    the DV path with zero descriptors and zero touched files."""
    from sling_cli_spark.sources.delta_py import merge_delta

    t = _dv_table(spark, tmp_path)
    before = set(replay_log(t)[1])
    res = merge_delta(spark, t, _df(spark, [(100, "x"), (101, "y")]),
                      "id")
    assert res["touched"] == 0 and res.get("dv_files") == 0
    assert res["new_files"] >= 1
    files = replay_log(t)[1]
    assert before <= set(files)
    assert not any(files[r].get("deletionVector") for r in before)
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == set(range(20)) | {100, 101}


def test_domain_metadata_survives_checkpoint(spark, tmp_path):
    """domainMetadata (PROTOCOL.md — r8): latest-wins tracking with
    removed tombstones, carried through a classic checkpoint so a
    reader starting there (early JSON commits cleaned) still sees
    every live domain."""
    from sling_cli_spark.sources.delta_py import (
        _checkpoint_file, _domain_metadata, _write_checkpoint, latest_version)
    from sling_cli_spark import fsio

    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    v = latest_version(t) + 1
    D._commit(t, v, [
        {"domainMetadata": {"domain": "myapp.settings",
                            "configuration": '{"x": 1}',
                            "removed": False}},
        {"domainMetadata": {"domain": "myapp.gone",
                            "configuration": "{}", "removed": False}},
    ])
    D._commit(t, v + 1, [
        {"domainMetadata": {"domain": "myapp.gone",
                            "configuration": "{}", "removed": True}},
    ])
    assert _domain_metadata(t) == {"myapp.settings": '{"x": 1}'}
    fs = fsio.get_fs(t)
    _write_checkpoint(t, fs, latest_version(t))
    # simulate metadata cleanup: drop the pre-checkpoint JSON commits
    for vv in range(latest_version(t)):
        os.remove(os.path.join(t, "_delta_log", f"{vv:020d}.json"))
    assert _domain_metadata(t) == {"myapp.settings": '{"x": 1}'}
    # and the table itself still replays from the checkpoint
    got = {r["id"] for r in read_delta(spark, t).collect()}
    assert got == {1}


def test_vacuum_protocol_check(spark, tmp_path):
    """vacuumProtocolCheck (r8): vacuum consults the protocol and
    refuses tables listing features it doesn't understand; a table
    listing only the feature itself vacuums fine."""
    from sling_cli_spark.sources import delta_py as D
    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, vacuum)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    v = latest_version(t) + 1
    D._commit(t, v, [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["vacuumProtocolCheck"],
        "writerFeatures": ["appendOnly", "vacuumProtocolCheck"]}}])
    assert vacuum(t) == []  # understood feature -> proceeds
    D._commit(t, v + 1, [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["vacuumProtocolCheck"],
        "writerFeatures": ["appendOnly", "futureMagicFeature"]}}])
    with pytest.raises(UnsupportedTableFeature, match="futureMagic"):
        vacuum(t)


def test_describe_history(spark, tmp_path):
    """DESCRIBE HISTORY twin (r8): one row per commit with inferred
    operations and action counts."""
    from sling_cli_spark.sources.delta_py import (
        describe_history, merge_delta, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    set_table_properties(t, {"delta.appendOnly": "false"})
    merge_delta(spark, t, _df(spark, [(1, "a2"), (2, "b")]), "id")
    h = {r["version"]: (r["operation"], r["n_added"], r["n_removed"])
         for r in describe_history(spark, t).collect()}
    assert h[0][0] == "WRITE" and h[0][1] >= 1
    assert h[1][0] == "SET TBLPROPERTIES"
    assert h[2][0] == "REWRITE" and h[2][2] >= 1
    assert all(r["timestamp_ms"] > 0
               for r in describe_history(spark, t).collect())


# ------------------------------------------------------------ row tracking

def _rt_table(spark, tmp_path, rows=((1, "a"), (2, "b"), (3, "c"), (4, "d"))):
    """One-file table (deterministic positions), row tracking enabled at
    v1 (backfill)."""
    from sling_cli_spark.sources.delta_py import set_table_properties

    t = str(tmp_path / "t")
    df = _df(spark, list(rows)).coalesce(1).sortWithinPartitions("id")
    write_delta(df, t)
    set_table_properties(t, {"delta.enableRowTracking": "true"})
    return t


def test_row_tracking_enable_backfills_and_reads(spark, tmp_path):
    """Enabling delta.enableRowTracking upgrades the protocol, re-adds
    every file with baseRowId (backfill), records the watermark domain,
    and read_delta(with_row_ids=True) surfaces stable ids."""
    from sling_cli_spark.sources.delta_py import (
        _domain_metadata, _replay_state, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    write_delta(_df(spark, [(3, "c")]).coalesce(1), t, mode="append")
    set_table_properties(t, {"delta.enableRowTracking": "true"})

    meta, files, prot = _replay_state(t)
    assert "rowTracking" in prot["writerFeatures"]
    assert all(a.get("baseRowId") is not None for a in files.values())
    hwm = json.loads(_domain_metadata(t)["delta.rowTracking"])
    assert hwm["rowIdHighWaterMark"] == 2
    got = read_delta(spark, t, with_row_ids=True).collect()
    assert {r["_row_id"] for r in got} == {0, 1, 2}
    assert all(r["_row_commit_version"] == 2 for r in got)  # backfill v2


def test_row_tracking_fresh_ids_on_append(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import _domain_metadata

    t = _rt_table(spark, tmp_path)
    v = write_delta(_df(spark, [(5, "e"), (6, "f")]).coalesce(1), t,
                    mode="append")
    got = {r["id"]: (r["_row_id"], r["_row_commit_version"])
           for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert sorted(rid for rid, _ in got.values()) == [0, 1, 2, 3, 4, 5]
    assert got[5][1] == v and got[6][1] == v
    hwm = json.loads(_domain_metadata(t)["delta.rowTracking"])
    assert hwm["rowIdHighWaterMark"] == 5


def test_row_tracking_merge_cow_preserves_ids(spark, tmp_path):
    """CoW merge: updated rows keep their row id (commit version
    resets); untouched rows in the rewritten file keep BOTH; inserts
    get fresh ids past the watermark."""
    t = _rt_table(spark, tmp_path)
    base = {r["id"]: r["_row_id"]
            for r in read_delta(spark, t, with_row_ids=True).collect()}
    res = merge_delta(
        spark, t, _df(spark, [(2, "B"), (5, "E")]).coalesce(1), "id")
    got = {r["id"]: (r["_row_id"], r["_row_commit_version"])
           for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert got[2][0] == base[2] and got[2][1] == res["version"]
    for kept in (1, 3, 4):  # rewritten but unmodified: id AND version
        assert got[kept][0] == base[kept] and got[kept][1] == 1
    assert got[5][0] >= 4 and got[5][1] == res["version"]
    assert len({rid for rid, _ in got.values()}) == 5


def test_row_tracking_merge_dv_preserves_ids(spark, tmp_path):
    """DV-producing merge: the kept file's baseRowId rides the re-add,
    so untouched rows keep ids with no materialization; moved (updated)
    rows thread theirs through the materialized column."""
    from sling_cli_spark.sources.delta_py import set_table_properties

    t = _rt_table(spark, tmp_path)
    set_table_properties(t, {"delta.enableDeletionVectors": "true"})
    base = {r["id"]: r["_row_id"]
            for r in read_delta(spark, t, with_row_ids=True).collect()}
    res = merge_delta(spark, t, _df(spark, [(2, "B")]).coalesce(1), "id")
    assert res["dv_files"] == 1
    got = {r["id"]: (r["_row_id"], r["_row_commit_version"])
           for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert got[2][0] == base[2] and got[2][1] == res["version"]
    for kept in (1, 3, 4):
        assert got[kept][0] == base[kept]
    assert len({rid for rid, _ in got.values()}) == 4


def test_row_tracking_optimize_stable(spark, tmp_path):
    """Compaction is pure rearrangement: every row keeps id AND commit
    version across the rewrite."""
    from sling_cli_spark.sources.delta_py import optimize_delta

    t = _rt_table(spark, tmp_path)
    write_delta(_df(spark, [(5, "e")]).coalesce(1), t, mode="append")
    before = {r["id"]: (r["_row_id"], r["_row_commit_version"])
              for r in read_delta(spark, t, with_row_ids=True).collect()}
    res = optimize_delta(spark, t)
    assert res["compacted"] == 2 and res["new_files"] == 1
    after = {r["id"]: (r["_row_id"], r["_row_commit_version"])
             for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert after == before


def test_row_tracking_delete_missing_survivors_keep_ids(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import delete_missing_delta

    t = _rt_table(spark, tmp_path)
    before = {r["id"]: (r["_row_id"], r["_row_commit_version"])
              for r in read_delta(spark, t, with_row_ids=True).collect()}
    delete_missing_delta(spark, t, _df(spark, [(1, "a"), (3, "c")]), "id")
    after = {r["id"]: (r["_row_id"], r["_row_commit_version"])
             for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert set(after) == {1, 3}
    assert after[1] == before[1] and after[3] == before[3]


def test_row_tracking_checkpoint_roundtrip(spark, tmp_path):
    """baseRowId/defaultRowCommitVersion survive the checkpoint add
    schema; replay from the checkpoint still serves row ids."""
    import sling_cli_spark.fsio as fsio
    from sling_cli_spark.sources.delta_py import (
        _replay_state, _write_checkpoint, latest_version)

    t = _rt_table(spark, tmp_path)
    before = {r["id"]: r["_row_id"]
              for r in read_delta(spark, t, with_row_ids=True).collect()}
    _write_checkpoint(t, fsio.get_fs(t), latest_version(t))
    # state now replays from the checkpoint (empty JSON tail)
    _, files, _ = _replay_state(t)
    assert all(a.get("baseRowId") is not None for a in files.values())
    after = {r["id"]: r["_row_id"]
             for r in read_delta(spark, t, with_row_ids=True).collect()}
    assert after == before


def _mapped_rt_table(spark, tmp_path, partitioned=False):
    """Hand-built externally-written table: column mapping mode=name
    (physical col-aa/col-bb), row tracking with baseRowId on every add,
    file 2 also materializes explicit row ids in the configured
    physical column."""
    t = str(tmp_path / "mrt")
    os.makedirs(t)
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "`col-aa` long, `col-bb` string",
    ).coalesce(1).sortWithinPartitions("col-aa").write.parquet(t + "/f1")
    spark.createDataFrame(
        [(3, "c", 7), (4, "d", 9)],
        "`col-aa` long, `col-bb` string, `_rid-phys` long",
    ).coalesce(1).sortWithinPartitions("col-aa").write.parquet(t + "/f2")
    part = {d: [f for f in os.listdir(os.path.join(t, d))
                if f.endswith(".parquet")][0] for d in ("f1", "f2")}
    schema = {"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aa"}},
        {"name": "v", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bb"}}]}
    os.makedirs(t + "/_delta_log")
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["columnMapping"],
            "writerFeatures": ["columnMapping", "rowTracking",
                               "domainMetadata"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet"},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["id"] if partitioned else [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.rowTracking.materializedRowIdColumnName":
                    "_rid-phys"}}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f1/" + part["f1"], "size": 1, "partitionValues": {},
            "modificationTime": 0, "dataChange": True,
            "baseRowId": 0, "defaultRowCommitVersion": 0}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f2/" + part["f2"], "size": 1, "partitionValues": {},
            "modificationTime": 0, "dataChange": True,
            "baseRowId": 2, "defaultRowCommitVersion": 0}}) + "\n")
    return t


def test_row_ids_on_column_mapped_table(spark, tmp_path):
    """Row-id reads combine with column mapping: logical names come
    back, fresh ids derive from baseRowId + position, and the
    materialized physical rid column (its on-disk name IS the
    configured physical name) overrides where present."""
    t = _mapped_rt_table(spark, tmp_path)
    got = read_delta(spark, t, with_row_ids=True)
    assert got.columns == ["id", "v", "_row_id", "_row_commit_version"]
    rows = {r["id"]: r["_row_id"] for r in got.collect()}
    assert rows == {1: 0, 2: 1, 3: 7, 4: 9}


def test_row_ids_mapped_partitioned_refused(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import UnsupportedTableFeature

    t = _mapped_rt_table(spark, tmp_path, partitioned=True)
    with pytest.raises(UnsupportedTableFeature, match="PARTITIONED"):
        read_delta(spark, t, with_row_ids=True)


# -------------------------------------------------------- liquid clustering

def test_clustering_lazy_optimize(spark, tmp_path):
    """set_clustering records the domain + feature; a plain OPTIMIZE
    (no zorder_by) then re-clusters along the recorded columns so
    stats-based skipping prunes on BOTH dimensions, and the rewritten
    adds carry clusteringProvider=liquid."""
    from sling_cli_spark.sources.delta_py import (
        _replay_state, clustering_columns, optimize_delta,
        prune_files_by_stats, set_clustering)

    t = str(tmp_path / "t")
    df = spark.range(4000).selectExpr(
        "id", "CAST(id % 63 AS LONG) AS a", "CAST(id % 97 AS LONG) AS b")
    write_delta(df.repartition(8), t)
    set_clustering(t, ["a", "b"])
    assert clustering_columns(t) == ["a", "b"]
    _, _, prot = _replay_state(t)
    assert {"clustering", "domainMetadata"} <= set(prot["writerFeatures"])

    res = optimize_delta(spark, t, target_file_bytes=16 * 1024)
    assert res["new_files"] > 1
    _, files, _ = _replay_state(t)
    assert all(a.get("clusteringProvider") == "liquid"
               for a in files.values())
    pruned = prune_files_by_stats(files, [("b", "<", 10)])
    assert len(pruned) < len(files), "clustered rewrite must enable skipping"
    got = read_delta(spark, t)
    assert got.count() == 4000


def test_clustering_writes_stay_legal(spark, tmp_path):
    """The clustering writer feature imposes no write-time obligation:
    appends and merges to a clustered table commit fine (unclustered
    until the next OPTIMIZE)."""
    from sling_cli_spark.sources.delta_py import set_clustering

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    set_clustering(t, ["id"])
    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    merge_delta(spark, t, _df(spark, [(2, "B")]), "id")
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_clustering_unknown_column_refused(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import set_clustering

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="nope"):
        set_clustering(t, ["nope"])


# ------------------------------------------- collations + icebergCompat

def test_collated_column_stats_omitted(spark, tmp_path):
    """collations writer feature: collation metadata survives writes
    verbatim, and collated string columns get NO min/max bounds (binary
    order may disagree with the collation's) while other columns keep
    theirs."""
    from sling_cli_spark.sources.delta_py import _replay_state

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), t)
    # foreign writer declares a collation on v + the feature
    meta, _, _ = _replay_state(t)
    schema = json.loads(meta["schemaString"])
    schema["fields"][1]["metadata"] = {
        "delta.collation.collationName": "ICU.de_DE"}
    new_meta = dict(meta, schemaString=json.dumps(schema))
    with open(os.path.join(t, "_delta_log", "%020d.json" % 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "collations"]}}) + "\n")
        f.write(json.dumps({"metaData": new_meta}) + "\n")

    write_delta(_df(spark, [(2, "b")]).coalesce(1), t, mode="append")
    _, files, _ = _replay_state(t)
    newest = max(files.values(), key=lambda a: a["modificationTime"])
    st = json.loads(newest["stats"])
    assert "id" in st["minValues"] and "v" not in st["minValues"]
    assert st["numRecords"] == 1
    # metadata untouched by the append
    meta2, _, _ = _replay_state(t)
    assert "delta.collation.collationName" in json.loads(
        meta2["schemaString"])["fields"][1]["metadata"]


def test_iceberg_compat_forces_cow(spark, tmp_path):
    """icebergCompatV2 writer requirement: deletes stay copy-on-write
    even with delta.enableDeletionVectors=true — every commit remains
    convertible."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, f"v{i}") for i in range(10)])
                .coalesce(1), t)
    set_table_properties(t, {"delta.enableDeletionVectors": "true",
                             "delta.enableIcebergCompatV2": "true"})
    res = delete_missing_delta(
        spark, t, _df(spark, [(i, f"v{i}") for i in range(9)]), "id")
    assert "dv_files" not in res or not res["dv_files"]
    assert res["touched"] == 1 and res["new_files"] == 1  # CoW rewrite
    assert {r["id"] for r in read_delta(spark, t).collect()} \
        == set(range(9))


def test_restore_to_version(spark, tmp_path):
    """RESTORE: a DV delete + a CoW merge are rolled back by one
    add/remove commit; time travel to the post-merge version still
    works; vacuumed targets refuse."""
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, restore_delta, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, f"v{i}") for i in range(8)])
                .coalesce(1).sortWithinPartitions("id"), t)
    set_table_properties(t, {"delta.enableDeletionVectors": "true"})
    delete_missing_delta(
        spark, t, _df(spark, [(i, "x") for i in range(6)]), "id")  # DV
    vm = merge_delta(spark, t, _df(spark, [(0, "V0"), (9, "V9")]), "id")
    assert {r["id"] for r in read_delta(spark, t).collect()} \
        == {0, 1, 2, 3, 4, 5, 9}

    res = restore_delta(t, version=0)
    assert res["restored_version"] == 0 and res["re_added"] >= 1
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {i: f"v{i}" for i in range(8)}  # exact v0 state
    post_merge = {r["id"] for r in
                  read_delta(spark, t, version=vm["version"]).collect()}
    assert post_merge == {0, 1, 2, 3, 4, 5, 9}  # history intact


def test_restore_missing_file_refuses(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import restore_delta, vacuum

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), t)
    write_delta(_df(spark, [(2, "b")]).coalesce(1), t, mode="overwrite")
    vacuum(t, keep_versions=1)  # v0's file reclaimed
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_delta(t, version=0)


def test_in_commit_timestamps_monotonic(spark, tmp_path):
    """ICT write side: enabling stamps provenance + the feature; every
    later commit's inCommitTimestamp is strictly increasing even when
    wall clock repeats; timestamp travel reads the ICT."""
    from sling_cli_spark.sources.delta_py import (
        _replay_state, commit_timestamp_ms, set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]).coalesce(1), t)
    v1 = set_table_properties(t, {"delta.enableInCommitTimestamps": "true"})
    meta, _, prot = _replay_state(t)
    assert "inCommitTimestamp" in prot["writerFeatures"]
    conf = meta["configuration"]
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v1)
    v2 = write_delta(_df(spark, [(2, "b")]).coalesce(1), t, mode="append")
    v3 = write_delta(_df(spark, [(3, "c")]).coalesce(1), t, mode="append")
    t1, t2, t3 = (commit_timestamp_ms(t, v) for v in (v1, v2, v3))
    assert t1 < t2 < t3  # strict, not merely non-decreasing
    assert int(conf["delta.inCommitTimestampEnablementTimestamp"]) == t1
    got = read_delta(spark, t, as_of_timestamp_ms=t2)
    assert {r["id"] for r in got.collect()} == {1, 2}


def test_enable_on_v7_table_keeps_feature_list_exact(spark, tmp_path):
    """Regression: enabling a property on a table ALREADY at writer v7
    (explicit feature list, e.g. timestampNtz creation) must not
    re-derive legacy implications — columnMapping was wrongly bolted
    on from mwv >= 5."""
    from sling_cli_spark.sources.delta_py import (
        _replay_state, set_table_properties)

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string") \
        .selectExpr("id", "v", "TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts")
    write_delta(df.coalesce(1), t)
    _, _, prot = _replay_state(t)
    assert prot["minWriterVersion"] == 7  # created featured
    set_table_properties(t, {"delta.enableRowTracking": "true"})
    _, _, prot = _replay_state(t)
    assert "columnMapping" not in prot["writerFeatures"]
    assert "columnMapping" not in (prot.get("readerFeatures") or [])
    assert {"rowTracking", "timestampNtz"} <= set(prot["writerFeatures"])


# --------------------------------------------------------- shallow clone

def test_shallow_clone_reads_and_diverges(spark, tmp_path):
    """clone_delta: zero data copied (absolute adds), DVs keep applying
    via 'p' descriptors, and the clone diverges independently — a merge
    materializes only touched rows into the clone while the source
    stays untouched."""
    import glob as _glob

    from sling_cli_spark.sources.delta_py import (
        clone_delta, delete_missing_delta, merge_delta,
        set_table_properties)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(i, f"v{i}") for i in range(10)])
                .coalesce(1), src)
    write_delta(_df(spark, [(i, f"v{i}") for i in range(10, 20)])
                .coalesce(1), src, mode="append")
    set_table_properties(src, {"delta.enableDeletionVectors": "true"})
    delete_missing_delta(
        spark, src, _df(spark, [(i, "x") for i in range(2, 20)]), "id")

    clone_delta(src, dst)
    assert _glob.glob(os.path.join(dst, "*.parquet")) == []  # no data
    got = {r["id"]: r["v"] for r in read_delta(spark, dst).collect()}
    assert got == {i: f"v{i}" for i in range(2, 20)}  # DV applied

    merge_delta(spark, dst, _df(spark, [(2, "CLONE"), (99, "NEW")]), "id")
    got = {r["id"]: r["v"] for r in read_delta(spark, dst).collect()}
    assert got[2] == "CLONE" and got[99] == "NEW" and len(got) == 19
    # source untouched by the clone's divergence
    src_got = {r["id"]: r["v"] for r in read_delta(spark, src).collect()}
    assert src_got[2] == "v2" and 99 not in src_got
    # the touched file's rows materialized INTO the clone dir
    assert len(_glob.glob(os.path.join(dst, "*.parquet"))) >= 1


def test_shallow_clone_vacuum_never_touches_source(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        clone_delta, merge_delta, vacuum)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), src)
    clone_delta(src, dst)
    merge_delta(spark, dst, _df(spark, [(1, "A")]), "id")  # rewrites
    removed = vacuum(dst, keep_versions=1)
    assert all(str(tmp_path / "src") not in p for p in removed)
    assert {r["id"] for r in read_delta(spark, src).collect()} == {1, 2}
    assert {r["v"] for r in read_delta(spark, dst).collect()} == {"A", "b"}


def test_shallow_clone_partitioned(spark, tmp_path):
    """Clone of a PARTITIONED source: partition values attach from
    add.partitionValues (no shared basePath), reads/merges/appends/
    delete_missing all work, and the clone diverges independently."""
    import glob as _glob

    from sling_cli_spark.sources.delta_py import (
        clone_delta, delete_missing_delta, merge_delta)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(12)],
        "id long, v string, p long")
    write_delta(df, src, partition_by=["p"])

    clone_delta(src, dst)
    assert _glob.glob(os.path.join(dst, "p=*/*.parquet")) == []
    got = {r["id"]: (r["v"], r["p"])
           for r in read_delta(spark, dst).collect()}
    assert got == {i: (f"v{i}", i % 3) for i in range(12)}

    # filter on the partition column (values came from the log)
    assert {r["id"] for r in
            read_delta(spark, dst).filter("p = 1").collect()} \
        == {1, 4, 7, 10}

    # merge: only touched partitions rewrite, into the CLONE dir
    merge_delta(spark, dst, spark.createDataFrame(
        [(1, "CLONE", 1), (99, "NEW", 0)],
        "id long, v string, p long"), "id")
    got = {r["id"]: r["v"] for r in read_delta(spark, dst).collect()}
    assert got[1] == "CLONE" and got[99] == "NEW" and len(got) == 13
    assert len(_glob.glob(os.path.join(dst, "p=*/*.parquet"))) >= 1
    src_got = {r["id"]: r["v"] for r in read_delta(spark, src).collect()}
    assert src_got[1] == "v1" and 99 not in src_got

    # append lands relative adds beside the foreign ones (mixed read)
    write_delta(spark.createDataFrame(
        [(100, "APP", 2)], "id long, v string, p long"), dst,
        mode="append")
    assert read_delta(spark, dst).count() == 14

    # delete_missing prunes by log-attached partition values too
    keep = read_delta(spark, dst).filter("id < 50").select("id", "v", "p")
    delete_missing_delta(spark, dst, keep, "id")
    assert {r["id"] for r in read_delta(spark, dst).collect()} \
        == set(range(12))


# --------------------------------------------- column mapping DDL + writes

def test_enable_column_mapping_and_append(spark, tmp_path):
    """enable_column_mapping: existing files keep reading (physical =
    current names), protocol gains the feature, and appends stage
    physical names."""
    from sling_cli_spark.sources.delta_py import (
        _replay_state, enable_column_mapping)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    enable_column_mapping(t)
    meta, _, prot = _replay_state(t)
    assert "columnMapping" in prot["writerFeatures"]
    assert "columnMapping" in prot["readerFeatures"]
    fields = json.loads(meta["schemaString"])["fields"]
    assert all(f["metadata"]["delta.columnMapping.physicalName"]
               == f["name"] for f in fields)
    assert all("delta.columnMapping.id" in f["metadata"] for f in fields)

    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_rename_column_metadata_only(spark, tmp_path):
    """RENAME COLUMN: logical name flips, zero data files touched; old
    files keep serving through the physical name; appends and merges
    use the new logical name and stage the PHYSICAL one."""
    import glob as _glob

    from sling_cli_spark.sources.delta_py import (
        enable_column_mapping, merge_delta, rename_column)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    enable_column_mapping(t)
    before = set(_glob.glob(os.path.join(t, "*.parquet")))
    rename_column(t, "v", "val")
    assert set(_glob.glob(os.path.join(t, "*.parquet"))) == before

    got = read_delta(spark, t)
    assert got.columns == ["id", "val"]
    assert {r["id"]: r["val"] for r in got.collect()} == {1: "a", 2: "b"}

    # append under the new logical name
    write_delta(spark.createDataFrame([(3, "c")], "id long, val string"),
                t, mode="append")
    # merge updates through the mapped read/probe/stage pipeline
    merge_delta(spark, t, spark.createDataFrame(
        [(2, "B"), (4, "d")], "id long, val string"), "id")
    got = {r["id"]: r["val"] for r in read_delta(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # the new files physically store 'v' (the physical name)
    import pyarrow.parquet as pq
    newest = max(_glob.glob(os.path.join(t, "*.parquet")),
                 key=os.path.getmtime)
    assert "v" in pq.read_schema(newest).names
    assert "val" not in pq.read_schema(newest).names


def test_mapped_partitioned_write_and_merge(spark, tmp_path):
    """Partitioned mapped table: staged dirs / partitionValues key on
    the physical name; prune + merge still work after a partition
    column rename."""
    from sling_cli_spark.sources.delta_py import (
        _replay_state, enable_column_mapping, merge_delta, rename_column)

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 2) for i in range(8)],
        "id long, v string, p long")
    write_delta(df, t, partition_by=["p"])
    enable_column_mapping(t)
    rename_column(t, "p", "part")
    meta, _, _ = _replay_state(t)
    assert meta["partitionColumns"] == ["part"]

    got = read_delta(spark, t)
    assert sorted(got.columns) == ["id", "part", "v"]
    assert got.count() == 8
    merge_delta(spark, t, spark.createDataFrame(
        [(1, "ONE", 1), (99, "NEW", 1)], "id long, v string, part long"),
        "id")
    got = {r["id"]: (r["v"], r["part"])
           for r in read_delta(spark, t).collect()}
    assert got[1] == ("ONE", 1) and got[99] == ("NEW", 1) and len(got) == 9
    # physical partition key recorded in the new adds
    _, files, _ = _replay_state(t)
    assert any("p" in (a.get("partitionValues") or {})
               for a in files.values())


def test_drop_and_add_column(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        add_column, drop_column, enable_column_mapping)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    enable_column_mapping(t)
    drop_column(t, "v")
    assert read_delta(spark, t).columns == ["id"]

    add_column(t, "score", "double")
    got = read_delta(spark, t)
    assert got.columns == ["id", "score"]
    # old files read the new column as null; its physical slot is fresh
    # (never the dropped column's bytes)
    assert all(r["score"] is None for r in got.collect())
    write_delta(spark.createDataFrame([(3, 1.5)], "id long, score double"),
                t, mode="append")
    got = {r["id"]: r["score"] for r in read_delta(spark, t).collect()}
    assert got == {1: None, 2: None, 3: 1.5}


def test_column_mapping_ddl_refusals(spark, tmp_path):
    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, enable_column_mapping, rename_column,
        set_table_properties)

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    with pytest.raises(UnsupportedTableFeature, match="column mapping"):
        rename_column(t, "v", "val")

    enable_column_mapping(t)
    # implicit evolution must point at add_column
    with pytest.raises(UnsupportedTableFeature, match="add_column"):
        write_delta(spark.createDataFrame(
            [(9, "z", 1.0)], "id long, v string, extra double"),
            t, mode="append")
    # overwrite with different columns refuses
    with pytest.raises(UnsupportedTableFeature, match="overwrite"):
        write_delta(spark.createDataFrame([(1,)], "id long"), t,
                    mode="overwrite")
    # constraint-referenced column refuses rename
    set_table_properties(t, {"delta.constraints.vnotnull":
                             "v IS NOT NULL"})
    with pytest.raises(UnsupportedTableFeature, match="constraint"):
        rename_column(t, "v", "val")


def test_auto_checkpoint_interval_property(spark, tmp_path):
    """delta.checkpointInterval: every interval-th commit writes a
    checkpoint automatically (classic or v2 per protocol); the replay
    tail stays O(interval)."""
    import glob as _glob

    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(0, "a")]), t)                      # v0
    D.set_table_properties(t, {"delta.checkpointInterval": "3"})  # v1
    write_delta(_df(spark, [(1, "b")]), t, mode="append")       # v2
    assert D._last_checkpoint_info(t, __import__(
        "sling_cli_spark.fsio", fromlist=["x"]).get_fs(t)) is None
    write_delta(_df(spark, [(2, "c")]), t, mode="append")       # v3
    info = D._last_checkpoint_info(
        t, __import__("sling_cli_spark.fsio", fromlist=["x"]).get_fs(t))
    assert info and int(info["version"]) == 3
    assert _glob.glob(os.path.join(
        t, "_delta_log", f"{3:020d}.checkpoint*.parquet"))
    # state reconstructs from the checkpoint alone
    for v in range(0, 4):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert {r["id"] for r in read_delta(spark, t).collect()} == {0, 1, 2}
    # v2-obliged table takes the v2 form
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, [(0, "a")]), t2)                     # v0
    D.create_checkpoint(t2, v2=True)                            # v1 upgrade
    D.set_table_properties(t2, {"delta.checkpointInterval": "3"})  # v2
    write_delta(_df(spark, [(1, "b")]), t2, mode="append")      # v3
    log = os.path.join(t2, "_delta_log")
    tops = [x for x in os.listdir(log)
            if x.startswith(f"{3:020d}.checkpoint.") and
            x.endswith(".json")]
    assert tops, "interval checkpoint on a v2 table must be v2-form"


def test_version_checksum_incremental(spark, tmp_path):
    """{v}.crc version checksum (delta-spark OSS VersionChecksum):
    every commit writes one, maintained incrementally — appends,
    merges (remove+add with size), DDL all keep tableSizeBytes/
    numFiles true to the replayed state."""
    from sling_cli_spark.sources import delta_py as D

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    merge_delta(spark, t, _df(spark, [(2, "UPD"), (9, "new")]), ["id"])
    write_delta(_df(spark, [(5, "e")]), t, mode="overwrite")
    v = D.latest_version(t)
    for ver in range(v + 1):
        assert os.path.exists(
            os.path.join(t, "_delta_log", f"{ver:020d}.crc")), ver
        res = D.verify_checksum(t, version=ver)
        assert res["ok"] and not res["seeded"], (ver, res)
    # chain survives DDL + keeps matching after more writes
    D.set_table_properties(t, {"delta.appendOnly": "false"})
    write_delta(_df(spark, [(6, "f")]), t, mode="append")
    res = D.verify_checksum(t)
    assert res["ok"] and not res["seeded"]
    # a table whose chain was never seeded: verify seeds it
    import glob as _glob
    for c in _glob.glob(os.path.join(t, "_delta_log", "*.crc")):
        os.remove(c)
    res = D.verify_checksum(t)
    assert res["ok"] and res["seeded"]
    write_delta(_df(spark, [(7, "g")]), t, mode="append")
    assert D.verify_checksum(t)["ok"]
    # corruption detected
    p = D._crc_path(t, D.latest_version(t))
    crc = json.load(open(p))
    crc["numFiles"] += 1
    open(p, "w").write(json.dumps(crc))
    assert D.verify_checksum(t)["ok"] is False


def test_vacuum_retention_hours(spark, tmp_path):
    """retention_hours mode (delta-spark RETAIN semantics): files with
    YOUNG tombstones survive regardless of commit count — a reader of
    a recent snapshot never loses a file mid-scan; retention 0
    reclaims them; untracked strays gate on mtime."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    write_delta(_df(spark, [(9, "z")]), t, mode="overwrite")  # tombstones
    # a stray never tracked by the log, old mtime
    stray = os.path.join(t, "stray-leftover.parquet")
    open(stray, "wb").write(b"x")
    os.utime(stray, (1, 1))

    kept = vacuum(t, retention_hours=1.0)
    assert all("stray" in r for r in kept), \
        f"young tombstones must survive retention, deleted: {kept}"
    assert read_delta(spark, t, version=0).count() == 2  # travel intact

    removed = vacuum(t, retention_hours=0.0)
    assert len(removed) >= 1  # the tombstoned v0 files
    assert {r["id"] for r in read_delta(spark, t).collect()} == {9}


def test_read_delta_incremental_by_row_tracking(spark, tmp_path):
    """read_delta_incremental (r10, the iceberg incremental-by-lineage
    twin): files at or below the version watermark prune from log
    metadata; a DV merge's updated rows and an append surface exactly
    once; rewrite-carried old rows stay out via their materialized
    commit version."""
    import pytest as _pytest

    from sling_cli_spark.sources.delta_py import (
        UnsupportedTableFeature, merge_delta, read_delta_incremental,
        replay_log, set_table_properties, write_delta)

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "k long, name string")
    write_delta(df.coalesce(1).sortWithinPartitions("k"), t)  # v0
    with _pytest.raises(UnsupportedTableFeature, match="RowTracking"):
        read_delta_incremental(spark, t, 0)
    set_table_properties(t, {"delta.enableRowTracking": "true",
                             "delta.enableDeletionVectors": "true"})
    wm = 1  # the property commit; consumer checkpoint

    assert read_delta_incremental(spark, t, wm).count() == 0

    # DV merge updates k in {2,5} (v2): updated rows move to a new
    # file, untouched rows keep their old file (pruned)
    merge_delta(spark, t,
                spark.createDataFrame([(2, "U2"), (5, "U5")],
                                      "k long, name string"), "k")
    write_delta(
        spark.createDataFrame([(90, "new")], "k long, name string")
        .coalesce(1), t, mode="append")  # v3
    inc = read_delta_incremental(spark, t, wm)
    got = {(r.k, r.name, r._row_commit_version) for r in inc.collect()}
    assert got == {(2, "U2", 2), (5, "U5", 2), (90, "new", 3)}
    # row ids stable: updated rows kept theirs
    ids = {r.k: r._row_id for r in inc.collect()}
    assert ids[2] == 2 and ids[5] == 5

    # metadata prune: the original file (defaultRowCommitVersion 0,
    # DV re-add keeps it) is not in the incremental scan's file set
    _, files = replay_log(t)
    fresh = [rel for rel, add in files.items()
             if int(add.get("defaultRowCommitVersion") or 0) > wm]
    assert 0 < len(fresh) < len(files)
