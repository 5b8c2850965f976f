"""File-granular parquet merge: rewrite only touched files.

Parity: merge_files must produce exactly what the full-rewrite
merge_dataframes plans produce. Amplification: files without matched PKs
must survive BYTE-IDENTICAL (not rewritten), which is the point — at
100x scale an incremental batch touching 0.1% of PKs must not rewrite
100% of the target.
"""

import glob
import os

import pytest

from sling_cli_spark.config import Config, MergeStrategy
from sling_cli_spark.operators.file_merge import merge_files, touched_files


def _make_target(spark, path, n_files=8, rows_per_file=100):
    """n_files parquet files, ids clustered per file (file i holds
    [i*rows, (i+1)*rows) ) — the time-clustered incremental shape."""
    for i in range(n_files):
        spark.range(i * rows_per_file, (i + 1) * rows_per_file) \
            .selectExpr("id", "cast(id as string) as v", "id as ts") \
            .coalesce(1).write.mode("append").parquet(path)


def _file_bytes(path):
    return {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(path, "part-*.parquet"))
    }


def _batch(spark, ids, bump=1000):
    return spark.createDataFrame(
        [(i, f"V{i}", i + bump) for i in ids], "id long, v string, ts long")


def test_touched_files_identifies_only_matching_files(spark, tmp_path):
    tgt = str(tmp_path / "t.parquet")
    _make_target(spark, tgt)
    batch = _batch(spark, [5, 105])  # files 0 and 1 only
    t = spark.read.parquet(tgt)
    touched = touched_files(t, batch, "id")
    assert len(touched) == 2


@pytest.mark.parametrize("strategy", [
    MergeStrategy.UPDATE_INSERT, MergeStrategy.UPDATE,
    MergeStrategy.DELETE_INSERT, MergeStrategy.INSERT,
])
def test_merge_files_parity_with_full_rewrite(spark, tmp_path, strategy):
    from sling_cli_spark.operators.merge import merge_dataframes

    tgt = str(tmp_path / f"t_{strategy.value}.parquet")
    _make_target(spark, tgt, n_files=4, rows_per_file=50)
    # batch: updates in file 1 + brand-new ids
    batch = _batch(spark, [60, 61, 980, 981])

    expected = sorted(
        tuple(r) for r in merge_dataframes(
            spark.read.parquet(tgt), batch, "id", strategy=strategy,
        ).collect())

    merge_files(spark, tgt, batch, "id", strategy=strategy)
    got = sorted(tuple(r) for r in spark.read.parquet(tgt).collect())
    assert got == expected


def test_untouched_files_survive_byte_identical(spark, tmp_path):
    tgt = str(tmp_path / "t.parquet")
    _make_target(spark, tgt, n_files=8, rows_per_file=100)
    before = _file_bytes(tgt)

    batch = _batch(spark, [710, 711, 712])  # only file 7 matched
    stats = merge_files(spark, tgt, batch, "id")

    assert stats["touched"] == 1
    after = _file_bytes(tgt)
    untouched_before = {f: b for f, b in before.items() if f in after}
    # 7 of the 8 original files still present, byte-for-byte
    assert len(untouched_before) == 7
    for f, b in untouched_before.items():
        assert after[f] == b
    # content correct
    rows = {r["id"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert rows[710] == "V710" and rows[0] == "0" and len(rows) == 800


def test_insert_strategy_rewrites_nothing(spark, tmp_path):
    tgt = str(tmp_path / "t.parquet")
    _make_target(spark, tgt, n_files=4, rows_per_file=50)
    before = set(_file_bytes(tgt))
    # id 10 exists (must not duplicate), 900 is new
    stats = merge_files(spark, tgt, _batch(spark, [10, 900]), "id",
                        strategy=MergeStrategy.INSERT)
    assert stats["touched"] == 0
    assert before <= set(_file_bytes(tgt))  # originals all intact
    back = spark.read.parquet(tgt)
    assert back.count() == 201
    assert back.filter("id = 10").count() == 1  # no duplicate


def test_runner_uses_file_granular_merge(spark, tmp_path):
    from sling_cli_spark.runner import run

    tgt = str(tmp_path / "t.parquet")
    _make_target(spark, tgt, n_files=6, rows_per_file=100)
    before = _file_bytes(tgt)

    src = tmp_path / "batch.csv"
    src.write_text("id,v,ts\n510,VX,2000\n")
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": tgt},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=spark.read.parquet(tgt))
    assert r.merge_stats is not None and r.merge_stats["touched"] == 1
    after = _file_bytes(tgt)
    surviving = [f for f in before if f in after]
    assert len(surviving) == 5  # 5 of 6 untouched
    rows = {x["id"]: x["v"] for x in spark.read.parquet(tgt).collect()}
    assert rows[510] == "VX" and len(rows) == 600


def test_runner_falls_back_on_schema_drift(spark, tmp_path):
    from sling_cli_spark.runner import run

    tgt = str(tmp_path / "t.parquet")
    _make_target(spark, tgt, n_files=2, rows_per_file=10)
    src = tmp_path / "batch.csv"
    src.write_text("id,v,ts,extra\n5,VX,2000,e\n")
    cfg = Config.from_dict({
        "source": {"stream": str(src), "primary_key": "id",
                   "update_key": "ts",
                   "options": {"columns": {"id": "bigint", "ts": "bigint"}}},
        "target": {"object": tgt},
        "mode": "incremental"})
    r = run(spark, cfg, target_df=spark.read.parquet(tgt))
    assert r.merge_stats is None  # swap path took over
    back = spark.read.parquet(tgt)
    assert "extra" in back.columns and back.count() == 20


# ---------------------------------------------------------------- round 4

def test_partitioned_merge_rewrites_only_touched_partition(spark, tmp_path):
    """Hive-layout target: only files in partitions present in the batch
    are probed/rewritten; other partitions' files stay byte-identical."""
    import glob

    from sling_cli_spark.operators.file_merge import (
        merge_files, partition_columns)

    t = str(tmp_path / "pt")
    spark.range(0, 300).selectExpr(
        "id", "cast(id as string) v", "cast(id % 3 as string) bucket") \
        .repartition(3, "bucket") \
        .write.partitionBy("bucket").parquet(t)
    assert partition_columns(spark, t) == ["bucket"]
    before = {p: os.path.getmtime(p)
              for p in glob.glob(os.path.join(t, "bucket=*", "*.parquet"))}
    untouched = {p for p in before if "bucket=1" not in p}

    batch = spark.createDataFrame(
        [(1, "X", "1"), (301, "new", "1")], "id long, v string, bucket string")
    stats = merge_files(spark, t, batch, "id")
    assert stats["touched"] >= 1
    # untouched partitions' files still exist with original mtimes
    for p in untouched:
        assert os.path.exists(p) and os.path.getmtime(p) == before[p]
    got = {r["id"]: (r["v"], str(r["bucket"])) for r in
           spark.read.parquet(t).collect()}
    assert got[1] == ("X", "1") and got[301] == ("new", "1")
    assert len(got) == 301


def test_runner_eligibility_partitioned(spark, tmp_path):
    from sling_cli_spark.config import Config
    from sling_cli_spark.runner import _file_merge_eligible

    t = str(tmp_path / "pe")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id long, v string, part string") \
        .write.partitionBy("part").parquet(t)
    target_df = spark.read.parquet(t)
    cfg = Config.from_dict({
        "source": {"stream": "dummy", "primary_key": "id"},
        "target": {"object": t},
        "mode": "incremental"})
    # batch WITH the partition column: eligible
    df = spark.createDataFrame([(1, "X", "x")], "id long, v string, part string")
    df = df.select(*target_df.columns)
    assert _file_merge_eligible(spark, cfg, target_df, df)
    # batch WITHOUT it: falls back
    df2 = spark.createDataFrame([(1, "X")], "id long, v string")
    assert not _file_merge_eligible(spark, cfg, target_df, df2)
