"""Pin the r15 driver-side Arrow staging fast path (guide §1.2/§5,
sources/driver_stage.py): a proven-small staged frame collects via
Arrow and writes one zstd file driver-side instead of paying a
distributed write job. The COMMITTED TABLE STATE must be identical to
the Spark-write path — values, change feed, stats presence — and any
fast-path failure must fall back to the Spark write transparently.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


def canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.fixture
def nation(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
            .select(F.col("n_nationkey").cast("long").alias("k"),
                    "n_name",
                    F.col("n_regionkey").cast("long").alias("r")))


def _mk_delta(spark, nation, props=None):
    from sling_cli_spark.sources.delta_py import (set_table_properties,
                                                  write_delta)

    t = os.path.join(tempfile.mkdtemp(prefix="sling_dstage_"), "t")
    write_delta(nation, t)
    if props:
        set_table_properties(t, props)
    return t


def test_merge_delta_hint_matches_spark_write(spark, nation):
    from sling_cli_spark.sources.delta_py import merge_delta, read_delta

    batch = nation.filter("k % 3 = 0") \
        .withColumn("n_name", F.concat("n_name", F.lit("_u")))
    t_hint = _mk_delta(spark, nation)
    t_ref = _mk_delta(spark, nation)
    r_hint = merge_delta(spark, t_hint, batch, ["k"],
                         batch_rows=batch.count())
    r_ref = merge_delta(spark, t_ref, batch, ["k"])
    assert canon(read_delta(spark, t_hint)) == canon(read_delta(spark, t_ref))
    assert r_hint["touched"] == r_ref["touched"]
    assert r_hint["kept"] == r_ref["kept"]
    # the hinted stage wrote exactly one driver-side part file
    assert r_hint["new_files"] == 1


def test_merge_delta_hint_cdf_identical(spark, nation):
    from sling_cli_spark.sources.delta_py import (merge_delta,
                                                  read_change_feed)

    batch = nation.filter("k < 8") \
        .withColumn("r", F.col("r") + 100)
    t_hint = _mk_delta(spark, nation,
                       {"delta.enableChangeDataFeed": "true"})
    t_ref = _mk_delta(spark, nation,
                      {"delta.enableChangeDataFeed": "true"})
    merge_delta(spark, t_hint, batch, ["k"], batch_rows=batch.count())
    merge_delta(spark, t_ref, batch, ["k"])
    cols = ["k", "n_name", "r", "_change_type"]
    got = read_change_feed(spark, t_hint, starting_version=1) \
        .select(*cols)
    want = read_change_feed(spark, t_ref, starting_version=1) \
        .select(*cols)
    assert canon(got) == canon(want)


def test_stage_small_carries_footer_stats(spark, nation):
    import json

    from sling_cli_spark.sources.delta_py import (_replay_state,
                                                  merge_delta)

    t = _mk_delta(spark, nation)
    batch = nation.filter("k = 1").withColumn(
        "n_name", F.lit("XX"))
    merge_delta(spark, t, batch, ["k"], batch_rows=1)
    _, files, _ = _replay_state(t)
    staged = [a for p, a in files.items() if ".zstd.parquet" in p]
    assert staged, "fast-path staged file missing from the log"
    for a in staged:
        st = json.loads(a["stats"])
        assert st["numRecords"] > 0
        assert "minValues" in st and "maxValues" in st


def test_upsert_iceberg_hint_matches_spark_write(spark, nation):
    from sling_cli_spark.sources.iceberg_py import (read_iceberg,
                                                    upsert_iceberg,
                                                    write_iceberg)

    batch = nation.filter("k % 4 = 1") \
        .withColumn("n_name", F.concat("n_name", F.lit("_u")))
    outs = []
    for hint in (batch.count(), None):
        t = os.path.join(tempfile.mkdtemp(prefix="sling_istage_"), "t")
        write_iceberg(nation, t)
        upsert_iceberg(spark, t, batch, "k", batch_rows=hint)
        outs.append(canon(read_iceberg(spark, t)))
    assert outs[0] == outs[1]


def test_fast_path_failure_falls_back(spark, nation, monkeypatch):
    """A fast path that cannot stage (collect raises) must leave the
    Spark write to produce the identical result."""
    import sling_cli_spark.sources.driver_stage as ds
    from sling_cli_spark.sources.delta_py import merge_delta, read_delta

    batch = nation.filter("k < 5") \
        .withColumn("n_name", F.lit("fb"))
    t_broken = _mk_delta(spark, nation)
    t_ref = _mk_delta(spark, nation)

    calls = []
    orig = ds.driver_stage_parquet

    def exploding(df, tmp):
        calls.append(tmp)
        raise_df = df.select(F.raise_error(F.lit("boom")))
        try:
            return orig(raise_df, tmp)  # collect fails -> False
        finally:
            pass

    monkeypatch.setattr(ds, "driver_stage_parquet", exploding)
    merge_delta(spark, t_broken, batch, ["k"], batch_rows=batch.count())
    monkeypatch.undo()
    merge_delta(spark, t_ref, batch, ["k"], batch_rows=batch.count())
    assert calls, "fast path was never attempted"
    assert canon(read_delta(spark, t_broken)) == \
        canon(read_delta(spark, t_ref))


def test_column_mapped_table_keeps_spark_write(spark, nation,
                                               monkeypatch):
    """cm != none must never take the Arrow path (physical files carry
    parquet field-id metadata)."""
    import sling_cli_spark.sources.driver_stage as ds
    from sling_cli_spark.sources.delta_py import (enable_column_mapping,
                                                  merge_delta, read_delta)

    t = _mk_delta(spark, nation)
    enable_column_mapping(t)
    used = []
    orig = ds.driver_stage_parquet
    monkeypatch.setattr(
        ds, "driver_stage_parquet",
        lambda df, tmp: used.append(tmp) or orig(df, tmp))
    batch = nation.filter("k < 3").withColumn("n_name", F.lit("cm"))
    merge_delta(spark, t, batch, ["k"], batch_rows=batch.count())
    assert not used, "fast path fired on a column-mapped table"
    assert read_delta(spark, t).filter("n_name = 'cm'").count() == 3
