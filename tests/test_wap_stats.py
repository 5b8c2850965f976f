"""Statistics freshness across WAP publish (VERDICT r9 ask #8).

``statistics`` / ``partition-statistics`` entries key on a snapshot id
(Iceberg spec §Table Statistics / §Partition Statistics). A stats file
computed against an audit branch is keyed to the BRANCH head, so:

- fast_forward publishes that very snapshot id onto main — the stats
  resolve at the published head with no extra work;
- cherry-pick MINTS a new snapshot (possibly on a moved head whose
  data composition differs from the branch) — branch-keyed stats must
  NOT resolve there (re-keying them would describe the wrong data);
  recomputing at the published head is the supported path.
"""
import os

import pytest

from sling_cli_spark.sources.iceberg_py import (
    analyze_iceberg, cherry_pick_snapshot, compute_partition_stats,
    fast_forward, iceberg_ndv, read_partition_stats, write_iceberg)


def _nations(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(lo, hi)],
        "k long, name string, region long")


def test_branch_stats_resolve_after_fast_forward(spark, tmp_path):
    t = os.path.join(str(tmp_path), "t")
    write_iceberg(_nations(spark, 0, 10), t, partition_by=["region"])
    write_iceberg(_nations(spark, 10, 16), t, mode="append",
                  branch="audit")
    ndv = analyze_iceberg(spark, t, columns=["k"], ref="audit")
    assert ndv["k"] == 16  # branch view: main rows + staged rows
    pres = compute_partition_stats(t, ref="audit")
    assert pres["rows"] == 3
    # before publish: main's head has no stats entry
    assert iceberg_ndv(t) == {}
    with pytest.raises(FileNotFoundError,
                       match="no partition statistics"):
        read_partition_stats(spark, t)
    fast_forward(t, "audit")
    # published head IS the branch head — stats resolve untouched
    assert iceberg_ndv(t) == {"k": 16}
    ps = read_partition_stats(spark, t)
    assert ps.count() == 3
    assert sum(r.data_record_count for r in ps.collect()) == 16


def test_branch_stats_go_stale_on_cherry_pick_then_recompute(
        spark, tmp_path):
    t = os.path.join(str(tmp_path), "t")
    write_iceberg(_nations(spark, 0, 10), t, partition_by=["region"])
    from sling_cli_spark.sources.iceberg_py import _current_metadata

    staged_sid = write_iceberg(
        _nations(spark, 10, 16), t, mode="append", branch="audit")
    analyze_iceberg(spark, t, columns=["k"], ref="audit")
    # main moves: fast-forward is now impossible, publish cherry-picks
    write_iceberg(_nations(spark, 100, 104), t, mode="append")
    new_sid = cherry_pick_snapshot(t, staged_sid)
    _, meta = _current_metadata(t)
    assert meta["current-snapshot-id"] == new_sid != staged_sid
    # branch-keyed stats describe (fork + staged), NOT the published
    # (fork + moved-head + staged) — they must not resolve here
    assert iceberg_ndv(t) == {}
    # the supported path: recompute at the published head
    ndv = analyze_iceberg(spark, t, columns=["k"])
    assert ndv["k"] == 20
    assert iceberg_ndv(t) == {"k": 20}
    pres = compute_partition_stats(t)
    assert pres["rows"] == 3
    assert sum(r.data_record_count
               for r in read_partition_stats(spark, t).collect()) == 20
