"""Minor log compaction (delta-kernel ``{s}.{e}.compacted.json``
convention): compact_log writes one reconciled log object for a commit
range; _log_texts substitutes it for the per-version JSON commits —
one object-store read instead of (e - s + 1) per snapshot resolution."""

import json
import os

import pytest

from sling_cli_spark.sources.delta_py import (
    _replay_state, compact_log, create_checkpoint, read_delta, write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _build(spark, t, n=6):
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)
    for i in range(1, n):
        write_delta(_df(spark, [(10 + i, f"v{i}")]), t, mode="append")


def test_compact_log_writes_reconciled_file(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n=6)
    before = _replay_state(t)
    out = compact_log(t, 0, 4)
    assert out.endswith(f"{0:020d}.{4:020d}.compacted.json")
    assert os.path.exists(out)
    actions = [json.loads(x) for x in open(out) if x.strip()]
    kinds = [next(iter(a)) for a in actions]
    # exactly one reconciled protocol + metaData, then net adds
    assert kinds.count("protocol") == 1 and kinds.count("metaData") == 1
    adds = [a["add"]["path"] for a in actions if "add" in a]
    assert len(adds) == len(set(adds)) >= 5
    # additive: raw commits untouched, replay result identical
    after = _replay_state(t)
    assert after[0] == before[0]
    assert sorted(after[1]) == sorted(before[1])


def test_compaction_substitutes_for_cleaned_commits(spark, tmp_path):
    """Delete the raw JSON commits the compaction covers — the read
    MUST still reconstruct the full state through the compacted file
    (proof the reader actually uses it, not just tolerates it)."""
    t = str(tmp_path / "t")
    _build(spark, t, n=6)
    expect = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    compact_log(t, 0, 4)
    for v in range(0, 5):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == expect


def test_compaction_reconciles_overwrite_tombstones(spark, tmp_path):
    """An overwrite inside the range removes every earlier add; the
    compacted file must carry remove tombstones so state seeded from
    BEFORE the range (checkpoint) still drops those files."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), t)          # v0
    create_checkpoint(t)                                      # cp @ 0
    write_delta(_df(spark, [(3, "c")]), t, mode="append")     # v1
    write_delta(_df(spark, [(9, "z")]), t, mode="overwrite")  # v2
    write_delta(_df(spark, [(8, "y")]), t, mode="append")     # v3
    out = compact_log(t, 1, 3)
    actions = [json.loads(x) for x in open(out) if x.strip()]
    removes = [a["remove"]["path"] for a in actions if "remove" in a]
    assert removes, "overwrite tombstones must survive reconciliation"
    for v in range(1, 4):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got == {9: "z", 8: "y"}


def test_compaction_after_checkpoint_seed(spark, tmp_path):
    """Reader path: checkpoint @2 seeds, compaction 3..5 substitutes
    the tail."""
    t = str(tmp_path / "t")
    _build(spark, t, n=6)
    create_checkpoint(t, version=2)
    compact_log(t, 3, 5)
    expect = {r["id"] for r in read_delta(spark, t).collect()}
    for v in range(3, 6):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert {r["id"] for r in read_delta(spark, t).collect()} == expect


def test_compact_log_refuses_holes_and_bad_range(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n=4)
    os.remove(os.path.join(t, "_delta_log", f"{2:020d}.json"))
    with pytest.raises(FileNotFoundError):
        compact_log(t, 0, 3)
    with pytest.raises(ValueError):
        compact_log(t, 3, 3)


def test_widest_compaction_wins(spark, tmp_path):
    """Two compactions share a start — the reader picks the widest
    (fewest reads); the narrow one is ignored, not double-applied."""
    t = str(tmp_path / "t")
    _build(spark, t, n=6)
    expect = {r["id"] for r in read_delta(spark, t).collect()}
    compact_log(t, 0, 2)
    compact_log(t, 0, 5)
    for v in range(0, 5):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert {r["id"] for r in read_delta(spark, t).collect()} == expect


def test_time_travel_prefers_raw_commits_within_limit(spark, tmp_path):
    """version= below a compaction's end: the compacted object covers
    MORE than the asked range, so the reader must fall back to the
    per-version commits (authoritative) for the bounded replay."""
    t = str(tmp_path / "t")
    _build(spark, t, n=6)
    compact_log(t, 0, 5)
    assert {r["id"] for r in read_delta(spark, t, version=1).collect()} \
        == {1, 2, 11}


def test_compaction_preserves_txn_markers(spark, tmp_path):
    """SetTransaction markers ride the compacted object: the streaming
    sink's exactly-once probe must survive retention of the raw
    commits."""
    from sling_cli_spark.sources.delta_py import last_txn_version

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t,
                txn_app_id="app1", txn_version=7)
    write_delta(_df(spark, [(2, "b")]), t, mode="append",
                txn_app_id="app1", txn_version=9)
    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    assert last_txn_version(t, "app1") == 9
    compact_log(t, 0, 2)
    for v in range(0, 2):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert last_txn_version(t, "app1") == 9
    # a replayed batch would still be skipped
    write_delta(_df(spark, [(9, "x")]), t, mode="append",
                txn_app_id="app1", txn_version=9)
    assert {r["id"] for r in read_delta(spark, t).collect()} == {1, 2, 3}
