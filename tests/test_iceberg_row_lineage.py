"""Iceberg v3 row lineage READ surface (spec v3 §Row Lineage).

The write side has assigned ``first_row_id`` ranges / ``next-row-id``
since round 8 (iceberg_py._commit_snapshot); these tests pin the r10
read surface — ``read_iceberg(with_row_ids=True)`` materializing
``_row_id`` / ``_last_updated_sequence_number`` — and the writer
requirement that rewrites (merge / delete_missing / compact) preserve
ids by materializing them into the rewritten files. Reference behavior:
the public Iceberg spec v3; the repo's own Delta row tracking
(delta_py._scan_with_row_ids / _rt_attach_preserved) is the format twin.
"""
import os

import pytest
from pyspark.sql import functions as F

from sling_cli_spark.sources.iceberg_py import (
    UnsupportedTableFeature, compact_iceberg, delete_missing_iceberg,
    merge_iceberg, read_iceberg, write_iceberg)


def _tbl(tmp_path, name="t"):
    return os.path.join(str(tmp_path), name)


def _rows(spark, t):
    return {
        r.k: (r.name, r._row_id, r._last_updated_sequence_number)
        for r in read_iceberg(spark, t, with_row_ids=True).collect()}


def test_fresh_write_assigns_positional_ids(spark, tmp_path):
    t = _tbl(tmp_path)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "k long, name string")
    write_iceberg(df.coalesce(1).sortWithinPartitions("k"), t,
                  format_version=3)
    got = _rows(spark, t)
    # one sorted file: _row_id == first_row_id (0) + position == k
    assert got == {i: (f"n{i}", i, 1) for i in range(8)}


def test_append_continues_from_next_row_id(spark, tmp_path):
    t = _tbl(tmp_path)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(5)], "k long, name string")
    write_iceberg(df.coalesce(1).sortWithinPartitions("k"), t,
                  format_version=3)
    write_iceberg(
        spark.createDataFrame([(90, "A"), (91, "B")],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, mode="append")
    got = _rows(spark, t)
    assert got[90] == ("A", 5, 2) and got[91] == ("B", 6, 2)
    assert got[0] == ("n0", 0, 1)


def test_v2_table_refuses_row_id_read(spark, tmp_path):
    t = _tbl(tmp_path)
    write_iceberg(spark.range(3).withColumnRenamed("id", "k"), t,
                  format_version=2)
    with pytest.raises(UnsupportedTableFeature, match="format-version"):
        read_iceberg(spark, t, with_row_ids=True)


def test_plain_read_never_leaks_lineage_columns(spark, tmp_path):
    t = _tbl(tmp_path)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(6)], "k long, name string")
    write_iceberg(df.coalesce(1), t, format_version=3)
    compact_iceberg(spark, t, min_files=1)  # materializes the columns
    out = read_iceberg(spark, t)
    assert "_row_id" not in out.columns
    assert "_last_updated_sequence_number" not in out.columns
    assert out.count() == 6


def test_merge_preserves_ids_and_resets_updated_seq(spark, tmp_path):
    t = _tbl(tmp_path)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(10)], "k long, name string")
    write_iceberg(df.coalesce(1).sortWithinPartitions("k"), t,
                  format_version=3)
    src = spark.createDataFrame(
        [(2, "U2"), (7, "U7"), (100, "I")], "k long, name string")
    merge_iceberg(spark, t, src, "k", use_dvs=False)
    got = _rows(spark, t)
    # updated rows keep _row_id, take the merge commit's seq (2)
    assert got[2] == ("U2", 2, 2) and got[7] == ("U7", 7, 2)
    # untouched rows in the rewritten file keep BOTH (materialized)
    for k in (0, 1, 3, 4, 5, 6, 8, 9):
        assert got[k] == (f"n{k}", k, 1)
    # inserted row takes a fresh id past every allocated range
    assert got[100][1] >= 10 and got[100][2] == 2


def test_compaction_preserves_ids_verbatim(spark, tmp_path):
    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(4)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, format_version=3)
    write_iceberg(
        spark.createDataFrame([(10, "x"), (11, "y")],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, mode="append")
    before = _rows(spark, t)
    res = compact_iceberg(spark, t, min_files=2)
    assert res["compacted"] == 2 and res["new_files"] == 1
    assert _rows(spark, t) == before


def test_delete_missing_survivors_keep_ids(spark, tmp_path):
    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(6)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, format_version=3)
    keep = spark.createDataFrame([(0,), (2,), (5,)], "k long")
    delete_missing_iceberg(spark, t, keep, "k")
    got = _rows(spark, t)
    assert got == {0: ("n0", 0, 1), 2: ("n2", 2, 1), 5: ("n5", 5, 1)}


def test_dv_delete_retires_ids_without_rewrite(spark, tmp_path):
    # v3 DV path: deleted rows vanish, survivors' positions (and
    # therefore derived ids) are untouched — no materialization needed
    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(6)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, format_version=3)
    keep = spark.createDataFrame([(i,) for i in (0, 3, 4)], "k long")
    res = delete_missing_iceberg(spark, t, keep, "k", use_dvs=True)
    assert res.get("dv_files")
    got = _rows(spark, t)
    assert got == {k: (f"n{k}", k, 1) for k in (0, 3, 4)}


def test_staging_lineage_columns_refused_below_v3(spark, tmp_path):
    t = _tbl(tmp_path)
    df = spark.range(3).withColumnRenamed("id", "k") \
        .withColumn("_row_id", F.col("k"))
    with pytest.raises(UnsupportedTableFeature, match="row-lineage"):
        write_iceberg(df, t, format_version=2)


def test_incremental_by_lineage_prunes_and_filters(spark, tmp_path):
    """read_iceberg_incremental: files at or below the watermark seq
    never open (metadata prune); rewritten files' carried-forward old
    rows are row-filtered out; the increment is exactly the created +
    updated rows."""
    from sling_cli_spark.sources.iceberg_py import (
        _active_entries, _current_metadata, read_iceberg_incremental)

    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(6)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, format_version=3)
    _, m1 = _current_metadata(t)
    wm = int(m1["last-sequence-number"])  # consumer checkpoint

    # nothing since the watermark: zero files scanned, zero rows
    inc0 = read_iceberg_incremental(spark, t, wm)
    assert inc0.count() == 0

    # an update merge + an append land after the watermark
    merge_iceberg(spark, t,
                  spark.createDataFrame([(2, "U2")], "k long, name string"),
                  "k", use_dvs=False)
    write_iceberg(
        spark.createDataFrame([(50, "new")], "k long, name string")
        .coalesce(1), t, mode="append")
    inc = read_iceberg_incremental(spark, t, wm)
    got = {(r.k, r.name, r._last_updated_sequence_number)
           for r in inc.collect()}
    # ONLY the updated row and the insert — the merge's rewritten file
    # carries rows 0,1,3,4,5 too, but their materialized seq (1) keeps
    # them out of the increment
    assert got == {(2, "U2", 2), (50, "new", 3)}

    # metadata prune really skipped the pre-watermark state: after a
    # fresh baseline write + watermark, the plan scans ZERO files
    _, m2 = _current_metadata(t)
    wm2 = int(m2["last-sequence-number"])
    files, _, _ = _active_entries(t, m2, None)
    pruned = [f for f in files if int(f.get("__seq") or 0) > wm2]
    assert pruned == []  # the driver-side decision the scan is built on


def test_incremental_by_lineage_refuses_untracked_files(spark, tmp_path):
    """Foreign tables upgraded to v3 without rewriting old manifests
    have null first_row_id on pre-upgrade files — the incremental read
    refuses rather than silently dropping their rows."""
    from sling_cli_spark.sources.iceberg_py import (
        add_deletion_vectors, read_iceberg_incremental)

    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(5)],
                              "k long, name string")
        .coalesce(1), t, format_version=2)
    add_deletion_vectors(t, {})  # upgrades to v3, no manifest rewrite
    with pytest.raises(UnsupportedTableFeature, match="first_row_id"):
        read_iceberg_incremental(spark, t, 0)


def test_eq_upsert_retires_identity_fresh_ids_seq_advances(spark, tmp_path):
    """r11 (verdict ask #7, pins the documented upsert x lineage
    semantics): upsert_iceberg never scans the target, so an upserted
    row CANNOT carry its old _row_id — the spec permits delete+insert
    identity loss. Pin: (a) re-inserted rows get FRESH ids from the
    upsert commit's first_row_id range (old ids retired, never
    reused), (b) their _last_updated_sequence_number is the upsert's
    seq, (c) untouched rows keep id AND seq, (d) merge_iceberg remains
    the id-preserving alternative the docstring steers lineage
    consumers to."""
    from sling_cli_spark.sources.iceberg_py import (
        _current_metadata, upsert_iceberg)

    t = _tbl(tmp_path)
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(5)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t, format_version=3)
    before = _rows(spark, t)
    assert {v[1] for v in before.values()} == {0, 1, 2, 3, 4}
    seq1 = int(_current_metadata(t)[1]["last-sequence-number"])

    upsert_iceberg(
        spark, t,
        spark.createDataFrame([(1, "n1_u"), (9, "n9_new")],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), "k")
    after = _rows(spark, t)
    seq2 = int(_current_metadata(t)[1]["last-sequence-number"])
    assert seq2 > seq1, "upsert must advance the sequence number"
    # (a) the upserted row's old identity is retired; fresh id assigned
    # past the pre-upsert high watermark
    assert after[1][1] != before[1][1]
    assert after[1][1] >= 5 and after[9][1] >= 5
    assert after[1][1] != after[9][1]
    # (b) upserted rows carry the new commit's seq
    assert after[1][2] == seq2 and after[9][2] == seq2
    # (c) untouched rows keep id and seq
    for k in (0, 2, 3, 4):
        assert after[k] == before[k]
    # (d) merge_iceberg PRESERVES the id for the same shape of change
    t2 = _tbl(tmp_path, "t2")
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(5)],
                              "k long, name string")
        .coalesce(1).sortWithinPartitions("k"), t2, format_version=3)
    b2 = _rows(spark, t2)
    merge_iceberg(
        spark, t2,
        spark.createDataFrame([(1, "n1_u")], "k long, name string"),
        "k", use_dvs=False)
    a2 = _rows(spark, t2)
    assert a2[1][0] == "n1_u" and a2[1][1] == b2[1][1], \
        "merge keeps the row's identity where upsert retires it"
