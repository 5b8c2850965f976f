"""Incremental-by-lineage scale probe: files opened vs table size.

Builds a 60-commit table in each format (one data file per commit,
FastAppend on the Iceberg side), then reads the increment past a
watermark one commit back. The claim under test: the scan's file set
is decided from manifest/log METADATA the driver already holds — the
increment opens files in O(data since watermark), not O(table).

Usage: python tools/incremental_probe.py
Prints one JSON line per format: {format, commits, files_active,
files_scanned, rows_incremental, wall_sec}.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COMMITS = 60
ROWS_PER = 100


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("incremental-probe").getOrCreate())

    # ---- iceberg ----
    from sling_cli_spark.sources import iceberg_py as I

    t = os.path.join(tempfile.mkdtemp(prefix="inc_probe_i_"), "t")
    for c in range(N_COMMITS):
        df = spark.createDataFrame(
            [(c * ROWS_PER + i, f"c{c}") for i in range(ROWS_PER)],
            "k long, v string").coalesce(1)
        I.write_iceberg(df, t, format_version=3,
                        mode="append" if c else "error")
    _, meta = I._current_metadata(t)
    wm = int(meta["last-sequence-number"]) - 1  # one commit back
    files, _, _ = I._active_entries(t, meta, None)
    fresh = [f for f in files if int(f.get("__seq") or 0) > wm]
    t0 = time.time()
    n = I.read_iceberg_incremental(spark, t, wm).count()
    wall = round(time.time() - t0, 2)
    print(json.dumps({
        "format": "iceberg", "commits": N_COMMITS,
        "files_active": len(files), "files_scanned": len(fresh),
        "rows_incremental": n, "wall_sec": wall}))
    assert len(fresh) == 1 and n == ROWS_PER

    # ---- delta ----
    from sling_cli_spark.sources import delta_py as D

    dt = os.path.join(tempfile.mkdtemp(prefix="inc_probe_d_"), "t")
    D.write_delta(spark.createDataFrame(
        [(i, "c0") for i in range(ROWS_PER)], "k long, v string")
        .coalesce(1), dt)
    D.set_table_properties(dt, {"delta.enableRowTracking": "true"})
    for c in range(1, N_COMMITS):
        df = spark.createDataFrame(
            [(c * ROWS_PER + i, f"c{c}") for i in range(ROWS_PER)],
            "k long, v string").coalesce(1)
        D.write_delta(df, dt, mode="append")
    wm_v = D.latest_version(dt) - 1
    _, files_d = D.replay_log(dt)
    fresh_d = [r for r, a in files_d.items()
               if int(a.get("defaultRowCommitVersion") or 0) > wm_v]
    t0 = time.time()
    n = D.read_delta_incremental(spark, dt, wm_v).count()
    wall = round(time.time() - t0, 2)
    print(json.dumps({
        "format": "delta", "commits": N_COMMITS,
        "files_active": len(files_d), "files_scanned": len(fresh_d),
        "rows_incremental": n, "wall_sec": wall}))
    assert len(fresh_d) == 1 and n == ROWS_PER
    spark.stop()


if __name__ == "__main__":
    main()
