"""Metadata-commit scale probe (round 9): measures the two r9
metadata-path features against the costs they remove.

Part A — Iceberg FastAppend vs rewrite-per-commit: N single-file
appends. FastAppend writes ONE 1-entry manifest per commit and reuses
the rest of the list verbatim (O(1) per commit, O(N) total manifest
entries written); the rewrite shape (emulated by consolidating with
rewrite_manifests after every append, which is exactly what the old
append path did implicitly) writes a manifest holding the WHOLE table
every commit (O(N) per commit, O(N²) total). At 100 TB ~ 1M files the
quadratic term is the difference between a sub-second commit and
rewriting a gigabyte of avro per micro-batch.

Part B — Delta minor log compaction: a 1-commit-per-batch table makes
snapshot resolution read one JSON object per commit; compact_log
collapses the covered range to ONE read. The probe counts actual log
objects opened by the reader (via _log_texts) and times replay_log
before/after, plus with a checkpoint for reference.

Usage: python tools/metadata_scale_probe.py [N]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60


def main() -> None:
    from sling_cli_spark import fsio, get_spark
    from sling_cli_spark.sources import delta_py as D
    from sling_cli_spark.sources import iceberg_py as I
    from sling_cli_spark.sources.avro_py import read_avro

    spark = get_spark("metadata_scale_probe")
    base = tempfile.mkdtemp(prefix="sling_msp_")
    out: dict = {"n_commits": N}

    def one_row_df(i):
        return spark.createDataFrame([(i, f"v{i}")], "id long, v string") \
            .coalesce(1)

    # ---- Part A: iceberg fast-append vs rewrite-per-commit ----------
    t_fast = os.path.join(base, "ice_fast")
    t0 = time.time()
    for i in range(N):
        I.write_iceberg(one_row_df(i), t_fast)
    fast_sec = time.time() - t0
    _, meta = I._current_metadata(t_fast)
    mlist = read_avro(meta["snapshots"][-1]["manifest-list"])[1]
    # entries WRITTEN across all commits = sum over snapshots of the
    # entries in manifests that snapshot added
    written_fast = 0
    man_seen = set()
    for s in meta["snapshots"]:
        for m in read_avro(s["manifest-list"])[1]:
            if m["manifest_path"] in man_seen:
                continue
            man_seen.add(m["manifest_path"])
            written_fast += len(read_avro(m["manifest_path"])[1])

    t_rw = os.path.join(base, "ice_rewrite")
    t0 = time.time()
    for i in range(N):
        I.write_iceberg(one_row_df(i), t_rw)
        if i:  # consolidate after every commit = the rewrite shape
            I.rewrite_manifests(t_rw)
    rw_sec = time.time() - t0
    _, meta_rw = I._current_metadata(t_rw)
    written_rw = 0
    man_seen = set()
    for s in meta_rw["snapshots"]:
        for m in read_avro(s["manifest-list"])[1]:
            if m["manifest_path"] in man_seen:
                continue
            man_seen.add(m["manifest_path"])
            written_rw += len(read_avro(m["manifest_path"])[1])

    out["iceberg"] = {
        "fast_append": {"sec_total": round(fast_sec, 2),
                        "manifest_entries_written": written_fast,
                        "head_list_manifests": len(mlist)},
        "rewrite_per_commit": {"sec_total": round(rw_sec, 2),
                               "manifest_entries_written": written_rw},
        "after_rewrite_manifests": I.rewrite_manifests(t_fast),
    }

    # ---- Part B: delta log compaction -------------------------------
    t_d = os.path.join(base, "delta")
    for i in range(N):
        D.write_delta(one_row_df(i), t_d, mode="append")
    fs = fsio.get_fs(t_d)

    def reads_and_time():
        n_objects = sum(1 for _ in D._log_texts(t_d, fs, -1, None))
        t0 = time.time()
        _, files = D.replay_log(t_d)
        return n_objects, round(time.time() - t0, 3), len(files)

    before = reads_and_time()
    D.compact_log(t_d, 0, N - 2)  # keep the head commit authoritative
    after = reads_and_time()
    D.create_checkpoint(t_d)
    t0 = time.time()
    D.replay_log(t_d)
    cp_sec = round(time.time() - t0, 3)
    out["delta"] = {
        "before": {"log_objects_read": before[0], "replay_sec": before[1],
                   "files": before[2]},
        "after_compact_log": {"log_objects_read": after[0],
                              "replay_sec": after[1], "files": after[2]},
        "after_checkpoint_replay_sec": cp_sec,
    }

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
