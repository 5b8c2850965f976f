"""Streaming backlog catch-up probe (round 9, VERDICT r8 ask #8).

Measures rate-limited catch-up of a 100-version Delta backlog at
$SPARK_GRAFT_SF_DIR row scale. The Python DataSource API has no
ReadLimit channel and the engine fixes a stream's FIRST range before
consulting initialOffset, so maxVersionsPerTrigger binds from the
second trigger of a reader instance — the scenario rate limiting
exists for is therefore a BURST LANDING MID-STREAM (a backfill
writer, a compactor replaying history), and that is what this probe
stages:

1. the table is created with one slice and the stream drains it
   (batch 0, uncapped by API contract);
2. a 100-version backlog lands as metadata-only commits over
   pre-staged parquet (so the burst outruns any drain rate — commits
   are driver-side JSON writes, ~100/s);
3. the probe times the stream catching up and counts the
   micro-batches it used.

Emits one JSON line per configuration: catch-up wall seconds,
micro-batches, versions/sec, rows/sec. Numbers land in README.md.

Run: python tools/stream_backlog_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VERSIONS = 100


def stage_slices(spark, sf_dir: str, work: str) -> list[tuple[str, int]]:
    """orders sliced into N_VERSIONS parquet files under work/ —
    (path, rows) per slice, written in ONE Spark job."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"))
    o.withColumn("__b", F.pmod(F.col("o_orderkey"), N_VERSIONS)) \
        .repartition(N_VERSIONS, "__b").sortWithinPartitions("__b") \
        .write.partitionBy("__b").parquet(work)
    slices = []
    for b in range(N_VERSIONS):
        d = os.path.join(work, f"__b={b}")
        fs = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(fs) >= 1
        import pyarrow.parquet as pq
        p = os.path.join(d, fs[0])
        slices.append((p, pq.read_metadata(p).num_rows))
    return slices


def burst_commit(src: str, slices: list[tuple[str, int]]) -> float:
    """Append one commit per slice — metadata-only (files hard-linked
    into the table), so the burst rate is bounded by JSON writes, not
    Spark jobs. Returns the burst wall seconds."""
    from sling_cli_spark.sources.delta_py import _commit, latest_version

    t0 = time.time()
    v = latest_version(src)
    now = int(time.time() * 1000)
    for p, nrows in slices:
        rel = f"part-{uuid.uuid4().hex}.snappy.parquet"
        os.link(p, os.path.join(src, rel))
        v += 1
        _commit(src, v, [{"add": {
            "path": rel, "size": os.path.getsize(p),
            "partitionValues": {}, "modificationTime": now,
            "dataChange": True,
            "stats": json.dumps({"numRecords": nrows})}}])
    return time.time() - t0


def run_config(spark, sf_dir: str, base: str, slices,
               max_versions: int | None, n0: int, total: int) -> dict:
    from sling_cli_spark.sources.delta_py import write_delta

    tag = f"cap_{max_versions or 'none'}"
    src = os.path.join(base, tag, "src")
    out = os.path.join(base, tag, "out")
    ck = os.path.join(base, tag, "ck")
    first = spark.read.parquet(slices[0][0]).drop("__b")
    write_delta(first.coalesce(1), src)

    r = spark.readStream.format("delta_stream").option("path", src)
    if max_versions:
        r = r.option("maxVersionsPerTrigger", str(max_versions))
    h = (r.load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(processingTime="0 seconds").start())

    def rows() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    deadline = time.time() + 1800
    while time.time() < deadline and rows() < n0:
        time.sleep(0.2)  # batch 0: the pre-burst table state
    burst_sec = burst_commit(src, slices)
    t0 = time.time()
    done = 0
    while time.time() < deadline:
        done = rows()
        if done >= total + n0:
            break
        time.sleep(0.2)
    h.stop()
    wall = time.time() - t0
    n_batches = len([f for f in os.listdir(os.path.join(ck, "offsets"))
                     if not f.startswith(".")]) - 1  # minus batch 0
    return {
        "max_versions_per_trigger": max_versions or "unbounded",
        "burst_commit_sec": round(burst_sec, 1),
        "catchup_sec": round(wall, 1),
        "micro_batches": n_batches,
        "versions_per_sec": round(N_VERSIONS / wall, 1),
        "rows_per_sec": int(total / wall),
        "rows": done,
    }


def main() -> None:
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sling_cli_spark.session import get_spark
    from sling_cli_spark.streaming.delta_source import register_delta_stream

    spark = get_spark("backlog_probe", master=f"local[{cpus}]")
    register_delta_stream(spark)
    base = tempfile.mkdtemp(prefix="sling_backlog_")
    slices = stage_slices(spark, sf_dir, os.path.join(base, "work"))
    n0 = slices[0][1]
    total = sum(n for _, n in slices)
    print(json.dumps({"metric": "backlog_setup",
                      "versions": N_VERSIONS, "rows": total}))
    for cap in (1, 10, None):
        r = run_config(spark, sf_dir, base, slices, cap, n0, total)
        print(json.dumps({"metric": "backlog_catchup", **r}))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
