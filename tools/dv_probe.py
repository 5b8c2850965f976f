"""Deletion-vector vs copy-on-write sparse-delete probe.

Builds a ~10M-row Delta table (16 copies of sf0.1 lineitem, 16 files),
then deletes the same ~50 scattered rows twice — once on a
DV-enabled table (roaring-bitmap commit) and once copy-on-write — and
reports wall time and bytes written per path. This is the round-8
write-side DV feature measured, not argued: a sparse delete that
touches every file costs the CoW path a full-table rewrite and the DV
path a few KB of bitmaps.

Usage: python tools/dv_probe.py [copies=16]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from pyspark.sql import functions as F

    from sling_cli_spark.session import get_spark
    from sling_cli_spark.sources.delta_py import (
        delete_missing_delta, read_delta, replay_log,
        set_table_properties, write_delta)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dv_probe", master=f"local[{cpus}]")
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    big = (li.crossJoin(spark.range(copies).withColumnRenamed("id", "c"))
           .select((F.col("c") * F.lit(100_000_000)
                    + F.col("l_orderkey") * F.lit(10)
                    + F.col("l_linenumber")).alias("rid"),
                   "l_quantity", "l_extendedprice", "l_discount",
                   "l_tax", "l_returnflag", "l_shipdate"))

    def build(tag: str, dv: bool) -> str:
        t = f"/tmp/sling_dvprobe/{tag}"
        shutil.rmtree(t, ignore_errors=True)
        write_delta(big.repartition(copies), t)
        if dv:
            set_table_properties(t, {"delta.enableDeletionVectors": "true"})
        return t

    def run(tag: str, dv: bool) -> dict:
        t = build(tag, dv)
        n0 = read_delta(spark, t).count()
        # ~50 scattered doomed rows: every file holds a few
        keep = big.select("rid").filter(F.col("rid") % 200_003 != 7)
        t0 = time.time()
        res = delete_missing_delta(spark, t, keep, "rid")
        wall = time.time() - t0
        _, files = replay_log(t)
        data_bytes = sum(a.get("size", 0) for a in files.values()
                         if a.get("dataChange", True))
        # bytes this commit wrote: new data files + any DV file
        new_bytes = 0
        log_dir = os.path.join(t, "_delta_log")
        last = sorted(os.listdir(log_dir))[-1]
        for line in open(os.path.join(log_dir, last)):
            a = json.loads(line)
            if "add" in a:
                new_bytes += a["add"].get("size", 0)
        dv_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs_ in os.walk(t) for f in fs_
            if f.startswith("deletion_vector_"))
        n1 = read_delta(spark, t).count()
        return {"mode": "dv" if dv else "cow", "rows": n0,
                "deleted": n0 - n1, "wall_sec": round(wall, 2),
                "touched": res["touched"],
                "dv_files": res.get("dv_files"),
                "new_data_bytes": new_bytes if not dv else 0,
                "dv_bytes": dv_bytes,
                "table_bytes": data_bytes}

    for dv in (False, True):
        print(json.dumps(run("dv" if dv else "cow", dv)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
