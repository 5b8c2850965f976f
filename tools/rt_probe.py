"""Row-tracking overhead probe at ~10M rows.

Builds two identical ~10M-row DV-enabled Delta tables (16 copies of
sf0.1 lineitem, 16 files) — one with delta.enableRowTracking — and
measures what the feature actually costs at scale:

1. a sparse 1600-row merge (100 rows x 16 files touched): the
   row-tracked table additionally threads materialized row ids into the
   appended merge output (one extra scan of the DOOMED files only);
2. a full count() through read_delta(with_row_ids=True) vs the plain
   read: the id computation is a broadcast file-map join + codegen
   arithmetic, so the delta should be scan-bound noise.

Usage: python tools/rt_probe.py [copies=16]
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
        merge_delta, read_delta, set_table_properties, write_delta)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("rt_probe", master=f"local[{cpus}]")
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    # the synthetic lineitem's (l_orderkey, l_linenumber) is NOT unique,
    # so the merge pk must be minted, not derived
    big = (li.crossJoin(spark.range(copies).withColumnRenamed("id", "c"))
           .select(F.monotonically_increasing_id().alias("rid"),
                   "l_quantity", "l_extendedprice", "l_discount",
                   "l_tax", "l_returnflag", "l_shipdate"))
    n = big.count()

    def build(tag: str, rt: bool) -> str:
        t = f"/tmp/sling_rtprobe/{tag}"
        shutil.rmtree(t, ignore_errors=True)
        write_delta(big.repartition(copies), t)
        props = {"delta.enableDeletionVectors": "true"}
        if rt:
            props["delta.enableRowTracking"] = "true"
        set_table_properties(t, props)
        return t

    out = {"rows": n, "copies": copies}
    for tag, rt in (("dv_only", False), ("dv_rt", True)):
        t = build(tag, rt)
        # batch from the TABLE itself (ids are mint-time): ~sparse
        # scattered updates touching every file
        batch = (read_delta(spark, t).filter("rid % 4000 = 0")
                 .withColumn("l_quantity", F.col("l_quantity") + 1))
        t0 = time.time()
        res = merge_delta(spark, t, batch, "rid")
        out[f"merge_{tag}_sec"] = round(time.time() - t0, 2)
        out[f"merge_{tag}_dv_files"] = res.get("dv_files")
        t0 = time.time()
        assert read_delta(spark, t).count() == n
        out[f"scan_{tag}_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    ids = read_delta(spark, "/tmp/sling_rtprobe/dv_rt",
                     with_row_ids=True)
    distinct = ids.select("_row_id").distinct().count()
    out["scan_with_row_ids_sec"] = round(time.time() - t0, 2)
    out["row_ids_unique"] = distinct == n
    print(json.dumps(out))
    shutil.rmtree("/tmp/sling_rtprobe", ignore_errors=True)


if __name__ == "__main__":
    main()
