"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full execution, no
driver-side collect), so timings measure the Spark plan, not pandas
conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: scan+filter, star join, aggregates, merge, window dedup,
# validation checksum, and the LLM-pipeline operators
BENCH_QUERIES = [
    "star_join_agg",
    "where_filter",
    "sql_on_files",
    "merge_update_insert",
    "dedup_last_event",
    "checksum_lineitem",
    "exact_dedup_docs",
    "text_stats_docs",
    "token_count_docs",
    "quality_docs",
    "ann_topk",
    "minhash_dedup_docs",
    "simhash_dedup_docs",
    "asof_events",
    "sessionize_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sling_cli_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", master=f"local[{cpus}]")
    qs = entry_mod.queries()

    # warm the JVM (codegen, shuffle machinery) + parquet footers so the
    # first measured query doesn't carry session startup
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("region", "lineitem", "orders", "customer", "documents",
              "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
            .limit(1000).groupBy().count().collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
