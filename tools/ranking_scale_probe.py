"""Scale probe for the r10 ranking/line-dedup operators: run each at
sf0.01 and sf0.1 (10x rows) and report wall-clock scaling plus the
plan properties the 100 TB argument rests on (no explode / no
data-sized shuffle for BM25; single corpus scan for TF-IDF).

Usage: python tools/ranking_scale_probe.py
Prints one JSON line per operator:
  {"op": ..., "sf001_s": ..., "sf01_s": ..., "ratio": ...,
   "plan": {"generates": n, "hash_exchanges": n, "broadcasts": n}}
A ratio near (or below) 10 on 10x rows means per-row cost held or
fell; plan counters prove the shape rather than asserting it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"generates": plan.count("Generate"),
            "hash_exchanges": plan.count("hashpartitioning"),
            "broadcasts": plan.count("BroadcastExchange")}


def main() -> None:
    from pyspark.sql import SparkSession

    from sling_cli_spark.operators.dedup import line_dedup
    from sling_cli_spark.operators.ranking import (
        bm25_rank, tfidf_keywords)

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ranking_scale_probe").getOrCreate())

    def docs(sf):
        return spark.read.parquet(
            f"/root/testdata/{sf}/documents.parquet")

    ops = {
        "bm25_rank": lambda d: bm25_rank(
            d, ["hash", "join", "merge"], persist_doc_stats=False),
        "tfidf_keywords": lambda d: tfidf_keywords(
            d, top_n=3, min_doc_tokens=10),
        "line_dedup": lambda d: line_dedup(d),
    }
    for name, fn in ops.items():
        times = {}
        for sf in ("sf0.01", "sf0.1"):
            best = None
            for _ in range(3):  # min-of-3: contention-resistant
                t0 = time.time()
                fn(docs(sf)).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[sf] = round(best, 3)
        print(json.dumps({
            "op": name, "sf001_s": times["sf0.01"],
            "sf01_s": times["sf0.1"],
            "ratio_10x_rows": round(times["sf0.1"] /
                                    max(times["sf0.01"], 1e-9), 2),
            "plan": _plan_counts(fn(docs("sf0.1")))}))
    spark.stop()


if __name__ == "__main__":
    main()
