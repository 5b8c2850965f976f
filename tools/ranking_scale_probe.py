"""Scale probe for the r10 ranking/line-dedup operators and (r11) the
ngram-novelty + token-budget rows: run each at sf0.001 / sf0.01 / sf0.1
(1x / 10x / 100x rows) and report wall-clock scaling, SHUFFLE WRITE
BYTES (from the Spark status REST API, diffed per op), and the plan
properties the 100 TB argument rests on (no explode / no data-sized
shuffle for BM25; single corpus scan for TF-IDF; no single-partition
stage for the global token budget).

Usage: python tools/ranking_scale_probe.py
Prints one JSON line per operator:
  {"op": ..., "times_s": {sf: s}, "ratio_10x": ..., "ratio_100x": ...,
   "shuffle_mb": {sf: mb},
   "plan": {"generates": n, "hash_exchanges": n, "broadcasts": n,
            "single_partition": n}}
A time ratio near (or below) the row ratio means per-row cost held or
fell; plan counters prove the shape rather than asserting it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"generates": plan.count("Generate"),
            "hash_exchanges": plan.count("hashpartitioning"),
            "broadcasts": plan.count("BroadcastExchange"),
            "single_partition": plan.count("Exchange SinglePartition")}


def _shuffle_write_bytes(ui: str) -> int:
    """Cumulative shuffle write bytes across completed stages."""
    try:
        apps = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications", timeout=10))
        app = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete",
            timeout=10))
        return sum(int(s.get("shuffleWriteBytes") or 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    from pyspark.sql import SparkSession

    from sling_cli_spark.operators.dedup import (
        line_dedup, md5_hash60, ngram_novelty)
    from sling_cli_spark.operators.ranking import (
        bm25_rank, tfidf_keywords)
    from sling_cli_spark.operators.text import (
        classifier_score, normalize_text)
    from sling_cli_spark.operators.training import token_budget_select

    def _classifier(d):
        return classifier_score(d)

    def _normalize(d):
        return normalize_text(d, form="NFC").select("doc_id", "text")

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .appName("ranking_scale_probe").getOrCreate())
    ui = "http://localhost:4057"

    def docs(sf):
        return spark.read.parquet(
            f"/root/testdata/{sf}/documents.parquet")

    ops = {
        "bm25_rank": lambda d: bm25_rank(
            d, ["hash", "join", "merge"], persist_doc_stats=False),
        "tfidf_keywords": lambda d: tfidf_keywords(
            d, top_n=3, min_doc_tokens=10),
        "line_dedup": lambda d: line_dedup(d),
        "ngram_novelty": lambda d: ngram_novelty(d, hasher=md5_hash60),
        # the r11 two-phase GLOBAL cumulative sum (no strata) — the
        # budget scales with sf so a fixed fraction of rows selects
        "token_budget_global": lambda d: token_budget_select(
            d, 10_000_000, score_col="n_chars"),
        # r11c: zero-shuffle hashed classifier + pandas-UDF NFC column
        "quality_classifier": lambda d: _classifier(d),
        "normalize_text": lambda d: _normalize(d),
    }
    sfs = ("sf0.001", "sf0.01", "sf0.1")
    for name, fn in ops.items():
        times, shuffle_mb = {}, {}
        for sf in sfs:
            best, sbytes = None, None
            for _ in range(3):  # min-of-3: contention-resistant
                spark.catalog.clearCache()
                b0 = _shuffle_write_bytes(ui)
                t0 = time.time()
                fn(docs(sf)).count()
                dt = time.time() - t0
                if best is None or dt < best:
                    best = dt
                    b1 = _shuffle_write_bytes(ui)
                    sbytes = (b1 - b0) if (b0 >= 0 and b1 >= 0) else -1
            times[sf] = round(best, 3)
            shuffle_mb[sf] = round(sbytes / 1e6, 2) if sbytes >= 0 else -1
        print(json.dumps({
            "op": name, "times_s": times,
            "ratio_10x": round(times["sf0.01"] /
                               max(times["sf0.001"], 1e-9), 2),
            "ratio_100x": round(times["sf0.1"] /
                                max(times["sf0.001"], 1e-9), 2),
            "shuffle_mb": shuffle_mb,
            "plan": _plan_counts(fn(docs("sf0.1")))}))
    spark.stop()


if __name__ == "__main__":
    main()
