"""Order-of-magnitude scale probe for the dedup/ANN family.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB claims otherwise
rest on plan shape. This probe synthesizes a FACTOR× corpus from sf0.1
(each copy takes fresh ids and a token-level perturbation — every 13th
token tagged per copy — so copies are ~92%-Jaccard NEAR-duplicates of
their original: realistic dedup pressure, not trivially identical rows)
and times the heavy queries at 1× and FACTOR×, printing one JSON line
per run plus a summary table. Near-linear growth (vs the quadratic
blow-up an all-pairs design would show) is the pass condition.

Usage: python tools/scale_probe.py [factor=10] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_QUERIES = [
    "exact_dedup_docs", "minhash_dedup_docs", "jaccard_dedup_docs",
    "exact_substring_dedup_docs", "dedup_clusters_docs", "semdedup_docs",
    "simhash_dedup_docs", "ann_topk", "ann_pq_topk", "ann_pq_refine",
]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]


def build_scaled(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/sling_scale_x{factor}"
    done = os.path.join(out, "_built")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:  # unscaled tables ride along for query plumbing
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    (docs.crossJoin(copies)
         .select(
             (F.col("doc_id") + F.col("copy") * F.lit(100_000_000))
             .alias("doc_id"),
             F.when(F.col("copy") == 0, F.col("text")).otherwise(F.expr(
                 "array_join(transform(split(text, ' '), (t, i) -> "
                 "IF((i + copy) % 13 = 0, concat(t, '_c', copy), t)), ' ')"
             )).alias("text"),
             "lang", "source", "n_chars")
         .repartition(32)
         .write.mode("overwrite")
         .parquet(os.path.join(out, "documents.parquet")))
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    (emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(100_000_000))
            .alias("vec_id"),
            F.expr("transform(embedding, x -> "
                   "CAST(x + copy * 0.0001 AS FLOAT))").alias("embedding"),
            "label")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet")))
    open(done, "w").close()
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:]
    qnames = only or PROBE_QUERIES

    from sling_cli_spark.session import get_spark
    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale_probe", master=f"local[{cpus}]")
    qs = entry_mod.queries()
    scaled = build_scaled(spark, factor)
    n1 = spark.read.parquet(os.path.join(SRC, "documents.parquet")).count()
    nf = spark.read.parquet(
        os.path.join(scaled, "documents.parquet")).count()
    print(json.dumps({"probe": "corpus", "docs_1x": n1,
                      f"docs_{factor}x": nf}))

    def run(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0

    runs = int(os.environ.get("SCALE_PROBE_RUNS", "2"))
    rows = []
    for name in qnames:
        qs[name](spark, SRC).write.format("noop") \
            .mode("overwrite").save()  # JIT warm-up, unmeasured
        t_1 = min(run(name, SRC) for _ in range(runs))
        t_f = min(run(name, scaled) for _ in range(runs))
        ratio = round(t_f / t_1, 2) if t_1 else None
        rows.append((name, round(t_1, 2), round(t_f, 2), ratio))
        print(json.dumps({"probe": name, "sec_1x": round(t_1, 3),
                          f"sec_{factor}x": round(t_f, 3),
                          "ratio": ratio}))
    print(f"\n{'query':32s} {'1x':>8s} {factor:>6d}x  ratio (linear={factor}.0)")
    for name, a, b, r in rows:
        print(f"{name:32s} {a:8.2f} {b:7.2f}  {r}")
    spark.stop()


if __name__ == "__main__":
    main()
