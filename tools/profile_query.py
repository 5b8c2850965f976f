"""Per-query profiler for the optimization rounds (guide §1).

Runs one (or more) named ``__spark_entry__`` queries on a bench-identical
session and reports, per query:

- wall-clock per run (cold + N warm runs, noop sink — same timed action
  as bench.py)
- driver-side Python hotspots (cProfile cumulative top) for the LAST run,
  which separates "time spent in pure-Python metadata/commit code" from
  "time spent waiting on JVM jobs" (py4j socket recv frames)
- optional ``.explain("formatted")`` capture to plans/r14/

Usage:
  python tools/profile_query.py <query> [query ...] [--runs N] [--explain]
  python tools/profile_query.py stream_rowtracking_delta --runs 2
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

import pandas as pd  # noqa: F401  (stringified pandas_udf hints)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # slice the --runs VALUE out by index (ADVICE r14: filtering by
    # string equality also dropped any query literally named e.g. "3")
    argv = sys.argv[1:]
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    do_explain = "--explain" in argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sling_cli_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("profile", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry_mod.queries()

    # bench-identical warm-up: parquet footers + python worker pool
    for t in ("region", "lineitem", "orders", "customer", "documents",
              "events", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).limit(1000).groupBy().count().collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0
    spark.range(1000).repartition(int(cpus)) \
        .select(_warm(col("id").cast("double"))) \
        .write.format("noop").mode("overwrite").save()

    def run_once(fn):
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in args:
        fn = qs[name]
        times = []
        for i in range(runs):
            profile_this = (i == runs - 1)
            if profile_this:
                pr = cProfile.Profile()
                pr.enable()
            dt = run_once(fn)
            if profile_this:
                pr.disable()
            times.append(dt)
        print(f"\n=== {name}: runs={[round(t, 3) for t in times]} ===")
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        st.sort_stats("cumulative").print_stats(30)
        # keep only the summary lines, drop the per-caller noise
        for line in s.getvalue().splitlines():
            print(line)
        if do_explain:
            tag = os.environ.get("PROFILE_PLAN_TAG", "profile")
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", os.environ.get("PROFILE_PLAN_DIR", "r15"),
                f"{name}_{tag}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            df = fn(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                .fromString("formatted")
            with open(out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
    spark.stop()


if __name__ == "__main__":
    main()
