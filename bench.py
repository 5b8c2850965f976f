"""Benchmark harness: runs ALL __spark_entry__ queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints a full JSON line: {"metric": ...,
"value": headline_total_sec, "unit": "sec", "queries": {name: sec},
"sf": ...} followed by a short summary JSON line (same metric/value)
that survives front-truncating log capture.

``value`` stays the sum over the 15-query HEADLINE set (comparable
across rounds); ``queries`` carries per-query timings for every entry in
``queries()`` so regressions are attributable (headline: min of 3 runs;
others: min of 2, a third when the two disagree by >1.5x; per-run times
in ``run_times``). A warm-up pass (one
broadcast-join query + one documents scan, unmeasured) runs first so the
first measured query doesn't pay JVM/codegen/broadcast warm-up.

Each query is materialized with the noop sink (full execution, no
driver-side collect), so timings measure the Spark plan, not pandas
conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module scope: pandas_udf resolves stringified hints

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

    # warm the JVM + parquet footers so the first measured query doesn't
    # carry session startup
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("region", "lineitem", "orders", "customer", "documents",
              "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
            .limit(1000).groupBy().count().collect()
    # fork the Python worker pool once, unmeasured: the first pandas-UDF
    # stage in a session pays worker startup (~1s across 32 slots), which
    # otherwise lands on whichever UDF query happens to run first
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v * 1.0
    spark.range(1000).repartition(int(cpus)) \
        .select(_warm(col("id").cast("double"))) \
        .write.format("noop").mode("overwrite").save()
    # ...and run every HEADLINE query once end-to-end, unmeasured: the
    # measured pass then reports steady-state execution, not whole-stage
    # codegen JIT compilation (the 64-aggregate dedup queries spend more
    # time compiling than executing on their first run — r3 hid this by
    # timing them after ~40 other queries had warmed the JIT)
    # ...plus the non-headline queries whose first run is dominated by
    # codegen JIT of deep multi-stage plans (measured: jaccard's first
    # in-context run is ~2x its steady state)
    WARM_EXTRA = ["jaccard_dedup_docs", "dedup_clusters_docs",
                  "decontaminate_docs"]
    for warm in BENCH_QUERIES + WARM_EXTRA:
        try:
            qs[warm](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass  # the measured loop reports the failure

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # headline queries run FIRST (right after warm-up) so their timings
    # are comparable across rounds regardless of how many other queries
    # are registered; r3 timed them after ~45 other queries and the
    # accumulated JVM/GC pressure showed up as a phantom 2x on the
    # sub-second ones (asof/sessionize)
    ordered = {n: qs[n] for n in BENCH_QUERIES if n in qs}
    ordered.update(qs)
    # each query = min of 2 consecutive runs, escalating to 3 when the
    # two disagree by >1.5x. The sandbox shows intermittent multi-second
    # I/O stalls (r5's driver artifact recorded a 2x phantom regression
    # from one; a 0.7s avro query has measured 36s during a stall; r6's
    # driver all_total ran 1.6x a controlled rerun — min-of-2 wasn't
    # enough under contention). Per-run times are emitted in
    # "run_times" so the artifact is self-diagnosing. A query lands in
    # exactly ONE of timings/failures: any successful run counts as a
    # timing; failures only when no run succeeded.
    run_log: dict[str, list[float]] = {}

    def run_once(fn):
        # a query's persist() (e.g. jaccard's shared shingle cache) is
        # part of its cost — clear so no run rides an earlier run's
        # cache. localCheckpoint blocks (connected-components rounds,
        # the digest-store snapshot) are RDD-level and survive
        # clearCache until the ContextCleaner gets to them — unpersist
        # explicitly so ~170 query executions don't accumulate heap
        # that lands as GC pauses on whichever query runs next.
        spark.catalog.clearCache()
        for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name, fn in ordered.items():
        runs: list[float] = []
        err = None
        # HEADLINE queries take min-of-3 unconditionally (r10): they are
        # the round-over-round comparator, and r9 showed that a
        # contention window spanning both of min-of-2's runs reads as a
        # phantom 1.5x regression (simhash/minhash measured 3.0s twice
        # in-suite; a controlled rerun on identical code reads 2.0s —
        # exactly the r8 value). A third spaced run gives the stall a
        # chance to clear.
        n_runs = 3 if name in BENCH_QUERIES else 2
        for _ in range(n_runs):
            try:
                runs.append(run_once(fn))
            except Exception as e:  # keep the bench line parseable
                err = f"{type(e).__name__}: {e}"[:200]
                break
        if len(runs) == 2 and max(runs) > 1.5 * min(runs):
            try:
                runs.append(run_once(fn))
            except Exception:
                pass  # two successful runs already bound the timing
        if runs:
            timings[name] = round(min(runs), 3)
            run_log[name] = [round(t, 3) for t in runs]
        elif err is not None:
            failures[name] = err

    # r12 (VERDICT r11 ask #3): a committed "quiet" artifact must not
    # ship contended readings. Any query whose fresh min exceeds 1.5x
    # its ACROSS-ROUND best (BENCH_BEST.json — rolling per-query
    # minima over every committed run) gets up to two extra spaced
    # re-runs; if it still reads high, the artifact carries an
    # explicit contention annotation instead of silently presenting
    # the outlier as truth.
    contended: dict[str, dict] = {}
    repo = os.path.dirname(os.path.abspath(__file__))
    prior: dict[str, float] = {}
    try:
        with open(os.path.join(repo, "BENCH_BEST.json")) as f:
            prior = json.load(f).get("queries", {})
    except (OSError, ValueError):
        try:
            with open(os.path.join(repo, "BENCH_LOCAL.json")) as f:
                prior = json.load(f).get("queries", {})
        except (OSError, ValueError):
            pass
    for name in list(timings):
        pmin = prior.get(name)
        if not pmin or timings[name] <= 1.5 * pmin:
            continue
        for _ in range(2):
            time.sleep(1)  # give a transient stall a chance to clear
            try:
                extra = run_once(ordered[name])
            except Exception:
                break
            run_log[name].append(round(extra, 3))
            timings[name] = round(min(timings[name], extra), 3)
            if timings[name] <= 1.5 * pmin:
                break
        if timings[name] > 1.5 * pmin:
            contended[name] = {"prior_min": pmin, "min": timings[name],
                               "runs": run_log[name]}

    total = round(sum(timings[n] for n in BENCH_QUERIES if n in timings), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "headline": BENCH_QUERIES,
        "all_total": round(sum(timings.values()), 3),
        # headline: min-of-3 (phantom-regression guard, r10); others:
        # min-of-2, third run on >1.5x disagreement
        "runs": "2-3",
        "run_times": run_log,
        "sf": float(sf) if sf else sf_dir,
    }
    if failures:
        out["failures"] = failures
    if contended:
        out["contended"] = contended
    # roll the per-query minima forward so the NEXT run's contention
    # baseline stays the all-time best, not whatever the last (possibly
    # contended) run read
    new_best = dict(prior)
    for n, t in timings.items():
        new_best[n] = min(new_best.get(n, t), t)
    try:
        with open(os.path.join(repo, "BENCH_BEST.json"), "w") as f:
            json.dump({
                "note": ("rolling per-query across-round minima "
                         "(bench.py contention baseline); updated by "
                         "every bench run"),
                "queries": new_best}, f, indent=1)
    except OSError:
        pass
    # Write the COMPLETE record to the repo as well: r7's driver artifact
    # lost the first ~58 per-query times to log-capture truncation, so
    # the authoritative copy lives in a committed file the capture can't
    # clip. Stamped name (round-agnostic) + stable name for diffing.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOCAL.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout chunks below still carry it
    print(json.dumps(out))
    # The driver's log capture truncates long lines from the FRONT and
    # keeps the TAIL (r4/r5: "parsed": null; r7: the first ~58 per-query
    # times gone). Emit the per-query map again in SHORT chunked lines —
    # none long enough to clip — so the artifact keeps every timing even
    # when the full record above is cut.
    # chunk order = ascending cost, so the EXPENSIVE queries (the ones
    # a perf reviewer needs) land in the LAST chunks — the ones tail
    # capture keeps (r8's artifact lost parts 1-8: alphabetical order
    # put heavy queries anywhere)
    names = sorted(timings, key=lambda n: (timings[n], n))
    step = 10
    chunks = [names[i:i + step] for i in range(0, len(names), step)]
    for i, chunk in enumerate(chunks):
        print(json.dumps({
            "metric": "bench_queries_chunk", "part": i + 1,
            "of": len(chunks),
            "queries": {n: timings[n] for n in chunk}}))
    if failures:
        print(json.dumps({"metric": "bench_failures",
                          "failures": failures}))
    # r10 (VERDICT r9 ask #7): the COMPLETE per-query map as ONE
    # compact line immediately before the summary lines — tail capture
    # keeps the last few lines, so this makes the artifact
    # self-sufficient even when the chunk series above is clipped.
    # Values rounded to 2dp to keep the line short (~4 KB); the exact
    # 3dp copy lives in BENCH_LOCAL.json and the chunks.
    # r11 (VERDICT r10 ask #6): BENCH_r10's tail kept only the END of
    # this line (front-clipped mid-map), so order by ASCENDING cost —
    # whatever survives a front clip is the expensive queries a perf
    # reviewer needs; the cheap ones are what truncation drops.
    print(json.dumps({
        "metric": "bench_all_queries",
        "queries": {n: round(timings[n], 2)
                    for n in sorted(timings,
                                    key=lambda n: (timings[n], n))}},
        separators=(",", ":")))
    # ...and the 30 slowest as their own SHORT line (~1 KB — never
    # clipped) so the tail always parses them even if every longer
    # line above is lost
    slowest = sorted(timings, key=lambda n: -timings[n])[:30]
    print(json.dumps({
        "metric": "bench_slowest30",
        "queries": {n: timings[n] for n in slowest}},
        separators=(",", ":")))
    # the full HEADLINE map in one short line, right before the summary,
    # so the round-over-round comparison set always survives tail
    # capture. r12 (VERDICT r11 ask #8): carry min AND per-run spread so
    # a contended reading is diagnosable from the artifact alone.
    print(json.dumps({
        "metric": "bench_headline_chunk",
        "queries": {n: timings[n] for n in BENCH_QUERIES
                    if n in timings},
        "run_times": {n: run_log[n] for n in BENCH_QUERIES
                      if n in run_log}},
        separators=(",", ":")))
    if contended:
        print(json.dumps({"metric": "bench_contended",
                          "contended": contended},
                         separators=(",", ":")))
    # short, self-contained summary as the FINAL line so the headline
    # number always survives tail capture. r15 (VERDICT r14 ask #7):
    # the driver's 2000-char tail parser reads per_query from THIS
    # line's "queries" — r14's final line carried none, so
    # PERF_r14.per_query came up empty. Carry the headline set plus the
    # 30 slowest (2dp) — ~1.2 KB, always inside the tail window; the
    # complete 3dp map stays in the full record, the chunk lines and
    # BENCH_LOCAL.json above.
    tail_queries = {n: round(timings[n], 2) for n in BENCH_QUERIES
                    if n in timings}
    for n in slowest:
        tail_queries.setdefault(n, round(timings[n], 2))
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": tail_queries,
        "all_total": out["all_total"],
        "n_queries": len(timings),
        "n_failures": len(failures),
        "sf": out["sf"],
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
