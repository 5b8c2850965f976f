"""r15 scratch diagnostic: where do the streaming-tail seconds go?

Times merge_delta / upsert_iceberg substeps (via wrap-timers) during
cdc_foreachbatch_merge / cdc_stream_iceberg_upsert, and dumps
StreamingQueryProgress durationMs for the Python DataSource drains.
Not on the bench path.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list[float]] = defaultdict(list)


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            ACC[f"{mod.__name__.split('.')[-1]}.{name}"].append(
                time.time() - t0)
    setattr(mod, name, timed)
    return orig


def report(tag):
    print(f"--- {tag} ---")
    for k in sorted(ACC):
        v = ACC[k]
        print(f"  {k}: n={len(v)} total={sum(v):.3f} "
              f"each={[round(x, 3) for x in v]}")
    ACC.clear()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from sling_cli_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("diag", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for kv in filter(None, os.environ.get("DIAG_CONF", "").split(";")):
        k, v = kv.split("=", 1)
        print(f"conf: {k}={v}")
        spark.conf.set(k, v)
    qs = entry_mod.queries()
    for t in ("nation", "orders", "events"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
            .limit(1000).groupBy().count().collect()

    which = sys.argv[1:] or ["cdc_foreachbatch_merge"]

    from pyspark.sql.streaming import StreamingQueryListener

    progress: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress.append({
                "batchId": p.batchId, "durationMs": dict(p.durationMs),
                "numInputRows": p.numInputRows})

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())

    import sling_cli_spark.sources.delta_py as D
    import sling_cli_spark.sources.iceberg_py as I
    import sling_cli_spark.streaming.cdc as C  # noqa: F401

    # time every Spark ACTION the merge path issues
    from pyspark.sql.classic.dataframe import DataFrame as CDF
    from pyspark.sql.readwriter import DataFrameWriter

    for cls, mname in ((CDF, "collect"), (CDF, "persist"),
                       (CDF, "unpersist"), (DataFrameWriter, "parquet"),
                       (DataFrameWriter, "text")):
        orig = getattr(cls, mname)

        def make(orig, tag):
            def timed(self, *a, **kw):
                t0 = time.time()
                try:
                    return orig(self, *a, **kw)
                finally:
                    ACC[tag].append(time.time() - t0)
            return timed
        setattr(cls, mname, make(orig, f"action.{mname}"))

    for name in ("_replay_state", "_stage_data_files", "_commit_with_retry",
                 "_read_files_mor", "merge_delta", "write_delta",
                 "_staged_stats", "_add_key_map", "latest_version",
                 "read_change_feed", "convert_to_delta", "read_delta",
                 "enable_column_mapping", "rename_column",
                 "set_table_properties", "_cdf_diff", "_stage_cdc_actions"):
        wrap(D, name)
    for name in ("upsert_iceberg", "write_iceberg", "_current_metadata",
                 "_active_entries", "_commit_snapshot", "_staged_file_stats",
                 "merge_iceberg", "migrate_to_iceberg", "read_iceberg"):
        wrap(I, name)
    # merge_delta is re-imported inside run_cdc_stream's closure scope via
    # module attr — cdc.py does `from ... import merge_delta` at call time
    # inside run_cdc_stream, so the wrap above is seen. (It imports at
    # function top-level each call.)

    n_runs = int(os.environ.get("DIAG_RUNS", "2"))
    for qname in which:
        fn = qs[qname]
        walls = []
        # one unmeasured warm run, then timed ones
        for i in range(n_runs):
            ACC.clear()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            walls.append(dt)
            if i == n_runs - 1:
                print(f"\n=== {qname}: runs="
                      f"{[round(w, 3) for w in walls]} "
                      f"min={min(walls[1:] or walls):.3f} ===")
                report(qname)
                time.sleep(0.5)  # let listener events drain
                for p in progress:
                    print("  progress:", json.dumps(p))
            progress.clear()
        # dump progress of the LAST streaming query if any ran
        try:
            for q in spark.streams.active:
                q.stop()
        except Exception:
            pass

    spark.stop()


if __name__ == "__main__":
    main()
