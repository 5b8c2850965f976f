"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every setting is chosen for the
1000-executor / 100 TB case and merely *also* behaves on a laptop:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- broadcast threshold raised: dimension tables (region/nation/supplier/
  customer at typical star-schema ratios) should never shuffle
- shuffle partitions sized by env so the same code runs sf0.001 -> 100 TB
- Arrow enabled for every pandas interchange (the only Python on the data
  path is vectorized pandas UDFs)
- session timezone pinned to UTC so timestamp semantics are deterministic
  across driver, executors, and external oracles
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "sling_cli_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for large-scale EL workloads."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: runtime partition coalescing + skew splits ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing; overridden per-deployment ---
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # --- dimension joins must broadcast, not shuffle ---
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # --- keep scans chunky enough to amortize task overhead ---
        .config("spark.sql.files.maxPartitionBytes", "256MB")
        # --- Arrow for all pandas interchange (vectorized UDF path) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- parquet: keep ntz semantics stable, enable aggregate pushdown ---
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # deprecated INT96 timestamps carry no footer statistics (so
        # every timestamp bound would need a re-scan) and both lake
        # specs require int64 micros; values are identical either way
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # --- output commit: v2 renames task output at TASK commit ---
        # v1's job commit is a serial, driver-side O(task-outputs) rename
        # pass — measured ~0.06-0.08 s of the ~0.30 s cost of every tiny
        # staged-write job here, and minutes of commit tail at
        # 100 TB / thousands of tasks. Safe for every write this engine
        # issues: lake stages land in private per-stage UUID dirs that
        # are walked only after the job SUCCEEDS (exceptions delete the
        # dir), and plain-parquet targets go through stage-and-swap
        # (promote_swap) — v2's partial-output-on-job-failure caveat
        # never becomes reader-visible. _SUCCESS markers stay on (a
        # ported replication case counts them).
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
