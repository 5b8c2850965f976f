"""Change-capture on Structured Streaming.

The reference's log-based CDC is closed-source (``core/sling/
task_func.go:203-210``); its OSS surface is the config + the merge
templates (``base.yaml:81-126``). On Spark the natural shape is:

    readStream (file source / Kafka) ->
    watermark + per-PK latest-op dedup ->
    foreachBatch(merge into target)

Each micro-batch applies the same ``merge_change_capture`` plan the batch
path uses, so batch and streaming share one merge semantics (the Spark
idiom for "exactly-once-ish upsert sink"). Kafka/Debezium is the
production source; the file source below is the in-container testable
path (same API, swap ``format``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_COL = "_sling_synced_op"
SEQ_COL = "_sling_synced_seq"


def read_file_stream(
    spark: SparkSession, path: str, schema, fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-watch stream: new files in ``path`` become micro-batches.

    ``maxFilesPerTrigger`` bounds batch size (backpressure at scale —
    without it the first batch after downtime loads the whole backlog)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return getattr(reader, fmt)(path)


def stream_dedup_latest(
    df: DataFrame, primary_key, seq_col: str | None = SEQ_COL,
    watermark_col: str | None = None, delay: str = "10 minutes",
) -> DataFrame:
    """Best-effort in-stream dedup: drop exact (pk, seq) replays —
    ``seq_col=None`` dedups on the key alone (first arrival wins),
    the reference's CDC replay guard (base.yaml:81-126 last-op-wins is
    enforced in the sink merge; THIS drops byte-identical redeliveries
    before they cost a merge).

    ``withWatermark`` bounds the dedup state store — without it state
    grows forever (the 100 TB failure mode): a key's dedup state
    evicts once the watermark passes its event time + delay, so
    duplicates are dropped with certainty only while they arrive
    within ``delay`` of the first occurrence (Spark's
    dropDuplicatesWithinWatermark contract). Cross-batch last-op-wins
    is enforced in the sink merge, not here (aggregation per PK would
    need complete-mode state; the merge does it with zero state)."""
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    keys = pk + ([seq_col] if seq_col else [])
    if watermark_col:
        df = df.withWatermark(watermark_col, delay)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def debezium_value_schema(row_schema):
    """Spark schema for a Debezium change-event VALUE (the public
    Debezium envelope: before/after row images + op + source.ts_ms;
    debezium.io/documentation — the reference consumes the same shape
    from its Kafka source)."""
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("before", row_schema),
        T.StructField("after", row_schema),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ])


def unwrap_debezium(
    df: DataFrame, row_schema, value_col: str = "value",
    payload_wrapped: bool = False,
    seq_col: str = SEQ_COL, op_col: str = OP_COL,
) -> DataFrame:
    """Debezium JSON envelope -> flat CDC rows the merge understands.

    - row image: ``after`` normally, ``before`` for deletes
    - ``op`` c/r -> I, u -> U, d -> D (matching the _sling_synced_op
      domain merge_change_capture consumes)
    - ``ts_ms`` becomes the ordering sequence

    Works identically on a stream (Kafka ``value`` bytes) and a batch
    (testing) because it is a pure projection.
    """
    env = debezium_value_schema(row_schema)
    if payload_wrapped:  # non-schemaless connector configs nest payload
        from pyspark.sql import types as T

        env = T.StructType([T.StructField("payload", env)])
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), env).alias("__e"))
    p = "__e.payload" if payload_wrapped else "__e"
    # Debezium emits a TOMBSTONE (null value) after every delete by
    # default; from_json yields a null envelope whose projection would
    # be a garbage op='I' row with a null PK — drop them here.
    parsed = parsed.filter(F.col(f"{p}.op").isNotNull())
    img = F.when(F.col(f"{p}.op") == "d", F.col(f"{p}.before")) \
        .otherwise(F.col(f"{p}.after"))
    out = parsed.select(
        img.alias("__row"),
        F.when(F.col(f"{p}.op") == "d", F.lit("D"))
        .when(F.col(f"{p}.op") == "u", F.lit("U"))
        .otherwise(F.lit("I")).alias(op_col),
        F.col(f"{p}.ts_ms").alias(seq_col),
    )
    return out.select("__row.*", op_col, seq_col)


def build_cdc_source(spark: SparkSession, conf: dict, row_schema) -> DataFrame:
    """Config-driven CDC source stream.

    ``conf`` (the reference's source-options surface, re-shaped)::

        {"format": "kafka",                  # or json/csv/parquet (files)
         "options": {"kafka.bootstrap.servers": "...",
                     "subscribe": "topic", ...},
         "path": "...",                      # file formats only
         "envelope": "debezium" | "flat",    # value shape
         "payload_wrapped": false,
         "max_files_per_trigger": N}

    Kafka is the production source; a file format with the same
    ``envelope`` config is the in-container testable twin — the
    downstream unwrap + foreachBatch merge is byte-identical.
    """
    fmt = (conf.get("format") or "json").lower()
    envelope = (conf.get("envelope") or "flat").lower()
    if fmt == "kafka":
        opts = conf.get("options") or {}
        for req in ("kafka.bootstrap.servers", "subscribe"):
            if req not in opts:
                raise ValueError(f"kafka source requires option {req!r}")
        reader = spark.readStream.format("kafka")
        for k, v in opts.items():
            reader = reader.option(k, str(v))
        raw = reader.load()  # schema: key/value binary + metadata
    elif envelope == "debezium":
        # envelope in files: each line is one change-event JSON string
        reader = spark.readStream
        if conf.get("max_files_per_trigger"):
            reader = reader.option(
                "maxFilesPerTrigger", str(conf["max_files_per_trigger"]))
        raw = reader.text(conf["path"])
    else:
        return read_file_stream(
            spark, conf["path"], row_schema, fmt=fmt,
            max_files_per_trigger=conf.get("max_files_per_trigger"))
    if envelope == "debezium":
        return unwrap_debezium(
            raw, row_schema,
            payload_wrapped=bool(conf.get("payload_wrapped")),
            seq_col=conf.get("seq_col", SEQ_COL),
            op_col=conf.get("op_col", OP_COL))
    # flat kafka: value is already the row JSON + op/seq fields
    from pyspark.sql import types as T

    flat = T.StructType(list(row_schema.fields) + [
        T.StructField(conf.get("op_col", OP_COL), T.StringType()),
        T.StructField(conf.get("seq_col", SEQ_COL), T.LongType()),
    ])
    return raw.select(
        F.from_json(F.col("value").cast("string"), flat).alias("__r")
    ).select("__r.*")


def run_cdc_pipeline(
    spark: SparkSession,
    source_conf: dict,
    row_schema,
    target_path: str,
    primary_key,
    checkpoint: str,
    soft: bool = False,
    available_now: bool = True,
):
    """Config -> source stream -> foreachBatch merge, one call
    (the reference's replication `mode: change_capture` surface)."""
    src = build_cdc_source(spark, source_conf, row_schema)
    return run_cdc_stream(
        spark, src, target_path, primary_key, checkpoint,
        seq_col=source_conf.get("seq_col", SEQ_COL),
        op_col=source_conf.get("op_col", OP_COL),
        soft=soft, available_now=available_now)


def run_cdc_stream(
    spark: SparkSession,
    src: DataFrame,
    target_path: str,
    primary_key,
    checkpoint: str,
    seq_col: str = SEQ_COL,
    op_col: str = OP_COL,
    soft: bool = False,
    available_now: bool = True,
    compact_every: int | None = 20,
):
    """Drive a CDC stream into a parquet or Delta target via foreachBatch
    merge.

    available_now=True drains the current backlog and stops (the testable
    incremental-batch mode); False runs continuously. Checkpointing makes
    restarts resume from the last committed batch.

    Delta targets (detected by ``_delta_log``) take the versioned path:
    each micro-batch commits a copy-on-write change_capture merge — only
    files holding the batch's PKs rewrite, and concurrent readers see
    atomic versions instead of the brief swap-rename window. Every
    ``compact_every`` micro-batches an inline ``optimize_delta`` pass
    bin-packs the accumulated per-batch small files (dataChange=false
    commit), so long-running streams don't degrade scans; None disables.
    """
    from sling_cli_spark.config import MergeStrategy
    from sling_cli_spark.operators.merge import merge_change_capture
    from sling_cli_spark.sources.delta_py import (
        is_delta_table, merge_delta, optimize_delta)
    from sling_cli_spark.sources.iceberg_py import (
        compact_iceberg, is_iceberg_table)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        # The merge consumes the micro-batch in several actions (probe
        # semi-join, the merge output write, the eq-delete key file) —
        # without a persist each one re-reads and re-parses the source
        # (guide §5: cache exactly the reused-and-expensive frames, for
        # exactly the reuse window). Materializing also gives the
        # optimizer the batch's REAL size, so the probe/anti joins
        # broadcast the KB-scale batch side instead of shuffling both
        # sides (guide §3.1 — a streaming source has no size estimate,
        # so nothing auto-broadcasts without this). Spark's own
        # foreachBatch docs recommend persisting multi-action batches.
        batch.persist()
        try:
            # materialize the cache NOW (one cheap single-stage job):
            # every downstream join then plans against the batch's REAL
            # KB-scale stats and broadcasts statically — without this
            # the first action (the merge's probe) still plans the
            # batch side as an unknown-size stream and shuffles it.
            # The count doubles as the merge/upsert's small-stage proof
            # (r15, sources/driver_stage.py).
            n = batch.count()
            _apply_inner(batch, batch_id, n)
        finally:
            batch.unpersist()

    def _apply_inner(batch: DataFrame, batch_id: int,
                     batch_rows: int) -> None:
        sess = batch.sparkSession
        if is_iceberg_table(target_path):
            # Flink-style streaming upsert (r11): each micro-batch is
            # ONE O(batch) equality-delete commit — last-op-wins dedup
            # inside the batch, upserts re-insert, deletes ride the
            # same eq-delete files with no data rows; the target is
            # never scanned, the property that keeps per-trigger cost
            # flat on a 100 TB table. Readers pay MoR until the
            # periodic compaction folds the delete debt.
            from pyspark.sql.window import Window

            from sling_cli_spark.sources.iceberg_py import (
                _current_metadata, _current_schema, upsert_iceberg)

            w = Window.partitionBy(*(
                [primary_key] if isinstance(primary_key, str)
                else list(primary_key))) \
                .orderBy(F.col(seq_col).desc())
            # NOTE: do NOT persist `latest` (the window output): a
            # cached plan's output partitioning is pinned (AQE cannot
            # coalesce it — canChangeCachedPlanOutputPartitioning is
            # off by default), so the data-file stage would write one
            # part file PER SHUFFLE PARTITION per micro-batch (measured:
            # 97 files after 3 batches, 40 s MoR reads). The window
            # recomputes per action, but over the CACHED parsed batch —
            # one in-memory scan + one small exchange each, and the
            # stage writes stay AQE-coalesced.
            latest = batch.withColumn(
                "__rn", F.row_number().over(w)).filter("__rn = 1")
            _, meta = _current_metadata(target_path)
            cols = [f["name"] for f in
                    (_current_schema(meta) or {"fields": []})["fields"]]
            ups = latest.filter(
                F.coalesce(F.col(op_col), F.lit("")) != "D") \
                .select(*[c for c in cols if c in latest.columns])
            dels = latest.filter(F.col(op_col) == "D")
            upsert_iceberg(sess, target_path, ups, primary_key,
                           delete_keys=dels, batch_rows=batch_rows)
            if compact_every and batch_id > 0 \
                    and batch_id % compact_every == 0:
                compact_iceberg(sess, target_path)
            return
        if is_delta_table(target_path):
            merge_delta(
                sess, target_path, batch, primary_key,
                strategy=MergeStrategy.CHANGE_CAPTURE_SOFT if soft
                else MergeStrategy.CHANGE_CAPTURE,
                seq_col=seq_col, op_col=op_col, batch_rows=batch_rows)
            if compact_every and batch_id > 0 \
                    and batch_id % compact_every == 0:
                optimize_delta(sess, target_path)
            return
        try:
            target = sess.read.parquet(target_path)
            exists = True
        except Exception:
            exists = False
        if exists:
            merged = merge_change_capture(
                target, batch, primary_key, seq_col=seq_col, op_col=op_col,
                soft=soft)
        else:
            merged = batch if soft else batch.filter(
                F.coalesce(F.col(op_col), F.lit("")) != F.lit("D"))
        # target is being read by the merge plan: stage-and-swap
        from sling_cli_spark.sinks.writers import promote_swap

        tmp = target_path.rstrip("/") + "__swap"
        merged.write.mode("overwrite").parquet(tmp)
        promote_swap(sess, target_path, tmp)

    writer = src.writeStream.foreachBatch(_apply) \
        .option("checkpointLocation", checkpoint)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
