"""Scale-adaptive sizing for ephemeral streaming queries (guide §2.2).

A stateful streaming exchange is pinned to ``spark.sql.shuffle.partitions``
at the query's first micro-batch and AQE never coalesces it (the state
store count is checkpoint-durable), so a session sized for batch work
over-partitions a small stream: every micro-batch pays one state-store
open + delta-file commit + task schedule *per partition per stateful
operator*. Measured on the watermarked tumbling-window stream at sf0.1
(~4 MB of micro-batched JSON, 5 batches, local[32]): 9-17 s at the
session's 32 partitions vs 2.1-2.4 s at any count <= 8, with identical
results (the output of sessionize / window-agg / dedup is
partition-count independent).

Derive the count from the actual stream source bytes instead of the
session constant; the session setting stays the CAP, so a deployment
that configures thousands of shuffle partitions for 100 TB keeps its
parallelism for streams whose backlog warrants it.
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

# One state partition per 64 MB of micro-batched source. Guide §2.2 sizes
# shuffle partitions in the 100 MB - 1 GB range; streaming batches re-use
# the same partitioning across every micro-batch *and* pay per-partition
# state-store commits, so the lower bound of that band is the right
# target: enough rows per partition to amortize the commit, small enough
# that one straggling state task cannot dominate a batch.
BYTES_PER_STATE_PARTITION = 64 << 20

# Python-stateful streams (applyInPandasWithState) process every row in
# the pandas worker — guide §4's JVM↔Python gap makes a byte of input
# ~2 orders of magnitude more expensive than in a JVM hash aggregate, so
# partitions must be correspondingly denser for the same per-task wall
# time. Measured on the sf0.1 sessionize stream (25k rows ≈ 1.2 MB per
# micro-batch): 1 partition → ~22 s, 4 → ~9.4 s, 8 → ~5.3 s,
# 16 → ~4.6 s; 512 KiB per partition lands in the flat part of that
# curve while the session cap still bounds deployment-scale streams.
BYTES_PER_PYTHON_STATE_PARTITION = 512 << 10


def stream_state_partitions(
    spark: SparkSession, source_bytes: int,
    bytes_per_partition: int = BYTES_PER_STATE_PARTITION,
) -> int:
    """Size-derived state/shuffle partition count for an ephemeral stream,
    clamped to [1, session shuffle partitions]."""
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    want = int(math.ceil(source_bytes / float(bytes_per_partition))) or 1
    return max(1, min(cap, want))


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Temporarily pin ``spark.sql.shuffle.partitions`` (e.g. for the
    lifetime of one streaming query, start through awaitTermination —
    the stateful exchange captures the value at its first batch).

    The toggle mutates the SESSION-global conf: any query planned
    concurrently in the same session inside the scope (including a
    batch twin deliberately overlapped with the stream drain) plans
    with the reduced count. That is intentional for the single-driver
    usage here — results are partition-count independent and the small
    twin is cheaper at the reduced count too — but callers sharing one
    session across threads with large concurrent batch work should
    scope per-query (``spark.newSession()``) instead (ADVICE r14)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
