"""Stateful streaming sessionization via applyInPandasWithState.

The custom-stateful-operator pattern: per-key session state (start, last
event, count) lives in the state store, sessions emit when the gap
timeout fires. Batch twin: ``operators.asof.sessionize`` (same gap
semantics, window-based).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.DoubleType()),
    T.StructField("session_end", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("count", T.LongType()),
])


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 1800.0,
    ts_col: str = "ts_sec", key_col: str = "user_id",
    timeout_conf: str = "processing",
) -> DataFrame:
    """events(user_id, ts_sec) stream -> closed-session rows.

    State per user: (start, last, count). An incoming batch extends the
    open session or closes it (emitting a row) when the gap is exceeded;
    the processing-time timeout closes idle sessions. The grouping
    shuffles by key exactly once per micro-batch; state is per-key O(1).

    ``timeout_conf="none"`` disables the idle-session processing-time
    timeout (r14, guide §1.2): with ANY processing-time timeout
    registered, Spark schedules no-data micro-batches forever in case
    state expires (``FlatMapGroupsWithStateExec.shouldRunAnotherBatch``
    is unconditionally true), so a ``Trigger.AvailableNow`` run never
    terminates — measured 308 s (the caller's awaitTermination cap)
    vs ~3 s. Callers that close every session with a flush event and
    drain with availableNow get identical output from ``"none"``,
    because the timeout branch never contributes rows within a run.
    """
    use_timeout = timeout_conf != "none"

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        # Output frames are built COLUMNAR (dict of per-column lists):
        # this fn runs once per key per micro-batch, and at a flush
        # batch every key yields — pd.DataFrame(list-of-row-dicts)
        # costs ~0.28 ms vs ~0.12 ms for the columnar form (guide §4.2:
        # cut per-call Python overhead inside the worker). Values and
        # dtypes are identical: SESSION_SCHEMA coerces on the Arrow
        # serialization boundary either way.
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, count = state.get
                state.remove()
                yield pd.DataFrame(
                    {"user_id": (user_id,), "session_start": (start,),
                     "session_end": (last,), "n_events": (count,)})
            return

        ts = sorted(
            float(t) for pdf in pdfs for t in pdf[ts_col].tolist())
        if not ts:
            return
        start, last, count = state.get if state.exists else (
            ts[0], ts[0], 0)
        c_start: list = []
        c_end: list = []
        c_n: list = []
        for t in ts:
            if count and t - last > gap_seconds:
                c_start.append(start)
                c_end.append(last)
                c_n.append(count)
                start, count = t, 0
            last = max(last, t)
            count += 1
        state.update((start, last, count))
        if use_timeout:
            state.setTimeoutDuration(int(gap_seconds * 1000))
        if c_start:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(c_start),
                 "session_start": c_start, "session_end": c_end,
                 "n_events": c_n}, copy=False)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if use_timeout
                     else GroupStateTimeout.NoTimeout),
    )
