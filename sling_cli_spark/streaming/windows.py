"""Windowed aggregations — one operator for batch and streams.

Reference framing: sling is a batch micro-pipeline with no window
semantics (SURVEY §2.8); this is part of the beyond-reference streaming
surface. ``F.window`` produces identical results over a static DataFrame
and a stream, so the SAME operator backs both: the batch form feeds the
DuckDB correctness oracle (window start == ``date_trunc``), the
streaming form adds a watermark so state for closed windows is evicted
(late rows beyond the watermark drop instead of growing state forever).

Scale: groupBy(window, keys) is one shuffle on (window, keys); in
streaming mode the state store holds only open windows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: ``(window_start, window_end, *keys,
    *aggs)``. Pass ``watermark`` ("10 minutes") on streaming input."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(
        F.window(F.col(ts_col), duration).alias("__w"),
        *[F.col(k) for k in (keys or [])],
    ).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window variant (window length ``duration``, advancing by
    ``slide``); each row lands in duration/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("__w"),
        *[F.col(k) for k in (keys or [])],
    ).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )
