"""As-of join and gap-based sessionization.

Neither exists in the reference (or in stock Spark as a single operator);
both are staple time-series/training-pipeline ops, composed here from
built-in window functions so they scale like any other shuffle-once plan:

- asof_join: union the two sides tagged, one window per key ordered by
  (time, tag) carrying the last right-side row forward. NO per-key
  explosion, no range cross-join: cost = one shuffle on the key + a sort
  within partitions — the canonical scalable as-of plan.
- sessionize: session boundaries where the gap to the previous event
  exceeds the threshold; session ids are a running sum of boundaries.
  Two stacked windows over the same (key, time) ordering — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame, right: DataFrame, on, left_time: str,
    right_time: str | None = None, direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` (direction='backward'; 'forward' matches
    the nearest ``>=``) sharing the join key.

    Right columns (except key/time) come back prefixed. Left rows with no
    earlier right row keep NULLs — LEFT ASOF semantics (DuckDB's
    ``ASOF LEFT JOIN`` is the oracle twin).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    rcols = [c for c in right.columns if c not in keys]
    rstruct = F.struct(*[F.col(f"`{c}`") for c in rcols])
    r = right.select(
        *keys, F.col(right_time).alias("__t"),
        rstruct.alias("__rv"), F.lit(0).alias("__is_left"))
    lcols = left.columns
    l = left.select(
        *[F.col(f"`{c}`") for c in lcols],
        F.col(left_time).alias("__t"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(1).alias("__is_left"))
    both = l.unionByName(r, allowMissingColumns=True)

    # at equal times the right row must be visible to the left row, so the
    # right (tag 0) sorts first for backward, last for forward
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(
            F.col("__t").asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        filled = F.last("__rv", ignorenulls=True).over(w)
    else:
        w = Window.partitionBy(*keys).orderBy(
            F.col("__t").asc(), F.col("__is_left").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        filled = F.first("__rv", ignorenulls=True).over(w)

    out = both.withColumn("__m", filled).filter(F.col("__is_left") == 1)
    proj = [F.col(f"`{c}`") for c in lcols]
    proj += [F.col("__m").getField(c).alias(f"{right_prefix}{c}")
             for c in rcols]
    return out.select(*proj)


def sessionize(
    df: DataFrame, key, time_col: str, gap: str | int = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per key) exceeds ``gap`` (seconds or an interval
    string). ``session_col`` numbers sessions per key from 1."""
    keys = [key] if isinstance(key, str) else list(key)
    gap_sec = (float(gap) if isinstance(gap, (int, float))
               else _interval_seconds(gap))
    dtype = dict(df.dtypes)[time_col]
    t = F.col(time_col)
    # seconds on a numeric axis; timestamp_ntz needs the tz-cast hop
    t_sec = (F.unix_micros(t.cast("timestamp")) / 1e6
             if dtype.startswith("timestamp") else t.cast("double"))
    w = Window.partitionBy(*keys).orderBy(t)
    prev = F.lag(t_sec).over(w)
    is_new = F.when(prev.isNull(), 1).otherwise(
        (t_sec - prev > gap_sec).cast("int"))
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__new")


def _interval_seconds(s: str) -> float:
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    parts = s.split()
    if len(parts) == 2 and parts[1].rstrip("s") in mult:
        return float(parts[0]) * mult[parts[1].rstrip("s")]
    raise ValueError(f"can't parse interval {s!r}")
