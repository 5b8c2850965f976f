"""Size guards for driver-side fallback paths.

A handful of format fallbacks (stdlib Avro OCF, xlsx, Google Sheets)
necessarily materialize rows on the driver — they exist for when the
distributed path (spark-avro jar, Sheets API limits) is unavailable.
Without a bound, pointing one at a big table OOMs the driver silently
after minutes of collect. These guards fail FAST with an error naming
the distributed alternative.

Caps are env-overridable for hosts with more driver memory:
``SLING_DRIVER_ROW_CAP`` (rows) and ``SLING_DRIVER_BYTE_CAP`` (bytes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def driver_row_cap() -> int:
    return int(os.environ.get("SLING_DRIVER_ROW_CAP", "1000000"))


def driver_byte_cap() -> int:
    return int(os.environ.get("SLING_DRIVER_BYTE_CAP",
                              str(256 * 1024 * 1024)))


class DriverSizeError(RuntimeError):
    """Raised when a driver-side fallback would materialize too much."""


def ensure_driver_rows(df: DataFrame, op: str, alternative: str) -> None:
    """Raise if ``df`` exceeds the driver row cap.

    The probe is ``limit(cap+1).count()`` — bounded work regardless of
    the input size (never a full count of an oversized table). Prefer
    :func:`collect_capped` when the caller collects the rows anyway —
    it enforces the same cap inside the collect job itself."""
    cap = driver_row_cap()
    if df.limit(cap + 1).count() > cap:
        raise DriverSizeError(
            f"{op} is a driver-side fallback and the input exceeds "
            f"{cap:,} rows. Use {alternative}, or raise "
            f"SLING_DRIVER_ROW_CAP if the driver has the memory.")


def collect_capped(df: DataFrame, op: str, alternative: str) -> list:
    """Collect ``df`` on the driver with the row cap enforced in the SAME
    Spark job: fetch ``cap+1`` rows and raise if more than ``cap`` come
    back. One job instead of a count probe followed by the real collect —
    the probe-then-collect shape doubled the fixed cost of every
    driver-fallback roundtrip. Bounded regardless of input size (the
    limit stops the scan; an oversized table never fully collects)."""
    cap = driver_row_cap()
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise DriverSizeError(
            f"{op} is a driver-side fallback and the input exceeds "
            f"{cap:,} rows. Use {alternative}, or raise "
            f"SLING_DRIVER_ROW_CAP if the driver has the memory.")
    return rows


def ensure_driver_bytes(n_bytes: int, op: str, alternative: str) -> None:
    cap = driver_byte_cap()
    if n_bytes > cap:
        raise DriverSizeError(
            f"{op} is a driver-side fallback and the input is "
            f"{n_bytes:,} bytes (cap {cap:,}). Use {alternative}, or "
            f"raise SLING_DRIVER_BYTE_CAP if the driver has the memory.")
