"""Driver-side Arrow staging for provably small frames (r15).

Every lake commit stages its frame with a distributed parquet write.
For the KB-scale frames the CDC/streaming paths commit per micro-batch
(and the change files a CDF-enabled merge stages), that job is pure
overhead: a warm single-task Spark write costs ~0.25-0.30 s of job
setup + task launch + commit protocol, while ``df.toArrow()`` plus a
``pyarrow.parquet`` write of the same rows costs ~0.05-0.12 s
(guide §1.2 — fewer/cheaper actions; §5 — the driver may do O(KB)
work, never O(data)).

The fast path NEVER decides size itself: callers must prove the frame
small first — a counted micro-batch row count, or a byte bound derived
from the log (sum of the touched files' ``add.size``). Anything
unproven, partitioned, non-local, or that fails to collect falls back
to the distributed write unchanged.
"""

from __future__ import annotations

import os
import uuid

from sling_cli_spark import fsio

# Caps for what a caller-supplied proof may admit. Collecting
# DRIVER_STAGE_BYTES of source parquet decompresses to well under
# ~200 MB of Arrow — trivial against the driver heap (guide §5) at any
# deployment size; both are env-tunable per deployment.
DRIVER_STAGE_ROWS = int(os.environ.get("SLING_DRIVER_STAGE_ROWS",
                                       "200000"))
DRIVER_STAGE_BYTES = int(os.environ.get("SLING_DRIVER_STAGE_BYTES",
                                        str(32 << 20)))


def driver_stage_parquet(df, tmp: str) -> bool:
    """Collect ``df`` and write ONE zstd parquet part file under the
    (local) staged dir ``tmp``. Returns False — caller runs its normal
    distributed write — when the path is non-local or the collect/write
    fails for any reason (e.g. a type Arrow cannot carry); real plan
    errors (constraint guards) resurface identically on the fallback
    write, with the caller's existing error handling."""
    try:
        base = fsio.local_path(tmp)
    except ValueError:
        return False  # object store: keep the distributed write
    try:
        import pyarrow.parquet as pq

        tbl = df.toArrow()
        os.makedirs(base, exist_ok=True)
        pq.write_table(
            tbl,
            os.path.join(base, f"part-{uuid.uuid4().hex[:8]}.zstd.parquet"),
            compression="zstd")
        return True
    except Exception:
        return False
