"""Minimal Delta Lake table layer over the PUBLIC transaction-log protocol.

Reference: the engine's Delta surface (``core/dbio/iop/delta.go`` scans
via duckdb ``delta_scan``; ``task_run_write.go:997-1179`` merges) and the
open Delta protocol (github.com/delta-io/delta PROTOCOL.md): a table is
a directory of parquet data files plus ``_delta_log/NNNNNNNNNN...N.json``
commits, each a list of actions (``protocol`` / ``metaData`` / ``add`` /
``remove``). Readers reconstruct the active file set by replaying the
log; writers commit atomically by writing the next version file.

Neither the delta-spark jars nor DuckDB's delta extension are available
in this environment, so this module implements the subset directly:

- :func:`read_delta` — replay the JSON log, read ACTIVE files only
  (time travel via ``version=``); snapshot isolation for free, since a
  concurrent writer only adds new log versions.
- :func:`write_delta` — append / overwrite with atomic log commits
  (``protocol`` minReader=1 / minWriter=2 + Spark-schema ``metaData`` on
  version 0, matching what delta-spark writes for simple tables).
- :func:`merge_delta` — the REAL incremental-merge answer at scale:
  copy-on-write at file granularity (operators/file_merge's touched-file
  probe) committed as ``remove`` + ``add`` actions. An incremental batch
  touching 0.1% of PKs rewrites only the files holding them, and readers
  at any version never see a partial merge.

Not implemented (documented): checkpoints (logs are replayed from JSON
— fine for the commit counts an EL tool produces), deletion vectors,
column mapping, partitioned add.partitionValues beyond passthrough.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_delta_log"


def is_delta_table(path: str) -> bool:
    return os.path.isdir(os.path.join(path, _LOG_DIR))


def _log_path(path: str, version: int) -> str:
    return os.path.join(path, _LOG_DIR, f"{version:020d}.json")


def _list_versions(path: str) -> list[int]:
    d = os.path.join(path, _LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append(int(f[:-5]))
    return sorted(out)


def latest_version(path: str) -> int:
    vs = _list_versions(path)
    return vs[-1] if vs else -1


def replay_log(path: str, version: int | None = None):
    """-> (metadata_action, {relative_file_path: add_action}) at
    ``version`` (default: latest)."""
    meta: dict[str, Any] | None = None
    files: dict[str, dict] = {}
    for v in _list_versions(path):
        if version is not None and v > version:
            break
        with open(_log_path(path, v)) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
    return meta, files


def _commit(path: str, version: int, actions: list[dict]) -> None:
    """Atomic commit: temp file + O_EXCL-ish rename of the next version.
    A concurrent committer of the same version loses the rename race and
    raises — the optimistic-concurrency contract of the protocol."""
    os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
    target = _log_path(path, version)
    if os.path.exists(target):
        raise FileExistsError(
            f"delta: version {version} already committed at {path}")
    tmp = target + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, target)  # fails if the version appeared concurrently
    finally:
        os.unlink(tmp)


def _schema_string(df: DataFrame) -> str:
    return df.schema.json()


def _first_commit_actions(df: DataFrame) -> list[dict]:
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(df),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }},
    ]


def _stage_data_files(df: DataFrame, path: str) -> list[dict]:
    """Write ``df`` as parquet part files INTO the table dir (unique
    names; invisible until committed) -> list of add actions."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".stage_{uuid.uuid4().hex[:8]}")
    df.write.parquet(tmp)
    adds = []
    now = int(time.time() * 1000)
    for fname in sorted(os.listdir(tmp)):
        if not fname.endswith(".parquet") or fname.startswith((".", "_")):
            continue
        new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        os.rename(os.path.join(tmp, fname), os.path.join(path, new_name))
        adds.append({"add": {
            "path": new_name,
            "size": os.path.getsize(os.path.join(path, new_name)),
            "partitionValues": {},
            "modificationTime": now,
            "dataChange": True,
        }})
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return adds


def read_delta(
    spark: SparkSession, path: str, version: int | None = None,
) -> DataFrame:
    """Snapshot read at ``version`` (default latest)."""
    meta, files = replay_log(path, version)
    if meta is None:
        raise FileNotFoundError(f"not a delta table: {path}")
    if not files:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(meta["schemaString"])))
    return spark.read.parquet(
        *[os.path.join(path, p) for p in sorted(files)])


def write_delta(
    df: DataFrame, path: str, mode: str = "append",
) -> int:
    """Append or overwrite; returns the committed version."""
    version = latest_version(path) + 1
    actions: list[dict] = []
    if version == 0:
        actions += _first_commit_actions(df)
    elif mode == "overwrite":
        _, files = replay_log(path)
        now = int(time.time() * 1000)
        actions += [{"remove": {"path": p, "deletionTimestamp": now,
                                "dataChange": True}} for p in sorted(files)]
    actions += _stage_data_files(df, path)
    _commit(path, version, actions)
    return version


def merge_delta(
    spark: SparkSession,
    path: str,
    src: DataFrame,
    primary_key,
    strategy=None,
    update_key: str | None = None,
) -> dict:
    """Copy-on-write MERGE: rewrite only data files holding matched PKs,
    committed atomically as remove+add (reference semantics:
    base.yaml:52-126 merge strategies; delta-spark MERGE INTO is the
    jar-backed equivalent).

    Returns {"touched": n, "new_files": n, "kept": n, "version": v}.
    """
    from sling_cli_spark.config import MergeStrategy
    from sling_cli_spark.operators.file_merge import touched_files
    from sling_cli_spark.operators.merge import merge_dataframes

    strategy = strategy or MergeStrategy.UPDATE_INSERT
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    meta, files = replay_log(path)
    if meta is None:
        raise FileNotFoundError(f"not a delta table: {path}")
    target = read_delta(spark, path)

    touched_abs: list[str] = []
    if strategy == MergeStrategy.INSERT:
        replacement = src.join(target.select(*pk), on=pk, how="left_anti")
    elif strategy == MergeStrategy.HISTORY_INSERT:
        replacement = src
    else:
        touched_abs = touched_files(target, src, pk)
        touched_rows = spark.read.parquet(*touched_abs) if touched_abs \
            else spark.createDataFrame([], target.schema)
        replacement = merge_dataframes(
            touched_rows, src, pk, strategy=strategy, update_key=update_key)

    adds = _stage_data_files(replacement, path)
    now = int(time.time() * 1000)

    def rel(p: str) -> str:
        # touched_files yields file:// URIs (_metadata.file_path)
        from urllib.parse import urlparse

        local = urlparse(p).path or p  # handles file:/x, file:///x, /x
        return os.path.relpath(os.path.abspath(local), os.path.abspath(path))

    removes = [
        {"remove": {"path": rel(p), "deletionTimestamp": now,
                    "dataChange": True}}
        for p in touched_abs
    ]
    version = latest_version(path) + 1
    _commit(path, version, removes + adds)
    _, active = replay_log(path)
    return {"touched": len(removes), "new_files": len(adds),
            "kept": len(active) - len(adds), "version": version}


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Delete data files no longer referenced by the retained versions
    (delta VACUUM without the retention-hours knob — EL-tool sized)."""
    vs = _list_versions(path)
    keep_after = vs[-keep_versions] if len(vs) >= keep_versions else 0
    _, active = replay_log(path)
    referenced = set(active)
    for v in vs:
        if v >= keep_after:
            _, f = replay_log(path, v)
            referenced |= set(f)
    deleted = []
    for fname in os.listdir(path):
        if fname.endswith(".parquet") and not fname.startswith((".", "_")) \
                and fname not in referenced:
            os.unlink(os.path.join(path, fname))
            deleted.append(fname)
    return deleted
