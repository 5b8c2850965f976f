"""Minimal Iceberg v1 table reader/writer over the PUBLIC table spec.

Reference surface: ``core/dbio/iop/iceberg.go`` (scans via DuckDB's
iceberg extension — not installable offline here). The open Iceberg spec
(iceberg.apache.org/spec) defines the layout this module implements
directly, reusing the stdlib Avro codec (``sources/avro_py``):

- ``metadata/vN.metadata.json`` — table metadata: schema (field-id
  annotated), snapshots, ``current-snapshot-id``; ``version-hint.text``
  points at the current metadata version.
- snapshot ``manifest-list`` (Avro): one entry per manifest file.
- manifest (Avro): entries of ``(status, data_file)``; status 2 means
  DELETED — readers skip those files.
- data files: plain parquet.

Scope (documented): v1, unpartitioned, parquet data files, no deletes
beyond whole-file remove, stats omitted (optional in v1). Enough for
EL-tool snapshots: :func:`write_iceberg` (append/overwrite creating a
new snapshot + metadata version) and :func:`read_iceberg` (current or
``snapshot_id=`` time travel). The jar-backed Spark DataSource takes
precedence when present (sources/files.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.sources.avro_py import read_avro, write_avro

_SPARK_TO_ICE = {
    "long": "long", "integer": "int", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "binary": "binary",
    "date": "date", "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ],
        }},
    ],
}


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def is_iceberg_table(path: str) -> bool:
    return os.path.isfile(os.path.join(_meta_dir(path), "version-hint.text"))


def _current_metadata(path: str) -> tuple[int, dict]:
    with open(os.path.join(_meta_dir(path), "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as f:
        return v, json.load(f)


def _ice_schema_for(df: DataFrame) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, 1):
        t = _SPARK_TO_ICE.get(f.dataType.typeName())
        if t is None:
            tn = f.dataType.typeName()
            if tn == "decimal":
                t = f"decimal({f.dataType.precision}, {f.dataType.scale})"
            else:
                t = "string"
        fields.append({"id": i, "name": f.name, "required": False, "type": t})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _active_files(path: str, meta: dict, snapshot_id: int | None) -> list[dict]:
    snaps = meta.get("snapshots") or []
    sid = snapshot_id if snapshot_id is not None \
        else meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s["snapshot-id"] == sid), None)
    if snap is None:
        return []
    _, manifests = read_avro(snap["manifest-list"])
    files: list[dict] = []
    for m in manifests:
        _, entries = read_avro(m["manifest_path"])
        for e in entries:
            if e["status"] != 2:  # 2 = DELETED
                files.append(e["data_file"])
    return files


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None,
) -> DataFrame:
    """Scan the current (or a specific) snapshot."""
    _, meta = _current_metadata(path)
    files = _active_files(path, meta, snapshot_id)
    if not files:
        from pyspark.sql import types as T

        fields = [T.StructField(f["name"], T.StringType())
                  for f in meta["schemas"][0]["fields"]]
        return spark.createDataFrame([], T.StructType(fields))
    return spark.read.parquet(*[f["file_path"] for f in files])


def merge_iceberg(
    spark: SparkSession,
    path: str,
    src: DataFrame,
    primary_key,
    strategy=None,
    update_key: str | None = None,
) -> dict:
    """Copy-on-write MERGE as a new snapshot: data files holding matched
    PKs are replaced (carried forward files keep status 0, replaced ones
    are simply not carried), so readers of older snapshots still see the
    pre-merge table — same contract as :func:`delta_py.merge_delta`.

    Returns {"touched": n, "new_files": n, "kept": n, "snapshot_id": id}.
    """
    from sling_cli_spark.config import MergeStrategy
    from sling_cli_spark.operators.file_merge import touched_files
    from sling_cli_spark.operators.merge import merge_dataframes

    strategy = strategy or MergeStrategy.UPDATE_INSERT
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    _, meta = _current_metadata(path)
    active = _active_files(path, meta, None)
    target = read_iceberg(spark, path)

    touched: set[str] = set()
    if strategy == MergeStrategy.INSERT:
        replacement = src.join(target.select(*pk), on=pk, how="left_anti")
    elif strategy == MergeStrategy.HISTORY_INSERT:
        replacement = src
    else:
        from urllib.parse import urlparse

        touched = {
            os.path.abspath(urlparse(p).path or p)
            for p in touched_files(target, src, pk)
        }
        touched_paths = sorted(touched)
        touched_rows = spark.read.parquet(*touched_paths) if touched_paths \
            else spark.createDataFrame([], target.schema)
        replacement = merge_dataframes(
            touched_rows, src, pk, strategy=strategy, update_key=update_key)

    keep = [f for f in active
            if os.path.abspath(f["file_path"]) not in touched]
    snapshot_id = _commit_snapshot(df=replacement, path=path, meta=meta,
                                   carried=keep)
    return {"touched": len(touched),
            "new_files": len(_active_files(path, meta, snapshot_id)) - len(keep),
            "kept": len(keep), "snapshot_id": snapshot_id}


def _init_meta(df: DataFrame, path: str) -> dict:
    return {
        "format-version": 1,
        "table-uuid": str(uuid.uuid4()),
        "location": os.path.abspath(path),
        "last-updated-ms": 0,
        "last-column-id": len(df.schema.fields),
        "schemas": [_ice_schema_for(df)],
        "schema": _ice_schema_for(df),  # v1 single-schema field
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "snapshots": [],
        "current-snapshot-id": -1,
    }


def _commit_snapshot(
    df: DataFrame, path: str, meta: dict, carried: list[dict],
    operation: str = "append",
) -> int:
    """Stage ``df`` as new data files, write manifest + manifest-list,
    bump the metadata version; ``carried`` files join the snapshot with
    status 0 (existing). Returns the new snapshot id."""
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    os.makedirs(_meta_dir(path), exist_ok=True)
    version = 0
    if is_iceberg_table(path):
        version, _ = _current_metadata(path)

    tmp = os.path.join(path, "data", f".stage_{uuid.uuid4().hex[:8]}")
    df.write.parquet(tmp)
    data_files: list[dict] = []
    for fname in sorted(os.listdir(tmp)):
        if not fname.endswith(".parquet") or fname.startswith((".", "_")):
            continue
        new_name = f"{uuid.uuid4().hex}.parquet"
        dest = os.path.join(path, "data", new_name)
        os.rename(os.path.join(tmp, fname), dest)
        data_files.append({
            "file_path": os.path.abspath(dest),
            "file_format": "PARQUET",
            "record_count": 0,  # stats optional in v1
            "file_size_in_bytes": os.path.getsize(dest),
        })
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)

    snapshot_id = int(time.time() * 1000) * 1000 + (version + 1)
    entries = [{"status": 1, "snapshot_id": snapshot_id, "data_file": f}
               for f in data_files]
    entries += [{"status": 0, "snapshot_id": snapshot_id, "data_file": f}
                for f in carried]

    manifest_path = os.path.join(
        _meta_dir(path), f"{uuid.uuid4().hex}-m0.avro")
    write_avro(manifest_path, entries, _MANIFEST_ENTRY_SCHEMA)
    mlist_path = os.path.join(
        _meta_dir(path), f"snap-{snapshot_id}.avro")
    write_avro(mlist_path, [{
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "added_snapshot_id": snapshot_id,
    }], _MANIFEST_FILE_SCHEMA)

    meta["snapshots"] = (meta.get("snapshots") or []) + [{
        "snapshot-id": snapshot_id,
        "timestamp-ms": int(time.time() * 1000),
        "manifest-list": mlist_path,
        "summary": {"operation": operation},
    }]
    meta["current-snapshot-id"] = snapshot_id
    meta["last-updated-ms"] = int(time.time() * 1000)

    new_version = version + 1
    with open(os.path.join(
            _meta_dir(path), f"v{new_version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    hint_tmp = os.path.join(_meta_dir(path), f".hint_{uuid.uuid4().hex[:6]}")
    with open(hint_tmp, "w") as f:
        f.write(str(new_version))
    os.replace(hint_tmp, os.path.join(_meta_dir(path), "version-hint.text"))
    return snapshot_id


def write_iceberg(
    df: DataFrame, path: str, mode: str = "append",
) -> int:
    """Append/overwrite as a new snapshot + metadata version; returns the
    snapshot id."""
    if is_iceberg_table(path):
        _, meta = _current_metadata(path)
    else:
        meta = _init_meta(df, path)
    carried = [] if mode == "overwrite" or not meta.get("snapshots") \
        else _active_files(path, meta, None)
    return _commit_snapshot(
        df, path, meta, carried,
        operation="overwrite" if mode == "overwrite" else "append")
