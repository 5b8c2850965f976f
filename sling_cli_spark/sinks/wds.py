"""WebDataset tar-shard sink + reader.

WebDataset (the public webdataset format: POSIX tar archives whose
members group by key — ``<key>.<ext>`` — read sequentially by training
loaders) is the de-facto sharded layout for multimodal pretraining
corpora. The engine's multimodal columns (opaque binary + metadata,
``operators/multimodal.py``) need a way OUT to trainers and back IN;
this module writes/reads the format with stdlib ``tarfile`` only.

Scale shape:

- :func:`write_webdataset` assigns each sample a deterministic shard
  (md5 of the key — reproducible, no RNG state), then ONE
  ``applyInPandas`` group per shard streams its members into
  ``shard-NNNNN.tar`` on the executor. No driver involvement with
  sample bytes; shard count bounds tar size. Members within a shard
  are written key-sorted so output bytes are stable run-to-run.
- :func:`read_webdataset` lists ``*.tar`` driver-side and parses each
  tar ON EXECUTORS via ``mapInPandas`` over the path list — one task
  per shard, bytes never transit the driver.

Paths must be visible to executors (local/NFS in this sandbox; the
same contract as Spark's own file sinks).
"""

from __future__ import annotations

import glob
import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession

from sling_cli_spark.localframe import local_df
from pyspark.sql import functions as F

_OUT_SCHEMA = "shard int, path string, n_samples long, n_bytes long"


def write_webdataset(
    df: DataFrame, path: str, key_col: str,
    columns: dict[str, str], shards: int = 8,
) -> DataFrame:
    """Write rows as WebDataset shards: each row's ``columns`` map
    ({source_col: extension}) becomes tar members ``<key>.<ext>``.
    Returns one row per shard (shard, path, n_samples, n_bytes) —
    materialized eagerly so the write happens exactly once.

    String columns encode UTF-8; binary columns pass through; nulls
    skip the member (WebDataset's sparse-field convention)."""
    os.makedirs(path, exist_ok=True)
    cols = dict(columns)

    def _write(pdf):
        import pandas as pd

        shard = int(pdf["__shard"].iloc[0])
        dest = os.path.join(path, f"shard-{shard:05d}.tar")
        n = 0
        pdf = pdf.sort_values(key_col, kind="mergesort")
        with tarfile.open(dest, "w") as tar:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                if "." in key:
                    raise ValueError(
                        f"WebDataset keys must not contain '.' "
                        f"(got {key!r}): readers split the sample key "
                        "at the first dot")
                for col, ext in cols.items():
                    v = row[col]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    data = v if isinstance(v, (bytes, bytearray)) \
                        else str(v).encode()
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # stable bytes run-to-run
                    tar.addfile(info, io.BytesIO(bytes(data)))
                n += 1
        return pd.DataFrame([{
            "shard": shard, "path": dest, "n_samples": n,
            "n_bytes": os.path.getsize(dest)}])

    staged = df.select(key_col, *cols).withColumn(
        "__shard",
        (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
                16, 10).cast("long") % shards).cast("int"))
    out = staged.groupBy("__shard").applyInPandas(_write, _OUT_SCHEMA)
    spark = df.sparkSession
    return local_df(spark, out.collect(), _OUT_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset shards back -> (key, ext, data binary) rows.
    Shard tars parse on executors (one task per tar via mapInPandas
    over the path list); only the path listing is driver-side."""
    paths = sorted(glob.glob(os.path.join(path, "*.tar")))
    if not paths:
        raise FileNotFoundError(f"no .tar shards under {path}")

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                keys, exts, datas = [], [], []
                with tarfile.open(p, "r") as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        # WebDataset convention: the sample KEY is
                        # everything before the FIRST dot — compound
                        # extensions (seg.png, json.gz) belong to the
                        # extension, so foreign shards group correctly
                        stem, _, ext = m.name.partition(".")
                        keys.append(stem)
                        exts.append(ext)
                        datas.append(tar.extractfile(m).read())
                yield pd.DataFrame(
                    {"key": keys, "ext": exts, "data": datas})

    src = local_df(spark, [(p,) for p in paths], "path string") \
        .repartition(len(paths), "path")
    return src.mapInPandas(_read, "key string, ext string, data binary")
