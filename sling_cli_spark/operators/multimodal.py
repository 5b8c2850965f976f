"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata, exactly like any other column (the reference treats binary as a
first-class general type, datatype.go:53-74). The decode / feature-extract
stages run as Arrow-batched ``mapInPandas`` so each task processes a
columnar batch of blobs without driver involvement.

The actual codec libraries (Pillow/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are stubbed: ``decode_stub=True`` (default)
produces deterministic fake features so the Spark-side plumbing — schema,
batch shape, partition sizing — is real and testable; with
``decode_stub=False`` the same entry points raise ``NotImplementedError``
at the exact place a real decoder would plug in.

Scale notes: blobs are large — ``repartition_for_blobs`` targets a bounded
per-task byte budget so a 100 TB media corpus doesn't OOM executors, and
metadata-only queries never touch the blob column (parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from sling_cli_spark.localframe import local_df
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("content", T.BinaryType()),
])

_FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def repartition_for_blobs(
    df: DataFrame, size_col: str = "n_bytes",
    target_task_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Size partitions by blob bytes, not row count.

    A 1M-row partition of 10 MB images is 10 TB in one task; repartition by
    total bytes / target so each task stays within executor memory.
    """
    total = df.agg(F.sum(F.coalesce(F.col(size_col), F.lit(0))).alias("b")) \
        .collect()[0]["b"] or 0
    n = max(1, int(total // target_task_bytes) + 1)
    return df.repartition(n)


def decode_features(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id",
    decode_stub: bool = True,
) -> DataFrame:
    """Decode blobs -> fixed-dim feature vectors via Arrow-batched pandas.

    Real plumbing: ``mapInPandas`` receives pyarrow-backed batches of the
    binary column; the stub kernel derives deterministic features from the
    bytes themselves (length + 16 byte-histogram buckets, L1-normalized)
    so tests can assert exact values.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg (not in this "
                    "container); plug the decoder in here")
            out_rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=_FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                out_rows.append((
                    int(mid), len(b),
                    (hist / total).astype(np.float32).tolist(),
                ))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "n_bytes", "features"])

    return df.select(F.col(id_col), F.col(content_col)) \
        .mapInPandas(kernel, schema=FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000,
    duration_col: str = "duration_ms", id_col: str = "media_id",
) -> DataFrame:
    """Explode a video row into per-frame sample timestamps (metadata only —
    the actual frame grab happens in the decode kernel). Pure Catalyst:
    sequence + explode, no Python."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0),
                       F.coalesce(F.col(duration_col), F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def make_fake_media(spark, n: int = 100, media_type: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests (no real codecs)."""
    rows = []
    for i in range(n):
        blob = bytes(((i * 37 + j * 11) % 256) for j in range(64 + (i % 5) * 16))
        rows.append((i, media_type, f"{media_type}/fake", 8, 8,
                     1000 * (1 + i % 4), blob))
    return local_df(spark, rows, MEDIA_SCHEMA)
