"""r14 pin: the SQL-text expression forms in operators/dedup.py are
value-identical to the Column-API constructions they replaced.

The optimization (guide §1.2 driver overhead) rebuilt the k minhash
min-aggregates, the simhash bit-sum aggregates + sign-bit packing, and
the LSH band array as single-parse ``F.expr`` strings — ~6x fewer py4j
roundtrips per expression. These tests reconstruct the ORIGINAL
Column-API expressions inline and assert byte-identical results on a
real corpus slice, so any future drift in literal typing or operator
promotion (INT vs BIGINT literals, shiftleft packing weights, CASE
branches) fails loudly instead of silently skewing signatures.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sling_cli_spark.operators.dedup import (
    _P, _hash_coeffs, lsh_band_table, md5_hash60, minhash_signature_table,
    shingle_hash_table, simhash_table)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="testdata not present")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")) \
        .limit(200)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_slots_match_column_api(spark):
    docs = _docs(spark)
    hashed = shingle_hash_table(docs, hasher=md5_hash60)
    new = minhash_signature_table(docs, hashed=hashed, num_hashes=16)

    shingled = hashed.select(
        "doc_id", F.pmod(F.col("__h"), F.lit(_P)).alias("__h"))
    h = F.col("__h")
    legacy_aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(_P)).alias(f"__s{i}")
        for i, (a, b) in enumerate(_hash_coeffs(16))
    ]
    legacy = shingled.groupBy("doc_id").agg(*legacy_aggs)
    assert _rows(new) == _rows(legacy)


def test_band_hashes_match_column_api(spark):
    docs = _docs(spark)
    sig = minhash_signature_table(docs, num_hashes=16, hasher=md5_hash60)
    new = lsh_band_table(sig, num_hashes=16, bands=4)

    r = 4
    legacy_structs = F.array(*[
        F.struct(
            F.lit(i).alias("band_id"),
            F.xxhash64(F.concat_ws(
                ",", *[F.col(f"__s{i * r + j}").cast("string")
                       for j in range(r)])).alias("band_hash"),
        )
        for i in range(4)
    ])
    legacy = (sig.select(F.col("doc_id"),
                         F.explode(legacy_structs).alias("b"))
              .select("doc_id", "b.band_id", "b.band_hash"))
    assert _rows(new) == _rows(legacy)


def test_simhash_packing_matches_column_api(spark):
    from sling_cli_spark.operators.dedup import tokens_col

    docs = _docs(spark)
    new = simhash_table(docs, hasher=md5_hash60)

    toks = docs.select(
        "doc_id",
        F.explode_outer(tokens_col(F.col("text"))).alias("__t"),
    ).select("doc_id",
             md5_hash60(F.coalesce(F.col("__t"), F.lit(""))).alias("__h"))
    h = F.col("__h")
    legacy_aggs = [
        F.sum(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)).cast("long")
              * 2 - 1).alias(f"__b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*legacy_aggs)
    out = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(F.col(f"__b{i}") > 0, F.lit(weight).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    legacy = agg.select(F.col("doc_id"), out.alias("__sh"))
    assert _rows(new) == _rows(legacy)
