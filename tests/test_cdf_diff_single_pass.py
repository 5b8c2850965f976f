"""Pin the r15 single-pass ``_cdf_diff`` against the legacy 4-branch
union shape, value-for-value.

The rewrite replaces four filtered re-executions of the pre/post
full-outer join with ONE join + ``explode`` of a per-row change-type
array (guide §1.2). The emitted change-row SET must be identical —
including null-valued non-key columns, evolved columns missing from
``pre``, and rows that are byte-identical across the rewrite (which
must emit nothing).
"""

import pytest
from pyspark.sql import functions as F


def legacy_cdf_diff(pre, post, pk):
    """The pre-r15 shape, reconstructed verbatim."""
    cols = post.columns
    for c in cols:
        if c not in pre.columns:
            pre = pre.withColumn(c, F.lit(None).cast(dict(post.dtypes)[c]))
    rest = [c for c in cols if c not in pk]
    p = pre.select(*pk, F.struct(*rest).alias("__pre"))
    q = post.select(*pk, F.struct(*rest).alias("__post"))
    j = p.join(q, on=pk, how="full_outer")

    side_filters = {
        "delete": F.col("__post").isNull() & F.col("__pre").isNotNull(),
        "insert": F.col("__pre").isNull() & F.col("__post").isNotNull(),
        "update_preimage":
            F.col("__pre").isNotNull() & F.col("__post").isNotNull()
            & ~F.col("__pre").eqNullSafe(F.col("__post")),
    }
    side_filters["update_postimage"] = side_filters["update_preimage"]

    def unpack(side, ct):
        return (j.filter(side_filters[ct])
                .select(*pk,
                        *[F.col(f"{side}.{c}").alias(c) for c in rest])
                .withColumn("_change_type", F.lit(ct)))

    out = unpack("__pre", "delete") \
        .unionByName(unpack("__post", "insert")) \
        .unionByName(unpack("__pre", "update_preimage")) \
        .unionByName(unpack("__post", "update_postimage"))
    return out.select(*cols, "_change_type")


def canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("evolved", [False, True])
def test_cdf_diff_matches_legacy(spark, evolved):
    from sling_cli_spark.sources.delta_py import _cdf_diff

    pre = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0),
         (5, "e", 5.0)],
        "id long, s string, v double")
    post_rows = [
        (2, "b", None),        # identical (null non-key) -> no change
        (3, "CH", 3.0),        # update
        (4, "d", None),        # update via null flip
        (5, "e", 5.0),         # identical -> no change
        (9, "new", 9.0),       # insert
    ]                          # id 1 absent -> delete
    schema = "id long, s string, v double"
    post = spark.createDataFrame(post_rows, schema)
    if evolved:
        # post carries a column pre never had (schema evolution)
        post = post.withColumn("extra", F.col("id") * 10)
    got = canon(_cdf_diff(pre, post, ["id"]))
    want = canon(legacy_cdf_diff(pre, post, ["id"]))
    assert got == want
    # sanity on the classes themselves
    kinds = sorted(set(r[-1] for r in got))
    assert kinds == ["delete", "insert", "update_postimage",
                     "update_preimage"]


def test_cdf_diff_composite_pk_and_empty(spark):
    from sling_cli_spark.sources.delta_py import _cdf_diff

    pre = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], "a long, b string, n long")
    post = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], "a long, b string, n long")
    assert _cdf_diff(pre, post, ["a", "b"]).count() == 0
    got = canon(_cdf_diff(pre, post.filter("b = 'x'"), ["a", "b"]))
    want = canon(legacy_cdf_diff(pre, post.filter("b = 'x'"), ["a", "b"]))
    assert got == want
