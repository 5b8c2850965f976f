"""BM25 + TF-IDF ranking operators (operators/ranking.py, round 10 —
beyond-reference training-pipeline ops; formulas are the public
Robertson BM25 / sklearn smoothed TF-IDF)."""

import math

import pytest

from pyspark.sql import functions as F

from sling_cli_spark.operators.ranking import (
    bm25_rank, bm25_topk, tfidf_keywords)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, "spark shuffle join join"),
         (2, "broadcast join is small"),
         (3, "sort merge plan"),
         (4, ""),                      # empty: never scores, never
                                       # dilutes N/avgdl
         (5, "JOIN, Join; join!")],    # case/punct normalization
        "doc_id long, text string")


def test_bm25_hand_computed(corpus):
    got = {r.doc_id: r.score
           for r in bm25_rank(corpus, ["join"]).collect()}
    # corpus stats over docs WITH tokens: N=4, dl=(4,4,3,3), avgdl=3.5
    n, avgdl, df = 4, 3.5, 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) /
                     (tf + k1 * (1 - b + b * dl / avgdl)), 4)

    assert got == {1: s(2, 4), 2: s(1, 4), 5: s(3, 3)}
    assert 3 not in got and 4 not in got  # no match -> omitted


def test_bm25_multi_term_sums(corpus):
    one = {r.doc_id: r.score
           for r in bm25_rank(corpus, ["merge"]).collect()}
    both = {r.doc_id: r.score
            for r in bm25_rank(corpus, ["merge", "sort"]).collect()}
    assert set(one) == {3} and set(both) == {3}
    assert both[3] > one[3]  # second matching term adds score
    with pytest.raises(ValueError):
        bm25_rank(corpus, [])


def test_bm25_topk_deterministic(corpus):
    top = bm25_topk(corpus, ["join"], k=2).collect()
    assert [r.doc_id for r in top] == [5, 1]  # highest tf/dl first
    assert top[0].score >= top[1].score


def test_tfidf_keywords_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "alpha alpha beta gamma"),
         (2, "beta gamma gamma delta"),
         (3, "delta epsilon")],
        "doc_id long, text string")
    out = tfidf_keywords(df, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 1: alpha tf=2 & rarest -> rank 1; beta/gamma tie on score
    # (same tf, same df) -> lexicographic term breaks it
    assert by_doc[1] == [(1, "alpha"), (2, "beta")]
    assert by_doc[2][0] == (1, "gamma")
    assert len(by_doc[3]) == 2
    # scores are rounded doubles, descending within a doc
    for rows in by_doc.values():
        assert rows == sorted(rows)


def test_tfidf_min_doc_tokens_gate(spark):
    df = spark.createDataFrame(
        [(1, "long document with many tokens here"),
         (2, "tiny")],
        "doc_id long, text string")
    out = tfidf_keywords(df, top_n=1, min_doc_tokens=3).collect()
    assert {r.doc_id for r in out} == {1}


def test_bm25_plan_shape(corpus):
    """The scale contract: no explode, no data-sized shuffle — the
    only exchanges are the single-row stats aggregate and its
    broadcast back."""
    plan = bm25_rank(corpus, ["join"], persist_doc_stats=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan          # no explode
    assert "BroadcastExchange" in plan     # stats row broadcast
    # no doc- or term-keyed hash exchange; only the SinglePartition
    # gather beneath the global aggregate
    assert "hashpartitioning" not in plan
