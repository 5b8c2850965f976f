"""Training-data prep operators (operators/training.py): chunking,
stratified sampling, repetition stats, PII redaction."""

import pytest
from pyspark.sql import functions as F

from sling_cli_spark.operators.training import (
    chunk_documents, pii_redact, repetition_stats, shard_assign,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(1, 151))  # 150 tokens
    df = _docs(spark, [(1, text)])
    out = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    # stride 48: windows [1,64],[49,112],[97,150]
    assert out[0]["chunk_text"].startswith("t1 ") and \
        out[0]["chunk_text"].endswith(" t64")
    assert out[1]["chunk_text"].startswith("t49 ")
    assert out[2]["chunk_text"].endswith(" t150")
    assert [r["n_tokens"] for r in out] == [64, 64, 54]
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert out[0]["chunk_text"].split()[-16:] == \
        out[1]["chunk_text"].split()[:16]


def test_chunk_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "a b c"), (2, ""), (3, "   ")])
    out = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    assert len(out) == 1  # empty/whitespace docs contribute nothing
    assert out[0]["doc_id"] == 1 and out[0]["chunk_text"] == "a b c"
    assert out[0]["n_tokens"] == 3


def test_chunk_no_redundant_trailing_window(spark):
    # 66 tokens, chunk 64 / overlap 16 -> window 2 would start at 49
    # and only reach token 66 = 18 new tokens; window 3 (start 97) must
    # not exist
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(66)))])
    out = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert [r["chunk_id"] for r in out] == [0, 1]
    assert out[1]["n_tokens"] == 18


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=8, overlap=8)


def test_stratified_sample_deterministic_and_capped(spark):
    df = spark.range(0, 1000).selectExpr(
        "id as doc_id", "concat('d', id) as text",
        "case when id % 3 = 0 then 'en' else 'de' end as lang")
    a = stratified_sample(df, "lang", 50)
    b = stratified_sample(df, "lang", 50)
    ra = {(r["doc_id"]) for r in a.collect()}
    rb = {(r["doc_id"]) for r in b.collect()}
    assert ra == rb  # deterministic
    counts = {r["lang"]: r["n"] for r in
              a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 50, "de": 50}
    # strata smaller than the cap survive whole
    small = stratified_sample(df.filter("doc_id < 30"), "lang", 50)
    assert small.count() == 30


def test_repetition_stats(spark):
    df = _docs(spark, [
        (1, "x\ny\nx"),              # 3 lines, 1 dup
        (2, "a a a a"),              # 4 tokens, 3 dups
        (3, "all unique lines"),
    ])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[2]["n_tokens"] == 4
    assert got[2]["dup_token_frac"] == pytest.approx(0.75)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["dup_token_frac"] == 0.0


def test_pii_redact_spans_and_counts(spark):
    df = _docs(spark, [
        (1, "mail bob@x.io and jo.ann@sub.dom.org now"),
        (2, "server 10.0.255.3 called 555-867-5309 x"),
        (3, "clean text"),
    ])
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert got[1]["text"] == "mail <EMAIL> and <EMAIL> now"
    assert got[1]["n_email"] == 2 and got[1]["n_ip"] == 0
    assert got[2]["text"] == "server <IP> called <PHONE> x"
    assert got[2]["n_ip"] == 1 and got[2]["n_phone"] == 1
    assert got[3]["text"] == "clean text"
    assert got[3]["n_email"] == got[3]["n_ip"] == got[3]["n_phone"] == 0


def test_pii_email_host_not_eaten_by_ip(spark):
    # a numeric mail host must redact as ONE email, not email+IP
    df = _docs(spark, [(1, "a@1.2.3.4x.com b")])
    r = pii_redact(df).collect()[0]
    assert r["n_email"] == 1 and "<EMAIL>" in r["text"]


def test_chunk_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan2 = repetition_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan2


def test_shard_assign_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).selectExpr("id as doc_id")
    a = shard_assign(df, n_shards=8, seed=1)
    rows = a.collect()
    assert {r["shard"] for r in rows} == set(range(8))
    # deterministic across runs
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in shard_assign(df, n_shards=8, seed=1).collect()}
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} == b
    # a different seed permutes
    c = {(r["doc_id"], r["shard"]) for r in
         shard_assign(df, n_shards=8, seed=2).collect()}
    assert {(r["doc_id"], r["shard"]) for r in rows} != c
    # positions are 1..len(shard) within each shard
    from collections import defaultdict
    per = defaultdict(list)
    for r in rows:
        per[r["shard"]].append(r["pos"])
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # roughly balanced (8 shards x 2000 rows: no shard > 2x mean)
    assert max(len(p) for p in per.values()) < 2 * (2000 / 8)


def test_chunk_invariants_sweep(spark):
    """Reconstruction invariant over a sweep of doc lengths and window
    shapes: stripping each chunk's overlap prefix (past chunk 0) and
    concatenating reproduces the document exactly — no token lost, none
    duplicated, windows in order."""
    for chunk, overlap in ((8, 2), (16, 15), (5, 0), (64, 16)):
        docs = [(n, " ".join(f"w{i}" for i in range(n)))
                for n in range(0, 140, 7)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["n_tokens"]))
        for n, text in docs:
            chunks = sorted(by_doc.get(n, []))
            if n == 0:
                assert chunks == []
                continue
            assert [c[0] for c in chunks] == list(range(len(chunks)))
            rebuilt = []
            for cid, ctext, ntok in chunks:
                toks = ctext.split(" ")
                assert len(toks) == ntok  # n_tokens matches the text
                rebuilt.extend(toks if cid == 0 else toks[overlap:])
            assert rebuilt == text.split(" "), (chunk, overlap, n)


# ---------------------------------------------------------------- round 7

def test_decontaminate_drop_and_flag(spark):
    from sling_cli_spark.operators.training import decontaminate

    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a completely different sentence about databases"),
        (3, "we all know the quick brown fox story well"),   # shares 3-gram
        (4, None),                                           # null survives
        (5, "short text"),                                   # < 3 tokens
    ], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "quick brown fox running")], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(docs, ev, n=3).collect()}
    assert kept == {2, 4, 5}  # 1 and 3 share "quick brown fox"

    flagged = {r["doc_id"]: r["contaminated"]
               for r in decontaminate(docs, ev, n=3, mode="flag").collect()}
    assert flagged == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_decontaminate_short_eval_gram(spark):
    """An eval doc shorter than n tokens contributes its full text as
    the gram — it can only hit docs with the identical short text."""
    from sling_cli_spark.operators.training import decontaminate

    docs = spark.createDataFrame([
        (1, "hello world"), (2, "hello world again and again"),
    ], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "hello world")], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(docs, ev, n=3).collect()}
    assert kept == {2}  # doc 2's grams are 3-grams, never "hello world"


def test_pack_sequences_boundaries(spark):
    from sling_cli_spark.operators.training import pack_sequences

    rows = [(1, i, 60) for i in range(10)]  # 600 tokens in 60s
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, n_tokens long")
    out = {r["chunk_id"]: (r["seq_id"], r["seq_offset"], r["end_seq_id"])
           for r in pack_sequences(
               df, seq_len=128, order_cols=["doc_id", "chunk_id"]).collect()}
    # chunk 0: tokens [0,60) -> seq 0; chunk 2: [120,180) straddles 128
    assert out[0] == (0, 0, 0)
    assert out[1] == (0, 60, 0)
    assert out[2] == (0, 120, 1)   # straddles the first boundary
    assert out[3] == (1, 52, 1)
    assert out[9] == (4, 28, 4)    # 540..600 -> seq 4


def test_pack_sequences_sharded_parallel(spark):
    """Packing restarts at token 0 inside each shard and is independent
    across shards (the keyed-window contract)."""
    from sling_cli_spark.operators.training import pack_sequences

    rows = [("a", 1, 100), ("a", 2, 100), ("b", 1, 100)]
    df = spark.createDataFrame(rows, "shard string, cid int, n_tokens long")
    out = {(r["shard"], r["cid"]): (r["seq_id"], r["seq_offset"])
           for r in pack_sequences(
               df, seq_len=150, shard_col="shard",
               order_cols=["cid"]).collect()}
    assert out[("a", 1)] == (0, 0)
    assert out[("a", 2)] == (0, 100)
    assert out[("b", 1)] == (0, 0)  # shard b starts fresh


def test_mix_corpora_weights_and_determinism(spark):
    from sling_cli_spark.operators.training import mix_corpora

    a = spark.range(1000).selectExpr("id AS doc_id")
    b = spark.range(1000, 1200).selectExpr("id AS doc_id")
    out = mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 2.0})
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault((r["source"], r["epoch"]), set()).add(r["doc_id"])
    # b at weight 2.0: two FULL epochs, no remainder
    assert by[("b", 0)] == set(range(1000, 1200))
    assert by[("b", 1)] == set(range(1000, 1200))
    assert ("b", 2) not in by
    # a at 0.5: one Bernoulli epoch, roughly half, deterministic
    n = len(by[("a", 0)])
    assert 400 < n < 600
    again = mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 2.0}).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in rows}
    # different seed -> different membership
    other = mix_corpora({"a": a}, {"a": 0.5}, seed=99)
    assert {r["doc_id"] for r in other.collect()} != by[("a", 0)]

    import pytest
    with pytest.raises(ValueError, match="negative"):
        mix_corpora({"a": a}, {"a": -1.0}).collect()
    with pytest.raises(ValueError, match="positive weight"):
        mix_corpora({"a": a}, {"a": 0.0})


def test_c4_line_filter_rules(spark):
    from sling_cli_spark.operators.training import c4_line_filter

    good = ("A first proper sentence with enough words here.\n"
            "tiny line.\n"
            "Another complete sentence that also qualifies today!\n"
            "And a third one finishes the page correctly?")
    df = spark.createDataFrame([
        (1, good),                                    # keeps 3 lines
        (2, good + "\nlorem ipsum dolor"),            # page gate: lorem
        (3, good + "\nvar x = { a: 1 }"),             # page gate: brace
        (4, "No punctuation line here at all\nshort."),  # < 3 kept
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["kept"] is True and out[1]["n_kept"] == 3
    assert "tiny line." not in out[1]["clean_text"]   # < 5 words drops
    assert out[2]["kept"] is False                    # lorem ipsum
    assert out[3]["kept"] is False                    # curly brace
    assert out[4]["kept"] is False and out[4]["n_kept"] == 0
    assert out[4]["clean_text"] == ""


def test_token_budget_select(spark):
    """r10: fill a token budget with the best-scoring docs — greedy by
    score desc with deterministic id tie-break; the first doc always
    qualifies; per-stratum budgets with strata_col."""
    from sling_cli_spark.operators.training import token_budget_select

    df = spark.createDataFrame([
        (1, "a b c d", 0.9, "en"),        # 4 tokens
        (2, "e f", 0.8, "en"),            # 2
        (3, "g h i j k l", 0.7, "en"),    # 6
        (4, "m n o", 0.95, "de"),         # 3
    ], "doc_id long, text string, q double, lang string")
    got = {r.doc_id: (r.n_tokens, r.cum_tokens) for r in
           token_budget_select(df, 7, score_col="q").collect()}
    # order by q desc: 4(3), 1(4) -> cum 7; 2 would hit 9 -> out
    assert got == {4: (3, 3), 1: (4, 7)}
    # budget smaller than the best doc: that doc still returns
    got = {r.doc_id for r in
           token_budget_select(df, 1, score_col="q").collect()}
    assert got == {4}
    # per-stratum budgets
    got = {r.doc_id for r in token_budget_select(
        df, 6, score_col="q", strata_col="lang").collect()}
    assert got == {4, 1, 2}  # en: 1(4)+2(2)=6; de: 4(3)
    # no score: stable md5 order, reproducible
    a = [r.doc_id for r in token_budget_select(df, 6).collect()]
    b = [r.doc_id for r in token_budget_select(df, 6).collect()]
    assert a == b and a


def test_token_budget_global_two_phase_matches_single_window(spark):
    """r11 (closes the r10 verdict's weak item): the global (no-strata)
    mode is a bucketed two-phase cumulative sum, never a global window.
    It must be byte-identical to the naive SUM() OVER (ORDER BY ...)
    form, and its physical plan must contain no SinglePartition
    exchange over the corpus-sized frame."""
    from pyspark.sql.window import Window

    from sling_cli_spark.operators.training import token_budget_select

    rows = [(i, " ".join(["t"] * (1 + i % 17)),
             float((i * 37) % 101), "en") for i in range(500)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, q double, lang string")

    def reference(score_col):
        n_tok = F.size(F.split(F.col("text"), r"\s+"))
        order = ([F.col(score_col).desc()] if score_col
                 else [F.md5(F.col("doc_id").cast("string"))])
        w = Window.partitionBy().orderBy(*order, F.col("doc_id")) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (df.withColumn("n_tokens", n_tok.cast("long"))
                .withColumn("cum_tokens",
                            F.sum("n_tokens").over(w).cast("long"))
                .filter((F.col("cum_tokens") <= 900) |
                        (F.col("cum_tokens") == F.col("n_tokens"))))

    for score in ("q", None):
        got = {(r.doc_id, r.n_tokens, r.cum_tokens) for r in
               token_budget_select(df, 900, score_col=score).collect()}
        want = {(r.doc_id, r.n_tokens, r.cum_tokens) for r in
                reference(score).collect()}
        assert got == want and got, f"score_col={score}"

    # plan shape: the only SinglePartition exchange allowed is the one
    # over the <=256-row bucket-totals frame (its window sorts __bkt);
    # a SinglePartition exchange feeding a Window over the DATA frame
    # (ordering by the score/md5 key) is the r10 defect.
    plan = token_budget_select(
        df, 900, score_col="q")._jdf.queryExecution().executedPlan() \
        .toString()
    import re
    for m in re.finditer(r"Exchange SinglePartition[\s\S]{0,400}", plan):
        seg = m.group(0)
        assert "__btot" in seg or "__bkt" in seg, (
            "SinglePartition exchange over the data frame:\n" + seg)


def test_dsir_select_prefers_target_like_docs(spark):
    """r11: DSIR importance resampling — docs whose hashed-ngram
    profile matches the target corpus outrank off-domain docs; the
    selection is deterministic and reproducible."""
    from sling_cli_spark.operators.training import dsir_select

    raw = spark.createDataFrame([
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "quantum flux capacitor regression tensor"),
        (4, "stochastic gradient descent tensor calculus"),
        (5, "the cat and the dog sat"),
    ], "doc_id long, text string")
    target = spark.createDataFrame([
        (101, "the cat sat quietly"),
        (102, "a dog sat on a mat"),
    ], "doc_id long, text string")

    kw = dict(n_buckets=512, smoothing=0.01)  # tiny corpus: light smoothing
    got = dsir_select(raw, target, 2, **kw)
    ids = {r.doc_id for r in got.collect()}
    assert ids <= {1, 2, 5} and len(ids) == 2, ids
    # deterministic: same call, same set and scores
    again = dsir_select(raw, target, 2, **kw)
    assert {(r.doc_id, r.dsir_score) for r in got.collect()} == \
        {(r.doc_id, r.dsir_score) for r in again.collect()}
    # off-domain docs score below in-domain ones
    scores = {r.doc_id: r.dsir_score
              for r in dsir_select(raw, target, 5, **kw).collect()}
    assert min(scores[1], scores[2], scores[5]) > \
        max(scores[3], scores[4])
    # n_docs larger than the corpus returns everything
    assert dsir_select(raw, target, 99, **kw).count() == 5


def test_dsir_single_and_empty_docs_no_error(spark):
    """sequence(1,0) descends in Spark — single-token and empty docs
    must featurize without an ANSI element_at(_, 0) error."""
    from sling_cli_spark.operators.training import dsir_select

    raw = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string")
    tgt = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    got = dsir_select(raw, tgt, 3, n_buckets=64, smoothing=0.01)
    # the empty doc has no grams -> no score row -> excluded
    assert {r.doc_id for r in got.collect()} == {1, 3}
