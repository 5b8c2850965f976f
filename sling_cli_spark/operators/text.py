"""Text analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (shingle rolling hash). Everything is built-in
Catalyst expressions over the ``documents`` table — narrow projections that
scan once and push column pruning into parquet; no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small high-frequency stopword sets per language (heuristic lang-id)
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _lower_tokens(text: Column) -> Column:
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), "[^a-z\\s]", " ")), "\\s+")


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language."""
    toks = _lower_tokens(text)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(text: Column) -> Column:
    """Pick the language whose stopwords hit most (ties -> first of
    en/de/fr/es; zero hits -> 'unknown')."""
    hits = [(lang, stopword_hits(text, lang)) for lang in _STOPWORDS]
    best_lang, best_cnt = F.lit("unknown"), F.lit(0)
    # iterate in reverse so earlier languages win ties
    for lang, cnt in reversed(hits):
        cond = cnt > best_cnt if lang != "en" else cnt >= F.greatest(best_cnt, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(cond, cnt).otherwise(best_cnt)
    return best_lang


def token_count(text: Column) -> Column:
    """BPE-ish token count via regexp matches (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(_TOKEN_RE), 0)).cast("long")


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+")))


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-document stats: chars, words, lines, punct/alpha/space ratios,
    mean word length. All SQL-expressible (oracle-checkable)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = whitespace_token_count(t)
    stripped_alpha = F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    stripped_punct = F.length(F.regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    stripped_space = F.length(F.regexp_replace(t, "\\s", ""))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.size(F.split(t, "\n")).cast("long").alias("n_lines"),
        F.round((n_chars - stripped_punct) / F.greatest(n_chars, F.lit(1)), 4)
        .alias("punct_ratio"),
        F.round((n_chars - stripped_alpha) / F.greatest(n_chars, F.lit(1)), 4)
        .alias("alpha_ratio"),
        F.round((n_chars - stripped_space) / F.greatest(n_chars, F.lit(1)), 4)
        .alias("space_ratio"),
        F.round(stripped_space / F.greatest(n_words, F.lit(1)), 4)
        .alias("mean_word_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_chars: int = 50, max_chars: int = 100_000,
) -> DataFrame:
    """Heuristic quality score in [0,1]: length window, punctuation sanity,
    stopword presence, word-length sanity — the classic cheap pre-filters
    (Gopher/C4-style rules) as one projection."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = whitespace_token_count(t)
    mean_wl = (F.length(F.regexp_replace(t, "\\s", ""))
               / F.greatest(n_words, F.lit(1)))
    punct = (n_chars - F.length(F.regexp_replace(t, "[^A-Za-z0-9\\s]", ""))) \
        / F.greatest(n_chars, F.lit(1))
    sw = stopword_hits(t, "en") / F.greatest(n_words, F.lit(1))
    len_ok = (n_chars >= min_chars) & (n_chars <= max_chars)
    wl_ok = (mean_wl >= 2) & (mean_wl <= 12)
    punct_ok = punct <= 0.3
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(wl_ok, 0.2).otherwise(0.0)
        + F.when(punct_ok, 0.2).otherwise(0.0)
        + F.least(F.round(sw * 2, 4), F.lit(0.2))
    )
    return df.select(
        F.col(id_col),
        F.round(score, 4).alias("quality"),
        len_ok.alias("len_ok"), wl_ok.alias("wl_ok"), punct_ok.alias("punct_ok"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3, hasher=None,
) -> DataFrame:
    """Document fingerprint: min/max rolling shingle hash + full-text hash.

    The (min,max) shingle-hash pair is a cheap 'winnowing-lite' signature:
    robust to small edits at the ends, usable as a blocking key.

    Plan: the MinHash pipeline's posexplode + window-lead shingle rows
    (shingle_table) -> shingle hash (xxhash64 by default; pass
    dedup.md5_hash60 for oracle reproducibility) -> one hash-aggregate
    on the doc id, then an id-equi-join back for the full-text hash. Array higher-order
    functions (``transform(shingles, xxhash64)`` + array_min/max, or the
    sequence+slice shingle builder) run INTERPRETED outside whole-stage
    codegen and measured ~2x slower at sf0.1 — same lesson as dedup.py.
    Docs with no shingle rows (empty text) keep null min/max hashes.
    """
    from sling_cli_spark.operators.dedup import normalize_text, shingle_table

    hasher = hasher if hasher is not None else F.xxhash64
    hashes = (
        shingle_table(df, text_col, id_col, shingle_n)
        .groupBy(id_col)
        .agg(
            F.min(hasher(F.col("shingle"))).alias("min_shingle_hash"),
            F.max(hasher(F.col("shingle"))).alias("max_shingle_hash"),
        )
    )
    base = df.select(
        F.col(id_col),
        hasher(normalize_text(F.col(text_col))).alias("text_hash"),
    )
    return base.join(hashes, on=id_col, how="left")


def _ngram_terms(toks, n: int):
    """Token array -> ``n``-gram term array (n=1 is the tokens
    themselves). sequence(1, 0) would generate DESCENDING [1, 0] —
    short docs (fewer than n tokens) must yield an empty array."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 50, n=1,
) -> DataFrame:
    """Corpus vocabulary analysis: the ``k`` most frequent lowercase
    word ``n``-grams, ties broken by term. ``n`` may be an int ->
    (term, cnt), or a sequence of gram sizes -> (n, term, cnt) with
    the per-size top-k computed in ONE pass over the corpus. The
    standard pre-training corpus health check (boilerplate phrases,
    templating artifacts, vocabulary skew) — reference has no twin;
    this extends the engine's text-analysis surface (SURVEY.md §2.10).

    100 TB posture: tokenization + n-gram construction are pure
    Catalyst array expressions (no UDFs); all gram sizes explode from
    one tokenization into one codegen hash aggregate whose map-side
    partials shrink the shuffle to one row per distinct (n, term) per
    task; the top-k is TakeOrderedAndProject (int ``n``) or a
    WindowGroupLimit-pruned rank (multi ``n``) over the
    vocabulary-sized aggregate — no full sort, no driver collect.
    The scan prefix is spread via :func:`~.dedup.spread_small_input`:
    the explode + partial aggregate IS the expensive per-row work and
    sits before the first shuffle (measured ~4x on a one-file corpus;
    a no-op once the input has >= parallelism partitions)."""
    from pyspark.sql import Window

    from sling_cli_spark.operators.dedup import spread_small_input

    single = isinstance(n, int)
    ns = (n,) if single else tuple(n)
    # token array as a REAL column before the n-gram lambdas: subexpr
    # elimination is off inside HOF lambdas, so an inline tokenization
    # would re-split the text per slice() call — quadratic in doc
    # length (r11; same fix as training._hashed_ngram_buckets)
    tokd = spread_small_input(df).select(
        F.filter(_lower_tokens(F.col(text_col)),
                 lambda t: t != "").alias("__tk"))
    toks = F.col("__tk")

    def _tag(i):  # closure factory: HOF lambdas must take exactly 1 arg
        return lambda t: F.struct(F.lit(i).alias("n"), t.alias("term"))

    tagged = F.flatten(F.array(*[
        F.transform(_ngram_terms(toks, i), _tag(i)) for i in ns]))
    agg = (tokd
           .select(F.explode(tagged).alias("g"))
           .select("g.n", "g.term")
           .groupBy("n", "term").agg(F.count("*").alias("cnt")))
    if single:
        return agg.select("term", "cnt") \
            .orderBy(F.col("cnt").desc(), "term").limit(k)
    w = Window.partitionBy("n").orderBy(F.col("cnt").desc(), "term")
    return (agg.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("n", "term", "cnt"))


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    vocab_size: int = 50_000, vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram surprisal -> (id, n_scored_tokens,
    mean_nll): the average -ln p(token) under the corpus's own add-one-
    smoothed top-``vocab_size`` unigram LM (out-of-vocabulary tokens
    take the smoothing floor 1/(N+V+1)). The classic cheap
    quality-filter signal — documents far from the corpus distribution
    (gibberish: high; boilerplate: low) — used where a real LM
    perplexity filter would run (CCNet-style), without a model
    dependency.

    ``vocab_df`` lets a SCORING corpus reuse a reference corpus's LM
    (term, cnt rows, e.g. a persisted :func:`vocab_topk` output).

    100 TB posture: the LM is the vocabulary-capped aggregate (one
    explode + codegen hash agg, same shape as vocab_topk) and joins
    the exploded corpus on the term — an equi-join Spark broadcasts
    while the capped vocab fits (50k rows ~ MBs); per-doc means are
    one keyed aggregate. Everything is Catalyst; fractions stay exact
    until one final ln()."""
    from sling_cli_spark.operators.dedup import spread_small_input

    if vocab_df is None:
        # persisted: the LM aggregate feeds BOTH the total-count
        # collect and the broadcast join — without it the full corpus
        # tokenize+aggregate would run twice. Tracked: released by
        # caching.release_operator_caches() (caller contract).
        from sling_cli_spark.caching import persist_tracked

        vocab_df = persist_tracked(
            vocab_topk(df, text_col, k=vocab_size, n=1))
    n_total = vocab_df.agg(F.sum("cnt")).collect()[0][0] or 0
    denom = float(n_total + vocab_size + 1)  # add-one over V + one OOV bin

    toks = F.filter(_lower_tokens(F.col(text_col)), lambda t: t != "")
    exploded = spread_small_input(df).select(
        F.col(id_col), F.explode(toks).alias("term"))
    lm = vocab_df.select(
        "term",
        (-F.log((F.col("cnt") + F.lit(1.0)) / F.lit(denom))).alias("__nll"))
    floor = -float(__import__("math").log(1.0 / denom))
    return (exploded
            .join(F.broadcast(lm), on="term", how="left")
            .withColumn("__nll", F.coalesce(F.col("__nll"), F.lit(floor)))
            .groupBy(id_col)
            .agg(F.count("*").alias("n_scored_tokens"),
                 F.avg("__nll").alias("mean_nll")))


#: the membership stopwords of Gopher's "has real language" rule
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1, max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3, min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Table A1 — the published
    heuristics): word-count window, mean-word-length window,
    symbol-to-word ratio (# and ellipsis), bullet-start and
    ellipsis-end line fractions, alphabetic-word fraction, and the
    two-distinct-stopwords language check. Returns every measured
    signal plus per-rule booleans and the overall ``pass`` — callers
    filter on ``pass`` or audit individual rules.

    100 TB posture: one pure-Catalyst projection (splits, array
    filters, regexp_count) — zero UDFs, zero shuffles, text is the
    only column read."""
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(t, "\\s+", " "))
    words = F.when(F.length(norm) == 0,
                   F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.length(F.regexp_replace(t, "\\s", "")) / safe_n
    n_symbols = F.regexp_count(t, F.lit("#|\\.\\.\\.|…"))
    symbol_ratio = n_symbols / safe_n
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(F.filter(
        lines, lambda l: F.trim(l).startswith("-")
        | F.trim(l).startswith("*") | F.trim(l).startswith("•"))) / n_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda l: F.trim(l).endswith("...")
        | F.trim(l).endswith("…"))) / n_lines
    alpha_frac = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))) / safe_n
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPS])
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)), stops))

    rules = {
        "ok_words": (n_words >= min_words) & (n_words <= max_words),
        "ok_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbols": symbol_ratio <= max_symbol_ratio,
        "ok_bullets": bullet_frac <= max_bullet_frac,
        "ok_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha": alpha_frac >= min_alpha_frac,
        "ok_stops": stop_hits >= min_stop_hits,
    }
    passed = F.lit(True)
    for c in rules.values():
        passed = passed & c
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_frac"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        *[c.alias(name) for name, c in rules.items()],
        passed.alias("pass"),
    )

# ----------------------------------------------------------------------
# URL canonicalization + dedup (r11 — the Dolma/CCNet URL-dedup
# preprocessing step: crawls re-fetch the same page under tracking
# params, mixed-case hosts, default ports, and param-order jitter)

_TRACKING_NAMES = ("fbclid", "gclid", "mc_cid", "mc_eid", "igshid",
                   "ref_src")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL — pure Catalyst (regexp_extract /
    split / array_sort), reproducible verbatim in any SQL engine:

    - scheme + host lowercase; default ports stripped (:80 for http,
      :443 for https)
    - fragment stripped; trailing path slashes stripped ('' and '/'
      are the same resource)
    - tracking params dropped (name starts with ``utm_`` or is one of
      fbclid/gclid/mc_cid/mc_eid/igshid/ref_src); survivors SORTED so
      param order never distinguishes two fetches of one page
    """
    u = F.trim(url)
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(scheme == "http",
                  F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        "/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    def _kept(p: Column) -> Column:
        name = F.substring_index(p, "=", 1)
        cond = (p != "") & ~name.startswith("utm_")
        for t in _TRACKING_NAMES:
            cond = cond & (name != t)
        return cond

    params = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), _kept)), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(params != "", F.concat(F.lit("?"), params))
        .otherwise(F.lit("")))


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE document per canonical URL (the lowest id — the
    first-fetch convention). One projection + one map-side-combining
    groupBy(canonical) into a min(id) keeper set + a semi-join back —
    the exact-dedup shape keyed by canonical URL, never a window over
    URL partitions (a hot page with millions of re-fetches must not
    sort in one task)."""
    canon = df.withColumn("canonical_url",
                          canonicalize_url(F.col(url_col)))
    keep = canon.groupBy("canonical_url") \
        .agg(F.min(F.col(id_col)).alias(id_col))
    return canon.join(keep, [id_col, "canonical_url"], "left_semi")


# --------------------------------------------------------------------------
# fastText-style hashed linear quality classifier (beyond-reference §2.10)

# Weyl-sequence stand-in for trained coefficients: deterministic,
# engine-agnostic integer arithmetic (bucket * odd constant, fits well
# under 2^63 for any realistic bucket count), mapped to [-0.5, 0.5).
_WEYL = 2654435761


def _bucket_weight(b: Column, n_buckets: int) -> Column:
    return (F.pmod(b * F.lit(_WEYL), F.lit(n_buckets))
            .cast("double") / F.lit(float(n_buckets))) - F.lit(0.5)


def classifier_score(
    df: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[int, float] | None = None,
) -> DataFrame:
    """fastText-style hashed linear scorer (Joulin et al. 2016, public):
    ``score = sigmoid(mean over unigram+bigram grams of w[h(gram) % B])``
    — the standard "model-based quality filter" stage of a training-data
    pipeline (CCNet/RedPajama score-and-threshold).

    ``weights`` maps bucket -> coefficient from a real training run
    (applied as a broadcast map literal); when omitted, a deterministic
    Weyl-sequence weight stands in so any engine reproduces the exact
    scores (the DuckDB oracle twin recomputes it with the same integer
    arithmetic).

    100 TB shape: ZERO explode, ZERO shuffle — tokenization, hashed
    bucketing, and the weighted mean are all array projections inside
    whole-stage codegen (``F.aggregate`` folds the gram array
    sequentially, so summation order is reproducible cross-engine).
    One corpus scan, column-pruned to (id, text)."""
    from sling_cli_spark.operators.training import (
        _hashed_ngram_buckets, _tokens)

    toks = _tokens(F.col(text_col))
    out = df.select(F.col(id_col), toks.alias("__tk")) \
        .where(F.size(F.col("__tk")) > 0)
    buckets = _hashed_ngram_buckets(F.col("__tk"), n_buckets)
    if weights is None:
        def w(b: Column) -> Column:
            return _bucket_weight(b, n_buckets)
    else:
        wmap = F.create_map(
            *[F.lit(x) for k, v in sorted(weights.items())
              for x in (k, float(v))])

        def w(b: Column) -> Column:
            return F.coalesce(wmap[b], F.lit(0.0))

    mean = (F.aggregate(buckets, F.lit(0.0),
                        lambda acc, b: acc + w(b))
            / F.size(buckets).cast("double"))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6)
    return out.select(F.col(id_col), score.alias("quality_score"))


# --------------------------------------------------------------------------
# unicode normalization (beyond-reference §2.10: normalize-before-dedup)

def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) — the
    canonicalization step that runs BEFORE any hashing/dedup stage so
    byte-different but canonically-equal strings (composed vs combining
    accents, fullwidth forms) collapse to one representation (Dolma/
    CCNet preprocessing).

    Spark has no normalization builtin, so this is the documented
    Arrow-batched pandas-UDF slow path: one scalar UDF over the text
    column only — every other column passes through untouched, and the
    scan stays column-pruned. Null-safe (None -> None)."""
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    def _norm_fn(s):
        # pandas' vectorized normalizer (null-safe: None stays None) —
        # no per-element Python lambda in the batch hot loop
        return s.str.normalize(form)

    # explicit (non-string) annotations: `from __future__ import
    # annotations` stringifies inline hints and pandas_udf can't
    # resolve them against a function-local pandas import
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))
