"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs both:

- brute_force_topk: exact cosine top-k of the corpus against a (small)
  query set. The query side broadcasts; the corpus streams through one
  narrow projection (zip_with dot product) + a per-query top-k window.
  Exact, and the right baseline for recall measurement.
- lsh_topk: random-hyperplane LSH — corpus and queries bucket by sign
  pattern; candidates meet only inside buckets, so the join is
  equi-keyed and shuffle-partitioned instead of a cross product. The
  scale path: cost ~ corpus * (1/2^bits) per probe.

All arithmetic is Catalyst array expressions (zip_with / aggregate) —
JVM-side, codegen'd, no Python on the data path — except the IVF
codebook assignment, which is a vectorized (Arrow-batched) pandas UDF
doing one numpy matmul per batch.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf resolves stringified hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic pseudo-random hyperplanes, same trick as dedup._hash_coeffs
_LCG_A, _LCG_C = 6364136223846793005, 1442695040888963407


def _hyperplanes(num_planes: int, dim: int, seed: int = 11) -> list[list[float]]:
    planes, state = [], seed
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            state = (state * _LCG_A + _LCG_C) % (1 << 63)
            v.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(v)
    return planes


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. -> (query_id, vec_id, score).

    The cross join broadcasts the query side (must be small — that is the
    contract of a batch ANN probe); the corpus side never shuffles. Top-k
    via window over query partitions: one shuffle on query_id, whose
    cardinality = number of queries.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"))
    scored = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv")
    ).crossJoin(F.broadcast(q)).withColumn(
        "score", cosine(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (random-hyperplane LSH) as a bigint."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in p])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id", num_planes: int = 8, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Both sides add a bucket key (narrow projection), then an equi-join on
    the bucket — at scale this is one hash-partitioned join where each
    task sees ~corpus/2^planes rows, instead of a full cross product.
    Recall is tuned by num_planes (fewer planes = bigger buckets).
    """
    planes = _hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket"))
    scored = c.join(q, on="__bucket").withColumn(
        "score", cosine(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def _pair_dot_udf():
    """Arrow-batched numpy dot product over pair rows — one matmul-shaped
    einsum per batch instead of an interpreted zip_with/aggregate lambda
    per pair (the HOF path measured ~2x slower on the sf0.1 pair table;
    the gap grows with pair count)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return pair_dot


def pairwise_within_label(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    group_col: str = "label", threshold: float = 0.9,
) -> DataFrame:
    """All near-pairs within a grouping key (embedding-cosine near-dup).

    The group key plays the LSH-bucket role: the self-join is equi-keyed on
    it. For an unlabeled corpus, use hyperplane_bucket as the key first.

    Cost shape: norms are computed ONCE per vector before the join (O(n));
    the per-PAIR work (the O(n²/buckets) part) is a single Arrow-batched
    numpy dot — no interpreted array lambdas in the quadratic path.
    """
    pair_dot = _pair_dot_udf()
    a = df.select(
        F.col(group_col), F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"), norm(F.col(vec_col)).alias("na"))
    b = df.select(
        F.col(group_col), F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"), norm(F.col(vec_col)).alias("nb"))
    return (
        a.join(b, on=group_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score", pair_dot(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb")))
        .filter(F.col("score") >= threshold)
        .select(group_col, "id_a", "id_b", "score")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the coarse-quantizer scale path

def kmeans_centroids(
    df: DataFrame, vec_col: str = "embedding",
    n_clusters: int = 16, sample: int = 20_000, iters: int = 10,
    seed: int = 13,
):
    """Spherical k-means on a driver-side sample -> (k, d) numpy array of
    L2-normalized centroids.

    The sample is bounded (ANN codebooks train on samples at any corpus
    size — the standard IVF recipe); everything downstream is distributed.
    """
    import numpy as np

    # Arrow-batched collect (toPandas) — the row-object collect measured
    # ~2x slower for list<float> columns at the 20k-sample cap
    pdf = df.select(vec_col).limit(sample).toPandas()
    X = np.array(list(pdf[vec_col]), dtype=np.float64)
    return kmeans_np(X, n_clusters=n_clusters, iters=iters, seed=seed)


def kmeans_np(X, n_clusters: int = 16, iters: int = 10, seed: int = 13):
    """Deterministic spherical k-means core over a float64 (n, d)
    sample. Split out so the correctness oracle can retrain the
    IDENTICAL codebook from the raw parquet (same dtype, seed, and
    iteration order -> bit-identical centroids)."""
    import numpy as np

    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _assign_udf(centroids, n_probe: int = 1):
    """Vectorized pandas UDF: batch matmul against the broadcast codebook
    -> nearest cluster id(s). Arrow-batched, no per-row Python.

    Rows are NOT normalized before the matmul: the centroids are unit
    vectors and argmax/argsort of v·C_j is invariant to the positive
    per-row scale 1/||v|| — skipping it saves a pass AND keeps the dot
    values literally reproducible in the SQL oracle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    if n_probe == 1:
        @pandas_udf("int")
        def assign(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float64)
            return pd.Series(np.argmax(M @ C.T, axis=1))
        return assign

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        top = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(top))
    return probe


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_clusters: int = 16, n_probe: int = 4, centroids=None,
) -> DataFrame:
    """IVF ANN: corpus rows live in their nearest-centroid list; a query
    probes its n_probe nearest lists. The join is an equi-join on the
    cluster id — each task scores ~n_probe/n_clusters of the corpus
    instead of all of it. Recall is tuned by n_probe (=n_clusters gives
    exact brute force)."""
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, vec_col, n_clusters=n_clusters)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv"),
        _assign_udf(centroids)(F.col(vec_col)).alias("__cl"))
    if n_probe == 1:
        qcl = _assign_udf(centroids)(F.col(vec_col)).alias("__cl")
    else:
        qcl = F.explode(
            _assign_udf(centroids, n_probe)(F.col(vec_col))).alias("__cl")
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"), qcl)
    scored = c.join(F.broadcast(q), on="__cl").withColumn(
        "score", cosine(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def semdedup(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    n_clusters: int | None = 16, threshold: float = 0.9, centroids=None,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embeddings, then inside each
    cluster drop every row that is ≥ ``threshold`` cosine-similar to a
    LOWER-id row of the same cluster (the paper's keep-one-per-
    duplicate-group rule with a deterministic min-id keeper). Returns
    the survivors as (id, cluster).

    ``n_clusters=None`` self-scales the codebook to ~1 cluster per
    1024 rows (clamped [16, 8192]) — the paper's own cost knob. The
    pair stage is Σ cluster_size², so a FIXED k that was right at 2k
    vectors is quadratic ruin at 200k (measured in the r8 100× scale
    probe: k=8 ran >9min on 200k duplicate-heavy vectors; k=512
    finishes in seconds). Callers pinning k for oracle reproducibility
    own that scaling.

    100 TB posture: this is the embedding-space twin of MinHash-LSH —
    the codebook assignment makes the O(n²) similarity check
    equi-keyed on the cluster id (cost ~ Σ cluster_size², tuned by
    ``n_clusters``), the per-pair work is one Arrow-batched numpy dot,
    and nothing driver-side ever holds more than the bounded kmeans
    sample. Vectors are cast to float64 BEFORE the pair dot so the
    threshold decision is reproducible bit-for-bit in the DuckDB
    oracle (list_cosine_similarity over DOUBLE[]). The assigned table
    feeds THREE plan consumers (both pair sides + the survivor
    anti-join) — it persists so the scan + Arrow assignment run once,
    not per consumer (Catalyst does not canonicalize the identical
    subtrees to a ReusedExchange; same lesson as the r6 jaccard plan).
    """
    from sling_cli_spark.caching import persist_tracked

    if centroids is None:
        if n_clusters is None:
            n_clusters = max(16, min(8192, df.count() // 1024 or 16))
        centroids = kmeans_centroids(df, vec_col, n_clusters=n_clusters)
    base = persist_tracked(df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"),
        _assign_udf(centroids)(F.col(vec_col)).alias("__cl"),
    ))
    pair_dot = _pair_dot_udf()
    a = base.select(F.col("__cl"), F.col(id_col).alias("__id_a"),
                    F.col("__v").alias("__va"), norm("__v").alias("__na"))
    b = base.select(F.col("__cl"), F.col(id_col).alias("__id_b"),
                    F.col("__v").alias("__vb"), norm("__v").alias("__nb"))
    dupes = (
        a.join(b, on="__cl")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .withColumn("__s", pair_dot(F.col("__va"), F.col("__vb"))
                    / (F.col("__na") * F.col("__nb")))
        .filter(F.col("__s") >= threshold)
        .select(F.col("__id_b").alias(id_col))
        .distinct())
    return (base.join(dupes, on=id_col, how="left_anti")
            .select(F.col(id_col), F.col("__cl").alias("cluster")))


# ------------------------------------------------- product quantization

def kmeans_l2_np(X, n_clusters: int = 8, iters: int = 10, seed: int = 13):
    """Deterministic EUCLIDEAN k-means over a float64 (n, d) sample —
    the PQ sub-codebook trainer (unlike :func:`kmeans_np`, centroids
    are NOT normalized: PQ reconstructs magnitudes, so Lloyd updates
    keep the plain mean). Assignment minimizes ||x - c||^2 via the
    expansion ||c||^2 - 2 x.c (the per-row ||x||^2 is constant under
    argmin and dropped) — the EXACT formula the encode UDF and the SQL
    oracle replay, so a near-tie resolves identically everywhere.
    Split out so the correctness oracle can retrain the bit-identical
    codebook from the raw parquet."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)),
                        replace=False)].copy()
    for _ in range(iters):
        d = (cent * cent).sum(axis=1) - 2.0 * (X @ cent.T)
        assign = np.argmin(d, axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_codebooks(
    df: DataFrame, vec_col: str = "embedding", m: int = 4,
    ksub: int = 8, sample: int = 20_000, iters: int = 10,
    seed: int = 13,
):
    """Train ``m`` per-subspace codebooks of ``ksub`` centroids each on
    a bounded driver-side sample (the standard PQ recipe — codebooks
    train on samples at any corpus size; everything downstream is
    distributed). Returns a list of m (ksub, d/m) float64 arrays.
    Subspace ``s`` trains with seed ``seed + s`` so codebooks differ
    across subspaces deterministically."""
    import numpy as np

    pdf = df.select(vec_col).limit(sample).toPandas()
    X = np.array(list(pdf[vec_col]), dtype=np.float64)
    dsub = X.shape[1] // m
    if dsub * m != X.shape[1]:
        raise ValueError(
            f"pq: dim {X.shape[1]} not divisible by m={m} subspaces")
    return [kmeans_l2_np(X[:, s * dsub:(s + 1) * dsub],
                         n_clusters=ksub, iters=iters, seed=seed + s)
            for s in range(m)]


def _pq_encode_udf(codebooks):
    """Vectorized pandas UDF: batch matmul per subspace against the
    broadcast codebooks -> array of m code ids (argmin ||x_s - c||^2
    via the ||c||^2 - 2 x_s.c expansion). Arrow-batched — the corpus
    compresses to m small ints per vector in ONE pass, no per-row
    Python."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = [np.asarray(c, dtype=np.float64) for c in codebooks]
    cn = [(c * c).sum(axis=1) for c in C]
    dsub = C[0].shape[1]

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        codes = np.empty((len(M), len(C)), dtype=np.int32)
        for s, (cs, cns) in enumerate(zip(C, cn)):
            sub = M[:, s * dsub:(s + 1) * dsub]
            codes[:, s] = np.argmin(cns - 2.0 * (sub @ cs.T), axis=1)
        return pd.Series(list(codes))
    return encode


def _pq_lut_udf(codebooks):
    """Per-query ADC lookup table: lut[s][j] = q_s . C_s[j] — an
    (m, ksub) array column the SCORING stage consumes with pure
    Catalyst array ops. Runs over the (small, broadcast) query frame
    only."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = [np.asarray(c, dtype=np.float64) for c in codebooks]
    dsub = C[0].shape[1]

    @pandas_udf("array<array<double>>")
    def lut(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        out = []
        for row in M:
            out.append([list(row[s * dsub:(s + 1) * dsub] @ cs.T)
                        for s, cs in enumerate(C)])
        return pd.Series(out)
    return lut


def pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id",
    m: int = 4, ksub: int = 8, codebooks=None,
    refine: int | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011) for max-inner-product:
    the corpus encodes ONCE to m sub-codebook ids (m bytes/vector at
    ksub<=256 — a 64-dim float corpus compresses 64x), each query
    precomputes an (m, ksub) dot-product lookup table, and the
    asymmetric-distance score  sum_s lut[s][code_s]  is a pure
    Catalyst zip_with/aggregate over the broadcast query set — the
    scan side never touches floats again, so at 100 TB the scoring
    pass reads m ints per row instead of the full vector. Exactness is
    traded for compression (scores are quantized); brute_force_topk is
    the recall baseline.

    ``refine`` (the standard IVF-PQ re-ranking step): take the ADC
    top-``refine`` candidates per query, re-score ONLY those against
    the true vectors (exact cosine — one broadcast semi-join back
    into the corpus, nq*refine rows, never the full scan), return the
    exact top-k. Buys back quantization error at the cost of reading
    nq*refine real vectors instead of zero."""
    if codebooks is None:
        codebooks = pq_codebooks(corpus, vec_col, m=m, ksub=ksub)
    codes = corpus.select(
        F.col(id_col),
        _pq_encode_udf(codebooks)(F.col(vec_col)).alias("__code"))
    q = queries.select(
        F.col(query_id_col),
        _pq_lut_udf(codebooks)(F.col(vec_col)).alias("__lut"))
    scored = codes.crossJoin(F.broadcast(q)).withColumn(
        "score",
        F.aggregate(
            F.expr("zip_with(__code, __lut, (c, l) -> l[c])"),
            F.lit(0.0), lambda acc, x: acc + x))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col))
    adc = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= (refine or k))
        .select(query_id_col, id_col, "score")
    )
    if refine is None:
        return adc
    cands = F.broadcast(adc.select(query_id_col, id_col))
    qv = F.broadcast(
        queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("__qv")))
    exact = (corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
             .join(cands, on=id_col)
             .join(qv, on=query_id_col)
             .withColumn("score", cosine(F.col("__cv"), F.col("__qv"))))
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "score")
    )
