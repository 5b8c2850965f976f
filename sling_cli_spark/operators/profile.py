"""Profiling / analysis suite.

Re-expresses the reference's analysis templates
(``core/dbio/templates/base.yaml:128-437``; runner
``database.go:2179-2318`` RunAnalysis, ``analyzer.go:151-259``) as
DataFrame aggregations:

- field_stat: per-column count / null% / distinct% / dup count
- distro_field: top-k value distribution with percentages
- fill_rate: per-column non-null fill rates
- test_pk: primary-key uniqueness check
- table_join_match: left-join match-rate profiling between two tables

Scale: field_stat is ONE pass over the table (count/countDistinct batched
into a single agg); distro_field is a groupBy on the profiled field only
(column-pruned scan) + a broadcast of the scalar total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sling_cli_spark.localframe import local_df
from pyspark.sql import functions as F


def field_stat(
    df: DataFrame, fields: list[str] | None = None, approx: bool = False,
) -> DataFrame:
    """Per-column stats in one aggregate pass (base.yaml field_stat).

    ``approx=True`` swaps exact ``count_distinct`` for
    ``approx_count_distinct`` (HLL, ~2% relative error): exact distinct
    expands rows × #distinct-aggs before the shuffle, which at 100 TB
    makes the profiling suite cost several table scans — the approx form
    stays one map-side-combined pass. Default stays exact so the DuckDB
    oracle hash-matches."""
    fields = fields or df.columns
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__total")]
    for f in fields:
        c = F.col(f"`{f}`")
        aggs += [
            F.count(c).alias(f"__cnt_{f}"),
            distinct(c).alias(f"__dst_{f}"),
        ]
    row = df.agg(*aggs).collect()[0]
    total = row["__total"]
    out = []
    for f in fields:
        cnt, dst = row[f"__cnt_{f}"], row[f"__dst_{f}"]
        out.append((
            f, total, cnt, total - cnt, dst,
            round(100.0 * (total - cnt) / total, 2) if total else 0.0,
            round(100.0 * dst / total, 2) if total else 0.0,
            cnt - dst,
        ))
    spark = df.sparkSession
    return local_df(spark, 
        out,
        "field string, total_cnt bigint, cnt bigint, null_cnt bigint, "
        "uniq_cnt bigint, null_prct double, uniq_prct double, dup_cnt bigint",
    )


def percentile_stat(
    df: DataFrame, fields: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Order statistics per numeric column — min / exact percentiles /
    max — in ONE aggregate pass (the profiling suite's distribution
    view; reference surface: base.yaml field_stat_deep's min/max).
    Exact ``percentile`` (linear interpolation between closest ranks)
    rather than mean/stddev: order statistics are DETERMINISTIC under
    any partitioning, while a float mean's partial-sum order is not —
    the wrong default for a correctness-gated profiler. At scale the
    percentiles are one sort-based aggregate; swap
    ``F.percentile_approx`` in via ``approx=True``-style callers when
    several table scans matter more than exactness."""
    aggs = []
    for f in fields:
        c = F.col(f"`{f}`").cast("double")
        aggs += [F.min(c).alias(f"__mn_{f}"),
                 F.max(c).alias(f"__mx_{f}"),
                 F.percentile(c, F.array(
                     *[F.lit(p) for p in probs])).alias(f"__pc_{f}")]
    row = df.agg(*aggs).collect()[0]
    out = []
    for f in fields:
        pcs = row[f"__pc_{f}"] or [None] * len(probs)
        for p, v in zip(probs, pcs):
            out.append((f, float(p), v))
        out.append((f, 0.0, row[f"__mn_{f}"]))
        out.append((f, 1.0, row[f"__mx_{f}"]))
    return local_df(df.sparkSession, 
        out, "field string, prob double, value double")


def distro_field(df: DataFrame, field: str, top_k: int = 20) -> DataFrame:
    """Top-k value distribution with percentage (base.yaml distro_field).

    groupBy on the single profiled column (scan prunes to one column);
    the total is computed in the same plan via a window over the grouped
    (small) result, not a second scan.
    """
    grouped = df.groupBy(F.col(f"`{field}`").alias("value")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w_tot = Window.partitionBy()
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("value"))
    return (
        grouped
        .withColumn("prct", F.round(100.0 * F.col("cnt") / F.sum("cnt").over(w_tot), 2))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("value", "cnt", "prct", "rank")
    )


def field_stat_deep(df: DataFrame, fields: list[str]) -> DataFrame:
    """Numeric min/max/avg/sum per column in one aggregate pass
    (base.yaml field_stat_deep). Sums computed in decimal for exactness,
    emitted as double."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for f in fields:
        c = F.col(f"`{f}`")
        aggs += [
            F.min(c).cast("double").alias(f"__min_{f}"),
            F.max(c).cast("double").alias(f"__max_{f}"),
            F.sum(c.cast("decimal(30,4)")).cast("double").alias(f"__sum_{f}"),
            F.count(c).alias(f"__cnt_{f}"),
        ]
    from decimal import ROUND_HALF_UP, Decimal

    row = df.agg(*aggs).collect()[0]
    out = []
    for f in fields:
        cnt = row[f"__cnt_{f}"]
        s = row[f"__sum_{f}"]
        # HALF_UP like SQL round() — Python round() banker's-rounds ties
        avg = (float(Decimal(str(s / cnt)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP)) if cnt else None)
        out.append((
            f, cnt, row[f"__min_{f}"], row[f"__max_{f}"], s, avg,
        ))
    return local_df(df.sparkSession, 
        out, "field string, cnt bigint, min_val double, max_val double, "
             "sum_val double, avg_val double")


def field_stat_len(
    df: DataFrame, fields: list[str] | None = None,
) -> DataFrame:
    """Min/max value length per column in ONE aggregate pass
    (base.yaml:241-251 field_stat_len). Defaults to the string columns;
    non-string fields profile the length of their string form, like the
    SQL template's length() on a cast."""
    fields = fields or [f for f, t in df.dtypes if t == "string"]
    aggs = [F.count(F.lit(1)).alias("__total")]
    for f in fields:
        c = F.length(F.col(f"`{f}`").cast("string"))
        aggs += [F.min(c).alias(f"__min_{f}"),
                 F.max(c).alias(f"__max_{f}")]
    row = df.agg(*aggs).collect()[0]
    out = [(f, row["__total"],
            row[f"__min_{f}"], row[f"__max_{f}"]) for f in fields]
    return local_df(df.sparkSession, 
        out, "field string, tot_cnt bigint, "
             "f_min_len bigint, f_max_len bigint")


def distro_field_group(
    df: DataFrame, field: str, group_expr: str, top_k: int | None = None,
) -> DataFrame:
    """Value distribution of ``field`` per ``group_expr`` bucket with
    percentage of the TABLE total (base.yaml:319-347
    distro_field_group). One map-side-combined groupBy on
    (group, value); the total comes from a window over the small
    grouped result instead of the template's second scan."""
    from pyspark.sql import Window

    g = df.groupBy(
        F.expr(group_expr).alias("group_exp"),
        F.col(f"`{field}`").alias("value"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_tot = Window.partitionBy()
    out = g.withColumn(
        "prct",
        F.round(100.0 * F.col("cnt") / F.sum("cnt").over(w_tot), 2),
    ).select(F.lit(field).alias("field"), "group_exp", "value",
             "cnt", "prct")
    if top_k is not None:
        w_rank = Window.orderBy(
            F.col("cnt").desc(), "group_exp", "value")
        out = out.withColumn("rank", F.row_number().over(w_rank)) \
            .filter(F.col("rank") <= top_k).drop("rank")
    return out


def distro_field_date(df: DataFrame, field: str) -> DataFrame:
    """Year/month distribution of a date/timestamp column with
    percentage of the table total (base.yaml:349-377
    distro_field_date). Same single-scan shape as distro_field: a
    (year, month) groupBy with map-side combine, window total over the
    grouped (tiny) result."""
    from pyspark.sql import Window

    c = F.col(f"`{field}`")
    g = df.groupBy(
        F.year(c).cast("long").alias("year"),
        F.month(c).cast("long").alias("month"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_tot = Window.partitionBy()
    return g.withColumn(
        "prct",
        F.round(100.0 * F.col("cnt") / F.sum("cnt").over(w_tot), 2),
    ).select(F.lit(field).alias("field"), "year", "month", "cnt", "prct")


def distro_field_date_wide(
    df: DataFrame, date_field: str, agg_cols: list[str],
    where: str | None = None,
) -> DataFrame:
    """Wide year/month rollup: one row per (year, month) carrying
    count + sum/min/max per requested column (base.yaml:378-389
    distro_field_date_wide). Single map-side-combined groupBy; the
    optional ``where`` predicate pushes into the scan."""
    if where:
        df = df.filter(where)
    c = F.col(f"`{date_field}`")
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for f in agg_cols:
        col = F.col(f"`{f}`")
        aggs += [F.sum(col).alias(f"sum_{f}"),
                 F.min(col).alias(f"min_{f}"),
                 F.max(col).alias(f"max_{f}")]
    return df.groupBy(
        F.year(c).cast("long").alias("year"),
        F.month(c).cast("long").alias("month"),
    ).agg(*aggs).select(
        F.lit(date_field).alias("date_field"), "year", "month", "cnt",
        *[f"{k}_{f}" for f in agg_cols for k in ("sum", "min", "max")])


def fill_rate(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Non-null fill counts/rates per column (base.yaml fill_cnt/fill_rate),
    one aggregate pass."""
    fields = fields or df.columns
    aggs = [F.count(F.lit(1)).alias("__total")]
    aggs += [F.count(F.col(f"`{f}`")).alias(f) for f in fields]
    row = df.agg(*aggs).collect()[0]
    total = row["__total"]
    out = [(f, row[f], round(100.0 * row[f] / total, 2) if total else 0.0)
           for f in fields]
    return local_df(df.sparkSession, 
        out, "field string, fill_cnt bigint, fill_rate double")


def test_pk(df: DataFrame, pk: list[str]) -> DataFrame:
    """PK uniqueness: total vs distinct-PK counts (base.yaml test_pk)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_cnt"),
        F.count_distinct(*[F.col(f"`{c}`") for c in pk]).alias("pk_cnt"),
    ).select(
        "total_cnt", "pk_cnt",
        (F.col("total_cnt") == F.col("pk_cnt")).alias("is_unique"),
    )


def table_join_match(
    left: DataFrame, right: DataFrame, on: list[str] | dict[str, str],
) -> DataFrame:
    """Left-join match-rate profiling (base.yaml:136-187 table_join_match).

    Aggregates both sides to distinct keys first (shuffles the *grouped*
    keysets, not the raw tables), then one join on the key.
    """
    if isinstance(on, dict):
        lcols, rcols = list(on.keys()), list(on.values())
    else:
        lcols = rcols = list(on)
    lk = left.groupBy(*[F.col(f"`{c}`") for c in lcols]) \
        .agg(F.count(F.lit(1)).alias("l_cnt"))
    rk = right.groupBy(*[F.col(f"`{c}`").alias(lc) for c, lc in zip(rcols, lcols)]) \
        .agg(F.count(F.lit(1)).alias("r_cnt"))
    joined = lk.join(rk, on=lcols, how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("left_keys"),
        F.count(F.col("r_cnt")).alias("matched_keys"),
        F.round(100.0 * F.count(F.col("r_cnt")) / F.count(F.lit(1)), 2)
        .alias("match_prct"),
        F.sum("l_cnt").alias("left_rows"),
    )


def _unique_cols(df: DataFrame, cols: list[str]) -> set[str]:
    """Which of ``cols`` are key-like (all-distinct, non-empty) — ONE
    aggregate job for the whole table, not one per candidate column."""
    if not cols:
        return set()
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count_distinct(F.col(f"`{c}`")).alias(f"__d{i}"))
    r = df.agg(*aggs).collect()[0]
    if r["__n"] == 0:
        return set()
    return {c for i, c in enumerate(cols) if r[f"__d{i}"] == r["__n"]}


def discover_fks(
    tables: dict[str, DataFrame],
    min_match_prct: float = 95.0,
    name_heuristic: bool = True,
    probe_concurrency: int = 8,
    max_probes: int = 512,
) -> list[dict]:
    """FK-candidate discovery (reference: analyzer.go:151-259 — probes
    column pairs across tables and keeps high match-rate pairs).

    ``name_heuristic`` restricts candidate pairs to columns sharing a
    name suffix (``o_custkey`` ~ ``c_custkey``) — the same pruning the
    reference applies before probing, which keeps this O(matching pairs)
    instead of all-columns². Spark-job shape for a warehouse-sized
    catalog: candidate enumeration runs driver-side with no jobs,
    uniqueness is ONE aggregate per referenced table (all its candidate
    columns batched), and the match probes fan out over a thread pool —
    N concurrent Spark jobs instead of 2·pairs sequential ones.

    ``max_probes`` bounds the probe fan-out: a thousand-table catalog
    with loose name matching can enumerate tens of thousands of
    candidate pairs, and each probe is a join-shaped Spark job — refuse
    past the cap instead of silently launching an hour of driver loops
    (raise the cap deliberately for a big catalog sweep).
    """
    from concurrent.futures import ThreadPoolExecutor

    def suffix(c: str) -> str:
        return c.split("_", 1)[1] if "_" in c else c

    names = list(tables)
    dtypes = {t: dict(tables[t].dtypes) for t in names}

    # 1. enumerate typed, name-matched candidate pairs (no Spark jobs)
    pairs: list[tuple[str, str, str, str]] = []
    ref_cols: dict[str, set[str]] = {t: set() for t in names}
    for lt in names:
        for rt in names:
            if lt == rt:
                continue
            for lc in tables[lt].columns:
                for rc in tables[rt].columns:
                    if name_heuristic and suffix(lc) != suffix(rc):
                        continue
                    if dtypes[lt][lc] != dtypes[rt][rc]:
                        continue
                    pairs.append((lt, lc, rt, rc))
                    ref_cols[rt].add(rc)

    # 2. uniqueness: one agg per referenced table
    unique: dict[str, set[str]] = {
        t: _unique_cols(tables[t], sorted(cols))
        for t, cols in ref_cols.items() if cols}
    pairs = [p for p in pairs if p[3] in unique.get(p[2], set())]

    if len(pairs) > max_probes:
        raise ValueError(
            f"discover_fks: {len(pairs)} candidate pairs exceed "
            f"max_probes={max_probes}; narrow the table set or raise "
            "the cap explicitly")

    # 3. match probes, concurrently
    def probe(p):
        lt, lc, rt, rc = p
        m = table_join_match(tables[lt], tables[rt], {lc: rc}).collect()[0]
        return p, float(m["match_prct"])

    if len(pairs) <= 1:
        probed = [probe(p) for p in pairs]
    else:
        with ThreadPoolExecutor(max_workers=max(1, probe_concurrency)) as ex:
            probed = list(ex.map(probe, pairs))

    return [
        {"table": lt, "column": lc, "ref_table": rt, "ref_column": rc,
         "match_prct": prct}
        for (lt, lc, rt, rc), prct in probed if prct >= min_match_prct
    ]


def fk_order(fks: list[dict], tables: list[str]) -> list[str]:
    """Topological order: referenced tables first (reference:
    replication.go:2102-2200 FK-ordered streams). Cycles break on the
    original order."""
    deps: dict[str, set] = {t: set() for t in tables}
    for fk in fks:
        if fk["table"] in deps and fk["ref_table"] in deps:
            deps[fk["table"]].add(fk["ref_table"])
    out: list[str] = []
    while deps:
        ready = [t for t in tables if t in deps and not (deps[t] - set(out))]
        if not ready:  # cycle — emit remaining in given order
            out.extend(t for t in tables if t in deps)
            break
        for t in ready:
            out.append(t)
            del deps[t]
    return out
