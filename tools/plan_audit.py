"""Regenerate PLANS.md: formatted physical plans for the headline queries.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = ["star_join_agg", "where_filter", "merge_update_insert",
         "dedup_last_event", "checksum_lineitem", "minhash_dedup_docs",
         "asof_events", "ann_topk", "fingerprint_docs", "window_agg_events",
         "jaccard_dedup_docs", "embedding_near_dup", "chunk_docs",
         "stratified_sample_docs", "repetition_docs", "pii_redact_docs",
         "decontaminate_docs", "pack_chunks_docs", "distro_date_orders",
         "delta_stats_skipping", "iceberg_bounds_skipping",
         "bucketed_join_agg", "semdedup_docs", "vocab_topk_docs",
         "surprisal_docs", "mix_corpora_docs", "c4_filter_docs",
         "gopher_filter_docs",
         # round-8 continuation: row tracking / clustering / refs /
         # partition evolution / restore — the new lake read paths
         "delta_row_tracking", "delta_clustering_skipping",
         "iceberg_partition_evolution", "iceberg_refs", "delta_restore",
         # round-8 session 4: PQ ADC scoring must stay Catalyst-side
         "ann_pq_topk",
         # round 9: transform-pruned scans, mapped-CDF projection,
         # in-place adoption reads, live-JDBC partitioned scan
         "iceberg_transform_partitioning", "iceberg_transform_merge",
         "delta_cdf_mapped", "convert_inplace_roundtrip",
         "jdbc_live_merge",
         # round 10: v3 row-lineage read (broadcast file-map join,
         # codegen id arithmetic), catalog-WAP published read, and the
         # metadata-pruned incremental-by-lineage reads (both formats)
         "iceberg_row_lineage", "catalog_wap_el",
         "iceberg_incremental_lineage", "delta_incremental_rowtracking",
         # round-10 continuation: zero-shuffle BM25, one-pass TF-IDF,
         # corpus line dedup, view reads resolved through the catalog,
         # selective overwrite reads on both formats
         "bm25_rank_docs", "tfidf_keywords_docs", "line_dedup_docs",
         "iceberg_view_roundtrip", "delta_replace_where",
         "iceberg_overwrite_where", "token_budget_docs",
         "ngram_novelty_docs", "atomic_replication_el",
         # round 11: the two-phase global token budget (the fixed weak
         # item — its only SinglePartition exchange must be the
         # bucket-totals window), DSIR featurize/score/top-k, and the
         # lineage-incremental EL read
         "token_budget_global_docs", "dsir_select_docs",
         "lineage_el_incremental",
         # round-11 continuation: zero-shuffle hashed classifier, the
         # pandas-UDF normalization column (everything else must stay a
         # pass-through projection), native ORC scan
         "quality_classifier_docs", "normalize_text_docs",
         "orc_roundtrip",
         # round 13: the replication-corpus twin — two staged DB
         # exports scanned distributed, a unionByName, and the order
         "replication_multistream",
         # round 12: the golden-suite scenario queries — both return
         # the final DB table through the staged COPY-TO-parquet
         # export, so the audited plan is the distributed scan over
         # the staged files plus the ordering projection (the DB-side
         # lifecycle is SQL, audited by tests/test_suite_ported.py)
         "suite_db_lifecycle", "suite_db_backfill"]

HEADER = """# Physical plan audit (sf0.1, local[32])

Regenerate: python tools/plan_audit.py — each headline query's physical
operator tree plus parquet scan details.
What to look for (and what holds, per plan below):

- joins against dimensions are `BroadcastHashJoin` (no SortMergeJoin on
  the fact side)
- parquet scans show `PushedFilters` and a pruned `ReadSchema`
- windows are keyed (`Window [... PartitionBy ...]`), never global
- aggregates are two-phase (`HashAggregate` partial -> final after the
  exchange) — map-side combine at scale
"""


def main() -> None:
    from sling_cli_spark.session import get_spark
    import __spark_entry__ as em

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plans")
    qs = em.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    sections = []
    for name in AUDIT:
        plan = qs[name](spark, sf)._jdf.queryExecution().explainString(mode)
        tree = plan.split("\n\n")[0]
        details = "\n".join(l for l in plan.splitlines()
                            if "PushedFilters" in l or "ReadSchema" in l)
        sections.append(f"## {name}\n\n```\n{tree}\n{details}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(HEADER + "\n" + "\n".join(sections) + FOOTER)
    print(f"PLANS.md written ({len(sections)} plans)")
    spark.stop()


FOOTER = """
## iceberg_transform_partitioning — manifest pruning evidence (r9)

Transform pruning happens BEFORE the scan exists, so it never shows in
a physical plan — measured directly instead (sf0.01, bucket(8,
o_custkey) x month(o_orderdate), filters `o_custkey = 37 AND
o_orderdate >= 1995-01-01`):

```
FILES: total=2521 pruned_to=38   (66x fewer files opened)
```

The surviving files are one bucket (murmur3(37) % 8 = 6) x the months
>= the cut; the scan's InMemoryFileIndex lists ONLY them and the same
source-column predicates additionally push into parquet (plan above).
At 100 TB the arithmetic holds: bucket equality prunes to 1/N of the
files regardless of table size, temporal pruning is proportional to
the queried window, and both decide from manifest metadata the driver
already holds — zero data I/O spent deciding what to skip. The bucket
transform itself is long-space Catalyst arithmetic (no Python on the
write path either).
"""


if __name__ == "__main__":
    main()
