"""DataFrame-level operators: select, inference, transforms, merge, stats,
incremental filters, flatten, dedup, similarity, text analysis."""
