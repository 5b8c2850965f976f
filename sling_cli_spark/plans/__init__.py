"""Driver-side orchestration plans: replication compile, pipelines."""

from sling_cli_spark.plans.replication import (  # noqa: F401
    ReplicationConfig, compile_replication, expand_wildcards,
    run_replication)
