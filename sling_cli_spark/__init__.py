"""sling_cli_spark — a PySpark-native Extract-Load / analytics engine.

A from-scratch re-expression of the capabilities of slingdata-io/sling-cli
(reference studied read-only at /root/reference) on top of the Spark
DataFrame / SQL engine:

- the reference's Datastream/Dataflow row pipeline      -> pyspark DataFrame
- its per-dialect SQL templates                          -> Spark SQL + a small
  placeholder template engine for JDBC targets
- its StreamProcessor sample-based inference & widening  -> schema-on-read +
  generated cast expressions (operators/inference.py)
- its load modes / merge strategies                      -> DataFrame merge
  plans (operators/merge.py) and generated MERGE SQL
- its replication YAML orchestration                     -> driver-side plan
  compiler (plans/replication.py)

Everything here is declarative-first: operators build logical plans with the
DataFrame API and let Catalyst pick physical strategies (pushdown, pruning,
broadcast, AQE). Python row loops never appear on the data path.
"""

from sling_cli_spark.config import Config, Mode, Source, Target
from sling_cli_spark.session import get_spark
from sling_cli_spark.runner import run

__all__ = ["Config", "Mode", "Source", "Target", "get_spark", "run"]

__version__ = "0.1.0"
