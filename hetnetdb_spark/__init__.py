"""hetnetdb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the analytical query surface of
``trueb2/hetnetdb`` (a distributed SQL database for heterogeneous
node networks) on top of Apache Spark's DataFrame/SQL stack, plus a
large-scale LLM-data-pipeline operator layer (dedup, similarity
search, text analysis, multimodal columns).

Design stance (see SURVEY.md):
- DataFrame/SQL first: every operator is a declarative Catalyst plan;
  no RDD code, no driver-side row loops.
- The reference's root/leaf split (root parses + merges, leaves run
  partial scans/aggregates) maps 1:1 onto Spark's driver/executor
  model with two-phase HashAggregate — so operators here simply
  declare logical plans and let Catalyst/AQE pick physical strategy.
- Python↔JVM crossings only in the declared UDF surface (Arrow
  batched), never in the relational core.

The public contract is :mod:`hetnetdb_spark.registry`: named queries
(Spark side) paired with ANSI-SQL oracle strings (DuckDB side).
"""

from hetnetdb_spark.api import (  # noqa: F401
    ingest_csv,
    list_queries,
    oracle_sql,
    profile,
    run,
    sql,
)
from hetnetdb_spark.registry import ORACLE, QUERIES, query  # noqa: F401

__version__ = "0.1.0"
