"""Public entry points — what a reference-engine user calls.

The reference's user surface is "submit SQL over registered
tables"; this module is that surface on Spark, plus discovery and
execution of the named operator queries in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hetnetdb_spark import registry
from hetnetdb_spark.catalog import register_views


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run an arbitrary ANSI-SQL statement against the catalog.

    All base tables from ``sf_dir`` are registered (as ANALYZEd
    external parquet catalog tables — CBO join reordering sees row
    and size stats) before the statement parses. The returned
    DataFrame is lazy; Catalyst/AQE plan it like any API-built
    query."""
    register_views(spark, sf_dir)
    return spark.sql(statement)


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute a named operator query from the registry."""
    registry.load_all()
    try:
        fn = registry.QUERIES[name]
    except KeyError:
        raise KeyError(
            f"unknown query {name!r}; see list_queries()"
        ) from None
    return fn(spark, sf_dir)


def profile(spark: SparkSession, sf_dir: str, name: str) -> list[dict]:
    """Execute a named query and return per-operator runtime metrics
    (output rows, shuffle bytes, spills) from the final adaptive
    plan — see :func:`hetnetdb_spark.plans.audit.profile`."""
    from hetnetdb_spark.plans.audit import profile as _profile

    return _profile(run(spark, sf_dir, name))


def list_queries() -> list[str]:
    """All registered query names, in registration order."""
    registry.load_all()
    return list(registry.QUERIES)


def oracle_sql(name: str) -> str | None:
    """The DuckDB oracle SQL for ``name`` (None = rows-only op)."""
    registry.load_all()
    return registry.ORACLE.get(name)
