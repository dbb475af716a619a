"""Catalog: parquet table loading + temp-view registration (S1, S5).

The reference accepted table uploads and registered them in a root
catalog; here a "catalog" is a scale-factor directory of parquet
files. Loading is a metadata-only operation (parquet footers), and
because every query goes through these helpers, the scan carries
Catalyst's free optimizations: column pruning and predicate pushdown
reach the parquet reader, partition pruning applies to partitioned
sinks, and the vectorized reader + whole-stage codegen own the hot
loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.schemas import TABLE_NAMES
from hetnetdb_spark.session import configure

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: Loaded-table cache, keyed by (applicationId, sf_dir, name).
#: DataFrames are immutable logical plans, so reuse is safe; what
#: this saves is the parquet footer read + plan construction that
#: `spark.read.parquet` pays on every call — the catalog-metadata
#: caching every long-lived engine does.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1 — parquet scan of one base table.

    No explicit schema is passed: parquet is self-describing and the
    footer types match ``schemas.SCHEMAS`` (validated in tests);
    passing a mismatched-precision timestamp schema would insert a
    cast above the scan and block filter pushdown.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4
        # rejects outright; `spark.sql.legacy.parquet.nanosAsLong`
        # (set in SESSION_CONF) surfaces it as epoch-nanos LongType.
        # Integer `div` (not `/`: epoch-ns ≈ 1.7e18 exceeds double's
        # 2^53 exact range) converts to µs, matching both Spark's
        # native timestamp precision and DuckDB's read of the same
        # column. Fixture values are µs-aligned, so this is lossless.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` left as the raw epoch-nanos long.

    For plans that only order/diff on time (sessionization), working
    on the long directly skips the per-row ns→µs conversion ahead of
    the window sort and defers timestamp materialization to the few
    output rows; long and timestamp sort identically (TimestampType
    is µs-longs internally, and fixture values are µs-aligned).
    Callers convert aggregated outputs via
    ``timestamp_micros(... div 1000)`` to match oracle schemas.
    """
    configure(spark)
    key = (spark.sparkContext.applicationId, sf_dir, "events_raw")
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        cached = spark.read.parquet(table_path(sf_dir, "events"))
        _TABLE_CACHE[key] = cached
    return cached


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    configure(spark)
    return tuple(load(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """S5 — register base tables as temp views for the SQL entry path."""
    configure(spark)
    for n in names or TABLE_NAMES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
