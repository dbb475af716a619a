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


#: sf_dir each catalog table is currently bound to, per
#: (applicationId, name) — registration + ANALYZE run once per
#: binding and again only when the binding changes (the table is
#: session-global state, so a guard keyed on sf_dir alone would skip
#: repointing after a switch back to an earlier sf).
_BOUND_SF: dict[tuple[str, str], str] = {}


def _catalog_table_location(spark: SparkSession, name: str) -> str | None:
    if not spark.catalog.tableExists(name):
        return None
    rows = spark.sql(f"DESCRIBE FORMATTED {name}").collect()
    for r in rows:
        if r.col_name.strip() == "Location":
            return r.data_type.strip().removeprefix("file:")
    return None


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """S5 — expose base tables to the SQL entry path.

    Non-events tables register as EXTERNAL parquet catalog tables
    followed by ``ANALYZE TABLE ... COMPUTE STATISTICS`` (SURVEY §4:
    CBO join reordering reads metastore stats). Spark 4 refuses
    ANALYZE on temp views (EXPECT_PERMANENT_VIEW_NOT_TEMP), and a
    temp view would shadow the catalog table anyway — so the SQL
    path resolves the analyzed catalog tables directly. ``events``
    stays a temp view because it needs the ns→µs cast from `load`
    (a view body can't be ANALYZEd; events is not on the SQL join
    path). A stale metastore entry pointing at another sf_dir is
    dropped and recreated.

    CBO + join reordering are enabled here — scoped to the SQL
    path — rather than session-wide: stats exist only for these
    catalog tables, and CBO's per-query estimation pass costs
    ~30-40 ms even on stat-less single-table plans (measured on
    q1), a pure tax on the DataFrame path where Spark's default
    (CBO off, AQE on) is already the right posture.
    """
    configure(spark)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    for n in names or TABLE_NAMES:
        if n == "events":
            load(spark, sf_dir, n).createOrReplaceTempView(n)
            continue
        key = (spark.sparkContext.applicationId, n)
        if _BOUND_SF.get(key) == sf_dir:
            continue
        path = table_path(sf_dir, n)
        spark.catalog.dropTempView(n)  # a temp view would shadow the table
        if _catalog_table_location(spark, n) != path:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            spark.sql(f"CREATE TABLE {n} USING parquet LOCATION '{path}'")
        # Table-level stats (size/rows) plus per-column NDV/min/max —
        # without column stats CBO falls back to worst-case join
        # cardinalities and reordering has nothing to work with.
        # ANALYZE FOR COLUMNS rejects nested types (array/map/struct).
        # timestamp_ntz is excluded as a workaround: Spark 4.1's CBO
        # FilterEstimation has no case for TimestampNTZType and throws
        # scala.MatchError at plan time if such a column carries stats
        # and appears in a comparison filter.
        spark.sql(f"ANALYZE TABLE {n} COMPUTE STATISTICS")
        atomic = [
            f.name
            for f in spark.table(n).schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "variant", "udt", "timestamp_ntz")
        ]
        if atomic:
            cols = ", ".join(atomic)
            spark.sql(f"ANALYZE TABLE {n} COMPUTE STATISTICS FOR COLUMNS {cols}")
        _BOUND_SF[key] = sf_dir
