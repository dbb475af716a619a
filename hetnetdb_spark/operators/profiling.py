"""Data-profiling operator — the one-pass per-column statistics
summary every ingestion pipeline runs before trusting a new table
(null counts, cardinalities, ranges), long-format like
``DESCRIBE``/``ANALYZE`` output.

Numeric and timestamp ranges surface as doubles (timestamps as epoch
seconds) rather than rendered strings: double→string formatting is
engine-specific and would break hash parity for zero analytical
gain; string columns report lexicographic min/max directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables, spread
from hetnetdb_spark.registry import query

#: (column, kind) pairs profiled on orders; kind picks the min/max slot.
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
)


def _duck_minmax(col: str, kind: str) -> tuple[str, str, str, str]:
    if kind == "num":
        return (
            f"ROUND(CAST(MIN({col}) AS DOUBLE), 6)",
            f"ROUND(CAST(MAX({col}) AS DOUBLE), 6)",
            "CAST(NULL AS VARCHAR)",
            "CAST(NULL AS VARCHAR)",
        )
    if kind == "ts":
        return (
            f"ROUND(epoch(MIN({col})), 6)",
            f"ROUND(epoch(MAX({col})), 6)",
            "CAST(NULL AS VARCHAR)",
            "CAST(NULL AS VARCHAR)",
        )
    return (
        "CAST(NULL AS DOUBLE)",
        "CAST(NULL AS DOUBLE)",
        f"MIN({col})",
        f"MAX({col})",
    )


S17_ORACLE = "\nUNION ALL\n".join(
    """SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT)                         AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT)            AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT)              AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {smn} AS min_str, {smx} AS max_str
FROM orders""".format(c=c, mn=mn, mx=mx, smn=smn, smx=smx)
    for c, kind in _PROFILE_COLS
    for mn, mx, smn, smx in [_duck_minmax(c, kind)]
)


def _spark_minmax(c: str, kind: str) -> tuple[Column, Column, Column, Column]:
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    if kind == "num":
        return (
            F.round(F.min(c).cast("double"), 6),
            F.round(F.max(c).cast("double"), 6),
            null_s,
            null_s,
        )
    if kind == "ts":
        # timestamp→double is not a legal cast in Spark 4; epoch
        # seconds via unix_micros matches DuckDB's epoch() exactly.
        # The parquet column surfaces as TIMESTAMP_NTZ and
        # unix_micros wants an instant — the session timezone is
        # pinned UTC (session.py), so the NTZ→LTZ cast is identity.
        return (
            F.round(F.unix_micros(F.min(c).cast("timestamp_ltz")) / 1_000_000.0, 6),
            F.round(F.unix_micros(F.max(c).cast("timestamp_ltz")) / 1_000_000.0, 6),
            null_s,
            null_s,
        )
    return null_d, null_d, F.min(c), F.max(c)


@query("s17_table_profile", oracle=S17_ORACLE)
def s17_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17 (beyond contract) — one-pass table profile of `orders`:
    per column, the row count, null count, exact distinct count, and
    min/max (numeric/epoch slots for numbers and timestamps,
    lexicographic slots for strings), one output row per column.

    Physical shape (r15 optimization): one aggregate BRANCH per
    column, unioned — the oracle's own UNION ALL spelling. The
    previous single-aggregate form put all six exact
    COUNT(DISTINCT)s in one Aggregate, which plans as Spark's
    Expand-based distinct: every input row is replicated once per
    distinct column (×7 with the plain-agg group), materializing
    wide 8-column rows through the first aggregate. Per-column
    branches process the SAME total value count (6×N narrow rows vs
    7×N wide expanded rows) with no Expand, each branch's scan reads
    exactly one parquet column (columnar: six 1-column scans = one
    6-column scan in bytes), and the branches run as independent
    stages of one job. Measured at sf0.1 (min-of-5, same session):
    2.109 s → 1.320 s, frames identical including order. Spark's
    `unix_micros` and DuckDB's `epoch()` both yield fractional epoch
    seconds, so timestamp ranges compare exactly.
    """
    (orders,) = load_tables(spark, sf_dir, "orders")
    # distinct aggregation on a single-split fixture scan; see
    # catalog.spread
    orders = spread(orders, key="o_orderkey")
    parts: list[DataFrame] = []
    for c, kind in _PROFILE_COLS:
        mn, mx, smn, smx = _spark_minmax(c, kind)
        parts.append(
            orders.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                mn.alias("min_num"),
                mx.alias("max_num"),
                smn.alias("min_str"),
                smx.alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# S22 — fixed-width value histogram (distribution profile)
# --------------------------------------------------------------------------

S22_NBUCKETS = 12

S22_ORACLE = f"""
WITH stats AS (
    SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
),
b AS (
    SELECT LEAST(
               CAST(FLOOR((o_totalprice - mn)
                          / ((mx - mn) / {S22_NBUCKETS}.0)) AS BIGINT),
               {S22_NBUCKETS - 1}) AS bucket
    FROM orders, stats
),
counts AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows FROM b GROUP BY bucket
)
SELECT c.bucket,
       ROUND(s.mn + c.bucket * ((s.mx - s.mn) / {S22_NBUCKETS}.0), 6)       AS lo,
       ROUND(s.mn + (c.bucket + 1) * ((s.mx - s.mn) / {S22_NBUCKETS}.0), 6) AS hi,
       c.n_rows,
       ROUND(CAST(c.n_rows AS DOUBLE)
             / (SELECT CAST(SUM(n_rows) AS DOUBLE) FROM counts), 6)         AS pct
FROM counts c, stats s
ORDER BY bucket
"""


@query("s22_value_histogram", oracle=S22_ORACLE)
def s22_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22 (beyond contract) — fixed-width 12-bucket histogram of
    `o_totalprice`: the distribution-shape companion to s17's scalar
    profile (a skew/outlier check before choosing join strategies or
    partition keys is exactly this query).

    Two-pass by necessity: pass 1 is a global min/max aggregate (a
    1-row broadcast), pass 2 buckets every row map-side with
    `floor((x-min)/width)` and feeds a {S22_NBUCKETS}-group hash agg
    — the shuffle carries {S22_NBUCKETS} partial counts per task, so
    at 100 TB the cost is two scans and a constant-size exchange
    (and pass 1 reads only the one column thanks to parquet column
    pruning; with known static edges it collapses to one pass).

    Float parity: bucket edges and indices derive from MIN/MAX —
    exact parquet doubles, no accumulation — so `(x - mn) / width`
    is the same IEEE arithmetic on identical operands in both
    engines; the only rounding is the display rounding of edges and
    pct. Empty buckets are absent on both sides (no row fabrication
    to disagree on)."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).alias("n_total"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(S22_NBUCKETS))
    bucketed = (
        orders.select("o_totalprice")
        .crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("mn")) / width),
                F.lit(S22_NBUCKETS - 1),
            )
            .cast("long")
            .alias("bucket"),
            "mn",
            "mx",
            "n_total",
        )
    )
    counts = bucketed.groupBy("bucket", "mn", "mx", "n_total").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return (
        counts.select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * width, 6).alias("lo"),
            F.round(F.col("mn") + (F.col("bucket") + 1) * width, 6).alias("hi"),
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("pct"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# S38 — shuffle-skew audit (per join/agg key: cardinality + skew factors)
# --------------------------------------------------------------------------

#: (table, key) pairs audited — the shuffle keys the headline and
#: pipeline plans actually hash-partition on.
_SKEW_KEYS: tuple[tuple[str, str], ...] = (
    ("events", "user_id"),
    ("events", "event_type"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("documents", "source"),
)

S38_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{t}' AS tbl, '{k}' AS key_col,
       CAST(SUM(cnt) AS BIGINT)  AS n_rows,
       CAST(COUNT(*) AS BIGINT)  AS n_keys,
       CAST(MAX(cnt) AS BIGINT)  AS max_key_rows,
       ROUND(MAX(cnt) / (SUM(cnt) * 1.0 / COUNT(*)), 6) AS skew_ratio,
       ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top1_share
FROM (SELECT {k}, COUNT(*) AS cnt FROM {t} GROUP BY {k})"""
    for t, k in _SKEW_KEYS
)


@query("s38_shuffle_skew_audit", oracle=S38_ORACLE)
def s38_shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S38 — the pre-flight check every 100 TB shuffle plan needs:
    for each key the engine's joins/aggregates hash-partition on,
    its cardinality, the heaviest key's row count, the skew ratio
    (max/mean — how much slower the worst reducer runs than the
    average), and the top-1 share (the fraction of the whole
    shuffle that lands on one task no matter how many partitions
    you provision). skew_ratio ≫ 1 is the signal to reach for
    salting (`j13`/`a12`) or AQE skew-join before the job, not
    after it straggles.

    Plan: one two-level aggregate per audited key (key-grain
    partial-combined hash agg, then a 1-row rollup — the shuffle
    carries key counts, never rows), unioned. Cost is one scan per
    audited (table, key) entry — a table audited on two keys scans
    twice; at 100 TB you run it off table stats or a sample, but
    the CONTRACT (what the numbers mean) is what this query
    pins."""
    from hetnetdb_spark.expr import r6

    parts = []
    for t, k in _SKEW_KEYS:
        (df,) = load_tables(spark, sf_dir, t)
        per_key = df.groupBy(k).agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            per_key.agg(
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("cnt").alias("max_key_rows"),
            ).select(
                F.lit(t).alias("tbl"),
                F.lit(k).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                r6(
                    F.col("max_key_rows")
                    / (F.col("n_rows") * F.lit(1.0) / F.col("n_keys"))
                ).alias("skew_ratio"),
                r6(F.col("max_key_rows") * F.lit(1.0) / F.col("n_rows")).alias(
                    "top1_share"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
