"""Warehouse analytics & data-quality operators: cohort retention
over the events table and a referential-integrity audit over the
star schema's FK edges.

Both are the "runs every morning" class of query a warehouse serves:
retention matrices for product analytics, orphan-key audits for
ingest monitoring. Both reduce to joins + aggregates with bounded
output (weeks × offsets, one row per FK edge), so they stay cheap at
any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.registry import query

L22_ORACLE = """
WITH first_seen AS (
    SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
),
activity AS (
    SELECT e.user_id,
           date_trunc('week', f.t0) AS cohort_week,
           CAST(date_diff('day', date_trunc('week', f.t0),
                          date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
    FROM events e
    JOIN first_seen f USING (user_id)
)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@query("l22_cohort_retention", oracle=L22_ORACLE)
def l22_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted as active in each subsequent week offset — the standard
    product-analytics retention triangle.

    Two aggregates share the user_id shuffle key: first-seen per
    user, then (after a same-key join AQE can colocate) distinct
    users per (cohort, offset). Week arithmetic is Monday-anchored
    `date_trunc('week')` on both engines and the offset is an exact
    integer day-diff ÷ 7, so no float or timezone drift can split a
    cohort. Output is bounded by weeks² — a few hundred rows at any
    input size.
    """
    (events,) = load_tables(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("t0"))
    cohort = F.date_trunc("week", F.col("t0"))
    active = F.date_trunc("week", F.col("ts"))
    return (
        events.join(first_seen, "user_id")
        .select(
            "user_id",
            cohort.alias("cohort_week"),
            F.floor(
                F.datediff(active.cast("date"), cohort.cast("date")) / 7
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


S18_ORACLE = """
WITH staged AS (
    SELECT l_orderkey + CASE WHEN l_orderkey % 97 = 0
                             THEN 1000000000 ELSE 0 END AS l_orderkey,
           l_partkey, l_suppkey
    FROM lineitem
)
SELECT fk_edge, n_child, n_orphans FROM (
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           CAST(COUNT(*) AS BIGINT)        AS n_child,
           CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_orphans
    FROM staged LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE p_partkey IS NULL) AS BIGINT)
    FROM staged LEFT JOIN part ON l_partkey = p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE s_suppkey IS NULL) AS BIGINT)
    FROM staged LEFT JOIN supplier ON l_suppkey = s_suppkey
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
) audits
ORDER BY fk_edge
"""


@query("s18_fk_audit", oracle=S18_ORACLE)
def s18_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 (beyond contract) — referential-integrity audit: orphan
    counts for every FK edge a load touches, the post-ingest check a
    warehouse runs before publishing a batch. A staged lineitem with
    deterministically corrupted order keys (every 97th key offset
    out of range) proves the audit *finds* orphans rather than
    vacuously reporting zero; the untouched edges certify clean.

    Each edge is a left outer join probing the parent key, counted
    in one pass (total + null-parent rows). The parent sides carry
    only their key column, so every probe is a broadcast or
    key-shuffle of ids — never wide rows — and each audit's output
    is exactly one row. At 100 TB this is the same plan per edge,
    and edges run independently (one Spark job each), so the audit
    parallelizes across the cluster trivially.
    """
    lineitem, orders, part, supplier, customer = load_tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer"
    )
    staged = lineitem.select(
        (
            F.col("l_orderkey")
            + F.when(F.col("l_orderkey") % 97 == 0, 1_000_000_000).otherwise(0)
        ).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
    )

    def audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, edge: str) -> DataFrame:
        joined = child.join(
            parent.select(pkey), F.col(ckey) == F.col(pkey), "left"
        )
        return joined.agg(
            F.lit(edge).alias("fk_edge"),
            F.count(F.lit(1)).alias("n_child"),
            F.count(F.when(F.col(pkey).isNull(), 1)).alias("n_orphans"),
        )

    audits = [
        audit(staged, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey -> orders"),
        audit(staged, "l_partkey", part, "p_partkey", "lineitem.l_partkey -> part"),
        audit(staged, "l_suppkey", supplier, "s_suppkey", "lineitem.l_suppkey -> supplier"),
        audit(orders, "o_custkey", customer, "c_custkey", "orders.o_custkey -> customer"),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out.orderBy("fk_edge")
