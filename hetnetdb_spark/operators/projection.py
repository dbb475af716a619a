"""Projection & predicate operators — SURVEY §2.2 (P1, P4–P10).

The reference's SQL subset lived on SELECT + WHERE; here each
predicate/projection form is a named query with a DuckDB oracle
twin. All of these are pure Catalyst surface: filters stay sargable
(pushed into the parquet scan), projections prune columns at the
reader, and nothing leaves the JVM.

Scale notes: every query here is scan → (filter) → small aggregate
or bounded-dim projection, so the shuffle payload is KBs regardless
of input size. Predicates are expressed on raw columns (never
wrapped in Python or non-deterministic exprs) so PushedFilters
carries them to the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6
from hetnetdb_spark.registry import query

# --------------------------------------------------------------------------
# P1 — column projection + alias
# --------------------------------------------------------------------------

P1_ORACLE = """
SELECT n_nationkey AS nation_id,
       n_name      AS nation_name,
       n_regionkey AS region_id
FROM nation
"""


@query("p01_projection_alias", oracle=P1_ORACLE)
def p01_projection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — select + alias; the scan reads only the named columns."""
    (nation,) = load_tables(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").alias("nation_id"),
        F.col("n_name").alias("nation_name"),
        F.col("n_regionkey").alias("region_id"),
    )


# --------------------------------------------------------------------------
# P4 — IN / NOT IN
# --------------------------------------------------------------------------

P4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus NOT IN ('F')
GROUP BY o_orderpriority
"""


@query("p04_in_notin", oracle=P4_ORACLE)
def p04_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — isin / negated isin compile to In/Not(In) and push down.

    NOT IN's null-poisoning semantics don't bite here: the fixture
    columns are non-null, and at scale the correct guard is an
    isNotNull conjunct, which Catalyst adds for free on these.
    """
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ~F.col("o_orderstatus").isin("F")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# P5 — BETWEEN
# --------------------------------------------------------------------------

P5_ORACLE = """
SELECT l_returnflag,
       COUNT(*)                    AS n_rows,
       ROUND(SUM(l_quantity), 6)   AS sum_qty
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY l_returnflag
"""


@query("p05_between", oracle=P5_ORACLE)
def p05_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — numeric and timestamp BETWEEN (inclusive both ends)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            r6(F.sum("l_quantity")).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# P6 — LIKE / regexp predicate
# --------------------------------------------------------------------------

P6_ORACLE = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_name LIKE '%e%'
  AND regexp_matches(p_type, '^(STANDARD|ECONOMY)')
GROUP BY p_brand
"""


@query("p06_like_rlike", oracle=P6_ORACLE)
def p06_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — LIKE wildcard + regexp predicate.

    ``rlike`` and DuckDB ``regexp_matches`` share partial-match
    semantics, so the anchored pattern means the same thing on both
    sides.
    """
    (part,) = load_tables(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("%e%") & F.col("p_type").rlike("^(STANDARD|ECONOMY)")
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# --------------------------------------------------------------------------
# P7 — NULL handling (isNull / coalesce / nullif)
# --------------------------------------------------------------------------

P7_ORACLE = """
SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS segment,
       COUNT(*)                                                 AS n_cust,
       CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)                   AS n_nulled
FROM customer
GROUP BY COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED')
"""


@query("p07_null_handling", oracle=P7_ORACLE)
def p07_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — the fixtures are null-free, so nulls are *manufactured*
    with nullif and then observed (isNull) and repaired (coalesce)."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    nulled = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        customer.select(
            F.coalesce(nulled, F.lit("SUPPRESSED")).alias("segment"),
            nulled.isNull().cast("int").alias("is_nulled"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("is_nulled").cast("long").alias("n_nulled"),
        )
    )


# --------------------------------------------------------------------------
# P8 — CASE WHEN
# --------------------------------------------------------------------------

P8_ORACLE = """
SELECT CASE WHEN c_acctbal < 0    THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END          AS tier,
       COUNT(*)                      AS n_cust,
       ROUND(SUM(c_acctbal), 6)      AS total_bal
FROM customer
GROUP BY 1
"""


@query("p08_case_when", oracle=P8_ORACLE)
def p08_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — multi-branch CASE with ELSE."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        customer.groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            r6(F.sum("c_acctbal")).alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# P9 — CAST
# --------------------------------------------------------------------------

P9_ORACLE = """
SELECT CAST(l_linenumber AS BIGINT)            AS line_no,
       COUNT(*)                                AS n_rows,
       ROUND(SUM(CAST(l_orderkey AS DOUBLE)), 6) AS sum_key_dbl,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_int,
       MIN(CAST(l_linenumber AS VARCHAR))      AS min_line_str
FROM lineitem
GROUP BY CAST(l_linenumber AS BIGINT)
"""


@query("p09_cast", oracle=P9_ORACLE)
def p09_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — widening, narrowing, and to-string casts.

    double→int differs between engines (Spark truncates, DuckDB
    rounds), so the oracle spells Spark's truncation as
    FLOOR-then-cast — same values, explicit semantics (quantities
    are non-negative).
    """
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            F.col("l_linenumber").cast("long").alias("line_no"),
            F.col("l_orderkey").cast("double").alias("key_dbl"),
            F.col("l_quantity").cast("long").alias("qty_int"),
            F.col("l_linenumber").cast("string").alias("line_str"),
        )
        .groupBy("line_no")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            r6(F.sum("key_dbl")).alias("sum_key_dbl"),
            F.sum("qty_int").alias("sum_qty_int"),
            F.min("line_str").alias("min_line_str"),
        )
    )


# --------------------------------------------------------------------------
# P10 — DISTINCT projection
# --------------------------------------------------------------------------

P10_ORACLE = """
SELECT DISTINCT c_mktsegment AS segment, c_nationkey AS nationkey
FROM customer
"""


@query("p10_distinct", oracle=P10_ORACLE)
def p10_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — distinct over a two-column projection (plans as a
    hash aggregate on the projected key, partial→final)."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    ).distinct()


# --------------------------------------------------------------------------
# P11 — null-safe equality (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

P11_ORACLE = """
WITH keyed AS (
    SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg_key,
           COUNT(*)                         AS n_cust
    FROM customer
    GROUP BY seg_key
)
SELECT a.seg_key  AS seg_key,
       a.n_cust   AS n_a,
       b.n_cust   AS n_b
FROM keyed a
JOIN keyed b ON a.seg_key IS NOT DISTINCT FROM b.seg_key
"""


@query("p11_null_safe_join", oracle=P11_ORACLE)
def p11_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — null-safe equality: `<=>` treats NULL as a joinable
    value (NULL <=> NULL is true), where plain `=` silently drops
    every null-keyed row — the classic lost-rows bug when joining on
    nullable business keys. The NULLIF manufactures a null key
    class; the null-safe self-join must preserve it."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    keyed = (
        customer.withColumn(
            "seg_key", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
        )
        .groupBy("seg_key")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    a = keyed.select(F.col("seg_key"), F.col("n_cust").alias("n_a"))
    b = keyed.select(F.col("seg_key").alias("seg_key_b"), F.col("n_cust").alias("n_b"))
    return (
        a.join(F.broadcast(b), F.col("seg_key").eqNullSafe(F.col("seg_key_b")))
        .select("seg_key", "n_a", "n_b")
    )


# --------------------------------------------------------------------------
# P12 — explicit NULLS FIRST/LAST ordering semantics
# --------------------------------------------------------------------------

P12_ORACLE = """
SELECT o_orderkey,
       pri,
       CAST(row_number() OVER (
           ORDER BY pri ASC NULLS FIRST, o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rn_nf,
       CAST(row_number() OVER (
           ORDER BY pri DESC NULLS LAST, o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rn_nl
FROM (
    SELECT o_orderkey, o_totalprice,
           NULLIF(o_orderpriority, '3-MEDIUM') AS pri
    FROM orders
    WHERE o_totalprice > 480000
) t
"""


@query("p12_null_ordering", oracle=P12_ORACLE)
def p12_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — explicit NULLS FIRST / NULLS LAST in sort keys. The
    engines' DEFAULTS disagree (Spark sorts nulls first ascending,
    DuckDB last), so any query that sorts a nullable key and feeds
    a rank or a limit MUST pin null placement to be portable — this
    query certifies both placements via row_number under each. The
    global window is safe only because the filter bounds the input
    (rank-over-everything at 100 TB needs W6's per-group form or
    O3's top-k)."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    t = orders.filter(F.col("o_totalprice") > 480000).select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri"),
    )
    w_nf = Window.orderBy(
        F.col("pri").asc_nulls_first(), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_nl = Window.orderBy(
        F.col("pri").desc_nulls_last(), F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.select(
        "o_orderkey",
        "pri",
        F.row_number().over(w_nf).cast("long").alias("rn_nf"),
        F.row_number().over(w_nl).cast("long").alias("rn_nl"),
    )


# --------------------------------------------------------------------------
# P13 — exact decimal accounting (no float drift, any merge order)
# --------------------------------------------------------------------------

P13_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
         AS exact_revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS VARCHAR)
         AS exact_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("p13_decimal_exact", oracle=P13_ORACLE)
def p13_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 — the exact-numeric surface: money sums in DECIMAL are
    associative, so the result is identical for ANY partition count
    or merge order — the accounting-grade guarantee double can't
    give (the engine's internal float discipline rounds to 6dp; this
    operator removes the need to round at all). Fixture prices carry
    exactly 2 decimals, so the cast is lossless. Output as string:
    both engines print decimals canonically, and it keeps the
    comparison exact end-to-end instead of re-entering float64."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string")
            .alias("exact_revenue"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .alias("exact_qty"),
        )
    )
