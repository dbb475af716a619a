"""Set operations — SURVEY §2.6 (O4 UNION ALL/DISTINCT, O5 INTERSECT/EXCEPT).

O1–O3 (order/limit/top-k) are exercised by the flagship queries;
this module covers the bag/set combinators. `unionByName` is used
instead of positional `union` — resolving by column name is the
form that survives schema evolution on a long-lived 100 TB catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6
from hetnetdb_spark.registry import query

# --------------------------------------------------------------------------
# O4 — UNION ALL / UNION DISTINCT
# --------------------------------------------------------------------------

O4_ALL_ORACLE = """
SELECT nationkey, origin, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS origin FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS origin FROM supplier
) u
GROUP BY nationkey, origin
"""


@query("o04_union_all", oracle=O4_ALL_ORACLE)
def o04_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — UNION ALL (bag union, no dedup shuffle), tagged with the
    originating side then aggregated so the multiplicity is visible."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("origin")
    )
    s = supplier.select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("origin")
    )
    return c.unionByName(s).groupBy("nationkey", "origin").agg(F.count(F.lit(1)).alias("n"))


O4_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("o04_union_distinct", oracle=O4_DISTINCT_ORACLE)
def o04_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — UNION DISTINCT = unionByName + distinct (one hash-agg
    shuffle on the unioned key)."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# --------------------------------------------------------------------------
# O5 — INTERSECT / EXCEPT
# --------------------------------------------------------------------------

O5_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("o05_intersect", oracle=O5_INTERSECT_ORACLE)
def o05_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — INTERSECT (set semantics; Spark plans a left-semi join
    over distinct inputs)."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


O5_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@query("o05_except", oracle=O5_EXCEPT_ORACLE)
def o05_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — EXCEPT (set semantics; plans as a left-anti join over
    distinct inputs): customers who never placed an URGENT order —
    a few hundred rows at sf0.01, so the check is non-degenerate."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    c = customer.select(F.col("c_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return c.subtract(o)


# --------------------------------------------------------------------------
# O6 — INTERSECT ALL / EXCEPT ALL (bag semantics)
# --------------------------------------------------------------------------

O6_ORACLE = """
WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
     s AS (SELECT s_nationkey AS nationkey FROM supplier),
     i AS (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s),
     e AS (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
SELECT 'intersect_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
FROM i GROUP BY nationkey
UNION ALL
SELECT 'except_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY nationkey
"""


@query("o06_bag_setops", oracle=O6_ORACLE)
def o06_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — INTERSECT ALL / EXCEPT ALL: bag semantics keep
    multiplicities (min/count-difference per row), which the
    DISTINCT forms of o05 destroy. Spark plans both as aggregated
    counts + a generate — no exploding join. Output is grouped so
    the multiplicity arithmetic itself is what the oracle checks."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    ia = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionByName(ea)


# --------------------------------------------------------------------------
# O7 — LIMIT ... OFFSET (pagination)
# --------------------------------------------------------------------------

O7_ORACLE = """
SELECT c_custkey, ROUND(c_acctbal, 6) AS c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10 OFFSET 20
"""


@query("o07_limit_offset", oracle=O7_ORACLE)
def o07_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 — pagination: ORDER BY with a unique tiebreaker + LIMIT/
    OFFSET (Spark 4's offset()). The tiebreaker makes page
    boundaries deterministic across engines; without it, pagination
    over ties silently duplicates/drops rows between pages. Spark
    still bounds this with TakeOrderedAndProject (limit+offset
    heap), not a global sort."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    return (
        customer.select("c_custkey", r6(F.col("c_acctbal")).alias("c_acctbal"))
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(20)
        .limit(10)
    )


# --------------------------------------------------------------------------
# O8 — keyset pagination (the OFFSET that scales)
# --------------------------------------------------------------------------

O8_ORACLE = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 6) AS price
FROM lineitem
WHERE (l_orderkey, l_linenumber) > (2500, 2)
ORDER BY l_orderkey, l_linenumber
LIMIT 50
"""


@query("o08_keyset_pagination", oracle=O8_ORACLE)
def o08_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 — keyset (cursor) pagination: resume AFTER the last row of
    the previous page via a row-value comparison on the unique sort
    key, instead of OFFSET. O7's OFFSET must still produce and
    discard every earlier row — page N costs O(N·page) and deep
    pages are the classic large-result killer; the keyset predicate
    is sargable once decomposed, so the scan prunes to rows past
    the cursor and every page costs the same. The filter is spelled
    as the expanded disjunction (k1 > c1) OR (k1 = c1 AND k2 > c2)
    rather than a struct comparison: measured on this scan, the
    struct form stays a post-scan DataFilter while the disjunction
    reaches PushedFilters whole (plan-asserted). Top-50 feeds
    TakeOrderedAndProject, not a global sort."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    after_cursor = (F.col("l_orderkey") > 2500) | (
        (F.col("l_orderkey") == 2500) & (F.col("l_linenumber") > 2)
    )
    return (
        lineitem.filter(after_cursor)
        .select("l_orderkey", "l_linenumber", r6(F.col("l_extendedprice")).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )


# --------------------------------------------------------------------------
# O9 — distributed global ranking (no single-partition sort anywhere)
# --------------------------------------------------------------------------

O9_BUCKETS = 256

O9_ORACLE = """
SELECT CAST(row_number() OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
           AS global_rank,
       c_custkey,
       ROUND(c_acctbal, 6) AS acctbal
FROM customer
"""


@query("o09_distributed_rank", oracle=O9_ORACLE)
def o09_distributed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 — a GLOBAL row_number over the whole table. The naive
    spelling (`row_number() OVER (ORDER BY ...)` with no PARTITION
    BY, which is exactly what the oracle runs) funnels every row
    through one partition — the canonical window scale-killer. The
    distributed form is two-phase range ranking:

    1. Assign each row an ORDER-ALIGNED range bucket:
       `width_bucket(value, min, max, B)` against broadcast global
       bounds (a 1-row column-pruned agg). Equal values land in the
       same bucket and bucket id is monotone in value, so bucket
       order composes with in-bucket order to the total order.
    2. Per-bucket counts (B=256 rows) -> exclusive prefix sum = each
       bucket's rank offset. The unpartitioned window runs over the
       B-row bucket table — bounded by construction, the same
       post-aggregation argument as w10's month grid.
    3. Broadcast offsets back; global_rank = offset + row_number
       within the bucket window (one shuffle on bucket id, each
       bucket sorts independently).

    This is `repartitionByRange + zipWithIndex` re-expressed in pure
    DataFrame ops with deterministic (data-derived, not sampled)
    boundaries: identical output on any cluster layout. Degenerate
    guard: min==max collapses every row to bucket 1 — ranks are then
    decided by the tiebreak alone, still correct (one big bucket =
    the naive plan, which is unavoidable when every value is equal).
    Skewed value distributions skew bucket sizes, not correctness;
    a production variant would pick boundaries from
    approx-percentiles instead of uniform width."""
    from pyspark.sql.window import Window

    (customer,) = load_tables(spark, sf_dir, "customer")
    bounds = customer.agg(
        F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi")
    )
    bucketed = customer.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.when(F.col("lo") == F.col("hi"), F.lit(1)).otherwise(
            F.least(
                F.lit(O9_BUCKETS),
                F.width_bucket("c_acctbal", "lo", "hi", F.lit(O9_BUCKETS)),
            )
        ),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    w_in = Window.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            (F.col("offset") + F.row_number().over(w_in)).alias("global_rank"),
            "c_custkey",
            r6(F.col("c_acctbal")).alias("acctbal"),
        )
    )


# --------------------------------------------------------------------------
# O13 — GROUP BY ALL / ORDER BY ALL (modern positional-free SQL sugar)
# --------------------------------------------------------------------------

O13_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""


@query("o13_group_order_by_all", oracle=O13_SQL, impure=True)
def o13_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 — ``GROUP BY ALL`` / ``ORDER BY ALL``: the analyzer
    infers the grouping key as every non-aggregate select item and
    the ordering as the full select list. Identical SQL on both
    engines (DuckDB originated the syntax; Spark adopted it in 3.4)
    — the pin is the INFERENCE rule itself: if either engine
    classified an expression differently (e.g. treated an aggregate
    as a group key or ordered by a different column subset), rows or
    row order would diverge. The dialect-portability story matters
    operationally: warehouse SQL written this way moves between the
    interactive engine (DuckDB-class) and the batch engine (this
    one) without positional-list maintenance.

    Plan-wise this desugars to exactly q1's aggregate — inference
    happens at analysis, execution is unchanged (same partial/final
    split, same decimal money discipline). Registered impure: view
    registration."""
    from hetnetdb_spark.catalog import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(O13_SQL)


# --------------------------------------------------------------------------
# O11 — unionByName with allowMissingColumns (schema-evolution union)
# --------------------------------------------------------------------------

O11_ORACLE = """
WITH u AS (
    SELECT 'customer' AS origin, c_nationkey AS nationkey,
           c_acctbal  AS acctbal
    FROM customer
  UNION ALL
    SELECT 'supplier' AS origin, s_nationkey AS nationkey,
           NULL       AS acctbal
    FROM supplier
)
SELECT origin, nationkey,
       CAST(COUNT(*) AS BIGINT)                              AS n,
       CAST(COUNT(CASE WHEN acctbal IS NULL THEN 1 END)
            AS BIGINT)                                       AS n_missing,
       ROUND(CAST(SUM(COALESCE(CAST(acctbal AS DECIMAL(18,6)),
                               CAST(0 AS DECIMAL(18,6))))
                  AS DOUBLE), 6)                             AS bal
FROM u
GROUP BY origin, nationkey
ORDER BY origin, nationkey
"""


@query("o11_union_by_name", oracle=O11_ORACLE)
def o11_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 — ``unionByName(allowMissingColumns=True)``: the
    schema-evolution union. The two inputs deliberately disagree in
    BOTH ways a long-lived catalog's branches drift apart: column
    ORDER differs (supplier leads with ``origin``, customer ends
    with it) and a column is MISSING entirely (supplier has no
    ``acctbal``). By-name resolution must land ``nationkey`` on
    ``nationkey`` regardless of position — a positional union would
    put supplier nation keys in the ``acctbal`` slot and fail the
    hash — and the missing column must be NULL-filled, which the
    ``n_missing`` count pins exactly (every supplier row, no
    customer row). Balances ride the decimal-sum discipline so the
    fill lands in the right column with the right values.

    Scale posture: union is a zero-shuffle plan glue node — each
    side keeps its own partitioning and the NULL fill is a literal
    projection, so schema-evolution unions cost nothing at 100 TB;
    the single exchange here belongs to the certifying GROUP BY,
    keyed on (origin, nationkey)."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("origin"),
    )
    s = supplier.select(
        F.lit("supplier").alias("origin"),
        F.col("s_nationkey").alias("nationkey"),
    )
    u = c.unionByName(s, allowMissingColumns=True)
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        u.groupBy("origin", "nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("acctbal").isNull(), 1)).alias("n_missing"),
            F.round(
                F.sum(
                    F.coalesce(F.col("acctbal").cast("decimal(18,6)"), zero)
                ).cast("double"),
                6,
            ).alias("bal"),
        )
        .orderBy("origin", "nationkey")
    )
