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
