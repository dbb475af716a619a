"""The rest of the TPC-H query suite, adapted to the fixture schema.

The fixtures carry no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/comment columns
(FIXTURES.md), so the classic queries that lean on those are adapted:
the part↔supplier relation is derived from ``lineitem`` (the orders
actually shipped), "late" means ``l_shipdate`` far past
``o_orderdate``, and comment-pattern filters become value filters on
columns that exist. Each adaptation keeps the *shape* the original
query exists to exercise — correlated scalar subqueries (Q2/Q17),
EXISTS with a non-equi condition (Q4/Q21), nation-pair disjunctions
(Q7), conditional-share ratios (Q8), HAVING against an uncorrelated
scalar aggregate (Q11), two-level aggregation (Q13), aggregate-view
MAX equality (Q15), NOT IN (Q16), and nested IN-over-HAVING (Q20) —
because the shape, not the constants, is what the planner has to get
right.

Scale posture (shared by all 12): every filter on a base column is
sargable and reaches its parquet scan; nation/region (bounded: 25/5
rows forever) are pinned broadcast; customer/supplier/part broadcasts
are left to AQE because those tables grow with the scale factor; the
fact-side joins shuffle on their FK keys and aggregates reduce
map-side first. Per-query notes call out anything beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6, revenue
from hetnetdb_spark.registry import query

Q2_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
elig AS (
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
    FROM part
    JOIN pairs    ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'SMALL' AND p_size <= 15
)
SELECT p_partkey, p_brand, s_suppkey, s_name, ROUND(s_acctbal, 6) AS s_acctbal
FROM elig
WHERE s_acctbal = (SELECT MIN(e2.s_acctbal) FROM elig e2
                   WHERE e2.p_partkey = elig.p_partkey)
ORDER BY s_acctbal, p_partkey, s_suppkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part in one region — the
    correlated MIN subquery (adapted: the part↔supplier relation
    comes from shipped lineitem rows, and "cost" is ``s_acctbal``,
    since the fixtures have no partsupp/ps_supplycost).

    Decorrelation: the per-part minimum is computed once as a grouped
    aggregate over the *already-filtered* eligible pairs and joined
    back on (partkey, acctbal) — the subquery never re-executes per
    outer row. The part filter broadcasts into lineitem BEFORE the
    pair-distinct, so the distinct's shuffle carries only key pairs
    of qualifying parts (~5% here; the ratio, not the absolute,
    survives scale-up) instead of every shipped pair — measured 0.42
    → 0.15 s at sf0.1 for the same result. The min-join compares
    stored doubles (no arithmetic), so float equality is exact on
    both engines.
    """
    lineitem, part, supplier, nation, region = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    part_f = part.filter((F.col("p_type") == "SMALL") & (F.col("p_size") <= 15))
    pairs = (
        lineitem.join(
            F.broadcast(part_f.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    elig = (
        part_f.join(pairs, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
    )
    min_bal = elig.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        elig.join(
            F.broadcast(min_bal),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            r6(F.col("s_acctbal")).alias("s_acctbal"),
        )
        .orderBy("s_acctbal", "p_partkey", "s_suppkey")
        .limit(100)
    )


Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders per priority that had at least one late line
    — EXISTS with a correlated non-equi condition (adapted: "late" is
    shipped >60 days after the order date; the fixtures carry no
    commit/receipt dates).

    Plans as a left-semi join with the equi key (orderkey) as the
    hash key and the date comparison as a residual — no per-order
    re-scan of lineitem, and the quarter filter on orders prunes the
    probe side before the join. Semi-join output carries orders
    columns only, so the final 5-group aggregate is map-side tiny.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        orders_f.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 6) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between a nation pair, by direction
    and year — the two-role dimension query (nation joins twice, once
    through supplier and once through customer) with a cross-side
    disjunction.

    Both nation joins broadcast the same 25-row table under two
    aliases; the pair disjunction is evaluated after both joins
    resolve (it references both roles, so neither side alone can
    eliminate it — but each broadcast is pre-filtered to the two
    named nations, which prunes supplier and customer rows before
    the fact joins). Years derive from l_shipdate and group to a
    handful of rows; nations chosen to have suppliers at every
    fixture scale factor.
    """
    supplier, lineitem, orders, customer, nation = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = nation.filter(F.col("n_name").isin("NATION_3", "NATION_8"))
    n1 = pair.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = pair.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(r6(F.sum(revenue())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q8_ORACLE = """
SELECT o_year,
       ROUND(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END)
                      / SUM(volume), 0), 6) AS mkt_share,
       ROUND(SUM(volume), 6)                AS total_volume
FROM (
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part
    JOIN lineitem  ON p_partkey = l_partkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's PROMO-part
    revenue, by order year — a ratio of a conditional aggregate to an
    unconditional one over the same 7-way join, computed in ONE pass.

    The nation table again plays two roles (customer's nation →
    region filter; supplier's nation → share numerator); both
    broadcast. The region filter composes with the customer-side
    nation join so non-ASIA customers drop before the fact shuffle.
    COALESCE pins years with no NATION_3 supplier revenue to share
    0.0 on both engines rather than NULL.
    """
    part, lineitem, supplier, orders, customer, nation, region = load_tables(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = revenue()
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            r6(
                F.coalesce(
                    F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)) / F.sum(vol),
                    F.lit(0.0),
                )
            ).alias("mkt_share"),
            r6(F.sum(vol)).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q9_ORACLE = """
SELECT nation, o_year, ROUND(SUM(amount), 6) AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", oracle=Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: pseudo-profit on one product family by supplier
    nation and order year (adapted: cost is ``0.5 * p_retailprice *
    l_quantity`` since the fixtures have no ps_supplycost; the
    product family is a p_name substring, as in the original).

    The LIKE '%red%' filter is not prefix-sargable, but it IS
    evaluated at the part scan (a 1/25-ish selective scan over the
    smallest fact-adjacent table) and the surviving keys broadcast
    into lineitem, so the expensive side is pruned by broadcast-hash
    probe rather than by parquet stats. Everything after that is the
    standard FK chain with a 25×7-group final aggregate.
    """
    part, lineitem, supplier, orders, nation = load_tables(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    amount = revenue() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(r6(F.sum("amount")).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


Q11_ORACLE = """
WITH natval AS (
    SELECT l_partkey, l_extendedprice * l_quantity AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS p_key, ROUND(SUM(val), 6) AS value
FROM natval
GROUP BY l_partkey
HAVING ROUND(SUM(val) / (SELECT SUM(val) FROM natval), 6) > 0.01
ORDER BY value DESC, p_key
"""


@query("q11_important_stock", oracle=Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one
    nation's shipped value — HAVING against an *uncorrelated* scalar
    subquery over the same relation (adapted: value flows through
    lineitem, not partsupp).

    The nation-filtered value relation is built once; the global
    total and the per-part totals both aggregate from it (Spark
    computes it twice — the relation is cheap and early-pruned by
    the broadcast nation filter; caching would pin memory for no
    measurable win at any SF). The threshold scalar broadcasts into
    the HAVING filter, so the comparison is map-side.

    Float discipline: the cutoff compare is SCALE-FREE — both
    engines compare `round(group_sum / grand_total, 6) > 0.01`.
    Comparing raw sums (even 6dp-rounded) is unsafe because the
    grand total is O(1e9-1e10) and independent accumulation orders
    drift well past 1e-6 absolute; the ratio is O(0.01) with ~1e-15
    relative drift, so the 6dp boundary flips with probability
    ~1e-9, not ~1 (the a19 lesson applied).
    """
    lineitem, supplier, nation = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    natval = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("val"),
        )
    )
    total = natval.agg(F.sum("val").alias("grand_total"))
    return (
        natval.groupBy("l_partkey")
        .agg(F.sum("val").alias("raw_value"))
        .join(F.broadcast(total))
        .filter(r6(F.col("raw_value") / F.col("grand_total")) > F.lit(0.01))
        .select(
            F.col("l_partkey").alias("p_key"),
            r6(F.col("raw_value")).alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_key")
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT)
         AS high_line_count,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
         AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q12_late_lines", oracle=Q12_ORACLE)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late lines split into high/low-priority
    counts per group (adapted: group key is l_returnflag and "late"
    is shipped >90 days after ordering; the fixtures have no
    shipmode/receiptdate).

    The year filter on l_shipdate is sargable and pushed; the
    late-ness predicate spans both join sides so it runs as a join
    residual. The two FILTER counts are one conditional-aggregation
    pass (A6 pattern), never two scans.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer — the two-level
    aggregation over a filtered LEFT JOIN (adapted: the excluded
    class is a priority value; the fixtures have no o_comment).

    The join filter lives in the join condition, not a post-filter —
    on an outer join those are different queries (a post-filter would
    drop the zero-order customers the query exists to count).
    COUNT(o_orderkey) counts non-null keys only, so unmatched
    customers land in the c_count=0 bucket on both engines. First
    aggregate shuffles on custkey (same key as the join, so AQE can
    reuse the exchange); the second reduces to a handful of rows.
    """
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q15_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    an aggregate view consumed twice (once for the MAX scalar, once
    for the equality probe), the view-reuse shape.

    Float discipline makes the equality safe: the per-supplier sums
    are rounded to 6 decimals BEFORE the max/compare on BOTH engines,
    so a last-ulp accumulation difference cannot make the engines
    pick different winners. The revenue view is supplier-granular
    (bounded by supplier count, not lineitem), so the MAX scalar and
    the equality probe are both tiny; ties all surface, ordered by
    key.
    """
    lineitem, supplier = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(r6(F.sum(revenue())).alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q16_ORACLE = """
SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@query("q16_supplier_part_types", oracle=Q16_ORACLE)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers ship each surviving
    brand/size combination — NOT IN over a filtered subquery plus
    COUNT(DISTINCT) (adapted: the supplier blacklist is negative
    account balance, the part↔supplier bridge is lineitem).

    NOT IN compiles to a left-anti join; the key column is
    non-nullable so the NULL-semantics trap in NOT IN (any NULL ⇒
    empty result) cannot fire, and anti-join is safe. The blacklist
    is bounded-small after its filter and broadcasts. COUNT(DISTINCT
    suppkey) per group plans as the two-phase distinct-expand
    aggregate; group count is bounded by brands × sizes, not data.
    """
    lineitem, part, supplier = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    part_f = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        lineitem.join(bad_suppliers, "l_suppkey", "left_anti")
        .join(F.broadcast(part_f), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 6) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 50.0
  )
ORDER BY s_suppkey
"""


@query("q20_promotion_suppliers", oracle=Q20_ORACLE)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved real volume
    of one brand in one year — IN over a grouped HAVING subquery
    (adapted: volume threshold on shipped quantity; no partsupp
    availqty to halve).

    The inner aggregate reduces lineitem to supplier keys before the
    IN materializes, so the semi-join probe carries keys only. The
    brand filter prunes part at its scan and broadcasts into
    lineitem; the year filter is pushed. The outer side is supplier ⋈
    broadcast(nation) — bounded, cheap, and the semi join happens on
    the already-filtered outer.
    """
    supplier, nation, lineitem, part = load_tables(
        spark, sf_dir, "supplier", "nation", "lineitem", "part"
    )
    movers = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(movers, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name", r6(F.col("s_acctbal")).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


Q21_ORACLE = """
WITH flines AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN flines l1 ON s_suppkey = l1.l_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM flines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("q21_waiting_suppliers", oracle=Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on
    multi-supplier finished orders — the EXISTS + NOT-EXISTS double
    self-join (adapted: "late" is shipped >90 days after the order
    date).

    Shape: one shared ``flines`` relation (lineitem ⋈ filtered
    orders, late-ness precomputed as a flag) feeds all three roles.
    The EXISTS is a left-semi and the NOT EXISTS a left-anti join,
    both on the orderkey equi-key with the supplier-inequality as a
    residual — three passes over a relation already reduced to
    (orderkey, suppkey, flag), never a per-row re-scan. All three
    shuffles share the orderkey key, so AQE/exchange-reuse can
    colocate them; the final aggregate is supplier-bounded and the
    top-10 plans as TakeOrderedAndProject.
    """
    lineitem, orders, supplier = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    flines = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    others = flines.select(
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_suppkey").alias("b_suppkey"),
        F.col("is_late").alias("b_late"),
    )
    same_order_other_supp = (F.col("l_orderkey") == F.col("b_orderkey")) & (
        F.col("l_suppkey") != F.col("b_suppkey")
    )
    sole_late = (
        flines.filter(F.col("is_late"))
        .join(others, same_order_other_supp, "left_semi")
        .join(others.filter(F.col("b_late")), same_order_other_supp, "left_anti")
    )
    return (
        sole_late.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
