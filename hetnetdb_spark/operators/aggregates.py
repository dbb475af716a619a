"""Aggregation operators — SURVEY §2.4 (A1, A3–A11; A2 lives in q1).

Spark plans every groupBy here as a two-phase HashAggregate
(map-side partial → shuffle on the group key → final), which is the
distributed-merge model the reference ran across its root/leaf
nodes. Group keys are low-cardinality fixture columns, so shuffle
volume is bounded by (groups × aggregates), independent of input
rows — the shape that survives a 100 TB scan.

Float discipline (SURVEY §5): every double-valued aggregate is
rounded to 6 decimals on both sides; variance-style aggregates are
computed over small-magnitude columns (quantity/discount) so a 6dp
absolute round is far above double accumulation noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6, z6, zround
from hetnetdb_spark.registry import query

# --------------------------------------------------------------------------
# A1 — ungrouped aggregates
# --------------------------------------------------------------------------

A1_ORACLE = """
SELECT COUNT(*)                          AS n_rows,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
             AS DOUBLE), 6)              AS sum_price,
       ROUND(AVG(l_quantity), 6)         AS avg_qty,
       ROUND(MIN(l_discount), 6)         AS min_disc,
       ROUND(MAX(l_tax), 6)              AS max_tax
FROM lineitem
"""


@query("a01_ungrouped_agg", oracle=A1_ORACLE)
def a01_ungrouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — global aggregate: partials per partition, single-row merge."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # decimal accumulation: the whole-table money sum is O(1e10)
        # at sf0.1, where 6dp-rounded double sums drift cross-engine
        r6(F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
           .cast("double")).alias("sum_price"),
        r6(F.avg("l_quantity")).alias("avg_qty"),
        r6(F.min("l_discount")).alias("min_disc"),
        r6(F.max("l_tax")).alias("max_tax"),
    )


# --------------------------------------------------------------------------
# A3 — COUNT(DISTINCT)
# --------------------------------------------------------------------------

A3_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("a03_count_distinct", oracle=A3_ORACLE)
def a03_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — exact distinct counts; Spark plans two distinct columns
    as an Expand (one shuffle per distinct key set) — exact but
    shuffle-heavy, which is why A4 exists for the 100 TB path."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# A4 — approx_count_distinct (HLL; rows-only: approximate by design)
# --------------------------------------------------------------------------


A4_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS exact_n_supp,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_n_orders,
       TRUE AS supp_within_6pct,
       TRUE AS orders_within_6pct
FROM lineitem
GROUP BY l_returnflag
"""


@query("a04_approx_count_distinct", oracle=A4_ORACLE)
def a04_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — HyperLogLog++ distinct estimate: the scale path for
    distinct counts — one pass, fixed-size sketch per group,
    mergeable across partitions; no Expand, no second shuffle.

    Oracle strategy (a16's "approximate ≠ unverifiable" contract):
    the estimate itself is engine-specific, so the query emits the
    EXACT distinct counts (hash-comparable) plus per-column flags
    checking the estimate against them at a pinned 6% bound — 3×
    the requested rsd=0.02, i.e. a three-standard-error band the
    HLL++ bias-corrected estimator stays inside for these
    cardinalities (1–25k per group; empirically ≤2.2% here). The
    oracle pins the flags TRUE: estimator drift past the band is a
    hash FAIL, not an invisible quality loss. The exact counts ride
    the same output row (broadcast-joined on the 3-value group key),
    and the HLL merge is register-max — partition-order independent —
    so the flags are stable, not flaky.

    Plan note (round-10 honest-bench finding): the two sides are
    deliberately SEPARATE aggregations. Planning multi-column
    ``countDistinct`` (an Expand: one replicated row-stream per
    distinct column) together with the imperative HLL aggregate in
    ONE agg forces the sketch buffers through the expanded
    distinct machinery — measured 15.2 s vs 1.2 s + 0.75 s split,
    at sf0.1. Two passes over the fact beat one pathological pass;
    the join side is 3 rows."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    approx = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_n_supp"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_n_orders"),
    )
    exact = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact_n_supp"),
        F.countDistinct("l_orderkey").alias("exact_n_orders"),
    )
    agg = exact.join(F.broadcast(approx), "l_returnflag")
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(0.06) * F.col(e)
    )
    return agg.select(
        "l_returnflag",
        "exact_n_supp",
        "exact_n_orders",
        within("approx_n_supp", "exact_n_supp").alias("supp_within_6pct"),
        within("approx_n_orders", "exact_n_orders").alias("orders_within_6pct"),
    )


# --------------------------------------------------------------------------
# A5 — HAVING
# --------------------------------------------------------------------------

A5_ORACLE = """
SELECT o_custkey,
       COUNT(*)                      AS n_orders,
       ROUND(SUM(o_totalprice), 6)   AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12 AND SUM(o_totalprice) > 100000
"""


@query("a05_having", oracle=A5_ORACLE)
def a05_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — HAVING is a post-aggregate filter; note it filters on the
    *unrounded* sum (matching SQL semantics), rounding only for
    output parity."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_total_spend_raw"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_total_spend_raw") > 100000))
        .select(
            "o_custkey",
            "n_orders",
            r6(F.col("_total_spend_raw")).alias("total_spend"),
        )
    )


# --------------------------------------------------------------------------
# A6 — conditional aggregates (FILTER clause)
# --------------------------------------------------------------------------

A6_ORACLE = """
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 50)                       AS n_high,
       ROUND(COALESCE(SUM(value) FILTER (WHERE value > 50), 0), 6) AS sum_high,
       COUNT(*)                                                 AS n_all
FROM events
GROUP BY event_type
"""


@query("a06_conditional_agg", oracle=A6_ORACLE)
def a06_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — FILTER-clause aggregates as count(when)/sum(when)."""
    (events,) = load_tables(spark, sf_dir, "events")
    high = F.col("value") > 50
    return events.groupBy("event_type").agg(
        F.count(F.when(high, 1)).alias("n_high"),
        r6(F.coalesce(F.sum(F.when(high, F.col("value"))), F.lit(0.0))).alias("sum_high"),
        F.count(F.lit(1)).alias("n_all"),
    )


# --------------------------------------------------------------------------
# A7 — stddev / variance
# --------------------------------------------------------------------------

A7_ORACLE = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
       ROUND(var_samp(l_quantity), 6)    AS var_qty,
       ROUND(stddev_samp(l_discount), 6) AS sd_disc
FROM lineitem
GROUP BY l_returnflag
"""


@query("a07_stddev_variance", oracle=A7_ORACLE)
def a07_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — sample stddev/variance over small-magnitude columns
    (quantity ∈ [1,50], discount ∈ [0,0.1]) so 6dp rounding sits far
    above both engines' accumulation noise."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r6(F.var_samp("l_quantity")).alias("var_qty"),
        r6(F.stddev_samp("l_discount")).alias("sd_disc"),
    )


# --------------------------------------------------------------------------
# A8 — percentiles (exact, interpolated — matches quantile_cont)
# --------------------------------------------------------------------------

A8_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6)       AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 6)       AS p90_qty,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("a08_percentiles", oracle=A8_ORACLE)
def a08_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exact linear-interpolation percentiles (`F.percentile` ≡
    DuckDB quantile_cont). The scale path is
    `F.percentile_approx` (KLL-style sketch, mergeable); exact
    percentile needs the group's values together and is kept for
    parity-checkable semantics."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        r6(F.percentile("l_quantity", 0.5)).alias("p50_qty"),
        r6(F.percentile("l_quantity", 0.9)).alias("p90_qty"),
        r6(F.percentile("l_extendedprice", 0.25)).alias("p25_price"),
    )


# --------------------------------------------------------------------------
# A9 — collect_list / collect_set (canonicalized to sorted CSV strings)
# --------------------------------------------------------------------------

A9_ORACLE = """
SELECT l_returnflag,
       (SELECT string_agg(s, ',' ORDER BY s)
        FROM (SELECT DISTINCT l_linestatus AS s
              FROM lineitem i
              WHERE i.l_returnflag = o.l_returnflag) t) AS statuses,
       COUNT(l_linestatus)                              AS n_collected
FROM lineitem o
GROUP BY l_returnflag
"""


@query("a09_collect_list_set", oracle=A9_ORACLE)
def a09_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — collect_set canonicalized via array_sort + concat_ws so
    the (orderless) set compares stably across engines;
    collect_list is exercised via its length (its element order is
    partition-dependent by definition)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        F.size(F.collect_list("l_linestatus")).cast("long").alias("n_collected"),
    )


# --------------------------------------------------------------------------
# A10 — ROLLUP / CUBE
# --------------------------------------------------------------------------

A10_ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 6)     AS sum_qty,
       COUNT(*)                      AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@query("a10_rollup", oracle=A10_ROLLUP_ORACLE)
def a10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — ROLLUP; grouping-null keys coalesced to 'ALL' on both
    sides (fixture keys are non-null, so the sentinel is unambiguous
    and keeps nulls out of the hash comparison)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            r6(F.sum("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


A10_CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL')  AS returnflag,
       COALESCE(l_linestatus, 'ALL')  AS linestatus,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
             AS DOUBLE), 6) AS sum_price
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@query("a10_cube", oracle=A10_CUBE_ORACLE)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — CUBE (adds the per-linestatus margins ROLLUP lacks)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            r6(F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
               .cast("double")).alias("sum_price")
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
        )
    )


# --------------------------------------------------------------------------
# A11 — deterministic first/last in group (via window)
# --------------------------------------------------------------------------

A11_ORACLE = """
SELECT o_orderpriority, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
FROM (
  SELECT o_orderpriority, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) t
WHERE rn = 1
"""


@query("a11_first_in_group", oracle=A11_ORACLE)
def a11_first_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — earliest order per priority. `F.first` is
    partition-order-dependent, so the deterministic form is a window
    row_number over a total order (date + unique key tiebreaker)."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )


# --------------------------------------------------------------------------
# A12 (beyond contract) — salted two-phase aggregation for skewed keys
# --------------------------------------------------------------------------

A12_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       ROUND(MAX(value), 6)     AS max_value
FROM events
GROUP BY event_type
"""


@query("a12_salted_agg", oracle=A12_ORACLE)
def a12_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond SURVEY §2 — the manual salting pattern for aggregation
    over pathologically skewed keys (events has only 5 event_types,
    so one reducer per key at 100 TB would hot-spot).

    Phase 1 groups by (key, salt=crc32(event_id)%16): 80 groups
    spread over all reducers; phase 2 merges the 80 partials on the
    bare key. Every aggregate must be decomposable (count→sum,
    sum→sum, max→max — avg would ship as sum+count). Same answer,
    same oracle, no hot partition. Spark's own AQE skew-join
    handles *join* skew at runtime; aggregation salt remains a
    hand-applied pattern, hence this named operator.
    """
    (events,) = load_tables(spark, sf_dir, "events")
    salted = events.withColumn("salt", F.crc32(F.col("event_id").cast("string")) % 16)
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        # Decimal partials: the phase-2 merge receives the 16 salt
        # partials in nondeterministic fetch order, and double
        # addition is not associative — decimal accumulation is
        # exact, so the merged sum is order-independent.
        F.sum(F.col("value").cast("decimal(18,6)")).alias("psum"),
        F.max("value").alias("pmax"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
        F.round(F.max("pmax"), 6).alias("max_value"),
    )


# --------------------------------------------------------------------------
# A10 — GROUPING SETS (SQL entry; arbitrary grouping combinations)
# --------------------------------------------------------------------------

A10_GSETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL')           AS returnflag,
       COALESCE(CAST(l_linenumber AS BIGINT), -1)   AS lineno,
       CAST(COUNT(*) AS BIGINT)                AS n,
       ROUND(SUM(l_quantity), 6)               AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linenumber), ())
"""


@query("a10_grouping_sets", oracle=A10_GSETS_SQL)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — explicit GROUPING SETS (flag margins, line-number
    margins, grand total — a combination neither rollup nor cube
    produces). Runs through the SQL entry path; the oracle IS the
    same statement. Spark plans one Expand + single hash aggregate,
    so the input is read once for all three groupings."""
    from hetnetdb_spark.catalog import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(A10_GSETS_SQL)


# --------------------------------------------------------------------------
# A13 — pivot (wide conditional aggregation)
# --------------------------------------------------------------------------

A13_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS "F",
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS "O"
FROM lineitem
GROUP BY l_returnflag
"""


@query("a13_pivot", oracle=A13_ORACLE)
def a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — `groupBy().pivot()` with EXPLICIT pivot values.

    Passing the value list up front matters at scale: without it
    Spark runs a separate distinct scan over the input just to
    discover the columns. With it, the pivot compiles to one hash
    aggregate of conditional sums — exactly the oracle's CASE WHEN
    formulation, read the input once."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(r6(F.sum("l_quantity")))
    )


# --------------------------------------------------------------------------
# A14 — unpivot / melt (wide → long)
# --------------------------------------------------------------------------

A14_ORACLE = """
WITH agg AS (
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 6)      AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE), 6)           AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
"""


@query("a14_unpivot", oracle=A14_ORACLE)
def a14_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — `unpivot` (melt): one row per (group, metric). Spark's
    Expand node emits both long rows per input row in one pass — the
    oracle's UNION ALL shape without the second scan."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        r6(F.sum("l_quantity")).alias("sum_qty"),
        r6(F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
           .cast("double")).alias("sum_price"),
    )
    return agg.unpivot("l_returnflag", ["sum_qty", "sum_price"], "metric", "value")


# --------------------------------------------------------------------------
# A16 — HLL sketch aggregation + merge (incremental distinct)
# --------------------------------------------------------------------------


A16_ORACLE = """
SELECT CAST(COUNT(DISTINCT DATE_TRUNC('month', o_orderdate)) AS BIGINT)
           AS n_months,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS approx_within_2pct
FROM orders
"""


@query("a16_hll_sketch_union", oracle=A16_ORACLE)
def a16_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — the incremental-distinct pattern: build one HyperLogLog
    sketch per month (`hll_sketch_agg`), then merge sketches
    (`hll_union_agg`) for the global estimate instead of re-scanning
    history. At 100 TB this is THE way rolling distinct-user counts
    work: daily partitions each persist a KB-sized sketch, and any
    date range is answered by unioning sketches — O(days), not
    O(rows).

    Oracle strategy: the sketch binary and its estimate are
    engine-specific, so the estimate itself can't hash-compare — but
    the CONTRACT can. The query emits the exact distinct (hash-
    comparable) plus `approx_within_2pct`, the merged-sketch estimate
    checked against the exact count at the sketch's pinned relative-
    error bound (lgConfigK=12 → ~1.6% standard error; ±2% is the
    golden bound tests/test_golden.py pins). The oracle emits the
    same exact count and literal TRUE: if the HLL merge ever drifts
    past 2%, the boolean flips and the driver's hash check fails.
    HLL merge is max-per-register — associative and commutative — so
    the Spark-side estimate is deterministic under any partition
    order and the boolean is stable, not a flake."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    merged = monthly.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("approx_customers"),
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_customers"))
    return merged.crossJoin(exact).select(
        "n_months",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= F.lit(0.02) * F.col("exact_customers")
        ).alias("approx_within_2pct"),
    )


# --------------------------------------------------------------------------
# A17 — bitmap exact-distinct (mergeable, unlike COUNT DISTINCT)
# --------------------------------------------------------------------------

A17_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderpriority
"""


@query("a17_bitmap_distinct", oracle=A17_ORACLE)
def a17_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 — EXACT distinct via mergeable bitmaps: bucket each key
    (`bitmap_bucket_number`/`bitmap_bit_position`), build one bitmap
    per (group, bucket) with `bitmap_construct_agg`, popcount and
    sum. Unlike COUNT(DISTINCT) — whose dedup state must gather per
    group — bitmaps pre-aggregate map-side and OR-merge
    associatively, so daily partitions can persist bitmaps and any
    range is answered by merging them: the exact-count sibling of
    a16's HLL pattern, for key domains dense enough to bitmap. The
    oracle is plain COUNT(DISTINCT): same answer, different
    mergeability."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    positioned = orders.select(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
    )
    per_bucket = positioned.groupBy("o_orderpriority", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_customers")
    )


# --------------------------------------------------------------------------
# A18 — incremental rollup via mergeable partial aggregates
# --------------------------------------------------------------------------

A18_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)  AS n,
       ROUND(SUM(value), 6)      AS sum_value,
       ROUND(SUM(value) / COUNT(*), 6) AS avg_value,
       MIN(ts)                   AS first_ts,
       MAX(ts)                   AS last_ts
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("a18_incremental_rollup", oracle=A18_ORACLE)
def a18_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — incremental rollup: partial aggregates computed
    on two disjoint batches of events, then MERGED into the final
    answer — the algebraic-aggregate decomposition (count/sum/min/max
    merge by sum/sum/min/max; avg re-derives from merged sum÷count,
    never by averaging averages) that every incremental
    materialized view and every distributed partial→final aggregate
    is built on. The reference engine's root/leaf split computed
    exactly this merge over node-local partials; here the two
    "nodes" are deterministic event_id slices and the oracle is the
    direct one-shot aggregate, certifying the merge is lossless.

    Scale posture: this is the maintenance plan for a 100 TB rolling
    rollup — yesterday's snapshot is one partial, today's delta the
    other; merging costs |groups|, not |input|. All merge math is
    plain grouped aggregation, so Catalyst runs the same partial→
    final machinery inside each batch too.
    """
    (events,) = load_tables(spark, sf_dir, "events")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    snapshot = partial(events.filter(F.col("event_id") % 3 != 2))
    delta = partial(events.filter(F.col("event_id") % 3 == 2))
    return (
        snapshot.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            r6(F.sum("sum_value")).alias("sum_value"),
            r6(F.sum("sum_value") / F.sum("n")).alias("avg_value"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A19 — one-pass cross-column correlation / covariance profile
# --------------------------------------------------------------------------

A19_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)                                    AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0           AS corr_qty_price,
       ROUND(corr(l_discount, l_extendedprice), 6) + 0.0           AS corr_disc_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) + 0.0     AS cov_qty_price,
       ROUND(covar_pop(l_discount, l_tax), 6) + 0.0                AS cov_disc_tax
FROM lineitem
GROUP BY l_returnflag
"""


@query("a19_correlation_profile", oracle=A19_ORACLE)
def a19_correlation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19 — cross-column dependence in ONE aggregate pass: Pearson
    correlation and sample/population covariance for several column
    pairs at once. All four are algebraic aggregates (each is a
    closed form over sum/sum-of-products moments), so Spark computes
    partial moments map-side and merges — one scan, one shuffle of
    per-group moment tuples, regardless of how many pairs are
    profiled. Rounding is magnitude-aware: `corr` is in [-1, 1] and
    `cov_disc_tax` is O(1e-3), so 6dp absorbs last-ulp merge-order
    drift there, but `covar_samp(l_quantity, l_extendedprice)` is
    O(1e4-1e5) and its distributed-vs-sequential co-moment merge
    drifts past 1e-6 ABSOLUTE at scale (the round-4 driver caught
    exactly this), so that column rounds at 2dp on both sides.
    Every rounded column here can be negative, so rounding goes
    through `zround` (`round + 0.0`) on BOTH sides: a value rounding
    to zero from below is `-0.0`, numerically equal but a different
    bit pattern than `0.0`, and the driver hashes bytes — the r4/r5
    red row was exactly Spark `0.0` vs DuckDB `-0.0` on
    `cov_disc_tax` for group N. Complements s17's per-column profile
    with the between-column view a feature-selection pass needs."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        z6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        z6(F.corr("l_discount", "l_extendedprice")).alias("corr_disc_price"),
        zround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
        z6(F.covar_pop("l_discount", "l_tax")).alias("cov_disc_tax"),
    )


# --------------------------------------------------------------------------
# A20 — GROUPING()/grouping_id: subtotal rows vs genuine NULL keys
# --------------------------------------------------------------------------

A20_ORACLE = """
SELECT o_orderstatus,
       pri,
       CAST(GROUPING(o_orderstatus) AS INT)  AS g_status,
       CAST(GROUPING(pri) AS INT)            AS g_pri,
       CAST(GROUPING(o_orderstatus, pri) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT)              AS n_orders
FROM (
    SELECT o_orderstatus,
           NULLIF(o_orderpriority, '3-MEDIUM') AS pri
    FROM orders
) t
GROUP BY ROLLUP(o_orderstatus, pri)
"""


@query("a20_grouping_id", oracle=A20_ORACLE)
def a20_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 — the disambiguation A10's COALESCE trick cannot give
    when grouping keys are genuinely nullable: `pri` is NULL for
    every medium-priority order, so a rollup emits NULL both for
    those data rows AND for subtotal rows. GROUPING(col) (0 = real
    key, 1 = aggregated-away) and the grouping_id bitmask tell them
    apart — both engines define the same bit order (first listed
    key = high bit). Plan-wise this is still ONE Expand + one
    shuffle; the flags are free metadata on rows the rollup already
    produces."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderstatus",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri"),
    )
    return t.rollup("o_orderstatus", "pri").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("pri").cast("int").alias("g_pri"),
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A22 — arg-extremum (max_by/min_by) + deterministic mode per group
# --------------------------------------------------------------------------

A22_ORACLE = """
WITH status_counts AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY COUNT(*) DESC, o_orderstatus
           ) AS rn
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
)
SELECT a.o_orderpriority,
       CAST(arg_max(a.o_orderkey, a.o_orderkey) AS BIGINT)       AS newest_key,
       ROUND(arg_max(a.o_totalprice, a.o_orderkey), 6)           AS newest_price,
       ROUND(arg_min(a.o_totalprice, a.o_orderkey), 6)           AS oldest_price,
       CAST(arg_max(a.o_custkey, a.o_orderkey) AS BIGINT)        AS newest_cust,
       (SELECT s.o_orderstatus FROM status_counts s
        WHERE s.o_orderpriority = a.o_orderpriority AND s.rn = 1) AS mode_status
FROM orders a
GROUP BY a.o_orderpriority
ORDER BY a.o_orderpriority
"""


@query("a22_argmax_mode", oracle=A22_ORACLE)
def a22_argmax_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22 — arg-extremum aggregates: `max_by`/`min_by` (DuckDB
    arg_max/arg_min) pull a DIFFERENT column's value from the
    extremal row — "the price of each priority's newest order" —
    without a self-join back to the row, and they merge map-side
    like any algebraic aggregate (carry the best (key, value) pair).

    Determinism discipline: every max_by/min_by here orders by the
    UNIQUE o_orderkey — both engines define arg-extrema on ties as
    "any tied row", so arg over a non-unique ordering value is an
    engine-defined result and is deliberately avoided. Same for
    mode: native `mode()` breaks frequency ties in engine-defined
    encounter order, so the mode is spelled as the deterministic
    count + row_number idiom (tie -> lexicographically first
    status), the W6 top-k shape over |groups|x|domain| rows — tiny,
    and parity-safe where the native aggregate is not. The rollup
    and the mode branch share one shuffle key (priority), and the
    mode join is a broadcast of a 5-row relation."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_orderkey").cast("long").alias("newest_key"),
        r6(F.max_by("o_totalprice", "o_orderkey")).alias("newest_price"),
        r6(F.min_by("o_totalprice", "o_orderkey")).alias("oldest_price"),
        F.max_by("o_custkey", "o_orderkey").cast("long").alias("newest_cust"),
    )
    wm = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), "o_orderstatus"
    )
    mode = (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("mode_status"))
    )
    return agg.join(F.broadcast(mode), "o_orderpriority").orderBy(
        "o_orderpriority"
    )


# --------------------------------------------------------------------------
# A23 — approx_percentile with a checkable rank-error contract
# --------------------------------------------------------------------------

A23_ACCURACY = 10000  # Spark's default percentile_approx accuracy knob

A23_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS p50_rank_ok,
       TRUE AS p90_rank_ok
FROM lineitem
GROUP BY l_returnflag
"""


@query("a23_approx_percentile_bound", oracle=A23_ORACLE)
def a23_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 — `percentile_approx` (Greenwald-Khanna sketch: one pass,
    mergeable, fixed memory — the 100 TB path a08's exact
    percentile cannot take) verified against its own contract: GK
    guarantees the returned value's RANK is within n/accuracy of
    the requested quantile. A value-tolerance check would be wrong
    (value error is unbounded on skewed data); the rank check is
    the real guarantee, and with heavy ties (l_quantity is integer
    1..50) a value occupies a rank INTERVAL [count(<v), count(<=v)],
    so the flag asserts that interval overlaps [q-eps, q+eps].

    Plan: one grouped agg computes the sketch values + exact counts;
    the 3-row result broadcasts back onto lineitem for the rank
    counts (map-side compares, second |groups|-sized agg); flags
    derive from exact integer counts and literal bounds, so both
    engines — the oracle simply pins them TRUE over exact COUNT(*)
    — agree bit-for-bit. Estimator drift past the published bound
    is a hash FAIL (the a16/a04 pattern, applied to quantiles)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    eps = 1.0 / A23_ACCURACY + 1e-9
    sk = lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, A23_ACCURACY).alias("v50"),
        F.percentile_approx("l_quantity", 0.9, A23_ACCURACY).alias("v90"),
    )
    joined = lineitem.select("l_returnflag", "l_quantity").join(
        F.broadcast(sk), "l_returnflag"
    )
    counted = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity") < F.col("v50"), 1)).alias("lt50"),
        F.count(F.when(F.col("l_quantity") <= F.col("v50"), 1)).alias("le50"),
        F.count(F.when(F.col("l_quantity") < F.col("v90"), 1)).alias("lt90"),
        F.count(F.when(F.col("l_quantity") <= F.col("v90"), 1)).alias("le90"),
    )

    def rank_ok(lt: str, le: str, q: float):
        n = F.col("n_rows").cast("double")
        return (F.col(le).cast("double") / n >= F.lit(q - eps)) & (
            F.col(lt).cast("double") / n <= F.lit(q + eps)
        )

    return counted.select(
        "l_returnflag",
        "n_rows",
        rank_ok("lt50", "le50", 0.5).alias("p50_rank_ok"),
        rank_ok("lt90", "le90", 0.9).alias("p90_rank_ok"),
    )


# --------------------------------------------------------------------------
# A24 — weighted quantiles, integer-exact (cumulative-weight crossing)
# --------------------------------------------------------------------------

A24_ORACLE = """
WITH wt AS (
    SELECT lang, doc_id, n_chars,
           GREATEST(len(string_split(text, ' ')), 1) AS w
    FROM documents
),
cum AS (
    SELECT lang, n_chars, w,
           SUM(w) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
           SUM(w) OVER (PARTITION BY lang) AS tw
    FROM wt
)
SELECT lang,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN n_chars END) AS BIGINT)
           AS weighted_median,
       CAST(MIN(CASE WHEN 10 * cw >= 9 * tw THEN n_chars END) AS BIGINT)
           AS weighted_p90
FROM cum
GROUP BY lang
"""


@query("a24_weighted_quantiles", oracle=A24_ORACLE)
def a24_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24 — token-weighted median and p90 of document length per
    language. Unweighted percentiles (a08) answer "the median
    DOCUMENT"; a training pipeline budgets TOKENS, so it wants "the
    document length at which half the token mass is reached" —
    neither engine has a weighted_percentile builtin, and the
    composition is the classic cumulative-weight crossing:

    sort each group by (value, unique tiebreak), running-sum the
    weights, and the q-quantile is the value of the first row where
    cum_weight >= q * total_weight. Both crossings are INTEGER
    comparisons (2*cw >= tw, 10*cw >= 9*tw on int64 token counts) —
    no double division, no interpolation, so cross-engine parity is
    exact by construction rather than by rounding discipline. The
    qualifying set is upward-closed in the sort order, so
    MIN(value) over it IS the crossing row's value — one aggregate,
    no second window or self-join.

    Plan: ONE shuffle on lang serves the running-sum window, the
    per-group total (a full-range window over the same partition
    spec — no extra exchange) and the final hash agg. Weight and
    value stay (long, long) through the shuffle. At 100 TB the
    per-group sort is the cost — the same cost the unweighted exact
    percentile pays, with approx_percentile as the documented
    escape hatch when interpolation error is acceptable (a23)."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    wt = documents.select(
        "lang",
        "doc_id",
        "n_chars",
        F.greatest(F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(1)).alias(
            "w"
        ),
    )
    w_run = (
        Window.partitionBy("lang")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    cum = wt.select(
        "lang",
        "n_chars",
        F.sum("w").over(w_run).alias("cw"),
        F.sum("w").over(w_all).alias("tw"),
    )
    return cum.groupBy("lang").agg(
        F.max("tw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("n_chars")))
        .cast("long")
        .alias("weighted_median"),
        F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("n_chars")))
        .cast("long")
        .alias("weighted_p90"),
    )


# --------------------------------------------------------------------------
# A25 — sketch intersection via inclusion-exclusion (HLL composition)
# --------------------------------------------------------------------------

A25_ORACLE = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE date_part('year', o_orderdate) = 1999),
b AS (SELECT DISTINCT o_custkey FROM orders
      WHERE date_part('year', o_orderdate) = 2000)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS exact_b,
       CAST((SELECT COUNT(*) FROM a JOIN b USING (o_custkey)) AS BIGINT)
           AS exact_both,
       TRUE AS approx_within_bound
"""


@query("a25_sketch_intersection", oracle=A25_ORACLE)
def a25_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 — estimate the 1999∩2000 repeat-customer count from two
    HLL sketches by inclusion-exclusion: |A∩B| ≈ est(A) + est(B) −
    est(A∪B), where est(A∪B) comes from MERGING the two sketches
    (no third scan). This is the composition a16's per-partition
    sketches exist for — overlap questions between any two
    partition ranges answered from persisted KB-size state, zero
    row re-reads. The known caveat is honest in the bound:
    inclusion-exclusion compounds three estimates' errors, so the
    contract is ABSOLUTE in the union (|err| ≤ 6% of |A|+|B| covers
    3 × the ~1.6%/2% per-sketch bound), not relative to the
    intersection — HLL intersection of barely-overlapping sets is
    noise, and callers who need tight small-overlap counts use the
    exact bitmap path (a17).

    Oracle strategy: a16's — exact values hash-compare, the
    estimate is pinned by a boolean the oracle asserts TRUE. HLL
    merge is max-per-register, so the estimate is partition-order
    deterministic and the flag cannot flake."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    sketches = (
        orders.filter(yr.isin(1999, 2000))
        .groupBy(yr.alias("y"))
        .agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    )
    est = sketches.agg(
        F.sum(
            F.when(
                F.col("y") == 1999,
                F.hll_sketch_estimate(F.col("sketch")),
            )
        ).alias("est_a"),
        F.sum(
            F.when(
                F.col("y") == 2000,
                F.hll_sketch_estimate(F.col("sketch")),
            )
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_union"),
    )
    a = orders.filter(yr == 1999).select("o_custkey").distinct()
    b = orders.filter(yr == 2000).select("o_custkey").distinct()
    exact = (
        a.alias("a")
        .join(b.alias("b"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_both"))
        .crossJoin(a.agg(F.count(F.lit(1)).alias("exact_a")))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("exact_b")))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_a",
        "exact_b",
        "exact_both",
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                - F.col("exact_both")
            )
            <= F.lit(0.06) * (F.col("exact_a") + F.col("exact_b"))
        ).alias("approx_within_bound"),
    )


# --------------------------------------------------------------------------
# A26 — median absolute deviation (robust spread, integer-exact)
# --------------------------------------------------------------------------

A26_ORACLE = """
WITH med AS (
    SELECT lang, n_chars,
           COUNT(*) OVER (PARTITION BY lang) AS n,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id) AS rk
    FROM documents
),
m AS (
    SELECT lang, MIN(CASE WHEN 2 * rk >= n + 1 THEN n_chars END) AS median
    FROM med GROUP BY lang
),
dev AS (
    SELECT d.lang, abs(d.n_chars - m.median) AS dv, d.doc_id
    FROM documents d JOIN m USING (lang)
),
dmed AS (
    SELECT lang, dv,
           COUNT(*) OVER (PARTITION BY lang) AS n,
           row_number() OVER (PARTITION BY lang ORDER BY dv, doc_id) AS rk
    FROM dev
)
SELECT d.lang,
       CAST(m.median AS BIGINT) AS median_chars,
       CAST(MIN(CASE WHEN 2 * d.rk >= d.n + 1 THEN d.dv END) AS BIGINT)
           AS mad_chars
FROM dmed d JOIN m ON m.lang = d.lang
GROUP BY d.lang, m.median
"""


@query("a26_mad_robust_stats", oracle=A26_ORACLE)
def a26_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26 — median absolute deviation of document length per
    language: the robust spread statistic (stddev is wrecked by one
    10 MB crawl artifact; MAD is not), the denominator of the
    "modified z-score" outlier rule corpus cleaning uses where
    a07's moment statistics are too fragile.

    MAD is a nested order statistic — median(|x − median(x)|) — so
    it needs two ranked passes: (1) lower median per lang via
    row_number + the 2·rk ≥ n+1 crossing (all-integer — the
    unweighted sibling of a24's crossing), (2) broadcast the
    |groups|-row median table back, rank absolute deviations the
    same way. Two lang exchanges (one per ranked pass — inherent:
    pass 2's sort key DEPENDS on pass 1's result), every compared
    value an int64, exact parity by construction.

    At 100 TB each pass is a per-group sort (the exact-median
    price, same as a08); approx MAD via two approx_percentile
    passes is the documented cheap variant when 1% error is fine."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    w_rk = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("lang")
    med = (
        documents.select(
            "lang",
            "n_chars",
            F.count(F.lit(1)).over(w_n).alias("n"),
            F.row_number().over(w_rk).alias("rk"),
        )
        .groupBy("lang")
        .agg(
            F.min(
                F.when(2 * F.col("rk") >= F.col("n") + 1, F.col("n_chars"))
            ).alias("median")
        )
    )
    dev = documents.join(F.broadcast(med), "lang").select(
        "lang",
        "doc_id",
        F.abs(F.col("n_chars") - F.col("median")).alias("dv"),
        "median",
    )
    w_drk = Window.partitionBy("lang").orderBy("dv", "doc_id")
    return (
        dev.select(
            "lang",
            "median",
            "dv",
            F.count(F.lit(1)).over(w_n).alias("n"),
            F.row_number().over(w_drk).alias("rk"),
        )
        .groupBy("lang", "median")
        .agg(
            F.min(F.when(2 * F.col("rk") >= F.col("n") + 1, F.col("dv")))
            .cast("long")
            .alias("mad_chars")
        )
        .select(
            "lang",
            F.col("median").cast("long").alias("median_chars"),
            "mad_chars",
        )
    )


# --------------------------------------------------------------------------
# A30 — linear-regression aggregate family (regr_*)
# --------------------------------------------------------------------------

A30_ORACLE = """
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)  AS n,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) + 0.0     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) + 0.0 AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) + 0.0        AS r2,
       ROUND(regr_avgx(l_extendedprice, l_quantity), 6)         AS avg_x,
       ROUND(regr_avgy(l_extendedprice, l_quantity), 6)         AS avg_y
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("a30_regression_profile", oracle=A30_ORACLE)
def a30_regression_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30 — the ANSI regr_* aggregate family (slope, intercept, R²,
    per-group means, pair count) of extendedprice on quantity, the
    one-pass OLS both engines ship natively.

    Float posture (why this is safe where raw regr_slope normally
    isn't): every regr_* output is a RATIO of second-order co-moments
    — slope = Sxy/Sxx, R² = Sxy²/(Sxx·Syy) — so although each engine
    accumulates the co-moments in its own partition order (absolute
    drift O(1e-5) on the O(1e10) sums at sf0.1), the drift CANCELS in
    the quotient: relative error stays O(1e-12), far inside the 6dp
    rounding window on the O(1e2) slope / O(1e4) intercept values.
    This is the q11 scale-free-ratio discipline applied to the
    regression surface; l45_zipf_slope is the contrasting case where
    a SMALL slope (O(1e-1)) on huge log-sums needed full decimal
    co-moments. Verified differentially at sf0.001/0.01/0.1.

    Scale: algebraic aggregate — six partial moments per group merge
    map-side; shuffle carries |groups| × 6 doubles at any input
    size. The 100-TB "fit a trend per segment" query is exactly
    this, and it costs one scan."""
    (li,) = load_tables(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"regr_count({y}, {x})").cast("bigint").alias("n"),
            z6(F.expr(f"regr_slope({y}, {x})")).alias("slope"),
            z6(F.expr(f"regr_intercept({y}, {x})")).alias("intercept"),
            z6(F.expr(f"regr_r2({y}, {x})")).alias("r2"),
            r6(F.expr(f"regr_avgx({y}, {x})")).alias("avg_x"),
            r6(F.expr(f"regr_avgy({y}, {x})")).alias("avg_y"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# A31 — boolean aggregate family (bool_and / bool_or / every / count_if)
# --------------------------------------------------------------------------

A31_ORACLE = """
SELECT o_orderpriority,
       bool_and(o_totalprice > 0)                            AS all_positive,
       bool_or(o_orderstatus = 'F')                          AS any_final,
       bool_and(o_orderdate >= TIMESTAMP '1992-01-01')       AS all_in_era,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
            AS BIGINT)                                       AS n_final,
       CAST(COALESCE(SUM(CASE WHEN o_totalprice > 400000 THEN 1 END), 0)
            AS BIGINT)                                       AS n_large
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("a31_boolean_aggregates", oracle=A31_ORACLE)
def a31_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A31 — the boolean aggregate family: ``bool_and``/``bool_or``
    (with their ANSI aliases ``every``/``any``/``some`` — `every` is
    exercised here and must agree with the oracle's bool_and) and
    ``count_if`` conditional counting. These are the data-quality
    assertion primitives: "every row in this partition satisfies the
    invariant" as a one-row answer rather than a filtered count
    compared to a total (s18's FK audit and l57's idempotency pin
    are consumers of exactly this shape).

    All outputs are boolean/integer — no float surface. count_if is
    Spark-spelled; the oracle uses the portable SUM(CASE) form
    DuckDB 1.0 guarantees.

    Scale: algebraic aggregates (AND/OR/count merge associatively)
    — map-side partials, |groups| rows shuffled, one scan."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
            F.expr("bool_or(o_orderstatus = 'F')").alias("any_final"),
            F.expr("every(o_orderdate >= TIMESTAMP '1992-01-01')").alias(
                "all_in_era"
            ),
            F.expr("count_if(o_orderstatus = 'F')").cast("bigint").alias("n_final"),
            F.expr("count_if(o_totalprice > 400000)").cast("bigint").alias(
                "n_large"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# A32 — SQL PIVOT clause (multi-aggregate, aliased cells)
# --------------------------------------------------------------------------

A32_ORACLE = """
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT)
           AS f_n,
       ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
             THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6)
           AS f_total,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT)
           AS o_n,
       ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O'
             THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6)
           AS o_total,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT)
           AS p_n,
       ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P'
             THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE), 6)
           AS p_total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("a32_sql_pivot_clause", oracle=A32_ORACLE, impure=True)
def a32_sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A32 — the SQL ``PIVOT`` clause with TWO aggregates and
    aliased pivot values — the syntax surface a13's DataFrame
    `.pivot()` does not cover: cell columns are named by the
    analyzer as <valueAlias>_<aggAlias> (f_n, f_total, ...), the
    value list is explicit (an implicit list would make the output
    schema data-dependent — the same determinism reason a13 pins its
    values), and absent combinations produce NULL cells (the count
    coalesces to 0 on both sides, matching COUNT's no-rows value;
    the SUM stays NULL — both behaviors pinned).

    The oracle is the desugared form — conditional aggregation —
    which is also exactly what Catalyst lowers PIVOT to: one
    aggregate pass, no join, no second scan; |priorities| × 6 cells.
    Decimal money accumulation per the q1 discipline."""
    from hetnetdb_spark.catalog import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
        )
        PIVOT (
            CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
                AS total
            FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
        )
        ORDER BY o_orderpriority
        """
    ).selectExpr(
        "o_orderpriority",
        "COALESCE(f_n, CAST(0 AS BIGINT)) AS f_n",
        "f_total",
        "COALESCE(o_n, CAST(0 AS BIGINT)) AS o_n",
        "o_total",
        "COALESCE(p_n, CAST(0 AS BIGINT)) AS p_n",
        "p_total",
    )


# --------------------------------------------------------------------------
# A33 — equi-depth histogram (ntile buckets: the other profiler staple)
# --------------------------------------------------------------------------

A33_ORACLE = """
WITH bucketed AS (
    SELECT o_totalprice,
           ntile(12) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
    FROM orders
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT)       AS n_rows,
       ROUND(MIN(o_totalprice), 6)    AS lo,
       ROUND(MAX(o_totalprice), 6)    AS hi
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


@query("a33_equidepth_histogram", oracle=A33_ORACLE)
def a33_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A33 — equi-DEPTH histogram via ntile: 12 buckets holding
    (near-)equal row counts with data-driven boundaries — the
    complement of s22's equal-WIDTH buckets, and the shape CBO
    column statistics and "where do the quantiles sit" profiling
    actually use (equal-width collapses under skew; equal-depth by
    construction cannot). ntile's remainder rule (first n%k buckets
    get the extra row) is ANSI-defined identically in both engines,
    and the (price, orderkey) ordering carries the unique tiebreaker
    so bucket membership is deterministic at ties — without it the
    bucket min/max at boundaries would be engine-luck (registry
    discipline).

    Scale: a global ntile is a total sort — a deliberate profiler
    cost (o09's bucketed global-rank construction is the
    shuffle-bounded alternative when N is huge); boundaries-only
    output keeps the result |buckets| rows."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(12).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            r6(F.min("o_totalprice")).alias("lo"),
            r6(F.max("o_totalprice")).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# A34 — Benford first-digit audit (data-generation QA classic)
# --------------------------------------------------------------------------

A34_ORACLE = """
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
           1, 1) AS BIGINT) AS d
    FROM orders
    WHERE o_totalprice >= 1
),
counts AS (
    SELECT d, COUNT(*) AS n FROM digits GROUP BY d
),
tot AS (SELECT SUM(n) AS total FROM counts)
SELECT d,
       CAST(n AS BIGINT)                                   AS n,
       ROUND(n / CAST(total AS DOUBLE), 6)                 AS observed,
       ROUND(log10(1.0 + 1.0 / d), 6)                      AS benford,
       ABS(n / CAST(total AS DOUBLE) - log10(1.0 + 1.0 / d)) > 0.05
                                                           AS deviates
FROM counts, tot
ORDER BY d
"""


@query("a34_benford_audit", oracle=A34_ORACLE)
def a34_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A34 — first-significant-digit distribution vs Benford's law:
    the data-quality classic for spotting fabricated or
    badly-generated numeric columns (organic multiplicative data
    leads with 1 about 30% of the time; uniform generators lead
    with every digit equally — and TPC-H-style uniform prices are
    EXPECTED to deviate, which is exactly what the `deviates` flag
    surfaces on this fixture: the audit detecting synthetic data is
    the audit working). First digits extract through exact integer/
    string ops (FLOOR, stringify, first char — no log-based digit
    math that could round differently; the truncation must be an
    EXPLICIT floor because the engines' bare double→BIGINT casts
    disagree at the boundary — Spark truncates toward zero, DuckDB
    rounds half-even, measured as off-by-one digit counts at
    x999.99-class prices); expected frequencies are
    log10 of small exact rationals, identical doubles on both
    engines, and the deviation flag compares at a 0.05 band far
    above any float noise.

    Scale: 9-row output from one scan + one 9-group aggregate —
    the shape every column-level data-quality monitor runs daily."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 6).alias("observed"),
            F.round(benford, 6).alias("benford"),
            (F.abs(obs - benford) > 0.05).alias("deviates"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# A36 — Pareto coverage: how much of the head covers X% of the mass
# --------------------------------------------------------------------------

A36_ORACLE = """
WITH spend AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
           SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents,
           (SELECT SUM(cents) FROM spend)  AS total_cents,
           (SELECT COUNT(*) FROM spend)    AS n_cust
    FROM spend
)
SELECT t.pct,
       CAST(MIN(rk) AS BIGINT)                        AS n_head,
       ROUND(CAST(MIN(rk) AS DOUBLE) / MIN(n_cust), 6) AS head_frac
FROM ranked r
JOIN (VALUES (50), (80), (90), (99)) t(pct)
  ON r.cum_cents * 100 >= r.total_cents * t.pct
GROUP BY t.pct
ORDER BY t.pct
"""


@query("a36_pareto_coverage", oracle=A36_ORACLE)
def a36_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A36 — the Pareto/coverage statistic: the smallest head of
    customers (by spend, descending) whose cumulative spend reaches
    50/80/90/99% of the total — "do 20% of customers carry 80% of
    revenue", answered exactly. The l41/a24 crossing machinery on a
    new axis: money is integer CENTS end-to-end (p13 discipline), so
    the crossing predicate ``cum*100 >= total*pct`` is pure integer
    arithmetic — no ratio, no rounding, no float anywhere until the
    final display fraction. Ties at equal spend order by the unique
    custkey (registry discipline), making every head size
    deterministic.

    Scale: per-customer rollup (one shuffle), then a global
    descending running sum — o09's bucketed prefix-sum shape at
    100 TB; four threshold rows out."""
    from pyspark.sql.window import Window

    (orders,) = load_tables(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), "o_custkey")
    ranked = spend.select(
        "cents",
        F.row_number().over(w).alias("rk"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cents"),
    )
    totals = spend.agg(
        F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n_cust")
    )
    pcts = spark.createDataFrame([(50,), (80,), (90,), (99,)], "pct int")
    return (
        ranked.crossJoin(F.broadcast(totals))
        .join(
            F.broadcast(pcts),
            F.col("cum_cents") * 100 >= F.col("total_cents") * F.col("pct"),
        )
        .groupBy("pct")
        .agg(
            F.min("rk").cast("bigint").alias("n_head"),
            F.round(
                F.min("rk").cast("double") / F.min("n_cust").cast("double"), 6
            ).alias("head_frac"),
        )
        .orderBy("pct")
    )


# --------------------------------------------------------------------------
# A37 — higher moments: skewness/kurtosis across DEFINITION dialects
# --------------------------------------------------------------------------

A37_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)      AS n,
       ROUND(skewness(l_quantity), 6) + 0.0 AS skew_sample,
       ROUND(kurtosis(l_quantity), 6) + 0.0 AS kurt_sample
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("a37_higher_moments", oracle=A37_ORACLE)
def a37_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A37 — third and fourth moments, across the two definition
    dialects the ecosystem ships (measured, n=5 witness in the
    probe): Spark's skewness/kurtosis are the POPULATION statistics
    (g₁ = m₃/m₂^1.5, excess g₂), DuckDB's are the SAMPLE-ADJUSTED
    G₁/G₂ (what pandas and Excel report). The query converts
    Spark's g's through the exact closed-form corrections —
    G₁ = g₁·√(n(n−1))/(n−2),
    G₂ = ((n+1)·g₂ + 6)·(n−1)/((n−2)(n−3)) —
    so the oracle can be DuckDB's NATIVE aggregates: the pin is the
    definition mapping itself, the thing that silently skews every
    cross-system stats report that assumes "skewness is skewness".

    Float posture: g's are ratios of co-moments (a30 cancellation)
    and the corrections are exact rationals in n — r6 holds at all
    three SFs. One algebraic-aggregate pass, |flags| rows."""
    (li,) = load_tables(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    g1 = F.skewness("l_quantity")
    g2 = F.kurtosis("l_quantity")
    G1 = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            zround(G1).alias("skew_sample"),
            zround(G2).alias("kurt_sample"),
        )
        .orderBy("l_returnflag")
    )
