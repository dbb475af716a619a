"""Scalar function library — SURVEY §2.7 (F1–F9), one declared query
per function group.

All functions are JVM built-ins inside whole-stage codegen — no
Python crossings anywhere in this module. Cross-engine gotchas each
query documents and neutralizes:

- integer-returning functions differ in width (Spark int vs DuckDB
  BIGINT) → function-derived ints are cast to long/BIGINT on both
  sides;
- DuckDB ``regexp_replace`` replaces the *first* match unless given
  the ``'g'`` flag, Spark replaces all → oracle always passes 'g';
- DuckDB casts double→int by *rounding*, Spark by truncation →
  truncation is spelled FLOOR explicitly where it matters;
- DATE-typed outputs surface as different pandas dtypes from the
  two engines → date results are carried as timestamps or strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6
from hetnetdb_spark.registry import query

# --------------------------------------------------------------------------
# F1 — string functions
# --------------------------------------------------------------------------

F1_ORACLE = """
SELECT n_name,
       CAST(length(n_name) AS BIGINT)                    AS name_len,
       upper(n_name)                                     AS up,
       lower(n_name)                                     AS low,
       trim(' ' || n_name || ' ')                        AS trimmed,
       substring(n_name, 1, 3)                           AS first3,
       concat_ws('-', n_name, substring(n_name, 1, 1))   AS joined,
       replace(n_name, 'A', '@')                         AS replaced,
       lpad(n_name, 12, '_')                             AS padded,
       CAST(strpos(n_name, 'AN') AS BIGINT)              AS an_pos,
       CAST(len(string_split(n_name, 'A')) AS BIGINT)    AS n_a_parts
FROM nation
"""


@query("f01_string_functions", oracle=F1_ORACLE)
def f01_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — length/upper/lower/trim/substring/concat_ws/replace/
    lpad/instr/split over the nation dim."""
    (nation,) = load_tables(spark, sf_dir, "nation")
    n = F.col("n_name")
    return nation.select(
        n.alias("n_name"),
        F.length(n).cast("long").alias("name_len"),
        F.upper(n).alias("up"),
        F.lower(n).alias("low"),
        F.trim(F.concat(F.lit(" "), n, F.lit(" "))).alias("trimmed"),
        F.substring(n, 1, 3).alias("first3"),
        F.concat_ws("-", n, F.substring(n, 1, 1)).alias("joined"),
        F.replace(n, F.lit("A"), F.lit("@")).alias("replaced"),
        F.lpad(n, 12, "_").alias("padded"),
        F.instr(n, "AN").cast("long").alias("an_pos"),
        F.size(F.split(n, "A")).cast("long").alias("n_a_parts"),
    )


# --------------------------------------------------------------------------
# F2 — regex extract / replace
# --------------------------------------------------------------------------

F2_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1)           AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g')    AS devoweled,
       CAST(regexp_matches(p_type, 'ECONOMY|PROMO') AS INT) AS is_cheap_type
FROM part
WHERE p_partkey <= 500
"""


@query("f02_regex", oracle=F2_ORACLE)
def f02_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — regexp_extract/replace; the oracle passes the 'g' flag
    because DuckDB's regexp_replace is first-match-only by default
    while Spark's replaces every match."""
    (part,) = load_tables(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("ECONOMY|PROMO").cast("int").alias("is_cheap_type"),
    )


# --------------------------------------------------------------------------
# F3 — date / time functions
# --------------------------------------------------------------------------

F3_ORACLE = """
SELECT o_orderkey,
       CAST(date_part('year', o_orderdate) AS BIGINT)   AS yr,
       CAST(date_part('month', o_orderdate) AS BIGINT)  AS mo,
       CAST(date_part('day', o_orderdate) AS BIGINT)    AS dom,
       date_trunc('month', o_orderdate)                 AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
                                                        AS days_to_2002,
       CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)        AS epoch_s,
       o_orderdate + INTERVAL 30 DAY                    AS plus_30d,
       strftime(o_orderdate, '%Y-%m-%d')                AS iso_day
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


@query("f03_datetime", oracle=F3_ORACLE)
def f03_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — year/month/day extraction, month truncation, day diffs,
    epoch seconds, interval arithmetic, and formatting. DATE-typed
    results are avoided in the output (pandas dtype mismatch across
    engines); iso_day carries the to_date semantics as a string."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.filter(d >= F.lit("2001-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
        F.unix_timestamp(d).alias("epoch_s"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


# --------------------------------------------------------------------------
# F4 — math functions
# --------------------------------------------------------------------------

F4_ORACLE = """
SELECT CAST(l_linenumber AS BIGINT)                              AS line_no,
       ROUND(SUM(ROUND(l_extendedprice, 1)), 6)                  AS sum_round1,
       ROUND(SUM(ABS(l_discount - 0.05)), 6)                     AS sum_absdev,
       ROUND(SUM(CAST(CEIL(l_quantity) AS DOUBLE)), 6)           AS sum_ceil,
       ROUND(SUM(CAST(FLOOR(l_tax * 100) AS DOUBLE)), 6)         AS sum_floor_tax,
       ROUND(SUM(SQRT(l_quantity)), 6)                           AS sum_sqrt,
       ROUND(SUM(EXP(l_discount)), 6)                            AS sum_exp,
       ROUND(SUM(LN(l_extendedprice)), 6)                        AS sum_ln,
       ROUND(SUM(LOG10(l_extendedprice)), 6)                     AS sum_log10,
       ROUND(SUM(POW(l_discount, 2)), 6)                         AS sum_pow2,
       ROUND(SUM(SIGN(l_discount - 0.05)), 6)                    AS sum_sign,
       CAST(SUM(CAST(l_orderkey % 7 AS BIGINT)) AS BIGINT)       AS sum_mod7
FROM lineitem
GROUP BY CAST(l_linenumber AS BIGINT)
"""


@query("f04_math", oracle=F4_ORACLE)
def f04_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — round/abs/ceil/floor/sqrt/exp/ln/log10/pow/sign/mod,
    aggregated per line number so every function is exercised on
    every row while the result stays 7 rows."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.col("l_linenumber").cast("long").alias("line_no"))
        .agg(
            r6(F.sum(F.round("l_extendedprice", 1))).alias("sum_round1"),
            r6(F.sum(F.abs(F.col("l_discount") - 0.05))).alias("sum_absdev"),
            r6(F.sum(F.ceil("l_quantity").cast("double"))).alias("sum_ceil"),
            r6(F.sum(F.floor(F.col("l_tax") * 100).cast("double"))).alias("sum_floor_tax"),
            r6(F.sum(F.sqrt("l_quantity"))).alias("sum_sqrt"),
            r6(F.sum(F.exp("l_discount"))).alias("sum_exp"),
            r6(F.sum(F.log("l_extendedprice"))).alias("sum_ln"),
            r6(F.sum(F.log10("l_extendedprice"))).alias("sum_log10"),
            r6(F.sum(F.pow("l_discount", F.lit(2)))).alias("sum_pow2"),
            r6(F.sum(F.signum(F.col("l_discount") - 0.05))).alias("sum_sign"),
            F.sum(F.col("l_orderkey") % 7).alias("sum_mod7"),
        )
    )


# --------------------------------------------------------------------------
# F5 — array / higher-order functions (over the embedding column)
# --------------------------------------------------------------------------

F5_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT)                                  AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6)                          AS first_val,
       ROUND(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS norm_sq,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)         AS n_pos,
       ROUND(CAST(list_aggregate(list_sort(embedding), 'max') AS DOUBLE), 6) AS max_val
FROM embeddings
"""


@query("f05_array_higher_order", oracle=F5_ORACLE)
def f05_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — size/element_at/transform/filter/aggregate/array_sort
    over the 64-dim embedding vectors; per-element math is cast to
    double *before* multiplying so both engines accumulate
    identically (float32 accumulation would drift past 6dp)."""
    (embeddings,) = load_tables(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return embeddings.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        r6(F.element_at(emb, 1).cast("double")).alias("first_val"),
        r6(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("norm_sq"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        r6(F.element_at(F.array_sort(emb), -1).cast("double")).alias("max_val"),
    )


# --------------------------------------------------------------------------
# F6 — JSON → struct (from_json over events.props)
# --------------------------------------------------------------------------

F6_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*)                                               AS n
FROM events
GROUP BY event_type
"""


@query("f06_from_json_struct", oracle=F6_ORACLE)
def f06_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — from_json with an explicit struct schema (never
    schema_of_json over the data at scale: that is a second scan),
    then struct field access and aggregation."""
    (events,) = load_tables(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        events.select("event_type", parsed.getField("k").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# F7 — JSON path extraction (get_json_object)
# --------------------------------------------------------------------------

F7_ORACLE = """
SELECT event_type,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
         AS n_big_k,
       MIN(json_extract_string(props, '$.k')) AS min_k_str
FROM events
GROUP BY event_type
"""


@query("f07_get_json_object", oracle=F7_ORACLE)
def f07_get_json_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — get_json_object path extraction (string-returning, no
    declared schema needed — the ad-hoc JSON probe)."""
    (events,) = load_tables(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    return events.groupBy("event_type").agg(
        F.count(F.when(k_str.cast("long") > 50, 1)).alias("n_big_k"),
        F.min(k_str).alias("min_k_str"),
    )


# --------------------------------------------------------------------------
# F8 — conditional functions
# --------------------------------------------------------------------------

F8_ORACLE = """
SELECT c_nationkey,
       ROUND(SUM(GREATEST(c_acctbal, 0)), 6)        AS sum_pos_bal,
       ROUND(SUM(LEAST(c_acctbal, 0)), 6)           AS sum_neg_bal,
       CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)                               AS n_building,
       ROUND(SUM(COALESCE(NULLIF(c_acctbal, 0.0), -1.0)), 6) AS sum_coalesced
FROM customer
GROUP BY c_nationkey
"""


@query("f08_conditional", oracle=F8_ORACLE)
def f08_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — greatest/least/coalesce/nullif."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return customer.groupBy("c_nationkey").agg(
        r6(F.sum(F.greatest(bal, F.lit(0.0)))).alias("sum_pos_bal"),
        r6(F.sum(F.least(bal, F.lit(0.0)))).alias("sum_neg_bal"),
        F.sum(
            F.when(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).isNull(), 1).otherwise(0)
        ).cast("long").alias("n_building"),
        r6(F.sum(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)))).alias("sum_coalesced"),
    )


# --------------------------------------------------------------------------
# F9 — hashing (md5 / sha2 oracle-checked; xxhash64 engine-specific)
# --------------------------------------------------------------------------

F9_ORACLE = """
SELECT c_mktsegment,
       MIN(md5(c_name))    AS min_md5,
       MAX(sha256(c_name)) AS max_sha256,
       COUNT(DISTINCT md5(c_name)) AS n_distinct_md5
FROM customer
GROUP BY c_mktsegment
"""


@query("f09_hash_functions", oracle=F9_ORACLE)
def f09_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — md5/sha2 are standard algorithms, so their hex digests
    agree across engines and support the oracle check; these are the
    dedup keys for L1."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.min(F.md5("c_name")).alias("min_md5"),
        F.max(F.sha2(F.col("c_name"), 256)).alias("max_sha256"),
        F.countDistinct(F.md5("c_name")).alias("n_distinct_md5"),
    )


F9_ENGINE_ORACLE = """
SELECT CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_hash,
       CAST(COUNT(*) AS BIGINT)               AS n_distinct_id,
       CAST(COUNT(*) AS BIGINT)               AS n_rows
FROM customer
"""


@query("f09_engine_hashes", oracle=F9_ENGINE_ORACLE)
def f09_engine_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — xxhash64 and monotonically_increasing_id are
    engine-defined (xxhash64's seed/mixing and the id's partition
    encoding are Spark-specific), so their VALUES can't be oracle-
    compared — but their structural contract can: xxhash64 must be
    collision-free on the unique key column (n_distinct_hash =
    COUNT(DISTINCT input) — a 64-bit hash colliding on 150..150k
    keys would be a real defect, P < 1e-9) and every generated id
    distinct (n_distinct_id = COUNT(*)). The oracle states those
    identities over exact semantics, turning the former rows-only
    declaration into a checkable property pin (f09's a16-style
    upgrade)."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    hashed = customer.select(
        F.xxhash64("c_name").alias("h"),
        F.monotonically_increasing_id().alias("mid"),
    )
    return hashed.agg(
        F.countDistinct("h").alias("n_distinct_hash"),
        F.countDistinct("mid").alias("n_distinct_id"),
        F.count(F.lit(1)).alias("n_rows"),
    )


F7B_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) AS n_distinct_k,
       MAX(json_extract_string(props, '$.k'))                            AS max_k_str
FROM events
GROUP BY event_type
"""


@query("f07b_json_tuple", oracle=F7B_ORACLE)
def f07b_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (rest of the group) — `json_tuple` (generator form: one
    parse extracting many paths at once — cheaper than N
    `get_json_object` calls on wide JSON) plus `schema_of_json` on a
    LITERAL sample only: inferring over the data column would be a
    second full scan at 100 TB, so the inferred schema is folded at
    plan time and merely validated here."""
    (events,) = load_tables(spark, sf_dir, "events")
    inferred = F.schema_of_json(F.lit('{"k": 42}'))  # constant-folded
    tupled = events.select(
        "event_type",
        F.json_tuple(F.col("props"), "k").alias("k_str"),
        inferred.alias("schema_str"),
    )
    # schema_str is engine-specific text; assert it resolved, then drop it.
    tupled = tupled.filter(F.col("schema_str").isNotNull())
    return tupled.groupBy("event_type").agg(
        F.countDistinct("k_str").alias("n_distinct_k"),
        F.max("k_str").alias("max_k_str"),
    )


# --------------------------------------------------------------------------
# F10 — edit distance (fuzzy string matching)
# --------------------------------------------------------------------------

F10_ORACLE = """
SELECT a.n_name AS name_a,
       b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
FROM nation a
JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 4
"""


@query("f10_levenshtein", oracle=F10_ORACLE)
def f10_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — `levenshtein` over the bounded nation-name triangle:
    the fuzzy-match primitive entity resolution runs AFTER a
    blocking join (here the 25×25 dim triangle; at corpus scale the
    LSH/banding paths in `pipeline.dedup` produce the candidate
    pairs and this is the verifier). Both engines implement the
    standard unit-cost edit distance."""
    (nation,) = load_tables(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
        .select("name_a", "name_b", "edit_dist")
    )


# --------------------------------------------------------------------------
# F11 — sequence generation + explode (lateral expansion)
# --------------------------------------------------------------------------

F11_ORACLE = """
SELECT d AS active_day,
       CAST(COUNT(*) AS BIGINT) AS n_active_orders
FROM (
    SELECT unnest(generate_series(o_orderdate,
                                  o_orderdate + INTERVAL 4 DAY,
                                  INTERVAL 1 DAY)) AS d
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-03-08 00:00:00'
)
GROUP BY d
"""


@query("f11_date_sequence", oracle=F11_ORACLE)
def f11_date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — `sequence` + `explode`: expand each order into its
    5-day activity window and count per-day overlap. The generator
    runs inside codegen AFTER the one-week pushed filter, so the
    5× row expansion happens on the filtered slice, never the full
    fact table — the order of filter vs generate is the whole cost
    model at scale."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    filtered = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-08").cast("timestamp"))
    )
    days = F.sequence(
        F.col("o_orderdate"),
        F.col("o_orderdate") + F.expr("INTERVAL 4 DAYS"),
        F.expr("INTERVAL 1 DAY"),
    )
    return (
        filtered.select(F.explode(days).alias("active_day"))
        .groupBy("active_day")
        .agg(F.count(F.lit(1)).alias("n_active_orders"))
    )


# --------------------------------------------------------------------------
# F12 — map type (build / merge / explode round-trip)
# --------------------------------------------------------------------------

F12_ORACLE = """
SELECT event_type,
       ROUND(AVG(value), 6)     AS avg_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""


@query("f12_map_functions", oracle=F12_ORACLE)
def f12_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — map columns: per-type stats packed into TWO maps
    (`map_from_arrays`), merged with `map_zip_with`, then exploded
    back to rows. The oracle is the plain relational answer, so the
    check certifies the map round-trip neither loses nor reorders
    entries. Map values ride through one 5-entry struct per
    aggregation — at scale the maps stay bounded by the key-domain
    size, never by row count (the collect_lists aggregate the
    ALREADY-GROUPED 5-row result, not raw events)."""
    (events,) = load_tables(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        r6(F.avg("value")).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    maps = per_type.agg(
        F.map_from_arrays(
            F.collect_list("event_type"), F.collect_list("avg_value")
        ).alias("avg_map"),
        F.map_from_arrays(
            F.collect_list("event_type"), F.collect_list("n_events")
        ).alias("cnt_map"),
    )
    merged = maps.select(
        F.map_zip_with(
            "avg_map",
            "cnt_map",
            lambda k, avg, cnt: F.struct(avg.alias("avg_value"), cnt.alias("n_events")),
        ).alias("stats")
    )
    return merged.select(
        F.explode("stats").alias("event_type", "s")
    ).select("event_type", "s.avg_value", "s.n_events")


# --------------------------------------------------------------------------
# F13 — VARIANT (Spark 4 semi-structured type)
# --------------------------------------------------------------------------

F13_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT)                            AS n_no_tag
FROM events
GROUP BY event_type
"""


@query("f13_variant_json", oracle=F13_ORACLE)
def f13_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — Spark 4's VARIANT: `parse_json` once into the binary
    semi-structured type, then `variant_get` typed extractions.
    Against repeated `get_json_object` calls (which re-parse the
    string per path), VARIANT parses once and each path is a cheap
    binary probe — the right encoding when JSON columns are read by
    many queries. Missing paths yield NULL, not errors (counted
    here). The oracle extracts the same paths from the raw JSON."""
    (events,) = load_tables(spark, sf_dir, "events")
    v = events.select("event_type", F.parse_json(F.col("props")).alias("v"))
    extracted = v.select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
        F.expr("variant_get(v, '$.missing', 'string')").alias("tag"),
    )
    return extracted.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.sum(F.when(F.col("tag").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_no_tag"),
    )


# --------------------------------------------------------------------------
# F14 — recursive CTE (iteration in the SQL surface)
# --------------------------------------------------------------------------

F14_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT TIMESTAMP '1995-01-01 00:00:00'
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM months
    WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT m                                 AS month,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
"""


@query("f14_recursive_cte", oracle=F14_SQL, impure=True)
def f14_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — WITH RECURSIVE (Spark 4.1): a generated month spine
    left-joined to order counts, so months with zero orders surface
    as 0 instead of vanishing — the calendar-spine pattern every
    time-series report needs. The recursion is bounded (80 rows)
    and runs driver-light: each step is a plan union, the spine
    broadcast-joins the fact side. The oracle is the identical
    statement on DuckDB."""
    from hetnetdb_spark.catalog import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(F14_SQL)


# --------------------------------------------------------------------------
# F15 — bitwise aggregates (flag-set roll-ups)
# --------------------------------------------------------------------------

F15_ORACLE = """
SELECT o_orderstatus,
       CAST(bit_and(o_orderkey % 256) AS BIGINT) AS flags_all,
       CAST(bit_or(o_orderkey % 256)  AS BIGINT) AS flags_any,
       CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS flags_parity,
       CAST(COUNT(*) AS BIGINT)                  AS n
FROM orders
GROUP BY o_orderstatus
"""


@query("f15_bitwise_agg", oracle=F15_ORACLE)
def f15_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — bit_and / bit_or / bit_xor aggregates over a derived
    8-bit flag word: the roll-up shape for permission masks, feature
    flags, and bloom-ish presence words. All three are associative
    AND commutative, so partial aggregation is exact under any
    partition count or merge order — no rounding discipline needed,
    unlike float sums."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    flags = F.col("o_orderkey") % 256
    return orders.groupBy("o_orderstatus").agg(
        F.bit_and(flags).cast("long").alias("flags_all"),
        F.bit_or(flags).cast("long").alias("flags_any"),
        F.bit_xor(flags).cast("long").alias("flags_parity"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# F16 — URL dissection (web-corpus provenance parsing)
# --------------------------------------------------------------------------

#: Deterministic inline URL fixture — the provenance strings a web
#: crawl carries. Simple well-formed URLs only: the query contracts
#: both engines to the same parse on them; pathological URLs are an
#: application concern, not an operator one.
_F16_URLS = [
    (1, "https://docs.example.com/guide/intro?lang=en&ref=nav"),
    (2, "http://example.com/"),
    (3, "https://api.data.example.org:8443/v2/items?id=42"),
    (4, "http://blog.example.net/posts/2024/01/spark"),
    (5, "https://cdn.example.com/assets/app.js"),
    (6, "http://shop.example.org/cart?id=9&promo="),
]

F16_ORACLE = """
WITH urls(url_id, url) AS (
    VALUES {values}
)
SELECT url_id,
       regexp_extract(url, '^([a-z]+)://', 1)                 AS scheme,
       regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)         AS host,
       regexp_extract(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1),
                      '([^.]+\\.[^.]+)$', 1)                  AS domain,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)    AS path,
       regexp_extract(url, '\\?([^#]*)', 1)                   AS query,
       regexp_extract(url, '[?&]id=([^&#]*)', 1)              AS id_param
FROM urls
ORDER BY url_id
""".format(
    values=", ".join(f"({i}, '{u}')" for i, u in _F16_URLS)
)


@query("f16_url_parse", oracle=F16_ORACLE)
def f16_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — URL dissection with ``parse_url``: scheme, host,
    registered-domain-ish suffix, path, query string, and one named
    query parameter. The provenance-parsing step every web-corpus
    pipeline runs before domain-level dedup/filtering (the domain
    mix IS the dataset card).

    Spark side uses the built-in ``parse_url`` (java.net.URI —
    codegen, no UDF); the oracle mirrors it with anchored
    ``regexp_extract`` over the same inline VALUES. The fixture is
    restricted to simple well-formed URLs where both parses provably
    agree: parse_url's HOST drops the port (so does the regex's
    ``[^/:?#]`` class), PATH of a bare authority is '' on both, and
    absent QUERY/params surface as NULL from parse_url vs '' from
    regexp_extract — coalesced to '' on the Spark side.

    Scale posture: pure per-row codegen projection — no shuffle, no
    state; at corpus scale this maps over the URL column wherever it
    lives.
    """
    df = spark.createDataFrame(_F16_URLS, "url_id int, url string")
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        df.select(
            F.col("url_id").cast("int"),
            F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("scheme"),
            host.alias("host"),
            F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.coalesce(F.parse_url(F.col("url"), F.lit("QUERY")), F.lit("")).alias(
                "query"
            ),
            F.coalesce(
                F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")), F.lit("")
            ).alias("id_param"),
        )
        .orderBy("url_id")
    )


# --------------------------------------------------------------------------
# F17 — collation-aware comparison (Spark 4 UTF8_LCASE)
# --------------------------------------------------------------------------

F17_ORACLE = """
WITH mangled AS (
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                ELSE lower(n_name) END AS name_cased,
           n_regionkey
    FROM nation
)
SELECT lower(name_cased)         AS name_ci,
       CAST(COUNT(*) AS BIGINT)  AS n_rows,
       CAST(COUNT(DISTINCT name_cased) AS BIGINT) AS n_case_variants,
       CAST(SUM(n_regionkey) AS BIGINT)           AS region_sum
FROM (SELECT * FROM mangled UNION ALL SELECT * FROM mangled)
GROUP BY lower(name_cased)
"""


@query("f17_collation", oracle=F17_ORACLE)
def f17_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — Spark 4 collation support: grouping on a
    ``UTF8_LCASE``-collated key collapses case variants WITHOUT
    rewriting the data — the collation rides the type, so the
    comparison semantics live in the plan, not in a lower() call
    at every use site (the difference matters once the key is also
    a join key or a bucketing column).

    One trap, neutralized here: the representative value a collated
    group-by emits is whichever variant a partition saw first —
    partition-order NONdeterministic — so the output key is
    explicitly `lower()`-normalized; only the GROUPING uses the
    collation. The oracle (DuckDB has no column collations) states
    the equivalent lower()-keyed aggregate.
    """
    (nation,) = load_tables(spark, sf_dir, "nation")
    mangled = nation.select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 2 == 0, F.upper("n_name")
        ).otherwise(F.lower("n_name")).alias("name_cased"),
        "n_regionkey",
    )
    doubled = mangled.unionByName(mangled)
    return (
        doubled.groupBy(
            F.collate(F.col("name_cased"), "UTF8_LCASE").alias("name_key")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(
                F.collate(F.col("name_cased"), "UTF8_BINARY")
            ).alias("n_case_variants"),
            F.sum("n_regionkey").alias("region_sum"),
        )
        .select(
            F.lower(F.col("name_key")).cast("string").alias("name_ci"),
            "n_rows",
            "n_case_variants",
            "region_sum",
        )
    )


# --------------------------------------------------------------------------
# F18 — ordered string aggregation (Spark 4 listagg WITHIN GROUP)
# --------------------------------------------------------------------------

F18_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name)  AS names,
       CAST(COUNT(*) AS BIGINT)                 AS n
FROM nation
GROUP BY n_regionkey
"""


@query("f18_listagg", oracle=F18_ORACLE, impure=True)
def f18_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — `listagg(...) WITHIN GROUP (ORDER BY ...)`, new in
    Spark 4: ordered string aggregation without the
    concat_ws(sort_array(collect_list(...))) three-step. The
    explicit WITHIN GROUP ordering is what makes the result
    deterministic under any partitioning — an unordered listagg
    concatenates in partition-arrival order and would never
    hash-match an oracle (the same trap as collect_list, a09).
    DuckDB twin is `string_agg(... ORDER BY ...)`.
    """
    (nation,) = load_tables(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("f18_nation")
    return spark.sql(
        "SELECT n_regionkey, "
        "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names, "
        "COUNT(*) AS n "
        "FROM f18_nation GROUP BY n_regionkey"
    )


# --------------------------------------------------------------------------
# F19 — error-safe functions: try_divide / try_cast / try_to_number
# --------------------------------------------------------------------------

F19_ORACLE = """
SELECT o_orderkey,
       ROUND(o_totalprice / NULLIF(o_custkey % 50, 0), 6) AS price_per_bucket,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
       TRY_CAST(o_orderstatus AS DOUBLE)                    AS status_num
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@query("f19_try_functions", oracle=F19_ORACLE)
def f19_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 — the `try_` function family: NULL-on-failure arithmetic
    and casting instead of job-killing exceptions. Under ANSI mode
    (Spark 4's default) `x / 0` and a malformed cast RAISE; a 100 TB
    pipeline wants the row quarantined, not the stage failed —
    `try_divide` / `try_cast` are that contract in the plan itself,
    with no UDF and no pre-validation pass. The oracle mirrors with
    DuckDB's TRY_CAST and `NULLIF` guard (`o_custkey % 50` is 0 for every 50th customer, so
    `price_per_bucket` exercises divide-by-zero → NULL on real
    rows; casting letter-valued `o_orderstatus` to DOUBLE exercises
    unparseable-cast → NULL on every row, and the priority digit
    parses on every row).
    """
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.round(
                F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 50), 6
            ).alias("price_per_bucket"),
            F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
                "prio_num"
            ),
            F.col("o_orderstatus").try_cast("double").alias("status_num"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# F20 — calendar edge arithmetic (end-of-month clamping, ISO fields)
# --------------------------------------------------------------------------

F20_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)       AS d,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH
            AS TIMESTAMP)                                  AS plus_1m,
       CAST(week(CAST(o_orderdate AS DATE)) AS INT)       AS iso_week,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INT)    AS q,
       CAST(isodow(CAST(o_orderdate AS DATE)) AS INT)     AS iso_dow,
       CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_in_month,
       CAST(o_orderdate AS DATE)
           = last_day(CAST(o_orderdate AS DATE))          AS is_month_end
FROM orders
WHERE o_orderkey < 300
ORDER BY o_orderkey
"""


@query("f20_calendar_edges", oracle=F20_ORACLE)
def f20_calendar_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 — the calendar arithmetic users silently depend on,
    pinned cross-engine at its edge cases: `add_months` CLAMPS to
    month end (Jan 31 + 1 month = Feb 29, not Mar 2 — both engines
    agree, unlike naive day arithmetic), ISO week numbering (week 1
    owns Jan 1 here; year-boundary weeks are where engines usually
    split), and day-of-week aligned to the ISO convention — Spark's
    `dayofweek` is 1=Sunday while the oracle's `isodow` is
    1=Monday, so the query uses `weekday()+1`, the one spelling
    both engines share. DuckDB's `date + INTERVAL 1 MONTH` clamps
    exactly like Spark's `add_months`, which is itself a fact this
    oracle pins. All values are exact calendar integers — no float
    discipline needed."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            d.cast("timestamp").alias("d"),
            F.last_day(d).cast("timestamp").alias("eom"),
            F.add_months(d, 1).cast("timestamp").alias("plus_1m"),
            F.weekofyear(d).alias("iso_week"),
            F.quarter(d).alias("q"),
            (F.weekday(d) + 1).cast("int").alias("iso_dow"),
            F.dayofmonth(F.last_day(d)).alias("days_in_month"),
            (d == F.last_day(d)).alias("is_month_end"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# F21 — codec round-trips (base64 / hex / csv / aes)
# --------------------------------------------------------------------------

F21_ORACLE = """
SELECT n_nationkey,
       to_base64(CAST(n_name AS BLOB))                    AS b64,
       CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR)
                                                          AS b64_roundtrip,
       hex(n_name)                                        AS hexed,
       CAST(unhex(hex(n_name)) AS VARCHAR)                AS hex_roundtrip,
       n_name || ',' || CAST(n_regionkey AS VARCHAR)      AS csv_line,
       TRUE                                               AS aes_roundtrip_ok
FROM nation
ORDER BY n_nationkey
"""


@query("f21_codec_roundtrips", oracle=F21_ORACLE)
def f21_codec_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 — the serialization codecs as ROUND-TRIPS, so the oracle
    checks both directions at once: base64 and hex must decode to
    the exact original bytes (and their encodings match DuckDB's
    byte-for-byte — same RFC 4648 alphabet, same uppercase hex);
    `to_csv` of a struct must equal the hand-concatenated line; and
    AES-GCM — which DuckDB cannot replay and whose ciphertext is
    IV-random anyway — is pinned by the structural identity
    `aes_decrypt(aes_encrypt(x, k), k) = x` evaluated INSIDE the
    query (the a16 bound-flag pattern: the oracle asserts the flag
    is TRUE for every row, so a broken codec cannot hide).

    All codegen-stage expressions; the only cross-engine contract
    is byte identity, the strongest check available for codecs."""
    (nation,) = load_tables(spark, sf_dir, "nation")
    key = F.lit("0123456789abcdef")  # 16-byte demo key, pinned
    enc = F.aes_encrypt(F.col("n_name").cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary"))
    return nation.select(
        "n_nationkey",
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.hex(F.col("n_name")).alias("hexed"),
        F.unhex(F.hex(F.col("n_name"))).cast("string").alias("hex_roundtrip"),
        F.to_csv(F.struct(F.col("n_name"), F.col("n_regionkey"))).alias(
            "csv_line"
        ),
        (dec.cast("string") == F.col("n_name")).alias("aes_roundtrip_ok"),
    ).orderBy("n_nationkey")


# --------------------------------------------------------------------------
# F24 — map higher-order functions (filter / transform / zip, aligned)
# --------------------------------------------------------------------------

F24_ORACLE = """
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT)      AS n_cust,
       CAST(COUNT(*) * 2 AS BIGINT)  AS doubled,
       CAST(COUNT(*) * 3 AS BIGINT)  AS tripled,
       COUNT(*) > 50                 AS kept
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@query("f24_map_higher_order", oracle=F24_ORACLE)
def f24_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24 — the map higher-order surface: per-region customer
    counts packed into a MAP column (``map_from_entries`` over a
    deterministically sorted entry array — collect_list order is
    partition-dependent, so ``array_sort`` pins it), then
    ``transform_values`` (×2), ``map_zip_with`` (key-aligned sum ⇒
    ×3), and ``map_filter`` membership surfaced via
    ``map_contains_key``. Exploding back to rows lets a relational
    oracle check every map operation as plain arithmetic: if any
    HOF dropped, duplicated, or misaligned an entry, a row's
    doubled/tripled/kept columns would break.

    Scale: maps here model the "metrics bundle per entity" pattern
    (bounded keys per row — nations per region ≤ 5). The HOFs are
    codegen lambdas over the map's entry array — no shuffle beyond
    the count aggregate, no Python. An UNBOUNDED map (one entry per
    customer) would be the collect_list anti-pattern; the a09/a28
    guidance applies unchanged."""
    customer, nation, region = load_tables(
        spark, sf_dir, "customer", "nation", "region"
    )
    cnt = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    maps = cnt.groupBy("r_name").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("n_name", "c")))
        ).alias("m")
    )
    enriched = maps.select(
        "r_name",
        "m",
        F.transform_values("m", lambda k, v: v * 2).alias("tv"),
        F.map_filter("m", lambda k, v: v > 50).alias("mf"),
    ).select(
        "r_name",
        "m",
        "tv",
        "mf",
        F.map_zip_with(
            "m", "tv", lambda k, v1, v2: v1 + v2
        ).alias("mz"),
    )
    return (
        enriched.select("r_name", "tv", "mf", "mz", F.explode("m").alias("n_name", "c"))
        .select(
            "r_name",
            "n_name",
            F.col("c").cast("bigint").alias("n_cust"),
            F.element_at("tv", F.col("n_name")).cast("bigint").alias("doubled"),
            F.element_at("mz", F.col("n_name")).cast("bigint").alias("tripled"),
            F.map_contains_key("mf", F.col("n_name")).alias("kept"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# F25 — XML ingest round-trip (from_xml + xpath, typed contract)
# --------------------------------------------------------------------------

F25_ORACLE = """
SELECT o_orderkey,
       o_orderkey              AS k_back,
       ROUND(o_totalprice, 6)  AS price_back,
       o_orderpriority         AS pri_back,
       o_orderkey              AS xp_k,
       o_orderpriority         AS xp_pri
FROM orders
WHERE o_orderkey % 20 = 3
ORDER BY o_orderkey
"""


@query("f25_xml_roundtrip", oracle=F25_ORACLE)
def f25_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F25 — XML ingest (Spark 4 builds in the former spark-xml):
    ``from_xml`` with an explicit schema for typed struct extraction
    and the ``xpath_long`` / ``xpath_string`` point lookups. Same
    contract shape as f22's VARIANT check: XML text built from typed
    source columns must round-trip to exactly those values — BIGINT
    through decimal text, DOUBLE through Spark's shortest-round-trip
    formatting (plain or scientific, ``from_xml`` re-parses it to
    the identical bits), strings verbatim (fixture priorities are
    XML-safe; a production ingest escapes &<> before this check).

    The oracle never touches XML — DuckDB 1.0 has no XML support —
    it restates the typed identity from the source columns, which is
    precisely what a round-trip must preserve.

    Scale: from_xml/xpath are per-row codegen expressions (JVM
    StAX), no shuffle, no Python — an XML feed lands as one scan +
    parse projection at any size; the %-sample only bounds the
    driver-hashed output surface.

    r16 optimization (guide §2.4/§1.4 decomposition): the global
    ORDER BY used to sit ABOVE the xml/xpath projections, and the
    range-exchange's bound-sampling pass re-executed them — the
    decomposition priced the whole XML machinery at ~1.0 s and the
    sort at another ~0.9 s, i.e. everything ran twice. The sort now
    runs on the three scanned columns BEFORE the projections
    (o_orderkey is unique and 1:1 with the output rows, so row set
    and order are unchanged — frames pinned identical), and the
    sampling pass re-reads only the filtered scan. Fresh-process
    min-of-3 at sf0.1: 1.95 → 1.21 s; the xpath evaluations
    (~0.4 s each) are the certified surface and stay."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<r><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_totalprice").cast("string"),
        F.lit("</p><s>"), F.col("o_orderpriority"),
        F.lit("</s></r>"),
    )
    parsed = (
        orders.filter(F.col("o_orderkey") % 20 == 3)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
        .select(
            "o_orderkey",
            xml.alias("xml"),
            F.from_xml(xml, "k BIGINT, p DOUBLE, s STRING").alias("x"),
        )
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.k").alias("k_back"),
        F.round(F.col("x.p"), 6).alias("price_back"),
        F.col("x.s").alias("pri_back"),
        F.expr("xpath_long(xml, '/r/k')").alias("xp_k"),
        F.expr("xpath_string(xml, '/r/s')").alias("xp_pri"),
    )


# --------------------------------------------------------------------------
# F27 — generator chain: stack × posexplode_outer (LATERAL VIEW)
# --------------------------------------------------------------------------

F27_ORACLE = """
WITH m AS (
    SELECT n_nationkey, 'region' AS metric, CAST(n_regionkey AS BIGINT) AS mval
    FROM nation
    UNION ALL
    SELECT n_nationkey, 'ckey', CAST(n_nationkey AS BIGINT)
    FROM nation
),
e AS (
    SELECT n_nationkey, CAST(0 AS INTEGER) AS pos,
           CAST(n_nationkey AS INTEGER) AS val
    FROM nation WHERE n_nationkey % 5 <> 0
    UNION ALL
    SELECT n_nationkey, CAST(1 AS INTEGER), CAST(n_regionkey AS INTEGER)
    FROM nation WHERE n_nationkey % 5 <> 0
    UNION ALL
    SELECT n_nationkey, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
    FROM nation WHERE n_nationkey % 5 = 0
)
SELECT m.n_nationkey, m.metric, m.mval, e.pos, e.val
FROM m JOIN e ON m.n_nationkey = e.n_nationkey
ORDER BY m.n_nationkey, m.metric, e.pos
"""


@query("f27_generator_chain", oracle=F27_ORACLE, impure=True)
def f27_generator_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F27 — table-generating expressions beyond explode: ``stack``
    (N-way column-to-row unpivot as a generator), ``posexplode_outer``
    (positional explode that PRESERVES the driving row when the array
    is NULL — inner explode would silently drop it), and the LATERAL
    VIEW chaining rule: each successive generator cross-products with
    the rows the previous one emitted (2 stack rows × 2-or-1 explode
    rows per nation here).

    The oracle rebuilds the chain relationally: the stack half is a
    2-way UNION ALL, the outer-explode half is positions 0/1 for
    non-multiple-of-5 nations plus an all-NULL row for the rest, and
    the chain is their equi-join — if Spark's generator semantics
    dropped NULL-array rows, mis-numbered positions, or failed to
    cross-product the chain, rows or values would diverge.

    Scale: generators are map-side row expansion inside codegen — no
    shuffle, no state; the fan-out factor (here 2×≤2) multiplies scan
    output, which is the quantity to watch at 100 TB (l17's chunking
    note: write expanded rows partition-parallel, never collect
    them). Registered impure: registers the nation temp view."""
    from hetnetdb_spark.catalog import register_views

    register_views(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT n_nationkey, metric, mval, pos, val
        FROM nation
        LATERAL VIEW stack(2, 'region', CAST(n_regionkey AS BIGINT),
                              'ckey',   CAST(n_nationkey AS BIGINT)) s
            AS metric, mval
        LATERAL VIEW OUTER posexplode(
            CASE WHEN n_nationkey % 5 = 0 THEN CAST(NULL AS ARRAY<INT>)
                 ELSE array(n_nationkey, n_regionkey) END) p AS pos, val
        ORDER BY n_nationkey, metric, pos
        """
    )


# --------------------------------------------------------------------------
# F28 — datetime formatting / parsing round-trip (pattern surface)
# --------------------------------------------------------------------------

F28_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M')   AS fmt_minute,
       strftime(o_orderdate, '%Y/%j')            AS fmt_doy,
       CAST(EXTRACT(isodow FROM o_orderdate) AS BIGINT) AS iso_dow,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
            '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)   AS parsed_back
FROM orders
WHERE o_orderkey % 50 = 7
ORDER BY o_orderkey
"""


@query("f28_datetime_format_roundtrip", oracle=F28_ORACLE)
def f28_datetime_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F28 — the datetime FORMAT surface: ``date_format`` rendering
    (minute precision, year/day-of-year), ISO day-of-week numbering
    (Monday=1 — Spark's ``dayofweek`` is Sunday=1, so the portable
    spelling is the shifted mod the oracle's EXTRACT(isodow)
    defines), and the format→parse round-trip ``to_timestamp(
    date_format(ts, p), p)`` which must be the identity at seconds
    precision. Each engine renders with its OWN pattern dialect
    (Java SimpleDateFormat-ish vs strftime) — the pin is that both
    dialects' specifiers mean the same fields, which is exactly
    what breaks when a report migrates engines ('%j' vs 'DDD'
    day-of-year padding, '%M' minute vs Java month, the classic).

    Scale: per-row codegen string work, no shuffle; the %-sample
    bounds the hashed output."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return (
        orders.filter(F.col("o_orderkey") % 50 == 7)
        .select(
            "o_orderkey",
            F.date_format(ts, "yyyy-MM-dd HH:mm").alias("fmt_minute"),
            F.date_format(ts, "yyyy/DDD").alias("fmt_doy"),
            (((F.dayofweek(ts) + 5) % 7) + 1).cast("bigint").alias("iso_dow"),
            F.to_timestamp(
                F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
            ).alias("parsed_back"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# F31 — array set algebra (union / intersect / except, dedup semantics)
# --------------------------------------------------------------------------

F31_ORACLE = """
WITH lo AS (
    SELECT c_nationkey,
           list_sort(list_distinct(list(c_mktsegment))) AS segs
    FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_nationkey
),
hi AS (
    SELECT c_nationkey,
           list_sort(list_distinct(list(c_mktsegment))) AS segs
    FROM customer WHERE c_custkey % 2 = 1 GROUP BY c_nationkey
)
SELECT lo.c_nationkey,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_concat(lo.segs, hi.segs))), ','), '')              AS seg_union,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_filter(lo.segs, x -> list_contains(hi.segs, x)))), ','), '')
                                                                   AS seg_intersect,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_filter(lo.segs, x -> NOT list_contains(hi.segs, x)))), ','), '')
                                                                   AS seg_except
FROM lo JOIN hi ON lo.c_nationkey = hi.c_nationkey
ORDER BY lo.c_nationkey
"""


@query("f31_array_set_algebra", oracle=F31_ORACLE)
def f31_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F31 — the array set-algebra trio: ``array_union`` /
    ``array_intersect`` / ``array_except`` over per-group segment
    sets (even- vs odd-keyed customers per nation), with their
    DEDUPLICATION contract pinned — all three return SET semantics
    regardless of input multiplicity, which is the property callers
    routinely mis-assume (concat ≠ union). DuckDB has no native
    trio, so the oracle composes each from
    list_distinct/list_filter/list_contains — the definition itself.

    Cross-engine encoding note (measured): array COLUMNS stringify
    differently through the comparison harness (Python list repr vs
    numpy array repr), so set results ship as SORTED, CSV-JOINED
    strings on both sides — element order inside the unordered-set
    results is engine-defined, the sort makes it canonical
    (the registry tie-break discipline applied to collections) —
    and DuckDB's array_to_string of an EMPTY list yields NULL where
    Spark's array_join yields '' (measured), so the oracle
    coalesces.

    Scale: collect_set here is segment-bounded per group (the a09
    rule); set ops are codegen array expressions, no extra
    shuffle."""
    (customer,) = load_tables(spark, sf_dir, "customer")

    def segs(parity: int, alias: str):
        return (
            customer.filter(F.col("c_custkey") % 2 == parity)
            .groupBy("c_nationkey")
            .agg(F.array_sort(F.collect_set("c_mktsegment")).alias(alias))
        )

    lo, hi = segs(0, "lo"), segs(1, "hi")

    def joined(col):
        return F.array_join(F.array_sort(col), ",")

    return (
        lo.join(hi, "c_nationkey")
        .select(
            "c_nationkey",
            joined(F.array_union("lo", "hi")).alias("seg_union"),
            joined(F.array_intersect("lo", "hi")).alias("seg_intersect"),
            joined(F.array_except("lo", "hi")).alias("seg_except"),
        )
        .orderBy("c_nationkey")
    )
