"""A/B: q3's orders⋈lineitem join strategy at large corpora
(r12 verdict item 7).

Variant `baseline` is the registry q3 (planner/AQE choice — sort-merge
at large scale). Variant `shuffle_hash` is the same query with a
SHUFFLE_HASH hint on the filtered orders side: same exchanges, but the
join materializes a hash map of the (smaller, date-filtered) orders
partition instead of sorting both sides.

Usage: python tools/q3_hint_ab.py VARIANT CORPUS   (fresh process each)
Prints {"variant":..., "cold_s":..., "walls":[...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.expr import r6, revenue  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402


def q3_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 with SHUFFLE_HASH hinted on the filtered orders build side."""
    customer, orders, lineitem = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    orders_f = orders.filter(F.col("o_orderdate") < cutoff).hint(
        "shuffle_hash"
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders_f, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r6(F.sum(revenue())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def main() -> int:
    variant, corpus = sys.argv[1], sys.argv[2]
    registry.load_all()
    spark = get_spark(f"q3ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = (
        q3_shuffle_hash
        if variant == "shuffle_hash"
        else registry.QUERIES["q3_shipping_priority"]
    )
    t0 = time.perf_counter()
    fn(spark, corpus).toPandas()
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, corpus).toPandas()
        walls.append(round(time.perf_counter() - t0, 4))
    df = fn(spark, corpus)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = [
        kind
        for kind in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        for _ in range(plan.count(kind))
    ]
    print(
        json.dumps(
            {
                "variant": variant,
                "cold_s": round(cold, 4),
                "walls": walls,
                "join_nodes": joins,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
