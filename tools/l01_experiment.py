"""Fresh-process A/B harness for l01_exact_dedup plan variants.

Usage: python tools/l01_experiment.py VARIANT CORPUS
Variants (all share: broadcast dense source-id dim computed from the
BASE table — the union's source set equals base's by construction —
packed bigint keeper, inputs = crawl.groupBy(source).count()):
  repart_md5   — repartition(h) + single post-shuffle agg, unhex md5 key
  partial_md5  — planner default partial+final agg, unhex md5 key
  repart_xx2   — repartition + single agg, (xxhash64, xxhash64 seed=1)
                 two-long key
  partial_xx2  — partial+final agg, two-long key

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
from pyspark.sql.window import Window  # noqa: E402

from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402


def build(spark: SparkSession, sf_dir: str, variant: str) -> DataFrame:
    (documents,) = load_tables(spark, sf_dir, "documents")
    base = documents.select("doc_id", "text", "source")
    crawl = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 100000)
    )
    dim = (
        base.select("source")
        .distinct()
        .withColumn("src_id", F.row_number().over(Window.orderBy("source")))
    )
    packed = F.shiftleft(F.col("doc_id"), 20) + F.col("src_id")
    joined = crawl.join(F.broadcast(dim), "source")
    if variant.endswith("_xx2"):
        keyed = joined.select(
            F.xxhash64("text").alias("h1"),
            F.xxhash64(F.lit(1), "text").alias("h2"),
            packed.alias("p"),
        )
        keys = ["h1", "h2"]
    else:
        keyed = joined.select(
            F.unhex(F.md5("text")).alias("h1"), packed.alias("p")
        )
        keys = ["h1"]
    if variant.startswith("repart_"):
        keyed = keyed.repartition(*[F.col(k) for k in keys])
    keepers = keyed.groupBy(*keys).agg(F.min("p").alias("p"))
    src_id = F.col("p").bitwiseAND(F.lit((1 << 20) - 1)).alias("src_id")
    kept = (
        keepers.groupBy(src_id)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min(F.shiftright(F.col("p"), 20)).alias("first_kept_id"),
        )
        .join(F.broadcast(dim), "src_id")
    )
    inputs = crawl.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    return inputs.join(
        kept.select("source", "n_kept", "first_kept_id"), "source", "left"
    ).select(
        "source",
        "n_input",
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
        "first_kept_id",
    )


def main() -> int:
    variant, corpus = sys.argv[1], sys.argv[2]
    spark = get_spark(f"l01exp-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build(spark, corpus, variant).toPandas()
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        build(spark, corpus, variant).toPandas()
        walls.append(round(time.perf_counter() - t0, 4))
    print(
        json.dumps(
            {"variant": variant, "cold_s": round(cold, 4), "walls": walls}
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
