"""Fresh-process experiment harness for the l14 bimodal eval path.

Usage: python tools/l14_experiment.py VARIANT CORPUS
Variants:
  baseline   — the registry l14 as-is
  wscg_off   — registry l14 with spark.sql.codegen.wholeStage=false
  packed     — restructured fold: neighbor-equality ints + single-long
               accumulator (no per-element struct allocation)
  packed_off — packed variant with whole-stage codegen off

Prints one JSON line: {"variant":..., "cold_s":..., "walls":[...]}.
Run several processes per variant to observe mode distribution.
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
from hetnetdb_spark.expr import r6  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402


def packed_l14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l14 with the fold restructured for the interpreted eval path:
    sort once INTO A COLUMN (referencing the array_sort expression
    inside a lambda would re-evaluate the sort per element — the
    subtree-duplication trap), precompute eq[i] = (sorted[i] ==
    sorted[i-1]) as 0/1 longs (tiny lambda, no state), then fold eq
    with a SINGLE-LONG accumulator acc = run * 2^32 + maxrun and
    branch-free arithmetic newrun = eq*run + 1 — no per-element
    struct/row allocation."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    staged = documents.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_sort(toks).alias("st"),
    )
    eq = F.transform(
        F.sequence(F.lit(2), F.size("st")),
        lambda i: (
            F.element_at(F.col("st"), i) == F.element_at(F.col("st"), i - 1)
        ).cast("long"),
    )
    two32 = F.lit(4294967296).cast("long")
    mask = F.lit(4294967295).cast("long")
    maxrun_packed = F.aggregate(
        F.when(F.size("st") >= 2, eq).otherwise(
            F.array().cast("array<bigint>")
        ),
        two32 + F.lit(1).cast("long"),  # run=1, maxrun=1
        lambda acc, e: (
            lambda run, mx: (lambda nr: nr * two32 + F.greatest(mx, nr))(
                e * run + 1
            )
        )(F.shiftright(acc, 32), acc.bitwiseAND(mask)),
        lambda acc: acc.bitwiseAND(mask),
    )
    per_doc = staged.select(
        "source",
        "n_tokens",
        "n_distinct",
        maxrun_packed.alias("top_tok_count"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r6(
            F.avg(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_tokens")
            )
        ).alias("avg_repetition"),
        r6(
            F.max(
                F.col("top_tok_count").cast("double") / F.col("n_tokens")
            )
        ).alias("worst_top_tok_ratio"),
    )


def main() -> int:
    variant, corpus = sys.argv[1], sys.argv[2]
    registry.load_all()
    spark = get_spark(f"l14exp-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    if variant.endswith("_off") or variant == "wscg_off":
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    fn = (
        packed_l14
        if variant.startswith("packed")
        else registry.QUERIES["l14_repetition_stats"]
    )
    t0 = time.perf_counter()
    fn(spark, corpus).toPandas()
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, corpus).toPandas()
        walls.append(round(time.perf_counter() - t0, 4))
    print(
        json.dumps(
            {
                "variant": variant,
                "cold_s": round(cold, 4),
                "walls": walls,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
