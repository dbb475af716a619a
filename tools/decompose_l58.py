"""l58_label_propagation breakdown + dead-join elimination A/B (r16
verdict item 5).

The registered round is
    votes  = dedges JOIN labels ON src=id -> count by (dst, label)
    winner = row_number pick per dst
    labels = labels LEFT JOIN winner -> COALESCE(new_label, label)
so `labels` is referenced TWICE per round (votes + the carry join):
the logical tree DOUBLES per round (4 rounds = 16 copies of the
pair-graph subtree; the r15 plan file is 172 KB) and every round
pays a join that never fires — `dedges` is symmetric (e UNION
reversed e), so every node has >= 1 incoming edge and the winner
relation covers every node: COALESCE(new_label, label) is provably
always new_label.

Variant `full2` drops the dead join: labels_i = winner_i renamed.
Lineage becomes LINEAR (one labels reference per round), one join
per round instead of two.

Usage: python tools/decompose_l58.py [N_PASSES]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.pipeline.similarity import (  # noqa: E402
    LPA_ITERS,
    SIM_THRESHOLD,
    exact_pairs,
)
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _full(spark):
    return registry.QUERIES["l58_label_propagation"](spark, SF_DIR)


def _full2(spark):
    (emb,) = load_tables(spark, SF_DIR, "embeddings")
    e = exact_pairs(spark, emb, SIM_THRESHOLD).select("a_id", "b_id")
    dedges = (
        e.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionAll(e.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .cache()
    )
    nodes = dedges.select(F.col("src").alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("label"))
    pick = Window.partitionBy("dst").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for _ in range(LPA_ITERS):
        votes = (
            dedges.join(labels, dedges["src"] == labels["id"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("id"), "label")
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("id").cast("bigint").alias("min_member"),
        )
        .select(F.col("label").alias("community"), "n_members", "min_member")
        .orderBy(F.col("n_members").desc(), "community")
        .limit(20)
    )


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry.load_all()
    spark = get_spark("l58-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    table = {"full": _full, "full2": _full2}
    walls: dict[str, list[float]] = {n: [] for n in table}
    for _, build in table.items():
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(table)
    for i in range(n_passes):
        for name in names[i % len(names):] + names[: i % len(names)]:
            spark.sparkContext.setJobDescription(f"l58 {name} #{i}")
            t0 = time.perf_counter()
            table[name](spark).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        print(
            f"{name:6s} min {min(ws):.3f}  med {sorted(ws)[len(ws)//2]:.3f}"
            f"  walls {[round(w, 3) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
