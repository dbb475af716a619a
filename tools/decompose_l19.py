"""l19_decontamination decomposition + variants (r16 verdict item 4).

Stages (noop sink, fresh QueryExecution per pass, rotated
round-robin — the decompose_l68 protocol):

  train_g    distinct train 5-grams (the broadcast build side)
  eval_g     exploded eval grams (the semi-join probe side)
  hits       eval_g LEFT SEMI train_g -> distinct (source, doc_id)
  evaldocs   the registered denominator: distinct (source, doc_id)
             over the EXPLODED eval grams (suspected waste)
  evaldocs2  variant: distinct (source, doc_id) over the filtered
             documents rows directly — no explode, no gram-sized
             distinct; equal because every eval doc with
             len >= NGRAM emits >= 1 gram (array_distinct of a
             non-empty array is non-empty)
  full       registered query
  full2      registered query with evaldocs2 spliced in

Usage: python tools/decompose_l19.py [N_PASSES] [stages|variants]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.expr import r6  # noqa: E402
from hetnetdb_spark.pipeline.corpus import NGRAM, TRAIN_SOURCES  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _with_grams(spark):
    (documents,) = load_tables(spark, SF_DIR, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (NGRAM - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM)),
        )
    )
    return documents.filter(F.size(toks) >= NGRAM).select(
        "doc_id", "source", F.explode(grams).alias("gram")
    )


def _train_g(spark):
    is_train = F.col("source").isin(*TRAIN_SOURCES)
    return _with_grams(spark).filter(is_train).select("gram").distinct()


def _eval_g(spark):
    is_train = F.col("source").isin(*TRAIN_SOURCES)
    return _with_grams(spark).filter(~is_train)


def _hits(spark):
    return (
        _eval_g(spark)
        .join(_train_g(spark), "gram", "left_semi")
        .select("source", "doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )


def _evaldocs(spark):
    return _eval_g(spark).select("source", "doc_id").distinct()


def _evaldocs2(spark):
    (documents,) = load_tables(spark, SF_DIR, "documents")
    toks = F.split(F.col("text"), " ")
    is_train = F.col("source").isin(*TRAIN_SOURCES)
    return (
        documents.filter((F.size(toks) >= NGRAM) & ~is_train)
        .select("source", "doc_id")
        .distinct()
    )


def _finish(eval_docs, hits):
    eval_docs = eval_docs.join(hits, ["source", "doc_id"], "left").withColumn(
        "hit", F.coalesce(F.col("hit"), F.lit(0))
    )
    return (
        eval_docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").cast("long").alias("n_contaminated"),
            r6(F.sum("hit") / F.count(F.lit(1))).alias("contaminated_frac"),
        )
        .orderBy("source")
    )


def _full(spark):
    return registry.QUERIES["l19_decontamination"](spark, SF_DIR)


def _full2(spark):
    return _finish(_evaldocs2(spark), _hits(spark))


STAGES = {
    "train_g": _train_g,
    "eval_g": _eval_g,
    "hits": _hits,
    "evaldocs": _evaldocs,
    "evaldocs2": _evaldocs2,
    "full": _full,
    "full2": _full2,
}

VARIANTS = {"full": _full, "full2": _full2}


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    mode = sys.argv[2] if len(sys.argv) > 2 else "stages"
    registry.load_all()
    spark = get_spark("l19-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    table = STAGES if mode == "stages" else VARIANTS
    walls: dict[str, list[float]] = {n: [] for n in table}
    for _, build in table.items():
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(table)
    for i in range(n_passes):
        for name in names[i % len(names):] + names[: i % len(names)]:
            spark.sparkContext.setJobDescription(f"l19 {name} #{i}")
            t0 = time.perf_counter()
            table[name](spark).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        print(
            f"{name:10s} min {min(ws):.3f}  med {sorted(ws)[len(ws)//2]:.3f}"
            f"  walls {[round(w, 3) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
