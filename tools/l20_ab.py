"""A/B: l20 BM25's per-term tf computation at large corpora
(r13 verdict item 6 — the l20 300× letter, 3.0× vs DuckDB at 2.3 s
absolute).

The registry shape computes each term frequency with its own
``size(filter(toks, = term))`` — one array traversal per term (plus
one for dl), i.e. 4 passes over every token array per scan, twice
(stats pass + scoring pass). If the wall is expression-eval-bound,
a SINGLE-pass ``aggregate()`` over the token array computing dl and
all term tfs at once should close the gap; if it is rows/s-bound
(tokenize + scan dominate), the variants will tie and the letter is
adjudicated rows/s-bound like q1.

Variants (identical results, pinned by the oracle equivalence of the
registry query they'd replace):

- ``baseline``       registry l20 (per-term filter traversals)
- ``agg_struct``     one aggregate() with a struct{dl,tf0,tf1,tf2}
                     accumulator — one traversal, struct update per
                     element
- ``agg_packed``     one aggregate() with a PACKED BIGINT accumulator
                     (16-bit fields: dl | tf0<<16 | tf1<<32 |
                     tf2<<48) — one traversal, single integer add per
                     element (the l14 packed-long lesson; bounds:
                     documents >65535 tokens would overflow a field —
                     fixture max is ~300, and a production deployment
                     widens to two longs per 4 more terms)

Usage: python tools/l20_ab.py VARIANT CORPUS     (fresh process each)
       python tools/l20_ab.py --drive [CORPUS]   (3 interleaved procs/variant)
Prints {"variant":..., "cold_s":..., "walls":[...]} per process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.expr import r6  # noqa: E402
from hetnetdb_spark.pipeline.text import BM25_B, BM25_K1, BM25_TERMS  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402


def _score_and_rank(per_doc_tf: DataFrame) -> DataFrame:
    """Shared scoring tail: per_doc_tf has (doc_id, dl, tf_0..tf_k)."""
    nterms = len(BM25_TERMS)
    stats = per_doc_tf.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(nterms)
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        norm = (
            tf
            * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
        )
        return F.when(tf > 0, idf * norm).otherwise(F.lit(0.0))

    total = term_score(0)
    for i in range(1, nterms):
        total = total + term_score(i)
    return (
        per_doc_tf.filter(
            sum((F.col(f"tf_{i}") > 0).cast("int") for i in range(nterms)) > 0
        )
        .join(F.broadcast(stats))
        .select("doc_id", r6(total).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


def l20_agg_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate() traversal with a struct accumulator."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    init = F.struct(
        F.lit(0).cast("double").alias("dl"),
        *[F.lit(0).cast("double").alias(f"tf_{i}") for i in range(len(BM25_TERMS))],
    )

    def merge(acc, x):
        return F.struct(
            (acc["dl"] + 1.0).alias("dl"),
            *[
                (
                    acc[f"tf_{i}"]
                    + F.when(x == F.lit(t), F.lit(1.0)).otherwise(F.lit(0.0))
                ).alias(f"tf_{i}")
                for i, t in enumerate(BM25_TERMS)
            ],
        )

    per_doc = documents.select(
        "doc_id", F.aggregate(toks, init, merge).alias("acc")
    ).select(
        "doc_id",
        F.col("acc.dl").alias("dl"),
        *[F.col(f"acc.tf_{i}").alias(f"tf_{i}") for i in range(len(BM25_TERMS))],
    )
    return _score_and_rank(per_doc)


def l20_agg_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate() traversal with a packed-long accumulator."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def merge(acc, x):
        step = F.lit(1).cast("long")
        for i, t in enumerate(BM25_TERMS):
            step = step + F.when(
                x == F.lit(t), F.lit(1 << (16 * (i + 1))).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc + step

    packed = F.aggregate(toks, F.lit(0).cast("long"), merge)
    mask = F.lit((1 << 16) - 1).cast("long")
    per_doc = documents.select("doc_id", packed.alias("p")).select(
        "doc_id",
        (F.col("p").bitwiseAND(mask)).cast("double").alias("dl"),
        *[
            (F.shiftrightunsigned(F.col("p"), 16 * (i + 1)).bitwiseAND(mask))
            .cast("double")
            .alias(f"tf_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    return _score_and_rank(per_doc)


VARIANTS = {
    "baseline": None,  # registry l20
    "agg_struct": l20_agg_struct,
    "agg_packed": l20_agg_packed,
}


def _run(variant: str, corpus: str) -> int:
    registry.load_all()
    spark = get_spark(f"l20ab-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = VARIANTS[variant] or registry.QUERIES["l20_bm25_search"]
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
            {"variant": variant, "cold_s": round(cold, 4), "walls": walls}
        ),
        flush=True,
    )
    spark.stop()
    return 0


def _drive(corpus: str) -> int:
    """3 fresh processes per variant, interleaved (the q3_hint_ab
    protocol: process-level JIT variance dwarfs most strategy deltas,
    so samples of each variant are spread across the session)."""
    for rnd in range(3):
        for variant in VARIANTS:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant, corpus],
                capture_output=True,
                text=True,
                cwd=ROOT,
            )
            out = proc.stdout.strip().splitlines()
            print(
                out[-1]
                if out and proc.returncode == 0
                else json.dumps(
                    {
                        "variant": variant,
                        "round": rnd,
                        "error": (proc.stderr.strip().splitlines() or ["died"])[
                            -1
                        ][:200],
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--drive":
        corpus = (
            sys.argv[2]
            if len(sys.argv) > 2
            else os.path.join(ROOT, ".scratch", "scale_smoke_300x")
        )
        raise SystemExit(_drive(corpus))
    raise SystemExit(_run(sys.argv[1], sys.argv[2]))
