"""Scale-trajectory smoke: replicate sf0.1 Nx into scratch and time
the headline queries at both scales.

The 100 TB claim is a statement about *slope*: a query whose plan is
scan-bound with bounded shuffles should scale near-linearly in input
size (flat per-row cost), while anything quadratic or
driver-bottlenecked blows past linear. This script measures that
slope empirically at 10x.

Replication keeps every distribution identical but multiplies row
counts; ids are offset per replica so keys stay unique where they
were unique (events/orders/lineitem replica rows get distinct ids
but the SAME dimension keys, mirroring fact growth over a fixed
dimension space).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hetnetdb_spark import registry
from hetnetdb_spark.schemas import TABLE_NAMES
from hetnetdb_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

#: Tables to replicate as facts IN ADDITION to the default fact set —
#: e.g. SPARK_GRAFT_SMOKE_FACTS=documents when slope-testing the
#: corpus-prep operators (documents is a copied-through dim for the
#: headline set, so its queries would otherwise see 1x input).
EXTRA_FACTS = {
    s for s in os.environ.get("SPARK_GRAFT_SMOKE_FACTS", "").split(",") if s
}

_TAG = "_".join(sorted(EXTRA_FACTS))
if "documents" in EXTRA_FACTS:
    # v2 = replica-SALTED documents (see replicate()): verbatim
    # replication is degenerate for pair-generating queries — every
    # doc gains FACTOR-1 exact copies, so banded-LSH candidate pairs
    # grow quadratically in the factor (~4G pairs at 300×; measured:
    # DuckDB OOM/903 s, Spark exhausted spill disk). Real corpora
    # hold near-dup density roughly constant as they grow; the salt
    # restores that, so the crossover measures the ALGORITHM's
    # scaling, not a synthetic-corpus pathology.
    _TAG += "_v2"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    f"scale_smoke_{FACTOR}x" + (f"_{_TAG}" if _TAG else ""),
)

#: Fact tables replicate with offset ids; dims copy through.
FACT_ID_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": [],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}

_DEFAULT_HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top3_orders_per_cust",
    "events_sessionize_30m",
    "events_tumbling_1h",
    "docs_token_counts",
    "emb_topk_cosine",
]

#: Comma-separated query-name override for targeted slope runs.
HEADLINE = [
    s for s in os.environ.get("SPARK_GRAFT_SMOKE_QUERIES", "").split(",") if s
] or _DEFAULT_HEADLINE

DIMS = {"nation", "region", "customer", "supplier", "part",
        "documents", "embeddings"} - EXTRA_FACTS


def replicate(spark) -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in TABLE_NAMES:
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        if name in DIMS:
            src.write.mode("overwrite").parquet(dst)
            continue
        offset_cols = FACT_ID_OFFSETS[name]
        copies = []
        for i in range(FACTOR):
            c = src
            for col in offset_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
            if name == "documents" and i > 0:
                # Replica salt: map the five vowels to the replica
                # index's five digits — a pervasive, deterministic,
                # length-preserving mutation that decorrelates the
                # replica's shingles/minhashes from every other
                # replica's, keeping near-dup candidate density at
                # the BASE corpus's natural level as the corpus
                # grows (real-data shape). Replica 0 stays verbatim
                # so the original content is always present.
                c = c.withColumn(
                    "text",
                    F.translate(F.col("text"), "aeiou", f"{i % 100000:05d}"),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)


def run(spark, sf_dir: str) -> dict[str, float]:
    timings = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).toPandas()  # cold
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            warm.append(time.perf_counter() - t0)
        timings[name] = round(min(warm), 4)
    return timings


def main() -> None:
    registry.load_all()
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark)
    base = run(spark, BASE)
    big = run(spark, OUT)
    report = {
        "factor": FACTOR,
        "base": base,
        "scaled": big,
        "slope": {k: round(big[k] / base[k], 2) for k in base},
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
