"""r16 scale-story extension (verdict item 6): isolated walls for the
heavy-tail operators at grown corpora, both engines, symmetric
protocol.

Per (query, corpus, engine): ONE fresh subprocess runs the query cold
then min-of-3 (the r14/r15 isolated crossover protocol); the driver
loop alternates engines within a round so box drift lands on both.
A runaway cap ($SPARK_GRAFT_SCALE_CAP_S, default 900 s) applies
SYMMETRICALLY: if the cold run exceeds it the worker records the cold
wall flagged "capped" and skips the warm passes.

Families and factors (quadratic-law operators stop where their pair
space does — documented, not silently truncated):

  l68_dup_span_removal      documents-fact v2 corpus, 30x/100x/300x (linear in chars)
  l19_decontamination       documents-fact v2 corpus, 30x/100x/300x (linear)
  l04_simjoin_lsh_tuned     embeddings-fact corpus, 10x/30x/100x   (candidates ~3% of N^2/2:
                            quadratic by design — the PLANS.md banding law; 300x would be
                            ~5e9 pairs and is out of scope for both engines)
  l73_semantic_dedup_refined embeddings-fact corpus, 10x/30x        (per-cluster pairs N^2/K at
                            fixed K=8 — the docstring's scale posture grows K with the corpus;
                            at fixed K the pair join is quadratic, so the slope stops at 30x)

Usage:
    python tools/scale_story_r16.py --drive [PROCS_PER_ARM]
    python tools/scale_story_r16.py --spark-worker QUERY CORPUS
    python tools/scale_story_r16.py --duck-worker QUERY CORPUS
Prints one JSON line per draw plus a per-(query,factor) summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

CAP_S = float(os.environ.get("SPARK_GRAFT_SCALE_CAP_S", "900"))

SCRATCH = os.path.join(REPO, ".scratch")

PLAN = [
    # (query, corpus_subdir, factor)
    ("l68_dup_span_removal", "scale_smoke_30x_documents_v2", 30),
    ("l68_dup_span_removal", "scale_smoke_100x_documents_v2", 100),
    ("l68_dup_span_removal", "scale_smoke_300x_documents_v2", 300),
    ("l19_decontamination", "scale_smoke_30x_documents_v2", 30),
    ("l19_decontamination", "scale_smoke_100x_documents_v2", 100),
    ("l19_decontamination", "scale_smoke_300x_documents_v2", 300),
    ("l04_simjoin_lsh_tuned", "scale_smoke_10x_embeddings", 10),
    ("l04_simjoin_lsh_tuned", "scale_smoke_30x_embeddings", 30),
    ("l04_simjoin_lsh_tuned", "scale_smoke_100x_embeddings", 100),
    ("l73_semantic_dedup_refined", "scale_smoke_10x_embeddings", 10),
    ("l73_semantic_dedup_refined", "scale_smoke_30x_embeddings", 30),
]


def _spark_worker(query: str, corpus: str) -> int:
    from hetnetdb_spark import registry  # noqa: PLC0415
    from hetnetdb_spark.session import get_spark  # noqa: PLC0415

    registry.load_all()
    spark = get_spark(f"scale-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.QUERIES[query]

    def _reap_shuffles() -> None:
        """Force a JVM GC between passes so the ContextCleaner reaps
        each pass's shuffle files. At the 300x documents corpus one
        l68 execution leaves ~19 GB of shuffle files; without this,
        4 passes in one context accumulate ~75 GB (the heap never
        pressures, so GC — and therefore shuffle cleanup — never
        runs) and the worker dies on spill ENOSPC even though every
        single execution fits comfortably. Runs BETWEEN passes, so
        no timed region includes it. Python gc first (py4j holds
        JVM-side QueryExecution refs until the Python wrappers
        die), then two JVM GCs with a pause — the first enqueues
        the ContextCleaner work, the pause lets it drain."""
        import gc  # noqa: PLC0415

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    t0 = time.perf_counter()
    fn(spark, corpus).toPandas()
    cold = time.perf_counter() - t0
    _reap_shuffles()
    best, capped = float("inf"), cold > CAP_S
    if not capped:
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, corpus).toPandas()
            best = min(best, time.perf_counter() - t0)
            _reap_shuffles()
    print(json.dumps({
        "engine": "spark", "query": query, "cold": round(cold, 3),
        "min3": round(best, 3) if best < float("inf") else None,
        "capped": capped,
    }))
    spark.stop()
    return 0


def _duck_worker(query: str, corpus: str) -> int:
    import duckdb  # noqa: PLC0415

    from hetnetdb_spark import registry  # noqa: PLC0415

    registry.load_all()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(corpus, f"{t}.parquet")
        src = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    sql = registry.ORACLE[query]
    t0 = time.perf_counter()
    con.execute(sql).fetchdf()
    cold = time.perf_counter() - t0
    best, capped = float("inf"), cold > CAP_S
    if not capped:
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchdf()
            best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "engine": "duck", "query": query, "cold": round(cold, 3),
        "min3": round(best, 3) if best < float("inf") else None,
        "capped": capped,
    }))
    return 0


def _drive(procs: int) -> int:
    results: dict[tuple, dict[str, list]] = {}
    for query, sub, factor in PLAN:
        corpus = os.path.join(SCRATCH, sub)
        if not os.path.isdir(corpus):
            print(f"SKIP {query}@{factor}x: corpus {sub} missing", flush=True)
            continue
        key = (query, factor)
        results[key] = {"spark": [], "duck": []}
        for i in range(procs):
            for arm in ("spark", "duck"):  # alternate engines per round
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     f"--{arm}-worker", query, corpus],
                    capture_output=True, text=True, check=False,
                )
                lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    print(f"WORKER FAIL {arm} {query}@{factor}x: "
                          f"{out.stderr[-400:]}", flush=True)
                    continue
                rec = json.loads(lines[-1])
                results[key][arm].append(rec)
                print(f"{query}@{factor}x {arm} draw{i}: cold {rec['cold']}"
                      f" min3 {rec['min3']} capped={rec['capped']}", flush=True)
    print("\n=== SUMMARY (isolated min across procs; cold if capped) ===")
    for (query, factor), arms in results.items():
        row = {}
        for arm, recs in arms.items():
            walls = [r["min3"] if r["min3"] is not None else r["cold"]
                     for r in recs]
            row[arm] = min(walls) if walls else None
        ratio = (row["spark"] / row["duck"]
                 if row.get("spark") and row.get("duck") else None)
        print(json.dumps({
            "query": query, "factor": factor,
            "spark_s": row.get("spark"), "duck_s": row.get("duck"),
            "ratio": round(ratio, 3) if ratio else None,
        }))
    return 0


def main() -> int:
    if sys.argv[1] == "--spark-worker":
        return _spark_worker(sys.argv[2], sys.argv[3])
    if sys.argv[1] == "--duck-worker":
        return _duck_worker(sys.argv[2], sys.argv[3])
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    return _drive(procs)


if __name__ == "__main__":
    sys.exit(main())
