"""local-cluster vs local[N] — the closest in-sandbox proxy for
multi-node execution (r11 verdict item 7).

`local[32]` runs executors as THREADS in one JVM: shuffles move
pointers, broadcasts share a heap, and serialization costs are
never paid. `local-cluster[2,16,mem]` launches two REAL executor
JVMs behind the standalone scheduler: every shuffle block and
broadcast crosses a process boundary through the exact serializer,
fetcher, and netty stack a 1000-executor deployment uses. A query
whose local-cluster wall blows past its local[32] wall by much more
than the expected serialization overhead is moving payload a real
cluster would feel — that is the signal this probe records.

Method: per (mode, query) SPARK_GRAFT_LC_PROCS fresh processes
(default 1; use 3 before trusting a flag — the r14 headline probe
read q3 at 2.40x and window at 1.55x from single processes, and the
min over 3 resolved them to 1.26x and 0.99x: process-to-process JIT
variance, the Q3_HINT_AB lesson), each cold + min-of-3 warm, same
corpus, same session conf. Writes one JSON line per measurement and
a final summary with per-query min-basis local-cluster/local ratios.

Usage:
    python tools/local_cluster_probe.py                # 30x corpus
    SPARK_GRAFT_LC_CORPUS=... SPARK_GRAFT_LC_QUERIES=q1_pricing_summary,...
    python tools/local_cluster_probe.py --worker <master> <query> <corpus>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    s for s in os.environ.get("SPARK_GRAFT_LC_QUERIES", "").split(",") if s
] or [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top3_orders_per_cust",
    "events_sessionize_30m",
    "events_tumbling_1h",
    "docs_token_counts",
    "emb_topk_cosine",
]

CORPUS = os.environ.get(
    "SPARK_GRAFT_LC_CORPUS",
    os.path.join(REPO, ".scratch", "scale_smoke_30x"),
)

#: Both modes expose 32 cores; local-cluster splits them over two
#: 16-core executor JVMs with 12 GiB each (the sandbox has 128 GiB,
#: so memory pressure is not part of the comparison).
MODES = {
    "local": "local[32]",
    "local-cluster": "local-cluster[2,16,12288]",
}

#: r14 finding: local-cluster[w,c,MEM] sizes the WORKER's resource
#: pool only — the executor JVM still launches with the 1 GiB
#: spark.executor.memory DEFAULT (executor stderr showed a 432 MiB
#: MemoryStore under the "12 GiB" worker), and q3/q5 at the 300×
#: corpus exited code 52 (JVM OOM) in heaps 12× smaller than
#: intended. Every probe must set executor memory explicitly to the
#: worker allocation; 11g leaves headroom for the worker's own
#: bookkeeping inside the 12288 MiB pool.
EXECUTOR_MEM = os.environ.get("SPARK_GRAFT_LC_EXECUTOR_MEM", "11g")


def _worker(master: str, query: str, corpus: str) -> int:
    from pyspark.sql import SparkSession  # noqa: PLC0415

    from hetnetdb_spark import registry  # noqa: PLC0415
    from hetnetdb_spark.session import SESSION_CONF, configure  # noqa: PLC0415

    registry.load_all()
    builder = (
        SparkSession.builder.appName("lc-probe")
        .master(master)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local-cluster"):
        builder = builder.config("spark.executor.memory", EXECUTOR_MEM)
    for k, v in SESSION_CONF.items():
        builder = builder.config(k, v)
    spark = configure(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.QUERIES[query]
    fn(spark, corpus).toPandas()  # cold: JIT + page cache
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, corpus).toPandas()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"query": query, "warm_s": round(best, 4)}))
    spark.stop()
    return 0


PROCS = int(os.environ.get("SPARK_GRAFT_LC_PROCS", "1"))


def main() -> int:
    walls: dict[str, dict[str, float]] = {m: {} for m in MODES}
    for rnd in range(PROCS):
        for mode, master in MODES.items():
            for name in QUERIES:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--worker",
                        master,
                        name,
                        CORPUS,
                    ],
                    capture_output=True,
                    text=True,
                    cwd=REPO,
                )
                if proc.returncode != 0:
                    print(
                        json.dumps(
                            {
                                "mode": mode,
                                "query": name,
                                "round": rnd,
                                "error": proc.stderr.strip().splitlines()[-1][:200]
                                if proc.stderr.strip()
                                else "worker died",
                            }
                        ),
                        flush=True,
                    )
                    continue
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                prev = walls[mode].get(name)
                walls[mode][name] = (
                    rec["warm_s"] if prev is None else min(prev, rec["warm_s"])
                )
                print(
                    json.dumps(
                        {
                            "mode": mode,
                            "query": name,
                            "round": rnd,
                            "warm_s": rec["warm_s"],
                        }
                    ),
                    flush=True,
                )
    summary = {
        q: {
            "local_s": walls["local"].get(q),
            "local_cluster_s": walls["local-cluster"].get(q),
            "ratio": round(walls["local-cluster"][q] / walls["local"][q], 3)
            if q in walls["local"] and q in walls["local-cluster"]
            else None,
        }
        for q in QUERIES
    }
    print(json.dumps({"summary": "local_cluster_probe", "corpus": CORPUS,
                      "modes": MODES, "queries": summary}), flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        raise SystemExit(_worker(sys.argv[2], sys.argv[3], sys.argv[4]))
    raise SystemExit(main())
