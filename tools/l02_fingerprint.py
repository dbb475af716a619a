"""l02 300x per-process plan fingerprint (r14 verdict item 6).

CROSSOVER_r14_pipeline.txt recorded l02's isolated 300x legs as
proc_walls [71.3, 273.3 capped] — a 3.8x spread the verdict asked to
diagnose rather than let min-of-N absorb. Two confounds in that
recording make the raw numbers uninterpretable as "bimodality":

1. The 273.3 s draw was the second process's COLD run — the 240 s
   SPARK_GRAFT_CROSSOVER_DUCK_CAP_S (a DuckDB-runaway cap) also fires
   on Spark workers, records the cold wall as the draw, and BREAKS
   the process loop, so no warm pass of proc 2 and no proc 3 exist.
   Proc 1's 71.3 s is a warm min. Cold-vs-warm is not a plan flip.
2. Nothing recorded WHICH stage was slow, or whether the AQE final
   plan even differed between processes.

This tool removes both confounds: N fresh processes, each records its
cold wall AND every warm wall, and for EVERY pass walks the executed
plan (AQE final) to record (a) a normalized plan fingerprint — node
tree with expression ids stripped, md5-hashed — plus exchange /
WholeStageCodegen counts, and (b) every SQLMetric whose key smells
like a duration, attributed to its node. Fastest-vs-slowest process
comparison then either names the flipping stage (same fingerprint,
one node's duration exploding → the l14 sticky-JIT mode) or shows a
plan divergence (different fingerprint → AQE re-plan).

Usage:
    python tools/l02_fingerprint.py --worker CORPUS [WARM]
    python tools/l02_fingerprint.py --drive [CORPUS] [PROCS]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY = os.environ.get("SPARK_GRAFT_FP_QUERY", "l02_minhash_neardup")

#: SQLMetric keys counted as "time-like". Spark reports WSCG duration
#: in ms, shuffle write time in ns, sort/build times in ms — raw
#: values plus the key are recorded; comparisons are within-key.
_TIME_PAT = re.compile(r"time|duration", re.IGNORECASE)


def _walk(node, nodes: list, times: list) -> None:
    cls = node.getClass().getSimpleName()
    if "QueryStage" in cls:
        _walk(node.plan(), nodes, times)
        return
    name = node.nodeName()
    try:
        first = node.simpleString(8).splitlines()[0]
    except Exception:
        first = name
    # Normalize: strip expression ids (#123, #123L), plan ids, subquery
    # ids, and exchange coordinator ids so the fingerprint is stable
    # across processes running the identical logical plan.
    norm = re.sub(r"#\d+L?", "#x", first)
    norm = re.sub(r"plan_id=\d+", "plan_id=x", norm)
    norm = re.sub(r"\[id=#?x?\d*\]", "", norm)
    nodes.append(norm[:200])
    idx = len(nodes) - 1
    try:
        m = node.metrics()
        it = m.keysIterator()
        while it.hasNext():
            k = it.next()
            if _TIME_PAT.search(k):
                v = int(m.apply(k).value())
                if v > 0:
                    times.append(
                        {"node_idx": idx, "node": norm[:120], "metric": k, "value": v}
                    )
    except Exception:
        pass
    for i in range(node.children().size()):
        _walk(node.children().apply(i), nodes, times)


def _fingerprint(df) -> dict:
    jplan = df._jdf.queryExecution().executedPlan()
    try:
        root = jplan.finalPhysicalPlan()
    except Exception:
        root = jplan
    nodes: list[str] = []
    times: list[dict] = []
    _walk(root, nodes, times)
    blob = "\n".join(nodes)
    times.sort(key=lambda t: -t["value"])
    return {
        "plan_md5": hashlib.md5(blob.encode()).hexdigest()[:12],
        "n_nodes": len(nodes),
        "n_exchanges": sum(
            1 for n in nodes if "Exchange" in n and "Broadcast" not in n
        ),
        "n_broadcasts": sum(1 for n in nodes if n.startswith("BroadcastExchange")),
        "n_wscg": sum(1 for n in nodes if n.startswith("WholeStageCodegen")),
        "top_times": times[:10],
    }


def _worker(corpus: str, warm: int) -> int:
    from hetnetdb_spark import registry  # noqa: PLC0415
    from hetnetdb_spark.session import get_spark  # noqa: PLC0415

    registry.load_all()
    spark = get_spark("l02-fingerprint")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.QUERIES[QUERY]
    for i in range(warm + 1):
        t0 = time.perf_counter()
        df = fn(spark, corpus)
        df.toPandas()
        wall = time.perf_counter() - t0
        rec = {"pass": "cold" if i == 0 else f"warm{i}", "wall_s": round(wall, 3)}
        rec.update(_fingerprint(df))
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


def _drive(corpus: str, procs: int) -> int:
    per_proc: list[dict] = []
    for p in range(procs):
        run = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", corpus, "2"],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        passes = []
        for ln in run.stdout.splitlines():
            if ln.startswith("{"):
                rec = json.loads(ln)
                rec["proc"] = p
                print(json.dumps(rec), flush=True)
                passes.append(rec)
        if run.returncode != 0 or not passes:
            tail = (
                run.stderr.strip().splitlines()[-1][:200]
                if run.stderr.strip()
                else "worker died"
            )
            print(json.dumps({"proc": p, "error": tail}), flush=True)
            continue
        per_proc.append(
            {
                "proc": p,
                "cold_s": passes[0]["wall_s"],
                "warm_min_s": min(r["wall_s"] for r in passes[1:]) if len(passes) > 1 else None,
                "plans": sorted({r["plan_md5"] for r in passes}),
            }
        )
    fps = sorted({fp for pp in per_proc for fp in pp["plans"]})
    summary = {
        "summary": "l02_fingerprint",
        "query": QUERY,
        "corpus": corpus,
        "procs": per_proc,
        "distinct_plans": fps,
        "warm_min_distribution": sorted(
            pp["warm_min_s"] for pp in per_proc if pp["warm_min_s"] is not None
        ),
        "cold_distribution": sorted(pp["cold_s"] for pp in per_proc),
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--worker":
        warm = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        raise SystemExit(_worker(sys.argv[2], warm))
    if sys.argv[1] == "--drive":
        corpus = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            REPO, ".scratch", "scale_smoke_300x_documents_v2"
        )
        procs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        raise SystemExit(_drive(corpus, procs))
    raise SystemExit(2)
