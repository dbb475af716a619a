"""Adjudicate the two NEW r14 300x letters (r14 verdict item 3):
window_top3_orders_per_cust 2.01x -> 3.43x and events_sessionize_30m
1.78x -> 2.88x, both with headline code untouched between r13 and r14.

Timeline forensics first (recorded here so the adjudication stands on
facts, not draw folklore): the 300x corpus at .scratch/scale_smoke_300x
was written 10:14-10:15 on the round-13/14 box day, BEFORE both the
r13 crossover recording (commit 9fc95c6, 14:35) and the r14 one
(commit 34e3606, 21:28) — the two recordings read the IDENTICAL
parquet files, so corpus regeneration is ruled out. And the two
engines moved in OPPOSITE directions (Spark +26-27%, DuckDB -22-26%),
which no box-wide contention story produces. What remains is
per-recording draw variance on both sides — exactly what this tool
measures: N fresh-process interleaved draws per (query, engine) at the
same corpus, Spark via engine_crossover's --worker (cold + min-of-3
inside each process, min across processes = the recorded protocol),
DuckDB via an equivalent fresh-process worker over the same files.

Interleaving (q1 spark, q1 duck, q2 spark, q2 duck, next round...)
spreads each engine's draws across the session so a load transient
hits both engines, not one.

Usage:
    python tools/letters_ab_r15.py --drive [CORPUS] [ROUNDS]
    python tools/letters_ab_r15.py --duck-worker QUERY CORPUS
Prints one JSON line per draw plus a summary with min/median walls
and the r13/r14 recorded walls alongside.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["window_top3_orders_per_cust", "events_sessionize_30m"]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Recorded walls being adjudicated (CROSSOVER_r13.txt line 92-93 /
#: CROSSOVER_r14.txt factor-300 block, isolated basis for Spark).
RECORDED = {
    "window_top3_orders_per_cust": {
        "spark_r13": 4.3312, "spark_r14": 5.4977,
        "duck_r13": 2.1511, "duck_r14": 1.6027,
    },
    "events_sessionize_30m": {
        "spark_r13": 3.3498, "spark_r14": 4.2106,
        "duck_r13": 1.8836, "duck_r14": 1.4619,
    },
}


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
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchdf()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"query": query, "warm_s": round(best, 4),
                      "cold_s": round(cold, 4)}))
    return 0


def _one_draw(engine: str, query: str, corpus: str) -> dict:
    if engine == "spark":
        cmd = [sys.executable, os.path.join(REPO, "tools", "engine_crossover.py"),
               "--worker", query, corpus, "3"]
    else:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--duck-worker", query, corpus]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-1][:200] if proc.stderr.strip() else "died"
        return {"engine": engine, "query": query, "error": tail}
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    rec["engine"] = engine
    return rec


def _drive(corpus: str, rounds: int) -> int:
    walls: dict[tuple[str, str], list[float]] = {}
    for rnd in range(rounds):
        for query in QUERIES:
            for engine in ("spark", "duck"):
                rec = _one_draw(engine, query, corpus)
                rec["round"] = rnd
                print(json.dumps(rec), flush=True)
                if "warm_s" in rec:
                    walls.setdefault((engine, query), []).append(rec["warm_s"])
    summary: dict[str, dict] = {}
    for query in QUERIES:
        q: dict[str, object] = dict(RECORDED[query])
        for engine in ("spark", "duck"):
            ws = sorted(walls.get((engine, query), []))
            if ws:
                q[f"{engine}_draws"] = ws
                q[f"{engine}_min"] = ws[0]
                q[f"{engine}_median"] = round(statistics.median(ws), 4)
        if (engine_min := q.get("spark_min")) and q.get("duck_min"):
            q["ratio_min_basis"] = round(engine_min / q["duck_min"], 3)  # type: ignore[operator]
        summary[query] = q
    print(json.dumps({"summary": "letters_ab_r15", "corpus": corpus,
                      "rounds": rounds, "queries": summary}), flush=True)
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--duck-worker":
        raise SystemExit(_duck_worker(sys.argv[2], sys.argv[3]))
    if sys.argv[1] == "--drive":
        corpus = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            REPO, ".scratch", "scale_smoke_300x")
        rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        raise SystemExit(_drive(corpus, rounds))
    raise SystemExit(2)
