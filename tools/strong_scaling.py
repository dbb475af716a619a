"""Strong-scaling ladder — the multi-executor proxy measurement.

The sandbox is a single JVM (`local[N]`), so multi-NODE execution
can't be demonstrated directly; what CAN be measured is whether the
engine's plans actually parallelize: fixed work (the 10x-replicated
sf0.1 corpus shared with tools/scale_smoke.py), varying only the
core count. A plan that partitions correctly — scan splits sized by
``maxPartitionBytes``, shuffles keyed on the group/join columns, no
driver-side funnel — speeds up with cores until input splits or
fixed JVM overhead bound it; a plan with a hidden serial stage
(driver collect, single-partition sort, an un-parallelized Python
boundary) stays flat and is exposed here immediately.

Method: for each rung of the ladder (default 4/16/32 cores) build a
FRESH SparkSession at ``local[cores]`` (SPARK_GRAFT_CPUS is what
hetnetdb_spark.session.get_spark reads), run each query once cold
and take min-of-5 warm, then stop the session so the next rung's
scheduler sees its own core budget.

Byte-based knobs are scaled DOWN to fixture scale, deliberately.
Production defaults (128 MB ``maxPartitionBytes``, 64 MB AQE
advisory) on a ~108 MB lineitem written as 11 part files yield 11
scan splits and a 1-partition post-shuffle stage — i.e. they
simulate a deployment where the WHOLE CLUSTER holds one executor's
worth of data, and every rung above ~11 cores measures nothing (the
first recording of this ladder showed exactly that: 1.3x "speedups"
that indicted the fixture, not the plans). At 100 TB the same knobs
produce tens of thousands of splits and hundreds of post-shuffle
partitions; what transfers from fixture to production is the plan
STRUCTURE (which stages exist, what they key on, whether anything
funnels through the driver), so the ladder sets ``maxPartitionBytes``
and ``advisoryPartitionSizeInBytes`` to 4 MB — restoring
splits-per-core >> 1, the regime every real deployment runs in —
and keeps all non-byte confs at engine defaults.

Reading the result: ``speedup`` is rung-4-wall / rung-N-wall
(ideal = N/4); ``efficiency`` divides that by the core ratio.
Perfect linear scaling is NOT expected at these sizes — per-stage
fixed costs (task launch, codegen, Arrow setup) are a visible
fraction of a 30–500 ms query — so the gate is two-part:
 * queries with enough base work (lo-rung wall >= GATE_FLOOR_S)
   must speed up >= MIN_SPEEDUP x from 4->32;
 * EVERY query, however small, must not DEGRADE with cores beyond
   measurement noise (speedup >= NO_DEGRADE), which is the signature
   that would indict the plan at 1000 executors. Sub-floor queries
   are reported as ``overhead_bound`` rather than pass/fail: their
   wall is dominated by fixed scheduling cost that amortizes away at
   scale, so a speedup number there carries no signal either way.

Queries: the scan/join/agg/window headliners whose fact side is
replicated 10x (documents/embeddings are copied-through dims in the
shared corpus, so their queries would measure fixed work and are
covered by the slope programs instead).

Usage:
    python tools/strong_scaling.py                 # 4,16,32 ladder
    SPARK_GRAFT_CORES_LADDER=2,8,32 python tools/strong_scaling.py
Prints one JSON line per (cores, query) plus a summary line; exit 1
if any query fails the speedup gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LADDER = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_CORES_LADDER", "4,16,32").split(",")
    if s
]
#: Minimum acceptable speedup from the smallest to the largest rung,
#: applied only to queries whose lo-rung wall is >= GATE_FLOOR_S.
#: Conservative on purpose: 8x cores at fixture scale buys ~3-5x on
#: scan-bound plans once fixed per-stage costs are paid; anything
#: below 1.5x on a query with real work means a serial stage.
MIN_SPEEDUP = float(os.environ.get("SPARK_GRAFT_MIN_SPEEDUP", "1.5"))
#: Queries faster than this at the LO rung are fixed-cost-dominated;
#: they are exempt from MIN_SPEEDUP but still gated on NO_DEGRADE.
#: Calibration (honest fresh-execution runs, round 10): a fresh
#: QueryExecution costs ~0.15 s flat (plan + optimize + schedule +
#: Arrow fetch) and ~0.3-0.45 s for 2-3 stage shapes — a 4-core wall
#: under ~0.8 s is majority floor, and a speedup ratio there measures
#: scheduling overhead, not plan scalability (events_tumbling_1h at
#: the 30x corpus: 0.60 s at c4 of which ~0.45 s is floor; its
#: parallelizable work is real but too small to move the ratio).
GATE_FLOOR_S = float(os.environ.get("SPARK_GRAFT_GATE_FLOOR_S", "0.8"))
#: Hard floor for every query: walls this short are ~20% noisy
#: (min-of-5), so a "speedup" down to 0.75x is indistinguishable
#: from flat; below that is a real degradation and fails the run.
NO_DEGRADE = float(os.environ.get("SPARK_GRAFT_NO_DEGRADE", "0.75"))

#: Byte knobs scaled to fixture size (see module docstring): keep
#: splits-per-core >> 1 at the largest rung, matching the regime a
#: 100 TB deployment is always in.
_LADDER_CONF = {
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(4 * 1024 * 1024),
}

QUERIES = [
    s for s in os.environ.get("SPARK_GRAFT_SCALING_QUERIES", "").split(",") if s
] or [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top3_orders_per_cust",
    "events_sessionize_30m",
    "events_tumbling_1h",
]


def _corpus() -> str:
    """Build (or reuse) scale_smoke's cached 10x corpus.

    SPARK_GRAFT_SCALING_CORPUS overrides with an existing corpus dir
    (r16: the 300x replica, where 8→32-core ratios carry signal —
    at sf0.1 every headliner sits at ≤2x the per-execution floor and
    core count cannot show; see PERF_r15 scaling block)."""
    override = os.environ.get("SPARK_GRAFT_SCALING_CORPUS")
    if override:
        if not os.path.isdir(override):
            raise SystemExit(f"scaling corpus {override} missing")
        return override
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import scale_smoke  # noqa: PLC0415

    from hetnetdb_spark.session import get_spark  # noqa: PLC0415

    if not all(
        os.path.exists(os.path.join(scale_smoke.OUT, f"{t}.parquet"))
        for t in scale_smoke.TABLE_NAMES
    ):
        spark = get_spark("strong-scaling-build")
        spark.sparkContext.setLogLevel("ERROR")
        scale_smoke.replicate(spark)
        spark.stop()
    return scale_smoke.OUT


def _run_rung(cores: int, corpus: str) -> dict[str, float]:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from hetnetdb_spark import registry  # noqa: PLC0415
    from hetnetdb_spark.session import get_spark  # noqa: PLC0415

    registry.load_all()
    spark = get_spark(f"strong-scaling-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in _LADDER_CONF.items():
        spark.conf.set(k, v)
    timings: dict[str, float] = {}
    try:
        for name in QUERIES:
            fn = registry.QUERIES[name]
            fn(spark, corpus).toPandas()  # cold: plan + codegen + IO cache
            warm = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn(spark, corpus).toPandas()
                warm.append(time.perf_counter() - t0)
            timings[name] = round(min(warm), 4)
            print(
                json.dumps({"cores": cores, "query": name, "warm_s": timings[name]}),
                flush=True,
            )
    finally:
        spark.stop()
    return timings


def main() -> int:
    corpus = _corpus()
    by_rung: dict[int, dict[str, float]] = {}
    for cores in LADDER:
        by_rung[cores] = _run_rung(cores, corpus)
    lo, hi = min(LADDER), max(LADDER)
    ratio = hi / lo
    failures = []
    summary = {}
    for name in QUERIES:
        speed = round(by_rung[lo][name] / by_rung[hi][name], 2)
        gated = by_rung[lo][name] >= GATE_FLOOR_S
        summary[name] = {
            "speedup": speed,
            "efficiency": round(speed / ratio, 2),
            "gate": "speedup" if gated else "overhead_bound",
            **{f"c{c}": by_rung[c][name] for c in LADDER},
        }
        if (gated and speed < MIN_SPEEDUP) or speed < NO_DEGRADE:
            failures.append(name)
    print(
        json.dumps(
            {
                "summary": "strong_scaling",
                "cores": f"{lo}->{hi}",
                "ideal": ratio,
                "min_speedup_gate": MIN_SPEEDUP,
                "gate_floor_s": GATE_FLOOR_S,
                "no_degrade_gate": NO_DEGRADE,
                "queries": summary,
                "failures": failures,
            }
        ),
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
