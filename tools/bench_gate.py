"""Full-suite regression gate (VERDICT r4 item 7, made mechanical).

Runs `bench.py` in full-suite mode semantics? No — it consumes a
PRE-RUN full-suite JSON (pipe `SPARK_GRAFT_BENCH_FULL=1 python
bench.py` output in, or pass a file) and diffs it against
SUITE_BASELINE.json, flagging any query slower than GATE_RATIO x
its baseline and any baseline query that vanished. Exit 1 on
regressions so a round script can gate on it.

Usage:
    SPARK_GRAFT_BENCH_FULL=1 python bench.py | python tools/bench_gate.py
    python tools/bench_gate.py path/to/bench_output.json
"""

from __future__ import annotations

import json
import os
import sys

GATE_RATIO = 1.5
#: queries under this cost are dominated by scheduler noise; a ratio
#: gate on a 20 ms row flags weather, not regressions
MIN_BASE_SEC = 0.05

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    base = json.load(open(os.path.join(ROOT, "SUITE_BASELINE.json")))["suite"]
    src = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    cur = None
    for ln in src:
        ln = ln.strip()
        if ln.startswith("{"):
            d = json.loads(ln)
            if "suite" in d:
                cur = d["suite"]
    if cur is None:
        print("bench_gate: no full-suite JSON on input "
              "(run with SPARK_GRAFT_BENCH_FULL=1)", file=sys.stderr)
        return 2

    regressions, missing = [], []
    for name, b in sorted(base.items()):
        c = cur.get(name)
        if c is None:
            missing.append(name)
        elif b >= MIN_BASE_SEC and c > b * GATE_RATIO:
            regressions.append((name, b, c, c / b))
    for name, b, c, r in regressions:
        print(f"REGRESSION {name}: {b:.3f}s -> {c:.3f}s ({r:.2f}x)")
    for name in missing:
        print(f"MISSING {name}: in baseline but not in this run")
    n_new = len(set(cur) - set(base))
    print(f"gate: {len(cur)} timed, {n_new} new vs baseline, "
          f"{len(regressions)} regressions >{GATE_RATIO}x, "
          f"{len(missing)} missing")
    return 1 if regressions or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
