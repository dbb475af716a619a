"""Full-suite bench diff — mechanize the non-headline regression
check (round-9 verdict item 8).

Compares a FULL-mode bench artifact (``SPARK_GRAFT_BENCH_FULL=1
python bench.py`` output, saved as SUITE_r{N}.json) against
SUITE_BASELINE.json's element-wise-min suite and prints every query
slower than THRESHOLD× its baseline. Exit 1 on any unexplained flag,
so the round checklist catches non-headline regressions the moment
they land instead of by judge spot-check.

Queries NEW since the baseline (no baseline entry) are reported
informationally and do not flag. With ``--update-baseline`` the
baseline is rewritten as the element-wise min of itself and the new
run (the baseline's own stated maintenance rule), so one-off
co-tenant spikes can only ever LOWER the reference.

Usage:
    python tools/suite_diff.py SUITE_r09.json
    python tools/suite_diff.py SUITE_r09.json --update-baseline
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "SUITE_BASELINE.json")
THRESHOLD = 1.5

#: Measured-single-pass noise floor: a 17 ms query reading 21 ms is
#: co-tenant jitter, not a regression. Flag only queries whose
#: absolute slowdown also exceeds this bound.
MIN_DELTA_S = 0.05


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    run_path = sys.argv[1]
    update = "--update-baseline" in sys.argv
    with open(run_path, encoding="utf-8") as f:
        run = json.load(f)
    suite = run.get("suite")
    if not suite:
        print(f"{run_path} has no 'suite' key — run bench.py with "
              "SPARK_GRAFT_BENCH_FULL=1")
        return 2
    with open(BASELINE, encoding="utf-8") as f:
        base_doc = json.load(f)
    base = base_doc["suite"]

    flagged, new, failed = [], [], []
    for name, t in sorted(suite.items()):
        if t < 0:
            failed.append(name)
            continue
        b = base.get(name)
        if b is None:
            new.append(name)
            continue
        if t > b * THRESHOLD and t - b > MIN_DELTA_S:
            flagged.append((name, b, t))
    for name, b, t in flagged:
        print(f"FLAG  {name:40s} {b:.3f}s -> {t:.3f}s  ({t / b:.2f}x)")
    for name in new:
        print(f"new   {name:40s} enters at {suite[name]:.3f}s")
    for name in failed:
        print(f"FAIL  {name:40s} errored during the bench run")
    print(
        f"\n{len(suite)} suite queries vs {os.path.basename(BASELINE)}: "
        f"{len(flagged)} flagged (> {THRESHOLD}x and > {MIN_DELTA_S * 1000:.0f} ms), "
        f"{len(new)} new, {len(failed)} failed"
    )

    if update:
        merged = dict(base)
        for name, t in suite.items():
            if t < 0:
                continue
            merged[name] = round(min(t, merged.get(name, t)), 4)
        base_doc["suite"] = dict(sorted(merged.items()))
        with open(BASELINE, "w", encoding="utf-8") as f:
            json.dump(base_doc, f, indent=1)
            f.write("\n")
        print(f"baseline updated: element-wise min over {len(merged)} queries")
    return 1 if flagged or failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
