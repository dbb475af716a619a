"""tools/scale_gate.py semantics — the recorded scale-story gate.

The gate is the repo's machine-checked posture claim (BASELINE.md,
re-grounded round 12: G1 binds at the LARGEST factor, which must be
>= 300x — the old first-factor->=100x rule flapped on the DuckDB
leg's q5 spill-cliff bimodality with zero Spark-side change); these
tests pin the rules against synthetic SCALE_STORY documents so a
future edit cannot silently weaken them, plus assert the COMMITTED
artifact currently passes.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from scale_gate import evaluate  # noqa: E402


def _doc(head: dict[str, float], pipe: dict[str, float] | None = None) -> dict:
    out = {
        "headline": {
            "factors": {str(k): {"ratio": v} for k, v in head.items()}
        }
    }
    if pipe is not None:
        out["pipeline"] = {
            "factors": {str(k): {"ratio": v} for k, v in pipe.items()}
        }
    return out


def test_g1_passes_at_or_below_one_at_largest():
    fails, summary = evaluate(_doc({1: 8.0, 100: 1.7, 300: 0.3}))
    assert fails == []
    assert summary["largest_factor"] == 300
    assert summary["largest_ratio"] == 0.3


def test_g1_fails_above_one_at_largest():
    fails, _ = evaluate(_doc({1: 8.0, 100: 0.9, 300: 1.2}))
    assert any("G1" in f for f in fails)


def test_g1_requires_a_300x_measurement():
    # A curve that stops at 100x cannot pass, even inverted there —
    # the r12 rule demands the claim be measured where it is
    # decisive, not where the DuckDB leg happens to spill.
    fails, _ = evaluate(_doc({1: 8.0, 100: 0.8}))
    assert any("G1" in f and "largest recorded factor" in f for f in fails)


def test_crossover_point_is_reported_not_gated():
    # Crossover lands at 300x here (100x still above 1.0) — that is
    # reported, and G1 still passes on the largest factor.
    fails, summary = evaluate(_doc({30: 2.2, 100: 1.7, 300: 0.27}))
    assert fails == []
    assert summary["crossover_factor"] == 300
    # And when 100x inverts, the crossover point moves there.
    fails, summary = evaluate(_doc({30: 2.2, 100: 0.72, 300: 0.36}))
    assert fails == []
    assert summary["crossover_factor"] == 100


def test_g2_curve_must_not_turn_back_up_after_crossover():
    fails, _ = evaluate(_doc({100: 0.8, 300: 1.0}))
    assert any("G2" in f for f in fails)


def test_g2_small_wobble_tolerated():
    fails, _ = evaluate(_doc({100: 0.8, 300: 0.9}))
    assert fails == []


def test_g3_pipeline_bound():
    head = {100: 1.7, 300: 0.3}
    fails, _ = evaluate(_doc(head, pipe={10: 1.0, 300: 1.5}))
    assert any("G3" in f for f in fails)
    fails, _ = evaluate(_doc(head, pipe={10: 1.8, 300: 1.1}))
    assert fails == []  # only the LARGEST pipeline factor is gated


def test_committed_artifact_passes():
    with open(os.path.join(ROOT, "SCALE_STORY.json")) as fh:
        doc = json.load(fh)
    fails, summary = evaluate(doc)
    assert fails == [], fails
    assert summary["largest_ratio"] <= 1.0
    assert summary["pipeline_ratio"] <= 1.25
