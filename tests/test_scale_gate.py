"""tools/scale_gate.py semantics — the recorded scale-story gate.

The gate is the repo's machine-checked posture claim (BASELINE.md
round 11); these tests pin its three rules against synthetic
SCALE_STORY documents so a future edit cannot silently weaken them,
plus assert the COMMITTED artifact currently passes.
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


def test_g1_passes_at_or_below_one():
    fails, summary = evaluate(_doc({1: 8.0, 100: 0.9}))
    assert fails == []
    assert summary["gate_factor"] == 100
    assert summary["gate_ratio"] == 0.9


def test_g1_fails_above_one():
    fails, _ = evaluate(_doc({1: 8.0, 100: 1.2}))
    assert any("G1" in f for f in fails)


def test_gate_factor_is_first_at_or_above_100():
    # 150 is the first recorded factor >= 100 — the gate must bind
    # there, not at the largest factor
    fails, summary = evaluate(_doc({30: 2.0, 150: 0.8, 300: 0.5}))
    assert fails == []
    assert summary["gate_factor"] == 150


def test_missing_large_factor_is_a_failure():
    fails, _ = evaluate(_doc({1: 8.0, 30: 2.0}))
    assert fails, "a curve with no >=100x point must not pass"


def test_g2_curve_must_not_turn_back_up():
    fails, _ = evaluate(_doc({100: 0.8, 300: 1.5}))
    assert any("G2" in f for f in fails)


def test_g2_small_wobble_tolerated():
    fails, _ = evaluate(_doc({100: 0.8, 300: 0.9}))
    assert fails == []


def test_g3_pipeline_bound():
    fails, _ = evaluate(_doc({100: 0.8}, pipe={10: 1.0, 100: 1.5}))
    assert any("G3" in f for f in fails)
    fails, _ = evaluate(_doc({100: 0.8}, pipe={10: 1.8, 100: 1.1}))
    assert fails == []  # only the LARGEST pipeline factor is gated


def test_committed_artifact_passes():
    with open(os.path.join(ROOT, "SCALE_STORY.json")) as fh:
        doc = json.load(fh)
    fails, summary = evaluate(doc)
    assert fails == [], fails
    assert summary["gate_ratio"] <= 1.0
    assert summary["pipeline_ratio"] <= 1.25
