"""Unit seams of tools/cold_audit.py's durable record (r14): the
cold-start watch (VERDICT r13 #4) now lands full-audit runs in
cold_out/cold_latest.json so the over-threshold cohort is comparable
round-over-round mechanically; the summary core is pure."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from cold_audit import cold_summary  # noqa: E402


def test_cold_summary_shape():
    times = {"fast_q": 0.4123, "slow_q": 4.567, "mid_q": 2.99}
    s = cold_summary(times, 3.0)
    assert s["n"] == 3
    assert s["total_s"] == 8.0  # 7.9693 rounds to 8.0
    assert s["mean_s"] == 2.66
    assert s["threshold_s"] == 3.0
    # Only the over-threshold cohort, ordered slowest-first.
    assert list(s["over"]) == ["slow_q"]
    assert s["over"]["slow_q"] == 4.57
    # Full per-query readings ride along at ms precision.
    assert s["queries"]["fast_q"] == 0.412
    assert s["metric"] == "cold_first_run_wall_clock"


def test_cold_summary_degenerate():
    s = cold_summary({}, 3.0)
    assert s["n"] == 0 and s["mean_s"] == 0.0 and s["over"] == {}
