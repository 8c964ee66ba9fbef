"""Tests for tools/compare_bench.py's trial-drift detector
(VERDICT r12 #4): the session-state contamination signature —
per-query trials rising monotonically >15% end-to-end — that the r12
semdedup root-cause diagnosed by hand must now be flagged
mechanically, replayed against the actual recorded r12 driver bench
history file."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from compare_bench import report_trial_drift, trial_drift  # noqa: E402

R12_HISTORY = os.path.join(REPO, "bench_out", "history", "3ea313968dad.json")


def test_trial_drift_signature():
    # The r12 semdedup reading: monotone AND >15% end-to-end -> drift.
    assert trial_drift([4.604, 5.137, 6.055])
    # Flat-but-slow (a REAL regression shape) is not drift.
    assert not trial_drift([4.6, 4.7, 4.6])
    # Monotone but within the 15% band (warm-up jitter) is not drift.
    assert not trial_drift([1.00, 1.05, 1.10])
    # Noisy (non-monotone) container load is not drift.
    assert not trial_drift([4.6, 6.0, 5.1])
    # Needs three trials to call a shape; degenerate inputs are quiet.
    assert not trial_drift([4.6, 6.0])
    assert not trial_drift([])
    assert not trial_drift(None)
    # Boundary: exactly +15% is NOT flagged (strict >).
    assert not trial_drift([1.0, 1.1, 1.15])
    assert trial_drift([1.0, 1.1, 1.151])


@pytest.mark.skipif(
    not os.path.exists(R12_HISTORY), reason="r12 bench history not present"
)
def test_replay_r12_history_flags_only_semdedup(capsys):
    """Replaying the recorded r12 driver bench (the file the root-cause
    was diagnosed from) must flag exactly the query that WAS
    session-state contaminated — semantic_dedup_semdedup at
    4.60/5.14/6.06 s — and none of the 38 others."""
    with open(R12_HISTORY) as f:
        record = json.load(f)
    assert len(record["query_trials_s"]) == 39
    drifters = report_trial_drift(record, "r12")
    assert drifters == ["semantic_dedup_semdedup"]
    out = capsys.readouterr().out
    assert "session-state contaminated" in out
    assert "idle warm+best-of-3" in out
    assert "4.60/5.14/6.05" in out  # 6.055 floats to 6.054999..., .2f = 6.05
