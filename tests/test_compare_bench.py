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

from compare_bench import (  # noqa: E402
    io_contamination,
    report_trial_drift,
    trial_drift,
)

R12_HISTORY = os.path.join(REPO, "bench_out", "history", "3ea313968dad.json")
R13_RECORD = os.path.join(REPO, "BENCH_r13.json")


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

def test_io_contamination_signature():
    """VERDICT r13 #3: the page-cache-dirt pattern must be flagged
    mechanically. Rules: start > 3x end, or either edge > 3x the
    66 ms idle band."""
    # The r13 driver pair: loaded open, settled close -> contaminated.
    assert "441" in (io_contamination({"start": 441.46, "end": 44.6}) or "")
    # Settled idle pair -> clean.
    assert io_contamination({"start": 50.0, "end": 52.0}) is None
    # End-of-run load (co-tenant arriving mid-bench) -> contaminated.
    reason = io_contamination({"start": 50.0, "end": 300.0})
    assert reason and "end" in reason
    # The r14 driver pair: 262.27 > 3x77.31 (= 231.93), so the RATIO
    # clause fires first (ADVICE r14 fixed this comment — the earlier
    # text claimed the idle-band clause and mis-stated 262 < 3x77);
    # pin the clause via the reason string.
    reason = io_contamination({"start": 262.27, "end": 77.31})
    assert reason and "opened I/O-loaded" in reason
    # Same start with a settled 44 ms close: still the ratio clause.
    reason = io_contamination({"start": 262.27, "end": 44.0})
    assert reason and "opened I/O-loaded" in reason
    # Borderline-clean: start exactly 3x end is NOT flagged (strict >).
    assert io_contamination({"start": 150.0, "end": 50.0}) is None
    # ADVICE r14: a fast-vs-faster pair with BOTH edges well under the
    # idle band is load-free regardless of their ratio — the ratio
    # clause is gated on start exceeding the band.
    assert io_contamination({"start": 9.0, "end": 2.0}) is None
    # ADVICE r14: 0.0 is a reading, not a missing value — a loaded
    # open against a 0.0 close flags on the ratio clause (under the
    # old truthiness check the clause was skipped entirely).
    reason = io_contamination({"start": 100.0, "end": 0.0})
    assert reason and "opened I/O-loaded" in reason
    assert io_contamination({"start": 0.0, "end": 0.0}) is None
    # Degenerate inputs are quiet (None probe on non-Linux platforms).
    assert io_contamination(None) is None
    assert io_contamination({}) is None
    assert io_contamination({"start": None, "end": None}) is None
    assert io_contamination({"start": 40.0, "end": None}) is None


@pytest.mark.skipif(
    not os.path.exists(R13_RECORD), reason="r13 bench record not present"
)
def test_replay_r13_record_flags_io_contamination():
    """The r13 driver record — io_probe 441 ms at open vs 44 ms at
    close, the exact reading VERDICT r13 called out as unmarked —
    must now flag."""
    with open(R13_RECORD) as f:
        record = json.load(f)
    io = None
    # Driver wrapper: the probe pair rides in the LAST stdout summary
    # line of the tail (the first line is the parser-contract line).
    for line in reversed(record.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "io_probe_ms" in cand:
                io = cand["io_probe_ms"]
                break
    assert io == {"start": 441.46, "end": 44.6}
    reason = io_contamination(io)
    assert reason is not None and "441" in reason and "idle rerun" in reason

from compare_bench import (  # noqa: E402
    _load,
    _recover_partial_queries,
    _resolve_full_record,
)

R14_RECORD = os.path.join(REPO, "BENCH_r14.json")
R15_RECORD = os.path.join(REPO, "BENCH_r15.json")


@pytest.mark.skipif(
    not (os.path.exists(R14_RECORD) and os.path.exists(R15_RECORD)),
    reason="r14/r15 driver wrappers not present",
)
def test_replay_load_driver_wrappers_resolve_full_records():
    """VERDICT r15 #1: the documented `compare_bench BENCH_rN
    BENCH_rN+1` invocation was dead for r13+ wrappers — the driver's
    2000-char tail truncates before the 'queries' key, so _load raised
    'not a bench record'. The wrapper must now resolve to the durable
    full record (bench_out/history/ for superseded runs, the
    full_record path for the latest) by run fingerprint, recovering
    all 38 per-query timings, the trial lists, and the load probes."""
    for path, total in ((R14_RECORD, 30.55), (R15_RECORD, 30.144)):
        rec = _load(path)
        assert len(rec["queries"]) == 38, path
        assert rec["value"] == total, path
        # Full-record instrumentation came along, not just the tail's
        # partial pairs: every query has its trial list and load probe.
        assert set(rec["query_trials_s"]) == set(rec["queries"]), path
        assert set(rec["query_load_ms"]) == set(rec["queries"]), path
        assert abs(sum(rec["queries"].values()) - total) < 0.02, path


def test_r17_summary_wrapper_upgrades_to_full_record(tmp_path):
    """Since r17 the summary line itself carries the per-query seconds
    (VERDICT r16 #1), so a driver wrapper parses with 'queries'
    directly — but _load must STILL upgrade it to the durable full
    record when the fingerprint resolves, recovering trial lists and
    per-query load probes the summary deliberately omits."""
    import json

    latest = os.path.join(REPO, "bench_out", "bench_latest.json")
    with open(latest) as f:
        rec = json.load(f)
    summary = {
        k: rec[k] for k in ("metric", "value", "unit", "queries",
                            "sentinel_ms", "sf")
    }
    summary["io_probe_ms"] = {
        "start": rec["io_probe_ms"]["start"],
        "end": rec["io_probe_ms"]["end"],
    }
    summary["full_record"] = "bench_out/bench_latest.json"
    wrapper = tmp_path / "BENCH_rX.json"
    wrapper.write_text(json.dumps({"parsed": summary, "tail": ""}))
    got = _load(str(wrapper))
    assert got["queries"] == rec["queries"]
    assert set(got["query_trials_s"]) == set(rec["queries"])
    assert set(got["query_load_ms"]) == set(rec["queries"])


def test_resolve_full_record_rejects_stale_full_record_pointer(tmp_path):
    """bench_latest.json is overwritten by every newer run; a wrapper
    whose full_record pointer now names a DIFFERENT run must not be
    resolved to it — the fingerprint gate rejects it (then the
    history scan, empty here, also finds nothing)."""
    out = tmp_path / "bench_out"
    out.mkdir()
    (out / "history").mkdir()
    other_run = {
        "value": 99.9,
        "sentinel_ms": 50.0,
        "io_probe_ms": {"start": 25.0, "end": 26.0},
        "sf": 0.1,
        "queries": {"q1": 99.9},
    }
    (out / "bench_latest.json").write_text(json.dumps(other_run))
    # A fingerprint no real record (repo bench_out/ included) carries.
    summary = {
        "value": 123.456,
        "sentinel_ms": 78.9,
        "io_probe_ms": {"start": 11.11, "end": 22.22},
        "sf": 0.1,
        "n_queries": 38,
        "full_record": "bench_out/bench_latest.json",
    }
    wrapper = tmp_path / "BENCH_rX.json"
    wrapper.write_text(json.dumps({"parsed": summary, "tail": ""}))
    assert _resolve_full_record(str(wrapper), summary) is None


def test_resolve_full_record_ambiguous_history_refuses(tmp_path):
    """Two history records with the same fingerprint: refuse to guess."""
    out = tmp_path / "bench_out" / "history"
    out.mkdir(parents=True)
    rec = {
        "value": 1.0,
        "sentinel_ms": 50.0,
        "io_probe_ms": {"start": 25.0, "end": 26.0},
        "sf": 0.1,
        "queries": {"q1": 1.0},
    }
    (out / "aaaa.json").write_text(json.dumps(rec))
    (out / "bbbb.json").write_text(json.dumps(rec))
    summary = {k: rec[k] for k in ("value", "sentinel_ms", "io_probe_ms", "sf")}
    wrapper = tmp_path / "BENCH_rX.json"
    wrapper.write_text(json.dumps({"parsed": summary, "tail": ""}))
    with pytest.raises(SystemExit, match="multiple history"):
        _resolve_full_record(str(wrapper), summary)


@pytest.mark.skipif(
    not os.path.exists(R15_RECORD), reason="r15 driver wrapper not present"
)
def test_recover_partial_queries_from_real_r15_tail():
    """The regex fallback on the REAL r15 tail (the one VERDICT r15
    hand-parsed to 18 recoverable queries): complete '"name": secs'
    pairs before the next top-level key, the orphan leading value
    dropped, and no query_load_ms (millisecond) pairs bleeding in."""
    with open(R15_RECORD) as f:
        tail = json.load(f)["tail"]
    pairs = _recover_partial_queries(tail)
    assert 15 <= len(pairs) < 38
    # Spot values straight from the tail text (seconds, not load-ms).
    assert pairs["semantic_dedup_scaled"] == 0.911
    assert pairs["winnowing_candidate_pairs"] == 0.981
    assert all(v < 10 for v in pairs.values()), pairs
    # The load-ms section (e.g. skew_salted_join: 59.81) is excluded —
    # the recovered value is the seconds reading from the queries dict.
    assert pairs["skew_salted_join"] == 0.423


def test_load_falls_back_to_partial_tail_when_unresolvable(tmp_path, capsys):
    """A wrapper with no resolvable full record but per-query pairs in
    the truncated tail: _load warns and returns the partial set."""
    tail = (
        '1.139, "alpha": 0.911, "beta": 0.203, '
        '"sentinel_ms": 56.55, "query_load_ms": {"alpha": 59.81}, "sf": 0.1}\n'
        '{"metric": "headline_queries_wall_clock", "value": 30.1, '
        '"unit": "sec", "n_queries": 38}\n'
    )
    wrapper = tmp_path / "BENCH_rX.json"
    wrapper.write_text(
        json.dumps({"parsed": {"value": 30.1, "n_queries": 38}, "tail": tail})
    )
    rec = _load(str(wrapper))
    assert rec["queries"] == {"alpha": 0.911, "beta": 0.203}
    out = capsys.readouterr().out
    assert "recovered 2/38" in out and "NOT comparable" in out
