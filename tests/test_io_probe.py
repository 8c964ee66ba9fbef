"""Tests for tools/io_probe.py's min-of-N + settle-before-start edge
probe (VERDICT r14 #1): bench.py's session-edge io probes were single
reads on a box documented to throw one-off 150-485 ms spikes that
settle within minutes — one unlucky read false-flagged a clean
headline as io-contaminated, one lucky read at the open of a loaded
window recorded a false clean. The edge probe takes the min of N
reads and, at the start edge, resamples until the window settles (or
the deadline passes), recording every attempt."""

from __future__ import annotations

import itertools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from compare_bench import io_contamination  # noqa: E402
from tools.io_probe import IDLE_IO_PROBE_MS, io_probe_edge  # noqa: E402


def _seq(*vals):
    it = iter(vals)
    return lambda: next(it)


def test_min_of_n_absorbs_single_spike():
    """One 300 ms spike among settled reads must not set the edge
    value — the min is the window estimate (the r14 driver's 262 ms
    single-read open would have read ~40 ms on min-of-3 if the spike
    was one-off)."""
    out = io_probe_edge(samples=3, probe=_seq(300.0, 40.0, 50.0))
    assert out["ms"] == 40.0
    assert out["samples"] == [300.0, 40.0, 50.0]
    assert "settle_rounds" not in out  # no settle requested (end edge)
    # The min feeds the contamination check: a clean pair stays clean.
    assert io_contamination({"start": out["ms"], "end": 44.0}) is None


def test_settle_before_start_resamples_to_clean():
    """Start edge: when the opening round's min is out of band, the
    probe resamples; a window that settles records the settled state
    as `ms` and every attempt in `settle_rounds`."""
    out = io_probe_edge(
        samples=2,
        settle_timeout_s=5.0,
        sleep_s=0.0,
        probe=_seq(300.0, 400.0, 50.0, 40.0),
    )
    assert out["ms"] == 40.0
    assert out["samples"] == [50.0, 40.0]
    assert out["settle_rounds"] == [[300.0, 400.0], [50.0, 40.0]]
    assert io_contamination({"start": out["ms"], "end": 44.0}) is None


def test_sustained_load_still_flags():
    """Sustained load keeps every sample elevated through the settle
    deadline — the final min stays out of band and the contamination
    check still fires (min-of-N must not false-clean a loaded
    window)."""
    out = io_probe_edge(
        samples=2,
        settle_timeout_s=0.05,
        sleep_s=0.01,
        probe=itertools.cycle([310.0, 295.0]).__next__,
    )
    assert out["ms"] >= 295.0
    assert len(out["settle_rounds"]) >= 2
    reason = io_contamination({"start": out["ms"], "end": 44.0})
    assert reason and "opened I/O-loaded" in reason


def test_in_band_opening_skips_settle():
    """An in-band opening min starts immediately — no resample rounds,
    no deadline wait (the settle path must cost nothing on an idle
    box)."""
    out = io_probe_edge(
        samples=3, settle_timeout_s=60.0, probe=_seq(30.0, 45.0, 28.0)
    )
    assert out["ms"] == 28.0
    assert out["ms"] <= IDLE_IO_PROBE_MS
    assert "settle_rounds" not in out


def test_probe_unavailable_platform():
    """A None reading (no posix_fadvise) yields ms=None and skips the
    settle loop; io_contamination stays quiet on the None edge."""
    out = io_probe_edge(samples=3, settle_timeout_s=60.0, probe=lambda: None)
    assert out["ms"] is None
    assert out["samples"] == []
    assert "settle_rounds" not in out
    assert io_contamination({"start": out["ms"], "end": 44.0}) is None


def test_contamination_ignores_sample_keys():
    """The durable record now carries start_samples/end_samples (and
    sometimes start_settle_rounds) beside start/end — the adjudicator
    must read the same verdict with or without them."""
    io = {
        "start": 441.46,
        "end": 44.6,
        "start_samples": [441.46, 452.0, 460.1],
        "end_samples": [44.6, 47.0, 51.2],
        "start_settle_rounds": [[441.46, 452.0, 460.1]],
    }
    reason = io_contamination(io)
    assert reason and "441" in reason


def test_membw_probe_runs_and_reads_milliseconds():
    """The full-width memory-path probe (VERDICT r16 #7) must return a
    positive float on this platform (fork + numpy available). Sized
    down so the test costs ~nothing; the bench uses the full-width
    defaults."""
    from tools.io_probe import membw_probe_ms

    ms = membw_probe_ms(n_procs=2, mb=8, best_of=1)
    assert ms is not None and ms > 0


def test_membw_contamination_rule():
    """Above-ceiling readings at either edge flag; in-band pairs and
    missing probes stay quiet (the probe is advisory — a None must
    never mark a record contaminated)."""
    from compare_bench import membw_contamination
    from tools.io_probe import IDLE_MEMBW_MS

    assert membw_contamination(None) is None
    assert membw_contamination({"start": None, "end": None}) is None
    ok = {"start": IDLE_MEMBW_MS - 5, "end": IDLE_MEMBW_MS - 8}
    assert membw_contamination(ok) is None
    hot_start = {"start": IDLE_MEMBW_MS * 1.6, "end": IDLE_MEMBW_MS - 8}
    reason = membw_contamination(hot_start)
    assert reason and "memory-path" in reason
    hot_end = {"start": IDLE_MEMBW_MS - 8, "end": IDLE_MEMBW_MS * 1.6}
    assert membw_contamination(hot_end)


def test_bench_reexports_probe_helpers():
    """The verify recipe and the r13/r14 replay protocol address the
    probes as bench._io_probe_ms etc.; the ADVICE r14 refactor moved
    them to tools/io_probe but bench must keep the names."""
    import bench

    for name in (
        "_io_probe_ms",
        "_load_sentinel_ms",
        "_probe_once_ms",
        "_archive_existing",
        "io_probe_edge",
    ):
        assert callable(getattr(bench, name)), name


def test_bench_latest_record_carries_min_of_n_edges():
    """Durable-record contract (VERDICT r14 #1 'done' condition): the
    committed bench_out/bench_latest.json must carry min-of-N edge
    samples whose min IS the recorded edge value, so a cross-round
    reader can verify the headline's window from the record alone."""
    import json

    path = os.path.join(REPO, "bench_out", "bench_latest.json")
    with open(path) as f:
        record = json.load(f)
    io = record["io_probe_ms"]
    for edge in ("start", "end"):
        samples = io[f"{edge}_samples"]
        assert isinstance(samples, list) and len(samples) >= 2
        assert io[edge] == min(samples)
    # Settle rounds, when present, end with the recorded sample round.
    if "start_settle_rounds" in io:
        assert io["start_settle_rounds"][-1] == io["start_samples"]


def test_cold_latest_record_carries_adjudicable_window():
    """The cold-audit durable record must carry the probe pair that
    io_contamination() adjudicates; records written by the r15+ tool
    also carry the start-edge samples with min semantics."""
    import json

    path = os.path.join(REPO, "cold_out", "cold_latest.json")
    with open(path) as f:
        record = json.load(f)
    io = record["io_probe_ms"]
    assert "start" in io and "end" in io
    if "start_samples" in io:  # r15+ records
        assert io["start"] == min(io["start_samples"])
