"""Shared container-load probes and the bench/cold-audit archive
helper (ADVICE r14: cold_audit hard-imported these as private bench.py
helpers, so a bench.py refactor or import-time failure would break the
cold audit before any timing ran — they now live here and both tools
import them).

Also home of the min-of-N + settle-before-start edge probe (VERDICT
r14 #1): bench.py's session-edge io probes were single `_io_probe_ms`
reads on a box documented to throw one-off 150-485 ms I/O spikes that
settle within minutes (BASELINE.md) — one unlucky read false-flags a
clean headline as io-contaminated; one lucky read at the open of a
loaded window records a false clean. `io_probe_edge` samples each
edge N times and records the min (the same protocol
tools/cold_audit.py already used for its end edge), and can
settle-before-start: when the opening min is out of the idle band,
resample for up to a deadline, recording every attempt in the durable
record.
"""

from __future__ import annotations

import hashlib
import os
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_IO_PROBE_BYTES = 64 * 1024 * 1024

# Idle ceiling for the uncached 64 MiB io_probe read on this
# container: settled end-of-run readings across r11-r13 sit at
# 44-77 ms; 66 ms is the BASELINE.md idle-band ceiling.
# (tools/compare_bench.py re-exports this for its callers.)
IDLE_IO_PROBE_MS = 66.0


def _probe_once_ms() -> float:
    """One un-minimized run of the xorshift loop. Used PER QUERY so
    late-session container load is visible next to the query that paid
    it: the r6 winnowing anomaly (2.0-2.5x vs local with an idle
    start-of-run sentinel) showed a single session-level probe cannot
    see load arriving mid-bench. NOT best-of-N on purpose — spikes are
    the signal here, not noise to minimize away."""
    t0 = time.perf_counter()
    x = 88172645463325252
    for _ in range(2_000_00):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return round((time.perf_counter() - t0) * 1000, 2)


def _load_sentinel_ms() -> float:
    """Fixed CPU-bound, no-I/O, no-Spark probe timed alongside the
    headline set: a pure-Python xorshift64* loop whose work is
    constant across rounds, so its wall time measures CONTAINER LOAD
    (CPU contention, frequency scaling), not the engine. Compare
    `sentinel_ms` across BENCH_r*.json to normalize round-over-round
    query ratios — the r3/r5 uniform ~1.4x slowdowns were load, and
    this makes that check quantitative instead of argued from the
    pattern (BASELINE.md records the reference value). Same workload
    as the per-query probe, so the two are unit-compatible."""
    return round(min(_probe_once_ms() for _ in range(3)), 2)


def _io_probe_ms() -> float | None:
    """Timed sequential read of a fixed 64 MiB scratch file with its
    page cache dropped first (posix_fadvise DONTNEED — advisory, no
    privileges needed on Linux). Measures the IO path the CPU sentinel
    cannot see: a co-tenant hammering the disk or evicting the page
    cache shows up here while sentinel_ms stays idle. Returns None on
    platforms without posix_fadvise (the reading would be
    cache-contaminated and misleading rather than merely noisy)."""
    if not hasattr(os, "posix_fadvise"):
        return None
    path = os.path.join(_REPO, ".tmp", "io_probe.bin")
    try:
        if (
            not os.path.exists(path)
            or os.path.getsize(path) != _IO_PROBE_BYTES
        ):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            block = bytes(range(256)) * 4096  # 1 MiB, content irrelevant
            with open(path, "wb") as f:
                for _ in range(_IO_PROBE_BYTES // len(block)):
                    f.write(block)
                f.flush()
                os.fsync(f.fileno())
        with open(path, "rb") as f:
            os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED)
            t0 = time.perf_counter()
            while f.read(1024 * 1024):
                pass
            return round((time.perf_counter() - t0) * 1000, 2)
    except OSError:
        return None


def io_probe_edge(
    samples: int = 3,
    settle_timeout_s: float = 0.0,
    idle_band_ms: float = IDLE_IO_PROBE_MS,
    sleep_s: float = 5.0,
    probe=None,
) -> dict:
    """Min-of-N session-edge io probe with optional
    settle-before-start (VERDICT r14 #1).

    Takes `samples` back-to-back `_io_probe_ms` readings and reports
    their min as the edge value — a one-off spike at a single read no
    longer false-flags a clean window, and a single lucky read no
    longer false-cleans a loaded one (ALL readings must dodge the
    spike for the min to read clean, which sustained load prevents).

    When `settle_timeout_s` > 0 (the session-START edge) and the
    round's min is above `idle_band_ms`, sleep and resample in rounds
    until the min comes into band or the deadline passes — the
    documented spike class settles in minutes, so a loaded OPENING
    read usually just means "start the clock a minute later". Every
    round is recorded so the durable record shows both the loaded
    attempt(s) and the settled state.

    Returns a dict:
      ms       — min of the FINAL round (the window state at the
                 moment the caller actually starts), or None when the
                 probe is unavailable on this platform;
      samples  — the final round's readings, chronological;
      settle_rounds — present only when resampling happened: every
                 round's readings including the final one.

    `probe` is injectable for tests (defaults to `_io_probe_ms`).
    """
    probe = probe or _io_probe_ms

    def one_round() -> tuple[float | None, list[float]]:
        vals: list[float] = []
        for _ in range(max(1, samples)):
            v = probe()
            if v is None:
                return None, vals
            vals.append(v)
        return min(vals), vals

    best, vals = one_round()
    out: dict = {"ms": best, "samples": vals}
    if best is None or settle_timeout_s <= 0 or best <= idle_band_ms:
        return out
    rounds = [vals]
    deadline = time.monotonic() + settle_timeout_s
    while best is not None and best > idle_band_ms and time.monotonic() < deadline:
        time.sleep(min(sleep_s, max(0.0, deadline - time.monotonic())))
        best, vals = one_round()
        rounds.append(vals)
    out["ms"] = best
    out["samples"] = vals
    out["settle_rounds"] = rounds
    return out


# Idle ceiling for the full-width membw probe on this container
# (best-of-2 median-worker, 32 procs x 64 MiB stream-sum): idle
# readings calibrated at round-17 open sit at 21.4-23.4 ms across 6
# back-to-back runs. The r16 degraded windows (~1.5-1.7x on every
# parallel query) came from host memory-path contention that neither
# the scalar CPU sentinel nor the io probe can see (OPTIMIZATION_r16.md
# forensics) — this probe is the class that would have flagged them in
# the record itself, and its idle spread (<10%) is tight enough that a
# 1.5x signal clears the ceiling unambiguously.
IDLE_MEMBW_MS = 30.0

_MEMBW_MB = 64
_MEMBW_PASSES = 2


def _membw_worker(mb: int) -> float:
    """One worker's share of the parallel memory-path burn: stream-sum
    a buffer far larger than any per-core cache slice, so the
    aggregate across workers is bound by the host's memory path, not
    registers or L1/L2 (the r16 burn experiment showed a
    register-bound loop reads NORMAL in a degraded window). Returns
    the worker's own streaming milliseconds — allocation and a warm
    pass are excluded, so the reading is traffic, not page faults or
    pool dispatch."""
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    float(a.sum())  # warm pass: fault the pages in untimed
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(_MEMBW_PASSES):
        s += float(a.sum())
    return (time.perf_counter() - t0) * 1000


def membw_probe_ms(
    n_procs: int | None = None, mb: int = _MEMBW_MB, best_of: int = 2
) -> float | None:
    """Full-width parallel memory-bandwidth probe (VERDICT r16 #7):
    fork one worker per CPU, each stream-summing a 64 MiB float64
    buffer concurrently, and report the best-of-N MEDIAN worker
    streaming milliseconds. This is the one load class the existing
    probes are blind to — the r16 evening degradation multiplied every
    parallel Spark stage by ~1.5-1.7x while the single-thread xorshift
    sentinel and the 64 MiB disk read both read normal. Memory-path
    contention from a co-tenant (or the host) shows up here as a
    proportionally elevated reading. Per-worker timing excludes
    allocation/fork/dispatch noise; the median ignores stragglers from
    scheduler jitter while every worker still contends for the memory
    path during the measurement. Returns None when the probe cannot
    run (no fork, no numpy) — a missing reading must never fail a
    bench run."""
    try:
        import multiprocessing as mp

        import numpy  # noqa: F401 — fail fast before forking

        n = n_procs or os.cpu_count() or 1
        ctx = mp.get_context("fork")
        best: float | None = None
        with ctx.Pool(n) as pool:
            for _ in range(max(1, best_of)):
                times = sorted(pool.map(_membw_worker, [mb] * n))
                ms = times[len(times) // 2]
                best = ms if best is None else min(best, ms)
        return round(best, 2)
    except Exception:  # noqa: BLE001 — probe is advisory only
        return None


def _archive_existing(out_dir: str, latest: str) -> None:
    """Copy-on-start: before this run overwrites the <latest> record,
    preserve the existing one under history/<content-sha12>.json.
    Content-addressed, so re-runs over an already-archived record are
    no-ops and the history never holds duplicates (VERDICT r8: the
    driver's r8 run silently shadowed the builder's committed
    record)."""
    if not os.path.exists(latest):
        return
    try:
        with open(latest, "rb") as f:
            content = f.read()
        sha = hashlib.sha256(content).hexdigest()[:12]
        hist = os.path.join(out_dir, "history")
        os.makedirs(hist, exist_ok=True)
        dest = os.path.join(hist, f"{sha}.json")
        if not os.path.exists(dest):
            with open(dest, "wb") as f:
                f.write(content)
    except OSError:
        pass
