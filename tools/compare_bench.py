#!/usr/bin/env python
"""Compare two BENCH_r*.json files with load normalization: flag only
per-query ratios that exceed the container-load ratio the sentinels
(and, when present, the per-query `query_load_ms` probes) explain.

    python tools/compare_bench.py BENCH_r06.json BENCH_r07.json
    python tools/compare_bench.py BENCH_r06.json /tmp/bench_local.json --thresh 1.3

A BENCH file is either the driver's wrapper ({"parsed": {...}}) or a
raw bench.py JSON line. Output: one row per common query with old/new
seconds, the raw ratio, the load-adjusted ratio (raw divided by the
sentinel ratio), and a FLAG column for adjusted ratios above
--thresh. This is the quantitative form of the BASELINE.md rule:
"only per-query ratios that substantially exceed the sentinel ratio
indicate a real plan change."
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.io_probe import IDLE_IO_PROBE_MS, IDLE_MEMBW_MS  # noqa: E402,F401

IDLE_SENTINEL_MS = 47.0  # BASELINE.md reference value for this container


def membw_contamination(
    probe: dict | None, idle_ms: float = IDLE_MEMBW_MS
) -> str | None:
    """Memory-path-contention signature (VERDICT r16 #7): the r16
    evening windows multiplied every parallel stage by ~1.5-1.7x while
    the CPU sentinel and io probe read NORMAL — host memory-path
    contention is invisible to both. The full-width membw probe's idle
    band is tight (21-24 ms calibrated, <10% spread), so any edge above
    the ceiling is a real contention reading, and parallel-query
    timings from that session must be adjudicated against an idle
    rerun."""
    if not probe:
        return None
    for tag in ("start", "end"):
        v = probe.get(tag)
        if v is not None and v > idle_ms:
            return (
                f"membw_probe {tag} {v:.1f} ms above the {idle_ms:.0f} ms "
                "idle ceiling — host memory-path contention at that edge "
                "(the r16 degraded-window class); parallel-stage timings "
                "are inflated"
            )
    return None


def io_contamination(
    io: dict | None, idle_ms: float = IDLE_IO_PROBE_MS
) -> str | None:
    """I/O-contaminated-session signature (VERDICT r13 #3): the r13
    driver record opened at io_probe 441 ms vs 44 ms at close — the
    self-inflicted page-cache-dirt pattern BASELINE.md documents
    (probe/sweep sessions dirty the cache; the first bench after them
    reads elevated) — yet nothing in the durable record marked the
    session, unlike sentinel load and trial drift. Returns a reason
    string when the probe pair shows contamination, else None:
    start > 3x end AND start above the idle band (loaded open, settled
    close — raw totals vs a settled round are inflated; the band gate
    keeps a fast-vs-faster pair like 9/2 ms, both well under idle,
    from flagging — ADVICE r14), or either reading > 3x the idle band
    (I/O load present at that edge of the run). Readings of 0.0 are
    data, not missing (`is not None`, ADVICE r14)."""
    if not io:
        return None
    s, e = io.get("start"), io.get("end")
    if s is not None and e is not None and s > 3 * e and s > idle_ms:
        return (
            f"io_probe start {s:.0f} ms > 3x end {e:.0f} ms — session "
            "opened I/O-loaded and settled mid-run (page-cache-dirt "
            "signature); adjudicate raw totals against an idle rerun"
        )
    for tag, v in (("start", s), ("end", e)):
        if v is not None and v > 3 * idle_ms:
            return (
                f"io_probe {tag} {v:.0f} ms > 3x the {idle_ms:.0f} ms "
                "idle band — I/O load present at that edge of the run"
            )
    return None


def _fingerprint(rec: dict) -> tuple:
    """Identity of one bench run, shared by the summary line and the
    full record: headline value + sentinel + the io-probe edge pair +
    sf. Enough to content-address a run in bench_out/history/ (two
    runs agreeing on all five to the printed precision are the same
    run for comparison purposes)."""
    io = rec.get("io_probe_ms") or {}
    return (
        rec.get("value"),
        rec.get("sentinel_ms"),
        io.get("start"),
        io.get("end"),
        rec.get("sf"),
    )


_PAIR_RE = re.compile(r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:\s*(-?\d+(?:\.\d+)?)')
# Top-level keys that follow "queries" in bench.py's stdout line; the
# first one present in a truncated tail bounds the per-query region.
_AFTER_QUERIES = ('"sentinel_ms"', '"query_load_ms"', '"query_trials_s"', '"sf"')


def _recover_partial_queries(tail: str) -> dict[str, float]:
    """Best-effort recovery of per-query seconds from the driver's
    bounded stdout tail when no complete record line survived in it.
    The tail usually starts mid-way through the full record line's
    "queries" dict (the 2000-char window truncates the head, VERDICT
    r15 #1): complete '"name": secs' pairs up to the next top-level
    key are genuine timings; the orphan leading value whose name was
    cut off never matches the pair regex and is dropped."""
    best: dict[str, float] = {}
    for line in tail.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            json.loads(line)
            continue  # complete lines are handled by the caller
        except json.JSONDecodeError:
            pass
        region = line
        m = re.search(r'"queries"\s*:\s*\{', region)
        if m:
            region = region[m.end():]
        cut = min(
            (i for i in (region.find(k) for k in _AFTER_QUERIES) if i != -1),
            default=len(region),
        )
        region = region[:cut]
        pairs = {k: float(v) for k, v in _PAIR_RE.findall(region)}
        # Drop non-query keys a headless prefix may carry (metric/value
        # etc. are numeric only for "value"/"sf"/"sentinel_ms").
        pairs = {
            k: v
            for k, v in pairs.items()
            if k not in ("value", "sf", "sentinel_ms", "n_queries")
        }
        if len(pairs) > len(best):
            best = pairs
    return best


def _resolve_full_record(path: str, summary: dict) -> dict | None:
    """Resolve a driver wrapper's summary line to the durable full
    record bench.py wrote (VERDICT r15 #1): first the `full_record`
    path it names (usually bench_out/bench_latest.json — only valid
    while no newer run has replaced it, so the fingerprint must
    match), then the content-addressed bench_out/history/ archive
    (where _archive_existing moves every replaced record). Returns
    the record, or None; raises on an ambiguous history match."""
    want = _fingerprint(summary)
    if all(v is None for v in want):
        return None
    roots = [os.path.dirname(os.path.abspath(path)), _REPO]
    for root in roots:
        rel = summary.get("full_record")
        if rel:
            cand = os.path.join(root, rel)
            if os.path.exists(cand):
                try:
                    with open(cand) as f:
                        rec = json.load(f)
                except (OSError, json.JSONDecodeError):
                    rec = None
                if rec and "queries" in rec and _fingerprint(rec) == want:
                    return rec
    matches: list[tuple[str, dict]] = []
    for root in roots:
        for f in sorted(glob.glob(os.path.join(root, "bench_out", "history", "*.json"))):
            try:
                with open(f) as fh:
                    rec = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            if "queries" in rec and _fingerprint(rec) == want:
                matches.append((f, rec))
        if matches:
            break
    if len(matches) > 1:
        raise SystemExit(
            f"{path}: fingerprint {want} matches multiple history "
            f"records: {', '.join(m[0] for m in matches)} — refusing to "
            "guess"
        )
    return matches[0][1] if matches else None


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    d = json.loads(text)
    if "parsed" in d:
        parsed = d["parsed"] or {}
        tail = d.get("tail") or ""
        if "queries" not in parsed and tail:
            # The driver's `parsed` is whatever the LAST stdout line
            # held — since r8 that is the short truncation-proof
            # summary. Recover the full per-query line from the tail.
            for line in reversed(tail.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "queries" in cand:
                        parsed = cand
                        break
        if "queries" not in parsed or "query_trials_s" not in parsed:
            # Resolve the summary to the durable full record bench.py
            # wrote, by fingerprint (VERDICT r15 #1). Since r17 the
            # summary line itself carries the per-query seconds, but
            # the full record still adds trial lists, per-query load
            # probes and streaming breakdowns — upgrade when resolvable,
            # keep whatever the summary carried when not.
            full = _resolve_full_record(path, parsed)
            if full is not None:
                parsed = full
        if "queries" not in parsed and tail:
            partial = _recover_partial_queries(tail)
            if partial:
                n_total = parsed.get("n_queries")
                print(
                    f"WARNING: {path}: no full record resolvable — "
                    f"recovered {len(partial)}"
                    + (f"/{n_total}" if n_total else "")
                    + " per-query timings from the truncated tail; "
                    "totals and missing queries are NOT comparable"
                )
                parsed = dict(parsed)
                parsed["queries"] = partial
        d = parsed
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key — not a bench record")
    return d


def trial_drift(trials: list[float] | None, rise: float = 0.15) -> bool:
    """Session-state contamination signature (VERDICT r12 #4): trials
    of one query inside a bench session rising MONOTONICALLY by more
    than ``rise`` end-to-end. The r12 semdedup root-cause showed this
    shape (4.60/5.14/6.06 s — 1.7x inflated vs idle AND rising across
    the trial loop) is produced by accumulated whole-session JVM
    state, not by the query's code: an idle warm+best-of-3 probe of
    the same commit read flat 2.6 s. A genuine plan regression is
    flat-but-slower across trials; ambient container load is noisy,
    not monotone. So a monotone riser must be adjudicated against an
    IDLE probe before it is read as a regression."""
    if not trials or len(trials) < 3:
        return False
    monotone = all(b > a for a, b in zip(trials, trials[1:]))
    return monotone and trials[-1] > (1.0 + rise) * trials[0]


def report_trial_drift(record: dict, label: str) -> list[str]:
    """Print-and-return the drifting queries of one bench record."""
    drifters = sorted(
        q
        for q, ts in (record.get("query_trials_s") or {}).items()
        if trial_drift(ts)
    )
    if drifters:
        print(
            f"session-state contaminated in {label} (trials rising "
            "monotonically >15% end-to-end — the r12 semdedup "
            "signature; compare against an idle warm+best-of-3 probe, "
            "NOT across bench sessions):"
        )
        trials = record.get("query_trials_s") or {}
        for q in drifters:
            ts = trials[q]
            print(
                f"  {q}: {'/'.join(f'{t:.2f}' for t in ts)} s "
                f"({ts[-1] / ts[0]:.2f}x across the trial loop)"
            )
    return drifters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--thresh", type=float, default=1.3)
    args = ap.parse_args()
    old, new = _load(args.old), _load(args.new)
    if old.get("sf") != new.get("sf"):
        raise SystemExit(
            f"sf mismatch: {args.old} is sf={old.get('sf')} but "
            f"{args.new} is sf={new.get('sf')} — per-query ratios "
            "across scale factors are meaningless"
        )

    s_old = old.get("sentinel_ms") or IDLE_SENTINEL_MS
    s_new = new.get("sentinel_ms") or IDLE_SENTINEL_MS
    for label, rec in (("OLD", old), ("NEW", new)):
        if not rec.get("sentinel_ms"):
            print(
                f"WARNING: {label} record has no sentinel_ms — assuming "
                f"idle ({IDLE_SENTINEL_MS} ms); if that run was loaded, "
                "adjusted ratios are wrong in the flattering direction"
            )
    load_ratio = s_new / s_old
    loads_new = new.get("query_load_ms") or {}
    loads_old = old.get("query_load_ms") or {}

    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        print("no common queries between the two records — nothing to compare")
        return 2
    print(
        f"sentinels: old={s_old} ms new={s_new} ms -> container load "
        f"ratio {load_ratio:.2f}x (applied to every raw ratio)"
    )
    if loads_new:
        hot = {
            q: m for q, m in loads_new.items() if m > 2 * s_new
        }
        if hot:
            print(
                "load-contaminated timings in NEW (probe > 2x sentinel): "
                + ", ".join(f"{q}={m:.0f}ms" for q, m in sorted(hot.items()))
            )
    # r9 instrumentation (ride in bench_out full records, not the
    # stdout line): per-query trial lists, IO-touch probes, and
    # streaming micro-batch breakdowns. A FLAG row prints whatever of
    # these the records carry, so the flag is self-annotated instead
    # of narrated after the fact.
    trials_new = new.get("query_trials_s") or {}
    trials_old = old.get("query_trials_s") or {}
    drifting = set(report_trial_drift(old, "OLD")) | set(
        report_trial_drift(new, "NEW")
    )
    stream_new = new.get("streaming_progress") or {}
    io_contaminated: dict[str, str] = {}
    for label, rec in (("OLD", old), ("NEW", new)):
        io = rec.get("io_probe_ms")
        if io:
            print(f"io probe {label}: start={io.get('start')} ms "
                  f"end={io.get('end')} ms (uncached 64 MiB read)")
        # Recorded by bench.py (r14+) or re-derived here for older
        # records that only carry the raw probe pair.
        reason = rec.get("io_contaminated") or io_contamination(io)
        if reason:
            io_contaminated[label] = reason
            print(f"io-contaminated {label}: {reason}")
        mb = rec.get("membw_probe_ms")
        if mb:
            print(
                f"membw probe {label}: start={mb.get('start')} ms "
                f"end={mb.get('end')} ms (full-width stream-sum median)"
            )
        mb_reason = rec.get("membw_contaminated") or membw_contamination(mb)
        if mb_reason:
            # same adjudication rule as io contamination: that side's
            # parallel timings are inflated; idle-rerun before reading
            # a FLAG as a regression
            io_contaminated.setdefault(label, mb_reason)
            print(f"membw-contaminated {label}: {mb_reason}")

    def _spread(ts: list[float]) -> str:
        ss = sorted(ts)
        return f"min={ss[0]:.3f} med={ss[len(ss) // 2]:.3f} max={ss[-1]:.3f}"

    flags = 0
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'raw':>6s} {'adj':>6s}")
    tot_old = tot_new = 0.0
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        tot_old += a
        tot_new += b
        raw = b / a if a else float("inf")
        # Per-query probes beat the session sentinel when both exist.
        per_q = (
            (loads_new.get(q, s_new) / loads_old.get(q, s_old))
            if (loads_new and loads_old)
            else load_ratio
        )
        adj = raw / per_q
        mark = "  <-- FLAG" if adj > args.thresh else ""
        if mark and q in drifting:
            mark = "  <-- FLAG (session-state drift: idle-probe first)"
        elif mark and "NEW" in io_contaminated:
            # NEW-side I/O load inflates NEW timings: the flag is
            # contamination-suspect; adjudicate on an idle rerun.
            mark = "  <-- FLAG (io-contaminated NEW: idle-rerun first)"
        elif mark and "OLD" in io_contaminated:
            # Only the OLD record is contaminated (ADVICE r14): OLD
            # timings are the INFLATED side, so NEW reading slower
            # anyway is stronger regression evidence, not weaker —
            # say so instead of discounting the flag.
            mark = (
                "  <-- FLAG (OLD io-contaminated: old side inflated, "
                "regression evidence strengthened)"
            )
        if mark:
            flags += 1
        print(f"{q:34s} {a:7.3f} {b:7.3f} {raw:5.2f}x {adj:5.2f}x{mark}")
        if mark:
            for tag, ts in (("old", trials_old.get(q)), ("new", trials_new.get(q))):
                if ts:
                    print(f"{'':8s}trials {tag}: {_spread(ts)}  ({ts})")
            sp = stream_new.get(q)
            if sp:
                for i, t in enumerate(sp.get("trials", [])):
                    print(
                        f"{'':8s}stream trial {i}: {t['n_batches']} batches, "
                        f"trigger={t['trigger_ms']}ms addBatch={t['addbatch_ms']}ms "
                        f"stateCommit={t['state_commit_ms']}ms "
                        f"rows={t['input_rows']}"
                    )
    print(
        f"{'TOTAL (common)':34s} {tot_old:7.3f} {tot_new:7.3f} "
        f"{tot_new / tot_old:5.2f}x {(tot_new / tot_old) / load_ratio:5.2f}x"
    )
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
