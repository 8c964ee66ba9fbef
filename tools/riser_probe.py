#!/usr/bin/env python
"""Idle warm+best-of-N probe for bench-riser adjudication (the
BASELINE.md same-window tree A/B method, made durable in r13 — prior
rounds re-wrote this as a /tmp script each time).

    python tools/riser_probe.py <query> [<query>...]
    python tools/riser_probe.py --repo /tmp/r11tree --trials 6 corpus_prep_pipeline

Protocol notes (learned over r11-r13 adjudications):
- ALWAYS run the two trees back-to-back in the same window, and use
  A/B/A ordering: the second tree otherwise benefits from the page
  cache the first one warmed.
- Use --trials 6 for sub-second queries: 3 trials are still
  descending (JIT warm-in), and best-of-3 can read 1.3x on a tree
  that is actually at parity (observed r13).
- The sentinel here is a short hash loop (~6-10 ms idle), NOT
  bench.py's ~50 ms xorshift probe — compare sentinel readings only
  within one probe session, never across instruments.
- Compare best-of-N tree vs tree; the +/-30% sub-second band
  (BASELINE.md) still applies to any single reading.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _sentinel_ms() -> float:
    import hashlib

    t0 = time.perf_counter()
    h = hashlib.sha256(b"x" * 4096)
    for _ in range(20000):
        h.update(h.digest())
    return (time.perf_counter() - t0) * 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--repo",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        help="tree to import gostream_spark from (a git worktree for "
        "the A arm of a tree A/B)",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--trials", type=int, default=6)
    opts = ap.parse_args()

    sys.path.insert(0, opts.repo)
    os.chdir(opts.repo)
    from gostream_spark.registry import all_queries
    from gostream_spark.session import get_spark

    # Same min-of-3 io edge the bench/cold instruments record (r15),
    # so an adjudication row documents its own I/O window instead of
    # relying on a separate hand-run probe. Import from THIS tree's
    # tools (the probe may be pointed at an older --repo without it).
    try:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from tools.io_probe import io_probe_edge
    except ImportError:  # pragma: no cover — running from an old tree
        io_probe_edge = None
    if io_probe_edge:
        io0 = io_probe_edge(samples=3)
        print(f"io probe start: min={io0['ms']} ms samples={io0['samples']}")

    s0 = _sentinel_ms()
    spark = get_spark(app_name="riser_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for n in opts.queries:  # warm pass (codegen + first scan)
        qs[n].fn(spark, opts.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for n in opts.queries:
        trials = []
        for _ in range(opts.trials):
            t0 = time.perf_counter()
            qs[n].fn(spark, opts.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(round(time.perf_counter() - t0, 3))
        print(f"{n}: best={min(trials):.3f}s trials={trials}")
    print(f"sentinel start={s0:.1f}ms end={_sentinel_ms():.1f}ms")
    if io_probe_edge:
        io1 = io_probe_edge(samples=3)
        print(f"io probe end: min={io1['ms']} ms samples={io1['samples']}")


if __name__ == "__main__":
    main()
