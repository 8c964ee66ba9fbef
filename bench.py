#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
followed by a short truncation-proof summary line; the complete
payload is also written to bench_out/bench_latest.json (committed) so
the durable per-query record never depends on the driver's stdout
tail window.

Each query is executed with a count-style action that materializes
every row (``df.toLocalIterator`` would serialize; ``write.format
("noop")`` is the standard no-overhead sink for benchmarking).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gostream_spark.registry import all_queries  # noqa: E402
from gostream_spark.session import get_spark  # noqa: E402


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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sentinel_ms = _load_sentinel_ms()
    spark = get_spark(app_name="gostream_spark_bench")

    queries = {n: q for n, q in all_queries().items() if q.bench}
    timings: dict[str, float] = {}
    queries_list = sorted(queries)
    # Warm each query's plan once (codegen + first-scan page cache) so
    # the timed runs measure steady-state execution, not JVM warm-up;
    # then report the best of three timed runs (local[n] single-JVM
    # timings are GC/scheduler-noisy; the minimum is the stable
    # estimate of the plan's cost).
    for name in queries_list:
        queries[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    load_ms: dict[str, float] = {}
    for name in queries_list:
        load_ms[name] = _probe_once_ms()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sentinel_ms": sentinel_ms,
        "query_load_ms": load_ms,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Durable full record: the driver captures a bounded TAIL of stdout,
    # and r7's single long JSON line was cut mid-dict there, losing ~11
    # queries' timings from the round archive. Write the complete
    # payload to a committed file FIRST, then print the full line
    # (parsed when the tail window is big enough) followed by a short
    # self-contained summary line that survives any tail truncation.
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "bench_latest.json"), "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))
    print(
        json.dumps(
            {
                "metric": payload["metric"],
                "value": total,
                "unit": "sec",
                "sentinel_ms": sentinel_ms,
                "sf": payload["sf"],
                "n_queries": len(timings),
                "full_record": "bench_out/bench_latest.json",
            }
        )
    )


if __name__ == "__main__":
    main()
