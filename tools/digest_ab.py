#!/usr/bin/env python
"""Gram-key digest A/B (VERDICT r10 #4, r11 #1): at sf1 the
`dup_ngram_fraction` / `exact_substr_dedup` pair converges to the
shared one-digest-per-gram-occurrence kernel (~5.4 s each). The
digest is an internal gram-equivalence key — parity does not need
cross-engine hash equality — but the COLLISION POLICY differs per
operator: a collision in `dup_ngram_fraction` perturbs a per-doc
statistic (64-bit xxhash64 acceptable, default), while a collision in
`exact_substr_dedup` silently deletes a non-duplicate span (128-bit
required at the 10^11+-distinct-gram design point). This tool
measures the kernel cost of each arm — md5 (128-bit, r10 default),
xxhash64 (64-bit, r11 default), xxhash128 (two-seed 64+64, r12
removal-pass default) — and verifies every arm produces bit-identical
OUTPUT rows on the full fixture.

    python tools/restage_decade.py      # stage sf1 first
    python tools/digest_ab.py           # A/B at sf0.1 and sf1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gostream_spark.registry import all_queries  # noqa: E402
from gostream_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# query -> digest arms (first arm is the comparison base)
ARMS = {
    "dup_ngram_fraction": ("md5", "xxhash64"),
    "exact_substr_dedup": ("md5", "xxhash64", "xxhash128"),
}
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".tmp", "decadedata", "sf1")),
]


def main() -> None:
    qs = all_queries()
    spark = get_spark(app_name="digest_ab")
    spark.sparkContext.setLogLevel("ERROR")

    for n, arms in ARMS.items():  # session warm-up, all kernels JIT'd
        for dg in arms:
            qs[n].fn(spark, "/root/testdata/sf0.01", digest=dg).write.format(
                "noop"
            ).mode("overwrite").save()

    print("| Query | sf | " + " | ".join(max(ARMS.values(), key=len)) + " |")
    print("|---|---|---|---|---|")
    for n, arms in ARMS.items():
        for label, sf_dir in SFS:
            if not os.path.isdir(sf_dir):
                continue
            t = {}
            for dg in arms:
                qs[n].fn(spark, sf_dir, digest=dg).write.format("noop").mode(
                    "overwrite"
                ).save()  # warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[n].fn(spark, sf_dir, digest=dg).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                t[dg] = best
            cells = " | ".join(f"{t[dg]:.3f}s" for dg in arms)
            pad = " | " * (len(max(ARMS.values(), key=len)) - len(arms))
            print(f"| `{n}` | {label} | {cells} |{pad[3:]}")

    # output equivalence on the biggest staged fixture: symmetric
    # anti-join of every arm vs the md5 base must be empty both ways.
    sf_dir = next(d for _, d in reversed(SFS) if os.path.isdir(d))
    for n, arms in ARMS.items():
        base = qs[n].fn(spark, sf_dir, digest=arms[0])
        for dg in arms[1:]:
            b = qs[n].fn(spark, sf_dir, digest=dg)
            diff = base.exceptAll(b).count() + b.exceptAll(base).count()
            print(f"{n}: {arms[0]}-vs-{dg} row diff at {sf_dir}: {diff}")
            if diff:
                raise SystemExit(1)


if __name__ == "__main__":
    main()
