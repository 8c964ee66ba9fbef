#!/usr/bin/env python
"""md5 vs xxhash64 gram-key A/B (VERDICT r10 #4): at sf1 the
`dup_ngram_fraction` / `exact_substr_dedup` pair converges to the
shared one-digest-per-gram-occurrence kernel (~5.4 s each). The
digest is an internal gram-equivalence key — parity does not need
cross-engine hash equality — so a cheaper 64-bit xxhash64 key is
admissible if it (a) cuts the kernel materially and (b) produces
bit-identical OUTPUT rows (same equivalence classes). This tool
measures (a) and verifies (b) on the full fixture.

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
QUERIES = ["dup_ngram_fraction", "exact_substr_dedup"]
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".tmp", "decadedata", "sf1")),
]


def main() -> None:
    qs = all_queries()
    spark = get_spark(app_name="digest_ab")
    spark.sparkContext.setLogLevel("ERROR")

    for n in QUERIES:  # session warm-up, both kernels JIT'd
        for dg in ("md5", "xxhash64"):
            qs[n].fn(spark, "/root/testdata/sf0.01", digest=dg).write.format(
                "noop"
            ).mode("overwrite").save()

    print("| Query | sf | md5 | xxhash64 | cut |")
    print("|---|---|---|---|---|")
    for n in QUERIES:
        for label, sf_dir in SFS:
            if not os.path.isdir(sf_dir):
                continue
            t = {}
            for dg in ("md5", "xxhash64"):
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
            cut = 100 * (1 - t["xxhash64"] / t["md5"])
            print(
                f"| `{n}` | {label} | {t['md5']:.3f}s "
                f"| {t['xxhash64']:.3f}s | {cut:.0f}% |"
            )

    # (b) output equivalence on the biggest staged fixture: symmetric
    # anti-join must be empty both ways.
    sf_dir = next(d for _, d in reversed(SFS) if os.path.isdir(d))
    for n in QUERIES:
        a = qs[n].fn(spark, sf_dir, digest="md5")
        b = qs[n].fn(spark, sf_dir, digest="xxhash64")
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"{n}: md5-vs-xxhash64 row diff at {sf_dir}: {diff}")
        if diff:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
