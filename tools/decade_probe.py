#!/usr/bin/env python
"""sf0.1 -> "sf1" decade step for the headline dedup/text family
(VERDICT r9 #3). Run tools/restage_decade.py first, then:

    python tools/decade_probe.py            # markdown rows for PERF.md
    python tools/decade_probe.py --only exact_substr_dedup

Protocol matches tools/scaling_probe.py: one untimed session warm-up
pass over every probed query (JIT charged to the throwaway, not the
first-measured query), then per-(query, sf) a warm run + best-of-2
timed noop-sink writes. Output rows also record result cardinality at
both scales — a linear operator shows work ~10x / output ~10x; an
output ratio far above the input ratio means the CORPUS construction
(not the operator) changed regime, and the time ratio must be read
against the output ratio, not 10.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gostream_spark.registry import all_queries  # noqa: E402
from gostream_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DECADE_QUERIES = [
    "exact_substr_dedup",
    "neardup_prefix_filter_pairs",
    "semantic_dedup_scaled",
    "winnowing_candidate_pairs",
    "neardup_cluster_components",
    "minhash_bottomk_bands",
    "docs_dedup_exact",
    "simhash_dedup",
]
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".tmp", "decadedata", "sf1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf1-dir", default=SF1)
    opts = ap.parse_args()
    if not os.path.isdir(opts.sf1_dir):
        raise SystemExit(
            f"{opts.sf1_dir} missing - run tools/restage_decade.py first"
        )
    names = (
        [n.strip() for n in opts.only.split(",") if n.strip()]
        if opts.only
        else DECADE_QUERIES
    )
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"not registered: {missing}")
    spark = get_spark(app_name="decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:  # session warm-up (throwaway, smallest input)
        qs[n].fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()

    print("| Query | sf0.1 | sf1 | step | rows sf0.1 | rows sf1 |")
    print("|---|---|---|---|---|---|")
    for n in names:
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", opts.sf1_dir)):
            qs[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[label] = (best, qs[n].fn(spark, sf_dir).count())
        (a, ra), (b, rb) = row["sf0.1"], row["sf1"]
        print(
            f"| `{n}` | {a:.3f}s | {b:.3f}s | {b / a:.1f}x "
            f"| {ra} | {rb} |"
        )


if __name__ == "__main__":
    main()
