#!/usr/bin/env python
"""Dump `.explain("formatted")` output for bench (or named) queries to
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (guide §1: capture the plan shape before and after every
change).

    python tools/dump_plans.py --tag r16 --suffix before
    python tools/dump_plans.py --tag r16 --suffix after --only market_basket_pair_lift
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument("--sf", default="0.1")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    from gostream_spark.registry import all_queries
    from gostream_spark.session import get_spark

    qs = all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in names if n not in qs]
        if missing:
            print(f"unknown queries: {missing}")
            return 2
    else:
        names = sorted(n for n, q in qs.items() if q.bench)

    spark = get_spark(app_name="dump_plans")
    sf_dir = f"{args.root}/sf{args.sf}"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
