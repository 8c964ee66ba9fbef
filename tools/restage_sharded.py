#!/usr/bin/env python
"""Re-stage a fixture scale dir as SHARDED tables (each table becomes
a directory of N parquet files, rows dealt round-robin), then sweep
against it:

    python tools/restage_sharded.py --sf 0.01 --shards 3
    python tools/sweep.py --root /root/repo/.tmp/detdata --sf 0.01

This is the third determinism axis (after shuffle-partition count and
scan-split bytes): with multiple files per table, Spark's scan order
(file listing + task scheduling) and DuckDB's glob order genuinely
differ, so any query whose result depends on SOURCE ROW ORDER —
first/last without an ordering, order-sensitive folds, collect_list
hashes — diverges from its oracle here even though both engines read
identical rows. The fixture parquets are single-row-group, so
`--max-partition-bytes` alone cannot vary source order.

Row-group note: shards are written by DuckDB with deterministic
content (dealt by row position), so reruns are reproducible.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from gostream_spark.io import TABLES  # noqa: E402  (canonical fixture list)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--shards", type=int, default=3)
    ap.add_argument("--src-root", default="/root/testdata")
    ap.add_argument(
        "--out-root", default=os.path.join(REPO, ".tmp", "detdata")
    )
    args = ap.parse_args()
    src = f"{args.src_root}/sf{args.sf}"
    dst = f"{args.out_root}/sf{args.sf}"
    shutil.rmtree(dst, ignore_errors=True)
    con = duckdb.connect()
    for t in TABLES:
        tdir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(tdir)
        for s in range(args.shards):
            con.execute(
                f"COPY (SELECT * EXCLUDE (__rn) FROM ("
                f"  SELECT *, row_number() OVER () AS __rn"
                f"  FROM read_parquet('{src}/{t}.parquet')"
                f") WHERE (__rn - 1) % {args.shards} = {s}) "
                f"TO '{tdir}/shard-{s}.parquet' (FORMAT PARQUET)"
            )
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{tdir}/*.parquet')"
        ).fetchone()[0]
        assert n_src == n_dst, (t, n_src, n_dst)
        print(f"{t}: {n_dst} rows -> {args.shards} shards")
    print(f"restaged at {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
