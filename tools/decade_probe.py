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

Literal-parameterized queries (VERDICT r10 #2): token-literal and
frequency-threshold queries (`bm25_topk`, `tfidf_top_terms`,
`heavy_hitter_tokens`) degenerate on the salted decade corpus, so
their sf1 runs are parameterized from the fixture's `manifest.json`
(written by restage_decade.py: replica-0-salted retrieval terms,
all-replica salted stopwords, R-scaled phi) through the queries'
default-preserving knobs; each parameterized sf1 run is re-checked
against its parameterized DuckDB oracle (the same exact-compare the
driver gate uses) before its timing row is trusted.
"""

from __future__ import annotations

import argparse
import json
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
    "bm25_topk",
    "heavy_hitter_tokens",
    "tfidf_top_terms",
]
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".tmp", "decadedata", "sf1")


def _manifest_params(sf1_dir: str) -> dict[str, tuple[dict, str]]:
    """name -> (sf1 query kwargs, sf1-parameterized DuckDB oracle),
    from the fixture manifest. Empty when no manifest exists (older
    fixture or --verbatim staging keeps the literals meaningful)."""
    path = os.path.join(sf1_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        m = json.load(f)
    from gostream_spark.queries.heavy_hitters import hh_oracle
    from gostream_spark.queries.llm_text import tfidf_oracle
    from gostream_spark.queries.training_assembly import bm25_oracle

    terms = tuple(m["bm25_terms"])
    stop = tuple(m["stopwords"])
    phi = int(m["phi_inv"])
    return {
        "bm25_topk": ({"terms": terms}, bm25_oracle(terms)),
        "tfidf_top_terms": ({"stopwords": stop}, tfidf_oracle(stop)),
        "heavy_hitter_tokens": ({"phi_inv": phi}, hh_oracle(phi)),
    }


def _oracle_check(spark, sf_dir: str, name: str, fn, kwargs, sql) -> str:
    """Driver-style exact compare of the (parameterized) Spark query
    against its (parameterized) DuckDB oracle on the same fixture.
    Returns 'ok' or a short mismatch description."""
    import duckdb

    from gostream_spark.io import TABLES
    from tools.canon import canon_value

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    sdf = fn(spark, sf_dir, **kwargs)
    got = sorted(
        tuple(canon_value(v) for v in r) for r in sdf.collect()
    )
    want = sorted(
        tuple(canon_value(v) for v in r) for r in con.execute(sql).fetchall()
    )
    con.close()
    if len(got) != len(want):
        return f"row count {len(got)} != oracle {len(want)}"
    if got != want:
        bad = next(i for i, (g, w) in enumerate(zip(got, want)) if g != w)
        return f"value mismatch at sorted row {bad}: {got[bad]} != {want[bad]}"
    return "ok" if got else "ok (EMPTY - degenerate?)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf1-dir", default=SF1)
    ap.add_argument(
        "--no-check",
        action="store_true",
        help="skip the sf1 oracle re-check of parameterized queries",
    )
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
    params = _manifest_params(opts.sf1_dir)
    # Table label self-describes the probed fixture ("sf3" when
    # pointed at .tmp/decadedata/sf3), so a PERF.md row pasted from
    # the output names its actual scale step, not a hardcoded "sf1".
    big = os.path.basename(os.path.normpath(opts.sf1_dir)) or "sf1"
    spark = get_spark(app_name="decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:  # session warm-up (throwaway, smallest input)
        qs[n].fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()

    checks: list[tuple[str, str]] = []
    print(f"| Query | sf0.1 | {big} | step | rows sf0.1 | rows {big} |")
    print("|---|---|---|---|---|---|")
    for n in names:
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", opts.sf1_dir)):
            kwargs = params.get(n, ({}, ""))[0] if label == "sf1" else {}
            qs[n].fn(spark, sf_dir, **kwargs).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[n].fn(spark, sf_dir, **kwargs).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[label] = (best, qs[n].fn(spark, sf_dir, **kwargs).count())
        (a, ra), (b, rb) = row["sf0.1"], row["sf1"]
        star = "*" if n in params else ""
        print(
            f"| `{n}`{star} | {a:.3f}s | {b:.3f}s | {b / a:.1f}x "
            f"| {ra} | {rb} |"
        )
        if n in params and not opts.no_check:
            kwargs, sql = params[n]
            checks.append(
                (n, _oracle_check(spark, opts.sf1_dir, n, qs[n].fn, kwargs, sql))
            )
    if checks:
        print()
        print(f"{big} oracle re-checks (manifest-parameterized):")
        for n, verdict in checks:
            print(f"  {n}: {verdict}")
        if any(v != "ok" for _, v in checks):
            raise SystemExit(1)


if __name__ == "__main__":
    main()
