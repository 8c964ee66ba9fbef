#!/usr/bin/env python
"""Re-stage documents/embeddings at ~10x sf0.1 ("sf1") to measure the
dedup/text family's NEXT decade (VERDICT r9 #3: every scale claim so
far rests on the sf0.01->0.1 step, where fixed floors still dominate).

    python tools/restage_decade.py                  # writes .tmp/decadedata/sf1
    python tools/decade_probe.py                    # sf0.1 vs sf1 step table
    python tools/sweep.py --root /root/repo/.tmp/decadedata --sf 1 \
        --only docs_dedup_exact,minhash_bottomk_bands   # oracle re-check

Construction: R replicas of sf0.1 (default 10), each written as its
own parquet shard (so the scan has R splits — at a real decade the
input would arrive as many files; a single fat file would re-test the
single-task floor instead of the operator):

- ``doc_id' = doc_id + k * 10_000_000`` — disjoint id spaces.
- every TOKEN gets a per-replica suffix (``_0`` .. ``_R-1``), so
  shingle/token vocabularies are disjoint across replicas: the corpus
  becomes R independent sf0.1-statistics corpora glued together, and
  a throughput decade (work ~10x, output ~10x) is what a linear
  operator must show. Replicating text VERBATIM instead would make
  every doc a 10-way exact duplicate — output pairs would grow
  ~100x by construction and the table would measure output explosion,
  not operator scaling. (That regime is still worth a look — pass
  --verbatim for it — but the decade table uses salted text.)
- ``n_chars`` is recomputed from the salted text.
- embeddings: ``vec_id`` offset the same way; each float is nudged by
  a value-and-replica keyed hash (magnitude ~1e-3) so replicas are
  near- but not exact-duplicates — clustering geometry survives,
  degenerate exact ties do not inflate the cluster structure.
- events (r11, the streaming-state decade): ``event_id``/``user_id``
  offset per replica so every stateful operator's key space is
  disjoint across replicas (dedup state, per-user counts, session
  windows, join state all grow ~10x), and ``ts`` is SHIFTED forward
  by ``k * (span + 1h)`` so the decade is a genuinely 10x-LONGER
  stream: replayed one replica-file per micro-batch, event time is
  monotone across batches, watermarks advance normally, and no row
  is late-dropped (replicating timestamps verbatim would make every
  batch after the first arrive entirely below the watermark —
  dropDuplicates/session state would silently discard it and the
  probe would measure the empty-batch floor, not state growth).
  The shift also decades the tumbling-window keyspace (10x distinct
  days), the one streaming state that id-salting alone leaves flat.

- relational tables (r15): customer/orders/lineitem/part/supplier are
  replicated as R disjoint sub-databases — every key column offset by
  ``k * 10_000_000`` so FK edges stay inside a replica (joins fan out
  1x, not Rx) while non-key values repeat verbatim (R-way exact value
  ties: the shape that breaks any top-k/rank query lacking a total
  ordering). region/nation stay shared symlinked dims. Pass
  ``--no-tpch`` for the pre-r15 shape (relational tables symlinked at
  sf0.1; only the documents/embeddings/events decade).

Everything is deterministic (hash-based, no RNG), so reruns and
cross-engine oracle checks reproduce bit-identically.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from gostream_spark.io import TABLES  # noqa: E402

ID_OFFSET = 10_000_000

# Key columns that receive the per-replica offset (used both by the
# staging loop and the headroom guard below).
_TPCH_KEYS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}
_CORE_KEYS = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}


def _assert_offset_headroom(con, src: str, no_tpch: bool) -> None:
    """ADVICE r15: replica key disjointness silently breaks if any
    source key value >= ID_OFFSET (e.g. a TPC-H source around sf1.7+,
    where l_orderkey exceeds 10M) — joins would then fan out across
    replicas and nothing downstream would notice except wrong decade
    numbers. One cheap SELECT max() per table at stage time; fail
    loudly instead of staging a corrupt fixture."""
    keys = dict(_CORE_KEYS)
    if not no_tpch:
        keys.update(_TPCH_KEYS)
    for t, cols in sorted(keys.items()):
        exprs = ", ".join(f"max({c})" for c in cols)
        row = con.execute(
            f"SELECT {exprs} FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()
        for c, v in zip(cols, row):
            if v is not None and v >= ID_OFFSET:
                raise SystemExit(
                    f"{t}.{c} max {v} >= ID_OFFSET {ID_OFFSET}: replica "
                    "key spaces would overlap (FK edges would cross "
                    "replicas and joins fan out Rx) — refusing to stage "
                    "a corrupt fixture. Raise ID_OFFSET for this source."
                )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out", default=os.path.join(REPO, ".tmp", "decadedata", "sf1")
    )
    ap.add_argument(
        "--verbatim",
        action="store_true",
        help="replicate text verbatim (exact-duplicate stress regime) "
        "instead of salting tokens per replica",
    )
    ap.add_argument(
        "--no-tpch",
        action="store_true",
        help="symlink the relational tables from --src instead of "
        "replicating them (pre-r15 fixture shape: only documents/"
        "embeddings/events decade; relational queries stay at sf0.1)",
    )
    args = ap.parse_args()
    con = duckdb.connect()
    _assert_offset_headroom(con, args.src, args.no_tpch)
    shutil.rmtree(args.out, ignore_errors=True)

    ddir = os.path.join(args.out, "documents.parquet")
    os.makedirs(ddir)
    for k in range(args.replicas):
        text = (
            "text"
            if args.verbatim
            else f"regexp_replace(text, '(\\S+)', '\\1_{k}', 'g')"
        )
        con.execute(
            f"COPY (SELECT doc_id + {k * ID_OFFSET} AS doc_id, "
            f"{text} AS text, lang, source, "
            f"CAST(length({text}) AS BIGINT) AS n_chars "
            f"FROM read_parquet('{args.src}/documents.parquet')) "
            f"TO '{ddir}/replica-{k}.parquet' (FORMAT PARQUET)"
        )

    edir = os.path.join(args.out, "embeddings.parquet")
    os.makedirs(edir)
    for k in range(args.replicas):
        vec = (
            "embedding"
            if args.verbatim or k == 0
            else f"list_transform(embedding, x -> CAST(x + "
            f"(CAST(hash(CAST(floor(x * 1048576) AS BIGINT) + {k}) % 2001 "
            f"AS BIGINT) - 1000) * 1e-6 AS FLOAT))"
        )
        con.execute(
            f"COPY (SELECT vec_id + {k * ID_OFFSET} AS vec_id, "
            f"{vec} AS embedding, label "
            f"FROM read_parquet('{args.src}/embeddings.parquet')) "
            f"TO '{edir}/replica-{k}.parquet' (FORMAT PARQUET)"
        )

    evdir = os.path.join(args.out, "events.parquet")
    os.makedirs(evdir)
    span_sec = con.execute(
        "SELECT CAST(ceil(epoch(max(ts) - min(ts))) AS BIGINT) + 3600 "
        f"FROM read_parquet('{args.src}/events.parquet')"
    ).fetchone()[0]
    for k in range(args.replicas):
        con.execute(
            f"COPY (SELECT event_id + {k * ID_OFFSET} AS event_id, "
            f"ts + to_seconds({k * span_sec}) AS ts, "
            f"user_id + {k * ID_OFFSET} AS user_id, "
            f"event_type, value, props "
            f"FROM read_parquet('{args.src}/events.parquet')) "
            f"TO '{evdir}/replica-{k}.parquet' (FORMAT PARQUET)"
        )

    # Relational (TPC-H-shaped) tables: R disjoint sub-databases glued
    # together — every key column gets the same per-replica offset, so
    # FK edges stay INSIDE a replica (joins fan out 1x, not Rx) and the
    # key spaces are disjoint. Non-key columns are verbatim: replicas
    # therefore produce exact value TIES across the corpus (R copies of
    # every group total under different keys), which is precisely the
    # adversarial shape the registry's deterministic key tiebreakers
    # must absorb — an engine/oracle divergence on any top-k/rank query
    # without a total ordering surfaces here as a hash mismatch.
    # region/nation stay shared dims (symlinked): their keysets are
    # referenced by replicated FKs unchanged, mirroring how a real
    # decade adds facts, not countries.
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        if t in _TPCH_KEYS and not args.no_tpch:
            tdir = os.path.join(args.out, f"{t}.parquet")
            os.makedirs(tdir)
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM "
                    f"read_parquet('{args.src}/{t}.parquet')"
                ).fetchall()
            ]
            for k in range(args.replicas):
                sel = ", ".join(
                    f"{c} + {k * ID_OFFSET} AS {c}"
                    if c in _TPCH_KEYS[t]
                    else c
                    for c in cols
                )
                con.execute(
                    f"COPY (SELECT {sel} FROM "
                    f"read_parquet('{args.src}/{t}.parquet')) "
                    f"TO '{tdir}/replica-{k}.parquet' (FORMAT PARQUET)"
                )
        else:
            os.symlink(f"{args.src}/{t}.parquet", f"{args.out}/{t}.parquet")

    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{ddir}/*.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{edir}/*.parquet')"
    ).fetchone()[0]
    n_ev = con.execute(
        f"SELECT count(*) FROM read_parquet('{evdir}/*.parquet')"
    ).fetchone()[0]

    # Query-literal manifest (VERDICT r10 #2): token-literal and
    # frequency-threshold queries degenerate on the salted corpus —
    # `bm25_topk` scores salted terms against unsalted query literals
    # (0 rows), `heavy_hitter_tokens`' fixed 0.5% threshold spreads
    # each token over R disjoint variants. The manifest carries the
    # scale-matched parameters decade_probe.py feeds the (default-
    # preserving) query knobs: replica-0-salted retrieval terms (fixed
    # query, Rx corpus), the all-replica salted stopword set, and
    # phi_inv scaled by R (a token that is phi-heavy within its
    # replica is phi/R-heavy corpus-wide).
    import json

    from gostream_spark.queries.heavy_hitters import _PHI_INV
    from gostream_spark.queries.llm_text import STOPWORDS
    from gostream_spark.queries.training_assembly import _BM25_TERMS

    manifest = {
        "replicas": args.replicas,
        "salted": not args.verbatim,
        "tpch_replicated": not args.no_tpch,
        "bm25_terms": [
            t if args.verbatim else f"{t}_0" for t in _BM25_TERMS
        ],
        "stopwords": (
            list(STOPWORDS)
            if args.verbatim
            else [
                f"{w}_{k}" for w in STOPWORDS for k in range(args.replicas)
            ]
        ),
        "phi_inv": _PHI_INV * (1 if args.verbatim else args.replicas),
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    n_li = con.execute(
        f"SELECT count(*) FROM read_parquet('{args.out}/lineitem.parquet"
        + ("/*.parquet')" if not args.no_tpch else "')")
    ).fetchone()[0]
    print(
        f"staged {args.out}: documents={n_docs} embeddings={n_vecs} "
        f"events={n_ev} lineitem={n_li}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
