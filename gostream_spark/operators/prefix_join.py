"""Exact set-similarity threshold join via prefix filtering
(AllPairs — Bayardo et al. 2007; PPJoin positional/length filters —
Xiao et al. 2008).

Given per-document element ARRAYS (shingles, tokens, any set
representation), returns every (doc_a < doc_b) pair whose Jaccard
similarity is >= t — EXACTLY, but without joining on all shared
elements: candidates form only through each document's prefix under a
global canonical order (element doc-frequency ascending), which is
dominated by RARE elements that cannot fan out. See
``queries/dedup_advanced.neardup_prefix_filter_pairs`` for the scale
narrative; this module is the reusable core (also property-tested on
random inputs in tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_rows(g: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Per-doc probe-prefix rows ``(doc_id, s, n, pos, in_idx)`` under
    the canonical element order (doc-frequency asc, element asc):
    positions 1 .. n - ceil(t*n) + 1 survive; ``in_idx`` marks the
    shorter AllPairs INDEX prefix 1 .. n - ceil(2t/(1+t)*n) + 1 that
    suffices for the smaller side of any qualifying pair. ``s`` is
    xxhash64-keyed — exactness-safe for candidate matching because a
    collision can only ADD a candidate (killed in verification),
    never lose one, and the shuffle carries fixed-width longs.

    The canonical rank is computed ROW-LOCALLY: the exploded
    occurrence stream joins doc-frequency (one hash join, AQE
    skew-splittable), regroups per doc (hash shuffle, NO sort — the
    r9 profile showed the doc-partitioned rank window's full
    shuffle+sort of the occurrence stream was the dominant cost, not
    the candidate join), then each doc ``array_sort``s its own
    (df, s) structs inside codegen and ``slice``s the probe prefix
    BEFORE re-exploding — only prefix tokens reach the self-join
    exchange. Struct comparison is field-order (df asc, s asc), the
    same total order the window used, so prefixes are bit-identical;
    s stays a raw string until after the sort because hashing first
    could (with negligible but nonzero probability) merge two
    distinct elements into one order class and break the cross-doc
    consistency the prefix lemma requires.

    Measured alternative, deliberately NOT taken: computing df as
    ``count() OVER (PARTITION BY s)`` removes the dfreq aggregate +
    join and reads ~0.3 s faster at sf0.1 (1.0 s vs 1.35 s for this
    stage) — but a window cannot be skew-split, so a viral
    boilerplate shingle's entire occurrence list lands in ONE window
    partition at corpus scale. The groupBy(s)+join form partial-
    aggregates the count map-side and leaves the probe-side shuffle
    eligible for AQE skew-join splitting — the shape that survives
    the Zipf head at 100 TB."""
    ub_den = t_num + t_den
    # explode_outer, NOT explode: plain explode makes Catalyst infer
    # ``size(sh) > 0 AND isnotnull(sh)`` on the generator INPUT,
    # alias-substitute the (expensive) shingle expression into that
    # predicate, and push it below the caller's spread_for_compute
    # exchange — evaluating the whole shingle pipeline serially in
    # the single-task scan stage and then again above (the same
    # pathology documented at queries/llm_similarity.py:592).
    # explode_outer infers nothing about its input; the null filter
    # below references the generator OUTPUT, which cannot be pushed
    # below the Generate.
    e = (
        g.select("doc_id", "n", F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
    )
    dfreq = e.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    probe_len = (
        F.col("n") - F.expr(f"({t_num}*n + {t_den - 1}) DIV {t_den}") + 1
    )
    pref = (
        e.join(dfreq, "s")
        .groupBy("doc_id", "n")
        .agg(F.collect_list(F.struct("df", "s")).alias("ds"))
        .select(
            "doc_id",
            "n",
            F.slice(F.array_sort("ds"), F.lit(1), probe_len).alias("pref"),
        )
    )
    return pref.select(
        "doc_id",
        "n",
        F.posexplode("pref").alias("i", "x"),
    ).select(
        "doc_id",
        F.xxhash64("x.s").alias("s"),
        "n",
        (F.col("i") + 1).alias("pos"),
        F.expr(
            f"i + 1 <= n - (2*{t_num}*n + {ub_den - 1}) DIV {ub_den} + 1"
        ).alias("in_idx"),
    )


def candidate_pairs(g: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Candidate ``(doc_a < doc_b)`` pairs (NOT yet distinct) from the
    prefix x prefix self-join. Pairs are oriented smaller-first by
    (n, doc_id) so the index-prefix condition applies to the side it
    is proven for, then pruned by the PPJoin length filter and the
    positional overlap upper bound; ids are re-canonicalized to
    doc_a < doc_b on output. Exposed separately so diagnostics
    (tools/prefix_join_stats.py) measure the REAL candidate stream."""
    ub_num, ub_den = t_num, t_num + t_den
    # r16 (guide §2.4/§5): materialize the prefix frame ONCE with an
    # eager localCheckpoint. Spark's ReuseExchange does not fire across
    # the two self-join arms (alias dedup rewrites one side's expr ids
    # and the canonical forms diverge), so without this the ENTIRE
    # prefix pipeline — scan, shingle explode, dfreq aggregate+join,
    # per-doc collect+array_sort — executed twice, once per arm
    # (6 parquet scans in the r16 before-plan). The checkpointed frame
    # is the NARROW decision stream of guide §8 (doc_id, xxhash64 s,
    # n, pos, in_idx ≈ 30 B/row, prefix-length not corpus-text-length),
    # which is what makes the materialize side of the
    # materialize-vs-recompute trade cheap; checkpointing the shingle
    # ARRAY table g as well was measured SLOWER (1.95 s vs 1.81 s at
    # sf0.1 — writing full arrays costs more than the re-scan saves,
    # the same trade market_basket documented in r7). Measured: 2.220 s
    # -> 1.813 s at sf0.1, identical output rows.
    prefix = prefix_rows(g, t_num, t_den).localCheckpoint(eager=True)
    return (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (
                (F.col("a.n") < F.col("b.n"))
                | (
                    (F.col("a.n") == F.col("b.n"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & F.col("a.in_idx")
            & (t_num * F.col("b.n") <= t_den * F.col("a.n"))
            & (
                ub_den
                * (
                    1
                    + F.least(
                        F.col("a.n") - F.col("a.pos"),
                        F.col("b.n") - F.col("b.pos"),
                    )
                )
                >= ub_num * (F.col("a.n") + F.col("b.n"))
            ),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
    )


def prefix_filtered_jaccard_pairs(
    g: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """Exact Jaccard >= t_num/t_den pairs over ``g(doc_id, sh, n)``
    where ``sh`` is the doc's DISTINCT element array and ``n`` its
    length (>= 1). Output: doc_a, doc_b, inter_cnt, jaccard
    (rounded 6 — a single IEEE division of exact integers).

    Correctness: under a global total order on elements, a pair with
    overlap >= alpha must share an element within each side's first
    ``n - alpha + 1`` positions; J >= t implies overlap >=
    ceil(t*n) per side, giving the per-doc PROBE prefix length
    ``n - ceil(t*n) + 1``. The AllPairs index-reduction additionally
    bounds the pair overlap from the SMALLER side alone: with
    n_a <= n_b, alpha = ceil(t*(n_a+n_b)/(1+t)) >=
    ceil(2t/(1+t) * n_a), so the smaller doc of any qualifying pair
    must contribute a shared element from its first
    ``n - ceil(2t/(1+t)*n) + 1`` positions (the INDEX prefix — for
    t=0.6 that is ~0.25n vs the probe prefix's ~0.4n). The join
    therefore orients each pair by (n, doc_id) and requires the
    smaller side's match position to fall inside its index prefix —
    a strictly tighter, still provably complete candidate set (this
    is what keeps candidate growth in check when the corpus scales:
    candidates form only where a RARE-end element of the smaller doc
    recurs). Candidates are further pruned by the PPJoin length
    filter (t <= n_a/n_b <= 1/t) and positional upper bound
    (1 + min(remaining) must reach the pair overlap threshold
    ceil(t*(n_a+n_b)/(1+t))), and verified row-locally with
    ``array_intersect`` using the all-integer test
    ``(t_den + t_num) * inter >= t_num * (n_a + n_b)`` — zero
    float-boundary risk. All thresholds use integer ceil division.
    """
    # The explicit-N repartition on the pair key does double duty: it
    # IS the distinct's required distribution (so it replaces, not
    # adds to, the dedup exchange — ENSURE_REQUIREMENTS is satisfied
    # and no second shuffle appears), and its user-specified width is
    # exempt from AQE coalescing, which at small fixtures would fold
    # the whole verification (array_intersect over every candidate
    # pair) onto ONE task. defaultParallelism scales with the
    # cluster, so at the 100 TB point this is the same width the
    # exchange would get anyway.
    width = g.sparkSession.sparkContext.defaultParallelism
    cand = (
        candidate_pairs(g, t_num, t_den)
        .repartition(width, "doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ga = g.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    gb = g.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    verified = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select("doc_a", "doc_b", inter.alias("inter_cnt"), "n_a", "n_b")
        .filter(
            (t_den + t_num) * F.col("inter_cnt")
            >= t_num * (F.col("n_a") + F.col("n_b"))
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter_cnt",
        F.round(
            F.col("inter_cnt")
            / (F.col("n_a") + F.col("n_b") - F.col("inter_cnt")),
            6,
        ).alias("jaccard"),
    )
