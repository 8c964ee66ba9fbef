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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_rows(g: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Per-doc probe-prefix rows ``(doc_id, s, n, pos, in_idx)`` under
    the canonical element order (doc-frequency asc, element asc):
    positions 1 .. n - ceil(t*n) + 1 survive; ``in_idx`` marks the
    shorter AllPairs INDEX prefix 1 .. n - ceil(2t/(1+t)*n) + 1 that
    suffices for the smaller side of any qualifying pair. ``s`` is
    xxhash64-keyed — exactness-safe for candidate matching because a
    collision can only ADD a candidate (killed in verification),
    never lose one, and the shuffle carries fixed-width longs."""
    ub_den = t_num + t_den
    e = g.select("doc_id", "n", F.explode("sh").alias("s"))
    dfreq = e.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w_pos = Window.partitionBy("doc_id").orderBy("df", "s")
    return (
        e.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w_pos))
        .filter(
            F.col("pos")
            <= F.col("n")
            - F.expr(f"({t_num}*n + {t_den - 1}) DIV {t_den}")
            + 1
        )
        .select(
            "doc_id",
            F.xxhash64("s").alias("s"),
            "n",
            "pos",
            F.expr(
                f"pos <= n - (2*{t_num}*n + {ub_den - 1}) DIV {ub_den} + 1"
            ).alias("in_idx"),
        )
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
    prefix = prefix_rows(g, t_num, t_den)
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
    cand = candidate_pairs(g, t_num, t_den).distinct()
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
