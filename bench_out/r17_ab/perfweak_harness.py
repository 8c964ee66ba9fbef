#!/usr/bin/env python
"""Interleaved A/B of the five r16 'perf-weak' rewrites vs their
pre-r16 (0ca0195) forms, in ONE session (VERDICT r16 next-round #2).
Old forms are verbatim from `git show 0ca0195:...`, renamed old_*.
Decision rule per VERDICT: >=1.1x interleaved min-vs-min -> keep,
else revert. Also collect()-compares outputs old-vs-new for identity.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gostream_spark.io import load_table  # noqa: E402
from gostream_spark.operators import topk_ranked  # noqa: E402
from gostream_spark.registry import all_queries  # noqa: E402
from gostream_spark.session import get_spark  # noqa: E402
from tools.ab_time import ab  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


# ---- old forms (verbatim from 0ca0195, docstrings elided) ----------------

def old_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt_s"))
    ct = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    stot = st.groupBy("source").agg(F.sum("cnt_s").alias("tot_s"))
    tot = ct.agg(F.sum("cnt").alias("tot"))
    ratio = (F.col("cnt_s") * F.col("tot")).cast("double") / (
        F.col("cnt") * F.col("tot_s")
    )
    t_nano = F.floor(
        1e9 * (F.col("cnt_s").cast("double") / F.col("tot_s")) * F.log(ratio)
    ).cast("long")
    terms = (
        st.join(ct, "token")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", t_nano.alias("t_nano"))
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.sum("t_nano").cast("double") / 1e9, 4).alias("kl_nats"),
    )


def old_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    pair_structs = F.expr(
        "flatten(transform(brands, (x, i) -> "
        "transform(slice(brands, i + 2, size(brands)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 5)
    )
    bc = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("brand_cnt"))
    )
    n = baskets.select(F.count(F.lit(1)).alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(bc.withColumnsRenamed({"p_brand": "brand_a", "brand_cnt": "cnt_a"})),
            "brand_a",
        )
        .join(
            F.broadcast(bc.withColumnsRenamed({"p_brand": "brand_b", "brand_cnt": "cnt_b"})),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a", "brand_b", "pair_cnt",
            F.round(F.col("pair_cnt").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("pair_cnt").cast("double") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")), 6,
            ).alias("lift"),
        )
    )


_BM25_TERMS = ("data", "merge", "stream")


def old_bm25(spark: SparkSession, sf_dir: str, terms=_BM25_TERMS) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("dl"))
    stats = sized.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").cast("long").alias("sum_dl")
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n, dfc, tfc, dl = F.col("n_docs"), F.col("df"), F.col("tf"), F.col("dl")
    avgdl = F.col("sum_dl").cast("double") / n
    sc = (
        F.log(F.lit(1) + (n - dfc + 0.5) / (dfc + 0.5))
        * (tfc * 2.2)
        / (tfc + 1.2 * (0.25 + 0.75 * dl / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(sized, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", sc.alias("sc"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("token") == t, F.col("sc"))).alias(f"s{i + 1}")
            for i, t in enumerate(terms)
        ]
    )
    bm25 = F.round(
        sum(F.coalesce(F.col(f"s{i + 1}"), F.lit(0)) for i in range(len(terms))), 6,
    )
    return topk_ranked(
        per_doc.select("doc_id", bm25.alias("bm25")), 20,
        F.col("bm25").desc(), F.col("doc_id"),
    )


def old_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = F.split("text", " ")
    n = F.size(toks)
    n_sh = F.greatest(n - 2, F.lit(0))
    shingles = F.zip_with(
        F.slice(toks, 1, n_sh),
        F.zip_with(
            F.slice(toks, 2, n_sh), F.slice(toks, 3, n_sh),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        lambda x, yz: F.concat(x, F.lit(" "), yz),
    )
    sh = (
        docs.filter(n >= 3)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("shingle_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("inter_cnt").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("inter_cnt")), 6,
    )
    scored = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "inter_cnt", jac.alias("jaccard"))
    )
    return topk_ranked(
        scored.select("doc_a", "doc_b", "inter_cnt", "jaccard"),
        10, F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b"),
    )


def _old_mg_fn(capacity: int):
    from collections.abc import Iterator

    import pandas as pd

    def _misra_gries_candidates(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["text"].str.split(" "):
                for tok in toks:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    return _misra_gries_candidates


def old_heavy_hitter(spark: SparkSession, sf_dir: str, phi_inv: int = 200) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    candidates = docs.mapInPandas(
        _old_mg_fn(2 * phi_inv), schema="token string"
    ).distinct()
    tokens = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    total = tokens.select(F.count("*").alias("n"))
    counts = (
        tokens.join(candidates, "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.col("n") / F.lit(float(phi_inv))))
        .select("token", "cnt")
    )


def main() -> None:
    spark = get_spark(app_name="ab_perfweak")
    reg = all_queries()
    pairs = {
        "source_kl_divergence": old_source_kl,
        "market_basket_pair_lift": old_market_basket,
        "bm25_topk": old_bm25,
        "neardup_jaccard_pairs": old_jaccard,
        "heavy_hitter_tokens": old_heavy_hitter,
    }
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(pairs)
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    for name in only:
        old_fn = pairs[name]
        new_fn = reg[name].fn
        # identity check first (cheap, also warms)
        old_rows = sorted(map(str, old_fn(spark, SF_DIR).collect()))
        new_rows = sorted(map(str, new_fn(spark, SF_DIR).collect()))
        ident = old_rows == new_rows
        print(f"== {name}: outputs identical: {ident} "
              f"({len(old_rows)} rows)")
        if not ident:
            print("   MISMATCH — skipping timing")
            continue
        ab(
            {f"OLD:{name}": lambda f=old_fn: f(spark, SF_DIR),
             f"NEW:{name}": lambda f=new_fn: f(spark, SF_DIR)},
            trials=trials,
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
