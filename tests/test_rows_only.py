"""Semantic checks for the rows-only queries (no SQL-expressible
oracle): the driver only counts their rows, so the real invariants
are pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import get_query


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """A4: HLL++ at rsd=0.01 must land within a conservative 5% of the
    exact distinct count per group."""
    approx = {
        r.l_returnflag: r.approx_parts
        for r in get_query("agg_approx_count_distinct").fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.exact_parts
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_minhash_buckets_account_for_every_doc(spark, sf_dir):
    """L2 scale path: each band partitions the corpus — bucket sizes
    sum to the doc count in every band, and candidate pairs are
    consistent with the largest bucket."""
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = get_query("minhash_lsh_buckets").fn(spark, sf_dir).collect()
    assert len(rows) == 4  # 4 bands
    for r in rows:
        assert r.max_bucket >= 1
        assert r.candidate_pairs >= r.max_bucket * (r.max_bucket - 1) // 2
        assert r.n_buckets <= n_docs


def test_simhash_style_lsh_covers_corpus(spark, sf_dir):
    """L3/L4 scale path: the hyperplane bucketing must cover every
    vector exactly once."""
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    row = get_query("similarity_lsh_buckets").fn(spark, sf_dir).collect()[0]
    assert row.n_vectors == n_vecs
    assert 1 <= row.n_buckets <= 256
    assert row.max_bucket >= row.min_bucket >= 1


def test_kmeans_census_accounts_for_corpus(spark, sf_dir):
    """Iterative k-means demo: every vector lands in exactly one
    cluster, clusters are non-empty, mean within-cluster similarity
    beats the random-pair baseline (~0)."""
    rows = get_query("kmeans_refined_clusters").fn(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    assert all(r.n_members >= 1 for r in rows)
    assert 1 <= len(rows) <= 10
    assert sum(r.mean_cos * r.n_members for r in rows) / n_vecs > 0.05


def test_lsh_buckets_group_similar_vectors(spark, sf_dir):
    """Sanity: hyperplane-bucket co-membership correlates with cosine
    similarity — mean within-bucket similarity must exceed the global
    mean (random vectors: ~0)."""
    from gostream_spark.functions import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        cosine_similarity(F.col("ea"), F.col("eb")).alias("cos")
    )
    global_mean = pairs.agg(F.avg("cos")).collect()[0][0]
    # bucket-mates under one hyperplane: sign of first-dim-ish projection
    proj = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    bucketed = emb.select("vec_id", "embedding", (proj > 0).alias("side"))
    ba = bucketed.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"), F.col("side").alias("sa")
    )
    bb = bucketed.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"), F.col("side").alias("sb")
    )
    mates = ba.join(bb, (F.col("ia") < F.col("ib")) & (F.col("sa") == F.col("sb"))).select(
        cosine_similarity(F.col("ea"), F.col("eb")).alias("cos")
    )
    mates_mean = mates.agg(F.avg("cos")).collect()[0][0]
    assert mates_mean > global_mean


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """A8 ext: assert the sketch's ACTUAL guarantee — rank error. For
    each estimate, the fraction of group rows <= estimate must bracket
    the target quantile within epsilon (1/accuracy) plus the discrete
    mass of the estimate's own value (value-space tolerance would
    mis-test a sparse tail, where adjacent ranks are far apart)."""
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in get_query("agg_approx_percentile").fn(spark, sf_dir).collect()
    }
    for etype, ests in approx.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for q, est in zip((0.5, 0.95, 0.99), ests):
            below = sum(v < est for v in vals) / n
            at_or_below = sum(v <= est for v in vals) / n
            eps = 1.0 / 10000 + 1.0 / n
            assert below - eps <= q <= at_or_below + eps, (etype, q, est, below, at_or_below)


def test_winnowing_matches_python_reference(spark, sf_dir):
    """Independent oracle for winnowing_fingerprint beyond DuckDB: a
    pure-Python winnower over the same docs must agree on count and
    digest, and the selected positions must satisfy the scheme's
    coverage guarantee (a fingerprint in every w-window, so
    consecutive picks are <= w apart)."""
    import hashlib

    from gostream_spark.queries.dedup_advanced import _WINNOW_K, _WINNOW_W

    got = {
        r.doc_id: r
        for r in get_query("winnowing_fingerprint").fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for row in docs[:40]:
        toks = row.text.split(" ")
        m = len(toks) - (_WINNOW_K - 1)
        hs = [
            hashlib.md5(" ".join(toks[p : p + _WINNOW_K]).encode()).hexdigest()[:8]
            for p in range(m)
        ]
        sel = set()
        for i in range(_WINNOW_W - 1, m):  # window [i-w+1, i], 0-based
            win = hs[i - _WINNOW_W + 1 : i + 1]
            mn = min(win)
            # rightmost occurrence of the min
            sel.add(i - list(reversed(win)).index(mn))
        fps = sorted(sel)
        digest = hashlib.md5("|".join(hs[p] for p in fps).encode()).hexdigest()
        r = got[row.doc_id]
        assert r.n_shingles == m
        assert r.n_fps == len(fps), (row.doc_id, r.n_fps, len(fps))
        assert r.fp_digest == digest, row.doc_id
        gaps = [b - a for a, b in zip(fps, fps[1:])]
        assert all(g <= _WINNOW_W for g in gaps)
        if m >= _WINNOW_W:
            assert fps[0] <= _WINNOW_W - 1 and fps[-1] >= m - _WINNOW_W


def test_zorder_key_properties(spark, sf_dir):
    """Morton-key invariants: interleaving is a bijection on the
    (x, y) grid (key decodes back to its dims), and the key is
    monotone in each dimension with the other held fixed."""
    rows = get_query("zorder_cluster_key").fn(spark, sf_dir).collect()

    def decode(z):
        x = y = 0
        for i in range(8):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    by_x = {}
    for r in rows:
        assert decode(r.zkey) == (r.x, r.y % 256), r
        by_x.setdefault(r.y, {})[r.x] = r.zkey
    for y, xs in list(by_x.items())[:5]:
        ks = [xs[x] for x in sorted(xs)]
        assert ks == sorted(ks)  # monotone in x for fixed y


def test_ewma_stays_within_window_bounds(spark, sf_dir):
    """EWMA is a convex combination of the frame's values — it must
    lie within [min, max] of the trailing window for every row."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    bounds = {
        (r.user_id, r.event_id): (r.lo, r.hi)
        for r in ev.select(
            "user_id",
            "event_id",
            F.min("value").over(w).alias("lo"),
            F.max("value").over(w).alias("hi"),
        ).collect()
    }
    for r in get_query("ewma_smoothing").fn(spark, sf_dir).collect():
        lo, hi = bounds[(r.user_id, r.event_id)]
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6, (r, lo, hi)


def test_hll_mergeable_rollup_estimates_and_union_bound(spark, sf_dir):
    """A4 sketch rollup: per-type estimates within 5% of the exact
    distinct count carried in the same row, and the merged (all)
    estimate within 5% of the true all-types distinct user count —
    the union must summarize the SAME population, not re-count it."""
    rows = get_query("hll_mergeable_rollup").fn(spark, sf_dir).collect()
    per = {r.event_type: r for r in rows if r.event_type != "(all)"}
    assert per, "expected per-type sketch rows"
    for k, r in per.items():
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), k
    all_row = next(r for r in rows if r.event_type == "(all)")
    exact_all = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert abs(all_row.approx_users - exact_all) <= max(1, 0.05 * exact_all)
    # merged estimate can never exceed the sum of the parts' estimates
    assert all_row.approx_users <= sum(r.approx_users for r in per.values())


def test_pagerank_conserves_mass_and_ranks_hubs(spark, sf_dir):
    """L2 PageRank centrality: rank mass is conserved over the
    candidate graph (sum == node count within float tolerance), every
    rank is at least the teleport floor (1 - d), and the graph's hub
    structure shows: some node with above-minimum degree outranks the
    global average."""
    rows = get_query("neardup_pagerank_centrality").fn(spark, sf_dir).collect()
    assert rows, "candidate graph should be non-empty at sf0.01"
    n = len(rows)
    total = sum(r.rank for r in rows)
    assert abs(total - n) <= max(1e-3, 1e-6 * n), (total, n)
    assert all(r.rank >= 0.15 - 1e-9 for r in rows)
    max_deg = max(r.degree for r in rows)
    if max_deg > 1:
        best = max(rows, key=lambda r: r.rank)
        assert best.degree > 1, "highest rank should sit on a hub, not a leaf"


def test_space_saving_contains_all_true_heavy_hitters(spark, sf_dir):
    """streaming_heavy_hitters_stateful: the final per-source
    Space-Saving emission must (a) contain EVERY token whose true
    count >= ceil(N_source/200) — the no-false-negative guarantee of
    capacity m=400 >= 2/phi — and (b) only ever OVERestimate, by at
    most N_source/400."""
    out = get_query("streaming_heavy_hitters_stateful").fn(spark, sf_dir).collect()
    emitted = {(r.source, r.token): (r.est_cnt, r.n_tokens) for r in out}

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("token"))
    )
    exact = {
        (r.source, r.token): r.cnt
        for r in toks.groupBy("source", "token").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {
        r.source: r.n for r in toks.groupBy("source").agg(F.count("*").alias("n")).collect()
    }

    # (a) no false negatives at the phi = 1/200 report threshold.
    for (src, tok), cnt in exact.items():
        if cnt >= -(-totals[src] // 200):
            assert (src, tok) in emitted, (src, tok, cnt, totals[src])
    # (b) overestimate-only, bounded by N/m.
    for (src, tok), (est, n_tok) in emitted.items():
        true = exact.get((src, tok), 0)
        assert n_tok == totals[src], (src, n_tok, totals[src])
        assert true <= est <= true + totals[src] / 400, (src, tok, est, true)
