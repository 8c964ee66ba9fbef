"""Pins for the decade-fixture parameterization knobs (round 11).

The salted decade fixture degenerates token-literal and
frequency-threshold queries, so `bm25_topk`, `tfidf_top_terms`, and
`heavy_hitter_tokens` grew default-preserving knobs plus oracle
BUILDERS the probe parameterizes from the fixture manifest. These
tests pin the contract-freeze half of that change: the builders at
their defaults must reproduce the REGISTERED oracle text exactly, and
calling the query functions with explicit default knob values must
equal the registered two-arg call row-for-row. The parameterized-at-
scale half is checked live by tools/decade_probe.py's sf1 oracle
re-check.
"""

from __future__ import annotations

from gostream_spark.registry import get_query


def test_oracle_builders_reproduce_registered_oracles():
    from gostream_spark.queries.heavy_hitters import _PHI_INV, hh_oracle
    from gostream_spark.queries.llm_text import STOPWORDS, tfidf_oracle
    from gostream_spark.queries.training_assembly import (
        _BM25_TERMS,
        bm25_oracle,
    )

    assert hh_oracle(_PHI_INV) == get_query("heavy_hitter_tokens").oracle
    assert tfidf_oracle(STOPWORDS) == get_query("tfidf_top_terms").oracle
    assert bm25_oracle(_BM25_TERMS) == get_query("bm25_topk").oracle


def test_parameterized_oracles_differ_from_defaults():
    """A salted-parameter oracle must actually change the SQL (guards
    against a builder that ignores its argument)."""
    from gostream_spark.queries.heavy_hitters import hh_oracle
    from gostream_spark.queries.llm_text import tfidf_oracle
    from gostream_spark.queries.training_assembly import bm25_oracle

    assert "'data_0'" in bm25_oracle(("data_0",))
    assert "'the_3'" in tfidf_oracle(("the_3",))
    assert "/ 2000.0" in hh_oracle(2000)


def test_default_knobs_match_two_arg_call(spark, sf_dir):
    from gostream_spark.queries.heavy_hitters import (
        _PHI_INV,
        heavy_hitter_tokens,
    )
    from gostream_spark.queries.llm_text import STOPWORDS, tfidf_top_terms
    from gostream_spark.queries.training_assembly import (
        _BM25_TERMS,
        bm25_topk,
    )

    for fn, kwargs in (
        (bm25_topk, {"terms": _BM25_TERMS}),
        (tfidf_top_terms, {"stopwords": STOPWORDS}),
        (heavy_hitter_tokens, {"phi_inv": _PHI_INV}),
    ):
        plain = sorted(map(tuple, fn(spark, sf_dir).collect()))
        knobbed = sorted(map(tuple, fn(spark, sf_dir, **kwargs).collect()))
        assert plain == knobbed


def test_salted_phi_changes_mg_capacity():
    """The Misra-Gries pass must size its counter dict from the knob
    (2/phi), or pass-1 candidates lose the no-false-negative
    guarantee at the scaled threshold."""
    import pandas as pd

    from gostream_spark.queries.heavy_hitters import _mg_candidates_fn

    # capacity 4: a 6-distinct-token stream must evict; capacity 100
    # keeps everything.
    batch = pd.DataFrame({"text": ["a b c d e f a a"]})
    small = list(_mg_candidates_fn(4)(iter([batch])))[0]
    big = list(_mg_candidates_fn(100)(iter([batch])))[0]
    assert len(small) <= 4
    assert set(big["token"]) == {"a", "b", "c", "d", "e", "f"}


def test_quadratic_evaluator_builders_reproduce_registered_oracles():
    """r16 (VERDICT r15 #2): the three quadratic ground-truth
    evaluators grew probe/replica scoping knobs for decade sweeps —
    contract freeze requires their builders at defaults to BE the
    registered oracles."""
    from gostream_spark.queries.llm_similarity import mislabel_oracle
    from gostream_spark.queries.skew_and_ivf import recall_oracle
    from gostream_spark.queries.statistics_ops import triangle_oracle

    assert mislabel_oracle() == get_query("knn_label_disagreement").oracle
    assert recall_oracle() == get_query("ann_recall_at_k").oracle
    assert triangle_oracle() == get_query("graph_triangle_count").oracle


def test_quadratic_evaluator_scoped_oracles_differ_from_defaults():
    from gostream_spark.queries.llm_similarity import mislabel_oracle
    from gostream_spark.queries.skew_and_ivf import recall_oracle
    from gostream_spark.queries.statistics_ops import triangle_oracle

    assert "vec_id < 10000000" in mislabel_oracle(10_000_000)
    assert "vec_id < 10000000" in recall_oracle(10_000_000)
    assert "l_orderkey < 10000000" in triangle_oracle(10_000_000)


def test_probe_below_default_matches_two_arg_call(spark, sf_dir):
    """An explicit probe_below ABOVE every fixture id must equal the
    registered two-arg call row-for-row (default-preserving knob),
    and a bound of 0 must empty the probe side."""
    from gostream_spark.queries.llm_similarity import knn_label_disagreement
    from gostream_spark.queries.skew_and_ivf import ann_recall_at_k

    for fn in (knn_label_disagreement, ann_recall_at_k):
        plain = sorted(map(tuple, fn(spark, sf_dir).collect()))
        knobbed = sorted(
            map(tuple, fn(spark, sf_dir, probe_below=10_000_000).collect())
        )
        assert plain == knobbed, fn.__name__
        assert fn(spark, sf_dir, probe_below=0).count() == 0, fn.__name__


def test_decade_scope_only_fires_on_manifested_fixtures(tmp_path):
    """scoped_overrides is keyed on the restager's manifest.json: the
    driver-gate fixtures must sweep byte-for-byte unscoped."""
    import json as _json
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.decade_scope import scoped_overrides

    assert scoped_overrides("/root/testdata/sf0.01") == {}
    assert scoped_overrides(str(tmp_path)) == {}
    (tmp_path / "manifest.json").write_text(_json.dumps({"replicas": 3}))
    ov = scoped_overrides(str(tmp_path))
    assert set(ov) == {
        "knn_label_disagreement",
        "ann_recall_at_k",
        "graph_triangle_count",
    }
    # knn/ann scope BOTH arms; triangle scopes only the oracle.
    assert ov["knn_label_disagreement"][0] == {"probe_below": 10_000_000}
    assert ov["ann_recall_at_k"][0] == {"probe_below": 10_000_000}
    assert ov["graph_triangle_count"][0] == {}
    assert "l_orderkey < 10000000" in ov["graph_triangle_count"][1]
