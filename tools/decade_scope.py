#!/usr/bin/env python
"""Decade-sweep scoping for the quadratic ground-truth evaluators
(VERDICT r15 #2).

Three registered queries compute quadratic-in-corpus ground truth —
`knn_label_disagreement` and `ann_recall_at_k` (probe panel x corpus
pair products) and `graph_triangle_count` (corpus co-occurrence
self-join in the oracle). At decade fixtures (sf3: 30x sf0.1) the
Spark arms complete, but the ONE-BOX DuckDB oracle blows its 64 GB
memory / 40 GB spill caps (SCALE.md r15) — the r15 sweep classified
them oracle-resource-bound and left the highest rung uncompared.

This module closes that gap using the restager's replica structure
(tools/restage_decade.py): fixtures are R disjoint sub-databases with
every key column offset by ``k * ID_OFFSET`` and FK edges INSIDE a
replica.

- knn/ann: bound the PROBE side to replica 0 in BOTH arms
  (query knob `probe_below` + parameterized oracle). Ground truth is
  still a FULL-corpus search per probe — panel x corpus is linear in
  corpus — and the exact-compare is a true engine-vs-oracle check on
  the decade input.
- triangle: the engine arm stays UNSCOPED; only the oracle is
  restricted to replica 0. Replication makes that exact by
  construction: non-key columns (p_brand) are verbatim and order keys
  never cross replicas, so corpus pair support is exactly
  ``R * s_replica0`` for every pair, the discrete quantile threshold
  scales by the same R, and the thresholded edge set — hence the
  triangle counts — equals replica 0's. The invariants this rests on
  (verbatim non-key columns, in-replica FK edges, disjoint key
  spaces) are pinned by tests/test_restage_decade.py, and
  ``scoped_overrides`` only fires when the fixture manifest says the
  relational tables were actually replicated.

Scoping activates ONLY for fixtures staged by restage_decade.py
(detected by their manifest.json); the driver-gate sweep at
/root/testdata is byte-for-byte unaffected.
"""

from __future__ import annotations

import json
import os

from tools.restage_decade import ID_OFFSET


def scoped_overrides(sf_dir: str) -> dict[str, tuple[dict, str]]:
    """name -> (query kwargs, parameterized oracle SQL) for the
    quadratic evaluators, when ``sf_dir`` is a decade fixture staged
    by restage_decade.py. Empty dict otherwise (plain fixtures run
    the registered defaults)."""
    path = os.path.join(sf_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        manifest = json.load(f)
    from gostream_spark.queries.llm_similarity import mislabel_oracle
    from gostream_spark.queries.skew_and_ivf import recall_oracle
    from gostream_spark.queries.statistics_ops import triangle_oracle

    overrides: dict[str, tuple[dict, str]] = {
        "knn_label_disagreement": (
            {"probe_below": ID_OFFSET},
            mislabel_oracle(ID_OFFSET),
        ),
        "ann_recall_at_k": (
            {"probe_below": ID_OFFSET},
            recall_oracle(ID_OFFSET),
        ),
    }
    # The triangle scoping is oracle-side only and leans on the
    # relational replication invariant. Both manifest shapes are
    # exact: tpch_replicated fixtures by the R-fold support argument
    # above, and --no-tpch fixtures trivially (lineitem is the
    # symlinked sf0.1 source, every order key already < ID_OFFSET, so
    # the bound is a no-op).
    del manifest  # only its existence gates scoping
    overrides["graph_triangle_count"] = ({}, triangle_oracle(ID_OFFSET))
    return overrides
