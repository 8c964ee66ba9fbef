"""compaction_plan invariants — the properties a compactor relies on,
checked on the real fixture (the exact-value check lives in the
DuckDB oracle; these assert the PLAN is actually usable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import get_query

TARGET = 8192


def test_compaction_plan_invariants(spark, sf_dir):
    plan = get_query("compaction_plan").fn(spark, sf_dir).collect()
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("chars"), F.max("n_chars").alias("max_doc"))
        .collect()
    )
    totals = {r["source"]: r["chars"] for r in docs}
    max_doc = {r["source"]: r["max_doc"] for r in docs}

    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r["source"], []).append(r)

    assert set(by_source) == set(totals)
    for src, rows in by_source.items():
        rows.sort(key=lambda r: r["target_file"])
        # complete coverage: bytes are conserved
        assert sum(r["file_chars"] for r in rows) == totals[src]
        # files don't interleave: doc-id ranges are disjoint and ordered
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["last_doc"] < nxt["first_doc"]
            assert prev["target_file"] < nxt["target_file"]
        for r in rows:
            assert r["first_doc"] <= r["last_doc"]
            assert r["n_docs"] >= 1
            # cumulative packing bound: a bucket overflows TARGET by at
            # most (its first doc's size - 1) < max single doc
            assert r["file_chars"] <= TARGET - 1 + max_doc[src]
