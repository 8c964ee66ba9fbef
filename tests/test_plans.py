"""Physical-plan regression tests — pin the scale properties SCALE.md
claims, so a refactor that silently drops a pushdown or broadcasts a
fact table fails CI, not the 100 TB run."""

from __future__ import annotations

from gostream_spark.registry import get_query


def _plan(spark, sf_dir, name: str) -> str:
    df = get_query(name).fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushdown_and_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial -> final hash aggregate with exactly one shuffle between
    assert plan.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in plan


def test_star_join_is_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_star_revenue")
    # four dimension-side broadcasts; lineitem streams through them
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # the only shuffle is the final 5-row aggregation
    assert plan.count("Exchange hashpartitioning") == 1
    # date filter pushed into the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_topk_global_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_lang_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "lang_source_stats")
    assert "In(lang" in plan


def test_similarity_topk_broadcasts_query_vector(spark, sf_dir):
    plan = _plan(spark, sf_dir, "similarity_topk")
    # 1-row query side is broadcast (nested-loop over broadcast),
    # corpus side is never shuffled for the join
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_shuffles_once(spark, sf_dir):
    plan = _plan(spark, sf_dir, "docs_dedup_exact")
    assert plan.count("Exchange hashpartitioning") == 1
