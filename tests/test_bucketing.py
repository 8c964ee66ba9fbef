"""Bucketed co-located join (SCALE.md joins section): bucketing both
fact tables on the join key removes the per-join shuffle — the
repeated-join optimization that matters most at 100 TB. Verified by
asserting the bucketed join plan contains NO shuffle exchange while
producing identical results to the plain join."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gostream_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, bucketed_tables):
    # disable broadcast so the join strategy question is shuffle-vs-bucket
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # SortMergeJoin reads both sides bucket-aligned: the only
        # exchange allowed is the final single-column aggregation.
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, join_part

        plain = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_on_join_key_has_zero_exchanges(spark, sf_dir, bucketed_tables):
    """The stronger co-location property: an aggregate keyed on the
    bucket column inherits the scans' hash distribution THROUGH the
    join, so the entire plan — join AND aggregate — runs with zero
    exchanges of any kind. At 100 TB this is the layout-at-ingest
    shape: every downstream orderkey join/rollup is bucket-local."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        per_order = (
            spark.table("b_orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            )
        )
        plan = per_order._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2

        plain = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            )
        )
        assert sorted(map(tuple, per_order.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
