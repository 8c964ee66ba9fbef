"""Partition pruning on a date-partitioned fact table (SCALE.md scans
section): at 100 TB the fact tables are laid out partitioned by a
coarse date column, and the two levers that make scans affordable are
(1) static pruning — a literal predicate on the partition column
reaches the file listing, so non-matching partitions are never even
listed — and (2) dynamic partition pruning (DPP) — a selective filter
on a joined dim is broadcast as a runtime subquery that prunes fact
partitions before the scan. Both are asserted on the physical plan
AND on result parity with the unpartitioned layout."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gostream_spark.io import load_table


@pytest.fixture(scope="module")
def partitioned_lineitem(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("part")) + "/lineitem_by_year"
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.mode("overwrite").partitionBy("ship_year").parquet(base)
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_static_partition_pruning(spark, sf_dir, partitioned_lineitem):
    df = (
        spark.read.parquet(partitioned_lineitem)
        .filter(F.col("ship_year") == 1994)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The year predicate must reach the scan's partition filters (file
    # listing level), not survive as a post-scan Filter over the data.
    assert "PartitionFilters" in plan and "ship_year" in plan.split("PartitionFilters")[1].split("]")[0]

    plain = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1994)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_dynamic_partition_pruning(spark, sf_dir, partitioned_lineitem):
    fact = spark.read.parquet(partitioned_lineitem)
    # Dim: order-years with a selective attribute filter. DPP should
    # turn that filter into a runtime subquery pruning fact partitions.
    dim = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").alias("y"),
            "o_orderpriority",
        )
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("y")
        .distinct()
    )
    joined = (
        fact.join(F.broadcast(dim), fact.ship_year == dim.y)
        .groupBy("ship_year")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    plain = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("ship_year", F.year("l_shipdate"))
        .join(
            F.broadcast(dim.withColumnRenamed("y", "y2")),
            F.col("ship_year") == F.col("y2"),
        )
        .groupBy("ship_year")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
