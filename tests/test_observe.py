"""Observation API (pipeline observability): metrics accumulate on
the SAME pass as the main action — no second scan — which is how a
100 TB job reports rows-seen / money-moved without doubling its I/O.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from gostream_spark.io import load_table


def test_observation_metrics_piggyback_on_one_pass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
    )
    main = observed.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    per_flag = {r["l_returnflag"]: r["n"] for r in main.collect()}

    metrics = obs.get
    # The observed totals must agree with an independent direct aggregate
    direct = li.agg(
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "price_cents"
        ),
    ).collect()[0]
    assert metrics["rows_seen"] == direct["rows_seen"] == sum(per_flag.values())
    assert metrics["price_cents"] == direct["price_cents"]
    assert metrics["rows_seen"] > 0
