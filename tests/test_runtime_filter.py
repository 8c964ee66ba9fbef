"""Runtime bloom-filter join reduction (Spark's runtime filter
framework): on a selective dim-side filter, the optimizer injects a
might_contain(bloom) predicate into the FACT side's scan stage, so
rows that cannot join die before the shuffle — at 100 TB this is the
difference between shuffling the full fact table and shuffling the
matching slice. Thresholds are lowered to trigger at fixture scale;
on a cluster the defaults (10MB creation side) fire on real dims."""

from __future__ import annotations

from pyspark.sql import functions as F

from gostream_spark.io import load_table

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_selective_join_gets_bloom_runtime_filter(spark, sf_dir):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # the filter must land on the fact (lineitem) scan side
        fact_scan = [
            ln for ln in plan.splitlines() if "might_contain" in ln and "l_orderkey" in ln
        ]
        assert fact_scan, plan[:2000]
        # and the join result is still correct
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
