"""AQE runtime join-strategy switch (SCALE.md joins section): static
planning can only see pre-execution size ESTIMATES, and a filtered
side's estimate is often wildly pessimistic. At 100 TB this is the
difference between a full fact-fact shuffle and a broadcast: the
planner statically picks sort-merge (estimate too big to broadcast),
then AQE measures the materialized shuffle output of the filtered
side (~1% of orders here), sees it fits under
``spark.sql.adaptive.autoBroadcastJoinThreshold``, and swaps in a
broadcast-hash join — eliminating the fact-side shuffle sort at
runtime. Pinned on the executed adaptive plan: SortMergeJoin in the
initial plan, BroadcastHashJoin (and no SortMergeJoin) in the final
plan, with the join count verified against DuckDB."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from gostream_spark.io import load_table

_CONF = {
    # static threshold tiny -> initial plan is sort-merge; runtime
    # threshold generous -> AQE may rescue with a broadcast
    "spark.sql.autoBroadcastJoinThreshold": "1KB",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
}


def test_aqe_swaps_smj_for_broadcast_on_filtered_dim(spark, sf_dir):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > F.lit(490000))
            .select("o_orderkey")
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        got = joined.count()

        want = duckdb.sql(
            f"""
            SELECT count(*) FROM read_parquet('{sf_dir}/lineitem.parquet') l
            JOIN read_parquet('{sf_dir}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey
            WHERE o.o_totalprice > 490000
            """
        ).fetchone()[0]
        assert got == want and got > 0

        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final, _, initial = plan.partition("== Initial Plan ==")
        assert "SortMergeJoin" in initial
        assert "BroadcastHashJoin" in final and "SortMergeJoin" not in final, (
            final[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
