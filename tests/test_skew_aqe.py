"""AQE skew-join splitting (SCALE.md joins section): the runtime
complement to the manual salting in `skew_salted_agg`. When one join
key dominates (here 90% of the left rows share key 0), the shuffle
partition holding that key becomes the straggler that serializes the
whole stage at 100 TB. With AQE skew-join enabled, Spark measures the
materialized shuffle stage, detects the oversized partition, and
splits it across many tasks (replicating the matching right-side
rows) — no query rewrite needed. Pinned here on the executed adaptive
plan: `SortMergeJoin(skew=true)` with a skewed `AQEShuffleRead`, plus
an exact output-count check that the split does not duplicate or drop
rows."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    # force SMJ so the question is split-vs-straggle, not broadcast
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # fixture-scale thresholds; production defaults (256MB / 5x median)
    # encode the same policy at cluster scale
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
}


def test_salted_join_spreads_hot_key_and_stays_exact(spark):
    """The manual-salting complement to the AQE test below: the salted
    join must (a) return exactly the direct join's rows and (b) spread
    the hot key across (nearly) all salt_n reducers — pinned by
    counting distinct salts assigned to hot-key rows and by the join
    key in the physical plan including the salt column."""
    from gostream_spark.operators.skew import salted_join

    left = spark.range(0, 100_000).withColumn(
        "k", F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 25)
    )
    right = (
        spark.range(0, 25)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
        .hint("shuffle_hash")
    )
    out = salted_join(left, right, "k", salt_n=16)
    # exactness: every left row matches exactly one right row
    assert out.count() == 100_000
    direct = left.join(right, "k")
    assert out.select("id", "k", "v").exceptAll(direct.select("id", "k", "v")).count() == 0
    # the join key carries the salt, so the hot key hashes to salt_n buckets
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__gs_salt" in plan
    # runtime spread: hot-key rows land on >= 12 of the 16 salts
    salted = left.withColumn("__gs_salt", (F.rand(seed=42) * 16).cast("int"))
    spread = salted.filter(F.col("k") == 0).select("__gs_salt").distinct().count()
    assert spread >= 12, spread


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    try:
        # 90% of left rows collapse onto key 0; sha2 pad keeps the
        # shuffle bytes incompressible so size-based detection sees
        # the skew even at fixture scale. Right keys are unique, so
        # the expected join count is exact arithmetic:
        #   key 0: 450_000 left rows x 1 right row
        #   keys id (id%10==9, id<100_000): 10_000 matches
        left = (
            spark.range(0, 500_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")),
            )
            .withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(0, 100_000).withColumnRenamed("id", "k").withColumn(
            "v", F.sha2(F.col("k").cast("string"), 256)
        )
        joined = left.join(right, "k")
        assert joined.count() == 460_000
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final[:2000]
        assert "skewed" in final.split("ShuffleQueryStage 0")[0].rsplit(
            "AQEShuffleRead", 1
        )[-1]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_rejects_outer_joins(spark):
    """Right/full outer through a replicated build side would emit one
    unmatched row PER REPLICA — the operator must refuse."""
    import pytest

    from gostream_spark.operators.skew import salted_join

    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full_outer")
