"""Iterative algorithm pattern (SURVEY §5.2: non-SQL-expressible →
rows-only): Lloyd's k-means refinement over the embedding corpus.

The loop state (k centroids, k ≤ 10) lives on the driver and is
re-broadcast each iteration — the data never leaves executors and is
re-scanned once per iteration. That is the canonical Spark shape for
iterative ML: O(iterations) scans, O(k·dim) driver state, nothing
quadratic, no row collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.functions import cosine_similarity
from gostream_spark.io import load_table
from gostream_spark.registry import register


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (broadcast k rows; rounding + id
    tiebreak keep it deterministic under any partitioning)."""
    cos = F.round(cosine_similarity(F.col("embedding"), F.col("cv")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "c_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "c_id")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroids = per-cluster element means, decimal-routed and
    rounded so partition order can't move a bit."""
    elems = assigned.select(
        "c_id", F.posexplode("embedding").alias("pos0", "v")
    ).select("c_id", (F.col("pos0") + 1).alias("pos"), "v")
    cent_elems = elems.groupBy("c_id", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("double").cast("decimal(18,7)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c")
    )
    return cent_elems.groupBy("c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("cv")
    )


@register("kmeans_refined_clusters", oracle=None, tags=("L5", "ext"))
def kmeans_refined_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations from the per-label seed centroids; output
    is the final cluster census (id, member count, mean similarity to
    the centroid). Deterministic end-to-end (decimal centroid sums,
    rounded similarities, id tiebreaks) but 2-iteration k-means is not
    SQL-expressible at reasonable cost — rows-only by design, with
    invariants pinned in tests/test_rows_only.py."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = load_table(spark, sf_dir, "embeddings")
    elems = seeds.select("label", F.posexplode("embedding").alias("pos0", "v")).select(
        F.col("label").alias("c_id"), (F.col("pos0") + 1).alias("pos"), "v"
    )
    cent_elems = elems.groupBy("c_id", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("double").cast("decimal(18,7)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c")
    )
    centroids = cent_elems.groupBy("c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("cv")
    )
    for _ in range(2):
        assigned = _assign(emb, centroids)
        centroids = _recompute(assigned)
    final = _assign(emb, centroids)
    cos = F.round(cosine_similarity(F.col("embedding"), F.col("cv")), 6)
    return (
        final.join(F.broadcast(centroids), "c_id")
        .select("c_id", "vec_id", cos.alias("cos"))
        .groupBy("c_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum(F.col("cos").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1)), 4).alias("mean_cos"),
        )
    )
