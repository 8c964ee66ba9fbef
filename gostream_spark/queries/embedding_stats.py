"""Embedding feature-store statistics (SURVEY.md §2.8 ext, L3-L5
support): per-dimension distribution profiling — the drift/health
check a vector pipeline runs before trusting an index build
(collapsed dimensions, scale drift, dead units).

Parity discipline: float32 components cast exactly to double, then
floored to integer micro-units BEFORE any cross-row sum (the
``unigram_logprob_quality`` pattern) — sums are exact integers, so
partial-aggregation order cannot perturb them; the only floats are
final single expressions, identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import register

_DIM_STATS_ORACLE = """
WITH ex AS (
  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), m AS (
  SELECT pos,
         CAST(floor(v * 1e6) AS BIGINT) AS vm,
         CAST(floor(v * v * 1e9) AS BIGINT) AS v2m
  FROM ex
)
SELECT pos,
       count(*) AS n,
       round(CAST(sum(vm) AS DOUBLE) / 1e6 / count(*), 6) AS mean_v,
       round(CAST(sum(v2m) AS DOUBLE) / 1e9 / count(*)
             - pow(CAST(sum(vm) AS DOUBLE) / 1e6 / count(*), 2), 6) AS var_v,
       round(CAST(min(vm) AS DOUBLE) / 1e6, 6) AS min_v,
       round(CAST(max(vm) AS DOUBLE) / 1e6, 6) AS max_v
FROM m GROUP BY pos
"""


@register("embedding_dim_stats", oracle=_DIM_STATS_ORACLE, tags=("L3", "A8", "ext"))
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance/range of the embedding space — the
    feature-store health profile (a near-zero-variance dimension is
    dead weight in every distance computation; a scale-drifted one
    dominates them). posexplode fans each vector into per-dimension
    (pos, value) rows map-side (dims derive from each row's own array
    — never a hardcoded width, so a 4-dim degenerate corpus and the
    64-dim fixture both profile correctly); one hash aggregate on pos
    follows — the output is |dims| rows at any corpus size. Components are floored to integer
    micro-units before summing, so partial-agg order is irrelevant;
    min/max floor first for the same reason (an exact integer order
    statistic)."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "v0"))
        .select(F.col("pos").cast("long").alias("pos"), F.col("v0").cast("double").alias("v"))
    )
    m = ex.select(
        "pos",
        F.floor(F.col("v") * 1e6).cast("long").alias("vm"),
        F.floor(F.col("v") * F.col("v") * 1e9).cast("long").alias("v2m"),
    )
    n = F.count(F.lit(1))
    mean_raw = F.sum("vm").cast("double") / 1e6 / n
    ex2_raw = F.sum("v2m").cast("double") / 1e9 / n
    return m.groupBy("pos").agg(
        n.alias("n"),
        F.round(mean_raw, 6).alias("mean_v"),
        F.round(ex2_raw - F.pow(mean_raw, 2), 6).alias("var_v"),
        F.round(F.min("vm").cast("double") / 1e6, 6).alias("min_v"),
        F.round(F.max("vm").cast("double") / 1e6, 6).alias("max_v"),
    )
