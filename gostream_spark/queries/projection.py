"""Stateless row transforms (SURVEY.md §2.2, P3/P5/P6; P1/P2/P4 are
exercised by the flagship query).

These are the reference's stateless bolts: 1→N emission (explode),
conditional branching, and null handling — all pure Column
expressions, so they stay inside whole-stage codegen and never leave
the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import register

# --- P3 flatMap / explode ----------------------------------------------

_P3_ORACLE = """
SELECT doc_id,
       generate_subscripts(toks, 1) - 1 AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 10 = 0)
"""


@register("explode_tokens", oracle=_P3_ORACLE, tags=("P3",))
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: flatMap — one row per token with its position (the
    reference's 1→N emitting bolt; the wordcount splitter). Explode is
    pipelined map-side: no shuffle, output partitioning inherited from
    the scan."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


# --- P5 conditional expression -----------------------------------------

_P5_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'large'
            WHEN o_totalprice >= 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'other' END AS status_name
FROM orders
"""


@register("conditional_case", oracle=_P5_ORACLE, tags=("P5",))
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: when/otherwise chains (searched CASE and simple CASE)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


# --- P6 null handling ---------------------------------------------------

_P6_ORACLE = """
WITH withnull AS (
  SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id,
       v IS NULL AS was_null,
       round(CAST(coalesce(v, 0.0) AS DOUBLE), 2) AS v_filled,
       round(CAST(coalesce(nullif(v, 0.0), -1.0) AS DOUBLE), 2) AS v_nullif
FROM withnull
"""


@register("null_handling", oracle=_P6_ORACLE, tags=("P6",))
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: isNull / coalesce / nullif over a constructed nullable
    column (the fixtures carry no NULLs, so 'error' events stand in
    for missing measurements)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        v.isNull().alias("was_null"),
        F.round(F.coalesce(v, F.lit(0.0)), 2).cast("double").alias("v_filled"),
        F.round(F.coalesce(F.nullif(v, F.lit(0.0)), F.lit(-1.0)), 2)
        .cast("double")
        .alias("v_nullif"),
    )


# --- P6 ext: safe/try arithmetic ----------------------------------------

_TRY_ORACLE = """
SELECT event_id,
       coalesce(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k_int,
       coalesce(CASE WHEN (event_id % 7) = 0 THEN NULL
                     ELSE round(CAST(value / (event_id % 7) AS DOUBLE), 4) END,
                -1.0) AS safe_div,
       (TRY_CAST('not a number' AS INTEGER) IS NULL) AS bad_cast_is_null
FROM events WHERE event_id < 2000
"""


@register("safe_arithmetic", oracle=_TRY_ORACLE, tags=("P6", "ext"))
def safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 ext: error-safe expressions — try_cast (malformed input →
    NULL, not a task failure) and try_divide (÷0 → NULL). At 100 TB a
    single dirty row must never kill a 10k-task stage; the try_*
    family is the row-level quarantine that keeps ANSI mode ON for
    everything else."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.k").try_cast("int"), F.lit(-1)
        ).alias("k_int"),
        F.coalesce(
            F.round(F.try_divide("value", F.col("event_id") % 7), 4).cast("double"),
            F.lit(-1.0),
        ).alias("safe_div"),
        F.lit("not a number").try_cast("int").isNull().alias("bad_cast_is_null"),
    )
