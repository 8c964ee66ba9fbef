"""Composed analytics demos — end-user queries built entirely from
the engine's primitives (the 'would a reference user switch?' test):
conversion funnel, N-day retention, per-segment event mix. Each is a
multi-operator composition (joins + windows + event-time buckets)
with an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import TS_FMT_DUCK, ts_str
from gostream_spark.registry import register

# --- signup -> purchase funnel ------------------------------------------

_FUNNEL_ORACLE = f"""
WITH first_signup AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), converted AS (
  SELECT DISTINCT s.user_id
  FROM first_signup s JOIN events p
    ON p.user_id = s.user_id
   AND p.event_type = 'purchase'
   AND p.ts >= s.signup_ts
   AND p.ts <= s.signup_ts + INTERVAL 7 DAY
)
SELECT strftime(date_trunc('day', s.signup_ts), '{TS_FMT_DUCK}') AS signup_day,
       count(*) AS signups,
       count(c.user_id) AS converted_7d
FROM first_signup s LEFT JOIN converted c ON s.user_id = c.user_id
GROUP BY 1
"""


@register("funnel_signup_purchase", oracle=_FUNNEL_ORACLE, tags=("demo", "J6", "T1"))
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: per signup-day cohort, how many users made a purchase
    within 7 days of their FIRST signup — first-event aggregation +
    time-bounded self-join + daily bucketing. Scale: both joins key on
    user_id (one shuffle each side); the time bound caps the pair
    fan-out."""
    ev = load_table(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_signup.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
        )
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    return (
        first_signup.join(converted, "user_id", "left")
        .groupBy(ts_str(F.date_trunc("day", F.col("signup_ts"))).alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("signups"),
            F.count("is_conv").alias("converted_7d"),
        )
    )


# --- 7-day retention ----------------------------------------------------

_RETENTION_ORACLE = f"""
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT strftime(a.day, '{TS_FMT_DUCK}') AS day,
       count(*) AS active_users,
       count(b.user_id) AS retained_7d
FROM active a
LEFT JOIN active b
  ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 7 DAY
GROUP BY 1
"""


@register("retention_7d", oracle=_RETENTION_ORACLE, tags=("demo", "J2", "W9"))
def retention_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: of users active on day D, how many were also active on
    D+7 — distinct (user, day) grid self-joined with a +7d key shift.
    One distinct shuffle + one join shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    later = active.select(
        F.col("user_id").alias("b_user"),
        (F.col("day") - F.expr("INTERVAL 7 DAYS")).alias("b_day_minus7"),
    )
    return (
        active.join(
            later,
            (F.col("b_user") == F.col("user_id")) & (F.col("b_day_minus7") == F.col("day")),
            "left",
        )
        .groupBy(ts_str("day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count("b_user").alias("retained_7d"),
        )
    )


# --- per-segment event mix ----------------------------------------------

_MIX_ORACLE = """
SELECT c_mktsegment, event_type,
       count(*) AS event_cnt,
       CAST(floor(CAST(count(*) AS DOUBLE) * 10000
                  / sum(count(*)) OVER (PARTITION BY c_mktsegment)) AS BIGINT)
         AS pct_bp_of_segment
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""


@register("segment_event_mix", oracle=_MIX_ORACLE, tags=("demo", "J9", "W3"))
def segment_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: event-type mix per customer segment with a windowed
    share-of-segment in basis points — broadcast enrich + hash
    aggregate + partition-window normalization. floor of a single
    exact division (not a rounded percentage: count ratios hit
    round-half boundaries where the engines' rounding modes
    disagree)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    counts = (
        ev.join(customer, ev.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
    w = Window.partitionBy("c_mktsegment")
    return counts.select(
        "c_mktsegment",
        "event_type",
        "event_cnt",
        F.floor(
            F.col("event_cnt").cast("double") * 10000 / F.sum("event_cnt").over(w)
        )
        .cast("bigint")
        .alias("pct_bp_of_segment"),
    )
