"""Ordered-sequence (funnel / pattern) analytics over the events table
— the product-analytics workload a streaming engine's CEP/pattern API
serves, re-expressed Spark-first (SURVEY.md §2.8 L8 depth + §2.4/W2).

The greedy earliest-completion funnel (step k's timestamp = the
earliest step-k event strictly after step k-1's timestamp) is the
standard funnel semantic. The Spark-native trick: instead of one
sequential self-join per step (k shuffles), ONE shuffle on user_id
collects each step's event times into per-user arrays, and the greedy
chain is then a pure JVM-side expression — `array_min(filter(arr,
x -> x > prev))` per step — inside a single projection. At 100 TB the
cost is one hash partition of events by user plus per-user arrays
bounded by that user's event count (the same bound any sessionization
carries); no step-count-proportional shuffle chain, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import register

# --- Greedy 3-step funnel: view -> click -> purchase --------------------

_FUNNEL_ORACLE = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
     s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id),
     s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id)
SELECT funnel_step, n_users FROM (
  SELECT 1 AS funnel_step, (SELECT count(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, (SELECT count(*) FROM s3)
)
"""


@register("funnel_single_pass", oracle=_FUNNEL_ORACLE, tags=("L8", "F5", "A1"), bench=True)
def funnel_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy earliest-completion funnel view -> click -> purchase:
    per user, t1 = first view, t2 = first click strictly after t1,
    t3 = first purchase strictly after t2; report how many users
    reach each step. One shuffle (groupBy user_id) collects the three
    step-timestamp arrays; the sequential chain — which a naive
    engine runs as two more self-joins — is JVM-side array algebra in
    a single projection. The oracle IS the naive three-join chain, so
    the collapse is verified exact. The registered
    ``funnel_three_step`` (analytics_demo) keeps the join-chain plan
    — one shuffle per step; this is its O(1)-shuffle scale twin."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchases"),
    )
    t2 = F.array_min(F.filter("clicks", lambda x: x > F.col("t1")))
    chained = per_user.withColumn("t2", t2).withColumn(
        "t3", F.array_min(F.filter("purchases", lambda x: x > F.col("t2")))
    )
    counts = chained.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    return counts.selectExpr(
        "stack(3, 1, c1, 2, c2, 3, c3) AS (funnel_step, n_users)"
    ).select(F.col("funnel_step"), F.col("n_users"))


# --- Pattern detection: purchase preceded by an error (no view between) -

_PATTERN_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
SELECT user_id, event_id AS purchase_event_id,
       CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_sec
FROM ordered
WHERE event_type = 'purchase' AND prev_type = 'error'
"""


@register("pattern_error_then_purchase", oracle=_PATTERN_ORACLE, tags=("W2", "L8"))
def pattern_error_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair pattern detection (the simplest CEP shape —
    MATCH_RECOGNIZE's `A B` over a per-user ordered stream): purchases
    whose IMMEDIATELY preceding event for that user was an error,
    with the gap in seconds. lag() over (user_id, ts, event_id) is
    one shuffle, deterministic under ts ties via the event_id
    tie-break; the same plan Flink's CEP compiles two-state patterns
    into when run over a keyed, ordered log."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return ordered.filter(
        (F.col("event_type") == "purchase") & (F.col("prev_type") == "error")
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .cast("long")
        .alias("gap_sec"),
    )


# --- Variable-length pattern: >=2 consecutive errors, then purchase -----

_BURST_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type IS DISTINCT FROM
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events
), islands AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), spans AS (
  SELECT user_id, event_type AS state, island,
         min(ts) AS t_from, max(ts) AS t_to,
         CAST(count(*) AS BIGINT) AS run_len
  FROM islands GROUP BY user_id, event_type, island
), seq AS (
  SELECT user_id, state, run_len, t_to,
         lead(state) OVER w AS next_state,
         lead(t_from) OVER w AS next_from
  FROM spans
  WINDOW w AS (PARTITION BY user_id ORDER BY island)
)
SELECT user_id, run_len AS n_errors,
       strftime(t_to, '%Y-%m-%d %H:%M:%S') AS last_error_ts,
       strftime(next_from, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM seq
WHERE state = 'error' AND run_len >= 2 AND next_state = 'purchase'
"""


@register("pattern_error_burst_recovery", oracle=_BURST_ORACLE, tags=("W2", "W3", "L8", "ext"))
def pattern_error_burst_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-length pattern matching — MATCH_RECOGNIZE's `A B+ C`
    shape (here: a run of >=2 consecutive errors immediately followed
    by a purchase), which fixed-offset lag/lead cannot express because
    the middle element is unbounded. The gaps-and-islands machinery
    turns runs into single span rows, and the pattern collapses to a
    FIXED-length adjacency over spans (error-span with run_len >= 2,
    next span is a purchase) — one lead() away. Everything rides one
    user_id exchange; run compression makes the per-user sequence
    shorter, not longer, so this scales strictly better than the raw
    event stream it reads."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w_ev)), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    islands = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w_ev.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = islands.groupBy(
        "user_id", F.col("event_type").alias("state"), "island"
    ).agg(
        F.min("ts").alias("t_from"),
        F.max("ts").alias("t_to"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    w_is = Window.partitionBy("user_id").orderBy("island")
    seq = spans.select(
        "user_id",
        "state",
        "run_len",
        "t_to",
        F.lead("state").over(w_is).alias("next_state"),
        F.lead("t_from").over(w_is).alias("next_from"),
    )
    from gostream_spark.parity import ts_str

    return seq.filter(
        (F.col("state") == "error")
        & (F.col("run_len") >= 2)
        & (F.col("next_state") == "purchase")
    ).select(
        "user_id",
        F.col("run_len").alias("n_errors"),
        ts_str("t_to").alias("last_error_ts"),
        ts_str("next_from").alias("purchase_ts"),
    )
