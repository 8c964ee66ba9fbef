"""Window functions, ranking, sort, limit, and set operators
(SURVEY.md §2.6, W1-W9).

Every analytic window here partitions by a key before sorting, so the
sort is per-partition (shuffle on the key + local sort) — linear-ish
at 100 TB. The two global-order queries (top-k, positional sort)
document their scale posture inline: `ORDER BY ... LIMIT k` is safe
(Spark takes per-partition top-k then merges k·p rows on the driver
side of the exchange); an unbounded global `row_number()` is NOT, and
is used only on a LIMIT-bounded subset here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.operators import ranking
from gostream_spark.parity import dec2, ts_str
from gostream_spark.registry import register

# --- W1 row_number / rank / dense_rank ---------------------------------

_W1_ORACLE = """
SELECT c_custkey, c_mktsegment, bucket,
       row_number() OVER (PARTITION BY c_mktsegment ORDER BY bucket DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY bucket DESC) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY bucket DESC) AS drnk
FROM (SELECT c_custkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket
      FROM customer)
"""


@register("window_rank", oracle=_W1_ORACLE, tags=("W1",))
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank per market segment over a
    bucketed balance (buckets create real ties, so rank vs dense_rank
    vs row_number genuinely differ; row_number's ordering adds the
    unique key so it stays deterministic under ties)."""
    customer = load_table(spark, sf_dir, "customer")
    bucketed = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bucket"),
    )
    by_bucket = Window.partitionBy("c_mktsegment").orderBy(F.col("bucket").desc())
    unique = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bucket").desc(), F.col("c_custkey")
    )
    return bucketed.select(
        "c_custkey",
        "c_mktsegment",
        "bucket",
        F.row_number().over(unique).alias("rn"),
        F.rank().over(by_bucket).alias("rnk"),
        F.dense_rank().over(by_bucket).alias("drnk"),
    )


# --- W1 wave 2: ntile / percent_rank / cume_dist / value-at-edge --------

_W1B_ORACLE = """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(c_custkey) OVER w AS seg_richest,
       last_value(c_custkey)
         OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS seg_poorest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@register("window_distribution", oracle=_W1B_ORACLE, tags=("W1", "W3"))
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 wave 2: distribution window functions — ntile buckets,
    percent_rank/cume_dist (single divisions of identical ints →
    deterministic), and first/last value over the full-partition
    frame (last_value needs the explicit unbounded-following frame;
    the default frame ends at the current row)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("seg_richest"),
        F.last("c_custkey").over(w_full).alias("seg_poorest"),
    )


# --- W2 lag / lead ------------------------------------------------------

_W2_ORACLE = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(CAST(value AS DOUBLE), 2) AS value,
       coalesce(round(CAST(lag(value)  OVER w AS DOUBLE), 2), -1.0) AS prev_value,
       coalesce(round(CAST(lead(value) OVER w AS DOUBLE), 2), -1.0) AS next_value,
       coalesce(lag(event_id) OVER w, -1) AS prev_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("window_lag_lead", oracle=_W2_ORACLE, tags=("W2",))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead along each user's event timeline (partition
    boundaries yield -1 sentinels instead of NULLs for hash
    stability)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts"),
        F.round(F.col("value"), 2).cast("double").alias("value"),
        F.coalesce(F.round(F.lag("value").over(w), 2).cast("double"), F.lit(-1.0)).alias(
            "prev_value"
        ),
        F.coalesce(F.round(F.lead("value").over(w), 2).cast("double"), F.lit(-1.0)).alias(
            "next_value"
        ),
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_event"),
    )


# --- W3 frame aggregates (running + range) ------------------------------

_W3_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS running_spend,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
FROM orders
"""


@register("window_running", oracle=_W3_ORACLE, tags=("W3",), bench=True)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running (cumulative) frame per customer — the classic
    running-total bolt. Decimal sum keeps the cumulative value exact
    at every prefix."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(dec2("o_totalprice")).over(w), 2).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


_W3_RANGE_ORACLE = """
SELECT o_orderkey, o_custkey, day_no,
       count(*) OVER (PARTITION BY o_custkey ORDER BY day_no
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_last_30d,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY day_no
                        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS spend_last_30d
FROM (SELECT o_orderkey, o_custkey, o_totalprice,
             date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_no
      FROM orders)
"""


@register("window_range_frame", oracle=_W3_RANGE_ORACLE, tags=("W3",))
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: value-range frame — per customer, orders and spend within
    the trailing 30 days of each order (event-time range expressed as
    epoch-day offsets so both engines share integer range
    arithmetic)."""
    orders = load_table(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    with_day = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", day_no.alias("day_no")
    )
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    return with_day.select(
        "o_orderkey",
        "o_custkey",
        "day_no",
        F.count(F.lit(1)).over(w).alias("orders_last_30d"),
        F.round(F.sum(dec2("o_totalprice")).over(w), 2).cast("double").alias("spend_last_30d"),
    )


# --- W4 top-k global ----------------------------------------------------

_W4_ORACLE = """
SELECT o_orderkey, o_custkey, round(CAST(o_totalprice AS DOUBLE), 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("topk_global", oracle=_W4_ORACLE, tags=("W4",))
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: global top-k. `orderBy().limit(k)` compiles to TakeOrdered:
    each partition keeps its local top-k and only k rows per partition
    merge — no global sort, safe at any scale. The unique-key tiebreak
    makes the selected rowset deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        ranking.topk(orders, 25, F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).cast("double").alias("total_price"),
        )
    )


# --- W5 top-k per group -------------------------------------------------

_W5_ORACLE = """
SELECT n_nationkey, c_custkey, c_name,
       round(CAST(c_acctbal AS DOUBLE), 2) AS acctbal, rn
FROM (
  SELECT n_nationkey, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rn <= 3
"""


@register("topk_per_group", oracle=_W5_ORACLE, tags=("W5",))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: top-3 customers by balance per nation via ranked window +
    filter. At extreme scale, pre-aggregate per partition (local
    top-k) before the window to cut shuffle volume; AQE's skew
    handling covers hot nations."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = customer.join(nation, customer.c_nationkey == nation.n_nationkey).select(
        "n_nationkey", "c_custkey", "c_name", "c_acctbal"
    )
    return (
        ranking.topk_per_group(
            joined,
            3,
            partition_by=["n_nationkey"],
            order_by=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        )
        .select(
            "n_nationkey",
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 2).cast("double").alias("acctbal"),
            "rn",
        )
    )


# --- W6 multi-key sort (order asserted via position column) -------------

_W6_ORACLE = """
SELECT pos, o_orderkey, o_orderpriority,
       round(CAST(o_totalprice AS DOUBLE), 2) AS total_price
FROM (
  SELECT row_number() OVER (ORDER BY o_orderpriority ASC, o_totalprice DESC,
                            o_orderkey ASC) AS pos,
         o_orderkey, o_orderpriority, o_totalprice
  FROM orders
) WHERE pos <= 100
"""


@register("sort_multi_key", oracle=_W6_ORACLE, tags=("W6",), bench=True)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: multi-key sort (asc/desc mix). The driver's hash is
    order-insensitive, so sort correctness is asserted by materializing
    the global position of each row. Routed through ``topk_ranked`` so
    the distributed step is TakeOrderedAndProject (per-partition heap +
    k·p merge) and the position window only ever sees the 100
    survivors — a full-table ``row_number().over(Window.orderBy(...))``
    here would funnel ALL of orders through one task (the scale-killer
    plan `tests/test_plans.py` pins against)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return ranking.topk_ranked(
        orders,
        100,
        F.col("o_orderpriority").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
        rank_col="pos",
    ).select(
        "pos",
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice"), 2).cast("double").alias("total_price"),
    )


# --- W7 union -----------------------------------------------------------

_W7_ORACLE = """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 8000
"""


@register("set_union", oracle=_W7_ORACLE, tags=("W7",))
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: UNION (distinct) of two key sets — union is free
    (partition concatenation); the distinct is one hash shuffle on the
    key."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    urgent_keys = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey")
    rich_keys = customer.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    return urgent_keys.union(rich_keys).distinct()


# --- W8 intersect / except ---------------------------------------------

_W8_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


@register("set_intersect", oracle=_W8_INTERSECT_ORACLE, tags=("W8",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: INTERSECT — customers who are both urgent-order placers and
    high-balance (planned as a left-semi hash join on the key)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    urgent_keys = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey")
    rich_keys = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return urgent_keys.intersect(rich_keys)


_W8_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


@register("set_except", oracle=_W8_EXCEPT_ORACLE, tags=("W8",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: EXCEPT — high-balance customers with no urgent orders
    (planned as a left-anti hash join)."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    urgent_keys = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey")
    rich_keys = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return rich_keys.exceptAll(urgent_keys.distinct()).distinct()


# --- W9 distinct --------------------------------------------------------

_W9_ORACLE = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
"""


@register("distinct_pairs", oracle=_W9_ORACLE, tags=("W9",))
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: distinct on a column subset — one hash aggregate on the
    pair; partial distinct runs map-side so the shuffle carries only
    unique pairs per partition."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select("c_mktsegment", "c_nationkey").dropDuplicates()


# --- W2 wave 2: inter-event gaps via lead -------------------------------

_W2B_ORACLE = """
WITH secs AS (
  -- truncate to whole epoch seconds BEFORE differencing, matching
  -- Spark's cast(timestamp as long) on the micros-truncated column
  SELECT user_id, ts, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), gaps AS (
  SELECT user_id,
         lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) - sec AS gap_sec
  FROM secs
)
SELECT CASE WHEN gap_sec < 60 THEN 'lt_1m'
            WHEN gap_sec < 3600 THEN 'lt_1h'
            WHEN gap_sec < 86400 THEN 'lt_1d'
            ELSE 'ge_1d' END AS gap_bucket,
       count(*) AS n_gaps,
       CAST(min(gap_sec) AS BIGINT) AS min_gap_sec,
       CAST(max(gap_sec) AS BIGINT) AS max_gap_sec
FROM gaps WHERE gap_sec IS NOT NULL
GROUP BY 1
"""


@register("event_gap_histogram", oracle=_W2B_ORACLE, tags=("W2",))
def event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 wave 2: time-to-next-event per user (lead over a per-user
    window) bucketed into a gap histogram — the idle-time analysis
    behind sessionization. The window partitions by user, so the sort
    is per-user-partition (bounded), and the histogram is a tiny hash
    aggregate after the window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.lead("ts").over(w).cast("long") - F.col("ts").cast("long")).alias("gap_sec")
    gaps = ev.select("user_id", gap).filter(F.col("gap_sec").isNotNull())
    bucket = (
        F.when(F.col("gap_sec") < 60, "lt_1m")
        .when(F.col("gap_sec") < 3600, "lt_1h")
        .when(F.col("gap_sec") < 86400, "lt_1d")
        .otherwise("ge_1d")
    )
    return gaps.groupBy(bucket.alias("gap_bucket")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_sec").cast("bigint").alias("min_gap_sec"),
        F.max("gap_sec").cast("bigint").alias("max_gap_sec"),
    )


# --- W2 ext: SCD2-style validity intervals ------------------------------

_SCD2_ORACLE = """
SELECT user_id,
       event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                         '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
WHERE user_id < 50
"""


@register("events_scd2_intervals", oracle=_SCD2_ORACLE, tags=("W2", "ext"))
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 ext: slowly-changing-dimension (type 2) interval build —
    each event opens a validity interval that the user's NEXT event
    closes (`lead` with a deterministic tie-break); the open interval
    gets the sentinel end and an is_current flag. This event-log →
    interval-table transform is how a warehouse derives point-in-time
    join targets (pair with J7's as-of join to query them). One
    shuffle on user_id; interval construction is a single pass."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_str("ts").alias("valid_from"),
        F.coalesce(ts_str(nxt), F.lit("9999-12-31 00:00:00")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --- W2/W3 ext: run-collapsed SCD2 (gaps-and-islands) -------------------

_SCD2_COLLAPSED_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type IS DISTINCT FROM
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events WHERE user_id < 50
), islands AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), spans AS (
  SELECT user_id, event_type AS state, island,
         min(ts) AS t_from, CAST(count(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, event_type, island
)
SELECT user_id, state,
       strftime(t_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(t_from) OVER (PARTITION BY user_id
                                            ORDER BY island),
                         '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       n_events,
       (lead(t_from) OVER (PARTITION BY user_id ORDER BY island) IS NULL)
         AS is_current
FROM spans
"""


@register("events_scd2_collapsed", oracle=_SCD2_COLLAPSED_ORACLE, tags=("W2", "W3", "ext"))
def events_scd2_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W3 ext: RUN-COLLAPSED SCD2 — the gaps-and-islands shape:
    consecutive same-state events merge into one validity interval
    (unlike `events_scd2_intervals`, where every event opens one).
    Change flag via lag -> island id via running sum of flags ->
    per-island collapse -> interval close via lead over islands. All
    four windows share the ONE user_id partitioning (the island
    ordering is a sub-order of the same exchange), so the whole
    transform costs a single shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
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
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_is = Window.partitionBy("user_id").orderBy("island")
    nxt = F.lead("t_from").over(w_is)
    return spans.select(
        "user_id",
        "state",
        ts_str("t_from").alias("valid_from"),
        F.coalesce(ts_str(nxt), F.lit("9999-12-31 00:00:00")).alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


# --- J6/J7 ext: point-in-time join against the SCD2 interval table ------

_PIT_ORACLE = """
WITH hist AS (
  SELECT * FROM events WHERE user_id < 50 AND event_type <> 'purchase'
), flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type IS DISTINCT FROM
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM hist
), islands AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), spans AS (
  SELECT user_id, event_type AS state, island, min(ts) AS t_from
  FROM islands GROUP BY user_id, event_type, island
), dim AS (
  SELECT user_id, state, t_from,
         coalesce(lead(t_from) OVER (PARTITION BY user_id ORDER BY island),
                  TIMESTAMP '9999-12-31 00:00:00') AS t_to
  FROM spans
)
SELECT p.event_id AS purchase_id, p.user_id, d.state AS state_at_purchase,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events
      WHERE user_id < 50 AND event_type = 'purchase') p
JOIN dim d
  ON p.user_id = d.user_id
 AND p.ts >= d.t_from AND p.ts < d.t_to
"""


@register("pit_join_state_at_purchase", oracle=_PIT_ORACLE, tags=("J6", "J7", "W2", "ext"))
def pit_join_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (feature-store) join: every purchase is enriched
    with the state the user was in AT that moment, by interval-
    containment against the run-collapsed SCD2 table built from the
    user's non-purchase history — the leakage-safe temporal join
    every feature platform ships (training rows must only see
    features as of the label time). The intervals PARTITION each
    user's timeline (half-open, sentinel-closed), so the containment
    match is unique per probe.

    Scale shape: the containment join is an EQUI-join on user_id with
    the interval bounds as residual filters — one hash shuffle per
    side on the same key, never a pairwise range explosion; the
    interval dim reuses the probe's partitioning. The as-of union
    trick (J7) computes the same answer when the dim is a changelog;
    this shape is what you run when the dim is already materialized
    as intervals."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hist = ev.filter(F.col("event_type") != "purchase")
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = hist.select(
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
    ).agg(F.min("ts").alias("t_from"))
    w_is = Window.partitionBy("user_id").orderBy("island")
    dim = spans.select(
        F.col("user_id").alias("d_user"),
        "state",
        "t_from",
        F.coalesce(
            F.lead("t_from").over(w_is), F.lit("9999-12-31 00:00:00").cast("timestamp")
        ).alias("t_to"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return (
        probes.join(
            dim,
            (probes.user_id == dim.d_user)
            & (probes.ts >= dim.t_from)
            & (probes.ts < dim.t_to),
        )
        .select(
            "purchase_id",
            "user_id",
            F.col("state").alias("state_at_purchase"),
            ts_str("ts").alias("purchase_ts"),
        )
    )


# --- W1 ext: distribution ranks (ntile / percent_rank / cume_dist) ------

_DIST_RANK_ORACLE = """
SELECT c_mktsegment, c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST(ntile(4) OVER w_u AS BIGINT) AS quartile,
       round(percent_rank() OVER w_t, 6) AS pct_rank,
       round(cume_dist() OVER w_t, 6) AS cume
FROM customer
WHERE c_custkey <= 300
WINDOW w_u AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
       w_t AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
"""


@register("window_distribution_ranks", oracle=_DIST_RANK_ORACLE, tags=("W1", "ext"))
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ext: the distribution-rank trio — ntile(4) buckets (over the
    tie-broken total order, so bucket membership is deterministic),
    percent_rank and cume_dist (over the VALUE order, where ties
    correctly share a rank — the two windows deliberately differ).
    percent_rank/cume_dist are exact rationals (k/n) in both engines;
    rounded to 6dp they compare bit-for-bit. Both window specs share
    the one c_mktsegment exchange — the sort is a sub-order, not a
    second shuffle."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    w_u = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_t = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        F.ntile(4).over(w_u).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w_t), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_t), 6).alias("cume"),
    )


# --- L1/W1 ext: CDC changelog -> snapshot materialization ---------------

_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id,
       event_type AS state,
       value_cents,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS updated_at
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@register("cdc_apply_changelog", oracle=_CDC_ORACLE, tags=("W1", "L1", "ext"))
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: materialize a keyed changelog into its current
    snapshot — latest version per key wins (ts, then event_id, the
    deterministic total order), and a trailing delete marker (the
    'error' type here) removes the key entirely. This is the MERGE
    INTO / Kafka-compacted-topic semantics every lakehouse table
    maintenance job runs, expressed as one window dedup: one shuffle
    on the key, no join — the upsert/delete branching is a post-rank
    filter. At 100 TB of changelog the same plan holds because rank-1
    extraction aggregates partial (WindowGroupLimit pushes the rn=1
    limit map-side)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "value_cents",
            ts_str("ts").alias("updated_at"),
        )
    )


# --- W3 ext: rolling event-time interval features -----------------------

_ROLLING_1H_ORACLE = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(count(*) OVER w AS BIGINT) AS events_last_1h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS value_cents_last_1h
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
# (floor(epoch): DuckDB's epoch() keeps fractional microseconds while
# Spark's unix_timestamp() floors to whole seconds — the frame edge
# must sit on the same integer grid in both engines.)


@register("rolling_interval_features", oracle=_ROLLING_1H_ORACLE, tags=("W3", "F2", "ext"))
def rolling_interval_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 ext: per-event trailing-1-hour features (event count, cent
    sum) via a RANGE frame over true event-time seconds — the online
    feature-engineering staple ("activity in the last hour at each
    moment"), which a ROWS frame cannot express because the lookback
    is temporal, not positional. Ties in epoch seconds are handled by
    RANGE semantics identically in both engines (peers aggregate
    together, so no tie-break is needed for determinism). One shuffle
    on user_id; the frame scan is a per-partition two-pointer sweep,
    linear at any scale. Money rides integer cents inside the frame
    sum so accumulation order cannot move a bit."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts"),
        F.count(F.lit(1)).over(w).cast("long").alias("events_last_1h"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .cast("long")
        .alias("value_cents_last_1h"),
    )
