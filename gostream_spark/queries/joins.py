"""Join operators (SURVEY.md §2.5, J1-J10).

The reference routes tuples between bolts with fields/all groupings;
a keyed two-input bolt is its join. Here every join is declarative —
Catalyst picks broadcast-hash vs sort-merge, and AQE re-plans at
runtime (skew split, broadcast demotion). 100 TB notes per query:

- Dimension tables (region/nation/supplier, `io.BROADCAST_DIMS`) are
  broadcast explicitly so the fact-table scan never shuffles for them.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key — both
  sides hash-partition on the key, which is the correct single-shuffle
  plan at any scale; bucketing both tables on the key would remove
  even that shuffle for repeated joins.
- The as-of join uses the union + running-last window form (one
  shuffle + one sort per user partition), NOT a pairwise time-range
  join, so its cost stays O(n log n) per key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.operators import asof_join
from gostream_spark.parity import TS_FMT_DUCK, dec2, ts_str
from gostream_spark.registry import register

# --- J1 inner equi-join ------------------------------------------------

_J1_ORACLE = """
SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
       round(CAST(o_totalprice AS DOUBLE), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("join_inner", oracle=_J1_ORACLE, tags=("J1",))
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join orders ⋈ customer on the customer key.

    customer is small relative to orders at every scale factor, so the
    broadcast hint keeps this a map-side join (no shuffle of orders).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round(F.col("o_totalprice"), 2).cast("double").alias("total_price"),
        )
    )


# --- J2 outer joins ----------------------------------------------------

_J2_LEFT_ORACLE = """
SELECT c_custkey, c_name,
       coalesce(o_orderkey, -1) AS big_orderkey,
       coalesce(round(CAST(o_totalprice AS DOUBLE), 2), -1.0) AS big_totalprice
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) big
  ON o_custkey = c_custkey
"""


@register("join_left_outer", oracle=_J2_LEFT_ORACLE, tags=("J2",))
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join — customers kept even with no qualifying
    order. Unmatched rows surface as -1 sentinels (not NULLs) so the
    cross-engine hash never depends on null-vs-NaN encodings."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        customer.join(big, big.o_custkey == customer.c_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("big_orderkey"),
            F.coalesce(F.round(F.col("o_totalprice"), 2).cast("double"), F.lit(-1.0)).alias(
                "big_totalprice"
            ),
        )
    )


_J2_FULL_ORACLE = """
WITH ord AS (
  SELECT o_custkey, count(*) AS order_cnt
  FROM orders GROUP BY o_custkey HAVING o_custkey % 3 = 0
), cust AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0
)
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       CASE WHEN c_custkey IS NULL THEN 'orders_only'
            WHEN o_custkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS side,
       coalesce(order_cnt, -1) AS order_cnt,
       coalesce(round(CAST(c_acctbal AS DOUBLE), 2), -1.0) AS acctbal
FROM cust FULL JOIN ord ON c_custkey = o_custkey
"""


@register("join_full_outer", oracle=_J2_FULL_ORACLE, tags=("J2",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join with unmatched rows on BOTH sides (the two
    inputs are restricted to different key residues so each side has
    keys the other lacks)."""
    ord_side = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .filter(F.col("o_custkey") % 3 == 0)
    )
    cust_side = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_acctbal")
    )
    joined = cust_side.join(ord_side, cust_side.c_custkey == ord_side.o_custkey, "full")
    return joined.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "orders_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
        .alias("side"),
        F.coalesce(F.col("order_cnt"), F.lit(-1)).alias("order_cnt"),
        F.coalesce(F.round(F.col("c_acctbal"), 2).cast("double"), F.lit(-1.0)).alias("acctbal"),
    )


# --- J3 semi / anti ----------------------------------------------------

_J3_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


@register("join_semi", oracle=_J3_SEMI_ORACLE, tags=("J3",))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left semi join — customers with ≥1 urgent order; emits each
    customer once (no fan-out), which is why semi beats inner+distinct
    at scale."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


_J3_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


@register("join_anti", oracle=_J3_ANTI_ORACLE, tags=("J3",))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left anti join — customers with no order above 400k."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- J4 broadcast dimension join --------------------------------------

_J4_ORACLE = """
SELECT r_name, n_name, count(*) AS customer_cnt,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("join_broadcast_dims", oracle=_J4_ORACLE, tags=("J4",))
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: explicit broadcast of the tiny dims (nation=25, region=5
    rows at every sf) — the fact side never shuffles; the only
    exchange is the final group-by, and partial aggregation collapses
    it to ~125 rows per partition first."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            F.round(F.sum(dec2("c_acctbal")), 2).cast("double").alias("total_acctbal"),
        )
    )


# --- J5 cross join -----------------------------------------------------

_J5_ORACLE = """
SELECT r_name, n_name, concat(r_name, '/', n_name) AS pair
FROM region CROSS JOIN nation
"""


@register("join_cross", oracle=_J5_ORACLE, tags=("J5",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: cross join of the two bounded dims (5×25 rows — the only
    place a cartesian product is acceptable; never cross-join a fact
    table at scale)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name", "n_name", F.concat_ws("/", "r_name", "n_name").alias("pair")
    )


# --- J6 non-equi (range) join ------------------------------------------

_J6_ORACLE = """
SELECT o_orderpriority, count(*) AS li_cnt,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
"""


@register("join_range", oracle=_J6_ORACLE, tags=("J6",))
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: non-equi join — lineitems shipped within 60 days of their
    order date. The equality on the order key carries the hash
    partitioning; the range predicate is evaluated post-match, so this
    stays a single-shuffle hash join (not a nested loop) at scale."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("li_cnt"),
            F.round(F.sum(dec2("l_extendedprice")), 2).cast("double").alias("total_price"),
        )
    )


# --- J7 as-of join -----------------------------------------------------

_J7_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS purchase_ts,
       click_id,
       strftime(click_ts, '{TS_FMT_DUCK}') AS click_ts
FROM tagged
WHERE event_type = 'purchase' AND click_id IS NOT NULL
"""


@register("join_asof", oracle=_J7_ORACLE, tags=("J7",), bench=True)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — for each purchase, the latest click by the
    same user at or before the purchase time.

    Implemented as union + running `last(ignorenulls)` window rather
    than a pairwise time-range join: one shuffle on user_id, one sort
    per partition — O(n log n) per key, no quadratic blow-up when a
    user has many events. This is the form that survives 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    joined = asof_join(
        ev,
        key="user_id",
        ts="ts",
        probe_filter=F.col("event_type") == "purchase",
        build_filter=F.col("event_type") == "click",
        carry=["event_id", "ts"],
    )
    return joined.filter(F.col("asof_event_id").isNotNull()).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        F.col("asof_event_id").alias("click_id"),
        ts_str("asof_ts").alias("click_ts"),
    )


_J7_TOL_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS purchase_ts,
       click_id,
       strftime(click_ts, '{TS_FMT_DUCK}') AS click_ts
FROM tagged
WHERE event_type = 'purchase' AND click_id IS NOT NULL
  AND ts - click_ts <= INTERVAL 6 HOUR
"""


_J7_FWD_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
           OVER w AS purchase_id,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER w AS purchase_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id AS click_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS click_ts,
       purchase_id,
       strftime(purchase_ts, '{TS_FMT_DUCK}') AS purchase_ts
FROM tagged
WHERE event_type = 'click' AND purchase_id IS NOT NULL
"""


@register("join_asof_forward", oracle=_J7_FWD_ORACLE, tags=("J7", "ext"))
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 forward direction: for each click, the EARLIEST purchase by
    the same user at or after the click — the conversion-attribution
    mirror of `join_asof` (pandas ``merge_asof(direction='forward')``).
    Same one-shuffle union+window plan, with the frame flipped to
    (current row, unbounded following) and ``first(ignorenulls)``
    instead of ``last``; the oracle mirrors the window form so tie
    ordering is pinned identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    joined = asof_join(
        ev,
        key="user_id",
        ts="ts",
        probe_filter=F.col("event_type") == "click",
        build_filter=F.col("event_type") == "purchase",
        carry=["event_id", "ts"],
        direction="forward",
    )
    return joined.filter(F.col("asof_event_id").isNotNull()).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts_str("ts").alias("click_ts"),
        F.col("asof_event_id").alias("purchase_id"),
        ts_str("asof_ts").alias("purchase_ts"),
    )


@register("join_asof_tolerance", oracle=_J7_TOL_ORACLE, tags=("J7", "ext"))
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 with a TOLERANCE bound (pandas ``merge_asof(tolerance=...)``
    semantics): the as-of match is kept only when the matched click is
    within 6 hours of the purchase — stale state must not attribute.

    The bound composes as a post-filter on the same O(n log n)
    union+window as-of plan: candidate clicks at-or-before the probe
    only get OLDER, so if the latest one is outside the tolerance all
    are, and filtering the single matched row is equivalent to
    bounding the search itself (the oracle proves it by bounding in
    SQL). At 100 TB the tolerance is also the state-retention story:
    the streaming form of this join only needs 6h of click state per
    key, not unbounded history.
    """
    ev = load_table(spark, sf_dir, "events")
    joined = asof_join(
        ev,
        key="user_id",
        ts="ts",
        probe_filter=F.col("event_type") == "purchase",
        build_filter=F.col("event_type") == "click",
        carry=["event_id", "ts"],
    )
    return (
        joined.filter(
            F.col("asof_event_id").isNotNull()
            & (F.col("asof_ts") >= F.col("ts") - F.expr("INTERVAL 6 HOURS"))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            F.col("asof_event_id").alias("click_id"),
            ts_str("asof_ts").alias("click_ts"),
        )
    )


# --- J8 multi-way star join (bench query) ------------------------------

_J8_ORACLE = """
SELECT n_name,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS li_cnt
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("join_star_revenue", oracle=_J8_ORACLE, tags=("J8",), bench=True)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: TPC-H-Q5-shaped star join — revenue per nation for one
    region and a two-year order window.

    Plan at scale: region+nation broadcast (map-side), customer joins
    nation broadcast-side, orders filtered by date BEFORE the join
    (predicate pushed to the parquet scan), then the one unavoidable
    fact-fact shuffle orders ⋈ lineitem on the order key. AQE coalesces
    the tiny post-aggregation exchanges.
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (dec2("l_extendedprice") * (1 - dec2("l_discount"))).cast("decimal(18,4)")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(disc_price), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("li_cnt"),
        )
    )


# --- J9 stream-static enrichment (batch-equivalent) ---------------------

_J9_ORACLE = """
SELECT event_id, event_type, c_name, c_mktsegment,
       round(CAST(value AS DOUBLE), 2) AS value
FROM events JOIN customer ON user_id = c_custkey
"""


@register("join_stream_static", oracle=_J9_ORACLE, tags=("J9",))
def join_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 (batch-equivalent): the stream-static enrichment join —
    events stream joined to the static customer dim on user key.
    The true streaming twin (readStream + broadcast static side) lives
    in ``gostream_spark.streaming``; semantics here are identical
    because a stream-static inner join is stateless per micro-batch.
    """
    ev = load_table(spark, sf_dir, "events")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    return ev.join(customer, ev.user_id == customer.c_custkey).select(
        "event_id",
        "event_type",
        "c_name",
        "c_mktsegment",
        F.round(F.col("value"), 2).cast("double").alias("value"),
    )


# --- J10 stream-stream time-bounded join (batch-equivalent) -------------

_J10_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
"""


@register("join_stream_stream", oracle=_J10_ORACLE, tags=("J10",))
def join_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 (batch-equivalent): time-bounded self-join — (purchase,
    click) pairs by the same user within the hour before the purchase.
    In streaming form both sides carry watermarks and the time bound
    caps join state; in batch the equality on user_id keys the single
    shuffle and the time bound filters post-match."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (p.p_user == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts <= p.p_ts)
    )
    return p.join(c, cond).select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


# --- Q14-shaped promo revenue share (part ⋈ lineitem) -------------------

_Q14_ORACLE = """
WITH j AS (
  SELECT p_type,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS dp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01')
SELECT CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN dp
                           ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
         AS promo_revenue,
       CAST(round(sum(dp), 2) AS DOUBLE) AS total_revenue,
       CAST(round(10000 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN dp
                                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                        / CAST(sum(dp) AS DOUBLE), 2) AS DOUBLE)
         AS promo_share_bp
FROM j
"""


@register("join_promo_share", oracle=_Q14_ORACLE, tags=("J1", "ext"))
def join_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo revenue share: one-month... here
    one-year shipdate slice of lineitem joined to part, conditional
    decimal aggregation, share as one double division of two exact
    decimal sums (deterministic — no float fold anywhere).

    Scale: the shipdate filter pushes to the lineitem scan; part is
    the midsize dimension — Catalyst broadcasts it under the
    threshold; past it, bucket both sides on the part key
    (tests/test_bucketing.py demonstrates the exchange-free form) or
    let AQE pick shuffle-hash. Exercises the last otherwise-unjoined
    fixture table (part ⋈ fact)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = (dec2("l_extendedprice") * (1 - dec2("l_discount"))).cast("decimal(18,4)")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_type", dp.alias("dp")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("dp")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    ))
    total = F.sum("dp")
    return j.agg(
        F.round(promo, 2).cast("double").alias("promo_revenue"),
        F.round(total, 2).cast("double").alias("total_revenue"),
        F.round(10000 * promo.cast("double") / total.cast("double"), 2)
        .cast("double")
        .alias("promo_share_bp"),
    )


# --- supplier revenue ranking (covers the supplier dim end to end) ------

_SUPP_REV_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
  FROM lineitem GROUP BY l_suppkey)
SELECT s_suppkey, s_name, n_name,
       CAST(round(CAST(s_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal,
       revenue, rn
FROM (
  SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal, rev.revenue,
         row_number() OVER (ORDER BY rev.revenue DESC, s.s_suppkey) AS rn
  FROM rev
  JOIN supplier s ON rev.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey)
WHERE rn <= 10
"""


@register("supplier_revenue_top", oracle=_SUPP_REV_ORACLE, tags=("J8", "W4", "ext"))
def supplier_revenue_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by lineitem revenue with nation context — the
    fact side aggregates FIRST (one shuffle on l_suppkey collapses
    600k rows to 100 supplier rows), THEN joins the broadcast
    supplier/nation dims, then TakeOrdered ranks the 100. Aggregating
    below the join is the order-of-operations rule that keeps the
    join input dimension-sized at 100 TB."""
    from gostream_spark.operators import topk_ranked

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(dec2("l_extendedprice") * (1 - dec2("l_discount"))), 2)
        .cast("double")
        .alias("revenue")
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = (
        rev.join(supp, rev.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(dec2("s_acctbal"), 2).cast("double").alias("acctbal"),
            "revenue",
        )
    )
    return topk_ranked(joined, 10, F.col("revenue").desc(), F.col("s_suppkey"))


# --- bucketed co-located fact-fact join ---------------------------------

_BUCKETED_ORACLE = """
SELECT o_orderpriority,
       count(*) AS li_cnt,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS gross
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("join_bucketed_fact_fact", oracle=_BUCKETED_ORACLE, tags=("J1", "ext"))
def join_bucketed_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeated-join optimization that matters most at 100 TB:
    both fact tables written BUCKETED on the join key
    (`bucketBy(8).sortBy`), then joined bucket-aligned — no per-join
    shuffle of either side; the only exchange is the 5-row final
    aggregate (asserted in tests/test_bucketing.py). Paying the
    bucketed write once amortizes over every subsequent orderkey
    join. Broadcast is disabled for the join so the plan demonstrates
    the bucket path, mirroring the right-side-too-big reality."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    to, tl = f"gs_b_orders_{tag}", f"gs_b_lineitem_{tag}"
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders.select("o_orderkey", "o_orderpriority").write.mode("overwrite").bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable(to)
    li.select("l_orderkey", "l_extendedprice").write.mode("overwrite").bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable(tl)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(to)
            .join(spark.table(tl), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("li_cnt"),
                F.round(F.sum(dec2("l_extendedprice")), 2)
                .cast("double")
                .alias("gross"),
            )
        )
        # materialize NOW, while the demo conf is active: the eager
        # checkpoint runs the bucket-aligned plan; the caller then
        # reads materialized blocks regardless of its own conf
        return joined.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # managed-table drop removes the warehouse files too — each
        # run writes fresh uniquely-named tables, no residue
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")


# --- J1/A5 ext: decorrelated scalar subquery (TPC-H Q17 shape) ----------

_Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_cents_sum,
         count(*) AS cnt
  FROM lineitem GROUP BY 1)
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE)
         AS avg_yearly,
       count(*) AS n_small
FROM lineitem l JOIN per_part p ON l.l_partkey = p.pk
WHERE l.l_partkey % 10 = 0
  AND 5 * CAST(round(l.l_quantity * 100, 0) AS BIGINT) * p.cnt < p.qty_cents_sum
"""


@register("small_quantity_revenue", oracle=_Q17_ORACLE, tags=("J1", "A5", "ext"))
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is
    below 20% of their part's average — the correlated scalar
    subquery, decorrelated by hand into (per-part aggregate) ⋈ (fact)
    exactly as Catalyst rewrites it. The threshold compares in exact
    integer arithmetic (5·qty_cents·cnt < Σqty_cents ⟺ qty < 0.2·avg)
    because a float avg differs between engines in the last ulp and
    would flip boundary rows. Two passes over lineitem with one
    shuffle each on l_partkey; AQE picks broadcast for the per-part
    side when the brand-style filter makes it small."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(qty_cents).cast("bigint").alias("qty_cents_sum"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    joined = li.filter(F.col("l_partkey") % 10 == 0).join(
        per_part, li.l_partkey == per_part.pk
    )
    small = joined.filter(
        F.lit(5) * qty_cents * F.col("cnt") < F.col("qty_cents_sum")
    )
    return small.agg(
        F.round(F.sum(dec2("l_extendedprice")) / 7.0, 2)
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )
