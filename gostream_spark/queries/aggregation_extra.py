"""Second-wave aggregation coverage (SURVEY.md §2.4 A2/A3/A6/A8):
distinct-argument arithmetic, percentile spreads, and arg-extreme
(min_by/max_by) aggregates — the forms a reference user reaches for
right after the basics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import dec2
from gostream_spark.registry import register

# --- A2/A3 wave 2: distinct-argument aggregates --------------------------

_DISTINCT_ARITH_ORACLE = """
SELECT count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
       CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_distinct_qty,
       count(*) AS li_cnt
FROM lineitem
"""


@register("agg_distinct_arith", oracle=_DISTINCT_ARITH_ORACLE, tags=("A2", "A3"))
def agg_distinct_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3 wave 2: global distinct-argument aggregates — single- and
    multi-column exact count distinct plus sum(DISTINCT). Catalyst
    plans each distinct as its own two-phase expand+aggregate; the
    expand happens map-side so the shuffle still carries only
    (distinct-key) rows, not the fact table. All key columns are
    non-null in the fixture, so Spark's and SQL's null-tuple rules
    coincide."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_suppkey", "l_partkey").alias("n_supp_part"),
        F.sum_distinct(dec2("l_quantity")).cast("double").alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("li_cnt"),
    )


# --- A8 wave 2: percentile spread ----------------------------------------

_PCTL_SPREAD_ORACLE = """
SELECT l_linestatus,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS price_p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS price_p75,
       round(quantile_cont(l_extendedprice, 0.75)
             - quantile_cont(l_extendedprice, 0.25), 4) AS price_iqr,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
FROM lineitem GROUP BY l_linestatus
"""


@register("agg_percentile_spread", oracle=_PCTL_SPREAD_ORACLE, tags=("A8",))
def agg_percentile_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 wave 2: quartile spread + tail percentile per group. Exact
    linear-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`); at 100 TB swap in `approx_percentile`'s
    mergeable sketch — same query shape, one pass, bounded error."""
    li = load_table(spark, sf_dir, "lineitem")
    p = lambda q: F.percentile("l_extendedprice", F.lit(q))
    return li.groupBy("l_linestatus").agg(
        F.round(p(0.25), 4).alias("price_p25"),
        F.round(p(0.50), 4).alias("price_p50"),
        F.round(p(0.75), 4).alias("price_p75"),
        F.round(p(0.75) - p(0.25), 4).alias("price_iqr"),
        F.round(p(0.99), 4).alias("price_p99"),
    )


# --- A6/A8 wave 2: arg-extreme aggregates (min_by / max_by) --------------

# Tie-proof ordering key: totalprice in exact cents, orderkey as the
# deterministic tie-break — a single BIGINT both engines compute
# identically (cents <= ~5e9 at sf1, x 1e7 fits bigint comfortably).
_ARG_EXTREMES_ORACLE = """
WITH keyed AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
           * 10000000 + o_orderkey AS ordkey
  FROM orders
)
SELECT o_custkey,
       arg_max(o_orderkey, ordkey) AS biggest_order,
       round(CAST(max(o_totalprice) AS DOUBLE), 2) AS biggest_total,
       arg_min(o_orderkey, ordkey) AS smallest_order,
       round(CAST(min(o_totalprice) AS DOUBLE), 2) AS smallest_total,
       count(*) AS order_cnt
FROM keyed
GROUP BY o_custkey
HAVING count(*) >= 5
"""


@register("agg_arg_extremes", oracle=_ARG_EXTREMES_ORACLE, tags=("A6", "A8"))
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 wave 2: arg-extreme aggregates — which order was the
    customer's biggest/smallest (Spark `max_by`/`min_by`, DuckDB
    `arg_max`/`arg_min`). One hash aggregate, no join or window —
    the cheap alternative to a row_number() top-1 when only the
    extreme row's single attribute is needed. The ordering key builds
    the tie-break INTO the value (exact cents, then orderkey) so
    both engines pick the same row even on equal totals."""
    orders = load_table(spark, sf_dir, "orders")
    # STRUCT ordering key (cents, orderkey): lexicographically equal
    # to the oracle's folded BIGINT wherever the fold is in range, and
    # overflow-free at any scale (a folded slot wide enough for cents
    # * W + orderkey runs out of BIGINT near sf ~15k — r9 advice).
    ordkey = F.struct(
        F.round(dec2("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    keyed = orders.select("o_custkey", "o_orderkey", "o_totalprice", ordkey.alias("ordkey"))
    return (
        keyed.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "ordkey").alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("biggest_total"),
            F.min_by("o_orderkey", "ordkey").alias("smallest_order"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("smallest_total"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
        .filter(F.col("order_cnt") >= 5)
    )


# --- A8 ext: value histogram via width_bucket ---------------------------

_HISTOGRAM_ORACLE = """
SELECT event_type,
       CASE WHEN value < 0 THEN 0
            WHEN value >= 500 THEN 11
            ELSE CAST(floor(value / 50) + 1 AS BIGINT) END AS bucket,
       count(*) AS n
FROM events WHERE value IS NOT NULL
GROUP BY event_type, bucket
"""


@register("agg_value_histogram", oracle=_HISTOGRAM_ORACLE, tags=("A8", "ext"))
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 ext: fixed-width value histogram per event type —
    ``width_bucket`` bins map-side, then one partial→final count
    aggregate; the distributed histogram shape that replaces exact
    percentiles when 100 TB only needs the distribution's form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
            .cast("long")
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- A8 ext: approx percentile (guarantee shape; exact twin = agg_percentile_spread)

_APPROX_PCTL_ORACLE = """
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p95_ok,
       CAST(1 AS BIGINT) AS p99_ok
FROM events
GROUP BY event_type
"""


@register("agg_approx_percentile", oracle=_APPROX_PCTL_ORACLE, tags=("A8", "ext"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 ext: sketch-based percentile (Greenwald-Khanna via Spark's
    approx_percentile) — the mergeable-sketch path that replaces the
    exact sort-based percentile at 100 TB. Raw sketch outputs are
    engine-specific, so the GUARANTEE shape makes this exact-
    checkable: for each quantile q the verdict asserts GK's actual
    contract — the estimate's rank brackets q within eps = 1/accuracy
    (plus the discrete mass of the estimate's own value; value-space
    tolerance would mis-test a sparse tail). Verification joins the
    per-group estimates (a tiny broadcast) back onto one extra scan —
    the inherent cost of checking a rank guarantee. The EXACT twin
    `agg_percentile_spread` covers the percentile values themselves."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("pcts"),
            F.count("value").alias("n"),
        )
        .select(
            "event_type",
            F.element_at("pcts", 1).alias("e50"),
            F.element_at("pcts", 2).alias("e95"),
            F.element_at("pcts", 3).alias("e99"),
            "n",
        )
    )
    # Null-safe join key: groupBy keeps a NULL event_type group, so
    # the verification join must match it too (plain equi-join would
    # silently drop the NULL group the oracle still emits).
    j = ev.join(
        F.broadcast(stats).withColumnRenamed("event_type", "_et"),
        F.col("event_type").eqNullSafe(F.col("_et")),
    ).drop("_et")
    aggs = [F.first("n").alias("n")]
    for q, c in ((0.5, "e50"), (0.95, "e95"), (0.99, "e99")):
        aggs += [
            F.sum(F.when(F.col("value") < F.col(c), 1).otherwise(0)).alias(f"below_{c}"),
            F.sum(F.when(F.col("value") <= F.col(c), 1).otherwise(0)).alias(f"at_{c}"),
            F.max(F.col(c).isNull().cast("int")).alias(f"null_{c}"),
        ]
    g = j.groupBy("event_type").agg(*aggs)

    def ok(q: float, c: str) -> Column:
        eps = F.col("n") / 10000.0 + 1.0
        in_bracket = (F.col(f"below_{c}") - eps <= q * F.col("n")) & (
            q * F.col("n") <= F.col(f"at_{c}") + eps
        )
        # All-NULL group: the sketch returns NULL — trivially OK.
        return (in_bracket | (F.col(f"null_{c}") == 1)).cast("long")

    return g.select(
        "event_type",
        "n",
        ok(0.5, "e50").alias("p50_ok"),
        ok(0.95, "e95").alias("p95_ok"),
        ok(0.99, "e99").alias("p99_ok"),
    )


# --- A7 ext: GROUPING() disambiguation ----------------------------------

_GROUPING_ID_ORACLE = """
SELECT coalesce(o_orderstatus, '(data-null)') AS status,
       coalesce(o_orderpriority, '(data-null)') AS priority,
       CAST(grouping(o_orderstatus) AS BIGINT) AS status_rolled,
       CAST(grouping(o_orderpriority) AS BIGINT) AS priority_rolled,
       count(*) AS order_cnt
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("agg_rollup_grouping_id", oracle=_GROUPING_ID_ORACLE, tags=("A7", "ext"))
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 ext: GROUPING() disambiguation — in a rollup, a NULL key can
    mean 'the subtotal row' OR 'the data really was NULL'; grouping()
    is the bit that tells them apart (the correctness detail naive
    rollup consumers get wrong). Identical GROUP BY ROLLUP text runs
    on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("status_rolled"),
            F.grouping("o_orderpriority").cast("long").alias("priority_rolled"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(data-null)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(data-null)")).alias("priority"),
            "status_rolled",
            "priority_rolled",
            "order_cnt",
        )
    )


# --- part price-band stats (covers p_retailprice) -----------------------

_PART_BANDS_ORACLE = """
SELECT p_brand,
       CASE WHEN p_retailprice < 1000 THEN 'budget'
            WHEN p_retailprice < 1500 THEN 'mid' ELSE 'premium' END AS band,
       count(*) AS n_parts,
       CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price,
       CAST(min(p_size) AS INTEGER) AS min_size,
       CAST(max(p_size) AS INTEGER) AS max_size
FROM part GROUP BY 1, 2
"""


@register("part_price_bands", oracle=_PART_BANDS_ORACLE, tags=("A1", "P5", "ext"))
def part_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension profiling: price-band segmentation of the part table
    (CASE banding + decimal totals per brand/band) — the
    select-and-describe pass a mix designer runs before choosing join
    filters. Map-side banding, one partial→final aggregate."""
    part = load_table(spark, sf_dir, "part")
    band = (
        F.when(F.col("p_retailprice") < 1000, "budget")
        .when(F.col("p_retailprice") < 1500, "mid")
        .otherwise("premium")
    )
    return part.groupBy("p_brand", band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum(dec2("p_retailprice")), 2).cast("double").alias("total_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


# --- A8/W1 ext: equi-depth histogram ------------------------------------

_EQUIDEPTH_ORACLE = """
WITH b AS (
  SELECT event_type, value,
         ntile(8) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events WHERE value IS NOT NULL)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       count(*) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM b GROUP BY 1, 2
"""


@register("agg_equidepth_bins", oracle=_EQUIDEPTH_ORACLE, tags=("A8", "W1", "ext"))
def agg_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile bins): ntile(8) per event type,
    then per-bin count and value range — the distribution summary
    behind percentile features and drift monitors, complementing the
    equi-WIDTH `agg_value_histogram`. Ties broken by event_id so bin
    assignment is deterministic in both engines. At 100 TB the ntile
    sort becomes approx_percentile cut points + a row-local
    width_bucket against them (sketch-then-bucket), trading exactness
    for a shuffle-free second pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.select("event_type", "value", F.ntile(8).over(w).alias("bin"))
    return b.groupBy("event_type", F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


# --- A9/plan: multi-consumer DAG over ONE shuffle (ReusedExchange) ------

_BAND_REUSE_ORACLE = """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_orderkey)
SELECT band, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(rev_cents) AS BIGINT) AS band_cents
FROM (SELECT CASE WHEN rev_cents > 2000000 THEN 'high' ELSE 'low' END AS band,
             rev_cents
      FROM rev)
GROUP BY band
"""


@register("agg_branch_reused_exchange", oracle=_BAND_REUSE_ORACLE, tags=("A9", "ext"))
def agg_branch_reused_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 ext: a BRANCHING consumer DAG over one aggregate — the
    per-order revenue subplan feeds two filtered branches that union
    back. For a single boolean band the one-pass ``when()`` form is
    the first-choice shape (cf. part_price_bands); this query exists
    to pin Spark's EXCHANGE REUSE for genuinely multi-consumer
    pipelines (train/val splits, audit + export forks): the physical
    plan materializes the orderkey shuffle ONCE and the second branch
    reads it as ReusedExchange — the property (pinned in
    tests/test_plans.py) that makes fork-shaped pipelines pay one
    shuffle, not one per consumer, at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("rev_cents")
    )
    cut = 2_000_000
    hi = rev.filter(F.col("rev_cents") > cut).select(
        F.lit("high").alias("band"), "rev_cents"
    )
    lo = rev.filter(F.col("rev_cents") <= cut).select(
        F.lit("low").alias("band"), "rev_cents"
    )
    return hi.unionByName(lo).groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("rev_cents").alias("band_cents"),
    )


# --- Weighted median ----------------------------------------------------

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(round(l_quantity) AS BIGINT) AS wt,
         l_orderkey, l_linenumber
  FROM lineitem
), cum AS (
  SELECT l_suppkey, price_cents, wt,
         sum(wt) OVER (PARTITION BY l_suppkey
                       ORDER BY price_cents, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         sum(wt) OVER (PARTITION BY l_suppkey) AS tot
  FROM w
)
SELECT l_suppkey,
       CAST(max(tot) AS BIGINT) AS total_weight,
       round(CAST(min(CASE WHEN 2 * c >= tot THEN price_cents END) AS DOUBLE)
             / 100.0, 2) AS wmedian_price
FROM cum
GROUP BY l_suppkey
"""


@register("weighted_median_price", oracle=_WMEDIAN_ORACLE, tags=("A8", "W3", "ext"))
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 ext: quantity-weighted median price per supplier — the
    lower weighted median (first price whose cumulative weight
    reaches half the total). Prices and weights are exact integers,
    the crossing test 2·cum ≥ tot is integer, and the running sum
    orders by the total order (price, orderkey, linenumber), so the
    selected price is engine-exact with zero float boundaries.
    One supplier-partitioned window + one aggregate on the same
    high-cardinality key: a single shuffle. (The two-pass
    histogram/prefix-sum form replaces the sort if one supplier's
    line count ever outgrows a task — same cut rule, same result.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.round("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = (
        Window.partitionBy("l_suppkey")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_suppkey")
    cum = li.select(
        "l_suppkey",
        "price_cents",
        F.sum("wt").over(wc).alias("c"),
        F.sum("wt").over(wt).alias("tot"),
    )
    return cum.groupBy("l_suppkey").agg(
        F.max("tot").alias("total_weight"),
        F.round(
            F.min(
                F.when(2 * F.col("c") >= F.col("tot"), F.col("price_cents"))
            ).cast("double")
            / 100.0,
            2,
        ).alias("wmedian_price"),
    )


# --- Incremental aggregate state merge ----------------------------------

_INCR_MERGE_ORACLE = """
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders GROUP BY o_custkey
"""


@register("incremental_agg_merge", oracle=_INCR_MERGE_ORACLE, tags=("A9", "J2", "ext"))
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 ext: incremental-view maintenance by partial-state merge —
    yesterday's materialized per-customer aggregate (orders before
    1998) full-outer-merged with today's delta (1998-on), coalescing
    the (count, sum) state fields. Count and decimal-cents sum are
    the canonical MERGEABLE state: merge(stateA, stateB) equals the
    aggregate over the unioned input — which is exactly what the
    oracle computes over all orders at once. At 100 TB this is the
    difference between re-scanning history daily and touching only
    the delta partition; both sides shuffle on the same key, so the
    merge join is co-partitioned."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("long")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")

    def state(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    hist = state(orders.filter(F.col("o_orderdate") < cut))
    delta = state(orders.filter(F.col("o_orderdate") >= cut))
    h = hist.withColumnsRenamed({"n_orders": "n_h", "total_cents": "c_h"})
    d = delta.withColumnsRenamed({"n_orders": "n_d", "total_cents": "c_d"})
    return h.join(d, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("n_h", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias("n_orders"),
        (F.coalesce("c_h", F.lit(0)) + F.coalesce("c_d", F.lit(0)))
        .cast("long")
        .alias("total_cents"),
    )


# --- Discrete-percentile SLA report -------------------------------------

_SLA_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS delay
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), hist AS (
  SELECT priority, delay, count(*) AS cnt FROM d GROUP BY 1, 2
), cum AS (
  SELECT priority, delay, cnt,
         sum(cnt) OVER (PARTITION BY priority ORDER BY delay
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         sum(cnt) OVER (PARTITION BY priority) AS n
  FROM hist
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_lines,
       CAST(min(CASE WHEN 2 * c >= n THEN delay END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN 10 * c >= 9 * n THEN delay END) AS BIGINT) AS p90_days,
       CAST(max(delay) AS BIGINT) AS max_days
FROM cum GROUP BY priority
"""


@register("ship_delay_sla", oracle=_SLA_ORACLE, tags=("A8", "F2", "ext"))
def ship_delay_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/F2 ext: order→ship latency SLA (p50/p90/max days) per order
    priority, as DISCRETE percentiles over the delay histogram — the
    two-pass percentile pattern that scales: the heavy aggregate
    collapses fact rows into a (priority × distinct-delay) histogram
    first, and the percentile window runs over that bounded table,
    never the facts. All compared values are integer day counts and
    integer threshold tests (2·cum ≥ n, 10·cum ≥ 9·n): zero float
    boundaries."""
    d = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
                "delay"
            ),
        )
    )
    hist = d.groupBy("priority", "delay").agg(F.count(F.lit(1)).alias("cnt"))
    wc = (
        Window.partitionBy("priority")
        .orderBy("delay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "delay",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wp).alias("n"),
    )
    return cum.groupBy("priority").agg(
        F.max("n").alias("n_lines"),
        F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("delay")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(10 * F.col("c") >= 9 * F.col("n"), F.col("delay")))
        .cast("long")
        .alias("p90_days"),
        F.max("delay").cast("long").alias("max_days"),
    )
