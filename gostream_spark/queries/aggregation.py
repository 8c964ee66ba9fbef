"""Aggregation operators (SURVEY.md §2.4, A2-A8; A1/A9 are covered by
the flagship pricing summary).

All aggregates are Catalyst hash aggregates with automatic partial →
final combine, so the shuffle after the map side carries only
(group-key × partial-state) rows — the property that makes these
linear-scan cheap at 100 TB. Money/quantity sums run through exact
DECIMAL (see ``gostream_spark.parity``) so partition order can never
change the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import dec2, exact_avg
from gostream_spark.registry import register

# --- A2 global aggregate ------------------------------------------------

_A2_ORACLE = """
SELECT count(*) AS li_cnt,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       round(CAST(min(l_extendedprice) AS DOUBLE), 2) AS min_price,
       round(CAST(max(l_extendedprice) AS DOUBLE), 2) AS max_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2)
         AS avg_price
FROM lineitem
"""


@register("agg_global", oracle=_A2_ORACLE, tags=("A2",))
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: ungrouped aggregate over the fact table — one partial state
    per partition, a single-row final combine (no meaningful shuffle
    at any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("li_cnt"),
        F.sum(dec2("l_quantity")).cast("double").alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).cast("double").alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).cast("double").alias("max_price"),
        exact_avg("l_extendedprice", "avg_price"),
    )


# --- A3 exact count distinct -------------------------------------------

_A3_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS distinct_customers,
       count(*) AS order_cnt
FROM orders GROUP BY o_orderpriority
"""


@register("agg_count_distinct", oracle=_A3_ORACLE, tags=("A3",))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact count distinct. Catalyst expands this to a two-phase
    aggregate (distinct on (priority, custkey) first, then count) —
    the correct exact plan; the approximate HLL variant (A4) is the
    scale escape hatch when 2-pass cost matters."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("order_cnt"),
    )


# --- A4 approximate count distinct (HLL++) ------------------------------


_A4_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(*) AS BIGINT) AS li_cnt,
       CAST(1 AS BIGINT) AS approx_ok
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_approx_count_distinct", oracle=_A4_ORACLE, tags=("A4",))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: approx_count_distinct (HyperLogLog++, rsd=0.01). Sketches
    merge associatively, so this is one pass + tiny shuffle at any
    scale. Raw sketch estimates differ across engines, so the
    GUARANTEE shape makes this exact-checkable: the row carries the
    exact distinct count plus a verdict that the HLL estimate landed
    within 5x its configured rsd (a >=5-sigma bound — estimator
    stddev is rsd*n, so a violation means the sketch is broken, not
    unlucky). The oracle asserts the same exact values and verdict=1,
    so a sketch regression turns the driver's gate red."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("li_cnt"),
    )
    ok = F.abs(F.col("approx_parts") - F.col("exact_parts")) <= F.greatest(
        F.lit(1.0), F.col("exact_parts") * 0.05
    )
    return g.select(
        "l_returnflag", "exact_parts", "li_cnt", ok.cast("long").alias("approx_ok")
    )


# --- A5 multi-aggregate + HAVING ---------------------------------------

_A5_ORACLE = """
SELECT o_custkey,
       count(*) AS order_cnt,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend,
       round(CAST(max(o_totalprice) AS DOUBLE), 2) AS max_order
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 8 AND sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
"""


@register("agg_having", oracle=_A5_ORACLE, tags=("A5",))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: multiple aggregates with a post-aggregation filter (HAVING).
    The filter runs after the final aggregate on the already-collapsed
    rows — no extra pass over the input."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum(dec2("o_totalprice")), 2).cast("double").alias("total_spend"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("max_order"),
            F.sum(dec2("o_totalprice")).alias("_raw_spend"),
        )
        .filter((F.col("order_cnt") >= 8) & (F.col("_raw_spend") > 1000000))
        .drop("_raw_spend")
    )


# --- A6 first/last/collect ---------------------------------------------

_A6_ORACLE = """
WITH keyed AS (
  SELECT c_mktsegment, c_name, c_nationkey,
         CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
           * 10000000 + c_custkey AS balkey
  FROM customer
)
SELECT c_mktsegment,
       arg_max(c_name, balkey) AS richest_customer,
       arg_min(c_name, balkey) AS poorest_customer,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
FROM keyed GROUP BY c_mktsegment
"""


@register("agg_first_last_collect", oracle=_A6_ORACLE, tags=("A6",))
def agg_first_last_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: first/last/collect family. Spark's ``first``/``last`` are
    partition-order-dependent, so the engine exposes the deterministic
    forms instead: ``max_by``/``min_by`` (value at extremum) and
    ``sort_array(collect_set(...))`` (canonicalized set). The set is
    emitted as a joined string because Spark arrays and DuckDB lists
    stringify differently (parity.py). The extremum key builds the
    tie-break INTO the ordering value (exact cents, then custkey —
    the ``agg_arg_extremes`` discipline) — on a tied balance each
    engine's arg-extreme is otherwise free to pick a different
    customer (the sf0.01 fixture already contains one tied
    ``c_acctbal`` pair)."""
    customer = load_table(spark, sf_dir, "customer")
    # Engine-side ordering key is a STRUCT (cents, custkey) — struct
    # comparison is lexicographic, so it orders identically to the
    # oracle's folded BIGINT (cents * 1e7 + custkey) wherever the fold
    # is in range, and unlike the fold it cannot overflow at ANY scale
    # (r9 advice: custkey >= 1e7, i.e. TPC-H sf >= ~67, would overflow
    # the folded slot and silently mis-order). The fold stays only in
    # the DuckDB oracle, which runs at fixture scale where it is exact.
    balkey = F.struct(
        F.round(dec2("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
        F.col("c_custkey").alias("k"),
    )
    return customer.withColumn("balkey", balkey).groupBy("c_mktsegment").agg(
        F.max_by("c_name", "balkey").alias("richest_customer"),
        F.min_by("c_name", "balkey").alias("poorest_customer"),
        F.array_join(F.sort_array(F.collect_set("c_nationkey")), ",").alias("nations"),
    )


# --- A7 rollup / cube ---------------------------------------------------

_A7_ROLLUP_ORACLE = """
SELECT coalesce(r_name, '(all)') AS region_name,
       coalesce(n_name, '(all)') AS nation_name,
       count(*) AS customer_cnt,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("agg_rollup", oracle=_A7_ROLLUP_ORACLE, tags=("A7",))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: rollup — (region, nation), (region), () subtotal levels in
    one pass (Catalyst expands the grouping sets map-side; input is
    read once). NULL grouping keys are coalesced to '(all)' so the
    cross-engine hash never sees engine-specific NULL encodings."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            F.round(F.sum(dec2("c_acctbal")), 2).cast("double").alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation_name"),
            "customer_cnt",
            "total_acctbal",
        )
    )


_A7_CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS order_cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=_A7_CUBE_ORACLE, tags=("A7",))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: cube — all four grouping-set combinations of two
    low-cardinality keys."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            "order_cnt",
        )
    )


# --- A7b pivot (crosstab) ----------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS cnt_f,
       count(*) FILTER (o_orderstatus = 'O') AS cnt_o,
       count(*) FILTER (o_orderstatus = 'P') AS cnt_p
FROM orders GROUP BY o_orderpriority
"""


@register("agg_pivot", oracle=_PIVOT_ORACLE, tags=("A7", "A1"))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (pivot form): order counts cross-tabulated priority ×
    status. Pivot values are listed explicitly — at scale, an
    unlisted-values pivot triggers an extra distinct pass to discover
    them; always enumerate when the domain is known."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# --- A5b boolean / conditional aggregates -------------------------------

_BOOL_ORACLE = """
SELECT event_type,
       count(*) FILTER (value > 50) AS big_cnt,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 99) AS any_huge,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt2
FROM events GROUP BY event_type
"""


@register("agg_boolean", oracle=_BOOL_ORACLE, tags=("A5", "P5"))
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (boolean forms): count_if / bool_and / bool_or / conditional
    sum — predicate aggregates stay in the partial-agg path like any
    other algebraic aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("big_cnt"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_huge"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).cast("bigint").alias("big_cnt2"),
    )


# --- A8 statistical aggregates -----------------------------------------

_A8_ORACLE = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS qty_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(quantile_cont(l_quantity, 0.5), 4) AS qty_median,
       round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
       count(*) AS li_cnt
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_stats", oracle=_A8_ORACLE, tags=("A8",))
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: stddev/variance/exact percentiles. stddev/variance use
    merge-able moment sketches (one pass); exact percentiles need a
    per-group sort — at 100 TB prefer ``approx_percentile`` (KLL-style
    mergeable sketch) unless exactness is required. Rounded to 4
    decimals: the floating accumulation order differs across engines
    by design, and rounding absorbs the ulp-level drift."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_median"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("qty_p90"),
        F.count(F.lit(1)).alias("li_cnt"),
    )
