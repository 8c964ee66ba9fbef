"""E2 subquery surface (SURVEY.md §3.2 E2 + §2.5 J3): EXISTS /
NOT EXISTS / IN / scalar / correlated-scalar subqueries expressed as
SQL text, each run through Spark's parser entry point.

Every statement here is DIALECT-NEUTRAL: the IDENTICAL string is what
the DuckDB oracle executes (the strongest E2 contract — same query,
not just same result). Catalyst de-correlates each shape into a join
the optimizer can place freely:

- EXISTS      -> left semi join          (no fact materialization)
- NOT EXISTS  -> left anti join
- IN          -> left semi join on the probe key
- scalar      -> single-row broadcast (cross) join
- correlated scalar -> aggregate on the correlation key + equi-join

so all five run as ordinary shuffles/broadcasts at any scale — no
per-row re-execution of the inner query, which is what a naive
tuple-at-a-time engine would do.

Cross-engine exactness discipline (SURVEY.md §6): money comparisons
route through integer cents (``CAST(round(x * 100) AS BIGINT)``),
scalar-aggregate comparisons avoid division (sum/count multiplied
through instead of avg), and quantities are integer-valued doubles,
so no float boundary can flip row membership between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gostream_spark.io import register_views
from gostream_spark.registry import register

# --- TPC-H-Q4 shape: EXISTS correlated subquery -------------------------

_SQL_EXISTS = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


@register("sql_exists_late_ship", oracle=_SQL_EXISTS, tags=("E2", "J3"))
def sql_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: the TPC-H-Q4 shape — orders in a half-year window having
    at least one lineitem shipped more than 90 days after the order
    date, counted per priority. The EXISTS predicate carries a
    NON-equi conjunct (l_shipdate > o_orderdate + 90d), so Catalyst
    de-correlates it into a left SEMI join on o_orderkey with the
    date comparison as a join residual — one pass over each table,
    no per-order probe. Identical SQL text on both engines."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_SQL_EXISTS)


# --- TPC-H-Q22 shape: NOT EXISTS (anti-join) ----------------------------

_SQL_NOT_EXISTS = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer
WHERE c_acctbal > 5000.0
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@register("sql_not_exists_idle_customers", oracle=_SQL_NOT_EXISTS, tags=("E2", "J3"))
def sql_not_exists_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: the TPC-H-Q22 shape — well-funded customers who never
    placed an order, summarized per market segment. NOT EXISTS
    de-correlates to a left ANTI join on custkey: the orders side is
    reduced to its distinct probe keys before the join, so the shape
    stays one shuffle (or an AQE broadcast of the key set) at any
    scale. Balance mass is summed in integer cents (exact on both
    engines); the 5000.0 gate sits on data two decimal digits wide,
    so no float boundary is reachable."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_NOT_EXISTS)


# --- IN subquery (semi-join probe) --------------------------------------

_SQL_IN = """
SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0)
GROUP BY s_nationkey
"""


@register("sql_in_subquery_suppliers", oracle=_SQL_IN, tags=("E2", "J3"))
def sql_in_subquery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: IN-subquery membership — suppliers who ever shipped a
    near-max-quantity line, counted per nation. Catalyst rewrites IN
    (uncorrelated, non-null probe key) into a left SEMI join against
    the filtered, de-duplicated inner side; the l_quantity >= 49
    predicate pushes into the lineitem scan so only the matching
    fraction ever reaches the join. l_quantity is an integer-valued
    double (TPC-H 1..50), so the 49.0 boundary is exact on both
    engines."""
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_SQL_IN)


# --- Uncorrelated scalar subqueries (global-aggregate gate) -------------

# Above-mean gate WITHOUT division: price*N > total  <=>  price > avg,
# but in exact integer-cents arithmetic on both engines (avg() would
# return a double whose last ulp may differ between engines).
_SQL_SCALAR = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts
FROM part
WHERE CAST(round(p_retailprice * 100) AS BIGINT)
        * (SELECT count(*) FROM part)
      > (SELECT sum(CAST(round(p_retailprice * 100) AS BIGINT)) FROM part)
GROUP BY p_brand
"""


@register("sql_scalar_subquery_above_mean", oracle=_SQL_SCALAR, tags=("E2", "A2"))
def sql_scalar_subquery_above_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/A2: parts priced above the global mean, per brand, via TWO
    uncorrelated scalar subqueries (count(*) and sum of cents). Each
    scalar collapses to a one-row plan broadcast into the predicate —
    Catalyst executes them once, not per row. The above-mean test is
    algebraically cleared of division (price*N > total), keeping the
    whole comparison in BIGINT cents: bit-exact on both engines where
    an avg()-of-doubles gate could flip boundary rows by one ulp."""
    register_views(spark, sf_dir, "part")
    return spark.sql(_SQL_SCALAR)


# --- TPC-H-Q17 shape: correlated SCALAR subquery ------------------------

# "Small orders": lines whose quantity is under one-fifth of their
# part's total shipped quantity. Quantities are integer-valued doubles,
# so 5*qty < sum(qty) is exact arithmetic on both engines.
_SQL_CORR_SCALAR = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_small_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents
FROM lineitem l1
WHERE l_quantity * 5 < (SELECT sum(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
GROUP BY l_returnflag
"""


@register("sql_correlated_small_quantity", oracle=_SQL_CORR_SCALAR, tags=("E2", "A9", "J1"))
def sql_correlated_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q17 shape — a CORRELATED scalar subquery
    (per-part total quantity) gating the outer fact scan. Catalyst
    de-correlates it into ONE partial->final aggregate of lineitem by
    l_partkey joined back to lineitem on the correlation key — two
    scans + one equi-join, never a per-row inner execution; at scale
    both sides hash-partition on l_partkey. The gate multiplies
    through instead of dividing (5*qty < sum), and quantities are
    integer-valued, so the boundary is exact on both engines."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_CORR_SCALAR)


# --- TPC-H-Q2 shape: correlated MIN over the correlation key ------------

# (The fixture set has no partsupp table, so the min-cost-supplier
# pattern is expressed over lineitem: lines sold at their part's
# minimum extended price, decorated with supplier/nation dims.)
_SQL_CORR_MIN = """
SELECT p_brand, s_name, n_name,
       CAST(count(*) AS BIGINT) AS n_min_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents
FROM lineitem l1
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_size <= 10
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = l1.l_partkey)
GROUP BY p_brand, s_name, n_name
"""


@register("sql_correlated_min_cost", oracle=_SQL_CORR_MIN, tags=("E2", "J1", "A9"))
def sql_correlated_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q2 shape — a correlated MIN scalar subquery
    selecting, per part, only the rows that achieve the per-group
    minimum, then decorating through two dimension joins. Catalyst
    de-correlates the min into ONE aggregate of lineitem by l_partkey
    equi-joined back on the correlation key (same rewrite family as
    Q17's sum) — no per-row probe; the small part/supplier/nation
    dims broadcast. Equality on l_extendedprice is exact: both
    engines compare the identical stored doubles, and min() returns
    one of them bit-for-bit. Identical SQL text on both engines."""
    register_views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(_SQL_CORR_MIN)


# --- TPC-H-Q15 shape: MAX over an aggregated view -----------------------

_SQL_VIEW_MAX = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
             AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("sql_view_max_revenue", oracle=_SQL_VIEW_MAX, tags=("E2", "A2", "A9"))
def sql_view_max_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q15 shape — top-revenue supplier for a quarter,
    via a scalar MAX over an aggregated CTE view referenced twice
    (once as the join input, once inside the subquery). The max
    collapses to a one-row plan broadcast into the predicate;
    revenue is summed in exact DECIMAL(18,4) (price x (1-discount)
    with both operands two-decimal), so the equality that picks the
    winner cannot be split by float accumulation order across
    engines. Identical SQL text on both engines."""
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_SQL_VIEW_MAX)


# --- TPC-H-Q20 shape: nested IN with a grouped-aggregate inner ----------

_SQL_NESTED_IN = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50.0
)
"""


@register("sql_nested_in_bulk_suppliers", oracle=_SQL_NESTED_IN, tags=("E2", "J3", "A5"))
def sql_nested_in_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: the TPC-H-Q20 shape — an IN whose inner query itself
    contains another IN plus a grouped aggregate with HAVING:
    suppliers who moved >50 units of any 'red' part in 1996. Both IN
    levels de-correlate to left SEMI joins (part-key membership
    filters the lineitem scan; the aggregated supplier set probes the
    supplier table), so the whole nest is three scans, two semi
    joins, one partial->final aggregate — no nested execution.
    sum(l_quantity) is a sum of integer-valued doubles, exact on
    both engines at the 50.0 gate. Identical SQL text on both
    engines."""
    register_views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_SQL_NESTED_IN)


# --- TPC-H-Q21 shape: twin correlated EXISTS + NOT EXISTS ---------------

# (No l_commitdate/l_receiptdate in the fixture schema; "late" is
# shipped >60 days after the order date, preserving Q21's structure:
# the only late supplier on a finished multi-supplier order.)
_SQL_TWIN_EXISTS = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


@register("sql_sole_late_supplier", oracle=_SQL_TWIN_EXISTS, tags=("E2", "J3", "J1"), bench=True)
def sql_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: the TPC-H-Q21 shape — the hardest decorrelation stress
    in the TPC-H suite: the SAME fact table correlated twice against
    the outer row, once positively (EXISTS: another supplier shares
    the order) and once negatively (NOT EXISTS: no OTHER supplier was
    also late), with the negative branch additionally correlated to
    the outer ORDERS date. Catalyst turns the pair into a left SEMI
    then a left ANTI join on l_orderkey — three passes over lineitem
    total, all hash-partitioned on the order key, never a per-row
    re-probe. The NOT EXISTS's non-equi date conjunct rides as a join
    residual. Identical SQL text on both engines."""
    register_views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_SQL_TWIN_EXISTS)


# --- TPC-H-Q18 shape: IN over a grouped-HAVING aggregate ----------------

_SQL_BIG_ORDERS = """
SELECT c_name, o_orderkey,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 210.0)
GROUP BY c_name, o_orderkey, o_totalprice
"""


@register("sql_large_volume_orders", oracle=_SQL_BIG_ORDERS, tags=("E2", "J3", "A5"))
def sql_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q18 shape — large-volume customers: orders whose
    total line quantity tops 210, re-joined to their lines and owner.
    The IN's inner query is a full grouped aggregate with HAVING;
    Catalyst runs it ONCE as a partial->final aggregate on l_orderkey
    and semi-joins the surviving keys into orders — the aggregate is
    never re-evaluated per probe row, and both the aggregate and the
    outer join share the l_orderkey partitioning. Quantities are
    integer-valued doubles so the 210.0 gate and the BIGINT total are
    exact on both engines. Identical SQL text on both engines."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_BIG_ORDERS)
