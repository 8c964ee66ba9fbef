"""E2 completion of the TPC-H query-shape suite (SURVEY.md §3.2 E2):
Q6, Q7, Q8, Q9, Q11, Q13, Q16 — the seven shapes not yet covered by
`sql_entry.py` / `sql_subqueries.py`, closing the classic
relational-completeness bar at 22/22.

Same contract as the sibling modules: every statement is
DIALECT-NEUTRAL — the IDENTICAL string runs on Spark (via
``spark.sql``) and on the DuckDB oracle — and every money/ratio
column follows the cross-engine exactness discipline (SURVEY.md §6):
integer cents for sums, DECIMAL accumulation for price*(1-discount)
volumes, division only as the LAST step over already-exact operands
(cast-to-double of exact decimals, then one IEEE division, then
round — bit-stable on both engines).

Fixture adaptations (this synthetic schema has no partsupp table, no
l_commitdate/l_receiptdate, and no comment columns — FIXTURES.md):

- Q9's profit drops the ps_supplycost term (volume only), keeping the
  5-table join + LIKE-filtered part + per-(nation, year) rollup.
- Q11's "stock value" is price*quantity observed in lineitem for one
  nation's suppliers, keeping the CTE-referenced-twice +
  HAVING-vs-scalar-fraction structure (fraction multiplied through —
  no division).
- Q13's order-exclusion filter is o_orderpriority <> '1-URGENT'
  (stand-in for the o_comment NOT LIKE), keeping the LEFT OUTER join
  with an ON-clause filter + double aggregation.
- Q16's part-supplier relation is the one observed in lineitem, and
  the supplier-complaint exclusion is s_acctbal < 0 (6 suppliers at
  sf0.01), keeping the NOT IN subquery + count(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gostream_spark.io import register_views
from gostream_spark.registry import register

# --- TPC-H-Q6 shape: forecast-revenue filter (scan-only aggregate) ------

# Revenue = sum(price * discount). Exact integer form: price in cents
# times discount in whole percent -> unit is "cent-percent" (divide by
# 100*100 for dollars); no float product ever crosses the engines.
_SQL_Q6 = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cent_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24.0
"""


@register(
    "sql_forecast_revenue", oracle=_SQL_Q6, tags=("E2", "P2", "A2"), bench=True
)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q6 shape — the canonical scan-bound query: one
    table, three pushable predicates, one global sum. Its entire
    point at scale is that the plan is a single parquet scan with
    PushedFilters on shipdate/quantity and a two-column ReadSchema
    feeding a partial->final aggregate — no shuffle of data rows at
    all (only the 1-row partials). The discount band is compared in
    whole percent (integer), and revenue is summed as exact integer
    cent-percent, so no float boundary exists on either engine.
    Identical SQL text on both engines."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_Q6)


# --- TPC-H-Q7 shape: volume shipping between two nations ----------------

_SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("sql_volume_shipping", oracle=_SQL_Q7, tags=("E2", "J1", "J8"))
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q7 shape — bidirectional trade volume between two
    nations per ship year. The nation table joins TWICE (supplier arm
    and customer arm) with a disjunctive cross-pair predicate;
    Catalyst pushes each n_name filter into its own broadcast of the
    25-row dim BEFORE the fact joins, so the big
    lineitem-orders-customer chain only ever carries rows from the
    two nations. Volume accumulates in exact DECIMAL(18,4) (both
    factors two-decimal) and is rounded once at the end. Identical
    SQL text on both engines."""
    register_views(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_SQL_Q7)


# --- TPC-H-Q8 shape: national market share ------------------------------

_SQL_Q8 = """
SELECT o_year,
       CAST(CASE WHEN sum(volume) <> 0 THEN
              round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume
                                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                    / CAST(sum(volume) AS DOUBLE), 6)
            END AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@register(
    "sql_market_share", oracle=_SQL_Q8, tags=("E2", "J8", "A1"), bench=True
)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q8 shape — one supplier nation's share of an
    ECONOMY-part market inside the ASIA-customer region, per order
    year: the widest join in the suite (7 tables, nation twice, a
    conditional aggregate over the ratio). Plan: part/supplier/
    nation/region all broadcast; lineitem-orders-customer is the only
    shuffled chain, and the CASE moves the share split into the SAME
    partial aggregate as the denominator — one pass, no second join.
    Exactness: both sums accumulate DECIMAL(18,4); the ratio is ONE
    IEEE division of two exact-decimal-derived doubles, rounded to
    6dp — deterministic on both engines. Identical SQL text on both
    engines."""
    register_views(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(_SQL_Q8)


# --- TPC-H-Q9 shape: product-type profit --------------------------------

# (No partsupp in the fixture, so profit drops the
# ps_supplycost * l_quantity term: amount = price * (1 - discount).)
_SQL_Q9 = """
SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("sql_product_profit", oracle=_SQL_Q9, tags=("E2", "J8", "F1"))
def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q9 shape — profit on 'red' product lines per
    supplier nation and order year. The LIKE '%red%' is a
    non-prefix match (not sargable), but it sits on the SMALL part
    dim, so the plan filters part first, broadcasts the survivors,
    and the fact chain joins lineitem->orders on the shuffled
    orderkey only — the pattern that keeps a contains-match cheap at
    100 TB (never evaluate LIKE on the fact side). DECIMAL
    accumulation as in Q7/Q8. Identical SQL text on both engines."""
    register_views(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    return spark.sql(_SQL_Q9)


# --- TPC-H-Q11 shape: important stock (CTE twice + fraction HAVING) -----

# (No partsupp: per-part "stock value" = price*qty observed in
# lineitem for one nation's suppliers. Fraction 1/1000 multiplied
# through — sum*1000 > total — so the gate is exact integer cents.)
_SQL_Q11 = """
WITH natvalue AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_quantity) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_0'
)
SELECT l_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
FROM natvalue
GROUP BY l_partkey
HAVING sum(CAST(value_cents AS DECIMAL(38,0))) * 1000
     > (SELECT sum(CAST(value_cents AS DECIMAL(38,0))) FROM natvalue)
"""


@register("sql_important_stock", oracle=_SQL_Q11, tags=("E2", "A5", "A2"))
def sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q11 shape — parts whose one-nation stock value
    exceeds a fixed fraction (1/1000) of that nation's total: a CTE
    referenced twice (grouped outer + scalar-total subquery) with the
    fraction gate in HAVING. Catalyst evaluates the CTE's scalar
    branch as a 1-row plan broadcast into the HAVING predicate, and
    the grouped branch as one partial->final aggregate on l_partkey —
    the nation filter broadcasts the 25-row dim chain into the
    lineitem scan on both branches. The fraction is multiplied
    through (no division), and the multiplied-through comparison runs
    in DECIMAL(38,0): a 100 TB nation's cent total (~1.8e18) times
    1000 would overflow BIGINT (Spark would silently wrap under
    ANSI-off where DuckDB raises), while 38-digit decimal holds it
    exactly on both engines. Quantity is rounded before the BIGINT
    cast (Spark truncates a bare DOUBLE->BIGINT cast, DuckDB rounds —
    latent with integer-valued fixture quantities, divergent the
    moment one isn't). Identical SQL text on both engines."""
    register_views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_SQL_Q11)


# --- TPC-H-Q13 shape: customer order-count distribution -----------------

_SQL_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("sql_customer_distribution", oracle=_SQL_Q13, tags=("E2", "J2", "A1"))
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J2: the TPC-H-Q13 shape — the order-count histogram over ALL
    customers including the zero-order ones: a LEFT OUTER join whose
    exclusion filter lives in the ON clause (filtering '1-URGENT'
    orders WITHOUT dropping orderless customers — the classic
    outer-join-filter-placement trap), then TWO stacked aggregations
    (per-customer count, then distribution of counts). count(o_orderkey)
    counts non-NULL join matches only, so unmatched customers land in
    the c_count=0 bucket on both engines. The second aggregate's
    input is one row per customer — the heavy shuffle is only the
    first, on the join/grouping key c_custkey. Identical SQL text on
    both engines."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_Q13)


# --- TPC-H-Q16 shape: parts/supplier relationship count -----------------

# (No partsupp: the part-supplier relation is the one observed in
# lineitem; the "complaint supplier" exclusion is s_acctbal < 0.)
_SQL_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


@register("sql_supplier_relationship", oracle=_SQL_Q16, tags=("E2", "J3", "A3"))
def sql_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J3: the TPC-H-Q16 shape — how many distinct suppliers serve
    each surviving (brand, type, size) bucket, excluding a blocklist
    computed by a NOT IN subquery. The probe key s_suppkey is
    non-nullable, so Catalyst rewrites NOT IN to a left ANTI join
    (the nullable case would need the expensive null-aware variant —
    worth knowing WHY the schema guarantees matter here); the three
    part predicates broadcast a pre-filtered part dim into the fact
    scan; count(DISTINCT) runs as the standard two-phase expand/
    aggregate, partitioned on the grouping key. Identical SQL text on
    both engines."""
    register_views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_SQL_Q16)
