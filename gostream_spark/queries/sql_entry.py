"""SQL entry point (SURVEY.md §3.2 E2): queries expressed as SQL
strings over registered temp views — the second lifecycle path
(parser → same analyzer/optimizer as the DataFrame API).

The Spark SQL text and the DuckDB oracle are nearly identical here by
design: ANSI SQL is the portability surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gostream_spark.io import register_views
from gostream_spark.registry import register

# TPC-H-Q3-shaped: unshipped-revenue by order, via pure SQL.
_SQL_SPARK = """
SELECT o_orderkey,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue,
       date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""

_SQL_ORACLE = """
SELECT o_orderkey,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


@register("sql_shipping_priority", oracle=_SQL_ORACLE, tags=("E2", "J8"), bench=True)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q3 shape executed from a SQL string over temp
    views — proves the parser entry point feeds the same Catalyst
    pipeline (broadcast selection, filter pushdown into both fact
    scans) as the DataFrame API."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_SPARK)


# --- E2: dialect-neutral analytics over the corpus tables ---------------

# ONE SQL text, executed verbatim by BOTH engines (Spark SQL runs it,
# DuckDB runs the identical string as the oracle) — the strongest form
# of the E2 contract: not just same results, same QUERY.
_PROFILE_SQL = """
SELECT source,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CASE WHEN count(*) >= 30 THEN 'major' ELSE 'minor' END AS tier
FROM documents
GROUP BY source, lang
HAVING count(*) > 1
"""


@register("sql_corpus_profile", oracle=_PROFILE_SQL, tags=("E2", "A5", "ext"))
def sql_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 ext: corpus profile through the SQL entry point with a
    DIALECT-NEUTRAL statement — the identical text is what the DuckDB
    oracle executes, so the check covers the SQL surface itself
    (grouping, HAVING, CASE tiers), not just the result values.
    Integer aggregates only; no float, no dialect functions."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(_PROFILE_SQL)


# --- E2: TPC-H-Q12-shaped conditional aggregation over a join -----------

_SQL_Q12_TEXT = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


@register("sql_priority_line_counts", oracle=_SQL_Q12_TEXT, tags=("E2", "A5", "J1"))
def sql_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q12 shape (conditional CASE counts over a
    fact-fact join, dimensioned here by l_returnflag — the fixture
    carries no shipmode) executed from the IDENTICAL SQL string on
    both engines: the Spark text IS the oracle text, the strongest
    form of the ANSI-portability claim. The l_shipdate range predicate
    pushes into the lineitem scan; the join keys orders by orderkey
    with AQE free to pick the build side."""
    register_views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_SQL_Q12_TEXT)


# --- E2: aggregate FILTER clause (identical text both engines) ----------

_SQL_FILTER_AGG = """
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_quantity >= 25.0) AS BIGINT) AS n_heavy,
       CAST(count(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_no_disc,
       CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     FILTER (WHERE l_tax > 0.05), 0) AS BIGINT) AS taxed_cents
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_filter_clause_agg", oracle=_SQL_FILTER_AGG, tags=("E2", "A5"))
def sql_filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/A5: the ANSI aggregate FILTER modifier — three differently-
    conditioned aggregates in ONE grouped pass (the SQL-standard form
    of the CASE-WHEN-inside-agg idiom, cf. sql_priority_line_counts).
    Identical text on both engines. Catalyst compiles each FILTER to
    a conditional accumulator inside the same partial->final
    HashAggregate: one scan, one shuffle, regardless of how many
    filtered aggregates ride along. Boundaries are exact: quantity
    and discount are integer-valued/two-decimal doubles and the money
    sum routes through integer cents; the empty-filter-set NULL is
    COALESCEd to 0 on both sides (NULL-free output convention)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_FILTER_AGG)


# --- TPC-H-Q10-shaped: returned-item revenue ranking --------------------
# Identical text on both engines (ANSI core); only the final
# projection's date formatting differs by dialect.
_Q10_BODY = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM customer
JOIN nation   ON n_nationkey = c_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("sql_returned_revenue_topk", oracle=_Q10_BODY, tags=("E2", "J8", "W4"))
def sql_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: the TPC-H-Q10 shape — revenue lost to returned items per
    customer over a half-year, top 20 — executed from the SAME SQL
    text on both engines (the portability check: zero dialect
    divergence, ANSI core only). Catalyst broadcasts nation+customer
    into the fact stream, pushes the returnflag and date filters into
    both scans, and plans the ORDER BY ... LIMIT as TakeOrdered (no
    global sort). The DESC ranking has the c_custkey tiebreak, so the
    selected rowset is total-order deterministic."""
    register_views(spark, sf_dir, "customer", "nation", "orders", "lineitem")
    return spark.sql(_Q10_BODY)


# --- TPC-H-Q19 shape: disjunctive multi-column predicate ----------------

_SQL_DISJUNCTIVE = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1.0 AND 11.0 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10.0 AND 20.0 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20.0 AND 30.0 AND p_size BETWEEN 1 AND 15)
GROUP BY p_brand
"""


@register("sql_disjunctive_brand_revenue", oracle=_SQL_DISJUNCTIVE, tags=("E2", "J1", "P2"))
def sql_disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/P2: the TPC-H-Q19 shape — an OR of three conjunctive
    branches mixing columns from BOTH join sides. The optimizer-
    relevant property: Catalyst factors the single-side implications
    out of the disjunction, so the part scan still receives a pushed
    `p_brand IN (...)`-style filter and the lineitem scan a quantity
    range union, instead of evaluating the whole OR post-join — at
    100 TB that's the difference between scanning three brands and
    scanning the fact table. Revenue is summed in exact
    DECIMAL(18,4); quantities/sizes are integer-valued so every
    BETWEEN boundary is exact on both engines. Identical SQL text on
    both engines."""
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SQL_DISJUNCTIVE)


# --- TPC-H-Q5-flavored snowflake chain (all seven fixture tables) -------

_SQL_SNOWFLAKE = """
SELECT r_name, p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND s_nationkey = n_nationkey
GROUP BY r_name, p_brand
"""


@register("sql_snowflake_local_supply", oracle=_SQL_SNOWFLAKE, tags=("E2", "J1", "J8"))
def sql_snowflake_local_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/J8: the TPC-H-Q5 flavor — a SEVEN-table snowflake chain
    (region → nation → customer → orders → lineitem → part →
    supplier) with the local-supply constraint (`s_nationkey =
    n_nationkey`) that makes supplier join through the customer's
    nation rather than independently. This is the join-ORDERING
    stress: written naively the chain starts from 5-row region;
    Catalyst's reorder + AQE must pivot the plan around the lineitem
    fact with every dimension broadcast, and the year filter pushed
    into the orders scan — verified by the plan pin. Identical SQL
    text on both engines; money in exact integer cents."""
    register_views(
        spark, sf_dir,
        "region", "nation", "customer", "orders",
        "lineitem", "part", "supplier",
    )
    return spark.sql(_SQL_SNOWFLAKE)
