"""Flagship query (SURVEY.md §7 M0): TPC-H-Q1-style pricing summary.

Exercises S1 (parquet scan w/ predicate pushdown), P1/P2, F2/F3,
A1/A2 and the exact-decimal parity discipline. One scan, one hash
aggregate (Catalyst does partial→final map-side combine), zero joins
— the plan that survives 100 TB: filter pushed to the scan, only 7 of
11 columns read, a single shuffle on the (low-cardinality) group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import dec2, exact_avg, money_sum
from gostream_spark.registry import register

_CUTOFF = "1998-09-02 00:00:00"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 2) AS DOUBLE)
    AS sum_disc_price,
  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                 * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
    AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_ORACLE,
    tags=("S1", "P1", "P2", "P4", "F2", "F3", "A1", "A9", "flagship"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over the fixture lineitem table."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (dec2("l_extendedprice") * (1 - dec2("l_discount"))).cast("decimal(18,4)")
    charge = disc_price * (1 + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc", scale=4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
