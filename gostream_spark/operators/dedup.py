"""Deterministic deduplication operators (SURVEY.md §2.6 W9 / §2.7 T5
/ §2.8 L1).

Spark's bare ``dropDuplicates`` keeps whichever row a partition
happens to deliver first — fine for idempotent streaming dedup, wrong
for a reproducible batch engine. ``keep_first`` pins the survivor
with an explicit order, at the cost Spark always pays for dedup
anyway: one shuffle on the key columns.

Scale note: when the dedup key is a long string (document text),
shuffle on a hash of it instead — add ``xxhash64(key)`` as the
partition key so the exchange moves 8 bytes per row, and compare the
full value only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame, keys: list[Column | str], order_by: list[Column | str]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_by``
    (which must be a total order within each key group for the result
    to be deterministic). Adds no columns to the output."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    marker = "__gs_rn"
    return (
        df.withColumn(marker, F.row_number().over(w))
        .filter(F.col(marker) == 1)
        .drop(marker)
    )
