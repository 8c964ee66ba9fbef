"""Top-k operators (SURVEY.md §2.6 W4/W5).

``topk`` compiles to TakeOrdered (per-partition heap + k·p merge,
never a global sort); ``topk_per_group`` is the ranked-window form —
one shuffle on the group key. Both require the ordering to be total
(append a unique tiebreak column) or the selected rowset is
nondeterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, k: int, *order_by: Column) -> DataFrame:
    """W4: global top-k under a total order."""
    return df.orderBy(*order_by).limit(k)


def topk_ranked(
    df: DataFrame, k: int, *order_by: Column, rank_col: str = "rn"
) -> DataFrame:
    """Global top-k WITH the rank attached, scale-safe.

    The heavy distributed step is ``orderBy().limit(k)`` (compiles to
    TakeOrderedAndProject: per-partition heap, k·p merge — never a
    single-partition global sort). The ``row_number`` window then runs
    over only the k surviving rows, where moving them to one partition
    is free. Replaces the ``row_number().over(Window.orderBy(...)) <=
    k`` anti-pattern, which funnels the ENTIRE input through one task.

    The window partitions by a constant rather than leaving the
    partition spec empty: same single-group semantics over the k rows,
    but WindowExec's "No Partition Defined" WARN never fires, so bench
    logs stay clean enough to surface a REAL full-input global window.
    A plain ``lit(1)`` would be constant-folded OUT of the partition
    spec by Catalyst (re-emptying it); ``spark_partition_id() * 0`` is
    the same constant 0 for every row but non-foldable, so it survives
    to the physical window spec.
    """
    w = Window.partitionBy(F.spark_partition_id() * F.lit(0)).orderBy(*order_by)
    return df.orderBy(*order_by).limit(k).withColumn(
        rank_col, F.row_number().over(w)
    )


def topk_per_group(
    df: DataFrame,
    k: int,
    partition_by: list[Column | str],
    order_by: list[Column | str],
    rank_col: str = "rn",
) -> DataFrame:
    """W5: top-k per group; keeps the rank as ``rank_col``."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
