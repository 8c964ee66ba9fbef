"""Skew-mitigation operators (SCALE.md: hot keys).

``salted_agg`` is the classic two-stage aggregation: append a salt to
the group key so a hot key's rows spread over ``salt_n`` reducers,
partially aggregate, then re-aggregate without the salt. For
algebraic aggregates (count/sum/min/max) the result is identical to
the direct groupBy — the salted form just bounds the largest reducer
at input/salt_n. AQE's skew-join splitting handles the JOIN side of
the same problem; this handles aggregation (and works on any Spark
version / static plans).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``partial_aggs`` aggregate within (keys × salt); ``final_aggs``
    merge the partials per key (e.g. partial ``count → cnt`` merges
    with ``sum(cnt)``). The caller picks merge-able aggregates —
    that's what makes the rewrite exact.
    """
    salt = (F.rand(seed=42) * salt_n).cast("int").alias("__gs_salt")
    partial = df.withColumn("__gs_salt", salt).groupBy(*keys, "__gs_salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join for the case AQE's skew splitting doesn't
    reach (static plans, or a right side too big to broadcast but
    small enough to replicate ``salt_n``×): salt the left randomly,
    replicate every right row once per salt value, and join on
    ``(key, salt)``. A hot left key's rows then spread over ``salt_n``
    reducers instead of serializing on one.

    Exact for ``inner`` and ``left`` joins: each left row still meets
    exactly the right rows carrying its key (at its own salt replica).
    Right/full-outer are rejected — an unmatched right row would
    surface once per replica.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_left = left.withColumn(
        "__gs_salt", (F.rand(seed=42) * salt_n).cast("int")
    )
    salted_right = right.withColumn(
        "__gs_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return salted_left.join(salted_right, [on, "__gs_salt"], how).drop("__gs_salt")
