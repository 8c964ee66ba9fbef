"""Event-time window operators (SURVEY.md §2.7 T1-T3) — shared by the
batch query catalog and the streaming facade.

The same ``window`` / ``session_window`` expressions compute identical
epoch-aligned buckets in batch and streaming execution; only the
watermark (streaming-side late-data bound) differs. Keeping the bucket
logic here is what lets the DuckDB batch oracles certify the streaming
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_windowed(
    df: DataFrame,
    ts: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """T1: non-overlapping event-time buckets of ``duration``,
    epoch-aligned. One hash aggregate; bucket assignment is map-side."""
    return df.groupBy(F.window(ts, duration).alias("w"), *keys).agg(*aggs)


def sliding_windowed(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """T2: overlapping buckets — each row lands in duration/slide
    windows; the fan-out collapses in the partial aggregate before the
    shuffle."""
    return df.groupBy(F.window(ts, duration, slide).alias("w"), *keys).agg(*aggs)


def session_windowed(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """T3: gap-based sessions per key; window end = last event + gap.
    State per key is bounded by open sessions, not events."""
    return df.groupBy(F.session_window(ts, gap).alias("w"), *keys).agg(*aggs)
