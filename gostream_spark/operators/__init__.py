"""Composable operator library — the engine's reusable building
blocks (SURVEY.md §7: "a module of composable query functions over
DataFrames").

Each operator is a DataFrame → DataFrame transformation shared by the
batch query catalog (``gostream_spark.queries``) and the streaming
facade (``gostream_spark.streaming``): the event-time helpers return
the same ``window``/``session_window`` expressions in both modes, so
the batch oracle checks certify the streaming semantics.
"""

from gostream_spark.operators.dedup import keep_first
from gostream_spark.operators.event_windows import (
    session_windowed,
    sliding_windowed,
    tumbling_windowed,
)
from gostream_spark.operators.ranking import topk, topk_per_group, topk_ranked
from gostream_spark.operators.asof import asof_join
from gostream_spark.operators.prefix_join import prefix_filtered_jaccard_pairs

__all__ = [
    "keep_first",
    "tumbling_windowed",
    "sliding_windowed",
    "session_windowed",
    "topk",
    "topk_per_group",
    "topk_ranked",
    "asof_join",
    "prefix_filtered_jaccard_pairs",
]
