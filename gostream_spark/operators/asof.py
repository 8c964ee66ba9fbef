"""As-of join (SURVEY.md §2.5 J7) — latest right-side row at or
before each left-side row's timestamp, per key.

Implemented as union + running ``last(ignorenulls)`` window, NOT a
pairwise time-range join: one shuffle on the key, one sort per
partition — O(n log n) per key, no quadratic blow-up when a key has
many events. This is the form that survives 100 TB; DuckDB's native
ASOF JOIN is the oracle-side equivalent (SURVEY §2.5), though the
registered oracle mirrors this window form exactly to pin tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    key: str,
    ts: str,
    probe_filter,
    build_filter,
    carry: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Self as-of join over one event stream: for each row matching
    ``probe_filter``, attach the latest earlier-or-equal (``direction
    = "backward"``) or earliest later-or-equal (``"forward"``) row
    matching ``build_filter`` (same key). ``carry`` columns are taken
    from the build row as ``asof_<col>``. Rows are ordered by (ts,
    then all carry columns) to keep ties deterministic; both
    directions are the same one-shuffle window plan, mirrored."""
    tagged = events.filter(probe_filter | build_filter)
    order = Window.partitionBy(key).orderBy(ts, *carry)
    if direction == "backward":
        w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    elif direction == "forward":
        w = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carried = [
        pick(F.when(build_filter, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(f"asof_{c}")
        for c in carry
    ]
    return tagged.select("*", *carried).filter(probe_filter)
