"""Invariant tests for the data-skipping pair (`file_stats_manifest`,
`zorder_skipping_effectiveness`) — the exact values are oracle-checked
in parity; these pin the CLAIMS the queries exist to demonstrate:
time predicates prune a time-ordered log hard, unclustered predicates
barely prune it, and z-order bounds the worst case across both
interleaved dimensions."""

from __future__ import annotations

from gostream_spark.registry import get_query


def test_manifest_pruning_asymmetry(spark, sf_dir):
    rows = get_query("file_stats_manifest").fn(spark, sf_dir).collect()
    assert rows, "manifest must cover at least one file"
    n = len(rows)
    day_pruned = sum(r["prune_day"] for r in rows)
    uid_pruned = sum(r["prune_uid"] for r in rows)
    # Fixture events span ~30 days; a 3-day window must prune most files.
    assert day_pruned > n * 0.5, (day_pruned, n)
    # user_id is unclustered in arrival order: 512-row files almost
    # always straddle the [0, 2] band, so the band prunes (almost)
    # nothing — the motivating failure for the z-order twin.
    assert uid_pruned <= n * 0.1, (uid_pruned, n)
    # A file with unknown stats (sentinel) is never pruned.
    for r in rows:
        if r["uid_lo"] == -1:
            assert r["prune_uid"] == 0
    # Manifest accounting: every file is non-empty and stats are ordered.
    for r in rows:
        assert r["n_rows"] > 0
        assert r["uid_lo"] <= r["uid_hi"]


def test_zorder_bounds_worst_case(spark, sf_dir):
    by_layout = {
        r["layout"]: r
        for r in get_query("zorder_skipping_effectiveness").fn(spark, sf_dir).collect()
    }
    lin, zo = by_layout["linear"], by_layout["zorder"]
    # Same rows placed, both layouts.
    assert lin["rows_total"] == zo["rows_total"] > 0
    assert lin["n_files"] == 16 and zo["n_files"] == 16
    # Linear layout: x-band optimal (1 file), y-band catastrophic (all).
    assert lin["files_scanned_x"] == 1
    assert lin["files_scanned_y"] == lin["n_files"]
    # Z-order: BOTH bands bounded well below the full scan; the x-band
    # gives up its single-file optimum — that's the trade.
    assert zo["files_scanned_x"] <= zo["n_files"] // 2
    assert zo["files_scanned_y"] <= zo["n_files"] // 2
    assert zo["files_scanned_x"] > lin["files_scanned_x"]
    # Skipping is sound: scanned rows can never undercount the band.
    assert zo["rows_scanned_y"] <= lin["rows_scanned_y"]
