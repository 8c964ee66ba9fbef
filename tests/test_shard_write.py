"""Training-shard writer discipline: `corpus_shuffle_order` assigns
(shard, pos); the writer must produce one directory per shard whose
files hold rows in pos order — that file layout IS the reproducible
training order contract (readers stream shard dirs in order, no
shuffle, no sort at read time)."""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import duckdb

from gostream_spark.registry import get_query

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_shard_write_produces_sorted_shard_files(spark, sf_dir):
    order = get_query("corpus_shuffle_order").fn(spark, sf_dir)
    out = os.path.join(TMP, f"shardwrite-{uuid.uuid4().hex[:8]}")
    (
        order.repartition("shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    try:
        n_shards = order.select("shard").distinct().count()
        shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
        assert len(shard_dirs) == n_shards
        con = duckdb.connect()
        total = 0
        for d in shard_dirs:
            files = glob.glob(os.path.join(d, "*.parquet"))
            # repartition("shard") gives each shard to exactly one task
            assert len(files) == 1, d
            rows = con.execute(
                f"SELECT pos FROM read_parquet('{files[0]}')"
            ).fetchall()
            poses = [r[0] for r in rows]
            # file order IS pos order, and poses are the contiguous
            # 1..N ranks the window assigned
            assert poses == sorted(poses) == list(range(1, len(poses) + 1)), d
            total += len(poses)
        n_docs = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        assert total == n_docs
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_range_partitioned_write_is_globally_ordered(spark, sf_dir):
    """Time-ordered export discipline: `repartitionByRange(ts)` +
    `sortWithinPartitions(ts)` yields globally-ordered output across
    shard files WITHOUT a single-task global sort — each task sorts
    its range, ranges don't overlap (equal keys never straddle a
    boundary). The layout a downstream consumer can merge-read in
    time order."""
    from gostream_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_id")
    out = os.path.join(TMP, f"rangewrite-{uuid.uuid4().hex[:8]}")
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    try:
        files = glob.glob(os.path.join(out, "part-*.parquet"))
        assert len(files) == 8
        con = duckdb.connect()
        stats, total = [], 0
        for f in files:
            row = con.execute(
                "SELECT min(ts), max(ts), count(*), "
                "count(*) = 0 OR (SELECT bool_and(ok) FROM ("
                "  SELECT ts >= lag(ts) OVER (ORDER BY rowid) AS ok"
                f"  FROM (SELECT row_number() OVER () AS rowid, ts FROM read_parquet('{f}'))"
                ") WHERE ok IS NOT NULL) "
                f"FROM read_parquet('{f}')"
            ).fetchone()
            if row[2] == 0:
                continue
            assert row[3], f"rows inside {f} are not ts-sorted"
            stats.append((row[0], row[1]))
            total += row[2]
        assert total == ev.count()
        stats.sort()
        for (lo1, hi1), (lo2, hi2) in zip(stats, stats[1:]):
            assert hi1 <= lo2, "shard ranges overlap — global order broken"
    finally:
        shutil.rmtree(out, ignore_errors=True)
