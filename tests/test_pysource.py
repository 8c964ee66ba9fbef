"""Unit + integration tests for the custom Python DataSource
(gostream_spark/pysource.py): pushdown narrowing, partition planning,
deterministic replay."""

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from gostream_spark.pysource import (
    TYPES,
    _SynthReader,
    _SynthStreamReader,
    ensure_registered,
)


def test_pushdown_narrows_generated_range():
    r = _SynthReader({"rows": "1000", "numpartitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 100),
                LessThan(("event_id",), 900),
                IsNotNull(("etype",)),  # not ours -> handed back to Spark
            ]
        )
    )
    assert (r.lo, r.hi) == (100, 900)
    assert len(leftover) == 1 and isinstance(leftover[0], IsNotNull)
    parts = r.partitions()
    ids = [i for p in parts for i in range(p.start, p.end)]
    assert ids == list(range(100, 900)), "generation must skip pruned rows"


def test_pushdown_equality_and_exclusive_bounds():
    r = _SynthReader({"rows": "50"})
    assert list(r.pushFilters([EqualTo(("event_id",), 7)])) == []
    assert (r.lo, r.hi) == (7, 8)
    r2 = _SynthReader({"rows": "50"})
    assert list(r2.pushFilters([GreaterThan(("event_id",), 10)])) == []
    assert r2.lo == 11


def test_partitions_cover_range_disjointly():
    r = _SynthReader({"rows": "103", "numpartitions": "8"})
    parts = r.partitions()
    ids = sorted(i for p in parts for i in range(p.start, p.end))
    assert ids == list(range(103))
    # degenerate: fully-pruned range still plans (one empty slice)
    r2 = _SynthReader({"rows": "10"})
    list(r2.pushFilters([GreaterThanOrEqual(("event_id",), 99)]))
    parts2 = r2.partitions()
    assert sum(p.end - p.start for p in parts2) == 0


def test_stream_reader_offsets_and_replay():
    sr = _SynthStreamReader({"rows": "10", "batch": "4"})
    off = sr.initialOffset()
    seen = []
    for _ in range(5):  # past exhaustion: empty batches, stable offset
        rows, off = sr.read(off)
        seen.extend(rows)
    assert [r[0] for r in seen] == list(range(10))
    assert off == {"pos": 10}
    replay = list(sr.readBetweenOffsets({"pos": 4}, {"pos": 8}))
    assert replay == seen[4:8], "replay-between-offsets must be exact"


def test_batch_read_end_to_end(spark):
    ensure_registered(spark)
    df = (
        spark.read.format("gostream_synth")
        .option("rows", 500)
        .option("numPartitions", 4)
        .load()
    )
    assert df.count() == 500
    row = df.filter(F.col("event_id") == 13).first()
    assert (row.bucket, row.etype, row.amount) == (13, TYPES[3], (13 * 13) % 997)


def _fake_rows(n, base=0):
    from pyspark.sql import Row

    return [Row(event_id=base + i, v=i % 3) for i in range(n)]


def test_batch_writer_two_phase_commit(tmp_path):
    import glob
    import os

    from gostream_spark.pysource import _JsonlWriter

    out = str(tmp_path / "sink")
    os.makedirs(out)
    w = _JsonlWriter({"path": out}, overwrite=True)
    m1 = w.write(iter(_fake_rows(5)))
    m2 = w.write(iter(_fake_rows(3, base=100)))
    # staged only — nothing visible in the sink root yet
    assert glob.glob(os.path.join(out, "*.jsonl")) == []
    w.commit([m1, m2])
    files = glob.glob(os.path.join(out, "*.jsonl"))
    assert len(files) == 2
    assert sum(1 for p in files for _ in open(p)) == 8
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_batch_writer_abort_leaves_sink_untouched(tmp_path):
    import glob
    import os

    from gostream_spark.pysource import _JsonlWriter

    out = str(tmp_path / "sink")
    os.makedirs(out)
    w = _JsonlWriter({"path": out}, overwrite=False)
    m = w.write(iter(_fake_rows(4)))
    w.abort([m, None])
    assert glob.glob(os.path.join(out, "*.jsonl")) == []
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_stream_writer_replayed_batch_is_idempotent(tmp_path):
    import glob
    import os

    from gostream_spark.pysource import _JsonlStreamWriter

    out = str(tmp_path / "sink")
    os.makedirs(out)
    w = _JsonlStreamWriter({"path": out})
    m = w.write(iter(_fake_rows(5)))
    w.commit([m], batchId=7)
    first = sorted(glob.glob(os.path.join(out, "batch-7-*.jsonl")))
    assert len(first) == 1
    # checkpoint-recovery replay of the same batch: new staged shard,
    # same batchId — the manifest marker must swallow the duplicate
    m2 = w.write(iter(_fake_rows(5)))
    w.commit([m2], batchId=7)
    assert sorted(glob.glob(os.path.join(out, "batch-7-*.jsonl"))) == first
    assert glob.glob(os.path.join(out, "_staging", "*")) == []
