"""Subprocess half of the STATE-STORE driver-loss test (see
test_streaming.py::test_stateful_state_survives_whole_driver_kill).

The matview / jsonl-sink driver-kill tests prove the SINK side of
exactly-once across whole-driver loss; this harness proves the STATE
side: an ``applyInPandasWithState`` running-count query (per-key
cumulative state in the HDFS-backed state store under the checkpoint)
is hard-killed with ``Runtime.halt()`` — no shutdown hooks, no
graceful stop, no state-store maintenance pass — AFTER the state
store has committed a batch's state version (forced by an action on
the batch inside foreachBatch) but BEFORE the sink writes that batch.
A fresh driver process on the same checkpoint must reload the
recovered state version and continue the per-key counts from it, not
from zero and not from the orphaned post-crash version.

Usage: python stateful_restart_harness.py {crash|recover} STAGE OUT CKPT [STORE]
STORE is ``hdfs`` (default) or ``rocksdb`` — the provider a 100 TB
deployment actually runs; both processes of a pair must agree.
Exit codes: crash mode exits nonzero (the halted JVM tears the Python
client down); recover mode exits 0 iff the stream finished.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def main() -> int:
    mode, stage, out, ckpt = sys.argv[1:5]
    store = sys.argv[5] if len(sys.argv) > 5 else "hdfs"
    partitions = sys.argv[6] if len(sys.argv) > 6 else "4"

    from pyspark.sql import SparkSession

    from gostream_spark.streaming.ops import running_count_stateful

    builder = (
        SparkSession.builder.master("local[2]")
        .appName(f"stateful_restart_{mode}")
        .config("spark.sql.shuffle.partitions", partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
        ).config(
            # Changelog checkpointing is the at-scale recovery path:
            # per-batch deltas to the checkpoint, snapshots in the
            # background — exactly what halt() must not corrupt.
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    spark = builder.getOrCreate()
    os.makedirs(out, exist_ok=True)

    def sink(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.count()  # action: upstream state version commits HERE
            if mode == "crash" and batch_id == 2:
                # Hard driver kill between state commit and sink write:
                # halt() skips ALL JVM shutdown hooks, so neither the
                # query's commit log nor the sink sees batch 2 — but
                # the state store already durably wrote a version for
                # it. Recovery must replay batch 2 against the LAST
                # COMMITTED state (post-batch-1), not the orphan.
                spark._jvm.java.lang.Runtime.getRuntime().halt(137)
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"b{batch_id}")
            )
        finally:
            batch_df.unpersist()

    sdf = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        running_count_stateful(sdf)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    except Exception:
        # crash mode: the JVM is gone; the client error IS the outcome.
        return 3
    if not finished:
        return 4
    q.stop()
    spark.stop()
    print("HARNESS_DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
