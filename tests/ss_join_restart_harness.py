"""Subprocess half of the STREAM-STREAM JOIN driver-loss test (see
test_streaming.py::test_stream_stream_join_survives_whole_driver_kill).

The r8 harnesses proved whole-driver-loss exactly-once for the matview
sink, the 2PC jsonl sink, and ``applyInPandasWithState`` state; this
one covers the last state surface: SYMMETRIC JOIN STATE. A watermarked
full-outer stream-stream join (the exact shape of
``streaming_stream_stream_full_join`` — both-side eviction, interval
condition) keeps four state stores per partition (left/right
keyToNumValues / keyWithIndexToValue); the driver is hard-killed with
``Runtime.halt()`` after the join state for batch 2 has committed but
before the sink writes batch 2. A fresh driver on the same checkpoint
must reload the last COMMITTED state version (post-batch-1), replay
batch 2 against it — NOT against the crashed attempt's orphaned
version (which would double-insert batch 2's rows into both sides'
join state and emit duplicate matches) — and finish with sink
contents identical to an uninterrupted run.

Usage: python ss_join_restart_harness.py {crash|recover|clean}
       STAGE OUT CKPT [STORE]
STORE is ``hdfs`` (default) or ``rocksdb``; all processes of one test
must agree. ``clean`` runs the same pipeline with no kill (callers
point it at a FRESH out/ckpt) to produce the equivalence baseline.
Exit codes: crash exits nonzero (halt() tears the client down);
recover/clean exit 0 iff the stream finished.
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

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.master("local[2]")
        .appName(f"ss_join_restart_{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    spark = builder.getOrCreate()
    os.makedirs(out, exist_ok=True)

    def sink(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.count()  # action: join-state versions commit HERE
            if mode == "crash" and batch_id == 2:
                # Hard driver kill between state commit and sink write
                # (same failure point as stateful_restart_harness.py):
                # halt() skips ALL JVM shutdown hooks, so neither the
                # commit log nor the sink sees batch 2, but all four
                # symmetric-join state stores already durably wrote a
                # version for it.
                spark._jvm.java.lang.Runtime.getRuntime().halt(137)
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"b{batch_id}")
            )
        finally:
            batch_df.unpersist()

    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def side(event_type: str, id_alias: str, user_alias: str, ts_alias: str):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user_alias),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    p = side("purchase", "purchase_id", "p_user", "p_ts")
    c = side("click", "click_id", "c_user", "c_ts")
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "full_outer",
    ).select(
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
    )

    q = (
        joined.writeStream.foreachBatch(sink)
        .outputMode("append")
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
