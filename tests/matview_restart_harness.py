"""Subprocess half of the driver-loss exactly-once test (see
test_streaming.py::test_matview_survives_whole_driver_kill).

Runs the incremental-matview stream in ITS OWN driver process so the
parent test can prove recovery from losing the entire driver — not
just a failed task or batch. In `crash` mode the process hard-kills
its JVM with Runtime.halt() (bypassing every Spark shutdown hook —
no graceful query stop, no checkpoint finalization beyond what each
micro-batch already fsync'd) right after the second version commit;
in `recover` mode it runs the same query on the same checkpoint +
mv_root to completion.

Usage: python matview_restart_harness.py {crash|recover} STAGE MV CKPT
Exit codes: crash mode exits nonzero (the dead JVM tears the client
down); recover mode exits 0 iff the stream finished.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode, stage, mv_root, ckpt = sys.argv[1:5]

    from pyspark.sql import SparkSession

    from gostream_spark.queries.streaming_queries import make_matview_merger

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"matview_restart_{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    state, merge = make_matview_merger(mv_root)
    committed = {"n": 0}

    def sink(batch_df, batch_id: int) -> None:
        merge(batch_df, batch_id)
        committed["n"] += 1
        if mode == "crash" and committed["n"] == 2:
            # Hard driver kill: halt() skips ALL JVM shutdown hooks, so
            # nothing gets a chance to stop the query cleanly or write
            # a commit marker for the in-flight batch.
            spark._jvm.java.lang.Runtime.getRuntime().halt(137)

    q = (
        spark.readStream.schema("event_id long, event_type string, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    except Exception:
        # crash mode: the JVM is gone; the client connection error IS
        # the expected outcome.
        return 3
    if not finished:
        return 4
    q.stop()
    spark.stop()
    print(f"HARNESS_DONE current={state['current']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
