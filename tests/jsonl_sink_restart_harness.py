"""Subprocess half of the jsonl-stream-sink driver-loss test (see
test_pysource.py::test_jsonl_stream_sink_survives_whole_driver_kill).

Runs the synthetic Python stream source into the 2PC jsonl sink in
its OWN driver process. In `crash` mode the main thread watches the
sink directory and hard-kills the JVM (Runtime.halt(), no shutdown
hooks) as soon as two batch manifests have committed — so the stream
dies with committed batches, possibly staged shards, and an
uncommitted checkpoint tail. In `recover` mode it runs the same
query on the same checkpoint + sink until every row is committed.

Usage: python jsonl_sink_restart_harness.py {crash|recover} OUT CKPT ROWS
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode, out, ckpt = sys.argv[1:4]
    rows = int(sys.argv[4])

    from pyspark.sql import SparkSession

    from gostream_spark.pysource import ensure_registered
    from gostream_spark.queries.python_datasource import open_shards

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"jsonl_sink_restart_{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_registered(spark)
    os.makedirs(out, exist_ok=True)
    stream = (
        spark.readStream.format("gostream_synth")
        .option("rows", rows)
        .option("batch", 500)
        .load()
        .select("event_id", "bucket", "amount")
    )
    q = (
        stream.writeStream.format("gostream_jsonl")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    deadline = time.time() + 180
    try:
        while time.time() < deadline:
            if mode == "crash":
                if len(glob.glob(os.path.join(out, "_batch-*.manifest"))) >= 2:
                    # Hard driver kill: no shutdown hooks, no graceful
                    # stop — the sink is left mid-protocol.
                    spark._jvm.java.lang.Runtime.getRuntime().halt(137)
            else:
                if sum(1 for _ in open_shards(out)) >= rows:
                    q.stop()
                    spark.stop()
                    print("HARNESS_DONE")
                    return 0
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.1)
    except Exception:
        return 3
    finally:
        try:
            q.stop()
        except Exception:
            pass
    return 4  # deadline without reaching the mode's goal


if __name__ == "__main__":
    raise SystemExit(main())
