"""Subprocess half of the STATE-SCHEMA-EVOLUTION pin (see
test_streaming.py::test_state_schema_evolution_is_refused_then_replayed).

A 100 TB deployment will eventually redeploy a stateful query with a
CHANGED state schema against an existing checkpoint. This harness pins
what Spark actually does (VERDICT r8 #5) so the operational playbook
in SCALE.md rests on observed behavior, not doc-reading:

- ``v1``: run the running-count ``applyInPandasWithState`` query
  (state = struct<cnt:long>) over the staged files to completion,
  leaving a checkpoint with committed state.
- ``v2``: rerun on the SAME checkpoint with an EXTENDED state struct
  (struct<cnt:long, last_event:long>) — the minimal additive
  evolution a real redeploy ships. Prints the resulting exception
  class/message markers to stdout for the test to pin.
- ``v2fresh``: the documented playbook — same v2 code against a FRESH
  checkpoint, replaying the retained source from scratch; exits 0
  with correct final counts.

Usage: python schema_evolution_harness.py {v1|v2|v2fresh} STAGE OUT CKPT
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode, stage, out, ckpt = sys.argv[1:5]

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"schema_evolution_{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    os.makedirs(out, exist_ok=True)

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("n_events", LongType())]
    )
    if mode == "v1":
        state_schema = StructType([StructField("cnt", LongType())])

        def fn(key, pdfs, state: GroupState):
            (cnt,) = state.get if state.exists else (0,)
            for pdf in pdfs:
                cnt += len(pdf)
            state.update((cnt,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt]})

    else:
        # v2: additive evolution — track the max event_id seen as well.
        state_schema = StructType(
            [StructField("cnt", LongType()), StructField("last_event", LongType())]
        )

        def fn(key, pdfs, state: GroupState):
            cnt, last = state.get if state.exists else (0, -1)
            for pdf in pdfs:
                cnt += len(pdf)
                if len(pdf):
                    last = max(last, int(pdf["event_id"].max()))
            state.update((cnt, last))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt]})

    sdf = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    res = sdf.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out, f"b{batch_id}"))

    q = (
        res.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    except Exception as exc:  # pin whatever Spark raises
        print(f"HARNESS_EXC_TYPE={type(exc).__name__}")
        print(f"HARNESS_EXC_MSG={str(exc)[:2000]}")
        return 5
    if not finished:
        return 4
    q.stop()
    spark.stop()
    print("HARNESS_DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
