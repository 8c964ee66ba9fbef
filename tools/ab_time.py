#!/usr/bin/env python
"""A/B timing harness for optimization candidates (guide §1): time
several DataFrame-producing callables in ONE session, interleaved
(A,B,...,A,B,...) with the bench methodology (noop sink, warm-up pass,
min of N trials) so JVM warm-up and page-cache state cannot favor
either arm. Not a registered tool — a measurement utility for
optimization rounds.

Usage: import from a scratch script; see ab() below.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def ab(variants: dict, trials: int = 3, label: bool = True) -> dict[str, list[float]]:
    """variants: name -> zero-arg callable returning a DataFrame.
    Returns name -> chronological trial seconds (incl. plan build).
    Interleaves trials across variants; one untimed warm-up each."""
    names = list(variants)
    out: dict[str, list[float]] = {n: [] for n in names}
    spark = None
    for n in names:
        df = variants[n]()
        spark = df.sparkSession
        if label:
            spark.sparkContext.setJobDescription(f"warmup:{n}")
        df.write.format("noop").mode("overwrite").save()
    for t in range(trials):
        for n in names:
            # ADVICE r16: the session comes from the warm-up pass — the
            # old form built a throwaway DataFrame per trial just to
            # reach sparkSession. Plan construction stays INSIDE the
            # timed region per the docstring.
            if label:
                spark.sparkContext.setJobDescription(f"trial{t}:{n}")
            t0 = time.perf_counter()
            variants[n]().write.format("noop").mode("overwrite").save()
            out[n].append(round(time.perf_counter() - t0, 3))
    for n in names:
        ts = out[n]
        print(f"{n:40s} min={min(ts):7.3f}  trials={ts}")
    return out


def explain_counts(df: DataFrame) -> dict:
    """Shuffle/scan/codegen counts from the formatted plan string."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    txt = df._jdf.queryExecution().explainString(mode)
    return {
        "exchanges": txt.count("Exchange"),
        "scans": txt.count("Scan parquet"),
        "smj": txt.count("SortMergeJoin"),
        "bhj": txt.count("BroadcastHashJoin"),
        "sorts": txt.count("Sort ["),
        "text": txt,
    }
