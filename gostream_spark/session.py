"""SparkSession construction tuned for both local test scale and the
100 TB design point.

Local mode knobs (shuffle partitions ~ cores, AQE on) follow public
Spark guidance; on a real cluster the same builder works — AQE
coalesces the shuffle partitions at runtime, so a large static
``spark.sql.shuffle.partitions`` is safe at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gostream_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults: ``local[$SPARK_GRAFT_CPUS or *]``, AQE enabled (runtime
    re-planning: partition coalescing, skew-join splitting, broadcast
    demotion/promotion), UTC session timezone (required for oracle
    parity — DuckDB timestamps are UTC-naive), Arrow enabled for the
    pandas interchange used by the vectorized operators.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read it as raw nanos (io.load_table converts
        # to a microsecond TimestampType column).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
