"""Streaming sources (SURVEY.md §2.1 S2) — the spout equivalents.

``file_stream`` replays a bounded fixture table as a stream (the
standard replay harness for deterministic streaming tests; at
production scale the same code points at a continuously-appended
directory or a Kafka source). Schema comes from a one-off batch read
of the same file — streaming file sources require an explicit schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import TABLES, ensure_session_conf, table_path


def _is_directory(spark: SparkSession, path: str) -> bool:
    """Directory check through the HADOOP FileSystem API, so the
    file-vs-directory table-layout dispatch works on any filesystem a
    Spark path can name (s3a://, hdfs://, ...), not just the driver's
    local disk — os.path.isdir on an object-store URI is always False
    and would silently mis-route directory tables back into the
    0-row name-glob bug this dispatch exists to fix. Falls back to
    os.path for environments without JVM access."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.getFileStatus(hpath).isDirectory())
    except Exception:
        return os.path.isdir(path)


def file_stream(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S2: file-based stream over one fixture table. Applies the same
    nanos→micros timestamp normalization as the batch reader so batch
    and streaming pipelines see identical schemas."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # see io.ensure_session_conf: engine must work under any caller session
    ensure_session_conf(spark, events=name == "events")
    path = table_path(sf_dir, name)
    schema = spark.read.parquet(path).schema
    # The streaming file source wants a directory. Two layouts exist:
    # a single-FILE table (the driver fixtures) is scoped inside its
    # parent dir with a name glob; a DIRECTORY table (the real-world
    # layout — every production table is a directory of part files,
    # and tools/restage_sharded.py's determinism axis) streams the
    # directory itself, every shard included.
    if _is_directory(spark, path):
        reader = spark.readStream.schema(schema).option(
            "pathGlobFilter", "*.parquet"
        )
        stream_path = path
    else:
        reader = spark.readStream.schema(schema).option(
            "pathGlobFilter", f"{name}.parquet"
        )
        stream_path = sf_dir.rstrip("/")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(stream_path)
    if name == "events" and dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S2: synthetic tick source (the reference's tick-tuple spout) —
    columns (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
