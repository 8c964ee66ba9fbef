"""Scalar function families (SURVEY.md §2.3, F1-F7) as registered
queries — one per family, each touching the representative built-ins
over the fixture columns. All pure Column expressions: JVM-side,
inside whole-stage codegen, filter/projection pushdown preserved.

Cross-engine notes (see also gostream_spark.functions):
- weekday: Spark ``weekday`` (Mon=0) vs DuckDB ``isodow - 1``.
- natural log: Spark ``log`` == DuckDB ``ln``.
- only md5/sha2 hash identically across engines; xxhash64 is
  Spark-internal (used for partitioning/dedup keys, not comparisons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.functions import array_sum
from gostream_spark.io import load_table
from gostream_spark.registry import register

# --- F1 string functions ------------------------------------------------

_F1_ORACLE = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring(p_name, 1, 5) AS name_head,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       p_name LIKE '%widget%' AS is_widget
FROM part
"""


@register("string_functions", oracle=_F1_ORACLE, tags=("F1",))
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: upper/length/substring/concat_ws/regexp_extract/
    regexp_replace/LIKE over part names."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").like("%widget%").alias("is_widget"),
    )


# --- F2 date/time functions --------------------------------------------

_F2_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       isodow(o_orderdate) - 1 AS order_weekday,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch0,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
FROM orders
"""


@register("datetime_functions", oracle=_F2_ORACLE, tags=("F2",))
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: year/month/weekday/date_trunc/datediff/date_add/
    unix_timestamp over order dates (UTC session TZ keeps epoch math
    identical across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.weekday("o_orderdate").alias("order_weekday"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


# --- F3 math functions --------------------------------------------------

_F3_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 4) AS disc_dev,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       round(sqrt(l_extendedprice), 4) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       l_orderkey % 7 AS key_mod
FROM lineitem
"""


@register("math_functions", oracle=_F3_ORACLE, tags=("F3",))
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: abs/floor/ceil/pow/sqrt/ln/pmod over lineitem measures.
    Results of transcendental fns are rounded — IEEE754 guarantees
    sqrt exactly but pow/ln only faithfully, so the last ulp may
    differ across libm builds."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod"),
    )


# --- F4 JSON functions --------------------------------------------------

_F4_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
FROM events
"""


@register("json_functions", oracle=_F4_ORACLE, tags=("F4",))
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: semi-structured access — get_json_object / from_json over
    the events.props JSON payload (the reference's dynamic tuple
    fields; SURVEY §1.2). from_json parses once into a struct; the
    JSON never leaves the JVM."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


# --- F5 array functions -------------------------------------------------

_F5_ORACLE = """
SELECT vec_id, label,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4)
         AS vec_sum,
       round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 4)
         AS head_sum,
       round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_dim
FROM embeddings
"""


@register("array_functions", oracle=_F5_ORACLE, tags=("F5",))
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: size/element_at/slice/aggregate fold over the 64-dim
    embedding vectors. Elements are cast to float64 BEFORE folding so
    both engines accumulate identically in array order."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        F.round(array_sum(F.col("embedding")), 4).alias("vec_sum"),
        F.round(array_sum(F.slice("embedding", 1, 8)), 4).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
    )


# --- F6 map/struct functions -------------------------------------------

_F6_ORACLE = """
SELECT doc_id,
       lang AS meta_lang,
       concat(lang, ':', source) AS lang_source,
       n_chars AS meta_chars,
       source AS via_map
FROM documents
"""


@register("struct_map_functions", oracle=_F6_ORACLE, tags=("F6",))
def struct_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: struct/map construction and field access — the typed-
    metadata pattern for multimodal columns (L9): pack columns into a
    struct / map, operate, unpack. The oracle checks the round-trip
    (pack→access ≡ identity), since DuckDB's struct literals aren't
    the surface under test."""
    docs = load_table(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta_map"),
    )
    return packed.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.concat(F.col("meta.lang"), F.lit(":"), F.col("meta.source")).alias("lang_source"),
        F.col("meta.n_chars").alias("meta_chars"),
        F.element_at("meta_map", "source").alias("via_map"),
    )


# --- F7 hash functions --------------------------------------------------

_F7_ORACLE = """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
"""


@register("hash_functions", oracle=_F7_ORACLE, tags=("F7",))
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: cryptographic hashes (md5/sha2-256 agree across engines by
    definition). The engine also exposes xxhash64 for partitioning and
    dedup keys — cheaper, but Spark-internal, so it never appears in a
    cross-engine comparison (FIXTURES.md gotchas)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


# --- F4/P6 ext: malformed-record routing (dead-letter queue) ------------

_DLQ_ORACLE = """
WITH mangled AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 5)
              ELSE props END AS raw
  FROM events
), routed AS (
  SELECT event_type, raw,
         COALESCE(json_valid(raw), FALSE) AS ok,
         CASE WHEN COALESCE(json_valid(raw), FALSE)
              THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
  FROM mangled
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_parsed,
       CAST(count(*) FILTER (WHERE NOT ok) AS BIGINT) AS n_dead_letter,
       CAST(COALESCE(sum(k) FILTER (WHERE ok), 0) AS BIGINT) AS k_sum
FROM routed GROUP BY event_type
"""


@register("dlq_malformed_json_routing", oracle=_DLQ_ORACLE, tags=("F4", "P6", "ext"))
def dlq_malformed_json_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing for malformed records — the production
    ingest pattern: parse what parses, quarantine what doesn't,
    never fail the job. A deterministic 1-in-7 of the fixture's JSON
    payloads is truncated to simulate upstream corruption;
    ``from_json`` with a ``columnNameOfCorruptRecord`` captures those
    verbatim in a corrupt-record column, and its null-ness IS the
    routing predicate — good rows
    contribute their parsed value, bad rows increment the per-type
    dead-letter count that an operator would alert on. All JVM-side
    expression work in one aggregation pass; at scale the DLQ rows
    themselves would fork to a quarantine sink via the same predicate
    (see the two-phase `gostream_jsonl` sink for the write side)."""
    ev = load_table(spark, sf_dir, "events")
    mangled = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0, F.substring(F.col("props"), 1, 5)
        )
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    # PERMISSIVE from_json yields an all-null STRUCT (not a null) for
    # corrupt input, so null-testing the struct can't route; the
    # canonical detector is columnNameOfCorruptRecord — corrupt rows
    # carry their raw text there, parsed rows leave it null.
    parsed = mangled.select(
        "event_type",
        "raw",
        F.from_json(
            "raw",
            "k BIGINT, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    )
    # a NULL payload is a MISSING record, not valid JSON — route it to
    # the dead letter side explicitly (from_json(NULL) yields a NULL
    # struct whose corrupt-record column is also NULL, which would
    # otherwise count it as parsed; DuckDB's json_valid(NULL) is NULL,
    # which would count it as neither — the explicit rule is the only
    # cross-engine-stable one)
    ok = F.col("raw").isNotNull() & F.col("j._corrupt_record").isNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.when(ok, 1)).cast("long").alias("n_parsed"),
        F.count(F.when(~ok, 1)).cast("long").alias("n_dead_letter"),
        # NULL-free output (engine convention): a group whose parsed
        # rows carry no k sums to 0, not NULL
        F.coalesce(F.sum(F.when(ok, F.col("j.k"))), F.lit(0))
        .cast("long")
        .alias("k_sum"),
    )
