"""Composed analytics demos — end-user queries built entirely from
the engine's primitives (the 'would a reference user switch?' test):
conversion funnel, N-day retention, per-segment event mix. Each is a
multi-operator composition (joins + windows + event-time buckets)
with an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.parity import TS_FMT_DUCK, dec2, ts_str
from gostream_spark.registry import register

# --- signup -> purchase funnel ------------------------------------------

_FUNNEL_ORACLE = f"""
WITH first_signup AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), converted AS (
  SELECT DISTINCT s.user_id
  FROM first_signup s JOIN events p
    ON p.user_id = s.user_id
   AND p.event_type = 'purchase'
   AND p.ts >= s.signup_ts
   AND p.ts <= s.signup_ts + INTERVAL 7 DAY
)
SELECT strftime(date_trunc('day', s.signup_ts), '{TS_FMT_DUCK}') AS signup_day,
       count(*) AS signups,
       count(c.user_id) AS converted_7d
FROM first_signup s LEFT JOIN converted c ON s.user_id = c.user_id
GROUP BY 1
"""


@register("funnel_signup_purchase", oracle=_FUNNEL_ORACLE, tags=("demo", "J6", "T1"))
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: per signup-day cohort, how many users made a purchase
    within 7 days of their FIRST signup — first-event aggregation +
    time-bounded self-join + daily bucketing. Scale: both joins key on
    user_id (one shuffle each side); the time bound caps the pair
    fan-out."""
    ev = load_table(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_signup.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
        )
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    return (
        first_signup.join(converted, "user_id", "left")
        .groupBy(ts_str(F.date_trunc("day", F.col("signup_ts"))).alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("signups"),
            F.count("is_conv").alias("converted_7d"),
        )
    )


# --- 7-day retention ----------------------------------------------------

_RETENTION_ORACLE = f"""
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT strftime(a.day, '{TS_FMT_DUCK}') AS day,
       count(*) AS active_users,
       count(b.user_id) AS retained_7d
FROM active a
LEFT JOIN active b
  ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 7 DAY
GROUP BY 1
"""


@register("retention_7d", oracle=_RETENTION_ORACLE, tags=("demo", "J2", "W9"))
def retention_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: of users active on day D, how many were also active on
    D+7 — distinct (user, day) grid self-joined with a +7d key shift.
    One distinct shuffle + one join shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    later = active.select(
        F.col("user_id").alias("b_user"),
        (F.col("day") - F.expr("INTERVAL 7 DAYS")).alias("b_day_minus7"),
    )
    return (
        active.join(
            later,
            (F.col("b_user") == F.col("user_id")) & (F.col("b_day_minus7") == F.col("day")),
            "left",
        )
        .groupBy(ts_str("day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count("b_user").alias("retained_7d"),
        )
    )


# --- per-segment event mix ----------------------------------------------

_MIX_ORACLE = """
SELECT c_mktsegment, event_type,
       count(*) AS event_cnt,
       CAST(floor(CAST(count(*) AS DOUBLE) * 10000
                  / sum(count(*)) OVER (PARTITION BY c_mktsegment)) AS BIGINT)
         AS pct_bp_of_segment
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""


@register("segment_event_mix", oracle=_MIX_ORACLE, tags=("demo", "J9", "W3"))
def segment_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: event-type mix per customer segment with a windowed
    share-of-segment in basis points — broadcast enrich + hash
    aggregate + partition-window normalization. floor of a single
    exact division (not a rounded percentage: count ratios hit
    round-half boundaries where the engines' rounding modes
    disagree)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    counts = (
        ev.join(customer, ev.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
    w = Window.partitionBy("c_mktsegment")
    return counts.select(
        "c_mktsegment",
        "event_type",
        "event_cnt",
        F.floor(
            F.col("event_cnt").cast("double") * 10000 / F.sum("event_cnt").over(w)
        )
        .cast("bigint")
        .alias("pct_bp_of_segment"),
    )


# --- corpus-prep pipeline (the 100 TB training-data job, end to end) ----

_CORPUS_PREP_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, source, text,
         len(string_split(text, ' ')) AS n_tokens,
         40 * least(len(string_split(text, ' ')), 100)
         + CAST(floor(3000.0 * (len(string_split(text, ' '))
                  - len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                  + len(list_distinct(string_split(text, ' '))))
                / len(string_split(text, ' '))) AS BIGINT) AS quality_bp
  FROM documents
  WHERE lang IN ('en', 'fr', 'de')
), qualified AS (
  SELECT * FROM scored WHERE quality_bp >= 5000
), deduped AS (
  SELECT doc_id, lang, source, n_tokens, quality_bp,
         count(*) OVER (PARTITION BY text) AS copies
  FROM qualified
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
)
SELECT lang, source,
       count(*) AS docs_kept,
       CAST(sum(copies - 1) AS BIGINT) AS dups_removed,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(quality_bp) AS DOUBLE) / count(*), 2) AS avg_quality_bp
FROM deduped GROUP BY lang, source
"""


@register("corpus_prep_pipeline", oracle=_CORPUS_PREP_ORACLE, tags=("demo", "L1", "L8"), bench=True)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation job end to end: language filter
    (pushed into the parquet scan) → quality score (row-local array
    math, same integer-basis-points formula as `text_quality_score`)
    → exact content dedup keeping the lowest doc_id → per (lang,
    source) corpus stats. One pipeline, one partial→final aggregate
    for the dedup (keyed on text) plus one tiny aggregate exchange —
    the shape that holds at 100 TB: everything before the dedup is
    embarrassingly parallel map work, and the dedup exchange can key
    on xxhash64(text) so full documents never cross the wire twice."""
    from gostream_spark.queries.llm_text import STOPWORDS, _toks

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "fr", "de")
    )
    toks = _toks()
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    quality_bp = (
        40 * F.least(n, F.lit(100))
        + F.floor(3000.0 * (n - n_stop + n_distinct) / n).cast("bigint")
    ).cast("bigint")
    scored = docs.select(
        "doc_id", "lang", "source", "text",
        n.alias("n_tokens"), quality_bp.alias("quality_bp"),
    ).filter(quality_bp >= 5000)
    # r16: the dedup is a hash AGGREGATE keyed on text — min(struct)
    # picks the lowest-doc_id copy (doc_id leads the struct and is
    # unique, so the comparison never reaches the other fields) and
    # count(*) is the copy count. The old form (count + row_number
    # windows partitioned by text) sorted the full corpus by document
    # text and handed a viral duplicate's entire copy set to one window
    # partition; min/count partial-aggregate map-side, so a million-copy
    # boilerplate page collapses to one row per map task before the
    # exchange — strictly better at the Zipf head — and the sort
    # disappears. Measured at sf0.1: 0.685 s vs 0.780 s interleaved;
    # plan: Window+Sort → HashAggregate (partial→final).
    per_text = scored.groupBy("text").agg(
        F.min(F.struct("doc_id", "lang", "source", "n_tokens", "quality_bp")).alias("k"),
        F.count(F.lit(1)).alias("copies"),
    )
    return per_text.groupBy(
        F.col("k.lang").alias("lang"), F.col("k.source").alias("source")
    ).agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum(F.col("copies") - 1).cast("bigint").alias("dups_removed"),
        F.sum("k.n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("k.quality_bp").cast("double") / F.count(F.lit(1)), 2
        ).alias("avg_quality_bp"),
    )


# --- W2/A1 ext: event-transition matrix ---------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       CAST(10000 * n // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS share_bp
FROM pairs
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE, tags=("W2", "A1", "ext"))
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of user behavior: lag() pairs each
    event with its predecessor per user, one aggregate counts the
    (prev → next) edges, and a window over prev_type yields the
    per-state transition share in exact basis points (integer
    division — no float ratios near hash boundaries). Two shuffles
    (user_id for the lag, pair key for the count) over an input that
    collapses to |types|² rows at the aggregate — the funnel/journey
    building block at any scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("CAST(10000 * n div sum(n) OVER (PARTITION BY prev_type) AS BIGINT)")
        .alias("share_bp"),
    )


# --- A1/F3 ext: population-stability-index drift monitor ----------------

_PSI_ORACLE = """
WITH halves AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 0 ELSE 1 END AS half,
         CASE WHEN value < 0 THEN 0
              WHEN value >= 500 THEN 11
              ELSE CAST(floor(value / 50) + 1 AS BIGINT) END AS bucket
  FROM events WHERE value IS NOT NULL),
grid AS (
  SELECT t.event_type, b.bucket
  FROM (SELECT DISTINCT event_type FROM halves) t,
       (SELECT unnest(range(0, 12)) AS bucket) b),
cnt AS (
  SELECT event_type, bucket,
         count(*) FILTER (half = 0) AS na,
         count(*) FILTER (half = 1) AS nb
  FROM halves GROUP BY 1, 2),
full_grid AS (
  SELECT g.event_type, g.bucket,
         coalesce(c.na, 0) AS na, coalesce(c.nb, 0) AS nb
  FROM grid g LEFT JOIN cnt c
    ON g.event_type = c.event_type AND g.bucket = c.bucket),
tot AS (
  SELECT event_type, sum(na) AS ta, sum(nb) AS tb
  FROM full_grid GROUP BY 1)
SELECT f.event_type,
       round(sum(
         ((f.na + 1.0) / (t.ta + 12) - (f.nb + 1.0) / (t.tb + 12))
         * ln(((f.na + 1.0) / (t.ta + 12)) / ((f.nb + 1.0) / (t.tb + 12)))
       ), 4) AS psi,
       CAST(max(t.ta) AS BIGINT) AS n_first_half,
       CAST(max(t.tb) AS BIGINT) AS n_second_half
FROM full_grid f JOIN tot t USING (event_type)
GROUP BY 1
"""


@register("value_drift_psi", oracle=_PSI_ORACLE, tags=("A1", "F3", "ext"))
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: population stability index of the
    value histogram between the first and second half of the month,
    per event type — the standard feature/label drift gate in a
    training pipeline (PSI > 0.2 ⇒ investigate). Laplace-smoothed
    (+1 per bucket) so empty buckets stay defined; bucket counts are
    exact integers and the only floats are the final smoothed ratios.
    Shape: one scan → one (type, half, bucket) aggregate (map-side
    partial) → broadcast-size grid join; output is |types| rows at
    any input scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    halves = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
        .cast("long")
        .alias("bucket"),
    )
    cnt = halves.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("na"),
        F.count(F.when(F.col("half") == 1, 1)).alias("nb"),
    )
    grid = (
        halves.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(12).select(F.col("id").cast("long").alias("bucket"))
            )
        )
    )
    full_grid = (
        grid.join(cnt, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    tot = full_grid.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    p = (F.col("na") + 1.0) / (F.col("ta") + 12)
    q = (F.col("nb") + 1.0) / (F.col("tb") + 12)
    return (
        full_grid.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"),
            F.max("ta").cast("long").alias("n_first_half"),
            F.max("tb").cast("long").alias("n_second_half"),
        )
    )


# --- W2/L6 ext: user-path trigram mining --------------------------------

_PATH_TRIGRAMS_ORACLE = """
WITH paths AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS path FROM events
  GROUP BY user_id),
tri AS (
  SELECT user_id,
         unnest(list_transform(range(1, len(path) - 1),
                i -> path[i] || ' > ' || path[i+1] || ' > ' || path[i+2]))
           AS trigram
  FROM paths WHERE len(path) >= 3)
SELECT trigram, n, rn FROM (
  SELECT trigram, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, trigram) AS rn
  FROM tri GROUP BY trigram)
WHERE rn <= 20
"""


@register("event_path_trigrams", oracle=_PATH_TRIGRAMS_ORACLE, tags=("W2", "L6", "ext"))
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining: the 20 most common 3-step behavior
    paths across users. Per-user event sequences assemble with ONE
    shuffle (groupBy user, order restored by sorting (ts, event_id)
    structs inside the array — collect_list order is
    partition-arrival, never trust it); trigram expansion is then
    row-local, and the count collapses to |types|³ keys. The same
    assemble-sort-expand shape mines arbitrary k-grams; per-user
    sequence length is the only memory bound (cap with a slice for
    power users at 100 TB)."""
    from pyspark.sql import Window  # noqa: F401  (parallel to siblings)

    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ).alias("path")
        )
        .filter(F.size("path") >= 3)
    )
    tri = paths.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("path") - 2),
                lambda i: F.concat_ws(
                    " > ",
                    F.element_at(F.col("path"), i),
                    F.element_at(F.col("path"), i + 1),
                    F.element_at(F.col("path"), i + 2),
                ),
            )
        ).alias("trigram")
    )
    counts = tri.groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
    from gostream_spark.operators import topk_ranked

    return topk_ranked(counts, 20, F.col("n").desc(), F.col("trigram"))


# --- data-quality audit (constraint checking) ---------------------------

_AUDIT_ORACLE = """
SELECT 'orders_null_priority' AS metric,
       CAST((SELECT count(*) FROM orders WHERE o_orderpriority IS NULL) AS BIGINT)
         AS value
UNION ALL
SELECT 'lineitem_orphans',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'events_orphan_users',
       CAST((SELECT count(DISTINCT user_id) FROM events e
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = e.user_id)) AS BIGINT)
UNION ALL
SELECT 'orders_dup_keys',
       CAST((SELECT count(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
            AS BIGINT)
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
UNION ALL
SELECT 'events_value_nulls',
       CAST((SELECT count(*) FROM events WHERE value IS NULL) AS BIGINT)
"""


@register("data_quality_audit", oracle=_AUDIT_ORACLE, tags=("A2", "J3", "ext"))
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit across the warehouse — the pre-ingest health
    report: null-rate checks, referential integrity (anti-join orphan
    counts), key uniqueness, and domain rules, emitted as one
    (metric, value) table. Each check is an independent aggregate or
    anti-join the optimizer schedules in parallel; the unions carry 1
    row each. This is the job you run BEFORE the 100 TB pipeline, so
    every check must be a scan-bounded aggregate — none of these
    materializes a wide intermediate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"), F.col("value").cast("long"))

    checks = [
        metric(
            "orders_null_priority",
            orders.filter(F.col("o_orderpriority").isNull()).agg(
                F.count(F.lit(1)).alias("value")
            ),
        ),
        metric(
            "lineitem_orphans",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").agg(
                F.count(F.lit(1)).alias("value")
            ),
        ),
        metric(
            "events_orphan_users",
            ev.join(cust, ev.user_id == cust.c_custkey, "left_anti").agg(
                F.countDistinct("user_id").alias("value")
            ),
        ),
        metric(
            "orders_dup_keys",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.count(F.lit(1)).alias("value")),
        ),
        metric(
            "lineitem_nonpositive_qty",
            li.filter(F.col("l_quantity") <= 0).agg(F.count(F.lit(1)).alias("value")),
        ),
        metric(
            "events_value_nulls",
            ev.filter(F.col("value").isNull()).agg(F.count(F.lit(1)).alias("value")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- cohort retention matrix --------------------------------------------

_COHORT_ORACLE = f"""
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day FROM events
  GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
aged AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS age_days,
         a.user_id
  FROM firsts f JOIN active a USING (user_id))
SELECT strftime(cohort_day, '{TS_FMT_DUCK}') AS cohort_day,
       age_days,
       count(DISTINCT user_id) AS active_users
FROM aged WHERE age_days <= 14
GROUP BY 1, 2
"""


@register("cohort_retention_matrix", oracle=_COHORT_ORACLE, tags=("W9", "J1", "ext"))
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort triangle: users grouped by first-seen day, counted
    on each subsequent active day as (cohort, age) cells — the
    standard retention heatmap feeding growth dashboards. Two
    aggregates and one user-keyed join (first-day table is
    user-cardinality and co-partitions with the activity grid on the
    same key, so the join reuses the distinct's shuffle). Output is
    |cohorts| × age_cap cells at any scale."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    active = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    aged = firsts.join(active, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").cast("long").alias("age_days"),
        "user_id",
    )
    return (
        aged.filter(F.col("age_days") <= 14)
        .groupBy(ts_str("cohort_day").alias("cohort_day"), "age_days")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --- strict-order three-step funnel -------------------------------------

_FUNNEL3_ORACLE = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT 'signup' AS step, CAST(1 AS BIGINT) AS step_no,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
UNION ALL
SELECT 'view_after_signup', 2, CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase_after_view', 3, CAST((SELECT count(*) FROM s3) AS BIGINT)
"""


@register("funnel_three_step", oracle=_FUNNEL3_ORACLE, tags=("J6", "A2", "ext"))
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ORDER funnel: signup → first view strictly after it →
    first purchase strictly after that. Each stage is min-ts per user
    joined forward on (user, ts > prev) — the sequential-constraint
    pattern set-intersection funnels get wrong (they count users who
    purchased BEFORE viewing). Three user-keyed aggregates/joins that
    all hash on user_id, so at scale the chain reuses one
    partitioning end to end."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, tcol: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("ets")
        )
        pcol = prev.columns[-1]
        return (
            e.join(prev, "user_id")
            .filter(F.col("ets") > F.col(pcol))
            .groupBy("user_id")
            .agg(F.min("ets").alias(tcol))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = first_after(s1, "view", "t2")
    s3 = first_after(s2, "purchase", "t3")

    def step(name: str, no: int, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("step"),
            F.lit(no).cast("long").alias("step_no"),
            F.col("users").cast("long"),
        )

    return (
        step("signup", 1, s1)
        .unionByName(step("view_after_signup", 2, s2))
        .unionByName(step("purchase_after_view", 3, s3))
    )


# --- ABC / Pareto revenue classes ---------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT o_custkey, rev_cents,
         sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
         sum(rev_cents) OVER () AS total_cents
  FROM rev),
classed AS (
  SELECT o_custkey, rev_cents,
         CASE WHEN 100 * cum_cents <= 80 * total_cents THEN 'A'
              WHEN 100 * cum_cents <= 95 * total_cents THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked)
SELECT abc, count(*) AS n_customers,
       CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents
FROM classed GROUP BY abc
"""


@register("abc_revenue_classes", oracle=_ABC_ORACLE, tags=("W3", "A1", "ext"))
def abc_revenue_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification: customers sorted by revenue, class A
    = the prefix covering 80% of total revenue, B to 95%, C the tail —
    all arithmetic in exact integer cents (100·cum ≤ 80·total), no
    float shares anywhere near a class boundary.

    TWO-PASS scale-safe form (no global ordered window anywhere):
    pass 1 sketches the revenue distribution (distributed
    approx-percentile) into ≤256 cut points; every customer is
    assigned a bucket row-locally (count of cuts above its revenue —
    equal revenues always share a bucket, so cross-bucket order
    respects the exact sort). Pass 2 turns per-bucket subtotals into
    exclusive prefix offsets via a ≤256×256 broadcast self-join, then
    a bucket-PARTITIONED cumulative window adds the within-bucket
    exact prefix. cum_cents = offset + within is BIT-IDENTICAL to the
    single global window regardless of where the sketch put the cuts,
    so the exact oracle is unchanged. Largest single sort is N/256;
    at extreme scale raise the bucket count, not the algorithm.
    Output is 3 rows."""
    orders = load_table(spark, sf_dir, "orders")
    from gostream_spark.operators.pareto import bucketed_prefix_sum

    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(dec2("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    total = rev.agg(F.sum("rev_cents").cast("bigint").alias("total_cents"))
    ranked = bucketed_prefix_sum(
        rev, "rev_cents", ["o_custkey"], out_col="cum_cents"
    ).crossJoin(F.broadcast(total))
    classed = ranked.select(
        "rev_cents",
        F.when(100 * F.col("cum_cents") <= 80 * F.col("total_cents"), "A")
        .when(100 * F.col("cum_cents") <= 95 * F.col("total_cents"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_cents").cast("bigint").alias("class_rev_cents"),
    )


# --- last-touch purchase attribution ------------------------------------

_ATTRIB_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch
  FROM events)
SELECT coalesce(touch, '(none)') AS touch_type,
       count(*) AS purchases
FROM seq WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("purchase_attribution_last_touch", oracle=_ATTRIB_ORACLE, tags=("W2", "A1", "ext"))
def purchase_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    PRECEDING non-purchase event of its user — an ignore-nulls
    last_value over a frame that excludes the current row (the detail
    naive lag(1) gets wrong when purchases are adjacent). One shuffle
    on user_id; the credit assignment is frame-local and the output
    collapses to |event types|. Same shape at any scale; multi-touch
    models swap the frame expression, not the plan."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("(none)")).alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("purchases"))
    )


# --- RFM customer segmentation ------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders))
           AS recency_days,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
), classed AS (
  SELECT CASE WHEN recency_days <= 180 THEN 'active'
              WHEN recency_days <= 720 THEN 'warm'
              ELSE 'cold' END AS r_class,
         CASE WHEN frequency >= 14 THEN 'frequent'
              WHEN frequency >= 8 THEN 'regular'
              ELSE 'rare' END AS f_class,
         CASE WHEN monetary >= 3500000 THEN 'high'
              WHEN monetary >= 1500000 THEN 'mid'
              ELSE 'low' END AS m_class,
         monetary
  FROM per_cust
)
SELECT r_class, f_class, m_class,
       count(*) AS n_customers,
       CAST(round(sum(monetary), 2) AS DOUBLE) AS segment_revenue
FROM classed
GROUP BY r_class, f_class, m_class
"""


@register("rfm_segments", oracle=_RFM_ORACLE, tags=("A1", "A5", "W3", "ext"))
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics cube:
    recency (days since last order, against the dataset's own
    horizon), frequency (order count), monetary (DECIMAL-exact spend)
    per customer, classified by FIXED thresholds (not ntile — quantile
    cut points tie-break differently across engines; fixed boundaries
    on integer days/counts and DECIMAL money are bit-exact by
    construction), then rolled up to segment counts and revenue.

    Two shuffles: per-customer aggregate (customer cardinality), then
    the tiny segment rollup (<=27 groups). The dataset horizon is a
    1-row broadcast. Row-local classification — no windows, no
    quantile sort at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.select(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec2("o_totalprice")).alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("ref_date", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    classed = per_cust.select(
        F.when(F.col("recency_days") <= 180, "active")
        .when(F.col("recency_days") <= 720, "warm")
        .otherwise("cold")
        .alias("r_class"),
        F.when(F.col("frequency") >= 14, "frequent")
        .when(F.col("frequency") >= 8, "regular")
        .otherwise("rare")
        .alias("f_class"),
        F.when(F.col("monetary") >= 3500000, "high")
        .when(F.col("monetary") >= 1500000, "mid")
        .otherwise("low")
        .alias("m_class"),
        "monetary",
    )
    return classed.groupBy("r_class", "f_class", "m_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).cast("double").alias("segment_revenue"),
    )


# --- Table diff / snapshot reconciliation -------------------------------

_TABLE_DIFF_ORACLE = """
WITH a AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderstatus
  FROM orders),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN price_cents + 100
              ELSE price_cents END AS price_cents,
         o_orderstatus
  FROM a WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, price_cents, o_orderstatus
  FROM a WHERE o_orderkey % 101 = 0),
classed AS (
  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN a.price_cents <> b.price_cents
                   OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
              ELSE 'same' END AS change,
         COALESCE(b.price_cents, 0) - COALESCE(a.price_cents, 0) AS delta_cents
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
SELECT change,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(abs(delta_cents)) AS BIGINT) AS abs_delta_cents
FROM classed GROUP BY change
"""


@register("table_diff_reconcile", oracle=_TABLE_DIFF_ORACLE, tags=("J2", "F7", "ext"))
def table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot RECONCILIATION — diff two table versions into
    added/removed/changed/same classes with the money delta, the audit
    every warehouse migration and CDC pipeline ends with. Version B is
    derived in-query from version A by deterministic rules (3% deleted,
    ~1% price-bumped, ~1% re-keyed inserts) so the diff has known
    ground truth on both engines. Shape: one FULL OUTER join on the
    key + row-local classification + aggregate — two scans, one
    shuffle each side, linear at any scale. The payload comparison
    here is two columns inline; at 100 TB-wide rows, compare a
    16-byte content digest instead (cf. docs_dedup_digest) so the
    shuffle never carries the body — the classify logic is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
        "o_orderstatus",
    )
    surviving = a.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("price_cents") + 100)
        .otherwise(F.col("price_cents"))
        .alias("price_cents"),
        "o_orderstatus",
    )
    inserted = a.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "price_cents",
        "o_orderstatus",
    )
    b = surviving.unionByName(inserted)
    al = a.select(
        F.col("o_orderkey").alias("key"),
        F.col("price_cents").alias("price_a"),
        F.col("o_orderstatus").alias("status_a"),
    )
    bl = b.select(
        F.col("o_orderkey").alias("key"),
        F.col("price_cents").alias("price_b"),
        F.col("o_orderstatus").alias("status_b"),
    )
    classed = al.join(bl, "key", "full_outer").select(
        F.when(F.col("price_b").isNull() & F.col("status_b").isNull(), "removed")
        .when(F.col("price_a").isNull() & F.col("status_a").isNull(), "added")
        .when(
            (F.col("price_a") != F.col("price_b"))
            | (F.col("status_a") != F.col("status_b")),
            "changed",
        )
        .otherwise("same")
        .alias("change"),
        (
            F.coalesce(F.col("price_b"), F.lit(0))
            - F.coalesce(F.col("price_a"), F.lit(0))
        ).alias("delta_cents"),
    )
    return classed.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.abs(F.col("delta_cents"))).cast("bigint").alias("abs_delta_cents"),
    )


# --- Sweep-line: peak concurrent sessions -------------------------------

_PEAK_CONC_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                       OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM ordered
), sessions AS (
  SELECT user_id, session_no,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
         CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS end_s
  FROM numbered GROUP BY 1, 2
), deltas AS (
  SELECT start_s // 86400 AS day_ord, start_s AS sec, 1 AS delta FROM sessions
  UNION ALL
  SELECT start_s // 86400, end_s, -1 FROM sessions
), net AS (
  SELECT day_ord, sec, sum(delta) AS net FROM deltas GROUP BY 1, 2
), cum AS (
  SELECT day_ord, sec,
         sum(net) OVER (PARTITION BY day_ord ORDER BY sec
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM net
)
SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
                + to_seconds(day_ord * 86400), '%Y-%m-%d') AS day,
       (SELECT count(*) FROM sessions s
        WHERE s.start_s // 86400 = cum.day_ord) AS n_sessions,
       CAST(max(c) AS BIGINT) AS peak_concurrent
FROM cum
GROUP BY day_ord
"""


@register("peak_concurrent_sessions", oracle=_PEAK_CONC_ORACLE, tags=("T3", "W3", "ext"))
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: per day, the peak number of
    simultaneously-open 30-minute-gap sessions among the sessions
    opened that day — the capacity-planning statistic. Sessions come
    from the lag-gap islanding (identical to the `session_window`
    semantics: end = last event + gap); each becomes a +1/−1 delta at
    integer epoch seconds, netted per second and prefix-summed per
    day. Net-per-second collapses the within-second ordering
    ambiguity, so the running max is engine-exact on pure integers.
    Windows partition by day — the sweep is time-bucketed, never
    global — and every shuffle key (user, day) is high-cardinality
    at scale."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(
            F.when(
                F.lag("ts").over(wu).isNull()
                | (F.col("ts") >= F.lag("ts").over(wu) + F.expr("INTERVAL 30 MINUTE")),
                1,
            ).otherwise(0)
        )
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        (F.unix_timestamp(F.max("ts")) + 1800).alias("end_s"),
    )
    deltas = sessions.select(
        (F.col("start_s") / 86400).cast("long").alias("day_ord"),
        F.col("start_s").alias("sec"),
        F.lit(1).alias("delta"),
    ).unionAll(
        sessions.select(
            (F.col("start_s") / 86400).cast("long").alias("day_ord"),
            F.col("end_s").alias("sec"),
            F.lit(-1).alias("delta"),
        )
    )
    net = deltas.groupBy("day_ord", "sec").agg(F.sum("delta").alias("net"))
    wd = (
        Window.partitionBy("day_ord")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = net.select("day_ord", F.sum("net").over(wd).alias("c"))
    per_day = sessions.groupBy(
        (F.col("start_s") / 86400).cast("long").alias("day_ord")
    ).agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        cum.groupBy("day_ord")
        .agg(F.max("c").alias("peak_concurrent"))
        .join(per_day, "day_ord")
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("day_ord") * 86400), "yyyy-MM-dd"
            ).alias("day"),
            "n_sessions",
            "peak_concurrent",
        )
    )


# --- Cohort LTV triangle ------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort_m
  FROM orders GROUP BY 1
), cells AS (
  SELECT f.cohort_m, o.o_custkey,
         (date_part('year', o.o_orderdate) - date_part('year', f.cohort_m)) * 12
           + (date_part('month', o.o_orderdate) - date_part('month', f.cohort_m))
           AS age_m,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
           AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT strftime(cohort_m, '%Y-%m') AS cohort_month,
       CAST(age_m AS BIGINT) AS age_months,
       count(DISTINCT o_custkey) AS active_customers,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM cells
WHERE age_m <= 12
GROUP BY cohort_m, age_m
"""


@register("cohort_ltv_triangle", oracle=_LTV_ORACLE, tags=("A1", "J1", "F2", "ext"))
def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value triangle: customers grouped by first-order
    month, with revenue and active-customer counts at each month-age up
    to a year — `cohort_retention_matrix`'s revenue-weighted sibling
    (the growth-accounting view: does a cohort's spend compound or
    decay?). The first-order table is customer-cardinality and
    co-partitions with orders on the same key, reusing one shuffle;
    month ages are exact integer arithmetic and revenue is exact
    cents. Output is |cohorts| × 13 cells at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_m")
    )
    cells = orders.join(firsts, "o_custkey").select(
        "cohort_m",
        "o_custkey",
        (
            (F.year("o_orderdate") - F.year("cohort_m")) * 12
            + (F.month("o_orderdate") - F.month("cohort_m"))
        ).alias("age_m"),
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    return (
        cells.filter(F.col("age_m") <= 12)
        .groupBy(
            F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"),
            F.col("age_m").cast("long").alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
