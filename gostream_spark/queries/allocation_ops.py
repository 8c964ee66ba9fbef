"""Allocation / decision analytics (SURVEY.md §2 ext): exact
largest-remainder proration, 2-D Pareto-frontier (skyline) selection,
Mann-Whitney AUC via histogram pair counting, Welch's unequal-variance
t-test, and U-shaped (position-based) marketing attribution.

Cross-engine determinism (``gostream_spark.parity`` discipline): every
allocation and comparison routes through exact integers (cents, basis
points, pair counts); the only double arithmetic is a single final
expression built from ONE shared format string per query, so Spark and
DuckDB evaluate the identical IEEE operation sequence before rounding.

Scale shape: all windows are partitioned by a high-cardinality key
(order, user) or run over a domain-bounded HISTOGRAM (price cents,
char-length) using the band + range-join prefix trick — no global
window exists in any of these plans at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.io import load_table
from gostream_spark.registry import register

# --- largest-remainder proration ----------------------------------------

_PRORATION_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS line_cents
  FROM lineitem
), o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders
), j AS (
  SELECT l_orderkey, l_linenumber, line_cents, total_cents,
         CAST(SUM(line_cents) OVER (PARTITION BY l_orderkey) AS BIGINT) AS osum
  FROM li JOIN o ON l_orderkey = o_orderkey
), b AS (
  SELECT *, (total_cents * line_cents) // osum AS base,
         (total_cents * line_cents) % osum AS rem
  FROM j
), r AS (
  SELECT *,
         total_cents
           - CAST(SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT) AS shortfall,
         row_number() OVER (
           PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber
         ) AS rk
  FROM b
)
SELECT l_orderkey, l_linenumber,
       CAST(base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM r
"""


@register("proration_largest_remainder", oracle=_PRORATION_ORACLE, tags=("W3", "ext"), bench=True)
def proration_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact largest-remainder (Hamilton) proration: allocate each
    order's total (in cents) across its lineitems proportionally to
    line price, with the classic guarantee sum(alloc) == total per
    order. base = floor(T*c_i/S) in pure BIGINT arithmetic; the
    shortfall (< #lines by construction) goes one cent each to the
    largest fractional remainders (ties broken by line number). All
    windows partition by order key — high cardinality, one shuffle;
    products stay < 2^63 (cents x cents per order)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("line_cents"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    wp = Window.partitionBy("l_orderkey")
    wr = Window.partitionBy("l_orderkey").orderBy(F.desc("rem"), "l_linenumber")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("osum", F.sum("line_cents").over(wp))
        .withColumn("base", F.expr("(total_cents * line_cents) DIV osum"))
        .withColumn("rem", F.expr("(total_cents * line_cents) % osum"))
        .withColumn("shortfall", F.col("total_cents") - F.sum("base").over(wp))
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
            ).alias("alloc_cents"),
        )
    )


# --- 2-D Pareto frontier (skyline) --------------------------------------

_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_partkey, a.p_size, a.price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
)
"""


@register("skyline_pareto_parts", oracle=_SKYLINE_ORACLE, tags=("A1", "J6", "ext"))
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline query: parts not dominated on (minimize price,
    maximize size). Dominated iff some part is <= on price and >= on
    size with one strict. Scale path avoids the quadratic NOT-EXISTS
    of the oracle: collapse to the per-price-cents HISTOGRAM of max
    size (domain-bounded, never part-cardinality), band it ($10
    bands), compute the strictly-cheaper prefix max as band-level
    broadcast range-join + within-band range-frame window over
    histogram rows, then one equi-join back to parts and a row-local
    dominance test. No global window; parts never pairwise-joined."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    hist = (
        p.groupBy("price_cents")
        .agg(F.max("p_size").alias("eq_max"))
        .withColumn("band", F.expr("price_cents DIV 1000"))
    )
    band_max = hist.groupBy("band").agg(F.max("eq_max").alias("bmax"))
    bp = (
        band_max.alias("a")
        .join(F.broadcast(band_max.alias("b")), F.col("b.band") < F.col("a.band"))
        .groupBy(F.col("a.band").alias("band"))
        .agg(F.max(F.col("b.bmax")).alias("band_prefix"))
    )
    w = (
        Window.partitionBy("band")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    hist2 = (
        hist.withColumn("in_band_lt", F.max("eq_max").over(w))
        .join(F.broadcast(bp), "band", "left")
        .withColumn(
            "lt_max",
            F.greatest(
                F.coalesce(F.col("in_band_lt"), F.lit(-1)),
                F.coalesce(F.col("band_prefix"), F.lit(-1)),
            ),
        )
        .select("price_cents", "eq_max", "lt_max")
    )
    return (
        p.join(hist2, "price_cents")
        .filter(
            ~((F.col("lt_max") >= F.col("p_size")) | (F.col("eq_max") > F.col("p_size")))
        )
        .select("p_partkey", "p_size", "price_cents")
    )


# --- Mann-Whitney AUC via histogram pair counting -----------------------

_AUC_ORACLE = """
WITH h AS (
  SELECT n_chars AS s,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS npos,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS nneg
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY n_chars
), c AS (
  SELECT s, npos, nneg,
         COALESCE(SUM(nneg) OVER (
           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_neg_lt
  FROM h
)
SELECT CAST(SUM(npos) AS BIGINT) AS n_pos,
       CAST(SUM(nneg) AS BIGINT) AS n_neg,
       CAST(2 * SUM(npos * cum_neg_lt) + SUM(npos * nneg) AS BIGINT) AS auc_num,
       CAST(2 * SUM(npos) * SUM(nneg) AS BIGINT) AS auc_den,
       round(CAST(2 * SUM(npos * cum_neg_lt) + SUM(npos * nneg) AS DOUBLE)
             / (2 * SUM(npos) * SUM(nneg)), 6) AS auc
FROM c
"""


@register("auc_mann_whitney", oracle=_AUC_ORACLE, tags=("A1", "L8", "ext"))
def auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney AUC of doc length separating English vs other
    docs, WITHOUT a global rank: collapse to the per-length histogram
    (npos, nneg), get each length's count of strictly-shorter
    negatives via the band + range-join prefix trick (bands are
    length DIV 50 — domain-bounded), then AUC = (2*concordant +
    ties) / (2*P*N) in pure BIGINT pair counts with ONE final double
    division. The oracle computes the same integers with a plain
    running sum. Equivalent to the tie-corrected rank-sum U."""
    h = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
        .groupBy("n_chars")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("npos"),
            F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("nneg"),
        )
        .withColumn("band", F.expr("n_chars DIV 50"))
    )
    band_sum = h.groupBy("band").agg(F.sum("nneg").alias("bneg"))
    bp = (
        band_sum.alias("a")
        .join(F.broadcast(band_sum.alias("b")), F.col("b.band") < F.col("a.band"))
        .groupBy(F.col("a.band").alias("band"))
        .agg(F.sum(F.col("b.bneg")).alias("band_prefix"))
    )
    w = (
        Window.partitionBy("band")
        .orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    c = (
        h.withColumn("in_band_lt", F.coalesce(F.sum("nneg").over(w), F.lit(0)))
        .join(F.broadcast(bp), "band", "left")
        .withColumn(
            "cum_neg_lt",
            F.col("in_band_lt") + F.coalesce(F.col("band_prefix"), F.lit(0)),
        )
    )
    return c.agg(
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum("nneg").cast("long").alias("n_neg"),
        (
            2 * F.sum(F.col("npos") * F.col("cum_neg_lt"))
            + F.sum(F.col("npos") * F.col("nneg"))
        )
        .cast("long")
        .alias("auc_num"),
        (2 * F.sum("npos") * F.sum("nneg")).cast("long").alias("auc_den"),
        F.round(
            (
                2 * F.sum(F.col("npos") * F.col("cum_neg_lt"))
                + F.sum(F.col("npos") * F.col("nneg"))
            ).cast("double")
            / (2 * F.sum("npos") * F.sum("nneg")),
            6,
        ).alias("auc"),
    )


# --- Welch's unequal-variance t-test ------------------------------------

# One shared formula text → both engines evaluate the identical IEEE
# double operation sequence before the final round(). The _DEFINED
# guard is load-bearing under ANSI mode (Spark 4 default): Welch's
# test is undefined for a group with n < 2 or a zero pooled variance
# (all balances identical), and WITHOUT the guard one degenerate
# segment would throw DIVIDE_BY_ZERO and kill the whole job — the
# guarded CASE yields NULL instead, which DuckDB's div-by-zero -> NULL
# also produces, so the engines stay in agreement.
_VAR_A = "(CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1)"
_VAR_B = "(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1)"
_SE2 = f"(({_VAR_A}) / na + ({_VAR_B}) / nb)"
_DEFINED = f"na >= 2 AND nb >= 2 AND ({_SE2}) > 0"
_T_EXPR = (
    f"round(CASE WHEN {_DEFINED} THEN "
    f"(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / sqrt({_SE2}) END, 4)"
)
_DF_EXPR = (
    f"round(CASE WHEN {_DEFINED} THEN ({_SE2}) * ({_SE2}) / "
    f"((({_VAR_A}) / na) * (({_VAR_A}) / na) / (na - 1) + "
    f"(({_VAR_B}) / nb) * (({_VAR_B}) / nb) / (nb - 1)) END, 2)"
)

_WELCH_ORACLE = f"""
WITH g AS (
  SELECT
    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS na,
    SUM(CASE WHEN c_mktsegment = 'BUILDING'
        THEN CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS sa,
    SUM(CASE WHEN c_mktsegment = 'BUILDING'
        THEN CAST(round(c_acctbal * 100) AS BIGINT)
           * CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS qa,
    SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS nb,
    SUM(CASE WHEN c_mktsegment = 'MACHINERY'
        THEN CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS sb,
    SUM(CASE WHEN c_mktsegment = 'MACHINERY'
        THEN CAST(round(c_acctbal * 100) AS BIGINT)
           * CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS qb
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       {_T_EXPR} AS t_stat,
       {_DF_EXPR} AS df_welch
FROM g
"""


@register("welch_ttest_balance", oracle=_WELCH_ORACLE, tags=("A8", "ext"))
def welch_ttest_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: BUILDING vs MACHINERY account
    balances. One conditional-aggregation pass accumulates n / sum /
    sum-of-squares per group in exact BIGINT cents (squares < 2^63 at
    any realistic cardinality since the per-row square is bounded by
    the balance domain); t and the Welch-Satterthwaite df are each
    ONE double expression built from the same format string the
    oracle uses, so both engines run the identical IEEE sequence.
    Map-side partial aggregation; no shuffle beyond the 1-row final."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("na"),
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", cents).otherwise(0)
            ).alias("sa"),
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", cents * cents).otherwise(0)
            ).alias("qa"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("nb"),
            F.sum(
                F.when(F.col("c_mktsegment") == "MACHINERY", cents).otherwise(0)
            ).alias("sb"),
            F.sum(
                F.when(F.col("c_mktsegment") == "MACHINERY", cents * cents).otherwise(0)
            ).alias("qb"),
        )
    )
    return g.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr(_T_EXPR).alias("t_stat"),
        F.expr(_DF_EXPR).alias("df_welch"),
    )


# --- U-shaped (position-based) attribution ------------------------------

_USHAPE_ORACLE = """
WITH fp AS (
  SELECT user_id, MIN(ts) AS p_ts FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), t AS (
  SELECT e.user_id, e.event_id, e.ts, e.event_type
  FROM events e JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type IN ('view', 'click', 'signup') AND e.ts < fp.p_ts
), seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS k
  FROM t
), bp AS (
  SELECT event_type,
         CASE
           WHEN k = 1 THEN 10000
           WHEN k = 2 THEN 5000
           WHEN rn = 1 OR rn = k THEN 4000
           ELSE 2000 // (k - 2)
              + CASE WHEN rn - 1 <= 2000 % (k - 2) THEN 1 ELSE 0 END
         END AS bps
  FROM seq
)
SELECT event_type, CAST(SUM(bps) AS BIGINT) AS total_bp,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM bp GROUP BY event_type
"""


@register("attribution_position_weights", oracle=_USHAPE_ORACLE, tags=("W1", "A1", "ext"))
def attribution_position_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) marketing attribution: each
    converting user's pre-purchase touch path (view/click/signup
    strictly before the first purchase) splits 10000 basis points —
    40% first touch, 40% last, 20% across the middles via
    largest-remainder so every path sums to exactly 10000. Credit is
    then rolled up per channel. Pure integer basis points; windows
    partition by user_id (high cardinality, one shuffle); the first-
    purchase table is an aggregate join, not a global sort."""
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    t = (
        ev.join(fp, "user_id")
        .filter(
            F.col("event_type").isin("view", "click", "signup")
            & (F.col("ts") < F.col("p_ts"))
        )
        .select("user_id", "event_id", "ts", "event_type")
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    seq = t.withColumn("rn", F.row_number().over(wseq)).withColumn(
        "k", F.count(F.lit(1)).over(wall)
    )
    bps = (
        F.when(F.col("k") == 1, 10000)
        .when(F.col("k") == 2, 5000)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), 4000)
        .otherwise(
            F.expr("2000 DIV (k - 2)")
            + F.when(F.col("rn") - 1 <= F.expr("2000 % (k - 2)"), 1).otherwise(0)
        )
    )
    return (
        seq.withColumn("bps", bps)
        .groupBy("event_type")
        .agg(
            F.sum("bps").cast("long").alias("total_bp"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
    )

# --- Lindley recursion: floor-clamped running balance -------------------

_LINDLEY_ORACLE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN CAST(round(value * 100) AS BIGINT)
              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT user_id, ts, event_id, delta,
         CAST(SUM(delta) OVER w AS BIGINT) AS cum
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), m AS (
  SELECT user_id, ts, event_id, delta, cum,
         CAST(MIN(cum) OVER w AS BIGINT) AS runmin
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), c AS (
  SELECT user_id, delta, cum,
         cum - least(0, runmin) AS bal,
         CASE WHEN cum < least(0, COALESCE(
                lag(runmin) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                0)) THEN 1 ELSE 0 END AS clamped
  FROM m
)
SELECT user_id,
       CAST(SUM(delta) - least(0, MIN(cum)) AS BIGINT) AS final_balance,
       CAST(MAX(bal) AS BIGINT) AS max_balance,
       CAST(SUM(clamped) AS BIGINT) AS n_clamped
FROM c GROUP BY user_id
"""


@register("inventory_lindley_balance", oracle=_LINDLEY_ORACLE, tags=("W3", "ext"), bench=True)
def inventory_lindley_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance (wallet / inventory semantics):
    b_t = max(0, b_{t-1} + delta_t) per user, where purchase/signup
    values credit and other event values debit the balance in exact
    cents. The sequential-looking recursion is the Lindley equation,
    whose closed form b_t = S_t - min(0, min_{s<=t} S_s) (S = prefix
    sum) makes it pure PARTITIONED window algebra — no stateful UDF,
    no iteration: running sum, running min, one lag for the clamp
    events, then a per-user aggregate. Windows partition by user_id
    (high cardinality, one shuffle); all arithmetic BIGINT cents."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup"), cents
        ).otherwise(-cents).alias("delta"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        d.withColumn("cum", F.sum("delta").over(wcum))
        .withColumn("runmin", F.min("cum").over(wcum))
        .withColumn("bal", F.col("cum") - F.least(F.lit(0), F.col("runmin")))
        .withColumn(
            "clamped",
            F.when(
                F.col("cum")
                < F.least(
                    F.lit(0), F.coalesce(F.lag("runmin").over(wlag), F.lit(0))
                ),
                1,
            ).otherwise(0),
        )
    )
    return c.groupBy("user_id").agg(
        (F.sum("delta") - F.least(F.lit(0), F.min("cum")))
        .cast("long")
        .alias("final_balance"),
        F.max("bal").cast("long").alias("max_balance"),
        F.sum("clamped").cast("long").alias("n_clamped"),
    )
