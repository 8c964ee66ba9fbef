"""L10: text/embedding-similarity streaming (SURVEY.md §2.8) — the
PAPERS.md pattern: a live event stream scored against a static
embedding corpus, aggregated over event-time windows.

Pipeline: events stream (S2) → stream-static join (J9) to the scored
corpus (each corpus vector pre-scored against the query vector — a
broadcast dim, so scoring cost is paid once, not per event) → daily
tumbling window (T1) per event type → complete-mode sink. Exact
oracle: with all input available the result equals the batch join.

100 TB: the corpus dim is the only state (broadcast, scored once);
per-event work is a hash-join probe + window aggregate. Nothing
quadratic, no per-event Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.functions import cosine_similarity
from gostream_spark.io import load_table
from gostream_spark.parity import TS_FMT_DUCK, ts_str
from gostream_spark.queries.llm_similarity import _duck_cosine
from gostream_spark.registry import register
from gostream_spark.streaming import enrich_stream, file_stream, run_available_now
from gostream_spark.operators import tumbling_windowed

_L10_ORACLE = f"""
WITH n AS (SELECT count(*) AS corpus_n FROM embeddings),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         CAST(round({_duck_cosine('e.embedding', 'q.qv')}, 6) AS DECIMAL(18,6)) AS sim
  FROM embeddings e, q
),
ev AS (
  SELECT event_id, ts, event_type, event_id % corpus_n AS ref_vec
  FROM events, n
)
SELECT strftime(date_trunc('day', ev.ts), '{TS_FMT_DUCK}') AS win_start,
       ev.event_type,
       count(*) AS event_cnt,
       CAST(sum(s.sim) AS DOUBLE) AS total_sim
FROM ev JOIN scored s ON ev.ref_vec = s.vec_id
GROUP BY 1, 2
"""


@register("streaming_similarity", oracle=_L10_ORACLE, tags=("L10", "S2", "J9", "T1"))
def streaming_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: each event references a corpus vector (event_id mod corpus
    size); the corpus is pre-scored against the query vector (vec_id
    0) and broadcast; daily windows accumulate per-type similarity
    mass. Sums route through DECIMAL(18,6) so cross-row float order
    can't move a bit.

    SIZE BOUND: broadcasting the scored corpus treats it as a DIM
    table — valid only while the reference set fits the broadcast
    budget (~10M vectors / a few GB), the common case for a curated
    reference set scored against a live stream. No driver-side
    action: the corpus cardinality rides in as a 1-row broadcast dim
    (stream-static cross join), so the plan stays fully lazy. When
    the reference side outgrows broadcast, the scale path is the
    `ivf_topk` shape: assign both stream rows and corpus rows a
    coarse bucket id (nearest-centroid / LSH band) and stream-static
    equi-join ON THE BUCKET, which shuffles the corpus once and
    probes per-bucket instead of per-vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_dim = emb.agg(F.count(F.lit(1)).cast("long").alias("corpus_n"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    scored = F.broadcast(
        emb.crossJoin(q).select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("qv")), 6)
            .cast("decimal(18,6)")
            .alias("sim"),
        )
    )
    ev = (
        file_stream(spark, sf_dir, "events")
        .join(F.broadcast(n_dim), F.lit(True), "inner")
        .withColumn("ref_vec", F.col("event_id") % F.col("corpus_n"))
    )
    joined = enrich_stream(ev, scored, F.col("ref_vec") == F.col("vec_id"))
    windowed = tumbling_windowed(
        joined.withWatermark("ts", "1 hour"),
        "ts",
        "1 day",
        keys=("event_type",),
        aggs=(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("sim").cast("double").alias("total_sim"),
        ),
    )
    result = run_available_now(windowed, output_mode="complete")
    return result.select(
        ts_str("w.start").alias("win_start"), "event_type", "event_cnt", "total_sim"
    )
