"""L9 multimodal-column queries (SURVEY.md §2.8): binary payload +
typed metadata, metadata-only pruning, and the decode/feature-extract
path over ``mapInPandas``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gostream_spark.io import load_table, spread_for_compute
from gostream_spark.operators.multimodal import decode_features, pack_payload
from gostream_spark.registry import register

_L9_DECODE_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) + ascii(substr(text, 2, 1))
            + ascii(substr(text, 3, 1)) + ascii(substr(text, 4, 1)) AS BIGINT)
         AS head_checksum,
       CAST(length(text) // 100 + 1 AS BIGINT) AS frames_sampled
FROM documents
"""


@register("multimodal_decode_features", oracle=_L9_DECODE_ORACLE, tags=("L9", "U1"))
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: pack text as an opaque binary payload with typed metadata,
    then run the (stubbed) decoder via mapInPandas. The fixture text
    is ASCII, so byte length == char length and the first-4-bytes
    checksum equals the ascii sum the oracle computes — the decode
    plumbing (binary schema, Arrow batches, partition inheritance) is
    the real thing; only the codec itself is a stand-in."""
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"), spark)
    packed = docs.select(
        "doc_id",
        pack_payload(
            F.col("text"), F.col("lang"), F.col("source"), F.col("n_chars")
        ).alias("mm"),
    ).select("doc_id", F.col("mm.payload").alias("payload"))
    return decode_features(packed)


_L9_META_ORACLE = """
SELECT lang AS meta_lang, count(*) AS doc_cnt,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


@register("multimodal_metadata_stats", oracle=_L9_META_ORACLE, tags=("L9", "F6"))
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: metadata-only aggregation over packed multimodal rows —
    Catalyst prunes the struct access to the meta fields, so the
    binary payload column is never deserialized (at 100 TB this is the
    difference between scanning kilobytes and scanning the blobs)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = docs.select(
        pack_payload(F.col("text"), F.col("lang"), F.col("source"), F.col("n_chars")).alias(
            "mm"
        )
    )
    return packed.groupBy(F.col("mm.meta.lang").alias("meta_lang")).agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.sum("mm.meta.n_chars").alias("total_chars"),
    )
