"""Advanced dedup strategies for training-data curation (driver
mandate: exact ✓ L1, MinHash+LSH ✓ L2, n-gram Jaccard ✓ L2 — this
module adds embedding-cosine near-dup removal and SimHash).

Both are exact-oracle-checked: the cosine dedup reuses the float64
fold discipline, and the SimHash here is built from md5 hex digits
(md5 agrees across engines by definition), so even the fingerprint
bits are cross-engine reproducible — the xxhash64-seeded variant in
``llm_similarity.minhash_lsh_buckets`` is the cheaper Spark-internal
twin for production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gostream_spark.functions import cosine_similarity
from gostream_spark.functions.sketches import simhash_expr
from gostream_spark.io import load_table, spread_for_compute
from gostream_spark.operators import topk_ranked
from gostream_spark.queries.llm_similarity import _duck_cosine
from gostream_spark.registry import register

# --- embedding-cosine near-dup dedup ------------------------------------

_EMB_DEDUP_ORACLE = f"""
WITH sub AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
  WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= 0.3
)
SELECT s.vec_id, s.label FROM sub s
WHERE s.vec_id NOT IN (SELECT vec_id FROM dropped)
"""


@register("embedding_dedup", oracle=_EMB_DEDUP_ORACLE, tags=("L2", "L4", "ext"))
def embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: drop every vector that is
    ≥0.3-cosine-similar to a LOWER-id vector (keep-first by id — a
    deterministic single-pass approximation of clustering dedup).
    Exact all-pairs on a 1-in-10 subset; the production path generates
    candidates from `similarity_lsh_buckets` buckets instead of
    all-pairs, then applies this same keep-lowest rule inside each
    candidate set."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    dropped = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(cosine_similarity(F.col("ea"), F.col("eb")) >= 0.3)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


# --- SimHash fingerprint dedup ------------------------------------------

# hex digit of md5(token) at position p+1, as an integer 0..15
_HEXDIGITS = "0123456789abcdef"

_SIMHASH_BITS = 16


def _duck_simhash_bit(p: int) -> str:
    return (
        f"(list_aggregate(list_transform(toks, t -> "
        f"CAST(strpos('{_HEXDIGITS}', substr(md5(t), {p + 1}, 1)) - 1 AS DOUBLE) - 7.5), "
        f"'sum') > 0)::INT"
    )


_SIMHASH_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), fp AS (
  SELECT doc_id,
         {' + '.join(f'{_duck_simhash_bit(p)} * {2 ** p}' for p in range(_SIMHASH_BITS))}
           AS simhash
  FROM t
)
SELECT doc_id, simhash,
       count(*) OVER (PARTITION BY simhash) AS bucket_size,
       (row_number() OVER (PARTITION BY simhash ORDER BY doc_id) = 1) AS keeper
FROM fp
"""


@register("simhash_dedup", oracle=_SIMHASH_ORACLE, tags=("L2", "F7", "ext"), bench=True)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprinting: 16-bit signature per document
    — bit p is the sign of the sum over distinct tokens of
    (md5-hex-digit_p - 7.5). Documents sharing a fingerprint are
    near-dup candidates; the keep-lowest-id row per bucket survives.
    One row-local fingerprint pass + one shuffle on the 16-bit key —
    linear at any corpus size (this is the classic web-scale dedup
    design). md5-derived bits make it exactly reproducible in the
    DuckDB oracle; production would swap in xxhash64 bits (cheaper,
    Spark-internal)."""
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"), spark)
    toks = F.array_distinct(F.split("text", " "))
    with_toks = docs.select("doc_id", toks.alias("toks"))
    fp = with_toks.select(
        "doc_id",
        simhash_expr(F.col("toks"), _SIMHASH_BITS).alias("simhash"),
    )
    from pyspark.sql import Window

    by_fp = Window.partitionBy("simhash")
    return fp.select(
        "doc_id",
        "simhash",
        F.count(F.lit(1)).over(by_fp).alias("bucket_size"),
        (
            F.row_number().over(by_fp.orderBy("doc_id")) == 1
        ).alias("keeper"),
    )


# --- L2 wave 3: edit-distance near-dup with language blocking -----------

_LEV_ORACLE = """
WITH sub AS (
  SELECT doc_id, lang, substr(text, 1, 80) AS head
  FROM documents WHERE doc_id % 10 = 0
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
         levenshtein(a.head, b.head) AS edit_dist
  FROM sub a JOIN sub b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, lang, edit_dist, rn FROM (
  SELECT *, row_number() OVER (ORDER BY edit_dist, doc_a, doc_b) AS rn
  FROM pairs
) WHERE rn <= 20
"""


@register("neardup_levenshtein", oracle=_LEV_ORACLE, tags=("L2", "F1"))
def neardup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 wave 3: edit-distance near-dup — top-20 closest document
    pairs by Levenshtein distance over an 80-char prefix, with
    LANGUAGE BLOCKING: the self-join keys on `lang`, so candidate
    pairs form only within a language. Blocking is the scale lever for
    quadratic comparators — at 100 TB the block key gets finer
    (lang + length-band + SimHash band) until per-block pair counts
    are bounded, and the O(len^2) comparator runs only inside blocks.
    Prefixing to 80 chars bounds per-pair cost; both engines compute
    the same integer distance."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    sub = docs.select(
        "doc_id", "lang", F.substring("text", 1, 80).alias("head")
    )
    a = sub.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("head").alias("head_a")
    )
    b = sub.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("head").alias("head_b"),
    )
    pairs = a.join(
        b, (F.col("lang") == F.col("lang_b")) & (F.col("doc_a") < F.col("doc_b"))
    ).select(
        "doc_a", "doc_b", "lang",
        F.levenshtein("head_a", "head_b").alias("edit_dist"),
    )
    return topk_ranked(
        pairs.select("doc_a", "doc_b", "lang", "edit_dist"),
        20,
        F.col("edit_dist"),
        F.col("doc_a"),
        F.col("doc_b"),
    )
