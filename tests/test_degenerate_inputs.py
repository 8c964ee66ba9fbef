"""Degenerate-input parity: the generator-expression queries
(sequence/slice over size-derived ranges) must agree with their
DuckDB oracles on PATHOLOGICAL documents — empty text, sub-shingle
text, zero-byte payloads — where Spark's sequence() would otherwise
descend or throw. The production fixtures never contain these sizes;
a regenerated fixture or a real corpus will."""

from __future__ import annotations

import os
import shutil
import uuid

import duckdb
import pytest

from gostream_spark.registry import get_query

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")

_DEGENERATE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "src1", 0),                       # empty
    (2, "a", "en", "src1", 1),                      # single char
    (3, "abcdefg", "en", "src2", 7),                # one short of a hash window
    (4, "abcdefgh", "en", "src2", 8),               # exactly one hash window
    (5, "one two", "de", "src3", 7),                # 2 tokens < 3-shingle
    (6, "alpha bravo charlie delta echo", "en", "src3", 30),  # normal
]

QUERIES = [
    # generator-expression queries (sequence/slice over size-derived
    # ranges) — the class where degenerate sizes descend or throw
    "rolling_hash_chunks",
    "multimodal_chunk_manifest",
    "multimodal_frame_sample",
    "winnowing_fingerprint",
    "winnowing_candidate_pairs",
    "rag_chunk_windows",
    "sequence_packing",
    "top_bigrams",
    # sketch/banding queries — partial sketches must exclude the doc
    # on BOTH engine sides (minhash_bottomk round-5 fix)
    "minhash_md5_bands",
    "minhash_bottomk_bands",
    "simhash_dedup",
    "neardup_jaccard_pairs",
    # Python-worker paths — empty text must not divide by zero
    "mapinpandas_doc_features",
    "udtf_tokenize",
    "token_count",
    "text_token_stats",
]


@pytest.fixture(scope="module")
def degenerate_dir(spark):
    d = os.path.join(TMP, f"degen-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(
        _DEGENERATE_DOCS,
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    sub = os.path.join(TMP, f"stage-{uuid.uuid4().hex[:8]}")
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(sub, part), os.path.join(d, "documents.parquet"))
    shutil.rmtree(sub, ignore_errors=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", QUERIES)
def test_degenerate_docs_match_oracle(spark, degenerate_dir, name):
    q = get_query(name)
    got = sorted(tuple(r) for r in q.fn(spark, degenerate_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degenerate_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want, f"{name}: {got[:5]} != {want[:5]}"
